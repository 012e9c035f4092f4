package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `token_buckets(tokens, b)`: each token's [[PortableHash]] reduced mod `b`,
  * in DOCUMENT ORDER — the hashed bag-of-words featurization used by
  * importance-resampling data selection (DSIR; Xie et al. 2023). Keeping
  * document order matters: downstream per-document scores are SEQUENTIAL
  * left-folds over these buckets, so any engine that replays the same fold
  * (e.g. DuckDB `list_reduce`) reproduces the score bit-for-bit.
  *
  * One pass, no shingle strings materialized; arithmetic is the same
  * mod-(2^31-1) polynomial hash the dedup family uses, so the bucket ids are
  * engine-portable exactly like the MinHash signatures.
  */
case class TokenBuckets(child: Expression, buckets: Int)
    extends UnaryExpression with NullSafeEvalCodegen {
  require(buckets >= 2, "token_buckets: bucket count must be >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_buckets needs array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    import PortableHash._
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val h = if (toks.isNullAt(i)) Seed else tokenHash(toks.getUTF8String(i))
      out(i) = (h % buckets).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
