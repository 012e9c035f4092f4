package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a token array in ONE pass, WITH multiplicity (corpus
  * counting — unlike [[graft.operators.Dedup.shingles]]' distinct set).
  * Equivalent to `transform(sequence(0, greatest(size-n, 0)),
  * i -> array_join(slice(toks, i+1, n), " "))` — the higher-order-function
  * form pays a per-element lambda dispatch measured ~50× slower than a
  * plain loop (see the LshBandKeys/MinHashSig precedents). Shorter-than-n
  * inputs yield one gram of whatever is there, matching `slice`'s
  * clamping (and the DuckDB `toks[i+1 : i+n]` oracle formulation).
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with NullSafeEvalCodegen {

  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams needs array<string>, got ${dt.sql}")
  }

  @transient private lazy val SP = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val size = arr.numElements()
    val count = math.max(size - n, 0) + 1
    val out = new Array[UTF8String](count)
    var i = 0
    while (i < count) {
      val hi = math.min(i + n, size)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) {
        val t = arr.getUTF8String(j)
        parts(j - i) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      out(i) = UTF8String.concatWs(SP, parts: _*)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
