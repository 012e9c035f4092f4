package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `minhash_sig(tokens, n, k)`: the k-permutation MinHash signature of the
  * word-n-gram shingle set, in ONE pass — no shingle strings are ever
  * materialized (the column-expression formulation re-tokenizes and
  * re-concatenates per hash function; at 100 TB that is k× the string
  * work). Per row: hash each token once, combine n-token windows, and map
  * each window hash through k affine permutations keeping the minima.
  *
  * Duplicate shingles need no dedup: `min` is idempotent over repeats.
  * Hashing uses [[PortableHash]] (mod 2^31-1 arithmetic), so the exact
  * signature is reproducible in any SQL engine — the DuckDB oracle in
  * `SparkEntry.oracleSql("q17_minhash_sig")` recomputes it bit-for-bit.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with NullSafeEvalCodegen {
  require(n >= 1 && k >= 1, "minhash_sig: n and k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${dt.sql}")
  }

  // affine permutation constants, fixed per hash index
  private lazy val permAs: Array[Long] = Array.tabulate(k)(PortableHash.permA)
  private lazy val permBs: Array[Long] = Array.tabulate(k)(PortableHash.permB)

  override def nullSafeEval(v: Any): Any = {
    import PortableHash._
    val toks = v.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    if (nt > 0) {
      val th = new Array[Long](nt)
      var i = 0
      while (i < nt) {
        th(i) = if (toks.isNullAt(i)) Seed else tokenHash(toks.getUTF8String(i))
        i += 1
      }
      val grams = math.max(nt - n + 1, 1) // short docs: one truncated gram
      var g = 0
      while (g < grams) {
        var gh = Seed
        var j = g
        val end = math.min(g + n, nt)
        while (j < end) { gh = (gh * B + th(j) + 1L) % P; j += 1 }
        var s = 0
        while (s < k) {
          val variant = (permAs(s) * gh + permBs(s)) % P
          if (variant < mins(s)) mins(s) = variant
          s += 1
        }
        g += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
