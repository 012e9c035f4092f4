package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(tokens, n, k)`: the k-permutation MinHash signature of the
  * word-n-gram shingle set, in ONE pass — no shingle strings are ever
  * materialized (the column-expression formulation re-tokenizes and
  * re-concatenates per hash function; at 100 TB that is k× the string
  * work). Per row: hash each token once, roll an n-token window hash, and
  * fold each window hash through k seed mixes keeping the minima.
  *
  * Duplicate shingles need no dedup: `min` is idempotent over repeats.
  * Signature values are NOT portable across engines (like the reference's
  * internal hashes); near-dup quality, not reproducibility, is the contract.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && k >= 1, "minhash_sig: n and k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    import MinHashSig._
    val toks = v.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    if (nt > 0) {
      val th = new Array[Long](nt)
      var i = 0
      while (i < nt) {
        th(i) = if (toks.isNullAt(i)) 0L else SimHash64.fnv1a64(toks.getUTF8String(i))
        i += 1
      }
      val grams = math.max(nt - n + 1, 1) // short docs: one truncated gram
      var g = 0
      while (g < grams) {
        var h = 0x9E3779B97F4A7C15L
        var j = g
        val end = math.min(g + n, nt)
        while (j < end) { h = mix64(h ^ th(j)) * 0x100000001B3L; j += 1 }
        h = mix64(h)
        var s = 0
        while (s < k) {
          val variant = mix64(h ^ (s * 0xC2B2AE3D27D4EB4FL))
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

object MinHashSig {
  /** murmur3-style 64-bit finalizer (public-domain avalanche constants). */
  def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL
    z ^= z >>> 33; z *= 0xC4CEB9FE1A85EC53L
    z ^ (z >>> 33)
  }
}
