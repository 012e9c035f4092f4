package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `shingle_hashes(tokens, n)`: the DISTINCT word-n-gram shingle set as
  * SORTED 64-bit hashes, in one pass — the at-scale replacement for
  * materializing shingle STRINGS ([[graft.operators.Dedup.shingles]]) in
  * the LSH verify stage. A long document's shingle-string array is tens of
  * KB of concatenated text that then rides through two join exchanges per
  * candidate pair; the hashed set is 8 bytes per shingle and compares
  * merge-style without re-hashing ([[JaccardSortedLongs]]).
  *
  * Gram identity matches the string formulation exactly: tokens come from
  * `split(trim(text), "\s+")` so they contain no spaces, making the
  * space-joined gram string bijective with its token sequence — equal
  * grams hash equal. Distinct different grams collide only by 64-bit hash
  * accident: each token is xxhash64-hashed (seed 42, Spark's `xxhash64`),
  * windows combine by a 64-bit odd-multiplier polynomial with an avalanche
  * finalizer, so for a candidate pair with ≤10⁴ distinct shingles the
  * within-pair collision probability is ≈ (10⁴)²/2⁶⁵ < 3e-12 — across a
  * 10⁶-pair verify stage, < 3e-6 per run (documented gate-safety bound;
  * the string formulation remains available where provable exactness is
  * worth the shuffle volume).
  *
  * Short docs (fewer than n tokens) yield one truncated gram, like
  * `shingles`' `greatest(size − n, 0)` clamp and [[MinHashSig]].
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with NullSafeEvalCodegen {
  require(n >= 1, "shingle_hashes: n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    val grams = math.max(nt - n + 1, 1)
    val out = new Array[Long](grams)
    // hash each token once
    val th = new Array[Long](math.max(nt, 1))
    var i = 0
    while (i < nt) {
      th(i) =
        if (toks.isNullAt(i)) 42L
        else XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
      i += 1
    }
    var g = 0
    while (g < grams) {
      var gh = 1125899906842597L
      var j = g
      val end = math.min(g + n, nt)
      while (j < end) { gh = gh * -4132994306676758123L + th(j); j += 1 } // 0xC6A4A7935BD1E995
      // murmur3 fmix64 avalanche
      gh ^= gh >>> 33; gh *= -49064778989728563L // 0xFF51AFD7ED558CCD
      gh ^= gh >>> 33; gh *= -4265267296055464877L // 0xC4CEB9FE1A85EC53
      gh ^= gh >>> 33
      out(g) = gh
      g += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted grams
    var w = 0
    g = 0
    while (g < grams) {
      if (g == 0 || out(g) != out(g - 1)) { out(w) = out(g); w += 1 }
      g += 1
    }
    new GenericArrayData(if (w == grams) out else java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
