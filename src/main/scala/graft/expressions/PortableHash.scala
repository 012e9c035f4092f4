package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable hashing for the dedup family (MinHash / SimHash).
  *
  * All arithmetic stays below 2^62 so any engine with 64-bit integers can
  * reproduce it exactly (DuckDB `list_reduce`, Spark, Flink, plain SQL):
  *
  *  - `tokenHash`: polynomial hash of the string's unicode codepoints,
  *    `h := (h*131 + cp) mod P`, seed 7, P = 2^31-1 (Mersenne).
  *  - affine "permutations" over Z_P: `x -> (a_i*x + b_i) mod P` with
  *    classic LCG-derived constants (a_i from 1103515245/12345,
  *    b_i from 69069). a_i, x < 2^31 so a_i*x < 2^62 — no overflow.
  *
  * This replaces a 64-bit fnv1a/murmur mix (wrapping 64-bit multiplies are
  * NOT portable to engines that error on BIGINT overflow); the loss of hash
  * width is irrelevant for near-dup detection (collision rate 2^-31 per
  * comparison) and buys an exact cross-engine oracle for the signatures.
  */
object PortableHash {
  val P: Long = 2147483647L // 2^31 - 1
  val B: Long = 131L
  val Seed: Long = 7L

  /** Polynomial codepoint hash, mod P. Codepoints (not UTF-8 bytes) so the
    * same value is reachable from engines that only expose characters.
    */
  def tokenHash(s: UTF8String): Long = {
    val str = s.toString
    var h = Seed
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Multiplier of affine permutation i (never 0 mod P). */
  def permA(i: Int): Long = {
    val a = ((i + 1).toLong * 1103515245L + 12345L) % P
    if (a == 0L) 1L else a
  }

  /** Offset of affine permutation i. */
  def permB(i: Int): Long = ((i + 1).toLong * 69069L + 1L) % P
}
