package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_jaccard(text)` against a FIXED probe document: Jaccard of the
  * word-n-gram shingle sets, one pass per row. The probe's shingle set is
  * built once per expression instance — the column formulation
  * (`array_intersect`/`array_union` against a literal array) rebuilds the
  * probe hash set per row per call and constructs every shingle string
  * twice; this is the "compare the corpus against one document" kernel of
  * near-dup verification.
  *
  * Shingling matches [[graft.operators.Dedup.shingles]] exactly: tokens =
  * `trim.split("\\s+")`, grams i ∈ [0, max(nt−n, 0)] of `slice(i, i+n)`
  * joined with one space, distinct.
  */
case class NGramJaccard(child: Expression, probeShingles: Seq[String], n: Int)
    extends UnaryExpression with NullSafeEvalCodegen {
  require(n >= 1, "ngram_jaccard: n must be positive")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_jaccard needs a string column, got ${dt.sql}")
  }

  @transient private lazy val probeSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](probeShingles.size * 2)
    probeShingles.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any = {
    // UTF8String.trim strips 0x20 only — same as SQL trim (Java's
    // String.trim would also strip tabs/newlines and diverge).
    // String.split("\\s+") has no single-char fast path, so it would
    // compile a fresh Pattern PER ROW — the shared precompiled Pattern is
    // semantically identical (String.split delegates to Pattern.split).
    val toks = NGramJaccard.ws.split(v.asInstanceOf[UTF8String].trim().toString)
    val grams = math.max(toks.length - n, 0)
    val seen = new java.util.HashSet[String](math.max(16, grams * 2))
    var inter = 0
    var i = 0
    while (i <= grams) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + n, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val g = sb.toString
      if (seen.add(g) && probeSet.contains(g)) inter += 1
      i += 1
    }
    val union = seen.size + probeSet.size - inter
    if (union == 0) null else inter.toDouble / union.toDouble
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NGramJaccard {
  private val ws = java.util.regex.Pattern.compile("\\s+")
}
