package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `quality_score(text)` in ONE scan — the column formulation runs three
  * regex passes (punct, stopwords) plus a tokenizing split, with the token
  * count duplicated across the formula. A single pass classifies each
  * character and the formula is evaluated in EXACTLY the column version's
  * double arithmetic order, so results (and the DuckDB oracle) are
  * unchanged:
  *
  *   0.5·min(tokens/50, 1) + 0.3·(1 − punct/chars) + 0.2·min(5·stop/max(tokens,1), 1)
  *
  * Count equivalences: tokens = `split(trim(text), "\s+")` field count
  * (trim strips 0x20 only; a leading non-space whitespace yields the empty
  * first field, reproduced here); punct = matches of `[^A-Za-z0-9\s]`
  * (single chars); stop = `\b(w1|...)\b` matches of all-letter stopwords
  * on the lowered text = maximal word-char runs equal to a stopword.
  */
case class QualityScore(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"quality_score needs a string, got ${dt.sql}")
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  private def isRegexSpace(c: Int): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  // Java \b's word class (Pattern.Bound is Unicode-aware even WITHOUT
  // UNICODE_CHARACTER_CLASS): '_' or any Unicode letter/digit — 'é'
  // joins a word run and suppresses a stopword match, like the regex does
  private def isWordChar(c: Int): Boolean = c == '_' || Character.isLetterOrDigit(c)
  private def isAlnum(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val full = u.toString
    val chars = math.max(full.codePointCount(0, full.length), 1).toDouble
    var punct = 0
    var stop = 0
    // tokens over the 0x20-trimmed text, like split(trim(text), "\s+")
    val trimmed = u.trim().toString
    var tokens = 0
    if (trimmed.nonEmpty) {
      tokens = 1 // split yields >= 1 field on non-empty input
      var prevSpace = isRegexSpace(trimmed.charAt(0)) // leading \s → empty first field
      if (prevSpace) tokens += 1
      var i = 1
      while (i < trimmed.length) {
        val sp = isRegexSpace(trimmed.charAt(i))
        if (sp && !prevSpace) tokens += 1
        prevSpace = sp
        i += 1
      }
      // NOTE: Spark's split uses limit -1, so a trailing \s run yields a
      // kept empty field — already counted by the transition above
    }
    // punct + stopword runs over the FULL text, iterated by CODE POINT
    // (like the regexes): a surrogate-pair punctuation char is ONE
    // `[^A-Za-z0-9\s]` match, not two. Stopword runs live on lower(text),
    // so the code point is lowercased BEFORE classification — U+212A
    // (Kelvin) lowers into ASCII 'k' and joins a word run exactly as the
    // regex over lower() sees it. Lowering is simple 1:1 code-point
    // mapping; locale-special multi-char expansions (İ → i + combining
    // dot) are outside the pinned contract (spec-tested).
    val sb = new java.lang.StringBuilder(12)
    var i = 0
    while (i <= full.length) {
      val cp = if (i < full.length) full.codePointAt(i) else ' '.toInt
      if (i < full.length && !isAlnum(cp) && !isRegexSpace(cp)) punct += 1
      val lc = Character.toLowerCase(cp)
      if (i < full.length && isWordChar(lc)) sb.appendCodePoint(lc)
      else if (sb.length > 0) {
        if (stopSet.contains(sb.toString)) stop += 1
        sb.setLength(0)
      }
      i += (if (i < full.length) Character.charCount(cp) else 1)
    }
    val toks = tokens.toDouble
    0.5 * math.min(toks / 50.0, 1.0) +
      0.3 * (1.0 - punct.toDouble / chars) +
      0.2 * math.min(stop.toDouble * 5.0 / math.max(toks, 1.0), 1.0)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
