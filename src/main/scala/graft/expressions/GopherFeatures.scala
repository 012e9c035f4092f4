package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher corpus-quality features (Rae et al. 2021, Table A1) in ONE
  * text scan. The column formulation
  * ([[graft.operators.TextAnalysis.gopher_rules_columns]]) re-reads the
  * text ~6×: a tokenizing split, a whitespace-stripping `regexp_replace`,
  * two `regexp_count`s, a per-word `split+filter+rlike`, and the stopword
  * regex. This expression computes the identical numbers in two linear
  * walks (token walk over the trimmed text; symbol/stopword walk over the
  * full text) with no regex engine, in exactly the column version's double
  * arithmetic — results are bit-identical (spec-pinned, oracle-gated by
  * q92/q93).
  *
  * Count equivalences with the column/regex formulation:
  *  - `n_words` = `token_count`: fields of `split(trim(text), "\s+")`
  *    (limit −1 keeps leading/trailing empty fields), 0 for empty trim —
  *    reproduced by counting word→space transitions plus the leading-space
  *    empty field, exactly like [[QualityScore]].
  *  - `n_chars` = `length(regexp_replace(trim(text), "\s+", ""))` = the
  *    number of non-`\s` CODE POINTS (length counts code points; trim
  *    strips only 0x20, itself `\s`, so the full text can be used).
  *  - `n_symbols` = `regexp_count(text, "#|\.\.\.")`: left-to-right
  *    non-overlapping scan — '#' advances 1, "..." advances 3 (alternation
  *    order can't matter: the branches start with different characters).
  *  - `n_alpha_words` = fields of the same split containing an ASCII
  *    letter (`rlike("[A-Za-z]")`).
  *  - `n_stopwords` = `regexp_count(lower(text), "\b(w1|...)\b")` =
  *    maximal word-character runs (Java `\b`'s Unicode class) of the
  *    code-point-lowered text equal to a stopword ([[QualityScore]]'s
  *    equivalence argument). Lowering is simple 1:1 code-point mapping;
  *    locale-special multi-char expansions (U+0130 'İ' → i + combining
  *    dot under `lower()`) are outside the pinned contract, same as
  *    QualityScore's documented exclusion.
  */
case class GopherFeatures(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = GopherFeatures.schema
  override def prettyName: String = "gopher_rules"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"gopher_rules needs a string, got ${dt.sql}")
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  private def isRegexSpace(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'
  private def isRegexSpaceCp(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'
  private def isAsciiAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  // Java \b's word class (Pattern.Bound WITHOUT UNICODE_CHARACTER_CLASS
  // is still Unicode-aware): '_' or any Unicode letter/digit — 'é'/'１'
  // join word runs and suppress stopword matches, like the regex does
  private def isWordChar(c: Int): Boolean = c == '_' || Character.isLetterOrDigit(c)

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val full = u.toString
    val trimmed = u.trim().toString // 0x20-trim, like Spark's trim()

    // ---- walk 1: tokens + alphabetic-word count over the trimmed text
    var tokens = 0
    var nAlphaWords = 0
    if (trimmed.nonEmpty) {
      tokens = 1 // split yields >= 1 field on non-empty input
      var hasAlpha = false
      var prevSpace = isRegexSpace(trimmed.charAt(0))
      if (prevSpace) tokens += 1 // leading \s → kept empty first field
      else if (isAsciiAlpha(trimmed.charAt(0))) hasAlpha = true
      var i = 1
      while (i < trimmed.length) {
        val c = trimmed.charAt(i)
        val sp = isRegexSpace(c)
        if (sp && !prevSpace) { // a field just closed
          tokens += 1
          if (hasAlpha) nAlphaWords += 1
          hasAlpha = false
        } else if (!sp && isAsciiAlpha(c)) hasAlpha = true
        prevSpace = sp
        i += 1
      }
      if (!prevSpace && hasAlpha) nAlphaWords += 1 // final non-empty field
    }

    // ---- walk 2 (full text, by code point): non-space chars, symbols,
    // stopword runs on the lowered text
    var nChars = 0
    var nSymbols = 0
    var nStop = 0
    val sb = new java.lang.StringBuilder(12)
    var i = 0
    while (i <= full.length) {
      val cp = if (i < full.length) full.codePointAt(i) else ' '.toInt
      if (i < full.length) {
        if (!isRegexSpaceCp(cp)) nChars += 1
        if (cp == '#') nSymbols += 1
        else if (cp == '.' && i + 2 < full.length &&
            full.charAt(i + 1) == '.' && full.charAt(i + 2) == '.') {
          nSymbols += 1
          // "..." consumes 3 chars; nChars/stopwords see dots as
          // punctuation either way, so only the symbol scan skips — the
          // two skipped dots still count as non-space chars and break
          // word runs exactly like the independent regexes would
          nChars += 2
          if (sb.length > 0) { // '.' is a non-word char: close the run
            if (stopSet.contains(sb.toString)) nStop += 1
            sb.setLength(0)
          }
          i += 3
          // restart loop iteration without the shared advance below
          // (the two extra dots were handled here)
          i -= Character.charCount(cp) // will be re-added below
        }
      }
      val lc = Character.toLowerCase(cp)
      if (i < full.length && isWordChar(lc)) sb.appendCodePoint(lc)
      else if (sb.length > 0) {
        if (stopSet.contains(sb.toString)) nStop += 1
        sb.setLength(0)
      }
      i += (if (i < full.length) Character.charCount(cp) else 1)
    }

    // ---- the column version's exact double arithmetic + three-valued
    // logic: ratios (and their flags) are NULL when tokens == 0, and the
    // conjunction collapses to false there (false AND NULL = false)
    val row = new GenericInternalRow(11)
    row.setInt(0, tokens)
    val passWords = tokens >= 50 && tokens <= 100000
    row.setBoolean(5, passWords)
    row.setLong(4, nStop.toLong)
    val passStop = nStop >= 2
    row.setBoolean(9, passStop)
    if (tokens > 0) {
      val toksD = tokens.toDouble
      val meanWordLen = nChars.toDouble / toksD
      val symbolRatio = nSymbols.toDouble / toksD
      val alphaFrac = nAlphaWords.toDouble / toksD
      row.setDouble(1, meanWordLen)
      row.setDouble(2, symbolRatio)
      row.setDouble(3, alphaFrac)
      val passWordLen = meanWordLen >= 3.0 && meanWordLen <= 10.0
      val passSymbols = symbolRatio <= 0.1
      val passAlpha = alphaFrac >= 0.8
      row.setBoolean(6, passWordLen)
      row.setBoolean(7, passSymbols)
      row.setBoolean(8, passAlpha)
      row.setBoolean(10, passWords && passWordLen && passSymbols && passAlpha && passStop)
    } else {
      row.setNullAt(1); row.setNullAt(2); row.setNullAt(3)
      row.setNullAt(6); row.setNullAt(7); row.setNullAt(8)
      row.setBoolean(10, false) // false AND NULL AND ... = false
    }
    row
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object GopherFeatures {
  /** Field order is load-bearing: [[GopherFeatures.nullSafeEval]] writes by
    * ordinal.
    */
  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType),
    StructField("mean_word_len", DoubleType),
    StructField("symbol_ratio", DoubleType),
    StructField("alpha_frac", DoubleType),
    StructField("n_stopwords", LongType),
    StructField("pass_word_count", BooleanType),
    StructField("pass_word_length", BooleanType),
    StructField("pass_symbol_ratio", BooleanType),
    StructField("pass_alpha_frac", BooleanType),
    StructField("pass_stopwords", BooleanType),
    StructField("pass_gopher", BooleanType)))
}
