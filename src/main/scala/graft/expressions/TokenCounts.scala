package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared char classes for the single-pass token counters — Java regex
  * `\s` (ASCII set; NOT Character.isWhitespace, which adds U+001C-1F etc.
  * the regexes never match).
  */
private[expressions] object TokenCountUtil {
  def isRegexSpace(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

/** `token_count(text)` in ONE scan — exactly
  * `when(length(trim(text)) = 0, 0, size(split(trim(text), "\s+")))`
  * (the column formulation, kept as `token_count_columns` and
  * spec-pinned bit-for-bit): UTF8String.trim strips 0x20 only, so a
  * leading non-space whitespace char yields split's empty FIRST field
  * (counted); split's limit -1 keeps trailing empty fields (counted by
  * the nonspace→space transition). The column form materializes the full
  * token ARRAY per row just to take its size — per-row allocation the
  * counter loop avoids; q11 at the sf1 point spent most of its time
  * there.
  */
case class TokenCount(child: Expression)
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_count needs a string, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    import TokenCountUtil.isRegexSpace
    val trimmed = v.asInstanceOf[UTF8String].trim().toString
    if (trimmed.isEmpty) 0
    else {
      var tokens = 1 // split yields >= 1 field on non-empty input
      var prevSpace = isRegexSpace(trimmed.charAt(0)) // leading \s → empty first field
      if (prevSpace) tokens += 1
      var i = 1
      while (i < trimmed.length) {
        val sp = isRegexSpace(trimmed.charAt(i))
        if (sp && !prevSpace) tokens += 1
        prevSpace = sp
        i += 1
      }
      tokens
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** `subword_count(text)` in ONE scan — exactly
  * `regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')` (kept as
  * `subword_count_columns`, spec-pinned): the alternation's matches are
  * maximal ASCII-alpha runs, maximal ASCII-digit runs, and every other
  * non-`\s` CODE POINT individually (Java regex classes match full code
  * points — an astral emoji is ONE `[^...]` match, not two surrogate
  * matches, hence the codePointAt walk).
  */
case class SubwordCount(child: Expression)
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "subword_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"subword_count needs a string, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    import TokenCountUtil.isRegexSpace
    val s = v.asInstanceOf[UTF8String].toString
    var i = 0
    var cnt = 0
    var run = 0 // 0 = none/space, 1 = alpha run, 2 = digit run
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
        if (run != 1) { cnt += 1; run = 1 }
      } else if (cp >= '0' && cp <= '9') {
        if (run != 2) { cnt += 1; run = 2 }
      } else if (isRegexSpace(cp)) run = 0
      else { cnt += 1; run = 0 } // single-code-point match
      i += Character.charCount(cp)
    }
    cnt
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}
