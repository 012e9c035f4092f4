package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PII redaction + per-kind counts in hand-rolled linear scans — the
  * column formulation ([[graft.operators.TextAnalysis]]) is 4 chained
  * `regexp_replace` passes plus 4 independent `regexp_count`s: 8 regex
  * traversals and 8 UTF8String↔String round-trips per row. This expression
  * decodes once and replaces the regex engine with direct character
  * scanners for the four fixed patterns, reproducing
  * `java.util.regex` semantics exactly (spec-pinned equivalence):
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: a match
  *    starts at the beginning of the maximal local-char run immediately
  *    before a '@' (clamped to the scan position — greedy `+` consumes the
  *    whole run, and '@' is not local-class so no backtrack can split it),
  *    and ends after the longest domain prefix that terminates in
  *    `\.[letters]{2,}` — i.e. at the LAST '.' of the maximal domain run
  *    that is followed by ≥2 ASCII letters, plus the full greedy letter
  *    run (first-group-greedy backtracking order).
  *  - ipv4 `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`: each `\d{1,3}` must
  *    consume a COMPLETE digit run of length 1–3 — a longer run can
  *    neither match greedily (next char is a digit, not '.') nor backtrack
  *    (same reason), and the trailing `\b` forces the same for the last
  *    group.
  *  - ssn/phone (`\d{3}-\d{2}-\d{4}` / `\d{3}-\d{3}-\d{4}` with `\b`):
  *    fixed-count groups — digit runs must have exactly the stated
  *    lengths.
  *
  * Character classes (`\d`, the email classes) are ASCII
  * (`Pattern.compile` without UNICODE_CHARACTER_CLASS) — but Java's `\b`
  * is NOT: even without the flag, `Pattern.Bound` classifies word
  * characters as `'_' || Character.isLetterOrDigit(codePoint)`, so 'é',
  * '１' (full-width one), and astral letters suppress boundaries while
  * '€' or an emoji does not (verified empirically; a 100k-string fuzz
  * caught the ASCII approximation diverging). The scanners replicate the
  * Unicode rule by code point, surrogate pairs included. RE2's `\b` stays
  * ASCII — the engine-portability claim for the oracle therefore holds on
  * ASCII text (the oracle corpus); the expression pins JAVA (= Spark
  * column) semantics.
  *
  * Redaction applies the kinds IN ORDER to the progressively-replaced
  * text (sequential `regexp_replace` semantics — e.g. a dotted-quad glued
  * to a replaced email gains a word boundary and IS redacted by the ipv4
  * pass); counts are per-kind over the ORIGINAL text, like the
  * independent `regexp_count` columns.
  */
case class PiiScan(child: Expression, kinds: Seq[String])
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = PiiScan.schema
  override def prettyName: String = "pii_scan"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"pii_scan needs a string, got ${dt.sql}")
  }

  import PiiScan._

  @transient private lazy val enabled: Array[Boolean] =
    Array(kinds.contains("email"), kinds.contains("ipv4"),
      kinds.contains("ssn"), kinds.contains("phone_us"))

  override def nullSafeEval(v: Any): Any = {
    val full = v.asInstanceOf[UTF8String].toString

    val row = new GenericInternalRow(5)
    // counts over the ORIGINAL text, one scanner pass per kind
    val scratch = new java.util.ArrayList[Int](8)
    scratch.clear(); scanEmail(full, scratch)
    row.setInt(1, scratch.size / 2)
    var redacted = if (enabled(0)) replace(full, scratch, "<EMAIL>") else full
    scratch.clear(); scanIpv4(full, scratch)
    row.setInt(2, scratch.size / 2)
    if (enabled(1)) {
      scratch.clear(); scanIpv4(redacted, scratch)
      redacted = replace(redacted, scratch, "<IP>")
    }
    scratch.clear(); scanDashed(full, 3, 2, 4, scratch)
    row.setInt(3, scratch.size / 2)
    if (enabled(2)) {
      scratch.clear(); scanDashed(redacted, 3, 2, 4, scratch)
      redacted = replace(redacted, scratch, "<SSN>")
    }
    scratch.clear(); scanDashed(full, 3, 3, 4, scratch)
    row.setInt(4, scratch.size / 2)
    if (enabled(3)) {
      scratch.clear(); scanDashed(redacted, 3, 3, 4, scratch)
      redacted = replace(redacted, scratch, "<PHONE>")
    }
    row.update(0, UTF8String.fromString(redacted))
    row
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PiiScan {
  /** redacted + per-kind counts; ordinals match [[PiiScan.nullSafeEval]]. */
  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType),
    StructField("n_email", IntegerType),
    StructField("n_ipv4", IntegerType),
    StructField("n_ssn", IntegerType),
    StructField("n_phone_us", IntegerType)))

  /** Java `\b`'s word class (Pattern.Bound without UNICODE_CHARACTER_CLASS):
    * `'_' || Character.isLetterOrDigit` — Unicode-aware, unlike `\w`.
    */
  private def isWordCp(cp: Int): Boolean = cp == '_' || Character.isLetterOrDigit(cp)
  /** Word-ness of the code point ENDING at index i (false at start). */
  private def wordBefore(s: String, i: Int): Boolean =
    i > 0 && isWordCp(s.codePointBefore(i))
  /** Word-ness of the code point STARTING at index i (false at end). */
  private def wordAt(s: String, i: Int): Boolean =
    i < s.length && isWordCp(s.codePointAt(i))
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isLocal(c: Char): Boolean = // email local part class
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  private def isDomain(c: Char): Boolean = // email domain class
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** Apply non-overlapping, ascending [start,end) spans with `repl`. */
  private def replace(s: String, spans: java.util.ArrayList[Int],
      repl: String): String = {
    if (spans.isEmpty) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    var k = 0
    while (k < spans.size) {
      sb.append(s, last, spans.get(k)).append(repl)
      last = spans.get(k + 1)
      k += 2
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Non-overlapping leftmost email matches, appended as (start, end). */
  private[expressions] def scanEmail(s: String,
      out: java.util.ArrayList[Int]): Unit = {
    val n = s.length
    var pos = 0 // scan region start (after the previous match)
    var at = s.indexOf('@')
    while (at >= 0) {
      if (at >= pos) {
        // maximal local run immediately before '@', clamped to pos
        var l = at
        while (l > pos && isLocal(s.charAt(l - 1))) l -= 1
        if (l < at) {
          // maximal domain run after '@'
          var endD = at + 1
          while (endD < n && isDomain(s.charAt(endD))) endD += 1
          // last '.' at index >= at+2 followed by >= 2 ASCII letters
          var m = endD - 3 // need at least 2 letters after the dot
          var matched = false
          while (!matched && m >= at + 2) {
            if (s.charAt(m) == '.' && isAlpha(s.charAt(m + 1)) && isAlpha(s.charAt(m + 2))) {
              var e = m + 3
              while (e < n && isAlpha(s.charAt(e))) e += 1 // greedy {2,}
              out.add(l); out.add(e)
              pos = e
              matched = true
            } else m -= 1
          }
        }
      }
      at = s.indexOf('@', at + 1)
    }
  }

  /** `\b\d{1,3}(\.\d{1,3}){3}\b` — each group a complete 1–3 digit run. */
  private[expressions] def scanIpv4(s: String,
      out: java.util.ArrayList[Int]): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      if (isDigit(s.charAt(i)) && !wordBefore(s, i)) {
        // attempt at this boundary-started digit run
        var p = i
        var ok = true
        var g = 0
        while (ok && g < 4) {
          val rs = p
          while (p < n && isDigit(s.charAt(p))) p += 1
          val len = p - rs
          if (len < 1 || len > 3) ok = false
          else if (g < 3) {
            if (p < n && s.charAt(p) == '.') p += 1 else ok = false
          } else ok = !wordAt(s, p) // trailing \b
          g += 1
        }
        if (ok) { out.add(i); out.add(p); i = p }
        else {
          // no later start inside THIS digit run can carry a boundary;
          // resume at the next character after the run's first char
          i += 1
        }
      } else i += 1
    }
  }

  /** `\b\d{a}-\d{b}-\d{c}\b` with exact group lengths. */
  private[expressions] def scanDashed(s: String, a: Int, b: Int, c: Int,
      out: java.util.ArrayList[Int]): Unit = {
    val n = s.length
    var i = 0
    def runLen(from: Int): Int = {
      var p = from
      while (p < n && isDigit(s.charAt(p))) p += 1
      p - from
    }
    while (i < n) {
      if (isDigit(s.charAt(i)) && !wordBefore(s, i)) {
        val e =
          if (runLen(i) == a && i + a < n && s.charAt(i + a) == '-' &&
              runLen(i + a + 1) == b && i + a + 1 + b < n &&
              s.charAt(i + a + 1 + b) == '-' &&
              runLen(i + a + b + 2) == c) i + a + b + c + 2
          else -1
        // trailing \b: the code point after the last digit group must be
        // non-word or end (runLen == c already guarantees no digit
        // follows; a letter — ASCII or not — or '_' could)
        if (e > 0 && !wordAt(s, e)) {
          out.add(i); out.add(e); i = e
        } else i += 1
      } else i += 1
    }
  }
}
