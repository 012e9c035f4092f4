package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lang_id(text)`: marker-word language heuristic in ONE scan.
  *
  * The column formulation (`regexp_count(lower(text), \b(...)\b)` per
  * language, referenced repeatedly by the argmax when-chain) re-runs up to
  * 16 regex passes per row. `\b(m1|m2|...)\b` over all-letter markers
  * matches exactly the MAXIMAL word-character runs equal to a marker, so a
  * single scan that splits `[A-Za-z0-9_]+` runs and looks each up in a
  * marker→language map produces identical counts.
  *
  * Languages, markers, and the tie order (en > fr > de > es, 'und' when
  * no marker hits) mirror [[graft.operators.TextAnalysis.LANG_MARKERS]].
  */
case class LangId(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"lang_id needs a string, got ${dt.sql}")
  }

  @transient private lazy val langs: Array[String] = markers.map(_._1).toArray
  @transient private lazy val markerLang: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    markers.zipWithIndex.foreach { case ((_, ws), i) => ws.foreach(w => m.put(w, i)) }
    m
  }

  // Java \b's word class (Pattern.Bound is Unicode-aware even WITHOUT
  // UNICODE_CHARACTER_CLASS): '_' or any Unicode letter/digit — 'é'
  // joins a word run and suppresses a marker match, like the regex does
  private def isWordChar(c: Int): Boolean = c == '_' || Character.isLetterOrDigit(c)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](langs.length)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = s.length
    // by CODE POINT, lowercased BEFORE classification: marker runs live on
    // lower(text), where e.g. U+212A (Kelvin) lowers into ASCII 'k' and
    // joins a word run exactly as `\b...\b` over lower() sees it. Simple
    // 1:1 code-point lowering; locale-special expansions are out of
    // contract (spec-tested).
    while (i <= n) {
      val cp = if (i < n) s.codePointAt(i) else ' '.toInt
      val lc = Character.toLowerCase(cp)
      if (i < n && isWordChar(lc)) sb.appendCodePoint(lc)
      else if (sb.length > 0) {
        val l = markerLang.get(sb.toString)
        if (l != null) counts(l.intValue()) += 1
        sb.setLength(0)
      }
      i += (if (i < n) Character.charCount(cp) else 1)
    }
    val total = counts.sum
    if (total == 0) UTF8String.fromString("und")
    else {
      // argmax with first-wins tie order (same as the when-chain)
      var best = 0
      var b = 1
      while (b < counts.length) {
        if (counts(b) > counts(best)) best = b
        b += 1
      }
      UTF8String.fromString(langs(best))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
