package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_text(text)`: canonical text normalization for dedup /
  * fingerprint keys, in ONE pass over the decoded string:
  *
  *   1. Unicode NFC composition (java.text.Normalizer — é as e+◌́ and é
  *      as U+00E9 normalize to the same key);
  *   2. whitespace runs (space, \t, \n, \f, \r, ) collapse to one
  *      space, leading/trailing runs drop (= `trim` + `regexp_replace
  *      (\s+, ' ')` without two extra string rewrites);
  *   3. per-code-point simple lowercasing (Character.toLowerCase — the
  *      1:1 Unicode mapping; locale/full mappings like İ→i̇ are out of
  *      contract, matching the engine-portable `lower()` behavior).
  *
  * The column formulation costs three full rewrites (regexp_replace, trim,
  * lower) plus no NFC at all (Spark has no normalizer function); this is
  * one NFC pass (a no-op scan for already-composed text) plus one build.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"normalize_text needs a string, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(NormalizeText.normalize(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NormalizeText {
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r' || cp == 0x0B

  def normalize(raw: String): String = {
    val s =
      if (java.text.Normalizer.isNormalized(raw, java.text.Normalizer.Form.NFC)) raw
      else java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isWs(cp)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }
}
