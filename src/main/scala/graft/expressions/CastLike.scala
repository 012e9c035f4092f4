package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, RuntimeReplaceable}

/** `cast_like(value, like)` — cast `value` to `like`'s RESOLVED type,
  * decided at analysis time. Used by [[graft.operators.Gapfill.interpolate]]
  * to coerce a user-supplied prev/next seed record to the interpolated
  * column's exact type: the reference binds the seed record to the
  * column's type at the call (`tsl/src/nodes/gapfill/interpolate.c` reads
  * the record through the column's typecache), and [[Lerp]] requires both
  * anchors in ONE type — without the coercion, Spark's coalesce would
  * instead WIDEN the seeded anchor (long column + double seed → double on
  * one side only) and fail Lerp's type check.
  *
  * Only LOSSLESS coercions are accepted (`Cast.canUpCast`: int seed on a
  * long column, float on double, …). A lossy one — a double seed like 0.9
  * on a long column — is an analysis-time error, mirroring the
  * reference's "invalid interpolate function argument" datatype check
  * (`interpolate.c:138-148` errors when the record's value type does not
  * match the column type; it never coerces, so a silent truncation here
  * would alter results the reference refuses to compute).
  *
  * `like` contributes only its type: the replacement drops it, so any
  * computation inside (window anchors included) costs nothing here.
  */
case class CastLike(value: Expression, like: Expression)
    extends RuntimeReplaceable {

  import org.apache.spark.sql.types._

  /** Value-lossless coercion check. Differs from `Cast.canUpCast` in two
    * deliberate ways: (a) nullability never matters — the seed is a
    * literal record and the window anchor's nullability is an artifact of
    * the gapfill plan, so two structs differing only there must compare
    * equal (canUpCast would refuse nullable→non-null and print two
    * identical-looking types at the user); (b) the integral→floating
    * upcasts Spark permits by numeric precedence (long→double/float,
    * int→float) are REFUSED — they lose magnitude bits, and "lossless" is
    * the whole point of the check.
    */
  private def lossless(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f: StructType, t: StructType) if f.length == t.length =>
      f.fields.zip(t.fields).forall { case (a, b) =>
        lossless(a.dataType, b.dataType) }
    case (LongType, DoubleType | FloatType) => false
    case (IntegerType, FloatType) => false
    case (f, t) => f.sql == t.sql || Cast.canUpCast(f, t)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (lossless(value.dataType, like.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interpolate seed of type ${value.dataType.simpleString} does not " +
        s"losslessly match the value column's type " +
        s"${like.dataType.simpleString} — the reference errors on a " +
        "datatype mismatch (interpolate.c); CAST the seed's value to the " +
        "column's own type (e.g. CAST(0.9 AS DOUBLE) on a double column)")
  override lazy val replacement: Expression =
    if (value.dataType == like.dataType) value
    else Cast(value, like.dataType)
  override def children: Seq[Expression] = Seq(value, like)
  override def prettyName: String = "cast_like"
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(value = cs(0), like = cs(1))
}
