package graft.expressions

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
  * `like` contributes only its type: the replacement drops it, so any
  * computation inside (window anchors included) costs nothing here.
  */
case class CastLike(value: Expression, like: Expression)
    extends RuntimeReplaceable {
  override lazy val replacement: Expression = Cast(value, like.dataType)
  override def children: Seq[Expression] = Seq(value, like)
  override def prettyName: String = "cast_like"
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(value = cs(0), like = cs(1))
}
