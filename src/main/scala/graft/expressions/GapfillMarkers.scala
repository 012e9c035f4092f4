package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Unevaluable}
import org.apache.spark.sql.types._

/** Marker expressions for the gapfill rewrite — the reference's
  * `ts_gapfill_marker` / `locf` / `interpolate` SQL functions
  * (`sql/gapfill.sql:5-28`): placeholders that [[graft.plans.GapfillRewrite]]
  * replaces with the spine-join + window plan. They are `Unevaluable` on
  * purpose: like the reference (which errors when `time_bucket_gapfill` is
  * not a top-level GROUP BY expression), reaching execution un-rewritten is
  * a query-shape error, not silent wrong results.
  */
case class GapfillBucket(width: Expression, ts: Expression,
    start: Expression, finish: Expression,
    /** `time_bucket_gapfill(width, ts, timezone, ...)` form
      * (`sql/gapfill.sql` tz signature): buckets are fixed-width in the
      * zone's LOCAL wall-clock (DST-uneven instants).
      */
    tz: Option[Expression] = None) extends Expression with Unevaluable {
  override def children: Seq[Expression] = Seq(width, ts, start, finish) ++ tz
  override def nullable: Boolean = true
  override def dataType: DataType = ts.dataType
  override def prettyName: String = "time_bucket_gapfill"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isTs(dt: DataType) = dt == TimestampType || dt == TimestampNTZType
    def isNullLit(e: Expression) = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(null, _) => true
      case _ => false
    }
    if (!isTs(ts.dataType))
      TypeCheckResult.TypeCheckFailure(s"time_bucket_gapfill needs a timestamp, got ${ts.dataType.sql}")
    else if (!Seq(start, finish).forall(e => isNullLit(e) || (isTs(e.dataType) && e.foldable)))
      TypeCheckResult.TypeCheckFailure(
        "time_bucket_gapfill start/finish must be constant timestamps (or omitted for WHERE-clause inference)")
    else if (!tz.forall(z => z.foldable && z.dataType == StringType))
      TypeCheckResult.TypeCheckFailure(
        "time_bucket_gapfill timezone must be a constant string")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(width = c(0), ts = c(1), start = c(2), finish = c(3),
      tz = if (c.length > 4) Some(c(4)) else None)
}

/** `locf(agg [, prev [, treat_null_as_missing]])` — fill gapfilled rows
  * with the last observation; `treat_null_as_missing` also fills real NULLs.
  */
case class Locf(child: Expression, prev: Option[Expression],
    treatNullAsMissing: Boolean = false) extends Expression with Unevaluable {
  override def children: Seq[Expression] = child +: prev.toSeq
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = "locf"
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0), prev = if (c.length > 1) Some(c(1)) else None)
}

/** `interpolate(agg [, prev [, next]])` — linear interpolation across
  * gapfilled nulls. `prev`/`next` are the reference's lookup-expression
  * record arguments (`sql/gapfill.sql` interpolate signatures,
  * `interpolate.c:184-216`): a 2-field (time, value) struct supplying the
  * anchor point beyond the window's first/last real row — in SQL,
  * `interpolate(min(v), struct(TIMESTAMP '...', 0.0), NULL)`.
  */
case class Interpolate(child: Expression, prev: Option[Expression] = None,
    next: Option[Expression] = None) extends Expression with Unevaluable {
  override def children: Seq[Expression] = child +: (prev.toSeq ++ next.toSeq)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "interpolate"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isSeed(e: Expression) = e.dataType match {
      case StructType(fs) if fs.length == 2 =>
        fs(0).dataType == TimestampType || fs(0).dataType == TimestampNTZType
      case _ => false
    }
    (prev.toSeq ++ next.toSeq).find(e => !isSeed(e)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        "interpolate prev/next must be (timestamp, value) structs " +
          s"(e.g. struct(TIMESTAMP '...', 0.0)), got ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = {
    var i = 1
    val p = prev.map { _ => val v = c(i); i += 1; v }
    val n = next.map { _ => val v = c(i); i += 1; v }
    copy(child = c(0), prev = p, next = n)
  }
}
