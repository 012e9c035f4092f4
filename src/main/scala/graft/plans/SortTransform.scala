package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TruncDate, TruncTimestamp}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

import graft.expressions.TimeBucket

/** Monotone-function sort rewrite — the reference's sort_transform
  * (`src/sort_transform.c:7-15`): `ORDER BY f(time)` is re-expressed as
  * `ORDER BY time` when `f` is non-decreasing, so downstream machinery can
  * sort on the raw column (cheaper comparisons, and any ordering-aware
  * path — e.g. top-k over time-ordered data — sees the natural column).
  *
  * Only the LAST sort key may be rewritten: for a prefix key, rows equal
  * under `f(time)` but distinct under `time` would have their tie-break
  * keys reordered. A trailing key only ever *refines* the required order
  * (time-sorted ⇒ f(time)-sorted for monotone f), which SQL permits.
  *
  * Recognized monotone shapes: `time_bucket(w, ts [, origin/offset])` with
  * foldable width/origin, `date_trunc(unit, ts)`, `trunc(date, unit)`, and
  * `CAST(ts AS DATE)`.
  */
object SortTransform extends Rule[LogicalPlan] {

  private def monotoneArg(e: Expression): Option[Expression] = e match {
    case TimeBucket(w, ts, third) if w.foldable && third.forall(_.foldable) =>
      Some(ts)
    case TruncTimestamp(fmt, ts, _) if fmt.foldable => Some(ts)
    case TruncDate(date, fmt) if fmt.foldable       => Some(date)
    case c: Cast if c.dataType == DateType &&
        (c.child.dataType == TimestampType || c.child.dataType == TimestampNTZType) =>
      Some(c.child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!Toggles.sortTransform) plan else plan.transform {
    case s @ Sort(orders, _, _, _) if orders.nonEmpty =>
      val last = orders.last
      monotoneArg(last.child) match {
        case Some(arg) =>
          s.copy(order = orders.init :+ last.copy(child = arg))
        case None => s
      }
  }
}
