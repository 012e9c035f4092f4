package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._

/** Shared extraction of half-open time bounds `[lo, hi)` (epoch micros) for
  * an expression from filter predicates — used by [[GapfillRewriteRule]]
  * (window inference from the WHERE clause) and [[ChunkExclusion]]
  * (catalog-driven partition pruning), mirroring the reference's
  * qual-derived restrictions (`src/hypertable_restrict_info.h:8-44`).
  *
  * Inclusive/exclusive bounds normalize to half-open: `ts > a` admits from
  * `a+1`, `ts <= b` admits through `b` (so `hi = b+1`). Conjuncts are
  * gathered through `AND`, RuntimeReplaceable wrappers (BETWEEN is one at
  * resolution time), and `With` common-expression wrappers.
  */
object TimeBounds {

  /** Conjuncts of a condition, with sugar unwrapped. */
  def conjuncts(c: Expression): Seq[Expression] = c match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case w: With =>
      val defMap = w.defs.map(d => d.id -> d.child).toMap
      conjuncts(w.child.transformUp {
        case r: CommonExpressionRef => defMap.getOrElse(r.id, r)
      })
    case rr: RuntimeReplaceable => conjuncts(rr.replacement)
    case other => Seq(other)
  }

  def evalMicros(e: Expression): Option[Long] =
    if (!e.foldable) None
    else e.eval(InternalRow.empty) match {
      case l: java.lang.Long => Some(l)
      case _                 => None
    }

  /** Tightest (lo, hi) over the conjuncts for predicates on `ts`. */
  def bounds(cond: Expression, ts: Expression): (Option[Long], Option[Long]) = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(x => lo = Some(lo.fold(x)(math.max(_, x))))
      case GreaterThan(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(x0 => { val x = x0 + 1; lo = Some(lo.fold(x)(math.max(_, x))) })
      case LessThan(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(x => hi = Some(hi.fold(x)(math.min(_, x))))
      case LessThanOrEqual(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(x0 => { val x = x0 + 1; hi = Some(hi.fold(x)(math.min(_, x))) })
      // reversed operand order: literal OP ts
      case GreaterThanOrEqual(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(x0 => { val x = x0 + 1; hi = Some(hi.fold(x)(math.min(_, x))) })
      case GreaterThan(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(x => hi = Some(hi.fold(x)(math.min(_, x))))
      case LessThan(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(x0 => { val x = x0 + 1; lo = Some(lo.fold(x)(math.max(_, x))) })
      case LessThanOrEqual(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(x => lo = Some(lo.fold(x)(math.max(_, x))))
      case EqualTo(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach { x =>
          lo = Some(lo.fold(x)(math.max(_, x)))
          hi = Some(hi.fold(x + 1)(math.min(_, x + 1)))
        }
      case EqualTo(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach { x =>
          lo = Some(lo.fold(x)(math.max(_, x)))
          hi = Some(hi.fold(x + 1)(math.min(_, x + 1)))
        }
      case _ => ()
    }
    (lo, hi)
  }
}
