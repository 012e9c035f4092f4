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

  /** Sound interval cover of `cond` for `ts`: half-open `[lo, hi)`
    * intervals (Long.MinValue/MaxValue = unbounded) whose union admits
    * every row the predicate can — the disjunction-aware generalization of
    * [[bounds]], mirroring the reference's OR-capable restrict-info
    * (`src/hypertable_restrict_info.c` collects one restriction per
    * arm and unions chunk sets). `None` = no time constraint derivable
    * (prune nothing); `Some(Nil)` = provably empty (prune everything).
    *
    *  - `AND`: a side with no constraint is the full range, so the other
    *    side's cover stands; two covers intersect pairwise.
    *  - `OR`: both arms must constrain time — an unconstrained arm admits
    *    everything and poisons the disjunction.
    */
  def intervalCover(cond: Expression, ts: Expression): Option[Seq[(Long, Long)]] = cond match {
    case Or(l, r) =>
      for { a <- intervalCover(l, ts); b <- intervalCover(r, ts) } yield a ++ b
    case And(l, r) =>
      (intervalCover(l, ts), intervalCover(r, ts)) match {
        case (None, x) => x
        case (x, None) => x
        case (Some(a), Some(b)) =>
          Some(for {
            (al, ah) <- a
            (bl, bh) <- b
            lo = math.max(al, bl)
            hi = math.min(ah, bh)
            if lo < hi
          } yield (lo, hi))
      }
    case w: With =>
      val defMap = w.defs.map(d => d.id -> d.child).toMap
      intervalCover(w.child.transformUp {
        case r: CommonExpressionRef => defMap.getOrElse(r.id, r)
      }, ts)
    case rr: RuntimeReplaceable => intervalCover(rr.replacement, ts)
    case leaf =>
      bounds(leaf, ts) match {
        case (None, None) => None
        case (lo, hi) =>
          val l = lo.getOrElse(Long.MinValue)
          val h = hi.getOrElse(Long.MaxValue)
          Some(if (l < h) Seq((l, h)) else Nil)
      }
  }

  /** Tightest (lo, hi) over the conjuncts for predicates on `ts`.
    *
    * The inclusive→exclusive `+1` must not wrap at `Long.MaxValue` (a
    * common "no upper bound" encoding on bigint dims): a wrapped `hi`
    * of `Long.MinValue` would turn the pruning filter into
    * exclude-everything. An inclusive upper bound AT MaxValue is simply
    * unbounded; a lower bound that would wrap (`ts > MaxValue`) saturates
    * to MaxValue — a sound over-approximation of the empty range.
    */
  def bounds(cond: Expression, ts: Expression): (Option[Long], Option[Long]) = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tightenLo(x: Long): Unit = lo = Some(lo.fold(x)(math.max(_, x)))
    def tightenHi(x: Long): Unit = hi = Some(hi.fold(x)(math.min(_, x)))
    def tightenLoExcl(x: Long): Unit =
      tightenLo(if (x == Long.MaxValue) Long.MaxValue else x + 1)
    def tightenHiIncl(x: Long): Unit =
      if (x != Long.MaxValue) tightenHi(x + 1) // <= MaxValue: unbounded
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(tightenLo)
      case GreaterThan(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(tightenLoExcl)
      case LessThan(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(tightenHi)
      case LessThanOrEqual(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(tightenHiIncl)
      // reversed operand order: literal OP ts
      case GreaterThanOrEqual(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(tightenHiIncl)
      case GreaterThan(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(tightenHi)
      case LessThan(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(tightenLoExcl)
      case LessThanOrEqual(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach(tightenLo)
      case EqualTo(e, v) if e.semanticEquals(ts) =>
        evalMicros(v).foreach { x => tightenLo(x); tightenHiIncl(x) }
      case EqualTo(v, e) if e.semanticEquals(ts) =>
        evalMicros(v).foreach { x => tightenLo(x); tightenHiIncl(x) }
      case _ => ()
    }
    (lo, hi)
  }
}
