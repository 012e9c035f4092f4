package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, EvalMode, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.Hypertable

/** Automatic chunk exclusion from the WHERE clause — the reference's
  * transparent hypertable expansion (`src/planner/expand_hypertable.c:
  * 1007-1172`, restrict-info `src/hypertable_restrict_info.h:8-44`):
  * `ht.read().where($"ts" >= a && $"ts" < b)` plans exactly like
  * `ht.between(a, b)`, without the user naming `_chunk`.
  *
  * The rule matches a Filter over a registered hypertable scan, derives
  * `[lo, hi)` micros bounds on the time column from the predicates
  * ([[TimeBounds]] — the same qual extraction gapfill uses), consults the
  * CHUNK CATALOG (dir listing + `_graft_range` files, so merged/split
  * chunks with non-arithmetic ranges resolve correctly), and conjoins a
  * `_chunk IN (...)` partition filter. Spark's FileSourceStrategy turns
  * that into metadata-only partition pruning — no chunk dir is listed, no
  * footer read, for excluded chunks.
  *
  * Idempotent: skips when the predicate already references `_chunk`
  * (including its own output and [[Hypertable.between]] plans).
  */
object ChunkExclusion extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: LogicalRelation) => exclude(f, cond, rel)
  }

  private def exclude(f: Filter, cond: Expression, rel: LogicalRelation): LogicalPlan = {
    val roots = rel.relation match {
      case hfs: HadoopFsRelation => hfs.location.rootPaths
      case _                     => return f
    }
    if (roots.size != 1) return f
    val (timeCol, lister) = Hypertable.lookupExclusion(roots.head.toString).getOrElse(return f)
    val ts = rel.output.find(_.name == timeCol).getOrElse(return f)
    val chunkAttr = rel.output.find(_.name == Hypertable.CHUNK).getOrElse(return f)
    if (cond.references.contains(chunkAttr)) return f // already excluded
    val (lo, hi) = TimeBounds.bounds(cond, ts)
    if (lo.isEmpty && hi.isEmpty) return f
    val (l, h) = (lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue))
    val chunks = lister()
    val hits = chunks.filter(c => c.startMicros < h && c.endMicros > l)
    if (hits.size == chunks.size) return f // nothing to exclude
    // literals in the PARTITION COLUMN's inferred type: small integral chunk
    // keys (bigint dims with narrow widths) infer `_chunk` as IntegerType,
    // and this In is spliced into an already-analyzed plan, so no coercion
    // runs — a LongType literal against an Int attr would compare raw types
    // at evaluation. Values came from the directory names, so the narrowing
    // is lossless.
    val in: Expression =
      if (hits.isEmpty) Literal(false)
      else In(chunkAttr, hits.map(c => Literal.create(
        Cast(Literal(c.startMicros), chunkAttr.dataType, None, EvalMode.LEGACY).eval(null),
        chunkAttr.dataType)))
    Filter(And(in, cond), rel)
  }
}
