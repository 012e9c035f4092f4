package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualNullSafe, EqualTo, EvalMode, Expression, In, Literal, Murmur3Hash}
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
  * The rule matches a Filter over a registered hypertable scan and prunes
  * BOTH dimension kinds (`src/dimension.h:62-69`):
  *
  *  - OPEN (time): derives `[lo, hi)` micros bounds on the time column
  *    from the predicates ([[TimeBounds]] — the same qual extraction
  *    gapfill uses), consults the CHUNK CATALOG (dir listing +
  *    `_graft_range` files, so merged/split chunks with non-arithmetic
  *    ranges resolve correctly), and conjoins a `_chunk IN (...)` filter.
  *  - CLOSED (space): equality / IN predicates on the declared space
  *    column map through the same murmur3 hash the write path used
  *    (`pmod(hash(col), N)` — the reference's `ts_get_partition_hash`
  *    analogue, `src/partitioning.c:454-468`) to a `_space IN (...)`
  *    filter, so a point lookup reads 1/N of each time chunk.
  *
  * Spark's FileSourceStrategy turns both into metadata-only partition
  * pruning — no dir listing, no footer read, for excluded partitions.
  *
  * Idempotent: skips a dimension when the predicate already references its
  * partition column (including this rule's own output and
  * [[Hypertable.between]] plans).
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
    val reg = Hypertable.lookupExclusion(roots.head.toString).getOrElse(return f)

    val timeIn = timeFilter(cond, rel, reg)
    val spaceIn = spaceFilter(cond, rel, reg)
    if (timeIn.isEmpty && spaceIn.isEmpty) return f
    Filter((timeIn.toSeq ++ spaceIn.toSeq :+ cond).reduceLeft(And),
      rel)
  }

  /** `_chunk IN (...)` from time-column range predicates, or None. */
  private def timeFilter(cond: Expression, rel: LogicalRelation,
      reg: Hypertable.ExclusionInfo): Option[Expression] = {
    val ts = rel.output.find(_.name == reg.timeCol).getOrElse(return None)
    val chunkAttr = rel.output.find(_.name == Hypertable.CHUNK).getOrElse(return None)
    if (cond.references.contains(chunkAttr)) return None // already excluded
    val (lo, hi) = TimeBounds.bounds(cond, ts)
    if (lo.isEmpty && hi.isEmpty) return None
    val (l, h) = (lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue))
    val chunks = reg.chunks()
    val hits = chunks.filter(c => c.startMicros < h && c.endMicros > l)
    if (hits.size == chunks.size) return None // nothing to exclude
    // literals in the PARTITION COLUMN's inferred type: small integral chunk
    // keys (bigint dims with narrow widths) infer `_chunk` as IntegerType,
    // and this In is spliced into an already-analyzed plan, so no coercion
    // runs — a LongType literal against an Int attr would compare raw types
    // at evaluation. Values came from the directory names, so the narrowing
    // is lossless.
    Some(
      if (hits.isEmpty) Literal(false)
      else In(chunkAttr, hits.map(c => typed(c.startMicros, chunkAttr))))
  }

  /** `_space IN (...)` from space-column equality predicates, or None. */
  private def spaceFilter(cond: Expression, rel: LogicalRelation,
      reg: Hypertable.ExclusionInfo): Option[Expression] = {
    val (scName, nParts) = reg.space.getOrElse(return None)
    val sAttr = rel.output.find(_.name == Hypertable.SPACE).getOrElse(return None)
    if (cond.references.contains(sAttr)) return None // already excluded
    val vAttr = rel.output.find(_.name == scName).getOrElse(return None)
    val values = equalityValues(cond, vAttr).getOrElse(return None)
    val buckets = values.map { lit =>
      // the write path's pmod(hash(col), N): murmur3 with Spark's seed 42
      val h = Murmur3Hash(Seq(lit), 42).eval(null).asInstanceOf[Int]
      ((h % nParts) + nParts) % nParts
    }.distinct
    if (buckets.size >= nParts) return None // nothing to exclude
    Some(In(sAttr, buckets.map(b => typed(b.toLong, sAttr))))
  }

  /** Literal values `a` is pinned to by a top-level conjunct (`a = v`,
    * `v = a`, `a <=> v`, `a IN (v...)`), or None.
    */
  private def equalityValues(cond: Expression, a: Attribute): Option[Seq[Literal]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    conjuncts(cond).collectFirst {
      case EqualTo(x: Attribute, l: Literal) if x.semanticEquals(a) && l.value != null => Seq(l)
      case EqualTo(l: Literal, x: Attribute) if x.semanticEquals(a) && l.value != null => Seq(l)
      case EqualNullSafe(x: Attribute, l: Literal) if x.semanticEquals(a) && l.value != null => Seq(l)
      case EqualNullSafe(l: Literal, x: Attribute) if x.semanticEquals(a) && l.value != null => Seq(l)
      case In(x: Attribute, vs) if x.semanticEquals(a) &&
          vs.nonEmpty && vs.forall(v => v.isInstanceOf[Literal] &&
            v.asInstanceOf[Literal].value != null) =>
        vs.map(_.asInstanceOf[Literal])
    }
  }

  /** A literal narrowed to the partition attribute's inferred type (the
    * In is spliced into an analyzed plan — no coercion will run).
    */
  private def typed(v: Long, attr: Attribute): Literal =
    Literal.create(
      Cast(Literal(v), attr.dataType, None, EvalMode.LEGACY).eval(null),
      attr.dataType)
}
