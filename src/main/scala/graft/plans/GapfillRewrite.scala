package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

import graft.expressions.{GapfillBucket, Interpolate, Locf, TimeBucket}
import graft.operators.Gapfill

/** Gapfill plan injection — the reference inserts a custom scan node above
  * the aggregation when `time_bucket_gapfill` appears in GROUP BY
  * (`tsl/src/nodes/gapfill/gapfill_plan.c:725`, `plan_add_gapfill`). Here
  * the Aggregate carrying [[GapfillBucket]] is rewritten to:
  * same aggregate (markers stripped) → spine left-join ([[Gapfill.gapfill]])
  * → locf/interpolate windows — all declarative, shuffled only on the
  * group keys. Output attribute ids are preserved, so ORDER BY / outer
  * operators over the gapfilled columns are untouched.
  *
  * Two registrations of the same logic:
  *  - [[GapfillResolution]] (analyzer, `injectResolutionRule`): runs before
  *    the query schema freezes, so non-nullable aggregates (count) WIDEN to
  *    nullable and empty buckets read NULL — the reference's semantics
  *    (`gapfill_exec.c` injected tuples carry NULLs).
  *  - [[GapfillRewrite]] (optimizer): fallback for sessions bootstrapped
  *    with [[graft.Graft.init]] (`extraOptimizations` cannot reach the
  *    analyzer). The analyzed schema is already fixed there, so an empty
  *    bucket under a non-nullable aggregate coalesces to the type default
  *    (count = 0) — documented divergence on that path only.
  */
class GapfillRewriteRule(widenNullability: Boolean) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if agg.resolved &&
        (agg.expressions.exists(hasMarker) ||
        (agg.child match {
          case p: Project => p.projectList.exists(hasMarker)
          case _          => false
        })) =>
      rewrite(agg).getOrElse(agg)
  }

  private def hasMarker(e: Expression): Boolean =
    e.exists(x => x.isInstanceOf[GapfillBucket] || x.isInstanceOf[Locf] ||
      x.isInstanceOf[Interpolate])

  private def derefMap(agg: Aggregate): Map[ExprId, Expression] = agg.child match {
    case p: Project => p.projectList.collect { case a: Alias => a.exprId -> a.child }.toMap
    case _          => Map.empty
  }

  private def deref(e: Expression, defs: Map[ExprId, Expression]): Expression =
    e.transformUp { case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId) }

  private def evalMicros(e: Expression): Option[Long] =
    if (!e.foldable) None
    else e.eval(InternalRow.empty) match {
      case l: java.lang.Long => Some(l)
      case _                 => None
    }

  private def widthString(e: Expression): Option[String] =
    if (!e.foldable) None
    else e.eval(InternalRow.empty) match {
      case iv: CalendarInterval if iv.months == 0 =>
        Some(s"${iv.days} days ${iv.microseconds} microseconds")
      case iv: CalendarInterval if iv.days == 0 && iv.microseconds == 0 =>
        Some(s"${iv.months} months") // SQL intervals cannot mix ym and dt fields
      case us: java.lang.Long if e.dataType.isInstanceOf[DayTimeIntervalType] =>
        Some(s"$us microseconds")
      case _ => None
    }

  private val BN = "_graft_gf_bucket"

  /** [start, finish) from Filter predicates on the marker's time expression
    * anywhere below the aggregate: `ts >= a` / `ts > a` give the start,
    * `ts < b` / `ts <= b` the finish (tightest bounds win).
    */
  private def inferWindow(agg: Aggregate, ts: Expression): Option[(Long, Long)] = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    agg.foreach {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        val (l, h) = TimeBounds.bounds(f.condition, ts)
        l.foreach(x => lo = Some(lo.fold(x)(math.max(_, x))))
        h.foreach(x => hi = Some(hi.fold(x)(math.min(_, x))))
      case _ => ()
    }
    for (l <- lo; h <- hi) yield (l, h)
  }

  private def dbg(s: => String): Unit =
    if (sys.env.contains("GRAFT_DEBUG_GAPFILL")) System.err.println(s"[gapfill] $s")

  /** Wall-clock micros of an instant in `zone` — the local-naive form
    * [[Gapfill.gapfillTz]] takes its window bounds in.
    */
  private def instantToLocalMicros(us: Long, zone: String): Long = {
    val ins = java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
    val local = java.time.LocalDateTime.ofInstant(ins, java.time.ZoneId.of(zone))
      .toInstant(java.time.ZoneOffset.UTC)
    local.getEpochSecond * 1000000L + local.getNano / 1000L
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    dbg(s"rewrite called, widen=$widenNullability")
    val defs = derefMap(agg)

    // the gapfill marker lives in the GROUPING list (result-list occurrences
    // may be pruned away, e.g. under count())
    val derefGroups = agg.groupingExpressions.map(g => deref(g, defs))
    val gidx = derefGroups.indexWhere(_.isInstanceOf[GapfillBucket])
    if (gidx < 0 || derefGroups.count(_.isInstanceOf[GapfillBucket]) != 1) { dbg("bail: gidx"); return None }
    val marker = derefGroups(gidx).asInstanceOf[GapfillBucket]
    if (marker.ts.dataType != TimestampType && marker.ts.dataType != TimestampNTZType) { dbg("bail: ts type"); return None }
    // result outputs that ARE the bucket (may be none)
    val bucketOutIds = agg.aggregateExpressions.collect {
      case a: Alias if deref(a.child, defs).isInstanceOf[GapfillBucket] => a.exprId
    }.toSet

    val width = widthString(marker.width).getOrElse { dbg("bail: width"); return None }
    val tzStr: Option[String] = marker.tz.map(z =>
      z.eval(InternalRow.empty).toString)
    // explicit start/finish, or inferred from WHERE-clause bounds on the
    // marker's time expression (reference `gapfill.sql:5-24`: defaults come
    // from the query's quals)
    val (startUs, finishUs) = (evalMicros(marker.start), evalMicros(marker.finish)) match {
      case (Some(s), Some(f)) => (s, f)
      case _ => inferWindow(agg, marker.ts).getOrElse { dbg("bail: inferWindow"); return None }
    }

    // remaining group columns must be plain attributes
    val groupNames = derefGroups.flatMap {
      case _: GapfillBucket        => None
      case ar: AttributeReference  => Some(ar.name)
      case _                       => return None
    }

    // locf/interpolate must be the TOP-LEVEL expression of a result column
    // (the reference validates the same in gapfill_plan.c): a marker nested
    // inside arithmetic — `(locf(avg(v)) * 2).as("x")` — would be stripped
    // below without its fill ever being applied. Error, never silence.
    def isFillMarker(x: Expression) =
      x.isInstanceOf[Locf] || x.isInstanceOf[Interpolate]
    agg.aggregateExpressions.foreach { e =>
      val top = e match { case a: Alias => deref(a.child, defs); case x => deref(x, defs) }
      val nested = top.children.map(_.collect { case m if isFillMarker(m) => m }.size).sum
      if (nested > 0 || (isFillMarker(top) && !e.isInstanceOf[Alias]))
        throw new IllegalArgumentException(
          s"locf()/interpolate() must be a top-level aliased select expression " +
            s"(wrap the arithmetic INSIDE the marker instead): $e")
    }

    // locf/interpolate fill specs by output name (deref: the marker may live
    // in a hoisted child Project behind an attribute reference)
    val fills = agg.aggregateExpressions.collect {
      case a: Alias if deref(a.child, defs).isInstanceOf[Locf] =>
        val m = deref(a.child, defs).asInstanceOf[Locf]
        a.name -> ((df: org.apache.spark.sql.DataFrame) => {
          val prevCol = m.prev.map(p => org.apache.spark.sql.GraftShims.toColumn(p))
          df.withColumn(a.name, Gapfill.locf(
            org.apache.spark.sql.functions.col(a.name), groupNames, BN, prevCol,
            m.treatNullAsMissing))
        })
      case a: Alias if deref(a.child, defs).isInstanceOf[Interpolate] =>
        val m = deref(a.child, defs).asInstanceOf[Interpolate]
        // (time, value)-struct seeds → the Column API's (time, value)
        // pairs, by ordinal (the struct's field names are caller-chosen)
        def seedPair(e: org.apache.spark.sql.catalyst.expressions.Expression) = {
          val st = e.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
          (org.apache.spark.sql.GraftShims.toColumn(
            org.apache.spark.sql.catalyst.expressions.GetStructField(e, 0, Some(st.fields(0).name))),
            org.apache.spark.sql.GraftShims.toColumn(
              org.apache.spark.sql.catalyst.expressions.GetStructField(e, 1, Some(st.fields(1).name))))
        }
        a.name -> ((df: org.apache.spark.sql.DataFrame) => {
          df.withColumn(a.name, Gapfill.interpolate(
            org.apache.spark.sql.functions.col(a.name), groupNames, BN,
            prev = m.prev.map(seedPair), next = m.next.map(seedPair)))
        })
    }

    // strip markers everywhere in the aggregate subtree (group list, result
    // list, hoisted child Project); alias ids survive, so the inner plan's
    // output lines up with the original aggregate's. The tz form strips to
    // the time_bucket_tz expression (bucket in local wall-clock, result
    // back as a UTC instant) — exactly what Gapfill.gapfillTz expects.
    val stripped = agg.transformAllExpressions {
      case GapfillBucket(w, t, _, _, None) => TimeBucket(w, t, None)
      case GapfillBucket(w, t, _, _, Some(z)) =>
        org.apache.spark.sql.catalyst.expressions.ToUTCTimestamp(
          TimeBucket(w,
            org.apache.spark.sql.catalyst.expressions.FromUTCTimestamp(t, z), None), z)
      case Locf(c, _, _)             => c
      case Interpolate(c, _, _)      =>
        org.apache.spark.sql.catalyst.expressions.Cast(c, org.apache.spark.sql.types.DoubleType)
    }.asInstanceOf[Aggregate]

    // the spine join needs the bucket and group columns even when the query
    // pruned them from the result list (e.g. under count()): append a
    // synthetic bucket alias plus any missing group attributes
    val presentNames = stripped.aggregateExpressions.map(_.name).toSet
    val missingGroups = stripped.groupingExpressions.zipWithIndex.collect {
      case (ar: AttributeReference, i) if i != gidx && !presentNames.contains(ar.name) => ar
    }
    val withBucket = stripped.copy(aggregateExpressions =
      (stripped.aggregateExpressions ++ missingGroups) :+
        Alias(stripped.groupingExpressions(gidx), BN)())
    val inner = org.apache.spark.sql.GraftShims.ofRows(withBucket)
    var filled = tzStr match {
      case Some(z) =>
        // tz form: the spine is generated in local wall-clock (fixed-width
        // there; DST-uneven instants), window bounds converted to local
        Gapfill.gapfillTz(inner, BN, groupNames,
          instantToLocalMicros(startUs, z), instantToLocalMicros(finishUs, z), width, z)
      case None =>
        Gapfill.gapfill(inner, BN, groupNames, startUs, finishUs, width)
    }
    fills.foreach { case (_, f) => filled = f(filled) }

    // inject the ANALYZED subtree: physical planning handles analyzed
    // operators, and re-optimizing a subtree that is then re-injected can
    // leak collapsed projections with stale (non-nullable) attributes into
    // the outer-join null side
    val filledPlan = filled.queryExecution.analyzed
    def attrByName(n: String) = filledPlan.output.find(_.name == n)
    val projected: Seq[Option[NamedExpression]] = agg.output.map { out =>
      val lookup = if (bucketOutIds.contains(out.exprId)) BN else out.name
      attrByName(lookup).map { at =>
        val cast = org.apache.spark.sql.catalyst.expressions.Cast(at, out.dataType)
        // analyzer registration: the schema isn't frozen yet, so let the
        // spine join's nullability flow through — empty buckets read NULL
        // under count() exactly like the reference. Optimizer registration:
        // the analyzed schema is already fixed, so a non-nullable aggregate
        // must stay non-null; coalesce to the type default (count = 0).
        val value =
          if (widenNullability || out.nullable) cast
          else org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(cast,
            org.apache.spark.sql.catalyst.expressions.Literal.default(out.dataType)))
        Alias(value, out.name)(exprId = out.exprId)
      }
    }
    if (projected.exists(_.isEmpty)) { dbg("bail: projected lookup"); None }
    else Some(Project(projected.map(_.get), filledPlan))
  }
}

/** Optimizer registration (fallback path — see class doc). */
object GapfillRewrite extends GapfillRewriteRule(widenNullability = false)

/** Analyzer registration (`injectResolutionRule`) — reference NULL
  * semantics for empty buckets under non-nullable aggregates.
  */
object GapfillResolution extends GapfillRewriteRule(widenNullability = true)
