package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.expressions.TimeBucket
import graft.streaming.ContinuousAggregate

/** Query rewrite to continuous aggregates — the reference's
  * `rewrite_with_caggs.c:10-42` (pre-planning hook
  * `src/planner/planner.c:700-706`): an aggregation over the RAW
  * hypertable whose shape matches a registered cagg is silently answered
  * from the cagg's realtime view (materialized below the watermark,
  * live above), skipping the full raw scan.
  *
  * Conservative by construction — a rewrite fires only when:
  *  - the aggregate's child is the hypertable scan (or a pure-attribute
  *    Project over it): any Filter changes bucket contents, so none allowed;
  *  - grouping = exactly one `time_bucket` of the registered width on the
  *    hypertable's time column + exactly the cagg's group columns;
  *  - every aggregate output's canonical SQL matches one of the cagg's
  *    (the query may use a subset).
  * Output attribute ids are preserved via aliasing, so parent operators
  * (sorts, projections, havings) are untouched.
  */
object CaggRewrite extends Rule[LogicalPlan] {

  /** What a registered cagg looks like to the matcher. */
  private[graft] case class Registered(
      cagg: ContinuousAggregate,
      timeCol: String,
      widthMicros: Long,
      widthMonths: Int,
      groupCols: Seq[String],
      /** canonical agg SQL (sans alias) → cagg output column name */
      aggSqlToName: Map[String, String],
      /** variable-bucket forms: tz caggs match only the
        * `time_bucket_tz`-shaped expression, origin caggs only the
        * explicit-origin form (and plain caggs only the plain form)
        */
      tz: Option[String] = None,
      originMicros: Option[Long] = None)

  private val registry = TrieMap.empty[String, Registered]

  /** Register `cagg` for rewrite; keyed by its hypertable's root path. */
  def register(cagg: ContinuousAggregate): Unit = {
    val ht = cagg.source match {
      case h: graft.sources.Hypertable => h
      case _ => throw new IllegalArgumentException(
        "only caggs over a raw hypertable can serve rewrites")
    }
    // a dim-joined cagg aggregates the JOINED rows (the join can filter or
    // duplicate); a raw-table aggregate of the same shape is NOT equivalent
    // and matching it would silently return wrong results
    require(cagg.defn.dimJoin.isEmpty,
      "caggs with a dimension join cannot serve raw-table rewrites " +
        "(the join changes bucket contents); query the cagg directly")
    // a WHERE/HAVING cagg materializes a SUBSET of the raw aggregation —
    // matching an unfiltered raw query to it would silently drop rows
    require(cagg.defn.filter.isEmpty && cagg.defn.having.isEmpty,
      "caggs with a WHERE/HAVING clause cannot serve raw-table rewrites " +
        "(they materialize a filtered subset); query the cagg directly")
    // a window cagg's materialization carries extra window columns and its
    // defining query is not a plain bucketed aggregate — no raw GROUP BY
    // shape is equivalent to it
    require(cagg.defn.windowCols.isEmpty,
      "caggs with window functions cannot serve raw-table rewrites; " +
        "query the cagg directly")
    // resolve the cagg's agg columns against the real source to get
    // canonical SQL for structural matching
    val tcol = org.apache.spark.sql.functions.col(ht.timeCol)
    val bucketExpr =
      if (cagg.defn.integerWidth) // integer-time cagg: raw long width
        graft.functions.time_bucket(
          org.apache.spark.sql.functions.lit(cagg.defn.widthMicros), tcol)
      else (cagg.defn.bucketTz, cagg.defn.bucketOriginMicros) match {
        case (Some(tz), _) =>
          graft.functions.time_bucket_tz(cagg.defn.bucketWidth, tcol, tz)
        case (None, Some(o)) => graft.functions.time_bucket(
          cagg.defn.bucketWidth, tcol,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.lit(o)))
        case _ => graft.functions.time_bucket(cagg.defn.bucketWidth, tcol)
      }
    val probe = ht.read()
      .groupBy(bucketExpr)
      .agg(cagg.defn.aggs.head, cagg.defn.aggs.tail: _*)
    val aggSql = probe.queryExecution.analyzed match {
      case Aggregate(_, result, _, _) =>
        result.collect { case a: Alias if hasAggregate(a.child) => canonicalSql(a.child) -> a.name }.toMap
      case _ => Map.empty[String, String]
    }
    registry.put(
      normalize(ht.path, cagg.spark.sessionState.newHadoopConf()),
      Registered(
        cagg, ht.timeCol, cagg.defn.widthMicros, cagg.defn.widthMonths,
        cagg.defn.groupCols, aggSql,
        cagg.defn.bucketTz, cagg.defn.bucketOriginMicros))
  }

  def clear(): Unit = registry.clear()

  /** Evict the entry serving rewrites THROUGH this cagg (a dropped cagg
    * must stop intercepting raw queries). A different cagg registered for
    * the same hypertable is left alone.
    */
  def evict(cagg: ContinuousAggregate): Unit =
    registry.filterInPlace { case (_, reg) => reg.cagg.path != cagg.path }

  /** Fully-qualified key (same convention as the exclusion registry,
    * `Hypertable.qualifiedPath`): stripping the scheme would collide
    * same-path tables on different filesystems, and a relative
    * registration path would never match the scan's qualified rootPath.
    * Results are cached per raw path — this runs inside the optimizer for
    * every matched Aggregate, and `newHadoopConf()` clones the full
    * Hadoop configuration (the conf thunk is only forced on a miss).
    */
  private val qualifiedCache = TrieMap.empty[String, String]

  private def normalize(p: String,
      conf: => org.apache.hadoop.conf.Configuration): String =
    qualifiedCache.getOrElseUpdate(p, {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).makeQualified(hp).toString.stripSuffix("/")
    })

  /** Canonical SQL for structural matching: view/table qualifiers on
    * attributes are irrelevant to the aggregate's semantics, so strip them
    * (SQL-resolved plans print `min(view.value)`, DataFrame plans
    * `min(value)`).
    */
  private def canonicalSql(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql

  private def hasAggregate(e: Expression): Boolean =
    e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression])

  /** Unwrap the aggregate's child down to a bare hypertable scan, collecting
    * Project-introduced aliases (the optimizer's PullOutGroupingExpressions
    * hoists `time_bucket` into a child Project) so group/agg expressions can
    * be dereferenced back to source columns. Any Filter (or other operator)
    * aborts the match — it would change bucket contents.
    */
  private def unwrap(plan: LogicalPlan):
      Option[(String, Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression])] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.toList match {
          case p :: Nil => Some((normalize(p.toString,
            fs.sparkSession.sessionState.newHadoopConf()), Map.empty))
          case _        => None
        }
      case Project(projList, child)
          if projList.forall(p => p.isInstanceOf[AttributeReference] || p.isInstanceOf[Alias]) =>
        unwrap(child).map { case (root, defs) =>
          val newDefs = projList.collect {
            case a: Alias => a.exprId -> deref(a.child, defs)
          }
          (root, defs ++ newDefs)
        }
      case _ => None
    }

  /** Substitute Project-aliased attributes with their defining expressions. */
  private def deref(e: Expression,
      defs: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression]): Expression =
    e.transformUp {
      case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId)
    }

  /** Does the bucket-width literal equal the registered cagg's width —
    * fixed micros or calendar months (month-width caggs rewrite too).
    */
  private def widthMatches(e: Expression, reg: Registered): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(iv: org.apache.spark.unsafe.types.CalendarInterval, _) =>
      if (iv.months != 0)
        iv.days == 0 && iv.microseconds == 0 && reg.widthMonths == iv.months
      else reg.widthMonths == 0 &&
        iv.days * graft.expressions.TimeBucketUtil.MICROS_PER_DAY + iv.microseconds == reg.widthMicros
    case org.apache.spark.sql.catalyst.expressions.Literal(us: java.lang.Long,
        _: org.apache.spark.sql.types.DayTimeIntervalType) =>
      reg.widthMonths == 0 && us == reg.widthMicros
    case org.apache.spark.sql.catalyst.expressions.Literal(m: java.lang.Integer,
        _: org.apache.spark.sql.types.YearMonthIntervalType) =>
      reg.widthMonths == m.intValue()
    // integer-time cagg: a raw integral width literal in dimension units
    // (time_bucket's integer overloads only typecheck on integral time
    // columns, so this cannot cross-match a timestamp cagg)
    case org.apache.spark.sql.catalyst.expressions.Literal(w: java.lang.Long,
        org.apache.spark.sql.types.LongType) =>
      reg.widthMonths == 0 && w.longValue() == reg.widthMicros
    case org.apache.spark.sql.catalyst.expressions.Literal(w: java.lang.Integer,
        org.apache.spark.sql.types.IntegerType) =>
      reg.widthMonths == 0 && w.longValue() == reg.widthMicros
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || !Toggles.caggRewrites) return plan
    plan.transformUp {
      case agg @ Aggregate(groupExprs, resultExprs, child, _) =>
        (for {
          rootDefs <- unwrap(child)
          reg      <- registry.get(rootDefs._1)
          next     <- tryRewrite(groupExprs, resultExprs, rootDefs._2, reg)
        } yield next).getOrElse(agg)
    }
  }

  private def isBucketOf(e: Expression, reg: Registered): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{FromUTCTimestamp, Literal, ToUTCTimestamp}
    e match {
      // plain form matches only plain caggs (a tz/origin cagg holds
      // differently-aligned buckets — matching it would be silently wrong)
      case TimeBucket(w, t: AttributeReference, None) =>
        reg.tz.isEmpty && reg.originMicros.isEmpty &&
          t.name == reg.timeCol && widthMatches(w, reg)
      // time_bucket_tz shape: to_utc(time_bucket(w, from_utc(ts, tz)), tz)
      case ToUTCTimestamp(
          TimeBucket(w, FromUTCTimestamp(t: AttributeReference, Literal(tz1, _)), None),
          Literal(tz2, _)) =>
        reg.tz.contains(String.valueOf(tz1)) && tz1 == tz2 &&
          t.name == reg.timeCol && widthMatches(w, reg)
      // explicit-origin form: the origin literal folds to a timestamp
      case TimeBucket(w, t: AttributeReference,
          Some(Literal(us: java.lang.Long, _: org.apache.spark.sql.types.TimestampType))) =>
        reg.originMicros.contains(us.longValue()) &&
          t.name == reg.timeCol && widthMatches(w, reg)
      case _ => false
    }
  }

  private def tryRewrite(groupExprs: Seq[Expression],
      resultExprs: Seq[NamedExpression],
      defs: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression],
      reg: Registered): Option[LogicalPlan] = {
    // exactly one time_bucket(width, timeCol) group key of the right width
    val derefGroups = groupExprs.map(g => deref(g, defs))
    val (bucketGroups, otherGroups) = derefGroups.partition(isBucketOf(_, reg))
    if (bucketGroups.size != 1) return None
    val groupNames = otherGroups.map {
      case a: AttributeReference => a.name
      case _                     => return None
    }
    if (groupNames.sorted != reg.groupCols.sorted) return None

    // realtime view plan (fresh watermark read), already optimized
    val rtPlan = reg.cagg.realtime.queryExecution.optimizedPlan
    def rtAttr(name: String): Option[Attribute] =
      rtPlan.output.find(_.name.equalsIgnoreCase(name))

    val mapped = resultExprs.map { ne =>
      (ne, deref(ne, defs)) match {
        case (a: Alias, d: Alias) if isBucketOf(d.child, reg) =>
          rtAttr(reg.cagg.defn.bucketCol).map(at => Alias(at, a.name)(exprId = a.exprId))
        case (ar: AttributeReference, d) if isBucketOf(d, reg) =>
          rtAttr(reg.cagg.defn.bucketCol).map(at => Alias(at, ar.name)(exprId = ar.exprId))
        case (ar: AttributeReference, _) if groupNames.contains(ar.name) =>
          rtAttr(ar.name).map(at => Alias(at, ar.name)(exprId = ar.exprId))
        case (a: Alias, d: Alias) if hasAggregate(d.child) =>
          reg.aggSqlToName.get(canonicalSql(d.child))
            .flatMap(rtAttr)
            .map(at => Alias(at, a.name)(exprId = a.exprId))
        case _ => None
      }
    }
    if (mapped.exists(_.isEmpty)) None
    else Some(Project(mapped.map(_.get), rtPlan))
  }
}
