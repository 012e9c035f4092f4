package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.TimeBucketUtil

/** Gap-filling over bucketed aggregates — the Spark-native equivalent of
  * `time_bucket_gapfill` / `locf` / `interpolate`
  * (reference `sql/gapfill.sql:5-28`, exec `tsl/src/nodes/gapfill/gapfill_exec.c`,
  * locf `locf.c`, interpolate `interpolate.c:184-216`).
  *
  * Instead of a custom scan node injected above the aggregation (the
  * reference's design), this composes declaratively:
  *   1. spine = distinct group keys × `sequence(bucket(start), finish)`
  *   2. left join the aggregated data on (groups, bucket)
  *   3. locf = `last(x, ignoreNulls) OVER (... ROWS UNBOUNDED PRECEDING..CURRENT)`
  *   4. interpolate = linear between surrounding non-null points via
  *      last/first ignoreNulls windows, `(y0*(x1-x) + y1*(x-x0))/(x1-x0)`
  *
  * Scale: the spine is generated per group (explode), the join and windows
  * partition by group key — no global shuffle beyond the group-key hash,
  * and no driver-side materialization.
  */
object Gapfill {

  /** Longest bucket array materialized per spine row; longer windows split
    * into segments first (a year of minute buckets would otherwise build a
    * 525k-element array in a single row per group).
    */
  private val MaxSpineSegment = 8192L

  /** Dense bucket spine for [start, finish), aligned like
    * `time_bucket(width, start)`; one row per (group, bucket).
    *
    * Fixed-width windows longer than [[MaxSpineSegment]] buckets generate
    * two levels (explode segment starts, then explode buckets within each
    * segment) so per-row array size stays bounded; month-width spines are
    * small by construction and stay single-level.
    */
  def spine(groups: DataFrame, bucketCol: String, startMicros: Long,
      finishMicros: Long, width: String): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(width))
    val ts0 = TimeBucketUtil.bucketCalendarMicros(startMicros, iv, TimeBucketUtil.SENTINEL)
    val w = iv.days * TimeBucketUtil.MICROS_PER_DAY + iv.microseconds
    val nBuckets = if (iv.months != 0 || w <= 0) 0L else (finishMicros - ts0 + w - 1) / w
    if (iv.months != 0 || nBuckets <= MaxSpineSegment) {
      groups.select(
        (groups.columns.map(col) :+
          explode(sequence(
            timestamp_micros(lit(ts0)),
            timestamp_micros(lit(finishMicros - 1)),
            expr(s"INTERVAL '$width'"))).as(bucketCol)): _*)
    } else {
      val segW = w * MaxSpineSegment
      val seg = "_gf_seg"
      groups.select(
        (groups.columns.map(col) :+
          explode(sequence(lit(ts0), lit(finishMicros - 1), lit(segW))).as(seg)): _*)
        .select(
          (groups.columns.map(col) :+
            explode(sequence(
              timestamp_micros(col(seg)),
              timestamp_micros(least(col(seg) + lit(segW - 1), lit(finishMicros - 1))),
              expr(s"INTERVAL '$width'"))).as(bucketCol)): _*)
    }
  }

  /** Gap-fill an aggregated DataFrame: every bucket in [start, finish) for
    * every group key present in `agg` gets a row; missing buckets carry
    * nulls in the aggregate columns.
    */
  /** Marks rows injected by the spine (vs rows present in the input):
    * [[locf]]/[[interpolate]] only fill FILLED rows — a genuine NULL in the
    * data stays NULL (reference `gapfill_exec.c` tuple-injection semantics),
    * unless locf's `treatNullAsMissing` says otherwise.
    */
  val FILLED = "_gf_filled"

  /** Single-pass formulation: the aggregate is consumed ONCE. A
    * spine × left-join design needs the distinct group keys first, which
    * re-aggregates `agg` — Catalyst column-prunes that second subtree
    * differently, so ReuseExchange does NOT deduplicate it and the raw
    * table feeding the aggregation is scanned twice (the dominant cost at
    * scale). Here each aggregated row instead covers the spine span
    * `[own bucket, next bucket)` (plus `[start, first bucket)` for the
    * first row of a group) via `lead`/`lag` over the group window and a
    * bounded explode — one scan, one agg shuffle, one window sort over
    * already-aggregated (small) data, no join.
    *
    * Groups are the keys present in `agg`; every one gets the full spine
    * [start, finish) (the reference fills each group to gapfill_end even
    * when its rows sit outside the window — the post-input fill loop in
    * `gapfill_exec.c`). Rows whose bucket is outside the window, or off
    * the `time_bucket(width, start)` grid, PASS THROUGH unfilled
    * (`gapfill_exec.c:1037-1041` returns subplan tuples before
    * gapfill_start as-is) — they contribute no spine coverage, and the
    * in-window gap arithmetic skips over them.
    */
  def gapfill(agg: DataFrame, bucketCol: String, groupCols: Seq[String],
      startMicros: Long, finishMicros: Long, width: String): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(width))
    val ts0 = TimeBucketUtil.bucketCalendarMicros(startMicros, iv, TimeBucketUtil.SENTINEL)
    gapfillCore(agg, bucketCol, groupCols, ts0, finishMicros, width, iv)
  }

  /** Integer-time gapfill — `time_bucket_gapfill(width::int, time::int, ...)`
    * over a bigint dimension (`sql/gapfill.sql:5-11`; most reference
    * gapfill goldens are integer-time). Bucket alignment uses the integer
    * origin 0 (`bucketLong`), NOT the timestamp default origin; internally
    * the int values ride through the micros engine as-is and convert back
    * at the end.
    */
  def gapfillInt(agg: DataFrame, bucketCol: String, groupCols: Seq[String],
      start: Long, finish: Long, width: Long): DataFrame = {
    require(width > 0, "gapfill width must be positive")
    val ts0 = TimeBucketUtil.bucketLong(start, width, TimeBucketUtil.SENTINEL)
    val iv = new org.apache.spark.unsafe.types.CalendarInterval(0, 0, width)
    val bucketType = agg.schema(bucketCol).dataType
    val asTs = agg.withColumn(bucketCol,
      timestamp_micros(col(bucketCol).cast("long")))
    gapfillCore(asTs, bucketCol, groupCols, ts0, finish, s"$width microseconds", iv)
      .withColumn(bucketCol, unix_micros(col(bucketCol)).cast(bucketType))
  }

  private def gapfillCore(agg: DataFrame, bucketCol: String, groupCols: Seq[String],
      ts0: Long, finishMicros: Long, width: String,
      iv: org.apache.spark.unsafe.types.CalendarInterval): DataFrame = {
    val w = iv.days * TimeBucketUtil.MICROS_PER_DAY + iv.microseconds
    val monthly = iv.months != 0
    val valueCols = agg.columns.filterNot(c => groupCols.contains(c) || c == bucketCol).toSeq

    val B = "_gf_b" // row's own bucket, µs
    val SYNTH = "_gf_synth"
    // UNGROUPED gapfill emits the spine even over ZERO input rows (the
    // reference's "test gap fill without rows in resultset" golden:
    // `WHERE false GROUP BY 1` still yields the all-null spine) — the
    // explode-from-rows shape below needs at least one row to carry it, so
    // seed one synthetic out-of-window row (bucket = +inf, all values
    // null). Its ONLY flag fires exactly when no real row exists; its own
    // pass-through emission is suppressed via SYNTH. Grouped queries with
    // no rows have no groups and correctly emit nothing, reference-style.
    val agg0 = if (groupCols.nonEmpty) agg.withColumn(SYNTH, lit(false))
      else {
        val seed = agg.sparkSession.range(1).select(
          timestamp_micros(lit(Long.MaxValue)).as(bucketCol) +:
            valueCols.map(c =>
              lit(null).cast(agg.schema(c).dataType).as(c)): _*)
        agg.withColumn(SYNTH, lit(false))
          .unionByName(seed.withColumn(SYNTH, lit(true)))
      }
    val aligned =
      if (monthly) graft.functions.time_bucket(width, col(bucketCol)) === col(bucketCol)
      // congruence via per-operand mods: `(B - ts0) % w` overflows int64
      // under ANSI when B and ts0 have opposite signs at the extremes
      // (e.g. the synthetic spine seed at +inf against a negative window)
      else ((unix_micros(col(bucketCol)) % w) - lit(ts0 % w)) % w === 0
    val INWIN = "_gf_inwin"
    val rows = agg0
      // a NULL bucket would otherwise null out every range bound and the
      // coverage filter would silently DROP the group — the reference
      // errors on NULL gapfill time (gapfill_exec.c); so do we
      .withColumn(B, when(col(bucketCol).isNull,
          raise_error(lit("time_bucket_gapfill: NULL bucket (time) value")))
        .otherwise(unix_micros(col(bucketCol))))
      .withColumn(INWIN,
        col(bucketCol) >= timestamp_micros(lit(ts0)) &&
          col(bucketCol) < timestamp_micros(lit(finishMicros)) && aligned)
    // Coverage ranges, inclusive µs bounds: head (first IN-WINDOW row
    // only), self, gap-to-next-in-window. Neighbors are the nearest
    // IN-WINDOW rows — running conditional frames rather than lead/lag, so
    // pass-through rows interleaved in the order don't truncate the gaps.
    // (Both frames are running, O(n); the descending one is the same trick
    // interpolate uses.) Window results materialize as columns first —
    // generators (explode) cannot contain window expressions.
    // Exactly two sorts over the (small, aggregated) frame: ascending and
    // descending, both shared by every expression below. FIRST = in-window
    // row with no in-window predecessor; ONLY = the group's first physical
    // row when NO in-window row exists anywhere (no predecessor at all via
    // lag, no in-window successor via the desc frame) — it emits the full
    // spine so out-of-window-only groups still gapfill, reference-style.
    val ascSpec = Window.partitionBy(groupCols.map(col): _*).orderBy(col(B))
    val winAsc = ascSpec.rowsBetween(Window.unboundedPreceding, -1)
    val winDesc = Window.partitionBy(groupCols.map(col): _*).orderBy(col(B).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val FIRST = "_gf_first"; val GAPEND = "_gf_gapend"
    val ONLY = "_gf_only" // sole spine emitter for a group with no in-window rows
    val inB = when(col(INWIN), col(B))
    val nextInWin = last(inB, ignoreNulls = true).over(winDesc)
    val winCols = rows
      .withColumn(FIRST, col(INWIN) && last(inB, ignoreNulls = true).over(winAsc).isNull)
      .withColumn(GAPEND, coalesce(nextInWin, lit(finishMicros)) - 1)
      .withColumn(ONLY,
        !col(INWIN) && lag(col(B), 1).over(ascSpec).isNull && nextInWin.isNull)
    val lo = "lo"; val hi = "hi"
    def range(l: Column, h: Column) = struct(l.as(lo), h.as(hi))
    val headLo = when(col(FIRST), lit(ts0)).otherwise(lit(Long.MaxValue))
    val stepNext: Column => Column = // start of the bucket after b
      if (monthly) b => unix_micros(timestamp_micros(b) + expr(s"INTERVAL '$width'"))
      else b => b + w
    val ranges = filter(
      when(col(INWIN),
        array(range(headLo, col(B) - 1), range(col(B), col(B)),
          range(stepNext(col(B)), col(GAPEND))))
        .otherwise( // pass-through row: itself (suppressed for the
          // synthetic spine seed), plus (if the group has no in-window
          // rows and this is its first row) the whole spine
          array(range(col(B),
              when(col(SYNTH), lit(Long.MinValue)).otherwise(col(B))),
            range(when(col(ONLY), lit(ts0)).otherwise(lit(Long.MaxValue)),
              lit(finishMicros) - 1))),
      r => r(hi) >= r(lo))
    val GB = "_gf_gb"
    val exploded =
      if (monthly) {
        // calendar widths: spine is small by construction (a century of
        // month buckets = 1200) — flatten to the bucket list directly
        val buckets = flatten(transform(ranges, r => transform(
          sequence(timestamp_micros(r(lo)), timestamp_micros(r(hi)),
            expr(s"INTERVAL '$width'")),
          t => unix_micros(t))))
        winCols.withColumn(GB, explode(buckets))
      } else {
        // fixed widths: two-level (segment starts, then buckets within the
        // segment) so one sparse group's gap never materializes an
        // unbounded array in a single row
        val segW = w * MaxSpineSegment
        val SEG = "_gf_seg"
        // min(s + segW−1, hi) via the subtraction form: the ADD overflows
        // int64 under ANSI when a pass-through row sits near Long.MaxValue
        // (the reference's own big-int golden interpolates between int64
        // min and max); hi − s is always small here (every emitted range
        // is window-bounded or degenerate lo == hi)
        val segs = flatten(transform(ranges, r => transform(
          sequence(r(lo), r(hi), lit(segW)),
          s => range(s, when(r(hi) - s >= segW - 1, s + lit(segW - 1))
            .otherwise(r(hi))))))
        winCols.withColumn(SEG, explode(segs))
          .withColumn(GB, explode(sequence(col(SEG)(lo), col(SEG)(hi), lit(w))))
      }
    val filledC = col(GB) =!= col(B)
    exploded.select(
      (groupCols.map(col) :+ timestamp_micros(col(GB)).as(bucketCol)) ++
        valueCols.map(c => when(filledC, lit(null)).otherwise(col(c)).as(c)) :+
        filledC.as(FILLED): _*)
  }

  /** Timezone-aware gapfill — `time_bucket_gapfill(width, ts, timezone)`
    * (reference `gapfill_exec.c` tz handling; bucket arithmetic
    * `src/time_bucket.c:335+`): buckets are fixed-width in LOCAL
    * wall-clock, so their instants are unevenly spaced across DST
    * transitions (a 23/25-hour day). The spine is therefore generated in
    * local-naive space — where buckets ARE fixed width and [[spine]]'s
    * sequence arithmetic is exact — and converted back to instants at the
    * end. `agg`'s `bucketCol` must hold tz-bucketed INSTANTS (the output
    * of [[graft.functions.time_bucket_tz]]); `localStart/FinishMicros`
    * are LOCAL wall-clock micros. locf/interpolate compose unchanged:
    * local order and instant order agree (the conversion is monotone).
    */
  def gapfillTz(agg: DataFrame, bucketCol: String, groupCols: Seq[String],
      localStartMicros: Long, localFinishMicros: Long, width: String,
      tz: String): DataFrame = {
    val L = "_gf_local"
    val localAgg = agg
      .withColumn(L, from_utc_timestamp(col(bucketCol), tz))
      .drop(bucketCol)
    gapfill(localAgg, L, groupCols, localStartMicros, localFinishMicros, width)
      .withColumn(bucketCol, to_utc_timestamp(col(L), tz))
      .drop(L)
  }

  /** Last observation carried forward (reference `locf.c`): gapfilled rows
    * take the latest value of a real row within the group (which may itself
    * be NULL — real NULLs are carried, not skipped, matching the
    * reference's default). `treatNullAsMissing` makes NULL data values get
    * filled too. `prev` seeds the value before the window.
    */
  def locf(value: Column, groupCols: Seq[String], bucketCol: String,
      prev: Option[Column] = None, treatNullAsMissing: Boolean = false,
      filledCol: String = FILLED): Column = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val missing =
      if (treatNullAsMissing) col(filledCol) || value.isNull
      else col(filledCol)
    // struct-wrap so a carried NULL value survives ignoreNulls
    val carry = last(when(!missing, struct(value.as("v"))), ignoreNulls = true).over(w)
    val carried = prev match {
      case Some(p) => when(carry.isNotNull, carry("v")).otherwise(p)
      case None    => carry("v")
    }
    when(!missing, value).otherwise(carried)
  }

  /** Linear interpolation between the surrounding non-null points
    * (reference `interpolate.c:184-216`: `(y0(x1-x) + y1(x-x0))/(x1-x0)`).
    * Outside the first/last non-null points the result stays null — unless
    * a `prev`/`next` seed supplies the lookup-before/after-window point
    * (the reference's `interpolate(value, prev, next)` record arguments,
    * `interpolate.c:184-216` + `sql/gapfill.sql`): each seed is a
    * `(time, value)` pair consulted only when no real point exists on that
    * side of the window.
    */
  def interpolate(value: Column, groupCols: Seq[String], bucketCol: String,
      prev: Option[(Column, Column)] = None,
      next: Option[(Column, Column)] = None,
      filledCol: String = FILLED,
      // x-axis values as LONG: defaults to the bucket's epoch-micros; pass
      // the raw bucket column for INTEGER-time gapfill ([[gapfillInt]]
      // output, where the bucket is a bigint, not a timestamp). Seeds'
      // time components are read the same way.
      xCol: Option[Column] = None): Column = {
    // Both anchors use RUNNING frames (unbounded-preceding..current): the
    // "next non-null point" comes from a DESCENDING-order running frame,
    // not `first(...) ROWS CURRENT..UNBOUNDED FOLLOWING` — Spark executes
    // an unbounded-following frame by re-aggregating the partition tail for
    // every row, O(n²) per group (a year of minute buckets = 525k rows →
    // 10¹¹ evals); the descending formulation is one extra sort of
    // already-aggregated data and stays O(n).
    val wPrev = Window.partitionBy(groupCols.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNextRev = Window.partitionBy(groupCols.map(col): _*).orderBy(col(bucketCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = xCol.getOrElse(unix_micros(col(bucketCol)))
    def timeOf(t: Column): Column =
      if (xCol.isDefined) t.cast("long") else unix_micros(t)
    // anchors are the surrounding REAL rows — even a real row whose value
    // is NULL (its NULL then poisons the line, so the injected neighbors
    // come out NULL). The reference interpolates from the adjacent fetched
    // tuples' values verbatim (`gapfill-16.out:1784` "interpolate with
    // NULL values": the 0→5 line is NOT drawn across the NULL row at 2);
    // anchoring on nearest NON-NULL points would silently bridge it.
    val pt = when(!col(filledCol), struct(x.as("x"), value.as("y")))
    def seeded(anchor: Column, seed: Option[(Column, Column)]): Column =
      seed match {
        case Some((t, v)) =>
          // the seed record binds to the COLUMN's type (the reference reads
          // it through the column's typecache) — without the cast, coalesce
          // would widen the seeded anchor instead (long column + double
          // seed → double on one side only) and fail Lerp's one-type check
          val seedStruct = struct(timeOf(t).as("x"), v.as("y"))
          def ex0(c: Column) = org.apache.spark.sql.GraftShims.toExpression(c)
          coalesce(anchor, org.apache.spark.sql.GraftShims.toColumn(
            graft.expressions.CastLike(ex0(seedStruct), ex0(pt))))
        case None => anchor
      }
    val p0 = seeded(last(pt, ignoreNulls = true).over(wPrev), prev)
    val p1 = seeded(last(pt, ignoreNulls = true).over(wNextRev), next)
    // real rows keep their value (including real NULLs); only injected rows
    // interpolate (NULL when either side has no real row and no seed).
    // The line itself is [[graft.expressions.Lerp]]: reference-exact
    // per-type math (integers round through exact arithmetic like the
    // reference's NUMERIC path; floats shortcircuit equal anchors) and the
    // result KEEPS the value column's type — an int column interpolates to
    // ints, `interpolate.c:222-291`.
    def ex(c: Column) = org.apache.spark.sql.GraftShims.toExpression(c)
    val lerp = org.apache.spark.sql.GraftShims.toColumn(
      graft.expressions.Lerp(ex(x), ex(p0("x")), ex(p1("x")),
        ex(p0("y")), ex(p1("y"))))
    when(!col(filledCol), value)
      .when(p0.isNull || p1.isNull, lit(null))
      .otherwise(lerp)
  }
}
