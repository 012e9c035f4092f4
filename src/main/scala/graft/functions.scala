package graft

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.IntervalUtils
import org.apache.spark.sql.types.CalendarIntervalType
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions._

/** Column-API surface of the engine — the Spark-side equivalent of the
  * reference's SQL functions (`sql/time_bucket.sql`, `sql/bookend.sql`,
  * `sql/histogram.sql`, `sql/gapfill.sql`, `sql/uuidv7.sql`).
  */
object functions {

  private def col(e: Expression): Column = GraftShims.toColumn(e)
  private def ex(c: Column): Expression = GraftShims.toExpression(c)

  /** Parse a PostgreSQL-style interval string ("1 hour", "3 months") into a
    * CalendarInterval literal column — via
    * [[graft.expressions.TimeBucketUtil.pgIntervalText]], so PG's
    * digit-adjacent ("1week") and single-letter ("30m") forms the
    * reference's tests use parse too.
    */
  def interval(s: String): Column =
    col(Literal(IntervalUtils.stringToInterval(UTF8String.fromString(
      graft.expressions.TimeBucketUtil.pgIntervalText(s))), CalendarIntervalType))

  // ---------------------------------------------------------------- buckets

  def time_bucket(width: Column, ts: Column): Column =
    col(TimeBucket(ex(width), ex(ts), None))

  def time_bucket(width: String, ts: Column): Column =
    time_bucket(interval(width), ts)

  /** Third argument: origin (timestamp/date) or offset (interval / integer). */
  def time_bucket(width: Column, ts: Column, originOrOffset: Column): Column =
    col(TimeBucket(ex(width), ex(ts), Some(ex(originOrOffset))))

  def time_bucket(width: String, ts: Column, originOrOffset: Column): Column =
    time_bucket(interval(width), ts, originOrOffset)

  /** `time_bucket(width, ts, timezone)` — buckets in local wall-clock time of
    * `tz`, returns the bucket start as a UTC timestamp (reference
    * `src/time_bucket.c:335+`).
    */
  def time_bucket_tz(width: String, ts: Column, tz: String): Column =
    F.to_utc_timestamp(time_bucket(width, F.from_utc_timestamp(ts, tz)), tz)

  /** `time_bucket(width, uuid)` — bucket of a UUIDv7's embedded timestamp
    * (reference `sql/time_bucket.sql:18-19` uuid overloads). The SQL-form
    * `time_bucket` accepts uuid strings directly.
    */
  def time_bucket_uuid(width: String, uuid: Column): Column =
    time_bucket(width, uuid_timestamp_micros(uuid))

  // ---------------------------------------------------------------- gapfill

  /** `time_bucket_gapfill(width, ts, start, finish)` — like [[time_bucket]]
    * but marks the aggregation for gap-filling: the optimizer rule
    * [[graft.plans.GapfillRewrite]] injects one output row per missing
    * bucket in [start, finish) (reference `sql/gapfill.sql:5-24`). Must be
    * a GROUP BY expression; [[locf]]/[[interpolate]] wrap aggregates in the
    * same query.
    */
  def time_bucket_gapfill(width: String, ts: Column, start: Column, finish: Column): Column =
    col(GapfillBucket(ex(interval(width)), ex(ts), ex(start), ex(finish)))

  /** Two-argument form: the fill window is inferred from the query's
    * WHERE-clause bounds on `ts` (reference default behavior).
    */
  def time_bucket_gapfill(width: String, ts: Column): Column = {
    val nul = Literal(null, org.apache.spark.sql.types.TimestampType)
    col(GapfillBucket(ex(interval(width)), ex(ts), nul, nul))
  }

  /** Timezone form (`sql/gapfill.sql` tz signature): buckets and spine are
    * fixed-width in `tz`'s LOCAL wall-clock (DST-uneven instants —
    * [[Gapfill.gapfillTz]] semantics); `start`/`finish` are instants.
    */
  def time_bucket_gapfill(width: String, ts: Column, tz: String,
      start: Column, finish: Column): Column =
    col(GapfillBucket(ex(interval(width)), ex(ts), ex(start), ex(finish),
      Some(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(tz),
        org.apache.spark.sql.types.StringType))))

  /** Last-observation-carried-forward over gapfilled rows. */
  def locf(agg: Column): Column = col(Locf(ex(agg), None))
  def locf(agg: Column, prev: Column): Column = col(Locf(ex(agg), Some(ex(prev))))
  def locf(agg: Column, prev: Column, treatNullAsMissing: Boolean): Column =
    col(Locf(ex(agg), Some(ex(prev)), treatNullAsMissing))

  /** Linear interpolation across gapfilled rows. */
  def interpolate(agg: Column): Column = col(Interpolate(ex(agg)))

  // --------------------------------------------------------------- bookends

  /** Value of `value` at the smallest `time` in the group
    * (reference `src/agg_bookend.c:29-33`). Rows with null `time` ignored.
    */
  def first(value: Column, time: Column): Column = F.min_by(value, time)

  /** Value of `value` at the largest `time` in the group. */
  def last(value: Column, time: Column): Column = F.max_by(value, time)

  // ----------------------------------------------------------------- uuidv7

  /** Random UUIDv7 stamped with the current time (`sql/uuidv7.sql:5`). */
  def generate_uuidv7(): Column = col(GenerateUuidV7())

  /** UUIDv7 carrying `ts` (ms + sub-ms micros in rand_a), random tail. */
  def to_uuidv7(ts: Column): Column = col(ToUuidV7(ex(ts), boundary = false))

  /** Boundary UUIDv7: all random bits zero — usable in range predicates. */
  def to_uuidv7_boundary(ts: Column): Column = col(ToUuidV7(ex(ts), boundary = true))

  /** Timestamp from a v7 uuid, ms precision. */
  def uuid_timestamp(uuid: Column): Column = col(UuidTimestamp(ex(uuid), withMicros = false))

  /** Timestamp from a v7 uuid including the sub-ms micros field. */
  def uuid_timestamp_micros(uuid: Column): Column = col(UuidTimestamp(ex(uuid), withMicros = true))

  def uuid_version(uuid: Column): Column = col(UuidVersion(ex(uuid)))

  // ----------------------------------------------------------- partitioning

  /** The space-dimension hash of a value — the reference's
    * `get_partition_hash` (`src/partitioning.c:454-468`, SQL
    * `sql/partitioning.sql`). Graft's hash family is Spark's murmur3
    * `hash()` (the same one [[graft.sources.Hypertable]] routes with), so
    * this value matches the `_space` assignment arithmetic, not the
    * reference's numeric output.
    */
  def get_partition_hash(value: Column): Column = F.hash(value)

  /** The closed-dimension bucket for a key under `partitions` buckets —
    * `get_partition_for_key` composed with the range step the reference
    * applies when routing (`src/partitioning.c:470-491`): exactly the
    * `_space` value a row with this key gets.
    */
  def get_partition_for_key(value: Column, partitions: Int): Column =
    F.pmod(F.hash(value), F.lit(partitions))

  // ------------------------------------------------- util_time conversions
  // (`sql/util_time.sql` — the reference's internal time-conversion layer;
  // internal time is Unix-epoch MICROSECONDS as bigint)

  /** Unix-epoch microseconds of a timestamp (`to_unix_microseconds`). */
  def to_unix_microseconds(ts: Column): Column = F.unix_micros(ts)

  /** Timestamp (instant) from Unix-epoch microseconds — the reference's
    * `_timescaledb_functions.to_timestamp(BIGINT)`. Named with the _micros
    * suffix to avoid shadowing Spark's string-parsing `to_timestamp`.
    */
  def to_timestamp_micros(us: Column): Column = F.timestamp_micros(us)

  /** Naive (no-timezone) timestamp carrying the UTC wall clock of the given
    * Unix-epoch micros (`to_timestamp_without_timezone`). Session-zone
    * independent: the NTZ value is the UTC rendering regardless of
    * `spark.sql.session.timeZone`.
    */
  def to_timestamp_without_timezone(us: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.Cast(
      ex(F.timestamp_micros(us)),
      org.apache.spark.sql.types.TimestampNTZType, Some("UTC")))

  /** UTC calendar date containing the given Unix-epoch micros (`to_date`). */
  def to_date_micros(us: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.Cast(
      ex(F.timestamp_micros(us)),
      org.apache.spark.sql.types.DateType, Some("UTC")))

  /** Day-time interval of the given Unix-epoch micros (`to_interval`). */
  def to_interval(us: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.MultiplyDTInterval(
      Literal(1L, org.apache.spark.sql.types.DayTimeIntervalType()), ex(us)))

  /** Total microseconds of an interval under PG epoch-extraction rules
    * (month = 30 days, day = 24 h) — `interval_to_usec`.
    */
  def interval_to_usec(i: Column): Column = col(IntervalToUsec(ex(i)))

  /** Driver-side form for interval strings: `interval_to_usec("1 hour")`. */
  def interval_to_usec(s: String): Long = {
    val ci = IntervalUtils.stringToInterval(UTF8String.fromString(s))
    IntervalToUsec(Literal(ci, CalendarIntervalType)).eval(null).asInstanceOf[Long]
  }

  /** Internal (bigint micros) value of any dimension-typed column
    * (`time_to_internal`): timestamps → Unix micros, dates → midnight UTC
    * micros, integral columns → cast to bigint (integer dimensions keep
    * their own units).
    */
  def time_to_internal(t: Column): Column = col(TimeToInternal(ex(t)))

  // -------------------------------------------------------------- histogram

  /** Bucket index for a fixed-width histogram: 0 = underflow, 1..nbuckets =
    * interior, nbuckets+1 = overflow — the reference's bucketing rule
    * (`src/histogram.c:49+`). Computed as `floor((v-min)/bucketWidth)+1`
    * (not Spark's width_bucket, whose different float formula can flip
    * boundary values).
    */
  def histogram_bucket(value: Column, min: Double, max: Double, nbuckets: Int): Column = {
    val w = (max - min) / nbuckets
    F.when(value < min, 0).when(value >= max, nbuckets + 1)
      .otherwise(F.floor((value - F.lit(min)) / F.lit(w)).cast("int") + 1)
  }

  /** Aggregate: histogram array of length nbuckets+2 with under/overflow at
    * the ends (reference `sql/histogram.sql:5-28`).
    */
  def histogram(value: Column, min: Double, max: Double, nbuckets: Int): Column = {
    val idx = histogram_bucket(value, min, max, nbuckets)
    F.array((0 to nbuckets + 1).map(i =>
      F.sum(F.when(idx === i, 1L).otherwise(0L))): _*)
  }
}
