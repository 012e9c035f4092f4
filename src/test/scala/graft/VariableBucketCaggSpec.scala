package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.TimeBucketUtil
import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Variable-bucket caggs — the reference's timezone and custom-origin
  * `time_bucket` cagg forms (`tsl/test/sql/cagg_timezone.sql`,
  * `exp_cagg_origin.sql`): bucket boundaries are local-midnight instants
  * (uneven across DST) or origin-shifted, and the refresh machinery's
  * driver-side alignment must agree with the column expression exactly.
  */
class VariableBucketCaggSpec extends AnyFunSuite {
  lazy val spark = Graft.session("varbucket-cagg-spec", "local[4]", 4)
  import spark.implicits._

  private val NY = "America/New_York"
  private def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L

  /** Synthetic events spanning the 2024-03-10 US spring-forward: one row
    * per 20 minutes, two event types, over March 5-15 (UTC).
    */
  private def dstHt(): Hypertable = {
    val dir = Files.createTempDirectory("graft_vb").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    val start = us("2024-03-05 00:00:00")
    val rows = spark.range(0, 720).select(
      col("id").as("event_id"),
      timestamp_micros(lit(start) + col("id") * lit(1200000000L)).as("ts"),
      (col("id") % 7).as("user_id"),
      when(col("id") % 2 === 0, "click").otherwise("view").as("event_type"),
      (col("id") % 100).cast("double").as("value"))
    ht.write(rows)
    ht
  }

  test("driver-side tz bucket floor/advance agree with the column " +
      "expression across both DST transitions") {
    val defn = CaggDef("1 day", Seq("event_type"),
      Seq(count(lit(1)).as("n")), bucketTz = Some(NY))
    // instants straddling spring-forward (2024-03-10 02:00 EST -> 03:00
    // EDT) and fall-back (2024-11-03 02:00 EDT -> 01:00 EST), plus plain
    // days, at awkward sub-day offsets
    val probes = Seq(
      "2024-03-09 12:00:00", "2024-03-10 06:59:59", "2024-03-10 07:00:00",
      "2024-03-10 23:30:00", "2024-03-11 03:59:59", "2024-03-11 04:00:00",
      "2024-11-02 12:00:00", "2024-11-03 05:59:59", "2024-11-03 06:00:00",
      "2024-11-03 23:00:00", "2024-11-04 04:59:59", "2024-11-04 05:00:00",
      "2024-06-15 17:45:12", "2024-12-31 23:59:59").map(us)
    val fromCol = spark.createDataset(probes).toDF("us")
      .select(unix_micros(gf.time_bucket_tz("1 day",
        timestamp_micros($"us"), NY)).as("b"))
      .as[Long].collect()
    val fromDriver = probes.map(defn.bucketFloor)
    assert(fromDriver === fromCol.toSeq)
    // floors are idempotent and advance lands on the NEXT floor (bucket
    // spans are 23h/24h/25h instants across the transitions)
    probes.foreach { p =>
      val b = defn.bucketFloor(p)
      assert(defn.bucketFloor(b) === b)
      val nxt = defn.bucketAdvance(b, 1)
      assert(defn.bucketFloor(nxt) === nxt)
      assert(nxt > b)
    }
    // the spring-forward day is 23 hours as an instant span
    val dstDay = defn.bucketFloor(us("2024-03-10 12:00:00"))
    assert(defn.bucketAdvance(dstDay, 1) - dstDay === 23L * 3600000000L)
  }

  test("tz cagg: refresh materializes NY-local daily buckets equal to the " +
      "direct aggregation; late data repairs through invalidation") {
    val ht = dstHt()
    val defn = CaggDef("1 day", Seq("event_type"), Seq(
      count(lit(1)).as("n"),
      expr("CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)").as("sum_value")),
      bucketTz = Some(NY))
    val dir = Files.createTempDirectory("graft_vb_c").toString
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    cagg.refresh(defn.bucketFloor(us("2024-03-05 00:00:00")),
      defn.bucketAdvance(defn.bucketFloor(us("2024-03-15 00:00:00")), 1))
    def direct() = ht.read()
      .groupBy(gf.time_bucket_tz("1 day", $"ts", NY).as("bucket"), $"event_type")
      .agg(defn.aggs.head, defn.aggs.tail: _*)
    assert(cagg.materialized.collect().toSet === direct().collect().toSet)
    // bucket instants are NY midnights: 05:00 UTC in EST, 04:00 in EDT —
    // both offsets must appear across the spring-forward window
    val hours = cagg.materialized
      .select(hour($"bucket")).distinct().as[Int].collect().toSet
    assert(hours === Set(4, 5))
    // late row below the watermark → logged, repaired on the next pass
    // (the batch matches the table's declared schema — an extra column
    // would now be rejected, ALTER TABLE semantics)
    cagg.ingest(Seq((990001L, Timestamp.valueOf("2024-03-10 12:10:00"), 1L,
        "click", 55.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    cagg.refreshInvalidated()
    assert(cagg.materialized.collect().toSet === direct().collect().toSet)
  }

  test("origin cagg: weekly buckets align to the custom origin and match " +
      "the direct aggregation") {
    val ht = dstHt()
    val origin = us("2024-03-06 00:00:00") // a Wednesday
    val defn = CaggDef("7 days", Seq("event_type"),
      Seq(count(lit(1)).as("n")), bucketOriginMicros = Some(origin))
    val dir = Files.createTempDirectory("graft_vb_o").toString
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    cagg.refresh(defn.bucketFloor(us("2024-03-05 00:00:00")),
      defn.bucketAdvance(defn.bucketFloor(us("2024-03-15 00:00:00")), 1))
    val direct = ht.read()
      .groupBy(gf.time_bucket("7 days", $"ts",
        timestamp_micros(lit(origin))).as("bucket"), $"event_type")
      .agg(defn.aggs.head, defn.aggs.tail: _*)
    assert(cagg.materialized.collect().toSet === direct.collect().toSet)
    // every bucket start is origin + k weeks (Wednesdays)
    val starts = cagg.materialized.select(unix_micros($"bucket"))
      .distinct().as[Long].collect()
    assert(starts.nonEmpty)
    starts.foreach(b =>
      assert((b - origin) % (7L * 86400000000L) === 0L, s"misaligned $b"))
    // validation: tz+origin combined and month origins past day 28 refuse
    intercept[IllegalArgumentException] {
      CaggDef("1 day", Nil, Seq(count(lit(1)).as("n")),
        bucketTz = Some(NY), bucketOriginMicros = Some(origin))
    }
    intercept[IllegalArgumentException] {
      CaggDef("1 month", Nil, Seq(count(lit(1)).as("n")),
        bucketOriginMicros = Some(us("2024-01-31 00:00:00"))).bucketFloor(0L)
    }
  }

  test("tz month-width cagg buckets on local month boundaries") {
    val defn = CaggDef("1 month", Seq("event_type"),
      Seq(count(lit(1)).as("n")), bucketTz = Some(NY))
    // 2024-03-01 00:00 NY = 05:00 UTC; floor of mid-March must hit it
    val b = defn.bucketFloor(us("2024-03-20 12:00:00"))
    assert(b === us("2024-03-01 05:00:00"))
    // next month start is April 1 EDT midnight = 04:00 UTC
    assert(defn.bucketAdvance(b, 1) === us("2024-04-01 04:00:00"))
    assert(defn.bucketFloor(defn.bucketAdvance(b, 1)) === defn.bucketAdvance(b, 1))
  }

  /** Month-width invalidation at month EDGES — the reference's
    * `cagg_invalidation_variable_bucket.sql`: the last microsecond of
    * February dirties only the February bucket, the first microsecond of
    * March only March, and a PARTIAL multi-month refresh window inscribes
    * to whole months — refresh('02-15','04-15') repairs ONLY March,
    * leaving the Feb and Apr dirt logged (the expected output's remaining
    * invals `[Feb-01, Feb-29 23:59:59.999999]` / `[Apr-01, ...]`,
    * `cagg_invalidation_variable_bucket.out`).
    */
  test("month-width cagg: edge-microsecond invalidations and whole-month " +
    "window inscribing (leap February, 29/30/31-day months)") {
    val dir = Files.createTempDirectory("graft_vb_month").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "1 month")
    // one row per day, 2024-01-01 .. 2024-05-30 (covers the 29-day leap
    // February, 31-day March, 30-day April)
    val day = 86400L * 1000000L
    val t0 = us("2024-01-01 00:00:00")
    ht.write(spark.range(0, 151).select(
      timestamp_micros(lit(t0) + col("id") * lit(day)).as("ts"),
      col("id").cast("double").as("value")))
    def rowAt(usV: Long, v: Double) = spark.range(1).select(
      timestamp_micros(lit(usV)).as("ts"), lit(v).as("value"))
    val defn = CaggDef("1 month", Seq.empty, Seq(
      count(lit(1)).as("n"),
      sum($"value".cast("decimal(20,10)")).as("sv")), bucketCol = "bucket")
    def direct(lo: Long, hi: Long) =
      ht.read().where($"ts" >= timestamp_micros(lit(lo)) && $"ts" < timestamp_micros(lit(hi)))
        .groupBy(gf.time_bucket("1 month", $"ts").as("bucket"))
        .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(20,10)")).as("sv"))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    cagg.refresh(us("2024-01-01 00:00:00"), us("2025-01-01 00:00:00"))
    assert(cagg.pendingInvalidations() === Seq.empty)

    // edge microseconds: adjacent single-row writes merge into ONE pending
    // range spanning the month boundary...
    val feb29Last = us("2024-03-01 00:00:00") - 1L
    val mar1 = us("2024-03-01 00:00:00")
    ht.write(rowAt(feb29Last, 888.0))
    ht.write(rowAt(mar1, 777.0))
    assert(cagg.pendingInvalidations() === Seq((feb29Last, mar1 + 1L)))
    // ...but the February refresh repairs only the February MICROSECOND:
    // the cut leaves exactly the March instant pending
    cagg.refresh(us("2024-02-01 00:00:00"), us("2024-03-01 00:00:00"))
    assert(cagg.pendingInvalidations() === Seq((mar1, mar1 + 1L)))
    val febBucket = us("2024-02-01 00:00:00")
    val marBucket = mar1
    assert(cagg.materialized.where($"bucket" === timestamp_micros(lit(febBucket)))
      .collect().toSet ===
      direct(febBucket, mar1).collect().toSet) // 888 included
    // March still serves the stale count (777 not yet materialized)
    val marStaleN = cagg.materialized
      .where($"bucket" === timestamp_micros(lit(marBucket))).head().getAs[Long]("n")
    assert(marStaleN === 31L)
    cagg.refresh(mar1, us("2024-04-01 00:00:00"))
    assert(cagg.pendingInvalidations() === Seq.empty)

    // the 29/30/31-day partial-window matrix: dirt in Feb, Mar, Apr; a
    // [Feb-15, Apr-15) window inscribes to [Mar-01, Apr-01) and repairs
    // ONLY March — Feb and Apr dirt must remain logged
    val feb29b = us("2024-02-29 23:59:59")
    val mar31 = us("2024-03-31 12:00:00")
    val apr30 = us("2024-04-30 23:59:59")
    ht.write(rowAt(feb29b, 100.0))
    ht.write(rowAt(mar31, 200.0))
    ht.write(rowAt(apr30, 300.0))
    assert(cagg.pendingInvalidations() ===
      Seq((feb29b, feb29b + 1L), (mar31, mar31 + 1L), (apr30, apr30 + 1L)))
    cagg.refresh(us("2024-02-15 00:00:00"), us("2024-04-15 00:00:00"))
    assert(cagg.pendingInvalidations() ===
      Seq((feb29b, feb29b + 1L), (apr30, apr30 + 1L)))
    assert(cagg.materialized.where($"bucket" === timestamp_micros(lit(marBucket)))
      .collect().toSet ===
      direct(marBucket, us("2024-04-01 00:00:00")).collect().toSet) // 200 included
    // full repair converges exactly
    cagg.refresh(us("2024-01-01 00:00:00"), us("2025-01-01 00:00:00"))
    assert(cagg.pendingInvalidations() === Seq.empty)
    assert(cagg.materialized.collect().toSet ===
      direct(t0, us("2025-01-01 00:00:00")).collect().toSet)
  }

  /** Batched refresh over local-daily buckets ACROSS a DST transition —
    * the reference's `cagg_dst_daily` section of
    * `cagg_invalidation_variable_bucket.sql` (Berlin-local days, refresh
    * with the `options` jsonb): batch carving steps with `bucketAdvance`,
    * so the 23-hour spring-forward day and the 25-hour fall-back day are
    * whole batch members, never split mid-bucket; a capped execution
    * re-logs the skipped region instead of leaving it silently
    * unmaterialized.
    */
  test("batched refresh carves Berlin-local daily buckets across DST; a " +
    "capped execution re-logs the skipped tail") {
    val dir = Files.createTempDirectory("graft_vb_dst").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    // one row per hour across BOTH 2025 Berlin transitions: Mar 30
    // (spring forward, 23 h) and Oct 26 (fall back, 25 h)
    val hour = 3600L * 1000000L
    val spring0 = us("2025-03-25 00:00:00")
    val fall0 = us("2025-10-21 00:00:00")
    ht.write(spark.range(0, 240).select(
      timestamp_micros(lit(spring0) + col("id") * lit(hour)).as("ts"),
      lit(1.0).as("value"))
      .unionAll(spark.range(0, 240).select(
        timestamp_micros(lit(fall0) + col("id") * lit(hour)).as("ts"),
        lit(1.0).as("value"))))
    val defn = CaggDef("1 day", Seq.empty,
      Seq(count(lit(1)).as("n")), bucketTz = Some("Europe/Berlin"))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    def direct() = ht.read()
      .groupBy(gf.time_bucket_tz("1 day", $"ts", "Europe/Berlin").as("bucket"))
      .agg(count(lit(1)).as("n"))

    // capped first execution: 2 batches of 3 local days, newest first —
    // the skipped OLD region must come back as pending dirt
    val done = cagg.refreshBatched(
      Some(us("2025-03-25 00:00:00")), Some(us("2025-11-01 00:00:00")),
      bucketsPerBatch = 3, maxBatchesPerExecution = 2)
    assert(done.size === 2)
    assert(cagg.pendingInvalidations().nonEmpty,
      "capped execution must re-log the skipped batches")
    // drain: further executions pick the logged region up
    var rounds = 0
    while (cagg.pendingInvalidations().nonEmpty && rounds < 40) {
      cagg.refreshInvalidated(); rounds += 1
    }
    assert(cagg.pendingInvalidations() === Seq.empty)
    val mat = cagg.materialized.collect().toSet
    assert(mat === direct().collect().toSet)
    // the DST days really are uneven: 23 local hours on spring-forward
    // day, 25 on fall-back (one row per hour ⇒ n = local day length)
    val byBucket = cagg.materialized.collect()
      .map(r => r.getTimestamp(0).toString -> r.getAs[Long]("n")).toMap
    assert(byBucket("2025-03-29 23:00:00.0") === 23L) // Mar 30 local = 23:00 UTC prior day
    assert(byBucket("2025-10-25 22:00:00.0") === 25L) // Oct 26 local (CEST) = 22:00 UTC prior day
  }
}
