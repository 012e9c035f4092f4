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
}
