package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.CaggRewrite
import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

class CaggRewriteSpec extends AnyFunSuite {
  lazy val spark = Graft.session("cagg-rewrite-spec", "local[4]", 4)
  import spark.implicits._

  private def us(s: String) = Timestamp.valueOf(s).getTime * 1000L

  private def setup(): (Hypertable, ContinuousAggregate) = {
    CaggRewrite.clear()
    val dir = Files.createTempDirectory("graft_cagg_rw").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht,
      CaggDef("1 hour", Seq("event_type"), Seq(
        count(lit(1)).as("n"), min($"value").as("min_value"))))
    (ht, cagg)
  }

  private def rawHourly(ht: Hypertable) = ht.read()
    .groupBy(gf.time_bucket("1 hour", $"ts").as("bucket"), $"event_type")
    .agg(count(lit(1)).as("n"), min($"value").as("min_value"))

  private def scansMat(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("_mat_chunk")

  test("matching raw aggregation is answered from the cagg") {
    val (ht, cagg) = setup()
    cagg.refresh(us("2024-01-01 00:00:00"), us("2024-02-01 00:00:00"))
    val direct = rawHourly(ht).collect().toSet
    Graft.registerCaggRewrite(cagg)
    val q = rawHourly(ht)
    assert(scansMat(q), s"expected mat scan in:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSet === direct)
    // GUC parity (timescaledb.enable_cagg_rewrites, src/guc.c:974): off →
    // the same query reads raw, same answers
    spark.conf.set("spark.graft.enable_cagg_rewrites", "false")
    try {
      val raw = rawHourly(ht)
      assert(!scansMat(raw))
      assert(raw.collect().toSet === direct)
    } finally spark.conf.unset("spark.graft.enable_cagg_rewrites")
  }

  test("month-width cagg rewrites monthly raw aggregations") {
    CaggRewrite.clear()
    val dir = Files.createTempDirectory("graft_cagg_rw_m").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "1 month")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    val mdefn = CaggDef("1 month", Seq("event_type"), Seq(
      count(lit(1)).as("n"), min($"value").as("min_value")))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, mdefn)
    cagg.refresh(us("2024-01-01 00:00:00"), us("2024-02-01 00:00:00"))
    Graft.registerCaggRewrite(cagg)
    def monthly = ht.read()
      .groupBy(gf.time_bucket("1 month", $"ts").as("bucket"), $"event_type")
      .agg(count(lit(1)).as("n"), min($"value").as("min_value"))
    val direct = monthly.collect().toSet
    CaggRewrite.clear()
    val baseline = monthly.collect().toSet
    assert(baseline === direct)
    Graft.registerCaggRewrite(cagg)
    val q = monthly
    assert(scansMat(q), s"expected mat scan in:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSet === direct)
  }

  test("rewrite composes with the realtime union under partial materialization") {
    val (ht, cagg) = setup()
    cagg.refresh(us("2024-01-01 00:00:00"), us("2024-01-15 00:00:00"))
    Graft.registerCaggRewrite(cagg)
    val q = rawHourly(ht)
    assert(scansMat(q))
    assert(q.collect().toSet === rawHourly(ht).collect().toSet)
    // subset of aggregates also rewrites
    val narrow = ht.read()
      .groupBy(gf.time_bucket("1 hour", $"ts").as("b"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
    assert(scansMat(narrow))
  }

  test("SQL queries over a hypertable view rewrite too") {
    val (ht, cagg) = setup()
    cagg.refresh(us("2024-01-01 00:00:00"), us("2024-02-01 00:00:00"))
    Graft.registerCaggRewrite(cagg)
    ht.read().createOrReplaceTempView("ht_rw_v")
    val q = spark.sql(
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
        | count(1) AS n, min(value) AS min_value
        |FROM ht_rw_v GROUP BY 1, 2""".stripMargin)
    assert(scansMat(q), s"expected mat scan in:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSet === rawHourly(ht).collect().toSet)
  }

  test("integer-time cagg rewrites raw integer-bucket aggregations") {
    CaggRewrite.clear()
    val dir = Files.createTempDirectory("graft_cagg_rw_int").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "time",
      chunkWidth = "10", timeKind = "bigint")
    ht.write((1 to 100).map(t => (t.toLong, (t % 4).toLong, 20.0 + t % 10))
      .toDF("time", "device", "temp"))
    Hypertable.registerIntegerNow("cagg_rw_int_now")(() => 100L)
    ht.setIntegerNowFunc("cagg_rw_int_now")
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht,
      CaggDef("10", Seq("device"), Seq(count(lit(1)).as("n"))))
    cagg.refresh(0L, 110L)
    def raw = ht.read()
      .groupBy(gf.time_bucket(lit(10L), $"time").as("bucket"), $"device")
      .agg(count(lit(1)).as("n"))
    val direct = raw.collect().toSet
    Graft.registerCaggRewrite(cagg)
    val q = raw
    assert(scansMat(q), s"expected mat scan in:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSet === direct)
  }

  test("tz and origin caggs rewrite only their own bucket forms") {
    CaggRewrite.clear()
    val dir = Files.createTempDirectory("graft_cagg_rw_tz").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    val tzCagg = ContinuousAggregate.create(spark, s"$dir/ctz", ht,
      CaggDef("1 day", Seq("event_type"), Seq(count(lit(1)).as("n")),
        bucketTz = Some("America/New_York")))
    tzCagg.refresh(tzCagg.defn.bucketFloor(us("2024-01-01 00:00:00")),
      tzCagg.defn.bucketAdvance(tzCagg.defn.bucketFloor(us("2024-02-01 00:00:00")), 1))
    def rawTz = ht.read()
      .groupBy(gf.time_bucket_tz("1 day", $"ts", "America/New_York").as("day_ny"),
        $"event_type")
      .agg(count(lit(1)).as("n"))
    val direct = rawTz.collect().toSet
    Graft.registerCaggRewrite(tzCagg)
    val q = rawTz
    assert(scansMat(q), s"expected mat scan in:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSet === direct)
    // a PLAIN daily aggregation must NOT match the tz cagg (different
    // bucket alignment), and a different zone must not either
    assert(!scansMat(ht.read()
      .groupBy(gf.time_bucket("1 day", $"ts").as("b"), $"event_type")
      .agg(count(lit(1)).as("n"))))
    assert(!scansMat(ht.read()
      .groupBy(gf.time_bucket_tz("1 day", $"ts", "Europe/Berlin").as("b"), $"event_type")
      .agg(count(lit(1)).as("n"))))

    // origin cagg: matches only the same-origin form
    CaggRewrite.clear()
    val origin = us("2024-01-04 00:00:00")
    val oCagg = ContinuousAggregate.create(spark, s"$dir/cog", ht,
      CaggDef("7 days", Seq("event_type"), Seq(count(lit(1)).as("n")),
        bucketOriginMicros = Some(origin)))
    oCagg.refresh(oCagg.defn.bucketFloor(us("2024-01-01 00:00:00")),
      oCagg.defn.bucketAdvance(oCagg.defn.bucketFloor(us("2024-02-01 00:00:00")), 1))
    def rawOg = ht.read()
      .groupBy(gf.time_bucket("7 days", $"ts",
        timestamp_micros(lit(origin))).as("wk"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val directOg = rawOg.collect().toSet
    Graft.registerCaggRewrite(oCagg)
    val q2 = rawOg
    assert(scansMat(q2), s"expected mat scan in:\n${q2.queryExecution.optimizedPlan}")
    assert(q2.collect().toSet === directOg)
    // default-origin weekly form must not match the custom-origin cagg
    assert(!scansMat(ht.read()
      .groupBy(gf.time_bucket("7 days", $"ts").as("wk"), $"event_type")
      .agg(count(lit(1)).as("n"))))
  }

  test("non-matching shapes are not rewritten") {
    val (ht, cagg) = setup()
    cagg.refresh(us("2024-01-01 00:00:00"), us("2024-02-01 00:00:00"))
    Graft.registerCaggRewrite(cagg)
    // wrong width
    assert(!scansMat(ht.read()
      .groupBy(gf.time_bucket("2 hours", $"ts").as("b"), $"event_type")
      .agg(count(lit(1)).as("n"))))
    // extra group column
    assert(!scansMat(ht.read()
      .groupBy(gf.time_bucket("1 hour", $"ts").as("b"), $"event_type", $"user_id")
      .agg(count(lit(1)).as("n"))))
    // filtered input changes bucket contents
    assert(!scansMat(ht.read().where($"value" > 10)
      .groupBy(gf.time_bucket("1 hour", $"ts").as("b"), $"event_type")
      .agg(count(lit(1)).as("n"))))
    // unknown aggregate
    assert(!scansMat(ht.read()
      .groupBy(gf.time_bucket("1 hour", $"ts").as("b"), $"event_type")
      .agg(max($"value").as("mx"))))
  }
}
