package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gapfill
import graft.{functions => gf}

/** The SQL/Column surface of gapfill: `time_bucket_gapfill` + `locf` /
  * `interpolate` markers rewritten by [[graft.plans.GapfillRewrite]] —
  * results must equal the explicit [[Gapfill]] operator pipeline.
  */
class GapfillRewriteSpec extends AnyFunSuite {
  lazy val spark = Graft.session("gapfill-rewrite-spec", "local[4]", 4)
  import spark.implicits._

  private lazy val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
  private val start = lit(Timestamp.valueOf("2024-01-01 00:00:00"))
  private val finish = lit(Timestamp.valueOf("2024-01-08 00:00:00"))
  private val (startUs, finishUs) =
    (Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L,
     Timestamp.valueOf("2024-01-08 00:00:00").getTime * 1000L)

  private lazy val expectedLocf = {
    val agg = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket("1 hour", $"ts").as("bucket"), $"event_type")
      .agg(min($"value").as("mv"), count(lit(1)).as("n"))
    Gapfill.gapfill(agg, "bucket", Seq("event_type"), startUs, finishUs, "1 hour")
      .withColumn("mv", Gapfill.locf(col("mv"), Seq("event_type"), "bucket"))
      // analyzer-stage rewrite widens count() to nullable: empty buckets
      // read NULL, exactly like the operator pipeline and the reference
      .select("bucket", "event_type", "mv", "n")
  }

  test("time_bucket_gapfill + locf via the Column API matches the operator pipeline") {
    val out = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket_gapfill("1 hour", $"ts", start, finish).as("bucket"),
        $"event_type")
      .agg(gf.locf(min($"value")).as("mv"), count(lit(1)).as("n"))
      .select("bucket", "event_type", "mv", "n")
    assert(out.collect().toSet === expectedLocf.collect().toSet)
    // spine density: every hour for every present group
    val groups = expectedLocf.select($"event_type").distinct().count()
    assert(out.count() === groups * 7 * 24)
  }

  test("arithmetic INSIDE the marker works (reference 'expressions inside locf')") {
    // reference gapfill.sql.in: `locf(4 + min(value))` is valid — the
    // arithmetic is part of the aggregate the fill applies to
    val out = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket_gapfill("1 hour", $"ts", start, finish).as("bucket"),
        $"event_type")
      .agg(gf.locf(lit(4) + min($"value")).as("x"))
      .select("bucket", "event_type", "x")
    val agg = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket("1 hour", $"ts").as("bucket"), $"event_type")
      .agg((lit(4) + min($"value")).as("x"))
    val expected = Gapfill.gapfill(agg, "bucket", Seq("event_type"), startUs, finishUs, "1 hour")
      .withColumn("x", Gapfill.locf(col("x"), Seq("event_type"), "bucket"))
      .select("bucket", "event_type", "x")
    assert(out.collect().toSet === expected.collect().toSet)
  }

  test("timezone marker form matches the explicit gapfillTz pipeline across DST") {
    val tz = "America/New_York"
    // instants for NY-local midnights around the 2024-03-10 spring-forward
    val sIns = lit(Timestamp.valueOf("2024-02-25 05:00:00")) // 00:00 EST
    val fIns = lit(Timestamp.valueOf("2024-03-25 04:00:00")) // 00:00 EDT
    val evTz = ev.withColumn("ts2", $"ts" + expr("INTERVAL 60 DAYS"))
      .where($"value" > 220 && $"ts2" >= sIns && $"ts2" < fIns)
    val out = evTz
      .groupBy(gf.time_bucket_gapfill("1 day", $"ts2", tz, sIns, fIns).as("day"),
        $"event_type")
      .agg(gf.locf(min($"value")).as("mv"))
      .select("day", "event_type", "mv")
    val agg = evTz
      .groupBy(gf.time_bucket_tz("1 day", $"ts2", tz).as("day"), $"event_type")
      .agg(min($"value").as("mv"))
    val ls = Timestamp.valueOf("2024-02-25 00:00:00").getTime * 1000L
    val lf = Timestamp.valueOf("2024-03-25 00:00:00").getTime * 1000L
    val expected = Gapfill.gapfillTz(agg, "day", Seq("event_type"), ls, lf, "1 day", tz)
      .withColumn("mv", Gapfill.locf($"mv", Seq("event_type"), "day"))
      .select("day", "event_type", "mv")
    assert(out.collect().toSet === expected.collect().toSet)
    // spine density: one bucket per LOCAL day per group (DST day included)
    val groups = expected.select($"event_type").distinct().count()
    assert(out.count() >= groups * 29)
  }

  test("a fill marker nested inside arithmetic errors instead of silently dropping the fill") {
    val e = intercept[Exception] {
      ev.where($"ts" >= start && $"ts" < finish)
        .groupBy(gf.time_bucket_gapfill("1 hour", $"ts", start, finish).as("bucket"),
          $"event_type")
        .agg((gf.locf(min($"value")) * 2).as("x"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("top-level")),
      s"expected the top-level-marker error, got: $e")
  }

  test("interpolate marker matches the operator pipeline") {
    val viaMarker = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket_gapfill("1 hour", $"ts", start, finish).as("bucket"),
        $"event_type")
      .agg(gf.interpolate(min($"value")).as("iv"))
    val agg = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket("1 hour", $"ts").as("bucket"), $"event_type")
      .agg(min($"value").as("iv"))
    val viaOperator = Gapfill.gapfill(agg, "bucket", Seq("event_type"), startUs, finishUs, "1 hour")
      .withColumn("iv", Gapfill.interpolate(col("iv"), Seq("event_type"), "bucket"))
      .select("bucket", "event_type", "iv")
    assert(viaMarker.collect().toSet === viaOperator.collect().toSet)
  }

  test("SQL form works end-to-end through Graft.init registration") {
    ev.createOrReplaceTempView("events_v")
    val out = spark.sql(
      """SELECT time_bucket_gapfill(INTERVAL '1 hour', ts,
        |         TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-08 00:00:00') AS bucket,
        |       event_type, locf(min(value)) AS mv, count(1) AS n
        |FROM events_v
        |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'
        |GROUP BY 1, 2 ORDER BY 2, 1""".stripMargin)
    assert(out.collect().toSet === expectedLocf.collect().toSet)
  }

  test("two-arg form infers the window from the WHERE clause") {
    val explicit = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket_gapfill("1 hour", $"ts", start, finish).as("bucket"),
        $"event_type")
      .agg(gf.locf(min($"value")).as("mv"))
    val inferred = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket_gapfill("1 hour", $"ts").as("bucket"), $"event_type")
      .agg(gf.locf(min($"value")).as("mv"))
    assert(inferred.collect().toSet === explicit.collect().toSet)
    assert(inferred.count() === explicit.count())
  }

  test("filters over gapfilled output are consistent with materialized rows") {
    val out = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket_gapfill("1 hour", $"ts", start, finish).as("bucket"),
        $"event_type")
      .agg(count(lit(1)).as("n"))
    // empty buckets carry NULL counts (reference semantics): IS NULL filters
    // agree with collected rows, and n = 0 never materializes
    val nulls = out.where($"n".isNull).count()
    val nullsCollected = out.collect().count(_.isNullAt(2))
    assert(nulls === nullsCollected)
    assert(nulls > 0) // sparse data: most hourly buckets are empty
    assert(out.where($"n" === 0).count() === 0)
  }

  test("two-arg SQL form with BETWEEN: NULL counts, finish bucket included") {
    ev.createOrReplaceTempView("events_v2")
    val out = spark.sql(
      """SELECT event_type, time_bucket_gapfill(INTERVAL '1 hour', ts) AS bucket,
        |       count(*) AS n
        |FROM events_v2
        |WHERE ts BETWEEN TIMESTAMP '2024-01-01 00:00:00'
        |             AND TIMESTAMP '2024-01-07 23:59:59'
        |GROUP BY 1, 2""".stripMargin).cache()
    try {
      assert(out.schema("n").nullable, "analyzer rewrite must widen count() to nullable")
      assert(out.where($"n".isNull).count() > 0, "empty buckets must read NULL, not 0")
      assert(out.where($"n" === 0).count() === 0)
      // the <= bound's bucket (23:00) is part of the spine
      val groups = out.select($"event_type").distinct().count()
      assert(out.count() === groups * 7 * 24)
    } finally out.unpersist()
  }

  test("ORDER BY over gapfilled output survives the rewrite (attribute ids preserved)") {
    val out = ev
      .where($"ts" >= start && $"ts" < finish)
      .groupBy(gf.time_bucket_gapfill("1 hour", $"ts", start, finish).as("bucket"),
        $"event_type")
      .agg(gf.locf(min($"value")).as("mv"))
      .orderBy($"event_type", $"bucket")
    val buckets = out.select($"event_type", $"bucket").collect()
    assert(buckets.length > 0)
    assert(buckets.sliding(2).forall { case Array(a, b) =>
      val (ka, kb) = (a.getString(0), b.getString(0))
      ka < kb || (ka == kb && !a.getTimestamp(1).after(b.getTimestamp(1)))
    })
  }
}
