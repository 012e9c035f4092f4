package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Golden port of `cagg_ddl.sql`'s `cagg_expr` scenario
  * (`tsl/test/expected/cagg_ddl.out:444-451`): a cagg defining query may
  * carry arbitrary EXPRESSION columns beside the aggregates — constants,
  * CASE, COALESCE, a composite whole-row bookend `first(metrics, time)`,
  * post-aggregation arithmetic (`avg(v1)+avg(v2)`) — and materialize
  * them per bucket. The reference runs under `SET timezone TO 'UTC+8'`
  * (PostgreSQL reads that as a zone NAMED UTC at +8 east — hence the
  * .out's "16:00:00 UTC" day boundaries starting 1999-12-31), and the
  * reference's day-width timestamptz buckets follow the session zone;
  * the timezone bucket form with the IANA equivalent Etc/GMT-8
  * reproduces the golden rows exactly.
  */
class GoldenCaggExprSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-cagg-expr", "local[4]", 4)
  import spark.implicits._

  test("cagg_ddl.out cagg_expr: constant/CASE/COALESCE/composite-bookend/" +
    "post-agg expression columns materialize per session-zone day bucket") {
    val dir = Files.createTempDirectory("graft_cagg_expr").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "time", chunkWidth = "7 days")
    // INSERT ... generate_series('2000-01-01','2000-01-10','1m'),1,0.25,0.75
    val start = Timestamp.valueOf("2000-01-01 00:00:00").getTime / 1000
    val rows = spark.range(0, 9L * 24 * 60 + 1)
      .select(timestamp_seconds($"id" * 60 + start).as("time"),
        lit(1).as("device_id"), lit(0.25).as("v1"), lit(0.75).as("v2"))
    ht.write(rows)
    val defn = CaggDef("1 day", Seq.empty, Seq(
      first(lit("Const")).as("const"),
      first(lit(BigDecimal("4.3"))).as("numeric"),
      gf.first(struct($"time", $"device_id", $"v1", $"v2"), $"time").as("first"),
      first(when(lit(true), "foo").otherwise("bar")).as("case"),
      first(coalesce(lit(null), lit("coalesce"))).as("coalesce"),
      (avg($"v1") + avg($"v2")).as("avg1"),
      avg($"v1" + $"v2").as("avg2")),
      bucketCol = "time_bucket", bucketTz = Some("Etc/GMT-8"))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    cagg.refreshAll()
    val got = cagg.materialized.orderBy($"time_bucket").limit(5).collect()
    // the reference's five golden rows: local-midnight buckets at
    // 16:00 UTC starting 1999-12-31; first() is the bucket's earliest
    // whole row (the data begins 2000-01-01 00:00:00 UTC)
    val expectBuckets = Seq(
      "1999-12-31 16:00:00", "2000-01-01 16:00:00", "2000-01-02 16:00:00",
      "2000-01-03 16:00:00", "2000-01-04 16:00:00")
    got.zip(expectBuckets).foreach { case (r, b) =>
      assert(r.getTimestamp(0) === Timestamp.valueOf(b))
      assert(r.getString(1) === "Const")
      assert(r.getDecimal(2) === new java.math.BigDecimal("4.3"))
      assert(r.getString(4) === "foo")
      assert(r.getString(5) === "coalesce")
      assert(r.getDouble(6) === 1.0 && r.getDouble(7) === 1.0)
    }
    // first() composite rows: bucket 0's earliest sample is the series
    // start; every later bucket's is its own local midnight
    val f0 = got(0).getStruct(3)
    assert(f0.getTimestamp(0) === Timestamp.valueOf("2000-01-01 00:00:00"))
    val f1 = got(1).getStruct(3)
    assert(f1.getTimestamp(0) === Timestamp.valueOf("2000-01-01 16:00:00"))
    assert(f1.getInt(1) === 1 && f1.getDouble(2) === 0.25 && f1.getDouble(3) === 0.75)
    // realtime view carries the same expression columns
    assert(cagg.realtime.columns.toSeq ===
      cagg.materialized.columns.toSeq)
  }
}
