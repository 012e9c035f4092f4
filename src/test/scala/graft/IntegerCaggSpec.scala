package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Continuous aggregates over integer-time (bigint-dimension) hypertables —
  * the reference's own cagg test harness shape
  * (`tsl/test/expected/cagg_invalidation.out`: `conditions` with
  * `chunk_time_interval => 10`, caggs `time_bucket(BIGINT '10'|'20', time)`).
  */
class IntegerCaggSpec extends AnyFunSuite {
  lazy val spark = Graft.session("int-cagg-spec", "local[4]", 4)
  import spark.implicits._

  // conditions(time, device, temp): time 1..100, deterministic temp/device
  private def conditionsRows(n: Int = 100) =
    (1 to n).map(t => (t.toLong, (t % 4).toLong, 20.0 + (t % 10) * 0.5))
      .toDF("time", "device", "temp")

  private def freshConditions(): Hypertable = {
    val dir = Files.createTempDirectory("graft_intcagg").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "time",
      chunkWidth = "10", timeKind = "bigint")
    ht.write(conditionsRows())
    // like the reference's `smallint_now()` setup: integer caggs require
    // the dimension's clock before creation (cagg_refresh_common.sql)
    Hypertable.registerIntegerNow("intcagg_spec_now")(() => 100L)
    ht.setIntegerNowFunc("intcagg_spec_now")
    ht
  }

  private def def10 = CaggDef("10", Seq("device"),
    Seq(avg($"temp").as("avg_temp")), bucketCol = "bucket")
  private def def20 = CaggDef("20", Seq("device"),
    Seq(avg($"temp").as("avg_temp")), bucketCol = "bucket")

  private def direct(ht: Hypertable, width: Long, lo: Long, hi: Long) =
    ht.read().where($"time" >= lo && $"time" < hi)
      .groupBy(gf.time_bucket(lit(width), $"time").as("bucket"), $"device")
      .agg(avg($"temp").as("avg_temp"))

  test("integer cagg refresh matches the direct aggregation; buckets align at 0") {
    val ht = freshConditions()
    val cagg = ContinuousAggregate.create(spark,
      ht.path.stripSuffix("/ht") + "/cond_10", ht, def10)
    cagg.refresh(0L, 100L)
    val mat = cagg.materialized
    assert(mat.schema("bucket").dataType.typeName === "long")
    assert(mat.collect().toSet === direct(ht, 10, 0, 100).collect().toSet)
    // origin-0 alignment: every bucket is a multiple of 10 (ts_int_bucket)
    assert(mat.select($"bucket").collect().forall(_.getLong(0) % 10 === 0))
    assert(cagg.watermark === 100L)
  }

  test("union view with WHERE and HAVING matches the reference golden " +
      "(cagg_union_view.sql mat_m1)") {
    val dir = Files.createTempDirectory("graft_matm1").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "a",
      chunkWidth = "10", timeKind = "bigint")
    ht.write(Seq((3, 16, 20), (1, 10, 20), (1, 11, 20), (1, 12, 20),
        (1, 13, 20), (1, 14, 20), (2, 14, 20), (2, 15, 20), (2, 16, 20),
        (20, 16, 20), (20, 26, 20), (20, 16, 20), (21, 15, 30),
        (21, 15, 30), (21, 15, 30))
      .map { case (a, b, c) => (a.toLong, b.toLong, c.toLong) }
      .toDF("a", "b", "c"))
    Hypertable.registerIntegerNow("matm1_now")(() => 21L)
    ht.setIntegerNowFunc("matm1_now")
    // CREATE MATERIALIZED VIEW mat_m1 AS SELECT time_bucket(1, a),
    //   count(*), sum(b+c), max(c)-min(b), avg(c) FROM ht_intdata
    //   WHERE b < 16 GROUP BY 1 HAVING sum(c) > 50
    val defn = CaggDef("1", Seq.empty, Seq(
        count(lit(1)).as("countb"),
        sum($"b" + $"c").as("sumbc"),
        (max($"c") - min($"b")).as("spreadcb"),
        avg($"c").as("avgc")),
      bucketCol = "a_bucket",
      filter = Some($"b" < 16),
      havingAggs = Seq(sum($"c").as("_sum_c")),
      having = Some($"_sum_c" > 50))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    // "Do partial refresh to have something to union": NULL -> 11
    cagg.refresh(None, Some(11L), force = false)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    // materialized-only: bucket 21 is above the watermark; buckets 2
    // (HAVING fails: sum(c)=40), 3 and 20 (WHERE removes every row) exist
    // on neither side
    assert(rows(cagg.materialized) === Set((1L, 5L, 160L, 10L, 20.0)))
    assert(rows(cagg.realtime) ===
      Set((1L, 5L, 160L, 10L, 20.0), (21L, 3L, 135L, 15L, 30.0)))
    // helper HAVING aggregates never leak into the schema
    assert(!cagg.materialized.columns.contains("_sum_c"))
    assert(!cagg.realtime.columns.contains("_sum_c"))
    // late rows above the watermark surface in the union view immediately
    ht.write(Seq((31L, 15L, 30L), (31L, 14L, 70L)).toDF("a", "b", "c"))
    assert(rows(cagg.realtime) === Set((1L, 5L, 160L, 10L, 20.0),
      (21L, 3L, 135L, 15L, 30.0), (31L, 2L, 129L, 56L, 50.0)))
  }

  test("an integer cagg without an integer-now function is rejected " +
      "(cagg_refresh_common.sql 'custom time function required')") {
    val dir = Files.createTempDirectory("graft_intcagg_nonow").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "time",
      chunkWidth = "10", timeKind = "bigint")
    ht.write(conditionsRows())
    val e = intercept[IllegalArgumentException] {
      ContinuousAggregate.create(spark, s"$dir/bad", ht, def10)
    }
    assert(e.getMessage.contains("custom time function required"))
    // and the failed create must not leave a phantom registration behind
    assert(ht.caggPaths.isEmpty)
  }

  test("mismatched width/dimension kinds are rejected up front") {
    val ht = freshConditions()
    intercept[IllegalArgumentException] {
      ContinuousAggregate.create(spark,
        ht.path.stripSuffix("/ht") + "/bad", ht,
        CaggDef("1 hour", Seq("device"), Seq(avg($"temp").as("avg_temp"))))
    }
  }

  test("realtime view unions materialized and live over integer time") {
    val ht = freshConditions()
    val cagg = ContinuousAggregate.create(spark,
      ht.path.stripSuffix("/ht") + "/rt", ht, def10)
    cagg.refresh(0L, 50L) // materialize only [0, 50)
    val rt = cagg.realtime.collect().toSet
    assert(rt === direct(ht, 10, Long.MinValue / 2, Long.MaxValue / 2).collect().toSet)
  }

  test("two integer caggs: a late write below both thresholds invalidates " +
      "both; each repairs independently (cagg_invalidation.out)") {
    val ht = freshConditions()
    val base = ht.path.stripSuffix("/ht")
    val cond10 = ContinuousAggregate.create(spark, s"$base/cond_10", ht, def10)
    val cond20 = ContinuousAggregate.create(spark, s"$base/cond_20", ht, def20)
    cond10.refresh(0L, 100L)
    cond20.refresh(0L, 100L)
    // "INSERT INTO conditions VALUES (10, 4, 23.7)" — below both thresholds
    ht.write(Seq((10L, 4L, 23.7)).toDF("time", "device", "temp"))
    assert(cond10.pendingInvalidations().exists { case (lo, hi) => lo <= 10 && hi > 10 })
    assert(cond20.pendingInvalidations().exists { case (lo, hi) => lo <= 10 && hi > 10 })
    cond10.refreshInvalidated()
    assert(cond10.pendingInvalidations().isEmpty)
    assert(cond20.pendingInvalidations().nonEmpty)
    assert(cond10.materialized.collect().toSet === direct(ht, 10, 0, 100).collect().toSet)
    cond20.refreshInvalidated()
    assert(cond20.materialized.collect().toSet === direct(ht, 20, 0, 100).collect().toSet)
  }

  test("refresh below the threshold does not move it (invalidation_threshold.c)") {
    val ht = freshConditions()
    val cagg = ContinuousAggregate.create(spark,
      ht.path.stripSuffix("/ht") + "/thr", ht, def10)
    cagg.refresh(0L, 100L)
    assert(cagg.invalidationThreshold === 100L)
    // "Refreshing below the threshold does not move it" (:211-214)
    ht.write(Seq((30L, 1L, 23.4)).toDF("time", "device", "temp"))
    cagg.refresh(20L, 60L)
    assert(cagg.invalidationThreshold === 100L)
    assert(cagg.materialized.collect().toSet === direct(ht, 10, 0, 100).collect().toSet)
  }

  test("refresh cuts log entries against its window (cagg_invalidation.out " +
      "cut-left/right scenarios)") {
    val ht = freshConditions()
    val cagg = ContinuousAggregate.create(spark,
      ht.path.stripSuffix("/ht") + "/cut", ht, def10)
    cagg.refresh(0L, 100L)
    // three late statements → three log entries: [1,26) [60,91) [30,60)
    ht.write(Seq((1L, 4L, 23.7), (25L, 1L, 23.4)).toDF("time", "device", "temp"))
    ht.write(Seq((60L, 3L, 23.6), (90L, 3L, 23.6)).toDF("time", "device", "temp"))
    ht.write(Seq((30L, 1L, 23.4), (59L, 1L, 23.4)).toDF("time", "device", "temp"))
    // the view merges the ADJACENT [30,60)+[60,91) pair (log compaction);
    // the underlying files stay separate and are cut independently
    assert(cagg.pendingInvalidations() === Seq((1L, 26L), (30L, 91L)))
    // refresh [20, 60): the middle entry is fully repaired (deleted), the
    // first is cut to its left remainder, the last is untouched
    cagg.refresh(20L, 60L)
    assert(cagg.pendingInvalidations() === Seq((1L, 20L), (60L, 91L)))
    // the repaired slice really is repaired; the uncut ranges still differ
    assert(cagg.materialized.where($"bucket" >= 20 && $"bucket" < 60).collect().toSet
      === direct(ht, 10, 20, 60).collect().toSet)
    // remaining log drains to a full match
    cagg.refreshInvalidated()
    assert(cagg.pendingInvalidations().isEmpty)
    assert(cagg.materialized.collect().toSet === direct(ht, 10, 0, 100).collect().toSet)
  }

  test("set_integer_now_func drives the integer cagg refresh policy window") {
    val ht = freshConditions()
    val cagg = ContinuousAggregate.create(spark,
      ht.path.stripSuffix("/ht") + "/pol", ht, def10)
    ht.setIntegerNowFunc("intcagg_now")
    Hypertable.registerIntegerNow("intcagg_now")(() => 100L)
    // refresh [now-60, now-10) = [40, 90)
    graft.streaming.CaggRefreshPolicy.run(cagg, ht.nowMicros(), 60L, 10L)
    assert(cagg.watermark === 90L)
    assert(cagg.materialized.collect().toSet === direct(ht, 10, 40, 90).collect().toSet)
  }
}
