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
