package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Port of the reference's `tsl/test/sql/cagg_watermark.sql.in` catalog
  * state machine (expected: `cagg_watermark-17.out`): the invalidation
  * THRESHOLD and hypertable invalidation LOG through the inserts/updates of
  * `continuous_agg_test` / `ca_inval_test` / `ts_continuous_test`.
  *
  * Observable mapping: the reference's
  * `continuous_aggs_invalidation_threshold.watermark` is
  * `cagg.invalidationThreshold`; the log rows
  * (lowest/greatest_modified_value, kept only below the threshold) are
  * `cagg.pendingInvalidations()` — half-open ranges clamped to the
  * threshold at read. One deliberate divergence: the reference's insert
  * trigger logs one row per touched CHUNK, graft's ingest logs one
  * [min, max+1) range per BATCH (DML rewrites log per chunk, same as the
  * reference) — coverage-equivalent, asserted exactly as graft computes it.
  * The suite's later PG-plan sections (prepared-statement constification)
  * are N/A by design: Spark re-plans per query, and realtime watermark
  * freshness is covered by CaggSpec/q49.
  */
class GoldenWatermarkSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-watermark-spec", "local[4]", 4)
  import spark.implicits._

  private def intRows(vs: Long*) = vs.map(t => (t, 1L)).toDF("time", "data")

  private def freshHt(name: String): Hypertable = {
    val dir = Files.createTempDirectory(s"graft_wm_$name").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "time",
      chunkWidth = "10", timeKind = "bigint")
    Hypertable.registerIntegerNow(s"wm_${name}_now")(() => 1000L)
    ht.setIntegerNowFunc(s"wm_${name}_now")
    ht
  }

  private def bucket5 = CaggDef("5", Nil, Seq(count($"time").as("count")),
    bucketCol = "bucket")

  test("cagg_watermark.out part 1: threshold starts at MIN, logging begins " +
      "only below a real threshold (continuous_agg_test)") {
    val ht = freshHt("p1")
    // inserts BEFORE any cagg exists: nothing to log, nothing to observe
    ht.write(intRows(10, 11, 21, 22))
    val cagg = ContinuousAggregate.create(spark,
      ht.path.stripSuffix("/ht") + "/cagg1", ht, bucket5) // WITH NO DATA
    // golden line 46: threshold = -2147483648 (MIN for the int dimension) —
    // graft's sentinel is the watermark floor
    assert(cagg.invalidationThreshold === Long.MinValue)
    // golden line 49: log row-free — everything sits at/above MIN
    assert(cagg.pendingInvalidations() === Seq.empty)
    ht.write(intRows(10, 11, 21, 22))
    assert(cagg.pendingInvalidations() === Seq.empty)

    // golden line 54: threshold manually set to 15
    cagg.setInvalidationThreshold(15L)
    assert(cagg.invalidationThreshold === 15L)
    // golden line 65: INSERT (10),(11),(21),(22) logs only the
    // below-threshold region — reference rows (10,11); graft's batch range
    // [10, 23) clamps to [10, 15) at read
    ht.write(intRows(10, 11, 21, 22))
    assert(cagg.pendingInvalidations() === Seq((10L, 15L)))
    // golden line 77: INSERT purely above (21),(22) adds NOTHING
    ht.write(intRows(21, 22))
    assert(cagg.pendingInvalidations() === Seq((10L, 15L)))
    // golden lines 89-90: INSERT (10),(11) logs again (entries accumulate,
    // no merge on write — graft merges at read into the same clamped range)
    ht.write(intRows(10, 11))
    assert(cagg.pendingInvalidations() === Seq((10L, 15L)))
    // golden lines 102-105: INSERT (1),(12),(24),(51) — below-threshold
    // values 1 and 12 extend the dirty region; 24 and 51 stay unlogged
    ht.write(intRows(1, 12, 24, 51))
    assert(cagg.pendingInvalidations() === Seq((1L, 15L)))
  }

  test("cagg_watermark.out part 2: DML below the threshold logs old AND new " +
      "positions, purely-above DML does not (ca_inval_test)") {
    val ht = freshHt("p2")
    ht.write((0L to 20L).map(t => (t, 1L)).toDF("time", "data"))
    val cagg = ContinuousAggregate.create(spark,
      ht.path.stripSuffix("/ht") + "/cit_view", ht, bucket5)
    cagg.setInvalidationThreshold(15L)
    // drain the creation entry so the DML assertions below see ONLY their
    // own log rows (the reference TRUNCATEs the log at this point)
    cagg.refreshInvalidated()
    cagg.setInvalidationThreshold(15L)
    assert(cagg.pendingInvalidations() === Seq.empty)

    // reference: UPDATE time 6→5 (graft forbids time-column updates — the
    // equivalent route is delete + re-insert, which must log BOTH sides)
    assert(ht.deleteWhere($"time" === 6L) === 1L)
    ht.write(intRows(5))
    val afterMove = cagg.pendingInvalidations()
    assert(afterMove.nonEmpty &&
      afterMove.forall { case (lo, hi) => hi <= 15L } &&
      afterMove.exists { case (lo, hi) => lo <= 5L && hi > 5L } &&
      afterMove.exists { case (lo, hi) => lo <= 6L && hi > 6L },
      s"old (6) and new (5) positions must both be dirty: $afterMove")

    // value-only UPDATE below the threshold: logs the touched chunk
    cagg.refreshInvalidated(); cagg.setInvalidationThreshold(15L)
    assert(ht.updateWhere($"time" === 12L, Map("data" -> lit(9L))) === 1L)
    // updateWhere logs per CHUNK (like the reference trigger): chunk
    // [10,20) clamped to the threshold
    assert(cagg.pendingInvalidations() === Seq((10L, 15L)))

    // UPDATE purely above the threshold: not pending. Granularity note:
    // graft logs the touched CHUNK, so the probe must sit in a chunk
    // entirely at/above the threshold ([20,30) here) — an update at 18
    // would log chunk [10,20), whose below-15 part reads as (spuriously
    // but safely) dirty, unlike the reference's row-value trigger
    cagg.refreshInvalidated(); cagg.setInvalidationThreshold(15L)
    assert(ht.updateWhere($"time" === 20L, Map("data" -> lit(9L))) === 1L)
    assert(cagg.pendingInvalidations() === Seq.empty)
  }

  test("cagg_watermark.out part 3: a cagg created over EXISTING chunks " +
      "starts fully dirty and the first refresh covers them " +
      "(ts_continuous_test)") {
    val ht = freshHt("p3")
    ht.write((0L to 29L).map(t => (t, t)).toDF("time", "data"))
    assert(ht.showChunks().size === 3) // chunks [0,10) [10,20) [20,30)
    val cagg = ContinuousAggregate.create(spark,
      ht.path.stripSuffix("/ht") + "/continuous_view", ht, bucket5)
    // WITH NO DATA: threshold at MIN, nothing pending yet
    assert(cagg.invalidationThreshold === Long.MinValue)
    assert(cagg.materialized.count() === 0)
    // reference: threshold pushed to 2, then INSERT (1) — logged. Graft's
    // creation entry ([-inf,+inf), create.c:437 design note) is ALSO still
    // pending below the threshold, clipped to the data's floor — so the
    // merged range starts at 0, not at the insert
    cagg.setInvalidationThreshold(2L)
    ht.write(intRows(1))
    assert(cagg.pendingInvalidations() === Seq((0L, 2L)))
    // the first full refresh must fold in the pre-existing chunks AND the
    // logged insert: realtime equals the direct aggregation exactly
    cagg.refreshAll()
    val direct = ht.read()
      .groupBy(gf.time_bucket(lit(5L), $"time").as("bucket"))
      .agg(count($"time").as("count"))
    assert(cagg.realtime.collect().toSet === direct.collect().toSet)
    assert(cagg.pendingInvalidations() === Seq.empty)
  }
}
