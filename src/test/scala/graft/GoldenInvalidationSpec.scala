package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Port of the reference's invalidation state machine
  * (`tsl/test/sql/cagg_invalidation.sql` + its expected output): the same
  * table (`conditions`, bigint time 1..100, chunk interval 10), the same
  * two caggs (width 10 and 20), the same op sequence, with the pinned
  * observables at every stage.
  *
  * Representation mapping (documented divergences, same repaired buckets):
  *  - the reference keeps RAW per-chunk log entries (`cagg_invals` shows
  *    overlapping [0,19],[10,19]); graft logs one range per mutation batch
  *    and the observable is [[ContinuousAggregate.pendingInvalidations]] —
  *    the MERGED dirty set below the threshold, clipped to data bounds.
  *    Reference entries are inclusive [lo,hi]; graft ranges are [lo,hi+1).
  *  - the reference tracks ONE invalidation threshold per hypertable (max
  *    over its caggs) and distributes log entries at refresh time; graft
  *    keeps a threshold PER CAGG and distributes at mutation time, cutting
  *    at each cagg's own threshold (`cagg_invalidation.out:186-190` vs
  *    `Hypertable.invalidateCaggs`). An entry dropped above a cagg's
  *    threshold is covered by that cagg's still-logged creation-entry
  *    remainder / realtime tail — the repaired buckets end up identical,
  *    which the mat≡direct checks at each stage prove.
  *  - bucket-widening happens at REPAIR time in graft (refresh widens dirt
  *    to whole buckets) where the reference widens entries at distribution
  *    (`[60,70]→[60,79]`); pending ranges below are therefore raw, not
  *    bucket-aligned.
  */
class GoldenInvalidationSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-invalidation-spec", "local[4]", 4)
  import spark.implicits._

  private def conditionsRows =
    (1 to 100).map(t => (t.toLong, (t % 4).toLong, 20.0 + (t % 10) * 0.5))
      .toDF("time", "device", "temp")

  private def rows(vs: (Long, Long, Double)*) = vs.toDF("time", "device", "temp")

  private def direct(ht: Hypertable, width: Long, lo: Long, hi: Long) =
    ht.read().where($"time" >= lo && $"time" < hi)
      .groupBy(gf.time_bucket(lit(width), $"time").as("bucket"), $"device")
      .agg(avg($"temp".cast("decimal(20,10)")).as("avg_temp")) // exact: no float reorder noise

  test("cagg_invalidation.sql op sequence: thresholds, pending ranges, and " +
    "materialization equality at every pinned stage") {
    val dir = Files.createTempDirectory("graft_goldinv").toString
    val ht = Hypertable.create(spark, s"$dir/conditions", "time",
      chunkWidth = "10", timeKind = "bigint")
    ht.write(conditionsRows)
    Hypertable.registerIntegerNow("goldinv_now")(() => 100L)
    ht.setIntegerNowFunc("goldinv_now")
    val cond10 = ContinuousAggregate.create(spark, s"$dir/cond_10", ht,
      CaggDef("10", Seq("device"),
        Seq(avg($"temp".cast("decimal(20,10)")).as("avg_temp")),
        bucketCol = "bucket"))
    val cond20 = ContinuousAggregate.create(spark, s"$dir/cond_20", ht,
      CaggDef("20", Seq("device"),
        Seq(avg($"temp".cast("decimal(20,10)")).as("avg_temp")),
        bucketCol = "bucket"))

    // WITH NO DATA: everything is the unmaterialized tail (threshold at
    // -inf), so nothing is PENDING repair yet (the reference's log holds
    // the creation [-inf,+inf) entry, `cagg_invalidation.out:141`)
    assert(cond10.pendingInvalidations() === Seq.empty)
    assert(cond20.pendingInvalidations() === Seq.empty)

    // refresh cond_10 over [1,50): inscribes to [10,50); threshold and
    // watermark land at 50 (`cagg_invalidation.out:184-199` — threshold 50,
    // log remainders [-inf,9] and [50,+inf])
    cond10.refresh(1L, 50L)
    assert(cond10.watermark === 50L && cond10.invalidationThreshold === 50L)
    assert(cond10.pendingInvalidations() === Seq((1L, 10L))) // = ref [-inf,9] ∩ data
    assert(cond10.materialized.where($"bucket" < 50).collect().toSet ===
      direct(ht, 10, 10, 50).collect().toSet)

    // refresh [0,50) from the beginning clears the left remainder
    // (`cagg_invalidation.out:202-208` — remainder [-inf,-1], empty in-data)
    cond10.refresh(0L, 50L)
    assert(cond10.pendingInvalidations() === Seq.empty)

    // refreshing an already-clean window below the threshold changes
    // NOTHING: no threshold/watermark move, no log change
    // (`cagg_invalidation.out:210-228` — "already up-to-date")
    cond10.refresh(20L, 49L)
    assert(cond10.watermark === 50L && cond10.invalidationThreshold === 50L)
    assert(cond10.pendingInvalidations() === Seq.empty)

    // refreshing cond_20 over [60,100) is independent of cond_10
    // (`cagg_invalidation.out:253-272` — threshold moves, cagg 4's log cut
    // to [-inf,59] and [100,+inf]; cagg 3 untouched)
    cond20.refresh(60L, 100L)
    assert(cond20.watermark === 100L && cond20.invalidationThreshold === 100L)
    assert(cond20.pendingInvalidations() === Seq((1L, 60L))) // = ref [-inf,59] ∩ data
    assert(cond10.pendingInvalidations() === Seq.empty)

    // inserts below cond_10's threshold are logged for it; the [60,70]
    // batch is above its threshold (50) and drops from ITS log — cond_10's
    // [50,+inf) creation remainder still covers that region. cond_20
    // (threshold 100) logs all three (`cagg_invalidation.out:295-311`:
    // hyper log gains [10,10],[10,19],[60,60],[70,70])
    ht.write(rows((10L, 4L, 23.7)))
    ht.write(rows((10L, 5L, 23.8), (19L, 3L, 23.6)))
    ht.write(rows((60L, 3L, 23.7), (70L, 4L, 23.7)))
    assert(cond10.pendingInvalidations() === Seq((10L, 20L))) // merged [10,10]+[10,19]
    assert(cond20.pendingInvalidations() === Seq((1L, 71L))) // [-inf,59] ∪ [10,20) ∪ [60,71)

    // refresh cond_10 over [20,60): the [10,19] dirt lies LEFT of the
    // window and stays; threshold/watermark advance to 60; the view
    // equals the raw aggregation over the window — the reference's
    // cont_agg_test_equal_query check (`cagg_invalidation.out:346-368`)
    cond10.refresh(20L, 60L)
    assert(cond10.watermark === 60L && cond10.invalidationThreshold === 60L)
    assert(cond10.pendingInvalidations() === Seq((10L, 20L)))
    assert(cond10.materialized.where($"bucket" >= 20 && $"bucket" < 60)
      .collect().toSet === direct(ht, 10, 20, 60).collect().toSet)

    // the cutting matrix (`cagg_invalidation.sql:225-240`): entries fully
    // inside the next [20,60) window (deleted), cut right, cut both, cut
    // left — graft logs one [min,max+1) range per batch, cut at the
    // cagg's threshold (60) on arrival
    ht.write(rows((30L, 1L, 23.4), (59L, 1L, 23.4))) // inside → deleted
    ht.write(rows((20L, 1L, 23.4), (30L, 1L, 23.4))) // inside → deleted
    ht.write(rows((1L, 4L, 23.7), (25L, 1L, 23.4)))  // cut right → [1,20)
    ht.write(rows((19L, 4L, 23.7), (59L, 1L, 23.4))) // cut right → [19,20)
    ht.write(rows((2L, 2L, 23.5), (60L, 1L, 23.4)))  // spans; hi clipped at threshold
    ht.write(rows((3L, 2L, 23.5), (80L, 1L, 23.4)))  // spans; hi clipped at threshold
    ht.write(rows((60L, 3L, 23.6), (90L, 3L, 23.6))) // wholly above threshold → dropped
    ht.write(rows((20L, 5L, 23.8), (100L, 3L, 23.6))) // cut at threshold → [20,60)
    assert(cond10.pendingInvalidations() === Seq((1L, 60L)))

    // refresh [20,60): everything inside repaired, remainders stay left of
    // the window (`cagg_invalidation.out:446-476` — cond_10's entries cut,
    // cond_20's untouched), and the view again equals the raw aggregation
    cond10.refresh(20L, 60L)
    assert(cond10.pendingInvalidations() === Seq((1L, 20L)))
    assert(cond20.pendingInvalidations().nonEmpty) // un-refreshed sibling keeps its dirt
    assert(cond10.materialized.where($"bucket" >= 20 && $"bucket" < 60)
      .collect().toSet === direct(ht, 10, 20, 60).collect().toSet)

    // repair the left remainder, then the region above the old threshold:
    // the [60,70]/[60,90] batches that were dropped from the log are
    // covered by the [60,+inf) creation remainder — refreshing [60,110)
    // materializes them from raw (`cagg_invalidation.out:497-520`)
    cond10.refresh(0L, 20L)
    assert(cond10.pendingInvalidations() === Seq.empty)
    cond10.refresh(60L, 110L)
    assert(cond10.watermark === 110L)
    assert(cond10.pendingInvalidations() === Seq.empty)

    // full equality on both caggs after refreshing everything — the
    // reference's final NULL,NULL refresh (`cagg_invalidation.sql:296-298`)
    cond20.refresh(None, None, force = false)
    assert(cond10.materialized.collect().toSet ===
      direct(ht, 10, Long.MinValue / 4, Long.MaxValue / 4).collect().toSet)
    assert(cond20.materialized.collect().toSet ===
      direct(ht, 20, Long.MinValue / 4, Long.MaxValue / 4).collect().toSet)
  }
}
