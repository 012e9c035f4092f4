package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}

/** Golden port of `tsl/test/sql/cagg_drop_chunks.sql` /
  * `tsl/test/expected/cagg_drop_chunks.out` (the `conditions_2`
  * integer-time scenario): `drop_chunks` on a cagg's SOURCE hypertable
  * must leave the cagg's materialized rows over the dropped range
  * intact, chunk-range-keyed refreshes must repair pending updates only
  * inside their window, and a remaining-chunks refresh after two drops
  * must not clear pre-drop buckets. Ported this round because
  * drop-tombstoning (round 8) changed chunk-drop physics; these pin the
  * reference's OBSERVABLE post-drop cagg reads against it.
  */
class GoldenCaggDropChunksSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-cagg-drop-chunks", "local[4]", 4)
  import spark.implicits._

  /** The reference's `refresh_cagg_by_chunk_range` procedure: refresh
    * over [min(range_start), max(range_end)+1) of the chunks
    * `show_chunks(ht, older_than)` returns.
    */
  private def refreshByChunkRange(cagg: ContinuousAggregate, ht: Hypertable,
      olderThan: Option[Long]): Unit = {
    val chunks = ht.showChunks(olderThanMicros = olderThan)
    assert(chunks.nonEmpty, s"no chunks older than $olderThan")
    cagg.refresh(chunks.map(_.startMicros).min,
      chunks.map(_.endMicros).max + 1)
  }

  private def rows(cagg: ContinuousAggregate): Map[Long, (Double, Long)] =
    cagg.materialized.collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Double]("sum_value"), r.getAs[Long]("count_value"))).toMap

  test("cagg_drop_chunks.out conditions_2: materialized data survives " +
    "drop_chunks on the raw table; window-keyed refreshes repair exactly " +
    "their range") {
    val dir = Files.createTempDirectory("graft_cagg_dropchunks").toString
    // CREATE TABLE conditions(time_int INT, value FLOAT);
    // create_hypertable(chunk_time_interval => 4); rows 0..19 value 1
    val ht = Hypertable.create(spark, s"$dir/ht", "time_int",
      chunkWidth = "4", timeKind = "bigint", catalog = "table")
    ht.write((0 to 19).map(t => (t.toLong, 1.0)).toDF("time_int", "value"))
    Hypertable.registerIntegerNow("cagg_dropchunks_now")(() => 125L)
    ht.setIntegerNowFunc("cagg_dropchunks_now")
    // CREATE MATERIALIZED VIEW conditions_2 (materialized_only) AS
    //   SELECT time_bucket(2, time_int), SUM(value), COUNT(value) WITH DATA
    val defn = CaggDef("2", Seq.empty, Seq(
      sum($"value").as("sum_value"),
      count($"value").as("count_value")), bucketCol = "bucket")
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    cagg.refresh(0L, 20L) // WITH DATA
    val base = (0L to 18L by 2).map(_ -> (2.0, 2L)).toMap
    assert(rows(cagg) === base, "WITH DATA state")

    // UPDATE ... time_int = 0; UPDATE ... time_int = 6
    ht.updateWhere($"time_int" === 0L, Map("value" -> lit(4.0)))
    ht.updateWhere($"time_int" === 6L, Map("value" -> lit(4.0)))
    // CALL refresh_cagg_by_chunk_range(..., 4)  [INFO range 0..4 -> (0,5)]
    refreshByChunkRange(cagg, ht, Some(4L))
    // SELECT drop_chunks('conditions', 4)
    ht.dropChunks(Some(4L), None)
    // bucket 0 repaired to 5; bucket 6's update NOT yet refreshed; the
    // dropped range's materialization SURVIVES the raw drop
    assert(rows(cagg) === (base + (0L -> (5.0, 2L))),
      "post-drop state: materialized rows over dropped chunks must survive")

    // CALL refresh_cagg_by_chunk_range(..., 8)  [INFO range 4..8 -> (4,9)]
    refreshByChunkRange(cagg, ht, Some(8L))
    assert(rows(cagg) === (base + (0L -> (5.0, 2L)) + (6L -> (5.0, 2L))),
      "the [4,9) refresh must apply the time_int=6 update and nothing else")

    // UPDATE ... time_int = 19; drop_chunks('conditions', 8)
    ht.updateWhere($"time_int" === 19L, Map("value" -> lit(4.0)))
    ht.dropChunks(Some(8L), None)
    // CALL refresh_cagg_by_chunk_range(..., 12) [INFO range 8..12 -> (8,13)]
    refreshByChunkRange(cagg, ht, Some(12L))
    assert(rows(cagg) === (base + (0L -> (5.0, 2L)) + (6L -> (5.0, 2L))),
      "a refresh over untouched chunks changes nothing; pre-drop buckets stay")

    // CALL refresh_cagg_by_chunk_range(..., NULL) [INFO range 8..20 -> (8,21)]
    refreshByChunkRange(cagg, ht, None)
    assert(rows(cagg) === (base + (0L -> (5.0, 2L)) + (6L -> (5.0, 2L))
        + (18L -> (5.0, 2L))),
      "the remaining-chunks refresh applies the time_int=19 update and " +
        "must not clear the dropped-range buckets")
  }

  test("cagg_ddl.out 'materialization of invalidation before drop': " +
    "refresh-then-drop workflow, dropped buckets persist, dropped chunks " +
    "reborn with their original identities") {
    val dir = Files.createTempDirectory("graft_cagg_ddl_invdrop").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "time",
      chunkWidth = "10", timeKind = "bigint", catalog = "table")
    // integer_now_test2() = coalesce(max(time), 0) — a moving clock
    var now = 0L
    Hypertable.registerIntegerNow("cagg_ddl_invdrop_now")(() => now)
    ht.setIntegerNowFunc("cagg_ddl_invdrop_now")
    val defn = CaggDef("5", Seq.empty, Seq(max($"data").as("max")),
      bucketCol = "time_bucket")
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    def ins(rows: Seq[(Long, Int)]): Unit = {
      ht.write(rows.toDF("time", "data"))
      now = math.max(now, rows.map(_._1).max)
    }
    def view: Map[Long, Int] = cagg.materialized.collect()
      .map(r => r.getAs[Long]("time_bucket") -> r.getAs[Int]("max")).toMap
    ins((0L to 20L).map(i => i -> i.toInt))
    // "dropping chunks will process the invalidations": drop < now-9=11
    ht.dropChunks(Some(now - 9), None)
    assert(ht.read().agg(min($"time")).head().getLong(0) === 10L)
    ins((20L to 35L).map(i => i -> i.toInt))
    cagg.refresh(10L, 40L)
    assert(view === Map(10L -> 14, 15L -> 19, 20L -> 24, 25L -> 29,
      30L -> 34, 35L -> 35))
    // late updates: 26 inside the next drop window, 31 outside
    ins(Seq(26L -> 100))
    ins(Seq(31L -> 200))
    ins((35L to 39L).map(i => i -> i.toInt))
    // "the invalidation on 25 not yet seen"
    assert(view(25L) === 29)
    // refresh to process the invalidations, THEN drop < now-9=30
    cagg.refresh(None, Some(now - 9), force = false)
    ht.dropChunks(Some(now - 9), None)
    // "new values on 25 now seen"; dropped-range buckets persist
    assert(view === Map(10L -> 14, 15L -> 19, 20L -> 24, 25L -> 100,
      30L -> 34, 35L -> 35))
    assert(ht.read().agg(min($"time")).head().getLong(0) === 30L)
    assert(ht.read().where($"time" < now - 9).isEmpty,
      "no raw data below the drop point")
    // "recreate the dropped chunk": re-ingest into the dropped ranges —
    // the tombstoned identity dirs take rebirth generations
    ins((0L to 20L).map(i => i -> i.toInt))
    assert(ht.read().where($"time" < 30).count() === 21)
    // chunks reborn with their ORIGINAL identities and ranges
    assert(ht.showChunks().map(c => (c.startMicros, c.endMicros)).sorted ===
      Seq((0L, 10L), (10L, 20L), (20L, 30L), (30L, 40L)))
    // "the dropped data should stay the same as long as we only refresh
    // buckets that have non-dropped data": buckets 10-25 keep their
    // pre-drop materialization even though the reborn raw differs
    cagg.refresh(30L, 40L)
    assert(view === Map(10L -> 14, 15L -> 19, 20L -> 24, 25L -> 100,
      30L -> 200, 35L -> 39))
  }

  test("cagg_drop_chunks.out records_monthly: drop_chunks succeeds on a " +
    "realtime cagg's source and the union view serves the surviving range") {
    // the .sql's first scenario exists to prove drop_chunks works at all
    // with a realtime (materialized_only=false) cagg attached; port the
    // observable part: the drop succeeds and the realtime view still
    // answers from materialization + surviving raw
    val dir = Files.createTempDirectory("graft_cagg_dropchunks2").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    val events = Tables.table(spark, "/root/testdata/sf0.001", "events")
    ht.write(events)
    val defn = CaggDef("1 day", Seq.empty,
      Seq(avg($"value").as("value_avg"),
        (max($"value") - min($"value")).as("value_spread")))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    cagg.refreshAll()
    val before = cagg.realtime.collect().toSet
    val cut = ht.showChunks().sortBy(_.startMicros).head.endMicros
    ht.dropChunks(Some(cut), None)
    // materialization retained -> the realtime view still serves ALL
    // buckets (below the watermark it reads the materialization only)
    assert(cagg.realtime.collect().toSet === before,
      "realtime view must keep serving materialized buckets after the drop")
  }
}
