package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable

/** foreachBatch is at-least-once: a crash between ingest and checkpoint
  * commit redelivers the batch with the SAME batchId. The replay guard in
  * [[CaggStream.processBatch]] must make the append effectively-once.
  */
class CaggStreamReplaySpec extends AnyFunSuite {
  lazy val spark = graft.Graft.session("cagg-stream-replay-spec", "local[4]", 4)
  import spark.implicits._

  test("a redelivered micro-batch (same batchId) is not ingested twice") {
    val dir = Files.createTempDirectory("graft_stream_replay").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    val defn = CaggDef("1 hour", Seq("event_type"), Seq(count(lit(1)).as("n")))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    val batch = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "click", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:20:00"), 2L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val ckpt = s"$dir/ckpt1"
    CaggStream.processBatch(cagg, batch, batchId = 0L, ckpt, refreshEachBatch = false)
    CaggStream.processBatch(cagg, batch, batchId = 0L, ckpt, refreshEachBatch = false) // replay
    assert(ht.read().count() === 2, "replayed batch was double-ingested")

    CaggStream.processBatch(cagg, batch, batchId = 1L, ckpt, refreshEachBatch = false)
    assert(ht.read().count() === 4, "a genuinely new batch must still ingest")

    // a FRESH checkpoint restarts batch ids at 0 — its batches are new
    // work, not replays; a checkpoint-agnostic marker would drop them
    CaggStream.processBatch(cagg, batch, batchId = 0L, s"$dir/ckpt2", refreshEachBatch = false)
    assert(ht.read().count() === 6, "a new checkpoint's batch 0 was wrongly skipped")
  }
}
