package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming ingest for a continuous aggregate: every micro-batch
  * goes through [[ContinuousAggregate.ingest]] (hypertable append + late-data
  * invalidation), so the cagg's late-data semantics apply to streams too —
  * arrivals below the watermark are re-materialized on the next refresh
  * rather than dropped.
  *
  * foreachBatch is AT-LEAST-ONCE: after a crash between ingest and the
  * checkpoint commit, the same batch is redelivered with the same batchId.
  * The last ingested id is recorded next to the cagg and replays are
  * skipped, making the append effectively-once (assumes one stream per
  * cagg — attach a second stream under a different cagg path).
  */
object CaggStream {
  def attach(cagg: ContinuousAggregate, stream: DataFrame,
      checkpointLocation: String,
      refreshEachBatch: Boolean = false): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(cagg, batch, batchId, refreshEachBatch)
      }
      .start()
  }

  /** One micro-batch: ingest unless `batchId` was already processed. */
  private[streaming] def processBatch(cagg: ContinuousAggregate,
      batch: DataFrame, batchId: Long, refreshEachBatch: Boolean): Unit = {
    if (batchId > cagg.lastStreamBatch) {
      cagg.ingest(batch)
      cagg.setLastStreamBatch(batchId)
    }
    if (refreshEachBatch) { cagg.refreshInvalidated(); () }
  }
}
