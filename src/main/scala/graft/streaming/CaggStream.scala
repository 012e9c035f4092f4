package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming ingest for a continuous aggregate: every micro-batch
  * goes through [[ContinuousAggregate.ingest]] (hypertable append + late-data
  * invalidation), so the cagg's late-data semantics apply to streams too —
  * arrivals below the watermark are re-materialized on the next refresh
  * rather than dropped.
  */
object CaggStream {
  def attach(cagg: ContinuousAggregate, stream: DataFrame,
      checkpointLocation: String,
      refreshEachBatch: Boolean = false): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        cagg.ingest(batch)
        if (refreshEachBatch) { cagg.refreshInvalidated(); () }
      }
      .start()
  }
}
