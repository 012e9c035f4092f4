package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Bulk + streaming ingest into a hypertable — the reference's COPY path
  * (`src/copy.c:12-20`) and its tuple-routing insert
  * (`src/chunk_tuple_routing.c:72-147`). Chunk routing and on-demand chunk
  * creation are [[Hypertable.write]]'s `partitionBy`; this module supplies
  * the source plumbing.
  */
object Ingest {

  /** COPY FROM csv: schema-applied bulk load. Header/no-header and custom
    * delimiter supported; malformed rows are dropped (PERMISSIVE would
    * null-fill — a 100 TB load should not abort on one bad line).
    */
  def copyCsv(spark: SparkSession, csvPath: String, ht: Hypertable,
      schema: StructType, header: Boolean = true, delimiter: String = ","): Long = {
    val df = spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "DROPMALFORMED")
      .csv(csvPath)
    // count via observe() metrics piggybacked on the write pass — a separate
    // df.count() would re-read the whole CSV (a full extra pass at 100 TB)
    val name = s"graft_copy_${System.nanoTime()}"
    import org.apache.spark.sql.functions.{count, lit}
    @volatile var n = -1L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        // first fire wins: ht.write may run follow-up actions over the same
        // observed plan (chunk-skipping stats refresh), and a re-read of the
        // CSV under DROPMALFORMED with different column pruning can count
        // differently than the rows actually written
        qe.observedMetrics.get(name).foreach(r => if (n == -1L) n = r.getLong(0))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      ht.write(df.observe(name, count(lit(1))))
      org.apache.spark.sql.GraftShims.waitForListeners(spark)
    } finally spark.listenerManager.unregister(listener)
    n
  }

  /** Streaming file ingest: watch `dir` for new files (csv or parquet) and
    * route each micro-batch into the hypertable — `COPY` as a continuous
    * process (Structured Streaming file source + checkpointed exactly-once
    * file tracking).
    */
  def streamFiles(spark: SparkSession, dir: String, format: String,
      schema: StructType, ht: Hypertable, checkpoint: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .format(format)
      .load(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => ht.write(batch) }
      .start()
}
