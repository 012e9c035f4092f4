package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation — the reference's tumbling `time_bucket`
  * (§2.4) lifted onto unbounded streams, plus the sliding/session shapes
  * the reference lacks (SURVEY §2.10: Spark-native superset). All variants
  * take a watermark delay: state for windows older than the watermark is
  * dropped (bounded state at 100 TB/day rates); arrivals later than that
  * belong in the cagg path, which re-materializes instead of dropping
  * (see [[ContinuousAggregate]]).
  */
object StreamWindows {

  private def windowed(stream: DataFrame, tsCol: String, delay: String,
      win: Column, groupCols: Seq[String], aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, delay)
      .groupBy(win +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket", col("window.start"))
      .withColumn("bucket_end", col("window.end"))
      .drop("window")

  /** Tumbling: fixed-width, non-overlapping — `time_bucket` semantics. */
  def tumbling(stream: DataFrame, tsCol: String, width: String,
      groupCols: Seq[String], aggs: Seq[Column],
      watermarkDelay: String = "0 seconds"): DataFrame =
    windowed(stream, tsCol, watermarkDelay,
      window(col(tsCol), width).as("window"), groupCols, aggs)

  /** Hopping: width-wide windows every `slide` (overlapping). */
  def hopping(stream: DataFrame, tsCol: String, width: String, slide: String,
      groupCols: Seq[String], aggs: Seq[Column],
      watermarkDelay: String = "0 seconds"): DataFrame =
    windowed(stream, tsCol, watermarkDelay,
      window(col(tsCol), width, slide).as("window"), groupCols, aggs)

  /** Session: windows close after `gap` of inactivity per group. */
  def session(stream: DataFrame, tsCol: String, gap: String,
      groupCols: Seq[String], aggs: Seq[Column],
      watermarkDelay: String = "0 seconds"): DataFrame =
    windowed(stream, tsCol, watermarkDelay,
      session_window(col(tsCol), gap).as("window"), groupCols, aggs)
}
