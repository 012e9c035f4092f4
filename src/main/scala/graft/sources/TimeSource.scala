package graft.sources

import org.apache.spark.sql.DataFrame

/** A time-addressable row source a continuous aggregate can materialize
  * from: the raw [[Hypertable]], or another cagg's materialization
  * (hierarchical caggs, reference `tsl/test/sql/cagg_on_cagg.sql`).
  */
trait TimeSource {
  def timeCol: String
  def read(): DataFrame
  /** Rows with timeCol in [startMicros, endMicros), source-pruned. */
  def between(startMicros: Long, endMicros: Long): DataFrame
}
