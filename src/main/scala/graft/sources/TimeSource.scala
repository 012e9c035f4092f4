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
  /** [min, max+1) of the ACTUAL data's time values (dimension units) —
    * used to give the unbounded "everything is dirty" invalidation entry a
    * finite footprint. Metadata-cheap: only the edge chunks are consulted.
    * None when the source holds no rows.
    */
  def timeBounds: Option[(Long, Long)]
}
