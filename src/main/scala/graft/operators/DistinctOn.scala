package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `SELECT DISTINCT ON (keys) ... ORDER BY keys, ord` — the query surface
  * the reference accelerates with SkipScan (`tsl/src/nodes/skip_scan/
  * README.md`; planner hook `planner.c:576`): one row per key group, the
  * first/last by an ordering column ("latest reading per device").
  *
  * The reference re-seeks a btree index per distinct key (u·log(k) for u
  * distinct keys over k rows). Spark has no index to re-seek; the
  * columnar equivalent of skipping is a partial/final `max_by` aggregate:
  * the map side reduces every scan partition to ≤u rows BEFORE the single
  * exchange, so shuffled bytes are O(u·groups-per-partition), not O(k) —
  * the same asymmetry SkipScan exploits, expressed as map-side combine.
  * One shuffle, no window function, no per-key sort.
  */
object DistinctOn {

  /** Latest (or earliest) full row per key combination. `payload` columns
    * ride along via one `max_by`/`min_by` struct (single aggregate state,
    * not one sort per column). Ties on `ord` resolve to the struct max —
    * pass a unique ordering column for deterministic results.
    */
  def distinctOn(df: DataFrame, keys: Seq[String], ord: String,
      payload: Seq[String], latest: Boolean = true): DataFrame = {
    val carried = struct((ord +: payload).map(col): _*)
    val picked =
      if (latest) max_by(carried, col(ord)) else min_by(carried, col(ord))
    df.groupBy(keys.map(col): _*)
      .agg(picked.as("_pick"))
      .select(keys.map(col) ++ (ord +: payload).map(c => col(s"_pick.$c").as(c)): _*)
  }
}
