package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{functions => gf}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-equivalent in [[oracleSql]]
  * unless the operator is not SQL-expressible (then the driver records a
  * weaker rows-only check). Column names are aligned on both sides because
  * the driver's comparator sorts columns by name before hashing.
  *
  * Float determinism policy: aggregates over double columns are computed in
  * exact DECIMAL arithmetic (inputs cast to a fixed-scale decimal — doubles
  * are never exactly at a decimal midpoint, so every engine's cast rounds
  * identically) and only the final exact value is cast back to DOUBLE.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hourly rollup over the events hypertable: bucket + group + bookends.
    */
  def entry(spark: SparkSession): DataFrame = {
    Graft.init(spark)
    val ev = t(spark, "/root/testdata/sf0.001", "events")
    ev.groupBy(gf.time_bucket("1 hour", col("ts")).as("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        gf.first(col("value"), col("ts")).as("first_value"),
        gf.last(col("value"), col("ts")).as("last_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 aggregation over lineitem (TPC-H Q1 shape): exact decimal sums.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_base_price"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("sum_disc_price"),
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.4 time_bucket: hourly rollup on the events hypertable.
    "q02_bucket_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(gf.time_bucket("1 hour", col("ts")).as("bucket"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)").as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("bucket"), col("event_type"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_bucket_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value,
        | MIN(value) AS min_value,
        | MAX(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
