package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{functions => gf}
import graft.operators.Gapfill

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
    }),

    // §2.4 first/last bookend aggregates over daily buckets.
    "q03_first_last" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(gf.time_bucket("1 day", col("ts")).as("day"), col("event_type"))
        .agg(
          gf.first(col("value"), col("ts")).as("first_value"),
          gf.last(col("value"), col("ts")).as("last_value"),
          count(lit(1)).as("n"))
        .orderBy(col("day"), col("event_type"))
    }),

    // §2.4 histogram (rows form: one row per non-empty bucket).
    "q04_histogram" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("bucket", gf.histogram_bucket(col("value"), 0.0, 500.0, 10))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // §2.4 histogram (array form: nbuckets+2 with under/overflow ends).
    "q05_histogram_array" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(gf.histogram(col("value"), 0.0, 500.0, 10).as("hist"))
        .orderBy(col("event_type"))
    }),

    // §2.9 uuidv7: boundary uuid carries the timestamp exactly (ms + sub-ms
    // micros in rand_a), so extraction round-trips the original micros.
    "q06_uuidv7_roundtrip" -> ((s, dir) => {
      val u = gf.to_uuidv7_boundary(col("ts"))
      t(s, dir, "events")
        .select(col("event_id"),
          gf.uuid_timestamp_micros(u).as("ts_rt"),
          gf.uuid_version(u).as("ver"))
        .orderBy(col("event_id"))
    }),

    // §2.8 time_bucket_gapfill + locf over hourly buckets.
    "q07_gapfill_locf" -> ((s, dir) => {
      val (start, finish) = (1704067200000000L, 1706659200000000L) // [2024-01-01, 2024-01-31)
      val ev = t(s, dir, "events")
        .where(col("ts") >= timestamp_micros(lit(start)) && col("ts") < timestamp_micros(lit(finish)))
      val agg = ev
        .groupBy(gf.time_bucket("1 hour", col("ts")).as("bucket"), col("event_type"))
        .agg(min(col("value")).as("min_value"), count(lit(1)).as("n"))
      Gapfill.gapfill(agg, "bucket", Seq("event_type"), start, finish, "1 hour")
        .withColumn("locf_value", Gapfill.locf(col("min_value"), Seq("event_type"), "bucket"))
        .select("event_type", "bucket", "locf_value", "n")
        .orderBy("event_type", "bucket")
    }),

    // §2.8 time_bucket_gapfill + linear interpolate.
    "q08_gapfill_interpolate" -> ((s, dir) => {
      val (start, finish) = (1704067200000000L, 1706659200000000L)
      val ev = t(s, dir, "events")
        .where(col("ts") >= timestamp_micros(lit(start)) && col("ts") < timestamp_micros(lit(finish)))
      val agg = ev
        .groupBy(gf.time_bucket("1 hour", col("ts")).as("bucket"), col("event_type"))
        .agg(min(col("value")).as("min_value"))
      Gapfill.gapfill(agg, "bucket", Seq("event_type"), start, finish, "1 hour")
        .withColumn("interp_value",
          Gapfill.interpolate(col("min_value"), Seq("event_type"), "bucket"))
        .select("event_type", "bucket", "interp_value")
        .orderBy("event_type", "bucket")
    }),

    // §2.10 continuous aggregate: ingest raw → hypertable, materialize all
    // buckets, read back the mat table. Oracle = the direct aggregation.
    "q09_cagg_hourly" -> ((s, dir) => {
      import graft.sources.Hypertable
      import graft.streaming.{CaggDef, ContinuousAggregate}
      val tmp = java.nio.file.Files.createTempDirectory("graft_cagg_q").toString
      val ht = Hypertable.create(s, s"$tmp/ht", "ts", chunkWidth = "7 days")
      ht.write(t(s, dir, "events"))
      val defn = CaggDef("1 hour", Seq("event_type"), Seq(
        count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)").as("sum_value"),
        min(col("value")).as("min_value")))
      val cagg = ContinuousAggregate.create(s, s"$tmp/cagg", ht, defn)
      val mm = ht.read().agg(unix_micros(min(col("ts"))), unix_micros(max(col("ts")))).head()
      cagg.refresh(
        graft.expressions.TimeBucketUtil.bucketMicros(mm.getLong(0), 3600000000L,
          graft.expressions.TimeBucketUtil.SENTINEL),
        mm.getLong(1) + 3600000000L)
      cagg.materialized.orderBy("bucket", "event_type")
    })
  )

  private def histogramArraySql(min: Double, max: Double, nbuckets: Int): String = {
    val w = (max - min) / nbuckets
    val conds = (0 to nbuckets + 1).map {
      case 0                       => s"value < $min"
      case i if i == nbuckets + 1  => s"value >= $max"
      case i => s"value >= $min AND value < $max AND CAST(FLOOR((value - $min) / $w) AS INT) + 1 = $i"
    }
    conds.map(c => s"SUM(CASE WHEN $c THEN 1 ELSE 0 END)").mkString("[", ", ", "]")
  }

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
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q03_first_last" ->
      """SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS day, event_type,
        | arg_min(value, ts) AS first_value,
        | arg_max(value, ts) AS last_value,
        | COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q04_histogram" ->
      """SELECT event_type,
        | CASE WHEN value < 0.0 THEN 0 WHEN value >= 500.0 THEN 11
        |      ELSE CAST(FLOOR((value - 0.0) / 50.0) AS INT) + 1 END AS bucket,
        | COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q05_histogram_array" ->
      s"""SELECT event_type, ${histogramArraySql(0.0, 500.0, 10)} AS hist
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q06_uuidv7_roundtrip" ->
      "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts_rt, 7 AS ver FROM events ORDER BY event_id",

    "q07_gapfill_locf" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
        |  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01 00:00:00'
        |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-31 00:00:00'),
        |agg AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
        |         MIN(value) AS min_value, COUNT(*) AS n
        |  FROM ev GROUP BY 1, 2),
        |spine AS (
        |  SELECT g.event_type, b.bucket
        |  FROM (SELECT DISTINCT event_type FROM agg) g
        |  CROSS JOIN (SELECT unnest(range(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-31 00:00:00', INTERVAL '1 hour')) AS bucket) b)
        |SELECT s.event_type, s.bucket,
        | last_value(a.min_value IGNORE NULLS) OVER (PARTITION BY s.event_type
        |   ORDER BY s.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
        | a.n AS n
        |FROM spine s LEFT JOIN agg a USING (event_type, bucket)
        |ORDER BY 1, 2""".stripMargin,

    "q08_gapfill_interpolate" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
        |  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01 00:00:00'
        |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-31 00:00:00'),
        |agg AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
        |         MIN(value) AS min_value
        |  FROM ev GROUP BY 1, 2),
        |spine AS (
        |  SELECT g.event_type, b.bucket
        |  FROM (SELECT DISTINCT event_type FROM agg) g
        |  CROSS JOIN (SELECT unnest(range(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-31 00:00:00', INTERVAL '1 hour')) AS bucket) b),
        |j AS (
        |  SELECT s.event_type, s.bucket, epoch_us(s.bucket) AS x, a.min_value AS v
        |  FROM spine s LEFT JOIN agg a USING (event_type, bucket)),
        |w AS (
        |  SELECT *,
        |   last_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS) OVER wp AS p0x,
        |   last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER wp AS p0y,
        |   first_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS) OVER wn AS p1x,
        |   first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER wn AS p1y
        |  FROM j WINDOW
        |   wp AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |   wn AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, bucket,
        | CASE WHEN v IS NOT NULL THEN v
        |      WHEN p0x IS NULL OR p1x IS NULL THEN NULL
        |      ELSE (p0y * CAST(p1x - x AS DOUBLE) + p1y * CAST(x - p0x AS DOUBLE))
        |           / CAST(p1x - p0x AS DOUBLE) END AS interp_value
        |FROM w ORDER BY 1, 2""".stripMargin,

    "q09_cagg_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value,
        | MIN(value) AS min_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
