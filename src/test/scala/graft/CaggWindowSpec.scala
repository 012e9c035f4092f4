package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Window functions in cagg defining queries — the reference's experimental
  * `timescaledb.enable_cagg_window_functions` surface (`src/guc.c:1031`,
  * `tsl/src/continuous_aggs/common.c:665-695`, `tsl/test/sql/cagg_ddl.sql`
  * cagg_window_1..4): gated off by default, window values computed over the
  * aggregated rows, deterministic for bucket-partitioned windows.
  */
class CaggWindowSpec extends AnyFunSuite {
  lazy val spark = Graft.session("cagg-window-spec", "local[4]", 4)
  import spark.implicits._

  private val GUC = "spark.graft.enable_cagg_window_functions"

  private def withGuc[A](on: Boolean)(body: => A): A = {
    spark.conf.set(GUC, on.toString)
    try body finally spark.conf.unset(GUC)
  }

  private def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L

  private val winDefn = CaggDef("1 day", Seq("event_type"),
    aggs = Seq(count(lit(1)).as("n")),
    windowCols = Seq(rank().over(
      Window.partitionBy("bucket").orderBy(desc("n"), col("event_type"))).as("r")))

  private def freshHt(): Hypertable = {
    val dir = Files.createTempDirectory("graft_caggwin").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    ht
  }

  private def direct(ht: Hypertable) = ht.read()
    .groupBy(gf.time_bucket("1 day", $"ts").as("bucket"), $"event_type")
    .agg(count(lit(1)).as("n"))
    .withColumn("r", rank().over(
      Window.partitionBy("bucket").orderBy(desc("n"), col("event_type"))))
    .select("bucket", "event_type", "n", "r")

  test("creation is gated on the GUC, off by default (common.c:683-689)") {
    val ht = freshHt()
    val e = intercept[IllegalArgumentException] {
      ContinuousAggregate.create(spark,
        ht.path + "_w0", ht, winDefn)
    }
    assert(e.getMessage.contains("enable_cagg_window_functions"))
    // non-window expressions are rejected from windowCols outright
    val e2 = intercept[IllegalArgumentException] {
      CaggDef("1 day", Nil, Seq(count(lit(1)).as("n")),
        windowCols = Seq(max(col("n")).as("m")))
    }
    assert(e2.getMessage.contains("window expressions"))
  }

  test("a window not partitioned by the bucket column is rejected at " +
      "CREATE unless cagg_window_allow_unpartitioned is set") {
    val ht = freshHt()
    val unpart = CaggDef("1 day", Seq("event_type"),
      aggs = Seq(count(lit(1)).as("n")),
      // partitioned by event_type only: rank mixes rows ACROSS buckets, so
      // its value depends on which refresh window recomputed it
      windowCols = Seq(rank().over(
        Window.partitionBy("event_type").orderBy(desc("n"))).as("r")))
    withGuc(on = true) {
      val e = intercept[IllegalArgumentException] {
        ContinuousAggregate.create(spark, ht.path + "_wu", ht, unpart)
      }
      assert(e.getMessage.contains("not partitioned by the bucket column"))
      // the escape hatch accepts the reference's runtime-hazard behavior
      spark.conf.set("spark.graft.cagg_window_allow_unpartitioned", "true")
      try {
        val c = ContinuousAggregate.create(spark, ht.path + "_wu2", ht, unpart)
        c.refreshAll()
        assert(c.materialized.count() > 0)
      } finally spark.conf.unset("spark.graft.cagg_window_allow_unpartitioned")
      // a COMPOUND partition spec that includes the bucket still passes
      val compound = CaggDef("1 day", Seq("event_type"),
        aggs = Seq(count(lit(1)).as("n")),
        windowCols = Seq(rank().over(Window.partitionBy("bucket", "event_type")
          .orderBy(desc("n"))).as("r")))
      ContinuousAggregate.create(spark, ht.path + "_wc", ht, compound)
      // the check matches like Spark's default case-INSENSITIVE resolution:
      // `PARTITION BY Bucket` IS bucket-partitioned, not a false rejection
      // that pushes users toward the unsafe override
      val cased = CaggDef("1 day", Seq("event_type"),
        aggs = Seq(count(lit(1)).as("n")),
        windowCols = Seq(rank().over(Window.partitionBy("Bucket")
          .orderBy(desc("n"))).as("r")))
      ContinuousAggregate.create(spark, ht.path + "_wcase", ht, cased)
    }
  }

  test("bucket-partitioned window matches direct computation and is " +
      "refresh-window independent") {
    val ht = freshHt()
    withGuc(on = true) {
      // one shot
      val full = ContinuousAggregate.create(spark, ht.path + "_wa", ht, winDefn)
      full.refreshAll()
      assert(full.materialized.select("bucket", "event_type", "n", "r")
        .collect().toSet === direct(ht).collect().toSet)
      // same cagg built through three disjoint refresh windows: window
      // values must come out identical (whole buckets recompute together)
      val parts = ContinuousAggregate.create(spark, ht.path + "_wb", ht, winDefn)
      parts.refresh(us("2024-01-01 00:00:00"), us("2024-01-08 00:00:00"))
      parts.refresh(us("2024-01-08 00:00:00"), us("2024-01-20 00:00:00"))
      parts.refresh(us("2024-01-20 00:00:00"), us("2024-03-01 00:00:00"))
      assert(parts.materialized.select("bucket", "event_type", "n", "r")
        .collect().toSet === direct(ht).collect().toSet)
    }
  }

  test("late data repair recomputes window values of the dirty buckets") {
    val ht = freshHt()
    withGuc(on = true) {
      val cagg = ContinuousAggregate.create(spark, ht.path + "_wr", ht, winDefn)
      cagg.refreshAll()
      // late rows into an already-materialized bucket, enough to flip the
      // rank ordering inside that bucket
      val late = (0 until 50).map { i =>
        (910000L + i, Timestamp.valueOf("2024-01-05 10:00:00"), 7L,
          "page_view", 2.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      cagg.ingest(late)
      cagg.refreshInvalidated()
      assert(cagg.materialized.select("bucket", "event_type", "n", "r")
        .collect().toSet === direct(ht).collect().toSet)
    }
  }

  test("realtime view: stored window values below the watermark, computed " +
      "live above it") {
    val ht = freshHt()
    withGuc(on = true) {
      val cagg = ContinuousAggregate.create(spark, ht.path + "_wrt", ht, winDefn)
      cagg.refresh(us("2024-01-01 00:00:00"), us("2024-01-15 00:00:00"))
      assert(cagg.realtime.select("bucket", "event_type", "n", "r")
        .collect().toSet === direct(ht).collect().toSet)
    }
  }

  test("declarative CMV accepts reference-style window text, including a " +
      "differing-width time_bucket in OVER (cagg_ddl.sql:1461)") {
    val dir = Files.createTempDirectory("graft_caggwin_sql").toString
    spark.sql(s"SELECT create_hypertable('$dir/ht', 'ts', INTERVAL '7 days')")
    Hypertable.at(spark, s"$dir/ht")
      .write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    withGuc(on = true) {
      // aliased windows referencing output aliases
      spark.sql(
        s"""CREATE MATERIALIZED VIEW '$dir/c1' WITH (tsdb.continuous)
           |AS SELECT time_bucket('1 day', ts) AS bucket, event_type,
           |  count(1) AS n,
           |  rank() OVER (PARTITION BY bucket ORDER BY n DESC, event_type) AS r
           |FROM '$dir/ht' GROUP BY 1, 2""".stripMargin)
      val c1 = ContinuousAggregate.atPath(spark, s"$dir/c1").get
      assert(c1.defn.windowCols.size === 1 && c1.defn.aggs.size === 1)
      assert(c1.materialized.select("bucket", "event_type", "n", "r")
        .collect().toSet ===
        direct(Hypertable.at(spark, s"$dir/ht")).collect().toSet)
      // the reference's cagg_window_1 text shape: no plain aggregate, OVER
      // references time_bucket with differently-spelled width ('1week' vs
      // '1 week'). Spark's analyzer additionally demands rank() be ordered
      // (PostgreSQL does not); ordering by the bucket keeps the reference's
      // all-rank-1 values while exercising BOTH textual rewrites
      spark.sql(
        s"""CREATE MATERIALIZED VIEW '$dir/c2' WITH (tsdb.continuous)
           |AS SELECT time_bucket('1week', ts),
           |  rank() OVER (PARTITION BY time_bucket('1 week',ts)
           |               ORDER BY time_bucket('1week',ts)) AS r
           |FROM '$dir/ht' GROUP BY 1""".stripMargin)
      val c2 = ContinuousAggregate.atPath(spark, s"$dir/c2").get
      val rows = c2.materialized.collect()
      assert(rows.nonEmpty && rows.forall(_.getAs[Int]("r") === 1))
      // a width that does NOT match the GROUP BY bucket is rejected
      val eW = intercept[Exception] {
        spark.sql(
          s"""CREATE MATERIALIZED VIEW '$dir/c3' WITH (tsdb.continuous)
             |AS SELECT time_bucket('1 day', ts) AS bucket,
             |  rank() OVER (PARTITION BY time_bucket('2 days', ts)) AS r
             |FROM '$dir/ht' GROUP BY 1""".stripMargin)
      }
      assert(eW.getMessage.contains("does not match the GROUP BY bucket"))
    }
    // GUC off: the declarative form errors like the reference
    // (`\set ON_ERROR_STOP` block at cagg_ddl.sql:1454-1457)
    val eOff = intercept[Exception] {
      spark.sql(
        s"""CREATE MATERIALIZED VIEW '$dir/c4' WITH (tsdb.continuous)
           |AS SELECT time_bucket('1 day', ts) AS bucket,
           |  rank() OVER (PARTITION BY bucket) AS r
           |FROM '$dir/ht' GROUP BY 1""".stripMargin)
    }
    assert(eOff.getMessage.contains("enable_cagg_window_functions"))
  }

  test("call form routes window items to windowCols; rewrite registry " +
      "refuses window caggs") {
    val dir = Files.createTempDirectory("graft_caggwin_call").toString
    spark.sql(s"SELECT create_hypertable('$dir/ht', 'ts', INTERVAL '7 days')")
    val ht = Hypertable.at(spark, s"$dir/ht")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    withGuc(on = true) {
      spark.sql(s"SELECT create_continuous_aggregate('$dir/c', '$dir/ht', " +
        s"INTERVAL '1 day', 'event_type', " +
        s"'count(1) AS n, rank() OVER (PARTITION BY bucket ORDER BY n DESC, " +
        s"event_type) AS r', with_data => true)")
      val c = ContinuousAggregate.atPath(spark, s"$dir/c").get
      assert(c.defn.windowCols.size === 1)
      assert(c.materialized.select("bucket", "event_type", "n", "r")
        .collect().toSet === direct(ht).collect().toSet)
      val eReg = intercept[IllegalArgumentException] {
        graft.plans.CaggRewrite.register(c)
      }
      assert(eReg.getMessage.contains("window functions"))
    }
  }
}
