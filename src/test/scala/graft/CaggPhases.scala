package graft

import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** Scratch: phase breakdown of the q09 cagg machinery (Test scope). */
object CaggPhases {
  def main(args: Array[String]): Unit = {
    val parts = sys.env.getOrElse("PHASES_PARTS", "32").toInt
    val spark = Graft.init(org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PHASES_AQE", "true"))
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      import graft.sources.Hypertable
      import graft.streaming.{CaggDef, ContinuousAggregate}
      val tmp = java.nio.file.Files.createTempDirectory("graft_phases").toString
      val ht = time("create")(Hypertable.create(spark, s"$tmp/ht", "ts", chunkWidth = "7 days"))
      val ev = time("load")(Tables.table(spark, dir, "events"))
      time("write")(ht.write(ev))
      val defn = CaggDef("1 hour", Seq("event_type"), Seq(
        count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)").as("sum_value"),
        min(col("value")).as("min_value")))
      val cagg = time("caggCreate")(ContinuousAggregate.create(spark, s"$tmp/cagg", ht, defn))
      val (tmin, tmax) = time("timeRange")(
        graft.operators.Stats.minMax(spark, s"$tmp/ht", "ts") match {
          case (Some(a: java.lang.Long), Some(b: java.lang.Long)) => (a.toLong, b.toLong)
          case _ => sys.error("no stats")
        })
      // inline refresh replica with finer timers
      locally {
        val s0 = graft.expressions.TimeBucketUtil.bucketMicros(tmin,
          3600000000L, graft.expressions.TimeBucketUtil.SENTINEL)
        val e0 = tmax + 3600000000L
        val raw = time("refresh.between")(ht.between(s0, e0))
        val fresh = raw.groupBy(
            unix_micros(gf.time_bucket("1 hour", col("ts"))).as("_bucket"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)").as("sum_value"),
            min(col("value")).as("min_value"))
          .withColumn("_mat_chunk",
            unix_micros(gf.time_bucket("7 days", timestamp_micros(col("_bucket")))))
        time("refresh.computeWrite")(
          fresh.repartition(col("_mat_chunk"))
            .write.mode("overwrite").partitionBy("_mat_chunk")
            .parquet(s"$tmp/scratch_mat"))
        time("refresh.computeWriteNoRepart")(
          fresh.write.mode("overwrite").partitionBy("_mat_chunk")
            .parquet(s"$tmp/scratch_mat2"))
        time("refresh.computeOnly")(
          fresh.write.mode("overwrite").format("noop").save())
        time("refresh.plainWrite1File")(
          fresh.coalesce(1).write.mode("overwrite").parquet(s"$tmp/scratch_mat3"))
        time("refresh.partWrite1Dir")(
          fresh.withColumn("_one", lit(0L)).repartition(col("_one"))
            .write.mode("overwrite").partitionBy("_one").parquet(s"$tmp/scratch_mat4"))
        time("refresh.real")(cagg.refresh(s0, e0))
      }
      time("readback")(cagg.materialized.orderBy("bucket", "event_type")
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
