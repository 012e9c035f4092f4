package graft

import org.apache.spark.sql.functions._

/** Scratch measurement (Test scope): segmentwise vs full recompression of
  * one sf0.1-events chunk after a small late append — the number behind
  * SCALE.md's recompression entry.
  */
object RecompressScratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("recompress-scratch", "local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.{Columnstore, Hypertable}
    val ev = Tables.table(spark, "/root/testdata/sf0.1", "events")
    // small row groups → a multi-file compressed layout (~32 files), the
    // shape a 100 GB chunk has with production-size row groups
    val opts = Columnstore.Options(segmentBy = Seq("user_id"),
      orderBy = Seq("ts"), rowGroupBytes = 256 * 1024)

    def build(): (Hypertable, graft.sources.ChunkInfo) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_rs").toString
      val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "30 days")
      ht.write(ev, filesPerChunk = 8)
      val c = ht.showChunks().head
      // AQE would coalesce the small test shuffle to a couple of files;
      // production chunks land many files regardless
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try Columnstore.compressChunk(spark, c.path, opts)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      // late batch: one user's rows for the chunk window (~1/150 of rows)
      val late = ev
        .where(col("ts") >= new java.sql.Timestamp(c.startMicros / 1000))
        .where(col("ts") < new java.sql.Timestamp(c.endMicros / 1000))
        .where(col("user_id") === 7)
        .withColumn("event_id", col("event_id") + lit(90000000L))
      ht.write(late)
      (ht, c)
    }

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[recompress] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val (_, c1) = build()
    val fs = new org.apache.hadoop.fs.Path(c1.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val filesBefore = fs.listStatus(new org.apache.hadoop.fs.Path(c1.path))
      .count(_.getPath.getName.endsWith(".parquet"))
    var consumed = 0
    time("segmentwise") {
      consumed = Columnstore.recompressChunkSegmentwise(spark, c1.path, opts)
    }
    println(s"[recompress] files=$filesBefore consumed=$consumed")

    val (_, c2) = build()
    time("full")(Columnstore.compressChunk(spark, c2.path, opts))
    spark.stop()
  }
}
