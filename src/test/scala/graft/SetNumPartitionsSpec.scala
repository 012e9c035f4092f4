package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable

/** set_number_partitions (`sql/ddl_api.sql:81-87`,
  * `ts_dimension_set_num_slices`): the new count applies only to chunks
  * created after the change; existing chunks keep their layout, rows routed
  * into them later still use their own count, and space pruning evaluates
  * each chunk under the count it was built with.
  */
class SetNumPartitionsSpec extends AnyFunSuite {
  lazy val spark = Graft.session("setnumparts-spec", "local[4]", 4)

  private lazy val events = Tables.table(spark, "/root/testdata/sf0.001", "events")
  private def fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def spaceDirs(chunkPath: String): Set[Int] =
    fs.listStatus(new org.apache.hadoop.fs.Path(chunkPath))
      .map(_.getPath.getName).filter(_.startsWith("_space="))
      .map(_.stripPrefix("_space=").toInt).toSet

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan
    plan.collectFirst { case f: FileSourceScanExec => f }.orElse(plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collectFirst { case f: FileSourceScanExec => f }
      case _ => None
    }).get
  }

  test("repartition applies to new chunks only; old chunks keep their count") {
    val dir = Files.createTempDirectory("graft_snp").toString
    val ht4 = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "1 day",
      spaceCol = Some("user_id"), spacePartitions = 4)
    val cutoff = lit(Timestamp.valueOf("2024-01-15 00:00:00"))
    ht4.write(events.where(col("ts") < cutoff))
    val oldChunks = ht4.showChunks().map(_.path)

    val ht8 = ht4.setNumberPartitions("user_id", 8)
    assert(ht8.spacePartitions === 8 && ht8.repartitioned)
    ht8.write(events.where(col("ts") >= cutoff))

    // old chunks: buckets only in [0,4) and a recorded count of 4
    oldChunks.foreach { p =>
      assert(spaceDirs(p).forall(_ < 4), s"old chunk $p grew a bucket >= 4")
      assert(Hypertable.readSpaceParts(fs, new org.apache.hadoop.fs.Path(p))
        .contains(Map("user_id" -> 4)))
    }
    // new chunks: some bucket >= 4 must exist overall (8-way murmur spread)
    val newChunks = ht8.showChunks().map(_.path).filterNot(oldChunks.contains)
    assert(newChunks.nonEmpty)
    assert(newChunks.exists(p => spaceDirs(p).exists(_ >= 4)))
    newChunks.foreach { p =>
      assert(Hypertable.readSpaceParts(fs, new org.apache.hadoop.fs.Path(p))
        .contains(Map("user_id" -> 8)))
    }

    // LATE data into an old chunk routes under the OLD count
    ht8.write(events.where(col("ts") < lit(Timestamp.valueOf("2024-01-02 00:00:00"))))
    oldChunks.foreach { p =>
      assert(spaceDirs(p).forall(_ < 4), s"late write put a new-count bucket into $p")
    }

    // full-scan correctness across the mixed layout
    assert(ht8.read().count() ===
      events.count() + events.where(col("ts") < lit(Timestamp.valueOf("2024-01-02 00:00:00"))).count())
  }

  test("space pruning evaluates each chunk under its own count") {
    val dir = Files.createTempDirectory("graft_snp2").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "1 day",
      spaceCol = Some("user_id"), spacePartitions = 4)
    val cutoff = lit(Timestamp.valueOf("2024-01-15 00:00:00"))
    h.write(events.where(col("ts") < cutoff))
    val h8 = h.setNumberPartitions("user_id", 8)
    h8.write(events.where(col("ts") >= cutoff))

    Graft.init(spark)
    val df = h8.read().where(col("user_id") === 7L)
    val scan = scanOf(df)
    val nChunks = h8.showChunks().size
    val parts = scan.selectedPartitions.partitionCount
    // one bucket per chunk survives — any more means a count was misapplied,
    // fewer means rows were wrongly pruned
    assert(parts <= nChunks, s"expected <= $nChunks pruned partitions, got $parts")
    val expected = events.where(col("user_id") === 7L).count()
    assert(df.count() === expected)
    // and the pruning actually happened (4+8 buckets exist in total)
    val full = scanOf(h8.read()).selectedPartitions.partitionCount
    assert(parts < full, s"no pruning: $parts vs full $full")
  }

  test("compress/decompress preserve the space-layout stamp (pruning stays sound)") {
    val dir = Files.createTempDirectory("graft_snp_cs").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "1 day",
      spaceCol = Some("user_id"), spacePartitions = 4)
    val cutoff = lit(Timestamp.valueOf("2024-01-15 00:00:00"))
    h.write(events.where(col("ts") < cutoff))
    val h8 = h.setNumberPartitions("user_id", 8)
    h8.write(events.where(col("ts") >= cutoff))
    // rewrite every chunk through the columnstore path and back again
    graft.sources.Columnstore.compress(h8, graft.sources.Columnstore.Options(orderBy = Seq("ts")))
    val old = h8.showChunks().head
    assert(Hypertable.readSpaceParts(fs, new org.apache.hadoop.fs.Path(old.path))
      .contains(Map("user_id" -> 4)), "compressChunk dropped the layout stamp")
    graft.sources.Columnstore.decompress(h8)
    assert(Hypertable.readSpaceParts(fs, new org.apache.hadoop.fs.Path(old.path))
      .contains(Map("user_id" -> 4)), "decompressChunk dropped the layout stamp")
    // space-equality query across the mixed (4/8) layout still exact
    Graft.init(spark)
    assert(h8.read().where(col("user_id") === 7L).count() ===
      events.where(col("user_id") === 7L).count())
  }

  test("merging chunks with different counts disables pruning for the result, soundly") {
    val dir = Files.createTempDirectory("graft_snp3").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "1 day",
      spaceCol = Some("user_id"), spacePartitions = 4)
    h.write(events.where(col("ts") < lit(Timestamp.valueOf("2024-01-02 00:00:00"))))
    val h8 = h.setNumberPartitions("user_id", 8)
    h8.write(events.where(
      col("ts") >= lit(Timestamp.valueOf("2024-01-02 00:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-01-03 00:00:00"))))
    val Seq(a, b) = h8.showChunks().sortBy(_.startMicros).take(2)
    val merged = h8.mergeChunks(a.startMicros, b.startMicros)
    // layout-unknown marker
    assert(Hypertable.readSpaceParts(fs, new org.apache.hadoop.fs.Path(merged.path))
      .contains(Map("user_id" -> -1)))
    // a space-equality query over the merged chunk still returns every row
    Graft.init(spark)
    val expected = events
      .where(col("ts") < lit(Timestamp.valueOf("2024-01-03 00:00:00")))
      .where(col("user_id") === 7L).count()
    assert(h8.read().where(col("user_id") === 7L).count() === expected)
  }

  test("addDimension works only while empty, then routes and prunes like create-time dims") {
    val dir = Files.createTempDirectory("graft_adddim").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    val h2 = h.addDimension("user_id", 4).addDimension("event_type", 2)
    assert(h2.spaceDims.map(d => (d._1, d._2)) === Seq("user_id" -> 4, "event_type" -> 2))
    h2.write(events)
    // a populated table refuses new dimensions, like the reference
    val e = intercept[IllegalArgumentException](h2.addDimension("value", 2))
    assert(e.getMessage.contains("has chunks"))
    // both added dims route (dirs exist) and the table round-trips
    val c0 = h2.showChunks().head.path
    assert(spaceDirs(c0).nonEmpty)
    assert(h2.read().count() === events.count())
    // equality predicates on the added dims prune via ChunkExclusion
    Graft.init(spark)
    val df = h2.read().where(col("user_id") === 7L && col("event_type") === "click")
    val full = scanOf(h2.read()).selectedPartitions.partitionCount
    val pruned = scanOf(df).selectedPartitions.partitionCount
    assert(pruned < full, s"no pruning: $pruned vs $full")
    assert(df.count() ===
      events.where(col("user_id") === 7L && col("event_type") === "click").count())
  }
}
