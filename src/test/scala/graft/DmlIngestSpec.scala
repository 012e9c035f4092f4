package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, Hypertable, Ingest, ReorderPolicy}
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

class DmlIngestSpec extends AnyFunSuite {
  lazy val spark = Graft.session("dml-spec", "local[4]", 4)
  import spark.implicits._

  private def freshHt(): Hypertable = {
    val dir = Files.createTempDirectory("graft_dml").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    ht
  }

  test("deleteWhere removes matching rows only in touched chunks") {
    val ht = freshHt()
    val total = ht.read().count()
    val toDelete = ht.read().where($"event_type" === "error").count()
    assert(toDelete > 0)
    val deleted = ht.deleteWhere(col("event_type") === "error")
    assert(deleted === toDelete)
    assert(ht.read().count() === total - toDelete)
    assert(ht.read().where($"event_type" === "error").count() === 0)
    // idempotent
    assert(ht.deleteWhere(col("event_type") === "error") === 0)
  }

  test("DML over 30 chunks runs chunk jobs concurrently and stays correct") {
    val dir = Files.createTempDirectory("graft_dml30").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "1 day")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    assert(ht.showChunks().size === 30)
    val total = ht.read().count()
    val toDelete = ht.read().where($"event_type" === "error").count()
    // every chunk holds matches → 30 concurrent copy-on-write rewrites
    assert(ht.deleteWhere(col("event_type") === "error") === toDelete)
    assert(ht.read().count() === total - toDelete)
    val updated = ht.updateWhere(col("value") > 50, Map("value" -> lit(50.0)))
    assert(updated > 0)
    assert(ht.read().where($"value" > 50).count() === 0)
    assert(ht.read().count() === total - toDelete)
  }

  test("deleteWhere with timeRange only rewrites chunks in range") {
    val ht = freshHt()
    val lo = Timestamp.valueOf("2024-01-08 00:00:00").getTime * 1000
    val hi = Timestamp.valueOf("2024-01-15 00:00:00").getTime * 1000
    val inRange = ht.between(lo, hi).where($"event_type" === "click").count()
    val outRange = ht.read().where($"event_type" === "click").count() - inRange
    val deleted = ht.deleteWhere(
      col("event_type") === "click" &&
        col("ts") >= timestamp_micros(lit(lo)) && col("ts") < timestamp_micros(lit(hi)),
      timeRange = Some((lo, hi)))
    assert(deleted === inRange)
    assert(ht.read().where($"event_type" === "click").count() === outRange)
  }

  test("updateWhere rewrites values copy-on-write") {
    val ht = freshHt()
    val hits = ht.read().where($"value" > 150).count()
    assert(hits > 0)
    val updated = ht.updateWhere(col("value") > 150,
      Map("value" -> lit(150.0), "props" -> lit("""{"capped":true}""")))
    assert(updated === hits)
    assert(ht.read().where($"value" > 150).count() === 0)
    assert(ht.read().where($"props" === """{"capped":true}""").count() === hits)
    // time/space column updates are rejected
    intercept[IllegalArgumentException] {
      ht.updateWhere(lit(true), Map("ts" -> current_timestamp()))
    }
  }

  test("copyCsv bulk-loads through chunk routing") {
    val dir = Files.createTempDirectory("graft_copy").toString
    val src = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts", date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    src.coalesce(1).write.option("header", "true").csv(s"$dir/csv")
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    val n = Ingest.copyCsv(spark, s"$dir/csv", ht, schema)
    assert(n === src.count())
    assert(ht.read().count() === n)
    assert(ht.showChunks().nonEmpty)
  }

  test("reorder policy sorts chunk files physically") {
    val ht = freshHt()
    ReorderPolicy.run(ht, Seq("event_type", "value"))
    val c = ht.showChunks().head
    val vals = spark.read.parquet(c.path)
      .select($"event_type", $"value").collect()
    val sorted = vals.map(r => (r.getString(0), r.getDouble(1)))
    assert(sorted.sameElements(sorted.sortBy(identity)))
    assert(Columnstore.isCompressed(spark, c.path))
  }

  test("DML and compression preserve space sub-partitioning") {
    val dir = Files.createTempDirectory("graft_dml_sp").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days",
      spaceCol = Some("user_id"), spacePartitions = 4)
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    val total = ht.read().count()
    val errs = ht.read().where($"event_type" === "error").count()
    assert(ht.deleteWhere(col("event_type") === "error") === errs)
    assert(ht.read().count() === total - errs)
    // _space dirs survive the rewrite
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val sub = fs.listStatus(new org.apache.hadoop.fs.Path(ht.showChunks().head.path))
      .count(_.getPath.getName.startsWith("_space="))
    assert(sub > 0)
    // columnstore over space-partitioned chunks keeps rows intact
    graft.sources.Columnstore.compress(ht,
      graft.sources.Columnstore.Options(orderBy = Seq("ts")))
    assert(ht.read().count() === total - errs)
    assert(ht.read().select($"user_id").distinct().count() > 0)
  }

  test("size introspection reports per-chunk bytes/files/rows") {
    val ht = freshHt()
    val sizes = graft.operators.Stats.chunksDetailedSize(ht)
    assert(sizes.size === ht.showChunks().size)
    assert(sizes.forall(s => s.bytes > 0 && s.files > 0 && s.rows > 0))
    assert(sizes.map(_.rows).sum === ht.read().count())
    val total = graft.operators.Stats.tableSizeBytes(spark, ht.path)
    assert(total >= sizes.map(_.bytes).sum)
  }

  test("firstByTime answers bookends from footer stats + single-file read") {
    val ht = freshHt()
    val first = graft.operators.Stats.firstByTime(spark, ht.path, "ts").get
    val last = graft.operators.Stats.firstByTime(spark, ht.path, "ts", earliest = false).get
    val expected = ht.read().orderBy($"ts").select($"event_id").as[Long].head()
    val expectedLast = ht.read().orderBy($"ts".desc).select($"event_id").as[Long].head()
    assert(first.getAs[Long]("event_id") === expected)
    assert(last.getAs[Long]("event_id") === expectedLast)
  }

  test("hierarchical cagg: daily rollup from an hourly cagg's materialization") {
    val dir = Files.createTempDirectory("graft_hier").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    val hourly = ContinuousAggregate.create(spark, s"$dir/hourly", ht,
      CaggDef("1 hour", Seq("event_type"), Seq(
        count(lit(1)).as("n"), min($"value").as("min_value"))))
    val lo = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000
    val hi = Timestamp.valueOf("2024-02-01 00:00:00").getTime * 1000
    hourly.refresh(lo, hi)
    val daily = ContinuousAggregate.create(spark, s"$dir/daily", hourly.asSource,
      CaggDef("1 day", Seq("event_type"), Seq(
        sum($"n").as("n"), min($"min_value").as("min_value"))))
    daily.refresh(lo, hi)
    val expected = ht.read()
      .groupBy(gf.time_bucket("1 day", $"ts").as("bucket"), $"event_type")
      .agg(count(lit(1)).as("n"), min($"value").as("min_value"))
      .collect().toSet
    assert(daily.materialized.collect().toSet === expected)
  }
}
