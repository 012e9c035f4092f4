package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkipScan

class SkipScanSpec extends AnyFunSuite {
  lazy val spark = Graft.session("skipscan-spec", "local[4]", 4)
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("distinct strings from dictionary pages match a full scan") {
    val ev = Tables.table(spark, sf, "events")
    val got = SkipScan.distinct(spark, s"$sf/events.parquet", "event_type")
      .as[String].collect().sorted
    val exp = ev.select("event_type").distinct().as[String].collect().sorted
    assert(got.toSeq === exp.toSeq)
  }

  test("distinct longs from dictionary pages match a full scan") {
    val ev = Tables.table(spark, sf, "events")
    val got = SkipScan.distinct(spark, s"$sf/events.parquet", "user_id")
      .as[Long].collect().sorted
    val exp = ev.select("user_id").distinct().as[Long].collect().sorted
    assert(got.toSeq === exp.toSeq)
  }

  test("falls back to scanning files whose pages broke dictionary encoding") {
    val dir = Files.createTempDirectory("graft_skipscan").toString
    val df = (0 until 10000).map(i => (s"v${i % 7}", i.toLong)).toDF("k", "n")
    df.write.option("parquet.enable.dictionary", "false").parquet(s"$dir/plain")
    val got = SkipScan.distinct(spark, s"$dir/plain", "k")
      .as[String].collect().sorted
    assert(got.toSeq === (0 until 7).map(i => s"v$i"))
  }

  test("fallback over a single-FILE table: basePath anchors at the parent " +
      "dir (sf1 bench regression — 'basePath must be a directory')") {
    val dir = Files.createTempDirectory("graft_skipscan_file").toString
    val df = (0 until 10000).map(i => (s"v${i % 7}", i.toLong)).toDF("k", "n")
    df.coalesce(1).write
      .option("parquet.enable.dictionary", "false").parquet(s"$dir/stage")
    // a flat fixture-style single file, like the testdata tables
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/stage"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/t.parquet"))
    val got = SkipScan.distinct(spark, s"$dir/t.parquet", "k")
      .as[String].collect().sorted
    assert(got.toSeq === (0 until 7).map(i => s"v$i"))
  }

  test("distinct on a partition column (in no file's physical schema)") {
    val dir = Files.createTempDirectory("graft_skipscan_part").toString
    val df = (0 until 1000).map(i => (i % 5, i.toLong)).toDF("p", "n")
    df.write.partitionBy("p").parquet(s"$dir/t")
    // every file falls back (no physical column); the fallback read must
    // re-derive the partition values from the paths
    val got = SkipScan.distinct(spark, s"$dir/t", "p").as[Int].collect().sorted
    assert(got.toSeq === (0 until 5))
  }

  test("nulls survive (dictionaries never hold them; footer null counts do)") {
    val dir = Files.createTempDirectory("graft_skipscan_null").toString
    val df = Seq(Some("a"), Some("b"), None, Some("a")).toDF("k")
    df.write.parquet(s"$dir/t")
    val got = SkipScan.distinct(spark, s"$dir/t", "k").collect().map(r =>
      Option(r.getString(0))).toSeq
    assert(got.toSet === Set(Some("a"), Some("b"), None))
  }
}
