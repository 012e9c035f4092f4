package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamWindows

class StreamWindowsSpec extends AnyFunSuite {
  lazy val spark = Graft.session("stream-windows-spec", "local[4]", 4)
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runComplete(df: org.apache.spark.sql.DataFrame, name: String)(
      feed: => Unit): Array[org.apache.spark.sql.Row] = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    feed
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
  }

  test("streaming exact dedup drops repeated texts within the watermark") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = graft.operators.Dedup.streamingDropDuplicates(
      mem.toDF().toDF("id", "ts", "text"), "text", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), "the same doc"),
      (2L, ts("2024-01-01 10:05:00"), "the  SAME   doc"), // normalized dup
      (3L, ts("2024-01-01 10:10:00"), "a different doc"))
    q.processAllAvailable()
    // advance event time far enough to flush append-mode results
    mem.addData((4L, ts("2024-01-01 14:00:00"), "late tick"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sdedup").collect().map(_.getAs[Long]("id")).toSet
    assert(ids.contains(1L) && ids.contains(3L))
    assert(!ids.contains(2L), "normalized duplicate must be dropped")
  }

  test("tumbling stream windows aggregate per hour bucket") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = StreamWindows.tumbling(
      mem.toDF().toDF("ts", "k", "v"), "ts", "1 hour", Seq("k"),
      Seq(count(lit(1)).as("n"), sum($"v").as("sum_v")))
    val rows = runComplete(out, "tumbling_t") {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "a", 1.0),
        (ts("2024-01-01 10:55:00"), "a", 2.0),
        (ts("2024-01-01 11:05:00"), "a", 4.0),
        (ts("2024-01-01 10:30:00"), "b", 8.0))
    }
    val byKey = rows.map(r => (r.getAs[Timestamp]("bucket").toString, r.getAs[String]("k")) ->
      (r.getAs[Long]("n"), r.getAs[Double]("sum_v"))).toMap
    assert(byKey(("2024-01-01 10:00:00.0", "a")) === (2L, 3.0))
    assert(byKey(("2024-01-01 11:00:00.0", "a")) === (1L, 4.0))
    assert(byKey(("2024-01-01 10:00:00.0", "b")) === (1L, 8.0))
  }

  test("hopping stream windows overlap") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val out = StreamWindows.hopping(
      mem.toDF().toDF("ts", "v"), "ts", "1 hour", "30 minutes", Seq.empty,
      Seq(count(lit(1)).as("n")))
    val rows = runComplete(out, "hopping_t") {
      mem.addData((ts("2024-01-01 10:40:00"), 1.0))
    }
    // one event belongs to exactly two hopping windows: 10:00 and 10:30
    assert(rows.map(_.getAs[Timestamp]("bucket").toString).sorted.toSeq ===
      Seq("2024-01-01 10:00:00.0", "2024-01-01 10:30:00.0"))
  }

  test("session stream windows merge within the gap and split across it") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamWindows.session(
      mem.toDF().toDF("ts", "k"), "ts", "30 minutes", Seq("k"),
      Seq(count(lit(1)).as("n")))
    val rows = runComplete(out, "session_t") {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "a"),
        (ts("2024-01-01 10:20:00"), "a"), // merges: gap < 30 min
        (ts("2024-01-01 12:00:00"), "a")) // new session
    }.map(r => (r.getAs[Timestamp]("bucket").toString, r.getAs[Long]("n"))).toSet
    assert(rows.contains(("2024-01-01 10:00:00.0", 2L)))
    assert(rows.contains(("2024-01-01 12:00:00.0", 1L)))
  }
}
