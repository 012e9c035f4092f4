package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DistinctOn

class DistinctOnSpec extends AnyFunSuite {
  lazy val spark = Graft.session("distinct-on-spec", "local[4]", 4)

  private lazy val events = Tables.table(spark, "/root/testdata/sf0.001", "events")

  test("distinctOn picks the latest full row per key") {
    val got = DistinctOn.distinctOn(events, Seq("user_id"), "ts",
      Seq("event_type", "value"))
    // reference formulation: window rank (the DISTINCT ON semantics)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc)
    val expect = events
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select("user_id", "ts", "event_type", "value")
    assert(got.collect().toSet === expect.collect().toSet)
    // earliest variant
    val first = DistinctOn.distinctOn(events, Seq("user_id"), "ts",
      Seq("value"), latest = false)
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc)
    val expectFirst = events
      .withColumn("_rn", row_number().over(wAsc)).where(col("_rn") === 1)
      .select("user_id", "ts", "value")
    assert(first.collect().toSet === expectFirst.collect().toSet)
  }

  test("distinctOn plans one aggregate exchange, no window sort") {
    val got = DistinctOn.distinctOn(events, Seq("user_id"), "ts", Seq("value"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"plan used a window:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
