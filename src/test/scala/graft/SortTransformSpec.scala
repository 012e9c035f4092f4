package graft

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{functions => gf}

class SortTransformSpec extends AnyFunSuite {
  lazy val spark = Graft.session("sort-transform-spec", "local[4]", 4)
  import spark.implicits._

  private lazy val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")

  private def sortKeys(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.queryExecution.optimizedPlan.collect {
      case Sort(orders, _, _, _) => orders.map(_.child.sql)
    }

  test("ORDER BY time_bucket(ts) is rewritten to ORDER BY ts") {
    val df = ev.orderBy(gf.time_bucket("1 hour", $"ts"))
    val keys = sortKeys(df)
    assert(keys.nonEmpty)
    assert(keys.head === Seq("ts"), s"sort keys were ${keys.head}")
  }

  test("session toggles disable the rewrite like the reference GUCs (guc.c)") {
    def bucketed = ev.orderBy(gf.time_bucket("1 hour", $"ts"))
    for (key <- Seq("spark.graft.enable_sort_transform",
        "spark.graft.enable_optimizations")) {
      spark.conf.set(key, "false")
      try assert(sortKeys(bucketed).head !== Seq("ts"), s"$key=false ignored")
      finally spark.conf.unset(key)
    }
    assert(sortKeys(bucketed).head === Seq("ts")) // back on by default
  }

  test("descending and prefixed sorts rewrite only the trailing bucket key") {
    val desc = ev.orderBy(gf.time_bucket("1 hour", $"ts").desc)
    assert(sortKeys(desc).head === Seq("ts"))
    val prefixed = ev.orderBy($"event_type", gf.time_bucket("1 day", $"ts"))
    assert(sortKeys(prefixed).head === Seq("event_type", "ts"))
    // bucket NOT last → untouched (tie-break keys would break)
    val unsafe = ev.orderBy(gf.time_bucket("1 day", $"ts"), $"value")
    assert(sortKeys(unsafe).head.head.contains("time_bucket"))
  }

  test("date_trunc and cast-to-date sorts rewrite too") {
    assert(sortKeys(ev.orderBy(date_trunc("hour", $"ts"))).head === Seq("ts"))
    assert(sortKeys(ev.orderBy($"ts".cast("date"))).head === Seq("ts"))
  }

  test("rewritten ordering still satisfies the requested one") {
    val buckets = ev.orderBy(gf.time_bucket("1 hour", $"ts"))
      .select(unix_micros(gf.time_bucket("1 hour", $"ts"))).as[Long].collect()
    assert(buckets.sameElements(buckets.sorted))
  }

  test("sorts on unrelated expressions are untouched") {
    val df = ev.orderBy($"value")
    assert(sortKeys(df).head === Seq("value"))
  }
}
