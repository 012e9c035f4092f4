package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = Graft.session("joins-spec", "local[4]", 4)
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left row") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 10:05:00")),
      (3L, "b", ts("2024-01-01 10:00:00")),
      (4L, "b", ts("2024-01-01 09:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 09:59:00"), 10.0),
      ("a", ts("2024-01-01 10:05:00"), 20.0), // equal ts is visible
      ("b", ts("2024-01-01 09:30:00"), 30.0)).toDF("k", "t", "v")
    val out = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"id", $"v_asof").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(10.0))
    assert(out(2L) === Some(20.0))
    assert(out(3L) === Some(30.0))
    assert(out(4L) === None) // nothing at or before 09:00
  }

  test("asOf tolerance nulls out stale matches") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(("a", ts("2024-01-01 08:00:00"), 5.0)).toDF("k", "t", "v")
    val within = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
      toleranceMicros = Some(3L * 3600 * 1000000))
    assert(within.select($"v_asof").as[Option[Double]].head() === Some(5.0))
    val stale = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
      toleranceMicros = Some(3600L * 1000000))
    assert(stale.select($"v_asof").as[Option[Double]].head() === None)
  }

  test("rangeJoin matches points to containing intervals only") {
    val points = Seq(
      (1L, "a", ts("2024-01-01 10:30:00")),
      (2L, "a", ts("2024-01-01 12:00:00")),
      (3L, "b", ts("2024-01-01 10:30:00"))).toDF("id", "k", "p")
    val ivals = Seq(
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "i1"),
      ("a", ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00"), "i2"),
      ("b", ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), "i3"))
      .toDF("k", "s", "e", "name")
    val out = Joins.rangeJoin(points, ivals, Seq("k"), "p", "s", "e",
      bucketWidthMicros = 3600L * 1000000)
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "i1"), (2L, "i2")))
  }

  test("rangeJoin end boundary is exclusive") {
    val points = Seq((1L, "a", ts("2024-01-01 11:00:00"))).toDF("id", "k", "p")
    val ivals = Seq(("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "i1"))
      .toDF("k", "s", "e", "name")
    assert(Joins.rangeJoin(points, ivals, Seq("k"), "p", "s", "e",
      3600L * 1000000).count() === 0)
  }

  test("rangeJoin drops inverted/empty intervals instead of exploding them") {
    val points = Seq((1L, "a", ts("2024-01-01 10:30:00"))).toDF("id", "k", "p")
    val ivals = Seq(
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "ok"),
      // swapped bounds: a descending `sequence` would materialize ~13 years
      // of hourly buckets for this one corrupt row
      ("a", ts("2024-01-01 11:00:00"), ts("2011-01-01 00:00:00"), "inverted"),
      ("a", ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:00"), "empty"))
      .toDF("k", "s", "e", "name")
    val out = Joins.rangeJoin(points, ivals, Seq("k"), "p", "s", "e",
      3600L * 1000000).select($"name").as[String].collect().toSeq
    assert(out === Seq("ok"))
  }

  test("asOf carries multiple right columns") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(("a", ts("2024-01-01 09:00:00"), 1.0, "x"),
      ("a", ts("2024-01-01 09:30:00"), 2.0, "y")).toDF("k", "t", "v", "s")
    val out = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v", "s"))
    val row = out.select($"v_asof", $"s_asof").head()
    assert(row.getDouble(0) === 2.0 && row.getString(1) === "y")
  }

  test("skew-salted asOf equals the plain asOf, including a hot key") {
    // hot key "h": 2000 clicks + 500 purchases in one day; cold keys normal
    val rnd = new scala.util.Random(7)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val left = ((1 to 500).map(i => (i.toLong, "h",
        new Timestamp(base + rnd.nextInt(86400) * 1000L))) ++
      (501 to 520).map(i => (i.toLong, s"c${i % 5}",
        new Timestamp(base + rnd.nextInt(86400) * 1000L)))).toDF("id", "k", "t")
    val right = ((1 to 2000).map(i => ("h",
        new Timestamp(base + rnd.nextInt(86400) * 1000L), i.toDouble)) ++
      (1 to 50).map(i => (s"c${i % 5}",
        new Timestamp(base + rnd.nextInt(86400) * 1000L), -i.toDouble))).toDF("k", "t", "v")
    val plain = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"id", $"v_asof", $"t_matched").collect().toSet
    val salted = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
      skewBlockMicros = Some(3600000000L)) // 1-hour blocks
      .select($"id", $"v_asof", $"t_matched").collect().toSet
    assert(salted === plain)
    // also with tolerance
    val plainTol = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
      toleranceMicros = Some(600000000L)).select($"id", $"v_asof").collect().toSet
    val saltedTol = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
      toleranceMicros = Some(600000000L), skewBlockMicros = Some(3600000000L))
      .select($"id", $"v_asof").collect().toSet
    assert(saltedTol === plainTol)
  }

  test("asOf preserves a genuinely NULL right value from the matched row") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 09:00:00"), Some(5.0)),
      ("a", ts("2024-01-01 09:30:00"), None: Option[Double])).toDF("k", "t", "v")
    val out = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"v_asof", $"t_matched").head()
    // the matched row (09:30) carries NULL — it must NOT fall back to 09:00's 5.0
    assert(out.isNullAt(0))
    assert(out.getTimestamp(1) === ts("2024-01-01 09:30:00"))
  }

  test("asOf plan has a single exchange (union+window, no join node)") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(("a", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "t", "v")
    val plan = Joins.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
  }
}
