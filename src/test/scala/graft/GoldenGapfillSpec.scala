package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gapfill
import graft.{functions => gf}

/** Golden port of the reference's gapfill value matrix —
  * `tsl/test/shared/sql/gapfill.sql.in` with the exact expected rows of
  * `tsl/test/shared/expected/gapfill-17.out` (row values are
  * version-independent; 16/18/19 agree). Covers the locf
  * prev-lookup / interpolate next-anchor / group-column interaction state
  * machine: carried real NULLs vs treat_null_as_missing, seeds consulted
  * only when a side has no real anchor (including the backwards-seed
  * extrapolation case), per-type integer rounding through exact arithmetic,
  * float equal-anchor shortcircuit, out-of-window pass-through rows, and
  * the ungrouped empty-resultset spine.
  */
class GoldenGapfillSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-gapfill-spec", "local[4]", 4)
  import spark.implicits._

  /** Integer-time agg: bucket raw long `t` by `w` (origin 0) + min(value). */
  private def aggInt(data: Seq[(Long, Option[Int])], w: Long): DataFrame =
    data.toDF("t0", "v")
      .groupBy(gf.time_bucket(lit(w), $"t0").as("t"))
      .agg(min($"v").as("v"))

  private def rowsOf(df: DataFrame): Seq[(Long, Option[Int])] =
    df.orderBy("t").select($"t", $"v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSeq

  test("simple gapfill + out-of-window pass-through (gapfill-17.out:1222)") {
    val agg = aggInt(Seq(-10L -> Some(1), 10L -> Some(2), 11L -> Some(3),
      12L -> Some(4), 22L -> Some(5), 30L -> Some(6), 66L -> Some(7)), 10)
    val got = rowsOf(Gapfill.gapfillInt(agg, "t", Nil, 0, 50, 10).select("t", "v"))
    assert(got === Seq(-10L -> Some(1), 0L -> None, 10L -> Some(2),
      20L -> Some(5), 30L -> Some(6), 40L -> None, 60L -> Some(7)))
  }

  test("non-aligned window start floors to the bucket grid (gapfill-17.out:1210)") {
    val agg = aggInt(Seq(11L -> Some(11), 22L -> Some(22)), 10)
    val got = rowsOf(Gapfillint(agg, 5, 40, 10).select("t", "v"))
    assert(got === Seq(0L -> None, 10L -> Some(11), 20L -> Some(22), 30L -> None))
  }
  private def Gapfillint(agg: DataFrame, s: Long, f: Long, w: Long) =
    Gapfill.gapfillInt(agg, "t", Nil, s, f, w)

  test("values outside boundaries pass through; fill before first / after " +
      "last row (gapfill-17.out:1252,1268)") {
    val a1 = aggInt(Seq(-1L, 1L, 3L, 6L).map(t => t -> Some(t.toInt)), 1)
    assert(rowsOf(Gapfillint(a1, 0, 5, 1).select("t", "v")) ===
      Seq(-1L -> Some(-1), 0L -> None, 1L -> Some(1), 2L -> None,
        3L -> Some(3), 4L -> None, 6L -> Some(6)))
    val a2 = aggInt(Seq(1L, 2L, 3L).map(t => t -> Some(t.toInt)), 1)
    assert(rowsOf(Gapfillint(a2, 0, 5, 1).select("t", "v")) ===
      Seq(0L -> None, 1L -> Some(1), 2L -> Some(2), 3L -> Some(3), 4L -> None))
  }

  test("ungrouped gapfill over ZERO rows still emits the all-null spine " +
      "(gapfill-17.out:1285)") {
    val empty = aggInt(Seq(1L, 2L, 3L).map(t => t -> Some(t.toInt)), 1)
      .where(lit(false))
    assert(rowsOf(Gapfillint(empty, 0, 5, 1).select("t", "v")) ===
      (0L to 4L).map(_ -> None))
    // grouped query with no rows has no groups → nothing, reference-style
    val emptyGrouped = Seq((1L, "a", 1)).toDF("t0", "g", "v")
      .where(lit(false))
      .groupBy(gf.time_bucket(lit(1L), $"t0").as("t"), $"g")
      .agg(min($"v").as("v"))
    assert(Gapfill.gapfillInt(emptyGrouped, "t", Seq("g"), 0, 5, 1).count() === 0)
  }

  test("locf: carry, carried real NULLs, treat_null_as_missing " +
      "(gapfill-17.out:1579,1594,1637)") {
    val base = aggInt(Seq(10L -> Some(9), 20L -> Some(3), 50L -> Some(6)), 10)
    def locfed(agg: DataFrame, tnm: Boolean, prev: Option[Int] = None) =
      rowsOf(Gapfillint(agg, 0, 50, 10)
        .withColumn("v", Gapfill.locf($"v", Nil, "t",
          prev = prev.map(p => lit(p)), treatNullAsMissing = tnm))
        .select("t", "v"))
    assert(locfed(base, tnm = false) === Seq(0L -> None, 10L -> Some(9),
      20L -> Some(3), 30L -> Some(3), 40L -> Some(3), 50L -> Some(6)))
    // a REAL NULL row is carried as NULL by default…
    val withNull = aggInt(Seq(10L -> Some(9), 20L -> Some(3), 30L -> None,
      50L -> Some(6)), 10)
    assert(locfed(withNull, tnm = false) === Seq(0L -> None, 10L -> Some(9),
      20L -> Some(3), 30L -> None, 40L -> None, 50L -> Some(6)))
    // …and filled over with treat_null_as_missing
    assert(locfed(withNull, tnm = true) === Seq(0L -> None, 10L -> Some(9),
      20L -> Some(3), 30L -> Some(3), 40L -> Some(3), 50L -> Some(6)))
  }

  test("locf prev lookup: consulted only when no real (even NULL) row " +
      "precedes (gapfill-17.out:1652,1714)") {
    // NULL first row: v1 (default) carries the real NULL — the prev seed
    // must NOT override real rows; v2 (treat_null_as_missing) skips them
    // and falls through to the seed
    val d = aggInt(Seq(0L -> None, 30L -> None, 50L -> Some(6)), 10)
    val filled = Gapfillint(d, 0, 50, 10)
      .withColumn("v1", Gapfill.locf($"v", Nil, "t", prev = Some(lit(100))))
      .withColumn("v2", Gapfill.locf($"v", Nil, "t", prev = Some(lit(100)),
        treatNullAsMissing = true))
    val got = filled.orderBy("t").select($"t", $"v1", $"v2").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq
    assert(got === Seq(
      (0L, None, Some(100)), (10L, None, Some(100)), (20L, None, Some(100)),
      (30L, None, Some(100)), (40L, None, Some(100)), (50L, Some(6), Some(6))))
    // out-of-boundary lookup seeds buckets before the first real row
    val ob = aggInt(Seq(20L -> Some(9), 40L -> Some(6)), 10)
    val got2 = rowsOf(Gapfillint(ob, 0, 70, 10)
      .withColumn("v", Gapfill.locf($"v", Nil, "t", prev = Some(lit(100))))
      .select("t", "v"))
    assert(got2 === Seq(0L -> Some(100), 10L -> Some(100), 20L -> Some(9),
      30L -> Some(9), 40L -> Some(6), 50L -> Some(6), 60L -> Some(6)))
  }

  test("interpolate: integer rounding via exact math; a real NULL row " +
      "poisons its neighbors (gapfill-17.out:1769,1784)") {
    val a = aggInt(Seq(0L -> Some(1), 50L -> Some(6)), 10)
    val got = rowsOf(Gapfillint(a, 0, 50, 10)
      .withColumn("v", Gapfill.interpolate($"v", Nil, "t", xCol = Some($"t")))
      .select("t", "v"))
    assert(got === Seq(0L -> Some(1), 10L -> Some(2), 20L -> Some(3),
      30L -> Some(4), 40L -> Some(5), 50L -> Some(6)))
    val withNull = aggInt(Seq(0L -> Some(0), 2L -> None, 5L -> Some(5)), 1)
    val got2 = rowsOf(Gapfillint(withNull, 0, 5, 1)
      .withColumn("v", Gapfill.interpolate($"v", Nil, "t", xCol = Some($"t")))
      .select("t", "v"))
    assert(got2 === Seq(0L -> Some(0), 1L -> None, 2L -> None, 3L -> None,
      4L -> None, 5L -> Some(5)))
  }

  test("interpolate datatypes: int types round half-away, floats keep " +
      "native math (gapfill-17.out:1799,1818)") {
    def matrix(data: Seq[(Long, Int)], s: Long, f: Long) = {
      val agg = data.toDF("t0", "raw")
        .select($"t0", $"raw".cast("smallint").as("s16"),
          $"raw".cast("int").as("i32"), $"raw".cast("bigint").as("i64"),
          $"raw".cast("float").as("f32"), $"raw".cast("double").as("f64"))
        .groupBy(gf.time_bucket(lit(10L), $"t0").as("t"))
        .agg(min($"s16").as("s16"), min($"i32").as("i32"),
          min($"i64").as("i64"), min($"f32").as("f32"), min($"f64").as("f64"))
      val filled = Gapfill.gapfillInt(agg, "t", Nil, s, f, 10)
      Seq("s16", "i32", "i64", "f32", "f64").foldLeft(filled)((df, c) =>
        df.withColumn(c, Gapfill.interpolate(col(c), Nil, "t", xCol = Some($"t"))))
        .orderBy("t")
        .select($"t", $"s16".cast("long"), $"i32".cast("long"),
          $"i64", $"f32".cast("double"), $"f64")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toSeq
    }
    // (0,-3) → (50,3): −1.8/−0.6/0.6/1.8; ints round to −2/−1/1/2. The
    // float4 column stays in 32-BIT math (like the reference's C float
    // arithmetic), so its values are float32 −1.8f/−0.6f widened — PG
    // prints them "-1.8"/"-0.6" via shortest float4 round-trip
    assert(matrix(Seq(0L -> -3, 50L -> 3), 0, 50) === Seq(
      (0L, -3L, -3L, -3L, -3.0f.toDouble, -3.0),
      (10L, -2L, -2L, -2L, -1.8f.toDouble, -1.8),
      (20L, -1L, -1L, -1L, -0.6f.toDouble, -0.6),
      (30L, 1L, 1L, 1L, 0.6f.toDouble, 0.6),
      (40L, 2L, 2L, 2L, 1.8f.toDouble, 1.8),
      (50L, 3L, 3L, 3L, 3.0f.toDouble, 3.0)))
    // negative time keeps true floor alignment and exact steps
    assert(matrix(Seq(-40L -> -3, 20L -> 3), -40, 30) === Seq(
      (-40L, -3L, -3L, -3L, -3.0, -3.0),
      (-30L, -2L, -2L, -2L, -2.0, -2.0),
      (-20L, -1L, -1L, -1L, -1.0, -1.0),
      (-10L, 0L, 0L, 0L, 0.0, 0.0),
      (0L, 1L, 1L, 1L, 1.0, 1.0),
      (10L, 2L, 2L, 2L, 2.0, 2.0),
      (20L, 3L, 3L, 3L, 3.0, 3.0)))
  }

  test("interpolate int64-extreme anchors stay exact (the reference routes " +
      "integers through NUMERIC; gapfill-17.out:2948)") {
    val mn = Long.MinValue; val mx = Long.MaxValue
    val agg = Seq((mn, -32768, Int.MinValue, mn, Int.MinValue.toLong),
      (mx, 32767, Int.MaxValue, mx, Int.MaxValue.toLong))
      .toDF("t0", "raw16", "raw32", "b", "b2")
      .select($"t0", $"raw16".cast("smallint").as("s16"),
        $"raw32".as("i32"), $"b", $"b2")
      .groupBy(gf.time_bucket(lit(1L), $"t0").as("t"))
      .agg(min($"s16").as("s16"), min($"i32").as("i32"),
        min($"b").as("b"), min($"b2").as("b2"))
    val filled = Gapfill.gapfillInt(agg, "t", Nil, 0, 1, 1)
    val got = Seq("s16", "i32", "b", "b2").foldLeft(filled)((df, c) =>
      df.withColumn(c, Gapfill.interpolate(col(c), Nil, "t", xCol = Some($"t"))))
      .where($"t" === 0)
      .select($"s16".cast("long"), $"i32".cast("long"), $"b", $"b2")
      .head()
    // int64·int64 products overflow any fixed-width path; exact math gives
    // 0 for every column at the midpoint-ish bucket 0
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === ((0L, 0L, 0L, 0L)))
  }

  test("interpolate multi-group record seeds: per-group lines, integer " +
      "division rounds (gapfill-17.out:1838)") {
    val agg = Seq((5L, 1, 0), (5L, 2, 0)).toDF("t0", "device", "v")
      .groupBy(gf.time_bucket(lit(5L), $"t0").as("t"), $"device")
      .agg(min($"v").as("v"))
    val got = Gapfill.gapfillInt(agg, "t", Seq("device"), 0, 11, 5)
      .withColumn("v", Gapfill.interpolate($"v", Seq("device"), "t",
        prev = Some((lit(-10L), lit(-10))), next = Some((lit(20L), lit(10))),
        xCol = Some($"t")))
      .orderBy("device", "t")
      .select($"device", $"t", $"v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === Seq((1, 0L, -3), (1, 5L, 0), (1, 10L, 3),
      (2, 0L, -3), (2, 5L, 0), (2, 10L, 3)))
  }

  // ---- timestamp path: the metrics_tstz hypertable matrix ----
  // shared_setup.sql:142-150 (PST instants as UTC wall-clock: 05:00 PST =
  // 13:00 UTC); sessions here are pinned UTC.
  private def ts(s: String) = Timestamp.valueOf(s)
  private lazy val metricsTstz = Seq(
    ("2018-01-01 13:00:00", 1, 0.5, 10), ("2018-01-01 13:00:00", 2, 0.7, 20),
    ("2018-01-01 13:00:00", 3, 0.9, 30), ("2018-01-01 15:00:00", 1, 0.0, 0),
    ("2018-01-01 15:00:00", 2, 1.4, 40), ("2018-01-01 15:00:00", 3, 0.9, 30))
    .map { case (t, d, v1, v2) => (ts(t), d, v1, v2) }
    .toDF("time", "device_id", "v1", "v2")
  private def us(s: String) = ts(s).getTime * 1000L

  test("locf and interpolate together over groups (gapfill-17.out:2204)") {
    val agg = metricsTstz
      .groupBy(gf.time_bucket("1 hour", $"time").as("t"), $"device_id")
      .agg(avg($"v1").as("avg_v1"), min($"v2").as("min_v2"),
        avg($"v2").as("avg_v2"))
    val filled = Gapfill.gapfill(agg, "t", Seq("device_id"),
      us("2018-01-01 13:00:00"), us("2018-01-01 16:00:00"), "1 hour")
      .withColumn("locf_v1", Gapfill.locf($"avg_v1", Seq("device_id"), "t"))
      .withColumn("locf_v2", Gapfill.locf($"min_v2", Seq("device_id"), "t"))
      .withColumn("interp_v1",
        Gapfill.interpolate($"avg_v1", Seq("device_id"), "t"))
      .withColumn("interp_v2",
        Gapfill.interpolate($"avg_v2", Seq("device_id"), "t"))
    val got = filled.orderBy("t", "device_id")
      .select($"t", $"device_id", $"locf_v1", $"locf_v2", $"interp_v1", $"interp_v2")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getDouble(2),
        r.getInt(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      ("2018-01-01 13:00:00.0", 1, 0.5, 10, 0.5, 10.0),
      ("2018-01-01 13:00:00.0", 2, 0.7, 20, 0.7, 20.0),
      ("2018-01-01 13:00:00.0", 3, 0.9, 30, 0.9, 30.0),
      // 1.05 is the reference's printed float8 (shortest round-trip): the
      // identical IEEE expression must land on the same double
      ("2018-01-01 14:00:00.0", 1, 0.5, 10, 0.25, 5.0),
      ("2018-01-01 14:00:00.0", 2, 0.7, 20, 1.05, 30.0),
      // equal anchors shortcircuit to the anchor value exactly
      ("2018-01-01 14:00:00.0", 3, 0.9, 30, 0.9, 30.0),
      ("2018-01-01 15:00:00.0", 1, 0.0, 0, 0.0, 0.0),
      ("2018-01-01 15:00:00.0", 2, 1.4, 40, 1.4, 40.0),
      ("2018-01-01 15:00:00.0", 3, 0.9, 30, 0.9, 30.0)))
  }

  test("interpolate correlated-style lookups: seed only fires where a side " +
      "has no real anchor, including backwards extrapolation " +
      "(gapfill-17.out:2255,2274)") {
    val dev1 = metricsTstz.where($"device_id" === 1)
      .groupBy(gf.time_bucket("1 hour", $"time").as("t"))
      .agg(avg($"v1").as("v"))
    // lookup BEFORE the interval: prev seed = (latest row time, 0.5)
    val before = Gapfill.gapfill(dev1, "t", Nil,
      us("2018-01-01 11:00:00"), us("2018-01-01 16:00:00"), "1 hour")
      .withColumn("v", Gapfill.interpolate($"v", Nil, "t",
        prev = Some((lit(ts("2018-01-01 15:00:00")), lit(0.5)))))
      .orderBy("t").select($"t", $"v").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSeq
    assert(before === Seq(
      ("2018-01-01 11:00:00.0", 0.5), ("2018-01-01 12:00:00.0", 0.5),
      ("2018-01-01 13:00:00.0", 0.5), ("2018-01-01 14:00:00.0", 0.25),
      ("2018-01-01 15:00:00.0", 0.0)))
    // lookup AFTER the interval: next seed = (earliest row time, 10.0) —
    // beyond the last real row the line extrapolates BACKWARDS through the
    // seed: (0·(13−16) + 10·(16−15)) / (13−15) = −5
    val after = Gapfill.gapfill(dev1, "t", Nil,
      us("2018-01-01 13:00:00"), us("2018-01-01 17:00:00"), "1 hour")
      .withColumn("v", Gapfill.interpolate($"v", Nil, "t",
        next = Some((lit(ts("2018-01-01 13:00:00")), lit(10.0)))))
      .orderBy("t").select($"t", $"v").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSeq
    assert(after === Seq(
      ("2018-01-01 13:00:00.0", 0.5), ("2018-01-01 14:00:00.0", 0.25),
      ("2018-01-01 15:00:00.0", 0.0), ("2018-01-01 16:00:00.0", -5.0)))
  }
}
