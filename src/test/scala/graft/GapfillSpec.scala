package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gapfill
import graft.{functions => gf}

class GapfillSpec extends AnyFunSuite {
  lazy val spark = Graft.session("gapfill-spec", "local[4]", 4)
  import spark.implicits._

  // reference gapfill README "Usage" pattern: points at t=0 (v=1) and t=5 (v=6)
  private lazy val agg = Seq(
    ("a", Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
    ("a", Timestamp.valueOf("2024-01-01 05:00:00"), 6.0))
    .toDF("g", "bucket", "v")

  private val start = 1704067200000000L            // 2024-01-01 00:00:00 UTC
  private val finish = start + 6L * 3600 * 1000000 // 06:00 exclusive

  test("long spines split into bounded segments with identical buckets") {
    import spark.implicits._
    val groups = Seq("a", "b").toDF("k")
    // 60 days of minute buckets = 86,400 per group → two-level path
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    val finish = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime * 1000L
    val sp = Gapfill.spine(groups, "bucket", start, finish, "1 minute")
    assert(sp.count() === 2L * 60 * 24 * 60)
    // first/last buckets and density per group
    val mm = sp.groupBy("k").agg(min($"bucket"), max($"bucket"),
      countDistinct($"bucket")).collect()
    mm.foreach { r =>
      assert(r.getTimestamp(1).getTime * 1000L === start)
      assert(r.getTimestamp(2).getTime * 1000L === finish - 60000000L)
      assert(r.getLong(3) === 60L * 24 * 60)
    }
  }

  test("gapfill injects one row per missing bucket") {
    val filled = Gapfill.gapfill(agg, "bucket", Seq("g"), start, finish, "1 hour")
    assert(filled.count() === 6)
    assert(filled.where($"v".isNull).count() === 4)
  }

  test("a NULL bucket errors like the reference instead of silently vanishing") {
    val bad = Seq(
      ("a", Some(Timestamp.valueOf("2024-01-01 00:00:00")), 1.0),
      ("a", None: Option[Timestamp], 2.0))
      .toDF("g", "bucket", "v")
    val e = intercept[Exception] {
      Gapfill.gapfill(bad, "bucket", Seq("g"), start, finish, "1 hour").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("NULL bucket")), s"unexpected error: $e")
  }

  test("out-of-window rows pass through unfilled; their neighbors' gaps skip over them") {
    // reference gapfill_exec.c:1037-1041 returns subplan tuples outside
    // [start, finish) as-is — they are neither dropped nor spine-joined
    val wide = Seq(
      ("a", Timestamp.valueOf("2023-12-31 20:00:00"), 99.0), // before start
      ("a", Timestamp.valueOf("2024-01-01 02:00:00"), 3.0),
      ("a", Timestamp.valueOf("2024-01-01 07:00:00"), 88.0)) // after finish
      .toDF("g", "bucket", "v")
    val filled = Gapfill.gapfill(wide, "bucket", Seq("g"), start, finish, "1 hour")
    // 6 spine buckets + 2 pass-through rows
    assert(filled.count() === 8)
    val out = filled.orderBy("bucket")
      .select($"bucket", $"v", col(Gapfill.FILLED)).collect()
    assert(out.head.getTimestamp(0) === Timestamp.valueOf("2023-12-31 20:00:00"))
    assert(out.head.getDouble(1) === 99.0 && !out.head.getBoolean(2))
    assert(out.last.getTimestamp(0) === Timestamp.valueOf("2024-01-01 07:00:00"))
    assert(out.last.getDouble(1) === 88.0 && !out.last.getBoolean(2))
    // in-window: the real 02:00 row plus 5 injected buckets
    assert(filled.where(!col(Gapfill.FILLED)).count() === 3)
    assert(filled.where(col(Gapfill.FILLED) && $"v".isNull).count() === 5)
  }

  test("a group with only out-of-window rows still gets the full spine") {
    // reference: next_timestamp starts at gapfill_start per group and the
    // post-input loop fills to gapfill_end regardless of row positions
    val wide = Seq(
      ("a", Timestamp.valueOf("2024-01-01 02:00:00"), 3.0),
      ("b", Timestamp.valueOf("2023-12-31 20:00:00"), 7.0)) // b: all before start
      .toDF("g", "bucket", "v")
    val filled = Gapfill.gapfill(wide, "bucket", Seq("g"), start, finish, "1 hour")
    val b = filled.where($"g" === "b")
    assert(b.count() === 7) // 6 spine buckets + 1 pass-through
    assert(b.where(col(Gapfill.FILLED)).count() === 6)
    // locf's prev-less carry can seed from the pass-through row's value
    val carried = filled.withColumn("f",
      Gapfill.locf($"v", Seq("g"), "bucket")).where($"g" === "b" && col(Gapfill.FILLED))
    assert(carried.select("f").collect().forall(_.getDouble(0) === 7.0))
  }

  test("locf carries the last observation forward") {
    val got = Gapfill.gapfill(agg, "bucket", Seq("g"), start, finish, "1 hour")
      .withColumn("f", Gapfill.locf($"v", Seq("g"), "bucket"))
      .orderBy("bucket").select("f").as[Double].collect().toSeq
    assert(got === Seq(1.0, 1.0, 1.0, 1.0, 1.0, 6.0))
  }

  test("locf prev seeds the value before the window") {
    val noFirst = agg.where($"v" =!= 1.0) // only the t=5 point remains
    val got = Gapfill.gapfill(noFirst, "bucket", Seq("g"), start, finish, "1 hour")
      .withColumn("f", Gapfill.locf($"v", Seq("g"), "bucket", prev = Some(lit(-1.0))))
      .orderBy("bucket").select("f").as[Double].collect().toSeq
    assert(got === Seq(-1.0, -1.0, -1.0, -1.0, -1.0, 6.0))
  }

  test("interpolate draws the line between surrounding points") {
    val got = Gapfill.gapfill(agg, "bucket", Seq("g"), start, finish, "1 hour")
      .withColumn("i", Gapfill.interpolate($"v", Seq("g"), "bucket"))
      .orderBy("bucket").select("i").as[Double].collect().toSeq
    assert(got === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("interpolate leaves nulls outside the first/last points") {
    val shifted = Seq(
      ("a", Timestamp.valueOf("2024-01-01 01:00:00"), 2.0),
      ("a", Timestamp.valueOf("2024-01-01 03:00:00"), 4.0)).toDF("g", "bucket", "v")
    val got = Gapfill.gapfill(shifted, "bucket", Seq("g"), start, finish, "1 hour")
      .withColumn("i", Gapfill.interpolate($"v", Seq("g"), "bucket"))
      .orderBy("bucket").select("i").as[Option[Double]].collect().toSeq
    assert(got === Seq(None, Some(2.0), Some(3.0), Some(4.0), None, None))
  }

  test("interpolate prev/next seeds anchor the edges when no real point exists") {
    val shifted = Seq(
      ("a", Timestamp.valueOf("2024-01-01 01:00:00"), 2.0),
      ("a", Timestamp.valueOf("2024-01-01 03:00:00"), 4.0)).toDF("g", "bucket", "v")
    // prev point at (t=-1h, 0.0), next at (t=+6h, 10.0): edge buckets draw
    // the line to the seeds instead of staying null
    val got = Gapfill.gapfill(shifted, "bucket", Seq("g"), start, finish, "1 hour")
      .withColumn("i", Gapfill.interpolate($"v", Seq("g"), "bucket",
        prev = Some((lit(Timestamp.valueOf("2023-12-31 23:00:00")), lit(0.0))),
        next = Some((lit(Timestamp.valueOf("2024-01-01 06:00:00")), lit(10.0)))))
      .orderBy("bucket").select("i").as[Double].collect().toSeq
    // t0: between (-1h,0) and (1h,2) → 1.0; t4: between (3h,4) and (6h,10) → 6.0;
    // t5: → 8.0; interior buckets use real anchors as before
    assert(got === Seq(1.0, 2.0, 3.0, 4.0, 6.0, 8.0))
  }

  test("a losslessly-narrower seed upcasts to the COLUMN's type; a lossy " +
    "seed errors (reference: interpolate.c rejects a datatype mismatch)") {
    // LONG value column, INT-typed seed literal: int→long is a lossless
    // upcast, so the seed binds to the column's type and Lerp keeps it
    val shifted = Seq(
      ("a", Timestamp.valueOf("2024-01-01 01:00:00"), 2L),
      ("a", Timestamp.valueOf("2024-01-01 03:00:00"), 4L)).toDF("g", "bucket", "v")
    val got = Gapfill.gapfill(shifted, "bucket", Seq("g"), start, finish, "1 hour")
      .withColumn("i", Gapfill.interpolate($"v", Seq("g"), "bucket",
        prev = Some((lit(Timestamp.valueOf("2023-12-31 23:00:00")), lit(0))),
        next = Some((lit(Timestamp.valueOf("2024-01-01 06:00:00")), lit(10)))))
      .orderBy("bucket").select("i")
    assert(got.schema.head.dataType.typeName === "long")
    assert(got.as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L, 6L, 8L))

    // DOUBLE-typed seed on the LONG column: the reference raises an error
    // when the record's value type does not match the column's
    // (interpolate.c:138-148 — it never coerces); a silent cast would
    // truncate 0.9 to 0 and alter results without warning
    val err = intercept[Exception] {
      Gapfill.gapfill(shifted, "bucket", Seq("g"), start, finish, "1 hour")
        .withColumn("i", Gapfill.interpolate($"v", Seq("g"), "bucket",
          prev = Some((lit(Timestamp.valueOf("2023-12-31 23:00:00")), lit(0.9)))))
        .collect()
    }
    assert(err.getMessage.contains("losslessly"),
      s"expected the lossy-seed analysis error, got: ${err.getMessage}")

    // LONG seed on a DOUBLE column: Spark's canUpCast permits it by
    // numeric precedence, but long→double loses magnitude bits — refused
    val dcol = Seq(
      ("a", Timestamp.valueOf("2024-01-01 01:00:00"), 2.0),
      ("a", Timestamp.valueOf("2024-01-01 03:00:00"), 4.0)).toDF("g", "bucket", "v")
    val err2 = intercept[Exception] {
      Gapfill.gapfill(dcol, "bucket", Seq("g"), start, finish, "1 hour")
        .withColumn("i", Gapfill.interpolate($"v", Seq("g"), "bucket",
          prev = Some((lit(Timestamp.valueOf("2023-12-31 23:00:00")), lit(3L)))))
        .collect()
    }
    assert(err2.getMessage.contains("losslessly"))
  }

  test("a seed differing from the anchor struct only in NULLABILITY binds " +
    "cleanly (no canUpCast nullability refusal)") {
    // regression: the anchor struct's fields are nullable (window output)
    // while a seed built from non-literal expressions may mix; types that
    // are equal up to nullability must not be refused with an error
    // message showing two identical-looking structs
    val shifted = Seq(
      ("a", Timestamp.valueOf("2024-01-01 01:00:00"), 2.0),
      ("a", Timestamp.valueOf("2024-01-01 03:00:00"), 4.0)).toDF("g", "bucket", "v")
    // when(...) makes the seed value expression NULLABLE double
    val nullableSeed = when(lit(true), lit(0.0))
    val got = Gapfill.gapfill(shifted, "bucket", Seq("g"), start, finish, "1 hour")
      .withColumn("i", Gapfill.interpolate($"v", Seq("g"), "bucket",
        prev = Some((lit(Timestamp.valueOf("2023-12-31 23:00:00")), nullableSeed))))
      .orderBy("bucket").select("i").collect()
    assert(got.head.getDouble(0) === 1.0) // the seeded edge interpolates
  }

  test("gapfillInt matches an in-memory model on randomized sparse inputs") {
    // the riskiest operator surface (the reference needs a 1695-line state
    // machine): pit the distributed formulation against an obviously-
    // correct model — spine = aligned buckets of [floor(s), f) per group,
    // input values placed on their buckets, off-grid/out-of-window rows
    // passed through unfilled
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 15) {
      val w = 1 + rnd.nextInt(19)
      val s = (rnd.nextInt(101) - 50).toLong
      val f = s + 1 + rnd.nextInt(120)
      val gs = Seq("a", "b").take(1 + rnd.nextInt(2))
      val rows = (for {
        g <- gs
        _ <- 0 until (1 + rnd.nextInt(6))
      } yield (g, s - 30 + rnd.nextInt((f - s).toInt + 60))).distinct
        .map { case (g, t) => (g, t, rnd.nextInt(100).toDouble) }
      val got = Gapfill.gapfillInt(rows.toDF("g", "t", "v"), "t", Seq("g"), s, f, w)
        .select($"g", $"t", $"v", col(Gapfill.FILLED))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3)))
        .toSet
      val ts0 = Math.floorDiv(s, w) * w
      val spine = Iterator.iterate(ts0)(_ + w).takeWhile(_ < f).toSeq
      val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
      def inwin(t: Long) = t >= ts0 && t < f && Math.floorMod(t - ts0, w) == 0
      val expected =
        (for { g <- rows.map(_._1).distinct; b <- spine } yield {
          val v = byKey.get((g, b))
          (g, b, v: Option[Any], v.isEmpty)
        }).toSet ++
        rows.collect { case (g, t, v) if !inwin(t) => (g, t, Some(v): Option[Any], false) }
      assert(got === expected, s"case w=$w s=$s f=$f rows=$rows")
    }
  }

  test("integer-time gapfill matches the reference golden (gapfill-16.out 'test locf')") {
    // reference: rows (10,9),(20,3),(50,6), width 10, window [0,50) —
    // integer buckets align to origin 0, and the row at 50 passes through
    val agg = Seq((10L, 9.0), (20L, 3.0), (50L, 6.0)).toDF("t", "v")
    val out = Gapfill.gapfillInt(agg, "t", Seq.empty, 0L, 50L, 10L)
      .withColumn("v", Gapfill.locf($"v", Seq.empty, "t"))
      .orderBy("t").select($"t", $"v").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(out === Seq((0L, None), (10L, Some(9.0)), (20L, Some(3.0)),
      (30L, Some(3.0)), (40L, Some(3.0)), (50L, Some(6.0))))
  }

  test("integer-time gapfill aligns to origin 0, not the timestamp origin") {
    // width 7 does NOT divide the default timestamp origin (2000-01-03 in
    // micros), so reusing the timestamp alignment would shift the spine
    val agg = Seq((7L, 1.0), (21L, 2.0)).toDF("t", "v")
    val buckets = Gapfill.gapfillInt(agg, "t", Seq.empty, 0L, 28L, 7L)
      .orderBy("t").select($"t").as[Long].collect().toSeq
    assert(buckets === Seq(0L, 7L, 14L, 21L))
  }

  test("locf prev seed + treat_null_as_missing matches the reference combination") {
    // reference gapfill.sql.in "NULLs in first row of resultset and
    // treat_null_as_missing with lookup query" (expected gapfill-16.out:1652):
    // rows (0,NULL),(30,NULL),(50,6), width 10, window [0,50).
    // treat=false carries the real NULLs (prev never consulted after a real
    // row exists); treat=true treats them as missing so prev=100 fills
    // everything until the first real non-null value.
    val agg = Seq(
      (0L, null.asInstanceOf[java.lang.Double]),
      (30L, null.asInstanceOf[java.lang.Double]),
      (50L, java.lang.Double.valueOf(6.0)))
      .toDF("us", "v").select(timestamp_micros($"us").as("bucket"), $"v")
    val out = Gapfill.gapfill(agg, "bucket", Seq.empty, 0L, 50L, "10 microseconds")
      .withColumn("v1", Gapfill.locf($"v", Seq.empty, "bucket",
        prev = Some(lit(100.0)), treatNullAsMissing = false))
      .withColumn("v2", Gapfill.locf($"v", Seq.empty, "bucket",
        prev = Some(lit(100.0)), treatNullAsMissing = true))
      .orderBy("bucket")
      .select(unix_micros($"bucket"), $"v1", $"v2")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(out === Seq(
      (0L, None, Some(100.0)), (10L, None, Some(100.0)), (20L, None, Some(100.0)),
      (30L, None, Some(100.0)), (40L, None, Some(100.0)),
      (50L, Some(6.0), Some(6.0)))) // 50 is the reference's pass-through row
  }

  test("locf carries real NULL values by default; treat_null_as_missing fills them") {
    // a real data row with a NULL value at t=3
    val withNull = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0)),
      ("a", Timestamp.valueOf("2024-01-01 03:00:00"), None: Option[Double]),
      ("a", Timestamp.valueOf("2024-01-01 05:00:00"), Some(6.0)))
      .toDF("g", "bucket", "v")
    val base = Gapfill.gapfill(withNull, "bucket", Seq("g"), start, finish, "1 hour")
    val dflt = base.withColumn("f", Gapfill.locf($"v", Seq("g"), "bucket"))
      .orderBy("bucket").select("f").as[Option[Double]].collect().toSeq
    // the real NULL at t=3 stays NULL and is carried into the t=4 gap
    assert(dflt === Seq(Some(1.0), Some(1.0), Some(1.0), None, None, Some(6.0)))
    val nam = base.withColumn("f",
        Gapfill.locf($"v", Seq("g"), "bucket", treatNullAsMissing = true))
      .orderBy("bucket").select("f").as[Option[Double]].collect().toSeq
    assert(nam === Seq(Some(1.0), Some(1.0), Some(1.0), Some(1.0), Some(1.0), Some(6.0)))
  }

  test("interpolate anchors on real rows: a real NULL poisons its neighbors (reference)") {
    val withNull = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0)),
      ("a", Timestamp.valueOf("2024-01-01 03:00:00"), None: Option[Double]),
      ("a", Timestamp.valueOf("2024-01-01 05:00:00"), Some(6.0)))
      .toDF("g", "bucket", "v")
    val got = Gapfill.gapfill(withNull, "bucket", Seq("g"), start, finish, "1 hour")
      .withColumn("i", Gapfill.interpolate($"v", Seq("g"), "bucket"))
      .orderBy("bucket").select("i").as[Option[Double]].collect().toSeq
    // reference semantics (gapfill-16.out:1784 "interpolate with NULL
    // values"): injected rows interpolate from the SURROUNDING REAL rows'
    // values verbatim — the real NULL at t=3 is an anchor whose NULL
    // poisons the line on both sides; the 0→5 line is never drawn across it
    assert(got === Seq(Some(1.0), None, None, None, None, Some(6.0)))
  }

  test("multiple groups are filled independently") {
    val two = agg.union(Seq(("b", Timestamp.valueOf("2024-01-01 02:00:00"), 9.0)).toDF)
    val filled = Gapfill.gapfill(two, "bucket", Seq("g"), start, finish, "1 hour")
    assert(filled.count() === 12)
    assert(filled.where($"g" === "b" && $"v".isNotNull).count() === 1)
  }

  test("gapfillTz spans a DST transition with one uneven-instant bucket per local day") {
    import graft.{functions => gf}
    val tz = "America/New_York"
    // one observation either side of the 2024-03-10 spring-forward
    val data = Seq(
      ("a", Timestamp.valueOf("2024-03-08 17:00:00"), 1.0),  // NY 12:00 Mar 8
      ("a", Timestamp.valueOf("2024-03-12 16:00:00"), 5.0))  // NY 12:00 Mar 12
      .toDF("g", "ts", "v")
    val agg = data.groupBy(gf.time_bucket_tz("1 day", $"ts", tz).as("day"), $"g")
      .agg(min($"v").as("v"))
    val ls = Timestamp.valueOf("2024-03-08 00:00:00").getTime * 1000L
    val lf = Timestamp.valueOf("2024-03-13 00:00:00").getTime * 1000L
    val filled = Gapfill.gapfillTz(agg, "day", Seq("g"), ls, lf, "1 day", tz)
      .withColumn("locf", Gapfill.locf($"v", Seq("g"), "day"))
      .orderBy("day")
    val rows = filled.select(unix_micros($"day"), $"locf").collect()
    assert(rows.length === 5) // Mar 8..12 local days, exactly once each
    // instants: Mar 8-10 midnights are EST (05:00 UTC — the transition is
    // at 02:00 local on Mar 10), Mar 11/12 are EDT (04:00 UTC): Mar 10 is
    // the 23-hour local day
    val us = rows.map(_.getLong(0))
    val day = 86400000000L
    assert(us(1) - us(0) === day)           // Mar 8 → Mar 9: 24 h
    assert(us(2) - us(1) === day)           // Mar 9 → Mar 10: 24 h
    assert(us(3) - us(2) === day - 3600000000L) // Mar 10 → Mar 11: 23 h
    assert(us(4) - us(3) === day)           // Mar 11 → Mar 12: 24 h
    // locf carries across the transition
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.0, 1.0, 1.0, 1.0, 5.0))
  }
}
