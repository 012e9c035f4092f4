package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.TimeBucketUtil
import graft.operators.Gapfill
import graft.{functions => gf}

/** Seeded differential fuzzing of the scalar/operator surfaces whose graft
  * implementation is a CUSTOM path (Catalyst expressions, the single-pass
  * gapfill formulation, min_by/max_by operators) against an INDEPENDENT
  * naive formulation of the reference semantics — exact integer alignment
  * arithmetic for `time_bucket` (`ts_timestamp_bucket`, src/time_bucket.c),
  * calendar arithmetic for month buckets, window-function oracles for
  * bookends/DISTINCT ON, and the spine-cross-join+left-join design the
  * gapfill scaladoc rejects for scale (but which is trivially correct) for
  * the gapfill family. ~220 generated configurations per run; every case
  * reproduces from the fixed seed and prints its config on failure. The
  * reference's net here is 300+ regress scripts; this sweeps the parameter
  * space those scripts spot-check.
  *
  * Scalar families stack many configurations into ONE job each (a row-wise
  * mismatch predicate OR'd over configs), so the suite stays in CI budget.
  */
class DifferentialFuzzSpec extends AnyFunSuite {
  lazy val spark = Graft.session("diff-fuzz-spec", "local[4]", 4)

  private lazy val events = Tables
    .table(spark, "/root/testdata/sf0.001", "events")
    .select("event_id", "ts", "user_id", "event_type", "value")
    .cache()
  // unique-ts variant: bookend/DISTINCT ON ties are unspecified in the
  // reference too, so the differential only runs where ties cannot occur
  private lazy val uniqueTs = events.dropDuplicates("ts").cache()

  private def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L

  /** Exact long floor-alignment: largest o + k*w <= t (no doubles — a
    * double division could misplace boundary values and fail spuriously).
    */
  private def floorAlign(t: Column, o: Long, w: Long): Column = {
    val d = t - lit(o)
    lit(o) + (d - ((d % lit(w)) + lit(w)) % lit(w))
  }

  private val SEED = 20260815L

  /** Run stacked per-row scalar configs in one pass; on mismatch, re-check
    * one-by-one to name the culprits.
    */
  private def assertRowwise(df: DataFrame,
      cases: Seq[(String, Column, Column)]): Unit = {
    val anyBad = cases.map { case (_, a, b) =>
      !(a <=> b) // null-safe: both-null is agreement
    }.reduce(_ || _)
    if (df.where(anyBad).limit(1).count() > 0) {
      val bad = cases.filter { case (_, a, b) =>
        df.where(!(a <=> b)).limit(1).count() > 0 }
      val detail = bad.take(3).map { case (label, a, b) =>
        val r = df.where(!(a <=> b))
          .select(col("ts"), a.as("graft"), b.as("oracle")).head()
        s"$label: ts=${r.get(0)} graft=${r.get(1)} oracle=${r.get(2)}"
      }
      fail(s"[seed=$SEED] ${bad.size} diverging configs: " +
        bad.map(_._1).mkString(", ") + "\n" + detail.mkString("\n"))
    }
  }

  test("time_bucket fixed widths: default origin, explicit origin, and " +
    "offset forms match exact integer alignment (60 configs)") {
    val rnd = new scala.util.Random(SEED)
    val t = unix_micros(col("ts"))
    val o0 = TimeBucketUtil.DEFAULT_ORIGIN_MICROS
    def randWidthUs(): Long = rnd.nextInt(5) match {
      case 0 => (1 + rnd.nextInt(120)).toLong * 1000000L            // seconds
      case 1 => (1 + rnd.nextInt(600)).toLong * 60L * 1000000L      // minutes
      case 2 => (1 + rnd.nextInt(72)).toLong * 3600L * 1000000L     // hours
      case 3 => (1 + rnd.nextInt(45)).toLong * 86400L * 1000000L    // days
      case _ => 1L + math.abs(rnd.nextLong()) % (10L * 86400L * 1000000L)
    }
    def w2s(w: Long): String = s"$w microseconds"
    val defaults = (1 to 20).map { i =>
      val w = randWidthUs()
      (s"default#$i w=${w}us",
        gf.time_bucket(w2s(w), col("ts")),
        timestamp_micros(floorAlign(t, o0, w)))
    }
    val origins = (1 to 20).map { i =>
      val w = randWidthUs()
      // any alignment point, incl. ones after the data (negative deltas)
      val og = us("2019-01-01 00:00:00") +
        math.abs(rnd.nextLong()) % (6L * 365 * 86400L * 1000000L)
      (s"origin#$i w=${w}us o=$og",
        gf.time_bucket(w2s(w), col("ts"), timestamp_micros(lit(og))),
        timestamp_micros(floorAlign(t, og, w)))
    }
    val offsets = (1 to 20).map { i =>
      val w = randWidthUs()
      val off = math.abs(rnd.nextLong()) % (2 * w) // may exceed the width
      // reference: time_bucket(w, ts, offset) = time_bucket(w, ts-off)+off
      (s"offset#$i w=${w}us off=$off",
        gf.time_bucket(w2s(w), col("ts"), expr(s"INTERVAL '$off' MICROSECOND")),
        timestamp_micros(floorAlign(t - lit(off), o0, w) + lit(off)))
    }
    assertRowwise(events, defaults ++ origins ++ offsets)
  }

  test("time_bucket integer widths over positive AND negative values match " +
    "floor division (40 configs)") {
    val rnd = new scala.util.Random(SEED + 1)
    // shifted so roughly half the values are negative (int time has no
    // epoch; the reference floor-aligns toward -inf, origin 0)
    val mid = us("2024-01-15 00:00:00")
    val v = (unix_micros(col("ts")) - lit(mid)).as("v")
    val cases = (1 to 40).map { i =>
      val w = 1L + math.abs(rnd.nextLong()) % (rnd.nextInt(3) match {
        case 0 => 1000L
        case 1 => 1000000000L
        case _ => 100L * 86400L * 1000000L
      })
      (s"int#$i w=$w", gf.time_bucket(lit(w), v), floorAlign(v, 0L, w))
    }
    assertRowwise(events, cases)
  }

  test("time_bucket month widths match independent calendar arithmetic " +
    "(20 configs)") {
    val rnd = new scala.util.Random(SEED + 2)
    // months since 2000-01 (the reference's month-bucket origin 2000-01-01,
    // ts_time_bucket): pure int calendar math, independent of the
    // expression's addMonths path
    val m = (year(col("ts")) * 12 + month(col("ts")) - 1) - lit(2000 * 12)
    val cases = (1 to 20).map { i =>
      val n = 1 + rnd.nextInt(30)
      val bm = m - ((m % n) + n) % n
      (s"months#$i n=$n",
        gf.time_bucket(s"$n months", col("ts")),
        make_timestamp(lit(2000) + (bm / 12).cast("int"),
          (bm % 12).cast("int") + 1, lit(1), lit(0), lit(0), lit(0)))
    }
    assertRowwise(events, cases)
  }

  test("first/last bookends match a window-function oracle on tie-free " +
    "groups (16 queries)") {
    val rnd = new scala.util.Random(SEED + 3)
    (1 to 16).foreach { i =>
      val grpDay = rnd.nextBoolean()
      val keys: Seq[Column] =
        if (grpDay) Seq(col("event_type"), date_trunc("day", col("ts")).as("d"))
        else Seq(col("event_type"))
      val keyNames = if (grpDay) Seq("event_type", "d") else Seq("event_type")
      val d0 = rnd.nextInt(25); val len = 1 + rnd.nextInt(6)
      val lo = us("2024-01-01 00:00:00") + d0 * 86400000000L
      val hi = lo + len * 86400000000L
      val base = uniqueTs.where(
        col("ts") >= timestamp_micros(lit(lo)) && col("ts") < timestamp_micros(lit(hi)))
      val got = base.groupBy(keys: _*)
        .agg(gf.first(col("value"), col("ts")).as("f"),
          gf.last(col("value"), col("ts")).as("l"))
      val w = Window.partitionBy(keys: _*).orderBy(col("ts"))
      val exp = base
        .withColumn("rna", row_number().over(w))
        .withColumn("rnd_", row_number().over(
          Window.partitionBy(keys: _*).orderBy(col("ts").desc)))
        .groupBy(keys: _*)
        .agg(max(when(col("rna") === 1, col("value"))).as("f"),
          max(when(col("rnd_") === 1, col("value"))).as("l"))
      val cols = keyNames :+ "f" :+ "l"
      assert(got.select(cols.map(col): _*).collect().toSet ===
        exp.select(cols.map(col): _*).collect().toSet,
        s"[seed=$SEED bookends#$i grpDay=$grpDay d0=$d0 len=$len]")
    }
  }

  test("gapfill + locf match the naive spine-cross-join oracle (16 queries)") {
    val rnd = new scala.util.Random(SEED + 4)
    val o0 = TimeBucketUtil.DEFAULT_ORIGIN_MICROS
    (1 to 16).foreach { i =>
      val wUs = Seq(900000000L, 3600000000L, 7200000000L, 21600000000L,
        86400000000L)(rnd.nextInt(5))
      val width = s"$wUs microseconds"
      // deliberately unaligned window edges: starts mid-bucket half the time
      val start = us("2024-01-01 00:00:00") +
        rnd.nextInt(20) * 86400000000L + (if (rnd.nextBoolean()) 0L else 5400000000L)
      val finish = start + (1 + rnd.nextInt(7)) * 86400000000L
      val ev = events.where(col("ts") >= timestamp_micros(lit(start)) &&
        col("ts") < timestamp_micros(lit(finish)))
      val agg = ev.groupBy(gf.time_bucket(width, col("ts")).as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"))
      val got = Gapfill.gapfill(agg, "bucket", Seq("event_type"),
          start, finish, width)
        .withColumn("locf_v", Gapfill.locf(col("min_value"), Seq("event_type"), "bucket"))
        .select("event_type", "bucket", "n", "locf_v")
      // oracle: distinct groups x full bucket spine, left-joined, locf via
      // a running last(ignoreNulls) window (no genuine NULLs in min_value,
      // so fill-only semantics coincide)
      val ts0 = {
        val d = start - o0; o0 + (d - ((d % wUs) + wUs) % wUs)
      }
      val spine = agg.select("event_type").distinct()
        .crossJoin(spark.range(ts0, finish, wUs)
          .select(timestamp_micros(col("id")).as("bucket")))
      val exp = spine.join(agg, Seq("event_type", "bucket"), "left")
        .withColumn("locf_v", last(col("min_value"), ignoreNulls = true).over(
          Window.partitionBy(col("event_type")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("event_type", "bucket", "n", "locf_v")
      assert(got.collect().toSet === exp.collect().toSet,
        s"[seed=$SEED gapfill#$i w=$wUs start=$start finish=$finish]")
    }
  }

  test("DISTINCT ON matches a window row_number oracle on tie-free data " +
    "(8 queries)") {
    val rnd = new scala.util.Random(SEED + 5)
    (1 to 8).foreach { i =>
      val keys = Seq(Seq("event_type"), Seq("user_id"),
        Seq("event_type", "user_id"))(rnd.nextInt(3))
      val latest = rnd.nextBoolean()
      val d0 = rnd.nextInt(20); val len = 3 + rnd.nextInt(8)
      val lo = us("2024-01-01 00:00:00") + d0 * 86400000000L
      val hi = lo + len * 86400000000L
      val base = uniqueTs.where(col("ts") >= timestamp_micros(lit(lo)) &&
        col("ts") < timestamp_micros(lit(hi)))
      val got = graft.operators.DistinctOn.distinctOn(
        base, keys, "ts", Seq("event_id", "value"), latest = latest)
      val ord = if (latest) col("ts").desc else col("ts").asc
      val w = Window.partitionBy(keys.map(col): _*).orderBy(ord)
      val exp = base.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn")
        .select(got.columns.map(col): _*)
      assert(got.collect().toSet === exp.collect().toSet,
        s"[seed=$SEED distinctOn#$i keys=$keys latest=$latest]")
    }
  }

  test("as-of join matches a naive greatest-rt-per-left-row oracle, and the " +
    "skew-blocked path matches the plain path (10 configs)") {
    val rnd = new scala.util.Random(SEED + 6)
    (1 to 10).foreach { i =>
      val keys = Seq(Seq("event_type"), Seq("user_id"))(rnd.nextInt(2))
      val tol = if (rnd.nextBoolean()) None
        else Some((1L + rnd.nextInt(48)) * 3600000000L)
      val blockUs = (1L + rnd.nextInt(96)) * 3600000000L
      val lo = us("2024-01-01 00:00:00") + rnd.nextInt(15) * 86400000000L
      val mid = lo + (2 + rnd.nextInt(5)) * 86400000000L
      val hi = mid + (2 + rnd.nextInt(5)) * 86400000000L
      // left rows in [mid, hi), right history in [lo, hi): matches span the
      // windows' overlap AND reach back before the left window's start
      val left = uniqueTs.where(col("ts") >= timestamp_micros(lit(mid)) &&
        col("ts") < timestamp_micros(lit(hi)))
        .select("event_id", "ts", "event_type", "user_id")
      val right = uniqueTs.where(col("ts") >= timestamp_micros(lit(lo)) &&
        col("ts") < timestamp_micros(lit(hi)) && pmod(col("event_id"), lit(3)) === 0)
        .select((keys.map(col) :+ col("ts") :+ col("value")): _*)
      val got = graft.operators.Joins.asOf(left, right, keys,
          "ts", "ts", Seq("value"), toleranceMicros = tol)
        .select(col("event_id"), col("value_asof"), col("ts_matched"))
      // the skew-blocked formulation claims identical results — hold it to
      // that with a random block width
      val gotBlocked = graft.operators.Joins.asOf(left, right, keys,
          "ts", "ts", Seq("value"), toleranceMicros = tol,
          skewBlockMicros = Some(blockUs))
        .select(col("event_id"), col("value_asof"), col("ts_matched"))
      // naive oracle: inner-join every candidate (rt <= lt), keep the
      // greatest rt per left row, gate the VALUE (not the matched time) on
      // tolerance — unique right ts per key makes the argmax tie-free
      val r2 = right.select((keys.map(col) :+ col("ts").as("_rts") :+
        col("value").as("_rv")): _*)
      val best = left.join(r2, keys)
        .where(col("_rts") <= col("ts"))
        .groupBy(col("event_id").as("_lid"))
        .agg(max(struct(col("_rts"), col("_rv"))).as("_b"))
      val exp = left.join(best, col("event_id") === col("_lid"), "left")
        .withColumn("value_asof", tol match {
          case Some(t) => when(
            unix_micros(col("ts")) - unix_micros(col("_b")("_rts")) <= t,
            col("_b")("_rv"))
          case None => col("_b")("_rv")
        })
        .select(col("event_id"), col("value_asof"),
          col("_b")("_rts").as("ts_matched"))
      val label = s"[seed=$SEED asof#$i keys=$keys tol=$tol block=$blockUs]"
      assert(got.collect().toSet === exp.collect().toSet, s"$label vs oracle")
      assert(gotBlocked.collect().toSet === got.collect().toSet,
        s"$label blocked-vs-plain")
    }
  }

  test("range join matches a naive non-equi-join oracle across bucket " +
    "widths, including empty and inverted intervals (8 configs)") {
    val rnd = new scala.util.Random(SEED + 8)
    (1 to 8).foreach { i =>
      val lo = us("2024-01-01 00:00:00") + rnd.nextInt(15) * 86400000000L
      val hi = lo + (2 + rnd.nextInt(5)) * 86400000000L
      val left = uniqueTs.where(col("ts") >= timestamp_micros(lit(lo)) &&
        col("ts") < timestamp_micros(lit(hi)))
        .select("event_id", "ts", "event_type")
      // right intervals from a disjoint event sample: deterministic
      // per-row durations spanning −2 h (inverted) .. 0 (empty) .. 94 h —
      // the engine must both EXCLUDE the degenerate intervals (its
      // sequence-explosion guard) and match the long ones regardless of
      // the bucket width chosen
      val dur = (pmod(col("_rid"), lit(97)) - lit(2)) * lit(3600000000L)
      val right = uniqueTs.where(col("ts") >= timestamp_micros(lit(lo)) &&
        col("ts") < timestamp_micros(lit(hi)) &&
        pmod(col("event_id"), lit(4)) === 0)
        .select(col("event_type"), col("event_id").as("_rid"),
          col("ts").as("_rs"))
        .withColumn("_re",
          timestamp_micros(unix_micros(col("_rs")) + dur))
      // bucket width 1 h .. 7 days: both shorter AND longer than the
      // interval lengths — the blocking is an equi-join rewrite, not an
      // approximation, so the answer must be width-invariant
      val wUs = (1L + rnd.nextInt(168)) * 3600000000L
      val got = graft.operators.Joins.rangeJoin(left, right,
          Seq("event_type"), "ts", "_rs", "_re", wUs)
        .select("event_id", "_rid")
      val exp = left.join(right, Seq("event_type"))
        .where(col("ts") >= col("_rs") && col("ts") < col("_re"))
        .select("event_id", "_rid")
      assert(got.collect().toSet === exp.collect().toSet,
        s"[seed=$SEED rangejoin#$i w=$wUs lo=$lo hi=$hi]")
    }
  }

  test("timezone gapfill matches a java.time spine oracle across DST " +
    "transitions (6 configs incl. a 30-minute-shift zone)") {
    // The engine buckets in local-naive space (fixed-width there) and
    // converts back; the oracle enumerates local midnights with
    // java.time calendar arithmetic, converts each to an instant via
    // the zone rules, and assigns rows by INSTANT-range containment —
    // structurally independent of from/to_utc_timestamp. Windows are
    // chosen to straddle real transitions: US spring-forward and
    // fall-back, EU spring-forward, a no-DST zone with a :30 offset,
    // and Lord Howe Island's 30-MINUTE DST shift in both directions.
    import java.time.{LocalDateTime, ZoneId}
    import spark.implicits._
    val cases = Seq(
      // (tz, data shift days, local window start, days)
      ("America/New_York", 60, "2024-03-07T00:00", 7),   // Mar 10 spring fwd
      ("America/New_York", 280, "2024-10-31T00:00", 7),  // Nov 3 fall back
      ("Europe/Berlin", 60, "2024-03-27T00:00", 6),      // Mar 31 spring fwd
      ("Asia/Kolkata", 0, "2024-01-05T00:00", 7),        // no DST, :30 offset
      ("Australia/Lord_Howe", 280, "2024-10-03T00:00", 7), // Oct 6 +30 min
      ("Australia/Lord_Howe", 90, "2024-04-04T00:00", 7))  // Apr 7 -30 min
    cases.zipWithIndex.foreach { case ((tz, shift, startS, days), i) =>
      val zone = ZoneId.of(tz)
      val startLdt = LocalDateTime.parse(startS)
      val lsUs = startLdt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
      val lfUs = startLdt.plusDays(days)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
      val ev = events
        .withColumn("ts2", col("ts") + expr(s"INTERVAL $shift DAYS"))
        .where(col("value") > 200)
      val agg = ev.groupBy(
          gf.time_bucket_tz("1 day", col("ts2"), tz).as("b"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val got = Gapfill.gapfillTz(agg, "b", Seq("event_type"),
          lsUs, lfUs, "1 day", tz)
        .select("event_type", "b", "n")
      val locals = Iterator.iterate(startLdt)(_.plusDays(1))
        .takeWhile(_.isBefore(startLdt.plusDays(days))).toSeq
      val spine = locals.map { l =>
        (java.sql.Timestamp.from(l.atZone(zone).toInstant),
         java.sql.Timestamp.from(l.atZone(zone).toInstant),
         java.sql.Timestamp.from(l.plusDays(1).atZone(zone).toInstant))
      }.toDF("b", "lo", "hi")
      val expAgg = ev.join(spine,
          col("ts2") >= col("lo") && col("ts2") < col("hi"))
        .groupBy("b", "event_type").agg(count(lit(1)).as("n"))
      val exp = agg.select("event_type").distinct()
        .crossJoin(spine.select("b"))
        .join(expAgg, Seq("event_type", "b"), "left")
        .select("event_type", "b", "n")
      // restrict the engine output to the oracle's window instants (the
      // engine also keeps out-of-window REAL rows; the spine rows are
      // what the DST arithmetic must get right)
      val spineSet = locals
        .map(l => java.sql.Timestamp.from(l.atZone(zone).toInstant)).toSet
      val gotRows = got.collect().filter(r => spineSet(r.getTimestamp(1))).toSet
      assert(gotRows === exp.collect().toSet,
        s"[tzgapfill#$i tz=$tz start=$startS]")
    }
  }

  test("interpolate matches an array-scan lerp oracle on double aggregates " +
    "(10 queries)") {
    val rnd = new scala.util.Random(SEED + 7)
    (1 to 10).foreach { i =>
      val wUs = Seq(1800000000L, 3600000000L, 10800000000L,
        86400000000L)(rnd.nextInt(4))
      val width = s"$wUs microseconds"
      val start = us("2024-01-01 00:00:00") + rnd.nextInt(20) * 86400000000L
      val finish = start + (2 + rnd.nextInt(6)) * 86400000000L
      val ev = events.where(col("ts") >= timestamp_micros(lit(start)) &&
        col("ts") < timestamp_micros(lit(finish)) &&
        // keep ~40% of rows so the spine has real gaps to interpolate
        pmod(col("event_id"), lit(5)) < 2)
      val agg = ev.groupBy(gf.time_bucket(width, col("ts")).as("bucket"),
          col("event_type"))
        .agg(avg(col("value")).as("v"))
      val filled = Gapfill.gapfill(agg, "bucket", Seq("event_type"),
        start, finish, width)
      // oracle: per group, the sorted array of REAL (x, y) points; prev =
      // greatest point at/before x, next = least point after x; plain lerp
      // in doubles — an array scan, structurally independent of the
      // engine's running-window formulation
      val x = unix_micros(col("bucket"))
      val wAll = Window.partitionBy(col("event_type"))
      val both = filled
        .withColumn("_giv",
          Gapfill.interpolate(col("v"), Seq("event_type"), "bucket"))
        .withColumn("_x", x)
        .withColumn("_reals", sort_array(collect_list(
          when(!col(Gapfill.FILLED),
            struct(x.as("x"), col("v").as("y")))).over(wAll)))
        .withColumn("_p", array_max(expr(
          "filter(_reals, p -> p.x <= _x)")))
        .withColumn("_n", array_min(expr(
          "filter(_reals, p -> p.x > _x)")))
        .withColumn("_oiv", when(!col(Gapfill.FILLED), col("v"))
          .otherwise(
            col("_p")("y") + (col("_x") - col("_p")("x")).cast("double") /
              (col("_n")("x") - col("_p")("x")).cast("double") *
              (col("_n")("y") - col("_p")("y"))))
      val agree = (col("_giv") <=> col("_oiv")) ||
        coalesce(abs(col("_giv") - col("_oiv")) <=
          lit(1e-9) * greatest(lit(1.0), abs(col("_oiv"))), lit(false))
      val bad = both.where(!agree)
        .select("event_type", "bucket", "_giv", "_oiv").limit(3).collect()
      assert(bad.isEmpty,
        s"[seed=$SEED interp#$i w=$wUs start=$start] diverged: " +
          bad.mkString("; "))
    }
  }
}
