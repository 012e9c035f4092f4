package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{NormalizeText, TimeBucketUtil}

/** Property tests for the arithmetic kernels (SURVEY §5b: "property-test
  * time_bucket — ∀ts: bucket ≤ ts < bucket+width; origin/offset/month
  * laws"). These run on the JVM kernels directly (the same code the
  * Catalyst expressions call), so thousands of cases cost milliseconds.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a scalacheck property (500 cases) and surface any falsification
    * as a test failure (scalatestplus is not in the offline dep set).
    */
  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Boolean): Unit =
    check(Prop.forAll(ga, gb)(f))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Boolean): Unit =
    check(Prop.forAll(ga, gb, gc)(f))

  private def forAll[A](ga: Gen[A])(f: A => Boolean): Unit =
    check(Prop.forAll(ga)(f))

  // ±about 250 years around the epoch, in micros — covers negative
  // timestamps (pre-1970), the reference's explicit edge case
  private val tsGen = Gen.chooseNum(-8L * 1000000000000000L, 8L * 1000000000000000L)
  private val widthGen = Gen.oneOf(1000000L, 60000000L, 3600000000L,
    86400000000L, 7L * 86400000000L, 777777L)

  test("time_bucket: bucket ≤ ts < bucket + width, and idempotent") {
    forAll(tsGen, widthGen) { (ts: Long, w: Long) =>
      val b = TimeBucketUtil.bucketMicros(ts, w, TimeBucketUtil.SENTINEL)
      b <= ts && ts < b + w &&
        TimeBucketUtil.bucketMicros(b, w, TimeBucketUtil.SENTINEL) == b
    }
  }

  test("time_bucket: all timestamps in [bucket, bucket+width) map to it") {
    forAll(tsGen, widthGen, Gen.chooseNum(0L, Long.MaxValue)) { (ts: Long, w: Long, r: Long) =>
      val b = TimeBucketUtil.bucketMicros(ts, w, TimeBucketUtil.SENTINEL)
      val other = b + (r % w)
      TimeBucketUtil.bucketMicros(other, w, TimeBucketUtil.SENTINEL) == b
    }
  }

  test("time_bucket with origin: shifting origin by k·width changes nothing") {
    forAll(tsGen, widthGen, Gen.chooseNum(-1000L, 1000L)) { (ts: Long, w: Long, k: Long) =>
      val origin = 1704067200000000L
      TimeBucketUtil.bucketMicros(ts, w, origin) ==
        TimeBucketUtil.bucketMicros(ts, w, origin + k * w)
    }
  }

  test("month buckets: floor to a month start at or before ts, width months") {
    val monthsGen = Gen.oneOf(1, 2, 3, 6, 12)
    forAll(tsGen, monthsGen) { (ts: Long, m: Int) =>
      val b = TimeBucketUtil.bucketMonthsMicros(ts, m, TimeBucketUtil.SENTINEL)
      val next = TimeBucketUtil.addMonthsMicros(b, m)
      b <= ts && ts < next &&
        TimeBucketUtil.bucketMonthsMicros(b, m, TimeBucketUtil.SENTINEL) == b
    }
  }

  test("normalize_text: idempotent, trimmed, single-spaced, lowercase") {
    val textGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const("  "), Gen.const("\t"), Gen.const("\n"),
      Gen.const("Éé"), Gen.const("MIXED Case"))).map(_.mkString)
    forAll(textGen) { t: String =>
      val n = NormalizeText.normalize(t)
      NormalizeText.normalize(n) == n && n == n.trim &&
        !n.contains("  ") && !n.contains("\t") && !n.contains("\n") &&
        n == n.toLowerCase
    }
  }
}
