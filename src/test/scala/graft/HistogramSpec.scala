package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{functions => gf}

/** Golden cases ported from the reference's histogram test
  * (`test/expected/histogram.out`): under/overflow buckets, boundary
  * values, grouped histograms.
  */
class HistogramSpec extends AnyFunSuite {
  lazy val spark = Graft.session("histogram-spec", "local[4]", 4)
  import spark.implicits._

  // hitest1 (histogram.out:5-16): (key, val)
  private def hitest1 = Seq(
    (0f, "hi"), (1f, "sup"), (2f, "hello"), (3f, "yo"), (4f, "howdy"),
    (5f, "hola"), (6f, "ya"), (1f, "sup"), (2f, "hello"), (1f, "sup"))
    .toDF("key", "val")

  // hitest2 (histogram.out:18-24): (name, score, qualify)
  private def hitest2 = Seq(
    ("Tom", 6, true), ("Mary", 4, false), ("Jaq", 3, false), ("Jane", 10, true))
    .toDF("name", "score", "qualify")

  private def hist(df: org.apache.spark.sql.DataFrame, col: String,
      min: Double, max: Double, n: Int): Seq[Long] =
    df.agg(gf.histogram(org.apache.spark.sql.functions.col(col), min, max, n)
      .as("h")).head().getSeq[Long](0)

  test("ungrouped goldens: standard, beneath-lb, above-ub, single-bucket") {
    assert(hist(hitest1, "key", 0, 9, 2) === Seq(0L, 8L, 2L, 0L)) // :25-29
    assert(hist(hitest1, "key", 0, 9, 5) === Seq(0L, 4L, 3L, 2L, 1L, 0L, 0L)) // :31-35
    assert(hist(hitest1, "key", 1, 7, 3) === Seq(1L, 5L, 2L, 2L, 0L)) // :49-53
    assert(hist(hitest1, "key", 0, 3, 3) === Seq(0L, 1L, 3L, 2L, 4L)) // :55-59
    assert(hist(hitest1, "key", 1, 3, 2) === Seq(1L, 3L, 2L, 4L)) // :61-65
    assert(hist(hitest1, "key", 1, 3, 1) === Seq(1L, 5L, 4L)) // :67-71
  }

  test("grouped goldens match histogram.out:37-47 and :73-85") {
    val byVal = hitest1.groupBy("val")
      .agg(gf.histogram($"key", 0, 7, 3).as("h"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(byVal("hello") === Seq(0L, 2L, 0L, 0L, 0L))
    assert(byVal("hi") === Seq(0L, 1L, 0L, 0L, 0L))
    assert(byVal("hola") === Seq(0L, 0L, 0L, 1L, 0L))
    assert(byVal("howdy") === Seq(0L, 0L, 1L, 0L, 0L))
    assert(byVal("sup") === Seq(0L, 3L, 0L, 0L, 0L))
    assert(byVal("ya") === Seq(0L, 0L, 0L, 1L, 0L))
    assert(byVal("yo") === Seq(0L, 0L, 1L, 0L, 0L))

    val byQ = hitest2.groupBy("qualify")
      .agg(gf.histogram($"score", 0, 10, 2).as("h2"),
        gf.histogram($"score", 0, 10, 5).as("h5"))
      .collect().map(r => r.getBoolean(0) -> (r.getSeq[Long](1), r.getSeq[Long](2)))
      .toMap
    assert(byQ(false) === ((Seq(0L, 2L, 0L, 0L), Seq(0L, 0L, 1L, 1L, 0L, 0L, 0L))))
    assert(byQ(true) === ((Seq(0L, 0L, 1L, 1L), Seq(0L, 0L, 0L, 0L, 1L, 0L, 1L))))
  }

  test("a near-infinite range must not crash (histogram.out:100-117)") {
    // the reference only asserts no crash here (its own width_bucket has a
    // NaN bug); with floor-based bucketing every value lands in the first
    // interior bucket and nothing is lost
    val temps = Seq(10.4, 10.3, 10.3, 10.3, 10.3, 10.3, 9.7, 11.7).toDF("t")
    val h = hist(temps, "t", -1.79769e308, 1.79769e308, 10)
    assert(h.length === 12)
    assert(h.sum === 8L)
    assert(h(0) === 0L && h(11) === 0L) // no under/overflow
  }
}
