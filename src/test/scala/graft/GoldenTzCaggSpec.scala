package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}

/** Port of the reference's timezone-cagg golden scenario
  * (`tsl/test/expected/cagg_exp_timezone.out`): Moscow/Berlin temperature
  * readings at MSK midnights, a monthly MSK-bucketed cagg and a
  * Saturday-anchored weekly cagg, driven through the same refresh /
  * late-data steps with the golden's exact result matrices.
  *
  * MSK is UTC+3 with no DST, so the reference's Saturday-origin weekly
  * bucket is expressed as an origin-anchored fixed-width cagg (identical
  * semantics at a fixed offset).
  */
class GoldenTzCaggSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-tz-cagg-spec", "local[4]", 4)
  import spark.implicits._

  private val MSK_US = 3L * 3600000000L
  /** MSK wall-clock string → UTC instant micros. */
  private def msk(s: String): Long = Timestamp.valueOf(s).getTime * 1000L - MSK_US

  private def rows(cityTemps: (String, String, Int)*) =
    cityTemps.toSeq.map { case (day, city, t) =>
      (new Timestamp(msk(day) / 1000), city, t)
    }.toDF("day", "city", "temperature")

  private def matSet(c: ContinuousAggregate) = c.materialized
    .select(unix_micros($"bucket"), $"city", $"min", $"max")
    .as[(Long, String, Int, Int)].collect().toSet

  test("cagg_exp_timezone.out: monthly MSK + Saturday-week caggs through " +
      "refresh, threshold, and late-data repair") {
    val dir = Files.createTempDirectory("graft_golden_tz").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "day", chunkWidth = "7 days")
    // June data (the golden's first INSERT): MSK midnights 06-14..06-27
    val juneTemps = Seq(26, 22, 24, 24, 27, 28, 30, 31, 34, 34, 34, 32, 32, 31)
    ht.write(rows(juneTemps.zipWithIndex.map { case (t, i) =>
      (f"2021-06-${14 + i}%02d 00:00:00", "Moscow", t)
    }: _*))

    val monthly = ContinuousAggregate.create(spark, s"$dir/monthly", ht,
      CaggDef("1 month", Seq("city"),
        Seq(min($"temperature").as("min"), max($"temperature").as("max")),
        bucketTz = Some("Europe/Moscow")))
    // reference time_bucket_ng weeks anchor on Saturday; at a fixed-offset
    // zone that is an origin-anchored 7-day bucket (2021-06-12 is Saturday)
    val weekly = ContinuousAggregate.create(spark, s"$dir/weekly", ht,
      CaggDef("7 days", Seq("city"),
        Seq(min($"temperature").as("min"), max($"temperature").as("max")),
        bucketOriginMicros = Some(msk("2021-06-12 00:00:00"))))

    // "refresh window too small": windows inscribing to zero whole buckets
    intercept[IllegalArgumentException] {
      monthly.refresh(msk("2021-07-02 00:00:00"), msk("2021-07-12 00:00:00"))
    }
    intercept[IllegalArgumentException] {
      weekly.refresh(msk("2021-07-02 00:00:00"), msk("2021-07-05 00:00:00"))
    }

    // June refresh → exactly the golden's single row (min 22, max 34)
    monthly.refresh(msk("2021-06-01 00:00:00"), msk("2021-07-01 00:00:00"))
    assert(matSet(monthly) === Set((msk("2021-06-01 00:00:00"), "Moscow", 22, 34)))
    assert(monthly.invalidationThreshold === msk("2021-07-01 00:00:00"))

    // two whole Saturday weeks → golden rows (06-12: 22/27, 06-19: 28/34)
    weekly.refresh(msk("2021-06-12 00:00:00"), msk("2021-06-26 00:00:00"))
    assert(matSet(weekly) === Set(
      (msk("2021-06-12 00:00:00"), "Moscow", 22, 27),
      (msk("2021-06-19 00:00:00"), "Moscow", 28, 34)))

    // July/August data (3-day cadence; row_number per city like the golden)
    val julAug = (0 until 21).flatMap { i =>
      val day = java.time.LocalDate.of(2021, 7, 1).plusDays(i * 3L)
      Seq((s"$day 00:00:00", "Moscow", i + 1), (s"$day 00:00:00", "Berlin", i + 22))
    }
    ht.write(rows(julAug: _*))
    // above the threshold: nothing invalidated, June row untouched
    assert(matSet(monthly) === Set((msk("2021-06-01 00:00:00"), "Moscow", 22, 34)))

    // refresh [06-15, 09-15) inscribes to whole buckets [07-01, 09-01)
    monthly.refresh(msk("2021-06-15 00:00:00"), msk("2021-09-15 00:00:00"))
    val afterAug = Set(
      (msk("2021-06-01 00:00:00"), "Moscow", 22, 34),
      (msk("2021-07-01 00:00:00"), "Berlin", 22, 32),
      (msk("2021-07-01 00:00:00"), "Moscow", 1, 11),
      (msk("2021-08-01 00:00:00"), "Berlin", 33, 42),
      (msk("2021-08-01 00:00:00"), "Moscow", 12, 21))
    assert(matSet(monthly) === afterAug)
    assert(monthly.invalidationThreshold === msk("2021-09-01 00:00:00"))

    // late inserts BELOW the threshold (±100 rows on 08-16..08-30) must be
    // logged and repaired by the next invalidation pass — golden matrix 2
    val late = (16 to 30).flatMap { d =>
      Seq((f"2021-08-$d%02d 00:00:00", "Moscow", -100),
        (f"2021-08-$d%02d 00:00:00", "Berlin", 100))
    }
    ht.write(rows(late: _*))
    monthly.refreshInvalidated()
    assert(matSet(monthly) === (afterAug -
      ((msk("2021-08-01 00:00:00"), "Berlin", 33, 42)) -
      ((msk("2021-08-01 00:00:00"), "Moscow", 12, 21)) +
      ((msk("2021-08-01 00:00:00"), "Berlin", 33, 100)) +
      ((msk("2021-08-01 00:00:00"), "Moscow", -100, 21))))

    // October data above the threshold + explicit refresh — golden matrix 3
    ht.write(rows((1 to 4).flatMap { d =>
      Seq((s"2021-10-0$d 00:00:00", "Moscow", d), (s"2021-10-0$d 00:00:00", "Berlin", d + 4))
    }: _*))
    monthly.refresh(msk("2021-10-01 00:00:00"), msk("2021-11-01 00:00:00"))
    assert(matSet(monthly) === (afterAug -
      ((msk("2021-08-01 00:00:00"), "Berlin", 33, 42)) -
      ((msk("2021-08-01 00:00:00"), "Moscow", 12, 21)) +
      ((msk("2021-08-01 00:00:00"), "Berlin", 33, 100)) +
      ((msk("2021-08-01 00:00:00"), "Moscow", -100, 21)) +
      ((msk("2021-10-01 00:00:00"), "Berlin", 5, 8)) +
      ((msk("2021-10-01 00:00:00"), "Moscow", 1, 4))))
  }
}
