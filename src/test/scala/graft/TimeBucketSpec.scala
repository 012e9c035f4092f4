package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{functions => gf}

class TimeBucketSpec extends AnyFunSuite {
  lazy val spark = Graft.session("time-bucket-spec", "local[4]", 4)
  import spark.implicits._

  private def tsOf(s: String): Timestamp = Timestamp.valueOf(s)

  private def bucket(width: String, ts: String): Timestamp =
    Seq(tsOf(ts)).toDF("ts")
      .select(gf.time_bucket(width, $"ts").as("b")).as[Timestamp].head()

  test("hour bucket floors to hour") {
    assert(bucket("1 hour", "2020-01-01 00:34:56") === tsOf("2020-01-01 00:00:00"))
  }

  test("PG interval lexing: compound and abbreviated unit forms") {
    import graft.expressions.TimeBucketUtil.pgIntervalText
    assert(pgIntervalText("1week") === "1 week")
    assert(pgIntervalText("30m") === "30 minutes")
    // letter→digit adjacency (PG accepts '1d2h'): both units must isolate
    assert(pgIntervalText("1d2h") === "1 days 2 hours")
    assert(pgIntervalText("2h30m") === "2 hours 30 minutes")
    // already-valid Spark text passes through (modulo token separation)
    assert(pgIntervalText("1 hour") === "1 hour")
    // and the compound form actually buckets: 26-hour width from '1d2h'
    assert(bucket("1d2h", "2000-01-04 03:00:00") === tsOf("2000-01-04 02:00:00"))
  }

  test("15 minute bucket") {
    assert(bucket("15 minutes", "2020-01-01 00:34:56") === tsOf("2020-01-01 00:30:00"))
  }

  test("7 day buckets align to Monday 2000-01-03 origin") {
    // 2020-01-01 is a Wednesday; enclosing Monday is 2019-12-30
    assert(bucket("7 days", "2020-01-01 10:00:00") === tsOf("2019-12-30 00:00:00"))
  }

  test("timestamps before the origin floor correctly (negative delta)") {
    assert(bucket("7 days", "1999-12-31 00:00:00") === tsOf("1999-12-27 00:00:00"))
    assert(bucket("1 day", "1969-07-20 20:17:40") === tsOf("1969-07-20 00:00:00"))
  }

  test("month bucket uses 2000-01-01 origin") {
    assert(bucket("1 month", "2020-02-15 12:00:00") === tsOf("2020-02-01 00:00:00"))
    assert(bucket("3 months", "2020-02-15 12:00:00") === tsOf("2020-01-01 00:00:00"))
    assert(bucket("1 year", "1997-06-01 00:00:00") === tsOf("1997-01-01 00:00:00"))
  }

  test("custom origin") {
    val got = Seq(tsOf("2020-01-01 10:00:00")).toDF("ts")
      .select(gf.time_bucket("7 days", $"ts", lit(tsOf("2000-01-01 00:00:00"))).as("b"))
      .as[Timestamp].head()
    // 2000-01-01 is a Saturday; Saturday <= 2020-01-01 is 2019-12-28
    assert(got === tsOf("2019-12-28 00:00:00"))
  }

  test("interval offset shifts bucket boundaries") {
    val got = Seq(tsOf("2020-01-01 00:34:00")).toDF("ts")
      .select(gf.time_bucket("1 day", $"ts", gf.interval("12 hours")).as("b"))
      .as[Timestamp].head()
    assert(got === tsOf("2019-12-31 12:00:00"))
  }

  test("date input") {
    val got = Seq(Date.valueOf("2020-01-01")).toDF("d")
      .select(gf.time_bucket("7 days", $"d").as("b")).as[Date].head()
    assert(got === Date.valueOf("2019-12-30"))
    val gotM = Seq(Date.valueOf("2020-02-15")).toDF("d")
      .select(gf.time_bucket("1 month", $"d").as("b")).as[Date].head()
    assert(gotM === Date.valueOf("2020-02-01"))
  }

  test("integer time dimension with offset") {
    val df = Seq((-7L), (0L), (13L)).toDF("t")
    val got = df.select(gf.time_bucket(lit(10L), $"t").as("b")).as[Long].collect().toSeq
    assert(got === Seq(-10L, 0L, 10L))
    val gotOff = df.select(gf.time_bucket(lit(10L), $"t", lit(3L)).as("b")).as[Long].collect().toSeq
    assert(gotOff === Seq(-7L, -7L, 13L))
  }

  test("reference error parity (test/sql/timestamp.sql:151-189)") {
    def err(body: => Any): String =
      intercept[Exception](body).getMessage
    def dateBucket(width: String, offset: Option[String] = None) = {
      val d = Seq(Date.valueOf("2012-01-01")).toDF("d")
      val b = offset match {
        case Some(o) => gf.time_bucket(width, $"d", gf.interval(o))
        case None    => gf.time_bucket(width, $"d")
      }
      d.select(b).head()
    }
    // no time_bucketing of dates not by an integer number of days
    assert(err(dateBucket("1 hour")).contains("whole number of days"))
    assert(err(dateBucket("25 hours")).contains("whole number of days"))
    // sub-day offset not supported for DATE input
    assert(err(dateBucket("1 day", Some("1 hour"))).contains("whole days"))
    assert(err(dateBucket("1 week", Some("30 minutes"))).contains("whole days"))
    // mixed month/day/time widths are rejected
    def tsBucket(width: String) = Seq(tsOf("2011-01-02 01:01:01")).toDF("ts")
      .select(gf.time_bucket(gf.interval(width), $"ts")).head()
    assert(err(tsBucket("1 year 1 day")).contains("mixed month"))
    assert(err(tsBucket("1 month 1 minute")).contains("mixed month"))
    // and the plain forms still work (timestamp.sql:162)
    assert(bucket("1 day", "2011-01-02 01:01:01") === tsOf("2011-01-02 00:00:00"))
  }

  test("null propagation") {
    val got = Seq[Option[Timestamp]](None).toDF("ts")
      .select(gf.time_bucket("1 hour", $"ts").as("b")).collect()
    assert(got.head.isNullAt(0))
  }

  test("SQL registration via Graft.init") {
    Graft.init(spark)
    val got = spark.sql(
      "SELECT time_bucket(INTERVAL '1' HOUR, TIMESTAMP '2020-01-01 00:34:56') AS b")
      .as[Timestamp].head()
    assert(got === tsOf("2020-01-01 00:00:00"))
    val gotMonth = spark.sql(
      "SELECT time_bucket(INTERVAL '1' MONTH, TIMESTAMP '2020-02-15 00:00:00') AS b")
      .as[Timestamp].head()
    assert(gotMonth === tsOf("2020-02-01 00:00:00"))
  }

  test("timezone variant buckets in local wall time") {
    // 2020-06-01 03:00 UTC = 2020-05-31 23:00 America/New_York (EDT);
    // daily bucket in NY starts 2020-05-31 00:00 EDT = 2020-05-31 04:00 UTC
    val got = Seq(tsOf("2020-06-01 03:00:00")).toDF("ts")
      .select(gf.time_bucket_tz("1 day", $"ts", "America/New_York").as("b"))
      .as[Timestamp].head()
    assert(got === tsOf("2020-05-31 04:00:00"))
  }

  test("time_bucket_tz SQL form: DST spring-forward day (23h) buckets to local midnight") {
    Graft.init(spark)
    val r = spark.sql(
      """SELECT
        | time_bucket_tz(INTERVAL '1 day', TIMESTAMP '2024-03-10 06:59:00', 'America/New_York') a,
        | time_bucket_tz(INTERVAL '1 day', TIMESTAMP '2024-03-11 03:59:00', 'America/New_York') b,
        | time_bucket_tz(INTERVAL '1 day', TIMESTAMP '2024-03-11 04:00:00', 'America/New_York') c
        |""".stripMargin).head()
    // 06:59 UTC = 01:59 EST Mar 10 → local midnight Mar 10 = 05:00 UTC (EST)
    assert(r.getTimestamp(0) === tsOf("2024-03-10 05:00:00"))
    // Mar 11 03:59 UTC = Mar 10 23:59 EDT → still local Mar 10 (a 23-hour day)
    assert(r.getTimestamp(1) === tsOf("2024-03-10 05:00:00"))
    // Mar 11 04:00 UTC = Mar 11 00:00 EDT → local midnight Mar 11 = 04:00 UTC
    assert(r.getTimestamp(2) === tsOf("2024-03-11 04:00:00"))
  }

  test("time_bucket_tz: DST fall-back day (25h) buckets to local midnight") {
    Graft.init(spark)
    val r = spark.sql(
      """SELECT
        | time_bucket_tz(INTERVAL '1 day', TIMESTAMP '2024-11-03 05:30:00', 'America/New_York') a,
        | time_bucket_tz(INTERVAL '1 day', TIMESTAMP '2024-11-03 06:30:00', 'America/New_York') b,
        | time_bucket_tz(INTERVAL '1 day', TIMESTAMP '2024-11-04 04:59:00', 'America/New_York') c
        |""".stripMargin).head()
    // 05:30 UTC = 01:30 EDT (before fall-back) → local Nov 3 → midnight EDT = 04:00 UTC
    assert(r.getTimestamp(0) === tsOf("2024-11-03 04:00:00"))
    // 06:30 UTC = 01:30 EST (the repeated hour) → still local Nov 3
    assert(r.getTimestamp(1) === tsOf("2024-11-03 04:00:00"))
    // Nov 4 04:59 UTC = Nov 3 23:59 EST → the 25-hour local day's last minute
    assert(r.getTimestamp(2) === tsOf("2024-11-03 04:00:00"))
  }

  test("time_bucket over a UUIDv7 buckets the embedded timestamp") {
    Graft.init(spark)
    val r = spark.sql(
      """SELECT time_bucket(INTERVAL '1 hour',
        |         to_uuidv7(TIMESTAMP '2024-03-10 06:59:31.123456')) AS b""".stripMargin).head()
    assert(r.getTimestamp(0) === tsOf("2024-03-10 06:00:00"))
  }

  test("events parquet (ns timestamps) is readable and bucketable") {
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
    val n = ev.select(gf.time_bucket("1 hour", $"ts").as("b")).where($"b".isNotNull).count()
    assert(n > 0)
  }
}
