package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Port of the reference's cagg QUERY golden
  * (`tsl/test/sql/include/cagg_query_common.sql`, run under MERGE refresh by
  * `cagg_query_using_merge.sql`; expected `cagg_query_using_merge.out`):
  * the `conditions` table, mat_m1 (min/sum) and mat_m2 (first/last bookends)
  * caggs, late data UNIONed by the realtime view, the two-cagg RIGHT JOIN
  * matrix, and the drop-newest-mat-chunk scenario where the WATERMARK
  * recedes but the invalidation THRESHOLD does not.
  *
  * The reference session runs in PST8PDT; all times here are the same UTC
  * instants ('2018-01-01 09:20:00-08' = 2018-01-01 17:20 UTC). Buckets of
  * `time_bucket('1day', timec)` are UTC-midnight instants in both engines.
  */
class GoldenCaggQuerySpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-cagg-query-spec", "local[4]", 4)
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String): Long = ts(s).getTime * 1000L

  // cagg_query_common.sql:28-41 (UTC instants)
  private val baseRows: Seq[(Timestamp, String, Option[Double], Option[Double])] = Seq(
    (ts("2018-01-01 17:20:00"), "SFO", Some(55.0), Some(45.0)),
    (ts("2018-01-02 17:30:00"), "por", Some(100.0), Some(100.0)),
    (ts("2018-01-02 17:20:00"), "SFO", Some(65.0), Some(45.0)),
    (ts("2018-01-02 17:10:00"), "NYC", Some(65.0), Some(45.0)),
    (ts("2018-11-01 17:20:00"), "NYC", Some(45.0), Some(30.0)),
    (ts("2018-11-01 18:40:00"), "NYC", Some(55.0), Some(35.0)),
    (ts("2018-11-01 19:50:00"), "NYC", Some(65.0), Some(40.0)),
    (ts("2018-11-01 20:10:00"), "NYC", Some(75.0), Some(45.0)),
    (ts("2018-11-01 21:10:00"), "NYC", Some(85.0), Some(50.0)),
    (ts("2018-11-02 17:20:00"), "NYC", Some(10.0), Some(10.0)),
    (ts("2018-11-02 18:30:00"), "NYC", Some(20.0), Some(15.0)),
    (ts("2018-11-02 19:40:00"), "NYC", None, None),
    (ts("2018-11-03 17:50:00"), "NYC", None, None))

  // the "Insert some more data so that there is something to UNION in
  // real-time aggregation" block ('2018-12-02 20:10:00-08' etc.)
  private val lateRows: Seq[(Timestamp, String, Option[Double], Option[Double])] = Seq(
    (ts("2018-12-03 04:10:00"), "SFO", Some(55.0), Some(45.0)),
    (ts("2018-12-03 05:20:00"), "SFO", Some(65.0), Some(45.0)),
    (ts("2018-12-03 04:30:00"), "NYC", Some(65.0), Some(45.0)),
    (ts("2018-12-03 05:50:00"), "NYC", Some(45.0), Some(30.0)))

  private def df(rows: Seq[(Timestamp, String, Option[Double], Option[Double])]) =
    rows.toDF("timec", "location", "temperature", "humidity")

  test("cagg_query_using_merge.out: mat_m1/mat_m2 realtime matrices, " +
      "two-cagg right join, and drop-newest-chunk watermark recession") {
    val dir = Files.createTempDirectory("graft_cagg_query").toString
    val ht = Hypertable.create(spark, s"$dir/conditions", "timec",
      chunkWidth = "7 days")
    ht.write(df(baseRows))
    val m1 = ContinuousAggregate.create(spark, s"$dir/mat_m1", ht,
      CaggDef("1 day", Seq("location"), Seq(
        min($"location").as("minl"),
        sum($"temperature").as("sumt"),
        sum($"humidity").as("sumh")), bucketCol = "timec"))
    val m2 = ContinuousAggregate.create(spark, s"$dir/mat_m2", ht,
      CaggDef("1 day", Seq("location"), Seq(
        gf.first($"humidity", $"timec").as("firsth"),
        gf.last($"humidity", $"timec").as("lasth"),
        max($"temperature").as("maxtemp"),
        min($"temperature").as("mintemp")), bucketCol = "timec"))
    m1.refreshAll()
    m2.refreshAll()
    // golden: watermark == invalidation threshold == end of the last data
    // bucket, 'Sat Nov 03 17:00:00 2018 PDT' = 2018-11-04 00:00 UTC
    assert(m1.watermark === us("2018-11-04 00:00:00"))
    assert(m1.invalidationThreshold === m1.watermark)

    ht.write(df(lateRows)) // above the watermark: realtime unions it live

    // golden :559 "Query without join" — mat_m1 realtime,
    // ORDER BY location, timec DESC LIMIT 10
    val q1 = m1.realtime
      .select($"location", unix_micros($"timec").as("b"), $"sumt", $"sumh")
      .orderBy($"location", $"b".desc).limit(10)
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    val exp1 = Seq(
      ("NYC", us("2018-12-03 00:00:00"), Some(110.0), Some(75.0)),
      ("NYC", us("2018-11-03 00:00:00"), None, None),
      ("NYC", us("2018-11-02 00:00:00"), Some(30.0), Some(25.0)),
      ("NYC", us("2018-11-01 00:00:00"), Some(325.0), Some(200.0)),
      ("NYC", us("2018-01-02 00:00:00"), Some(65.0), Some(45.0)),
      ("SFO", us("2018-12-03 00:00:00"), Some(120.0), Some(90.0)),
      ("SFO", us("2018-01-02 00:00:00"), Some(65.0), Some(45.0)),
      ("SFO", us("2018-01-01 00:00:00"), Some(55.0), Some(45.0)),
      ("por", us("2018-01-02 00:00:00"), Some(100.0), Some(100.0)))
    assert(q1 === exp1)

    // golden :566 "Query that joins two caggs" — RIGHT JOIN matrix
    def joined(): Seq[(String, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double])] = {
      val a = m1.realtime.as("m1")
      val b = m2.realtime.as("m2")
      a.join(b, col("m1.location") === col("m2.location") &&
          col("m1.timec") === col("m2.timec"), "right")
        .select(col("m1.location"), unix_micros(col("m1.timec")).as("b"),
          $"sumt", $"sumh", $"firsth", $"lasth", $"maxtemp", $"mintemp")
        .orderBy(col("m1.location"), col("b").desc).limit(10)
        .as[(String, Long, Option[Double], Option[Double], Option[Double],
          Option[Double], Option[Double], Option[Double])].collect().toSeq
    }
    val expJoin = Seq(
      ("NYC", us("2018-12-03 00:00:00"), Some(110.0), Some(75.0), Some(45.0), Some(30.0), Some(65.0), Some(45.0)),
      ("NYC", us("2018-11-03 00:00:00"), None, None, None, None, None, None),
      ("NYC", us("2018-11-02 00:00:00"), Some(30.0), Some(25.0), Some(10.0), None, Some(20.0), Some(10.0)),
      ("NYC", us("2018-11-01 00:00:00"), Some(325.0), Some(200.0), Some(30.0), Some(50.0), Some(85.0), Some(45.0)),
      ("NYC", us("2018-01-02 00:00:00"), Some(65.0), Some(45.0), Some(45.0), Some(45.0), Some(65.0), Some(65.0)),
      ("SFO", us("2018-12-03 00:00:00"), Some(120.0), Some(90.0), Some(45.0), Some(45.0), Some(65.0), Some(55.0)),
      ("SFO", us("2018-01-02 00:00:00"), Some(65.0), Some(45.0), Some(45.0), Some(45.0), Some(65.0), Some(65.0)),
      ("SFO", us("2018-01-01 00:00:00"), Some(55.0), Some(45.0), Some(45.0), Some(45.0), Some(55.0), Some(55.0)),
      ("por", us("2018-01-02 00:00:00"), Some(100.0), Some(100.0), Some(100.0), Some(100.0), Some(100.0), Some(100.0)))
    assert(joined() === expJoin)

    // golden :601 "the MAX is the start of the last bucket"
    val matMax = m1.materialized.agg(max(unix_micros($"timec"))).head().getLong(0)
    assert(matMax === us("2018-11-03 00:00:00"))

    // golden :605 "Drop the most recent chunk": mat chunks are 70 days
    // (10x the source's 7-day chunk, like the reference); the cutoff
    // '2018-01-01'::timestamptz in PST8PDT = 2018-01-01 08:00 UTC drops
    // only the autumn chunk
    assert(m1.matChunks.size === 2)
    val dropped = m1.dropMatChunksNewer(us("2018-01-01 08:00:00"))
    assert(dropped.size === 1 && m1.matChunks.size === 1)
    // golden :630: watermark recedes to the end of the last REMAINING
    // bucket, 'Tue Jan 02 16:00:00 2018 PST' = 2018-01-03 00:00 UTC ...
    assert(m1.watermark === us("2018-01-03 00:00:00"))
    // golden :637: ... while the invalidation threshold does NOT move back
    assert(m1.invalidationThreshold === us("2018-11-04 00:00:00"))
    // golden :645: max mat time is now the start of the last remaining bucket
    assert(m1.materialized.agg(max(unix_micros($"timec"))).head().getLong(0)
      === us("2018-01-02 00:00:00"))

    // golden :650 "Try a subtransaction": the join matrix is UNCHANGED —
    // the realtime view re-aggregates the dropped span live
    assert(joined() === expJoin)
  }
}
