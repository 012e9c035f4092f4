package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{functions => gf}

/** SQL registration of the reference's function surface: a user migrating
  * from the reference writes `first(value, ts)`, `histogram(...)`,
  * `lang_id(...)` in SQL and gets the same results as the Column API.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = Graft.session("sql-surface-spec", "local[4]", 4)
  import spark.implicits._

  private lazy val df = {
    val d = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:01"), 5.0),
      ("a", Timestamp.valueOf("2024-01-01 00:00:02"), 1.0),
      ("a", Timestamp.valueOf("2024-01-01 00:00:03"), 9.0),
      ("b", Timestamp.valueOf("2024-01-01 00:00:01"), 7.0))
      .toDF("g", "ts", "v")
    d.createOrReplaceTempView("bookend_t")
    d
  }

  test("bad arity gets an informative error, not a MatchError") {
    df // force view
    val e = intercept[Exception] {
      spark.sql("SELECT locf() FROM bookend_t").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("locf expects")), s"unexpected error: $e")
  }

  test("extensions-built sessions get no duplicate rules from init()") {
    Graft.init(spark); Graft.init(spark)
    assert(!spark.experimental.extraOptimizations.contains(graft.plans.GapfillRewrite),
      "init() must not re-append rules the extensions already injected")
  }

  test("interpolate(value, prev, next) SQL seeds ≡ the Column API's seed pairs") {
    // the reference's lookup-expression record arguments
    // (sql/gapfill.sql interpolate signatures) — q65's construction, SQL
    // form vs Column form, byte-identical rows
    Graft.init(spark)
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "events")
    val (start, finish) = (1703894400000000L, 1706918400000000L)
    docs.where(col("ts") >= timestamp_micros(lit(start)) &&
        col("ts") < timestamp_micros(lit(finish)))
      .createOrReplaceTempView("events_seed_t")
    val viaSql = spark.sql(
      s"""SELECT event_type,
         |  time_bucket_gapfill(INTERVAL '1 hour', ts,
         |    TIMESTAMP '2023-12-30 00:00:00', TIMESTAMP '2024-02-03 00:00:00') AS bucket,
         |  interpolate(min(value),
         |    struct(TIMESTAMP '2023-12-30 00:00:00', CAST(0.0 AS DOUBLE)),
         |    struct(TIMESTAMP '2024-02-03 00:00:00', CAST(100.0 AS DOUBLE))) AS interp_value
         |FROM events_seed_t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    val agg = docs
      .where(col("ts") >= timestamp_micros(lit(start)) &&
        col("ts") < timestamp_micros(lit(finish)))
      .groupBy(gf.time_bucket("1 hour", col("ts")).as("bucket"), col("event_type"))
      .agg(min(col("value")).as("min_value"))
    val viaApi = graft.operators.Gapfill
      .gapfill(agg, "bucket", Seq("event_type"), start, finish, "1 hour")
      .withColumn("interp_value",
        graft.operators.Gapfill.interpolate(col("min_value"), Seq("event_type"), "bucket",
          prev = Some((timestamp_micros(lit(start)), lit(0.0))),
          next = Some((timestamp_micros(lit(finish)), lit(100.0)))))
      .select("event_type", "bucket", "interp_value")
      .orderBy("event_type", "bucket")
    val a = viaSql.collect()
    val b = viaApi.collect()
    assert(a.length === b.length && a.length > 0)
    assert(a.toSeq === b.toSeq)
    // a NULL seed reads as absent: edges beyond the last real point stay null
    val viaSqlNoNext = spark.sql(
      s"""SELECT event_type,
         |  time_bucket_gapfill(INTERVAL '1 hour', ts,
         |    TIMESTAMP '2023-12-30 00:00:00', TIMESTAMP '2024-02-03 00:00:00') AS bucket,
         |  interpolate(min(value),
         |    struct(TIMESTAMP '2023-12-30 00:00:00', CAST(0.0 AS DOUBLE)), NULL) AS iv
         |FROM events_seed_t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    assert(viaSqlNoNext.last.isNullAt(2), "trailing edge must stay null without a next seed")
  }

  test("round-5 training expressions are SQL-callable and match the Column API") {
    Graft.init(spark)
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    docs.createOrReplaceTempView("docs_r5_t")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  gopher_rules(text).pass_gopher AS pg,
        |  redact_pii(text) AS red,
        |  pii_scan(text).n_email AS ne,
        |  jaccard_sorted(shingle_hashes(split(trim(text), '\\s+'), 3),
        |                 shingle_hashes(split(trim(text), '\\s+'), 3)) AS selfj
        |FROM docs_r5_t ORDER BY doc_id""".stripMargin).collect()
    val viaApi = docs.select($"doc_id",
        graft.operators.TextAnalysis.gopher_rules($"text").getField("pass_gopher").as("pg"),
        graft.operators.TextAnalysis.redact_pii($"text").as("red"),
        graft.operators.TextAnalysis.pii_counts($"text").getField("n_email").as("ne"),
        lit(1.0).as("selfj"))
      .orderBy("doc_id").collect()
    assert(viaSql.length === viaApi.length && viaSql.length === 50)
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq, s"SQL/Column diverge: $a vs $b")
    }
    // two empty sets: jaccard is 0/0 = NULL (never an NPE), even though
    // the array children are non-nullable
    val empty = spark.sql(
      "SELECT jaccard_sorted(CAST(array() AS ARRAY<BIGINT>), " +
        "CAST(array() AS ARRAY<BIGINT>)) AS j").collect()(0)
    assert(empty.isNullAt(0))
  }

  test("first/last: 2-arg reference bookends, 1-arg Spark builtins") {
    df // force view
    val sql = spark.sql(
      """SELECT g, first(v, ts) AS f, last(v, ts) AS l FROM bookend_t
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(sql.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
      === Seq(("a", 5.0, 9.0), ("b", 7.0, 7.0)))
    // column-API agreement
    val colApi = df.groupBy("g")
      .agg(gf.first($"v", $"ts").as("f"), gf.last($"v", $"ts").as("l"))
      .orderBy("g").collect()
    assert(sql.map(_.toSeq).toSeq === colApi.map(_.toSeq).toSeq)
    // 1-arg form keeps builtin semantics (first non-null in group order)
    val one = spark.sql(
      "SELECT first(v) FROM (SELECT v FROM bookend_t WHERE g = 'b')").head()
    assert(one.getDouble(0) === 7.0)
  }

  test("bookend NULL semantics match the reference (agg_bookends.sql)") {
    // reference: a NULL VALUE at the latest time wins (last returns NULL);
    // rows with NULL TIME are skipped entirely
    val d = Seq(
      (Some(Timestamp.valueOf("2024-01-01 00:00:01")), Some(5.0)),
      (Some(Timestamp.valueOf("2024-01-01 00:00:09")), None: Option[Double]), // null value, latest time
      (None: Option[Timestamp], Some(99.0))) // null time: skipped
      .toDF("ts", "v")
    val r = d.agg(gf.last($"v", $"ts").as("l"), gf.first($"v", $"ts").as("f")).head()
    assert(r.isNullAt(0), "last must return the NULL value of the latest-time row")
    assert(r.getDouble(1) === 5.0, "first must skip the NULL-time row")
  }

  test("histogram SQL matches the Column aggregate") {
    df
    val sql = spark.sql(
      """SELECT g, histogram(v, 0.0, 10.0, 5) AS h FROM bookend_t
        |GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val colApi = df.groupBy("g").agg(gf.histogram($"v", 0.0, 10.0, 5).as("h"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(sql.toSeq === colApi.toSeq)
    // bucket rule: 0 = underflow, nbuckets+1 = overflow
    val b = spark.sql(
      "SELECT histogram_bucket(-1.0, 0.0, 10.0, 5), histogram_bucket(99.0, 0.0, 10.0, 5), histogram_bucket(4.0, 0.0, 10.0, 5)").head()
    assert((b.getInt(0), b.getInt(1), b.getInt(2)) === ((0, 6, 3)))
  }

  test("lang_id and quality_score are SQL-callable and match the Column API") {
    val t = Seq("the cat and the dog is here", "xyzzy qwerty").toDF("text")
    t.createOrReplaceTempView("lang_t")
    val sql = spark.sql(
      "SELECT lang_id(text) AS l, quality_score(text) AS q FROM lang_t ORDER BY l").collect()
    val colApi = t.select(
        graft.operators.TextAnalysis.lang_id($"text").as("l"),
        graft.operators.TextAnalysis.quality_score($"text").as("q"))
      .orderBy("l").collect()
    assert(sql.map(_.toSeq).toSeq === colApi.map(_.toSeq).toSeq)
  }

  test("normalize_text and word_ngrams are SQL-callable and match the Column API") {
    val t = Seq("  The  QUICK\tbrown fox ").toDF("text")
    t.createOrReplaceTempView("norm_t")
    val r = spark.sql(
      """SELECT normalize_text(text) AS n,
        |       word_ngrams(split(trim(text), '\\s+'), 2) AS g
        |FROM norm_t""".stripMargin).head()
    assert(r.getString(0) === "the quick brown fox")
    assert(r.getSeq[String](1) === Seq("The QUICK", "QUICK brown", "brown fox"))
  }

  test("get_partition_hash / get_partition_for_key match hypertable routing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_parthash").toString
    val ht = graft.sources.Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", spaceCol = Some("g"), spacePartitions = 4)
    ht.write(df.select($"ts", $"g", $"v"))
    // SQL and Column forms agree with each other and with the routed dirs
    val sql = spark.sql(
      "SELECT g, get_partition_for_key(g, 4) AS p FROM bookend_t GROUP BY 1, 2")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val colApi = df.select($"g", gf.get_partition_for_key($"g", 4).as("p"))
      .distinct().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(sql === colApi)
    val routed = ht.read().select($"g", col(graft.sources.Hypertable.SPACE))
      .distinct().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(routed === sql)
    val h = spark.sql("SELECT get_partition_hash('a') AS h").head().getInt(0)
    assert(h === df.sparkSession.range(1)
      .select(hash(lit("a"))).head().getInt(0))
  }

  test("util_time conversions (sql/util_time.sql): micros round-trips") {
    val us = 1704067200000000L // 2024-01-01T00:00:00Z
    // SQL surface
    val r = spark.sql(
      s"""SELECT to_unix_microseconds(timestamp'2024-01-01 00:00:00Z') AS a,
         |       to_timestamp_without_timezone(${us}L) AS b,
         |       to_interval(3600000000) AS c,
         |       interval_to_usec(INTERVAL '1 hour') AS d,
         |       interval_to_usec(INTERVAL '2' MONTH) AS e,
         |       time_to_internal(timestamp'2024-01-01 00:00:00Z') AS f,
         |       time_to_internal(date'2024-01-02') AS g,
         |       time_to_internal(42) AS h""".stripMargin).head()
    assert(r.getLong(0) === us)
    assert(r.getAs[java.time.LocalDateTime](1) ===
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0))
    assert(r.getAs[java.time.Duration](2) === java.time.Duration.ofHours(1))
    assert(r.getLong(3) === 3600000000L)
    // PG extract(epoch): month = 30 days
    assert(r.getLong(4) === 60L * 86400000000L)
    assert(r.getLong(5) === us)
    assert(r.getLong(6) === us + 86400000000L)
    assert(r.getLong(7) === 42L)
    // Column API agreement + timestamp_micros inverse
    val c = spark.range(1).select(
      gf.to_unix_microseconds(gf.to_timestamp_micros(lit(us))).as("rt"),
      gf.to_date_micros(lit(us + 86400000000L)).as("d"),
      gf.interval_to_usec(gf.to_interval(lit(123456789L))).as("i"),
      gf.time_to_internal(gf.to_timestamp_without_timezone(lit(us))).as("ntz"))
      .head()
    assert(c.getLong(0) === us)
    assert(c.getAs[java.sql.Date](1).toString === "2024-01-02")
    assert(c.getLong(2) === 123456789L)
    assert(c.getLong(3) === us)
    assert(gf.interval_to_usec("1 hour") === 3600000000L)
    // mixed CalendarInterval (not expressible as an ANSI SQL literal)
    assert(gf.interval_to_usec("1 month 2 days") === 32L * 86400000000L)
    val ci = spark.range(1)
      .select(gf.interval_to_usec(gf.interval("1 month 2 days 1 hour")))
      .head().getLong(0)
    assert(ci === 32L * 86400000000L + 3600000000L)
  }
}
