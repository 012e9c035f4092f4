package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.{functions => gf}

/** Golden port of the reference bookend matrix
  * (`test/sql/agg_bookends.sql.in:36-78`, expected
  * `test/expected/agg_bookends-16.out` — the dummy-grouping block):
  * first/last ordered by NON-time columns (numeric, string), NULL sort
  * keys skipped, NULL-heavy windows collapsing to NULL — computed over a
  * CHUNKED hypertable so graft's per-chunk partial aggregation (the
  * reference's `enable_partitionwise_aggregate` path) produces the same
  * cells the reference prints.
  */
class GoldenBookendSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-bookend-spec", "local[4]", 4)
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(
    java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC))

  // test/sql/agg_bookends.sql.in:40-51 (partial_aggregation fixture)
  private val rows: Seq[(Timestamp, Option[Double], Option[String])] = Seq(
    (ts("2018-01-20T09:00:43"), None, None),
    (ts("2018-01-20T09:00:44"), None, None),
    (ts("2019-01-20T09:00:43"), Some(1.0), Some("hello")),
    (ts("2019-01-20T09:00:44"), Some(2.0), Some("world")),
    (ts("2020-01-20T09:00:43"), Some(3.1), Some("some1")),
    (ts("2020-01-20T09:00:44"), Some(3.2), Some("more1")),
    (ts("2021-01-20T09:00:43"), Some(3.3), Some("some2")),
    (ts("2021-01-20T09:00:44"), Some(3.4), Some("more2")),
    (ts("2022-01-20T09:00:43"), Some(4.0), Some("word1")),
    (ts("2022-01-20T09:00:44"), Some(5.0), Some("word2")),
    (ts("2023-01-20T09:00:43"), Some(6.0), Some("word3")),
    (ts("2023-01-20T09:00:44"), Some(7.0), Some("word4")))

  private lazy val ht: DataFrame = {
    val dir = Files.createTempDirectory("graft_bookend").toString
    // yearly chunks ⇒ each insert-pair lands in its own chunk, so the
    // aggregate really merges per-chunk partials like the reference run
    val h = Hypertable.create(spark, s"$dir/ht", "time", chunkWidth = "12 months")
    h.write(rows.toDF("time", "quantity", "longvalue"))
    assert(h.showChunks().size >= 6)
    h.read()
  }

  private val conditions: Seq[(String, Column)] = Seq(
    ("true", lit(true)),
    ("time < '2021-01-01'", col("time") < lit(ts("2021-01-01T00:00:00"))),
    ("quantity is null", col("quantity").isNull),
    ("quantity is not null", col("quantity").isNotNull),
    ("quantity >= 4", col("quantity") >= 4))

  private def cell(cond: Column, agg: Column): Any = {
    val r = ht.where(cond).agg(agg).head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("first/last(time, quantity): NULL quantities never anchor the bookend") {
    val expected = Seq( // agg_bookends-16.out:1665-1689
      ("true", ts("2019-01-20T09:00:43"), ts("2023-01-20T09:00:44")),
      ("time < '2021-01-01'", ts("2019-01-20T09:00:43"), ts("2020-01-20T09:00:44")),
      ("quantity is null", null, null),
      ("quantity is not null", ts("2019-01-20T09:00:43"), ts("2023-01-20T09:00:44")),
      ("quantity >= 4", ts("2022-01-20T09:00:43"), ts("2023-01-20T09:00:44")))
    for (((name, cond), (_, f, l)) <- conditions.zip(expected)) {
      assert(cell(cond, gf.first(col("time"), col("quantity"))) === f, s"first @ $name")
      assert(cell(cond, gf.last(col("time"), col("quantity"))) === l, s"last @ $name")
    }
  }

  test("last(longvalue, quantity): string value picked by numeric bookend") {
    val expected = Seq("word4", "more1", null, "word4", "word4") // out:1690-1714
    for (((name, cond), e) <- conditions.zip(expected))
      assert(cell(cond, gf.last(col("longvalue"), col("quantity"))) === e, s"@ $name")
  }

  test("last(quantity, longvalue): numeric value picked by STRING ordering") {
    val expected = Seq(2.0, 2.0, null, 2.0, 7.0) // out:1715-1739
    for (((name, cond), e) <- conditions.zip(expected))
      assert(cell(cond, gf.last(col("quantity"), col("longvalue"))) === e, s"@ $name")
  }

  test("last(quantity, time): the plain time bookend") {
    val expected = Seq(7.0, 3.2, null, 7.0, 7.0) // out:1740-1764
    for (((name, cond), e) <- conditions.zip(expected))
      assert(cell(cond, gf.last(col("quantity"), col("time"))) === e, s"@ $name")
  }

  test("last(time, longvalue): binary string order matches the reference") {
    val expected = Seq( // out:1765-1789 ('world' > 'word4' in C collation)
      ts("2019-01-20T09:00:44"), ts("2019-01-20T09:00:44"), null,
      ts("2019-01-20T09:00:44"), ts("2023-01-20T09:00:44"))
    for (((name, cond), e) <- conditions.zip(expected))
      assert(cell(cond, gf.last(col("time"), col("longvalue"))) === e, s"@ $name")
  }

  test("grouped by value column itself (out:1892+ longvalue grouping sample)") {
    // SELECT longvalue, last(quantity, longvalue) ... GROUP BY longvalue:
    // within a single-longvalue group the bookend is just that row's value
    val got = ht.groupBy(col("longvalue"))
      .agg(gf.last(col("quantity"), col("longvalue")).as("last"))
      .where(col("longvalue") === "hello").head()
    assert(got.getDouble(1) === 1.0)
  }
}
