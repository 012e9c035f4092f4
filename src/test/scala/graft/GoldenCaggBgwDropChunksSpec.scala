package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Hypertable, Policies, PolicySet}
import graft.streaming.{CaggDef, ContinuousAggregate}

/** Golden port of `tsl/test/sql/cagg_bgw_drop_chunks.sql` /
  * `expected/cagg_bgw_drop_chunks.out`: a retention policy attached to a
  * CONTINUOUS AGGREGATE drops the MATERIALIZATION's chunks, clocked by
  * the RAW hypertable's integer-now function (the mat table has no clock
  * of its own), leaving the raw table untouched. The reference drives it
  * through the bgw scheduler mock; graft's scheduling is external by
  * design (SURVEY §2.11), so the pinned observable is the policy
  * EXECUTION: `show_chunks(cagg)` count 4 → 1 after the run.
  */
class GoldenCaggBgwDropChunksSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-cagg-bgw-drop", "local[4]", 4)
  import spark.implicits._

  test("cagg_bgw_drop_chunks.out: retention on the cagg drops mat chunks " +
    "by the raw table's integer clock — 4 chunks -> 1") {
    val dir = Files.createTempDirectory("graft_cagg_bgw_drop").toString
    // CREATE TABLE drop_chunks_table(time BIGINT, data INTEGER),
    // chunk_time_interval => 1; integer_now_test2() = 40
    val ht = Hypertable.create(spark, s"$dir/ht", "time",
      chunkWidth = "1", timeKind = "bigint")
    ht.write((1 to 39).map(i => (i.toLong, i)).toDF("time", "data"))
    Hypertable.registerIntegerNow("cagg_bgw_drop_now")(() => 40L)
    ht.setIntegerNowFunc("cagg_bgw_drop_now")
    // CREATE MATERIALIZED VIEW ... time_bucket('5', time), max(data)
    // WITH NO DATA; mat hypertable chunk interval set to 10
    val defn = CaggDef("5", Seq.empty, Seq(max($"data").as("max_data")),
      matChunkWidth = "10")
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    cagg.refreshAll()
    // raw: 39 one-unit chunks; mat: buckets 0..35 over width-10 chunks = 4
    assert(ht.showChunks().size === 39)
    assert(cagg.matChunks.size === 4,
      s"mat chunking: ${cagg.matChunks}")
    // add_retention_policy('drop_chunks_view1', drop_after => 10): the
    // cutoff is integer_now(raw)=40 minus 10 — mat chunks fully below 30 go
    Policies.add(spark, s"$dir/cagg", PolicySet(dropAfterMicros = Some(10L)))
    val report = Policies.runAll(ht, Some(cagg), s"$dir/cagg", ht.nowMicros())
    assert(report.count(_.startsWith("dropped mat")) === 3, report.toString)
    assert(cagg.matChunks.size === 1,
      "SELECT count(c) from show_chunks('drop_chunks_view1') must be 1")
    // the raw hypertable is untouched — the policy targeted the cagg
    assert(ht.showChunks().size === 39)
    // the surviving mat chunk still answers: buckets at/above 30
    assert(cagg.materialized.select(min($"bucket")).as[Long].head() >= 30L)
  }
}
