package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable

/** Boundary-exact port of the reference's chunk-skipping golden test
  * (`tsl/test/expected/chunk_column_stats.out`): a two-chunk table whose
  * first chunk holds sensor_id 1..8 and second 9..16, probed with every
  * boundary predicate the reference checks — pruned chunks asserted from
  * the physical plan, answers asserted against a plain filter.
  *
  * Deliberate divergences from the reference, asserted as such:
  * - graft keeps stats on EVERY chunk (footer-derived, refreshed on every
  *   content change), so the uncompressed second chunk prunes too, where
  *   the reference only tracks completed/compressed chunks;
  * - an UPDATE refreshes the rewritten chunk's range in place, so pruning
  *   keeps working, where the reference flips the stats row to invalid
  *   until recompression.
  */
class GoldenChunkSkipSpec extends AnyFunSuite {
  lazy val spark = Graft.session("golden-chunkskip-spec", "local[4]", 4)
  import spark.implicits._

  // the reference fixture's two batches, one per chunk (sensor values
  // verbatim from chunk_column_stats.sql:33-50)
  private lazy val fixture = {
    val d = Files.createTempDirectory("graft_goldskip").toString
    val ht = Hypertable.create(spark, s"$d/ht", "ts", chunkWidth = "7 days")
    val t1 = Timestamp.from(java.time.Instant.parse("2022-01-27T19:39:53Z"))
    val t2 = Timestamp.from(java.time.Instant.parse("2022-02-05T12:21:11Z"))
    val rows = Seq(1, 2, 3, 8, 4, 5, 6).map(s => (t1, s)) ++
      Seq(12, 12, 13, 9, 14, 15, 16).map(s => (t2, s))
    ht.write(rows.toDF("ts", "sensor_id"))
    ht.enableChunkSkipping("sensor_id")
    assert(ht.showChunks().size === 2)
    ht
  }

  private def survivingChunks(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case f: FileSourceScanExec => f } match {
      case Nil => plan match {
        // a multi-root (tablespace) read unions one scan per storage root
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case f: FileSourceScanExec => f }
        case _ => Nil
      }
      case fs => fs
    }
    // a fully-pruned scan may plan as an empty LocalRelation: 0 partitions
    scans.map(_.selectedPartitions.partitionCount).sum
  }

  private def probe(pred: org.apache.spark.sql.Column,
      expectChunks: Int, expectRows: Long): Unit = {
    val df = fixture.read().where(pred)
    assert(survivingChunks(df) === expectChunks,
      s"predicate $pred: wrong chunk count")
    assert(df.count() === expectRows, s"predicate $pred: wrong answer")
  }

  test("reference boundary matrix: ranges outside chunk stats prune") {
    val s = col("sensor_id")
    // chunk1 range [1,8], chunk2 [9,16] — outside both: full prune
    probe(s < 1, 0, 0)
    probe(s <= 0, 0, 0)
    probe(s > 16, 0, 0)
    probe(s >= 17, 0, 0)
    // reference: `> 8` / `>= 9` / `= 10` exclude chunk1
    probe(s > 8, 1, 7)
    probe(s >= 9, 1, 7)
    probe(s === 10, 1, 0) // in chunk2's range; stats cannot disprove presence
    // reference: intersecting ranges include the chunk
    probe(s === 7, 1, 0) // inside chunk1's range, value absent
    probe(s === 8, 1, 1)
    probe(s < 2, 1, 1)
    probe(s <= 1, 1, 1)
    probe(s >= 8 && s <= 10, 2, 2) // {8, 9}
    probe(s > 6 && s < 10, 2, 2)   // {8, 9}
    probe(s >= 1 && s <= 8, 1, 7)  // chunk1 superset
    // reference: chunk superset ranges include the chunk
    probe(s > -2, 2, 14)
    probe(s < 17, 2, 14)
  }

  test("UPDATE refreshes the chunk's range in place (reference re-validates " +
      "only at recompression)") {
    val ht = fixture
    val c1 = ht.showChunks().head
    // reference chunk_column_stats.sql:212: a new row widens the range on
    // the NEXT refresh; graft's append path refreshes immediately
    ht.updateWhere(col("sensor_id") === 8, Map("sensor_id" -> lit(20)),
      timeRange = Some((c1.startMicros, c1.endMicros)))
    // chunk1's recorded range is now [1,20]: = 20 scans chunk1 ONLY
    // (chunk2 [9,16] is pruned), and finds the updated row
    probe(col("sensor_id") === 20, 1, 1)
    // = 8 no longer matches a row but still scans chunk1 (range includes 8)
    probe(col("sensor_id") === 8, 1, 0)
    // restore fixture values for other tests
    ht.updateWhere(col("sensor_id") === 20, Map("sensor_id" -> lit(8)),
      timeRange = Some((c1.startMicros, c1.endMicros)))
  }

  test("disable errors on a column that was never enabled (reference error)") {
    val err = intercept[IllegalArgumentException] {
      fixture.disableChunkSkipping("cpu")
    }
    assert(err.getMessage.contains("statistics not enabled"))
  }

  test("enable refuses the open dimension column") {
    intercept[IllegalArgumentException] { fixture.enableChunkSkipping("ts") }
  }

  test("columnstore rewrite keeps skip stats on a gen-layout chunk") {
    // catalog="table" → generational layout: compress publishes a NEW
    // _gen= dir, whose colstats sidecar must be recomputed there (the
    // registry probe used to resolve SKIPCOLS at the data dir's parent —
    // the chunk dir, not the table root — and silently skipped the
    // refresh, losing the chunk's pruning until the next DML)
    val d = Files.createTempDirectory("graft_goldskip_gen").toString
    val ht = Hypertable.create(spark, s"$d/ht", "ts", chunkWidth = "7 days",
      catalog = "table")
    val t1 = Timestamp.from(java.time.Instant.parse("2022-01-27T19:39:53Z"))
    val t2 = Timestamp.from(java.time.Instant.parse("2022-02-05T12:21:11Z"))
    ht.write((Seq(1, 2, 8).map(s => (t1, s)) ++ Seq(9, 12, 16).map(s => (t2, s)))
      .toDF("ts", "sensor_id"))
    ht.enableChunkSkipping("sensor_id")
    val c1 = ht.showChunks().minBy(_.startMicros)
    graft.sources.Columnstore.compressChunk(spark, c1.path,
      graft.sources.Columnstore.Options(orderBy = Seq("ts")))
    val stats = ht.columnStatsCatalog()
    assert(stats.get(c1.startMicros).flatMap(_.get("sensor_id")).flatten
      === Some((1L, 8L)), "rewritten generation lost its skip stats")
    val df = ht.read().where(col("sensor_id") > 8)
    assert(survivingChunks(df) === 1 && df.count() === 3)
  }

  test("columnstore rewrite keeps skip stats on a tablespace-moved chunk") {
    // a moved chunk's dir parent is the tablespace's per-table dir; the
    // registry still lives at the PRIMARY root (resolved via the
    // pointer-home marker)
    val d = Files.createTempDirectory("graft_goldskip_ts").toString
    val ht = Hypertable.create(spark, s"$d/ht", "ts", chunkWidth = "7 days")
    val t1 = Timestamp.from(java.time.Instant.parse("2022-01-27T19:39:53Z"))
    val t2 = Timestamp.from(java.time.Instant.parse("2022-02-05T12:21:11Z"))
    ht.write((Seq(1, 2, 8).map(s => (t1, s)) ++ Seq(9, 12, 16).map(s => (t2, s)))
      .toDF("ts", "sensor_id"))
    ht.enableChunkSkipping("sensor_id")
    ht.attachTablespace(s"$d/cold")
    val c1 = ht.showChunks().minBy(_.startMicros)
    val moved = ht.moveChunk(c1.startMicros, Some(s"$d/cold"))
    graft.sources.Columnstore.compressChunk(spark, moved.path,
      graft.sources.Columnstore.Options(orderBy = Seq("ts")))
    val stats = ht.columnStatsCatalog()
    assert(stats.get(c1.startMicros).flatMap(_.get("sensor_id")).flatten
      === Some((1L, 8L)), "moved chunk lost its skip stats on rewrite")
    val df = ht.read().where(col("sensor_id") > 8)
    assert(survivingChunks(df) === 1 && df.count() === 3)
  }
}
