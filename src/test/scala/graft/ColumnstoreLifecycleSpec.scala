package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, Hypertable}

/** Model-based randomized lifecycle test: a fixed-seed random sequence of
  * appends, compressions, segmentwise recompressions, compactions, and
  * decompressions over a hypertable must never change WHAT the table
  * holds — only how the bytes are laid out. The model is the expected row
  * multiset, maintained alongside; every step re-checks full content
  * (reference analogue: the compression DML/recompression regression
  * suites assert content stability across layout rewrites).
  */
class ColumnstoreLifecycleSpec extends AnyFunSuite {
  lazy val spark = Graft.session("cs-lifecycle-spec", "local[4]", 4)
  import spark.implicits._

  private val opts = Columnstore.Options(
    segmentBy = Seq("user_id"), orderBy = Seq("ts"))

  test("random compress/recompress/compact/decompress sequences preserve " +
      "content exactly (seed=42, 24 steps)") {
    val rng = new scala.util.Random(42)
    val dir = Files.createTempDirectory("graft_cs_life").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")

    // base corpus + a reservoir of append batches (disjoint event_ids)
    val base = Tables.table(spark, "/root/testdata/sf0.001", "events")
    ht.write(base)
    var nextId = 10000000L
    var expected = base.select($"event_id", $"user_id", $"event_type", $"value")
      .as[(Long, Long, String, Double)].collect().toVector

    def appendBatch(): Unit = {
      val n = 5 + rng.nextInt(20)
      val t0 = Timestamp.valueOf("2024-01-03 00:00:00").getTime
      val rows = (0 until n).map { i =>
        val id = nextId + i
        (id, new Timestamp(t0 + rng.nextInt(25) * 86400000L + rng.nextInt(86400000)),
          rng.nextInt(10).toLong, if (rng.nextBoolean()) "click" else "view",
          rng.nextInt(1000) / 10.0, "{}")
      }
      nextId += n
      ht.write(rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      expected = expected ++ rows.map(r => (r._1, r._3, r._4, r._5))
    }

    def check(step: String): Unit = {
      val got = ht.read().select($"event_id", $"user_id", $"event_type", $"value")
        .as[(Long, Long, String, Double)].collect().toVector
      assert(got.sorted === expected.sorted, s"content drift after: $step")
    }

    def randomChunk() = {
      val cs = ht.showChunks()
      cs(rng.nextInt(cs.size))
    }

    (1 to 24).foreach { step =>
      val op = rng.nextInt(6)
      val desc = op match {
        case 0 =>
          appendBatch(); s"append"
        case 1 =>
          val c = randomChunk()
          Columnstore.compressChunk(spark, c.path, opts)
          s"compressChunk(${c.startMicros})"
        case 2 =>
          val c = randomChunk()
          val r = Columnstore.recompressChunk(spark, c.path, opts)
          s"recompressChunk(${c.startMicros})=$r"
        case 3 =>
          val c = randomChunk()
          // compact refuses PARTIAL chunks (recompress owns those) — an
          // expected, content-preserving refusal
          val r = try Columnstore.compactChunk(spark, c.path,
              targetFileBytes = 64 * 1024).toString
            catch { case e: IllegalArgumentException => s"refused(${e.getMessage.take(30)})" }
          s"compactChunk(${c.startMicros})=$r"
        case 4 =>
          val c = randomChunk()
          if (Columnstore.isCompressed(spark, c.path)) {
            Columnstore.decompressChunk(spark, c.path)
            s"decompressChunk(${c.startMicros})"
          } else "noop-decompress"
        case 5 =>
          Columnstore.compress(ht, opts)
          "policy-compress-all"
      }
      check(s"step $step: $desc")
    }
    // end state: force everything through the policy once more and verify
    Columnstore.compress(ht, opts)
    check("final policy sweep")
  }
}
