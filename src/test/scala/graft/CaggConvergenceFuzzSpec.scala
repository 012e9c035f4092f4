package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Seeded random walks over the cagg maintenance surface — ingest, DELETE,
  * UPDATE, windowed refresh, repair refresh in arbitrary interleavings —
  * each ending in quiescence (drain the invalidation log, refresh the full
  * window) where the materialization must equal the direct aggregation
  * EXACTLY. The reference's invalidation tests pin specific sequences
  * (`tsl/test/sql/cagg_invalidation.sql`); this sweeps the sequence space
  * around them. Failures reproduce from the printed seed.
  */
class CaggConvergenceFuzzSpec extends AnyFunSuite {
  lazy val spark = Graft.session("cagg-fuzz-spec", "local[4]", 4)

  private def events = Tables.table(spark, "/root/testdata/sf0.001", "events")
  private def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L

  // order-insensitive exact aggregates: no float-sum reorder noise between
  // the incremental materialization and the one-shot direct aggregation
  private val defn = CaggDef("1 hour", Seq("event_type"), Seq(
    count(lit(1)).as("n"),
    min(col("value")).as("min_value"),
    max(col("value")).as("max_value")))

  private def directAgg(ht: Hypertable) =
    ht.read()
      .groupBy(gf.time_bucket("1 hour", col("ts")).as("bucket"), col("event_type"))
      .agg(defn.aggs.head, defn.aggs.tail: _*)

  for (seed <- Seq(11L, 42L)) {
    test(s"random ingest/DML/refresh interleaving converges exactly (seed=$seed)") {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft_fuzz_$seed").toString
      val ht = Hypertable.create(spark, s"$dir/ht", "ts",
        chunkWidth = "7 days", catalog = "table")
      val nSlices = 8
      var unwritten = rnd.shuffle((1 until nSlices).toList)
      ht.write(events.where(pmod(col("event_id"), lit(nSlices)) === 0))
      val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
      cagg.refresh(us("2024-01-01 00:00:00"), us("2024-02-01 00:00:00"))

      val dayUs = 24L * 3600 * 1000000
      val jan1 = us("2024-01-01 00:00:00")
      val ops = new StringBuilder
      var dropped = false
      (1 to 12).foreach { _ =>
        rnd.nextInt(7) match {
          case 0 if unwritten.nonEmpty =>
            val s = unwritten.head; unwritten = unwritten.tail
            ops ++= s"write($s) "
            ht.write(events.where(pmod(col("event_id"), lit(nSlices)) === s))
          case 0 | 1 =>
            val k = rnd.nextInt(97)
            ops ++= s"delete(mod97=$k) "
            ht.deleteWhere(pmod(col("event_id"), lit(97)) === k)
          case 2 =>
            val k = rnd.nextInt(101)
            ops ++= s"update(mod101=$k) "
            ht.updateWhere(pmod(col("event_id"), lit(101)) === k,
              Map("value" -> (col("value") * 2.0 + 1.0)))
          case 3 =>
            val d0 = rnd.nextInt(28); val len = 1 + rnd.nextInt(6)
            ops ++= s"refresh(d$d0+$len) "
            cagg.refresh(jan1 + d0 * dayUs,
              math.min(jan1 + (d0 + len) * dayUs, us("2024-02-01 00:00:00")))
          case 4 =>
            ops ++= "repair "
            cagg.refreshInvalidated()
          case 5 =>
            // columnstore rewrite mid-sequence: content unchanged, so the
            // invalidation state machine must be indifferent to it, and
            // later refreshes read THROUGH the compressed layout
            val cs = ht.showChunks()
            val c = cs(rnd.nextInt(cs.size))
            ops ++= s"compress(${c.startMicros}) "
            graft.sources.Columnstore.compressChunk(spark, c.path,
              graft.sources.Columnstore.Options(orderBy = Seq("ts")))
          case 6 if !dropped =>
            // retention mid-sequence: drops invalidate the removed range,
            // and later slice writes re-create the chunk
            dropped = true
            val head = ht.showChunks().head
            ops ++= s"dropOldest(${head.startMicros}) "
            ht.dropChunks(Some(head.endMicros), None)
          case _ =>
            ops ++= "repair "
            cagg.refreshInvalidated()
        }
      }
      // quiescence: drain the log, then a final full-window pass
      var rounds = 0
      while (cagg.pendingInvalidations().nonEmpty && rounds < 10) {
        cagg.refreshInvalidated(); rounds += 1
      }
      assert(cagg.pendingInvalidations().isEmpty, s"log not drained [ops: $ops]")
      cagg.refresh(jan1, us("2024-02-01 00:00:00"))
      assert(cagg.materialized.collect().toSet === directAgg(ht).collect().toSet,
        s"materialization diverged from direct aggregation [ops: $ops]")
    }
  }
}
