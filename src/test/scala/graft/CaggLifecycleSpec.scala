package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Model-based randomized lifecycle test for the continuous-aggregate
  * invalidation machinery: a fixed-seed random sequence of appends,
  * deletes, updates, partial refreshes, invalidation repairs, and
  * materialization compressions over a cagg-backed hypertable. The model
  * is the direct aggregation of whatever the raw table currently holds;
  * the invariant — checked after every repair point — is that
  * `refreshInvalidated()` leaves zero pending dirt below the threshold
  * and the REALTIME view equals the direct aggregation exactly
  * (reference analogue: the `cagg_invalidation.sql` regression matrix,
  * which mutates and asserts repaired content after each refresh).
  *
  * Mid-sequence (between a mutation and its repair) the materialization
  * is allowed to be stale — that is the design — so content is asserted
  * only at repair points, while `pendingInvalidations` is asserted
  * non-empty right after any below-threshold mutation.
  */
class CaggLifecycleSpec extends AnyFunSuite {
  lazy val spark = Graft.session("cagg-lifecycle-spec", "local[4]", 4)
  import spark.implicits._

  test("random mutate/refresh/repair/compress sequences converge to the " +
      "direct aggregation (seed=42, 18 steps)") {
    val rng = new scala.util.Random(42)
    val dir = Files.createTempDirectory("graft_cagg_life").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))

    val defn = CaggDef("1 hour", Seq("event_type"), Seq(
      count(lit(1)).as("n"),
      expr("CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)").as("sum_value")),
      matChunkWidth = "7 days")
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    val winLo = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    val winHi = Timestamp.valueOf("2024-02-01 00:00:00").getTime * 1000L
    cagg.refresh(winLo, winHi)

    def direct() = ht.read()
      .groupBy(gf.time_bucket("1 hour", $"ts").as("bucket"), $"event_type")
      .agg(defn.aggs.head, defn.aggs.tail: _*)

    var nextId = 20000000L
    def randomTs(): Timestamp = new Timestamp(
      Timestamp.valueOf("2024-01-02 00:00:00").getTime +
        rng.nextInt(27) * 86400000L + rng.nextInt(86400000))

    def repairAndCheck(step: String): Unit = {
      cagg.refreshInvalidated()
      assert(cagg.pendingInvalidations().isEmpty,
        s"dirt left after repair at: $step")
      assert(cagg.realtime.collect().toSet === direct().collect().toSet,
        s"realtime drifted from direct aggregation after: $step")
    }

    (1 to 18).foreach { step =>
      val op = rng.nextInt(6)
      val desc = op match {
        case 0 =>
          val n = 3 + rng.nextInt(8)
          val rows = (0 until n).map { i =>
            (nextId + i, randomTs(), rng.nextInt(10).toLong,
              if (rng.nextBoolean()) "click" else "view",
              rng.nextInt(1000) / 10.0, "{}")
          }
          nextId += n
          ht.write(rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
          assert(cagg.pendingInvalidations().nonEmpty,
            s"below-threshold append did not log dirt (step $step)")
          s"append($n)"
        case 1 =>
          val day = 2 + rng.nextInt(27)
          val lo = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
          val n = ht.deleteWhere($"ts" >= lo &&
            $"ts" < new Timestamp(lo.getTime + 6 * 3600000L) &&
            pmod($"event_id", lit(5)) === 0)
          s"delete(day=$day, hit=$n)"
        case 2 =>
          val day = 2 + rng.nextInt(27)
          val lo = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
          val n = ht.updateWhere($"ts" >= lo &&
            $"ts" < new Timestamp(lo.getTime + 3 * 3600000L) &&
            pmod($"event_id", lit(7)) === 0,
            Map("value" -> ($"value" + lit(1.0))))
          s"update(day=$day, hit=$n)"
        case 3 =>
          // partial refresh of a random sub-window (never an error: whole
          // days inside the standing window)
          val d0 = 1 + rng.nextInt(20)
          val lo = winLo + d0.toLong * 86400000000L
          cagg.refresh(lo, lo + (1 + rng.nextInt(7)).toLong * 86400000000L)
          s"refresh(day=$d0)"
        case 4 =>
          val done = cagg.compressMaterialization()
          s"compressMat(${done.size})"
        case _ =>
          repairAndCheck(s"explicit-repair step $step"); "repair+check"
      }
      info(s"step $step: $desc")
    }
    repairAndCheck("final")
    // the realtime view stays correct for data ABOVE the standing window
    ht.write(Seq((nextId, Timestamp.valueOf("2024-02-03 00:30:00"), 1L,
        "click", 9.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(cagg.realtime.collect().toSet === direct().collect().toSet)
  }
}
