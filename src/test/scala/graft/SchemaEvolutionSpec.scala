package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, Hypertable}

/** ALTER TABLE ADD COLUMN over a hypertable (the reference supports plain
  * Postgres DDL on hypertables; graft's declared-schema catalog is the
  * analogue): the ALTER is metadata-only, rows written before it read
  * back NULL for the new column, writes are validated against the
  * declared schema, and chunk rewrites never drop the newer columns.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = Graft.session("schema-evo-spec", "local[4]", 4)
  import spark.implicits._

  private def freshHt() = {
    val dir = Files.createTempDirectory("graft_evo").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    ht
  }

  private def wideRow(id: Long, ts: String, tier: String) =
    Seq((id, Timestamp.valueOf(ts), 1L, "click", 5.0, "{}", tier))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props", "tier")

  test("first write stamps the schema; unknown columns are rejected until " +
      "alterAddColumn; pre-ALTER rows read back NULL") {
    val ht = freshHt()
    assert(ht.dataSchema.get.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    // an undeclared column errors like the reference's INSERT
    val e = intercept[IllegalArgumentException] {
      ht.write(wideRow(99000001L, "2024-01-10 01:00:00", "NEW"))
    }
    assert(e.getMessage.contains("do not exist"))
    // the ALTER is metadata-only and instant
    ht.alterAddColumn("tier", "STRING")
    ht.write(wideRow(99000001L, "2024-01-10 01:00:00", "NEW"))
    val df = ht.read()
    assert(df.columns.contains("tier"))
    assert(df.where($"tier" === "NEW").count() === 1)
    // every pre-ALTER row surfaces NULL for the new column
    assert(df.where($"tier".isNull).count() === 1000)
    // a narrow batch (no tier) after the ALTER fills NULL — INSERT with a
    // column list
    ht.write(Seq((99000002L, Timestamp.valueOf("2024-01-10 02:00:00"), 1L,
        "view", 6.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(ht.read().where($"event_id" === 99000002L && $"tier".isNull).count() === 1)
    assert(ht.read().count() === 1002)
  }

  test("chunk rewrites (DML, compression) preserve post-ALTER columns in " +
      "mixed-width chunks") {
    val ht = freshHt()
    ht.alterAddColumn("tier", "STRING")
    // the widened row lands in a chunk that already holds narrow files
    ht.write(wideRow(99000001L, "2024-01-10 01:00:00", "KEEP"))
    val target = ht.showChunks()
      .find(c => c.startMicros <= Timestamp.valueOf("2024-01-10 01:00:00").getTime * 1000L &&
        c.endMicros > Timestamp.valueOf("2024-01-10 01:00:00").getTime * 1000L).get
    // copy-on-write DML rewrite of the mixed chunk keeps the new column
    ht.deleteWhere($"event_type" === "view" &&
      unix_micros($"ts") >= target.startMicros &&
      unix_micros($"ts") < target.endMicros)
    assert(ht.read().where($"tier" === "KEEP").count() === 1)
    // columnstore rewrite of the mixed chunk keeps it too
    Columnstore.compressChunk(spark, target.path,
      Columnstore.Options(orderBy = Seq("ts")))
    assert(ht.read().where($"tier" === "KEEP").count() === 1)
    // and a whole-table aggregate still runs over every chunk width
    assert(ht.read().agg(count(lit(1))).head().getLong(0) ===
      ht.read().where($"tier".isNull).count() + 1)
  }
}
