package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, Hypertable}

/** Randomized equivalence of the SQL admin surface against the Scala API:
  * the same operation sequence applied through `spark.sql("SELECT
  * compress_chunk(...)")` and through direct method calls must leave two
  * hypertables in EXACTLY the same state — same chunk set, same rows, same
  * per-chunk compression/frozen flags. A divergence means the SQL parser
  * or argument plumbing changed semantics, not just syntax.
  */
class SqlAdminModelSpec extends AnyFunSuite {
  lazy val spark = Graft.session("sql-admin-model-spec", "local[4]", 4)
  import spark.implicits._

  private def events(n: Int, seed: Int) = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (new java.sql.Timestamp(base.getTime + rnd.nextInt(14 * 86400) * 1000L),
        rnd.nextInt(20).toLong, rnd.nextDouble() * 100)
    }.toDF("ts", "user_id", "value")
  }

  private def state(ht: Hypertable): (Seq[(Long, Boolean, Boolean)], Long, String) = {
    val chunks = ht.showChunks().map { c =>
      (c.startMicros,
        Columnstore.isCompressed(spark, c.path),
        ht.chunkStatusText(c).contains("FROZEN"))
    }
    val rows = ht.read().count()
    val hash = ht.read()
      .select(md5(concat_ws("|", col("ts").cast("string"),
        col("user_id").cast("string"), col("value").cast("string"))).as("h"))
      .agg(expr("xxhash64(sort_array(collect_list(h)))").cast("string"))
      .as[String].head()
    (chunks, rows, hash)
  }

  test("random mutation sequences: catalog='table' tracks catalog='list' exactly") {
    // the table-catalog snapshot must stay correct through ANY mutation
    // order, not just the scripted HypertableSpec round-trip
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 2) {
      val listPath = Files.createTempDirectory(s"graft_cmodel_l$trial").toString + "/ht"
      val tblPath = Files.createTempDirectory(s"graft_cmodel_t$trial").toString + "/ht"
      Hypertable.create(spark, listPath, "ts", chunkWidth = "1 day")
      Hypertable.create(spark, tblPath, "ts", chunkWidth = "1 day",
        catalog = "table")
      def lHt = Hypertable.at(spark, listPath)
      def tHt = Hypertable.at(spark, tblPath)
      val seed = rnd.nextInt()
      lHt.write(events(300, seed)); tHt.write(events(300, seed))
      for (step <- 0 until 10) {
        val chunks = lHt.showChunks()
        rnd.nextInt(5) match {
          case 0 if chunks.size >= 2 =>
            // merge two adjacent chunks (if an adjacent pair exists)
            chunks.sliding(2).find { case Seq(x, y) => x.endMicros == y.startMicros }
              .foreach { case Seq(x, y) =>
                lHt.mergeChunks(x.startMicros, y.startMicros)
                tHt.mergeChunks(x.startMicros, y.startMicros)
              }
          case 1 if chunks.nonEmpty =>
            val c = chunks(rnd.nextInt(chunks.size))
            if (c.endMicros - c.startMicros >= 2) {
              val at = c.startMicros + (c.endMicros - c.startMicros) / 2
              lHt.splitChunk(c.startMicros, at); tHt.splitChunk(c.startMicros, at)
            }
          case 2 if chunks.nonEmpty =>
            val cutoff = chunks(rnd.nextInt(chunks.size)).startMicros
            lHt.dropChunks(Some(cutoff), None); tHt.dropChunks(Some(cutoff), None)
          case 3 =>
            val s2 = rnd.nextInt()
            lHt.write(events(40, s2)); tHt.write(events(40, s2))
          case _ => ()
        }
        val a = lHt.showChunks().map(c => (c.startMicros, c.endMicros))
        val b = tHt.showChunks().map(c => (c.startMicros, c.endMicros))
        assert(a === b, s"trial $trial step $step: chunk sets diverged")
        assert(lHt.read().count() === tHt.read().count(),
          s"trial $trial step $step: row counts diverged")
      }
    }
  }

  test("random dimension-DDL sequences match the Scala API state exactly") {
    val rnd = new scala.util.Random(20260815L)
    val extraCols = Seq("user_id", "value")
    for (trial <- 0 until 3) {
      val sqlPath = Files.createTempDirectory(s"graft_dmodel_sql$trial").toString + "/ht"
      val apiPath = Files.createTempDirectory(s"graft_dmodel_api$trial").toString + "/ht"
      spark.sql(s"SELECT create_hypertable('$sqlPath', 'ts', INTERVAL '1 day')")
      Hypertable.create(spark, apiPath, "ts", chunkWidth = "1 day")
      // dimension DDL applies while the table is empty (like the
      // reference's "hypertable has chunks" rule for add_dimension)
      for (step <- 0 until 6) {
        def sqlHt = Hypertable.at(spark, sqlPath)
        def apiHt = Hypertable.at(spark, apiPath)
        rnd.nextInt(4) match {
          case 0 =>
            val free = extraCols.filterNot(c => sqlHt.spaceDims.exists(_._1 == c))
            if (free.nonEmpty) {
              val c = free(rnd.nextInt(free.size))
              val n = 2 + rnd.nextInt(3)
              if (rnd.nextBoolean())
                spark.sql(s"SELECT add_dimension('$sqlPath', by_hash('$c', $n))").collect()
              else
                spark.sql(s"SELECT add_dimension('$sqlPath', '$c', $n)").collect()
              apiHt.addDimension(c, n)
            }
          case 1 if sqlHt.spaceDims.nonEmpty =>
            val dims = sqlHt.spaceDims
            val (c, _, _) = dims(rnd.nextInt(dims.size))
            val n = 2 + rnd.nextInt(6)
            spark.sql(s"SELECT set_number_partitions('$sqlPath', $n, '$c')").collect()
            apiHt.setNumberPartitions(c, n)
          case 2 =>
            val days = 1 + rnd.nextInt(4)
            spark.sql(s"SELECT set_partitioning_interval('$sqlPath', INTERVAL '$days days')").collect()
            apiHt.setPartitioningInterval(s"$days days")
          case _ => ()
        }
        assert(sqlHt.spaceDims === apiHt.spaceDims,
          s"trial $trial step $step: dimensions diverged")
        assert(sqlHt.chunkWidthMicros === apiHt.chunkWidthMicros,
          s"trial $trial step $step: chunk width diverged")
      }
      // identical data lands identically under the final layout
      val seed = rnd.nextInt()
      Hypertable.at(spark, sqlPath).write(events(300, seed))
      Hypertable.at(spark, apiPath).write(events(300, seed))
      val (c1, r1, h1) = state(Hypertable.at(spark, sqlPath))
      val (c2, r2, h2) = state(Hypertable.at(spark, apiPath))
      assert(c1 === c2 && r1 === r2 && h1 === h2, s"trial $trial: final state diverged")
    }
  }

  test("random SQL op sequences match the Scala API state exactly") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 3) {
      val sqlPath = Files.createTempDirectory(s"graft_model_sql$trial").toString + "/ht"
      val apiPath = Files.createTempDirectory(s"graft_model_api$trial").toString + "/ht"
      spark.sql(s"SELECT create_hypertable('$sqlPath', 'ts', INTERVAL '1 day')")
      val apiHt = Hypertable.create(spark, apiPath, "ts", chunkWidth = "1 day")
      def sqlHt = Hypertable.at(spark, sqlPath)
      for (h <- Seq(sqlHt, apiHt))
        h.setColumnstoreSettings(Columnstore.Options(
          segmentBy = Seq("user_id"), orderBy = Seq("ts")))

      val seed = rnd.nextInt()
      sqlHt.write(events(400, seed))
      apiHt.write(events(400, seed))

      for (step <- 0 until 12) {
        val sqlChunks = sqlHt.showChunks()
        if (sqlChunks.nonEmpty) {
          val pick = sqlChunks(rnd.nextInt(sqlChunks.size))
          val apiPick = apiHt.showChunks().find(_.startMicros == pick.startMicros).get
          val frozen = sqlHt.chunkStatusText(pick).contains("FROZEN")
          val compressed = Columnstore.isCompressed(spark, pick.path)
          rnd.nextInt(6) match {
            case 0 if !frozen && !compressed =>
              spark.sql(s"SELECT compress_chunk('${pick.path}')").collect()
              Columnstore.compressChunk(spark, apiPick.path,
                Columnstore.resolveOptions(apiHt))
            case 1 if !frozen && compressed =>
              spark.sql(s"SELECT decompress_chunk('${pick.path}')").collect()
              Columnstore.decompressChunk(spark, apiPick.path)
            case 2 =>
              spark.sql(s"SELECT freeze_chunk('${pick.path}')").collect()
              apiHt.freezeChunk(apiPick.startMicros)
            case 3 =>
              spark.sql(s"SELECT unfreeze_chunk('${pick.path}')").collect()
              apiHt.unfreezeChunk(apiPick.startMicros)
            case 4 =>
              // drop everything strictly before the picked chunk
              val cutoff = pick.startMicros
              spark.sql(s"SELECT drop_chunks('$sqlPath', $cutoff)").collect()
              apiHt.dropChunks(Some(cutoff), None)
            case 5 if !sqlChunks.exists(c =>
                sqlHt.chunkStatusText(c).contains("FROZEN")) =>
              // append a small late batch through both (writes into
              // frozen chunks are rejected — correctly — on both sides)
              val s2 = rnd.nextInt()
              sqlHt.write(events(40, s2))
              apiHt.write(events(40, s2))
            case _ => () // guard miss: state unchanged on both sides
          }
        }
        val (c1, r1, h1) = state(sqlHt)
        val (c2, r2, h2) = state(apiHt)
        assert(c1 === c2, s"trial $trial step $step: chunk state diverged")
        assert(r1 === r2 && h1 === h2,
          s"trial $trial step $step: row content diverged")
      }
    }
  }
}
