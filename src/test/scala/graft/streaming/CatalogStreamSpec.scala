package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, Hypertable}
import graft.Tables

/** [[Hypertable.readStreamCatalog]] — the catalog-backed streaming source
  * (GraftStreamSource): per-trigger discovery tails `_graft_stream_log/`
  * entries (O(new files), not FileStreamSource's O(all files) re-listing),
  * the initial snapshot resolves from the manifest (dead generations
  * excluded by construction), and REWRITES never re-emit — maintenance
  * can overlap a running stream.
  */
class CatalogStreamSpec extends AnyFunSuite {
  lazy val spark = graft.Graft.session("catalog-stream-spec", "local[4]", 4)
  import spark.implicits._

  private def events = Tables.table(spark, "/root/testdata/sf0.001", "events")

  private def drainTo(ht: Hypertable, ckpt: String,
      seen: java.util.Queue[Long], sawCols: StringBuilder = new StringBuilder,
      startingPosition: String = "earliest"): Unit = {
    val q = ht.readStreamCatalog(startingPosition = startingPosition)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (sawCols.isEmpty) { sawCols ++= df.columns.mkString(","); () }
        df.select("event_id").collect().foreach(r => seen.add(r.getLong(0)))
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
  }

  test("earliest drain equals the batch read; a second drain of the same " +
    "checkpoint sees ONLY appends (exactly-once)") {
    val dir = Files.createTempDirectory("graft_catstream").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    val (early, late) = (events.where(dayofmonth($"ts") <= 20),
      events.where(dayofmonth($"ts") > 20))
    ht.write(early)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val cols = new StringBuilder
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen, cols)
    assert(cols.toString.contains("_chunk"),
      s"stream must surface the partition column like readStream: $cols")
    assert(!cols.toString.contains("_gen"))
    assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
      === early.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
    ht.write(late)
    drainTo(ht, ckpt, seen)
    assert(seen.size === events.count())
    assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
      === events.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("latest: the pre-start snapshot is skipped; only post-start appends " +
    "emit") {
    val dir = Files.createTempDirectory("graft_catstream_latest").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    val (early, late) = (events.where(dayofmonth($"ts") <= 20),
      events.where(dayofmonth($"ts") > 20))
    ht.write(early)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen, startingPosition = "latest")
    assert(seen.isEmpty, s"latest start must not emit the snapshot: ${seen.size}")
    ht.write(late)
    drainTo(ht, ckpt, seen, startingPosition = "latest")
    assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
      === late.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("REWRITES between drains never re-emit: compress + DML + merge can " +
    "overlap the stream's lifetime") {
    val dir = Files.createTempDirectory("graft_catstream_rw").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    val (early, late) = (events.where(dayofmonth($"ts") <= 20),
      events.where(dayofmonth($"ts") > 20))
    ht.write(early)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen)
    val afterFirst = seen.size
    // rewrite machinery between drains: every one of these produces NEW
    // part files whose rows were already delivered — the file-tailing
    // readStream would re-emit them all; the catalog source must not
    val opts = Columnstore.Options(orderBy = Seq("ts"))
    val cs = ht.showChunks().sortBy(_.startMicros)
    Columnstore.compressChunk(spark, cs.head.path, opts)
    ht.updateWhere(col("event_id") === -1L, Map("value" -> lit(0.0)))
    ht.mergeChunks(cs(1).startMicros, cs(2).startMicros)
    ht.write(late) // and a real append on top
    drainTo(ht, ckpt, seen)
    assert(seen.size === afterFirst + late.count(),
      "a rewrite's files re-emitted (or an append was lost)")
    assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
      === events.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("a stream started during a GC grace window: the manifest snapshot " +
    "excludes dead generations and dropped dirs, keeps rebirth rows") {
    val dir = Files.createTempDirectory("graft_catstream_gen").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days",
      catalog = "table", spaceCol = Some("user_id"), spacePartitions = 2)
    ht.write(events)
    val chunks = ht.showChunks().sortBy(_.startMicros)
    // superseded gen retained in grace; dropped dir tombstoned; rebirth
    Columnstore.compressChunk(spark, chunks.head.path,
      Columnstore.Options(orderBy = Seq("ts")))
    val dropped = chunks(1)
    ht.dropChunks(Some(dropped.endMicros), None) // drops chunks 0 and 1? no:
    // endMicros bound drops every chunk ending at/before it — chunk 0 and 1
    val reIngest = events.where(col("ts") >= new java.sql.Timestamp(
      dropped.startMicros / 1000) && col("ts") < new java.sql.Timestamp(
      dropped.endMicros / 1000)).limit(40)
    val nRe = reIngest.count()
    ht.write(reIngest) // rebirth generation above the tombstone
    val expected = ht.read().count()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    drainTo(ht, s"$dir/ckpt", seen)
    assert(seen.size === expected,
      s"snapshot must equal the batch read (incl. $nRe rebirth rows)")
  }

  test("appends into tablespace-resident chunks flow (multi-root log paths)") {
    val dir = Files.createTempDirectory("graft_catstream_ts").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    ht.write(events.where(dayofmonth($"ts") <= 20))
    ht.attachTablespace(s"$dir/cold")
    val first = ht.showChunks().head
    ht.moveChunk(first.startMicros, Some(s"$dir/cold"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen)
    val base = seen.size
    // rows routing into the MOVED chunk write directly to the cold root —
    // the log records cold-root paths and the source reads them
    val late = events.where(col("ts") < new java.sql.Timestamp(
      first.endMicros / 1000)).limit(60)
    ht.write(late)
    drainTo(ht, ckpt, seen)
    assert(seen.size === base + late.count())
  }

  for (seed <- Seq(11L, 23L, 41L))
    test("a RUNNING catalog stream under a random maintenance history " +
      s"delivers every appended row exactly once (seed=$seed)") {
      // the catalog source is an APPEND FEED: rewrites (compress/merge/
      // split/DML) never re-emit, and rows already delivered stay
      // delivered across later deletes/drops — so the oracle is strict:
      // the sink must hold exactly the union of appended slices, each id
      // once, no matter what maintenance interleaves
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft_catstream_fz$seed").toString
      val ht = Hypertable.create(spark, s"$dir/ht", "ts",
        chunkWidth = "7 days", catalog = "table")
      ht.write(events.where(pmod(col("event_id"), lit(5)) === 0))
      val appended = scala.collection.mutable.Set[Long](
        events.where(pmod(col("event_id"), lit(5)) === 0)
          .select("event_id").collect().map(_.getLong(0)).toIndexedSeq: _*)
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = ht.readStreamCatalog()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("event_id").collect().foreach(r => seen.add(r.getLong(0)))
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200))
        .start()
      val opts = Columnstore.Options(orderBy = Seq("ts"))
      var unwritten = rnd.shuffle((1 until 5).toList)
      try {
        (1 to 12).foreach { _ =>
          val cs = ht.showChunks().sortBy(_.startMicros)
          rnd.nextInt(8) match {
            case 0 | 1 if unwritten.nonEmpty =>
              val k = unwritten.head; unwritten = unwritten.tail
              val slice = events.where(pmod(col("event_id"), lit(5)) === k)
              ht.write(slice)
              appended ++= slice.select("event_id").collect().map(_.getLong(0))
            case 2 if cs.nonEmpty =>
              Columnstore.compressChunk(spark,
                cs(rnd.nextInt(cs.size)).path, opts)
            case 3 if cs.nonEmpty =>
              Columnstore.decompressChunk(spark, cs(rnd.nextInt(cs.size)).path)
            case 4 =>
              val pairs = cs.sliding(2).filter {
                case Seq(a, b) => a.endMicros == b.startMicros
                case _ => false
              }.toSeq
              if (pairs.nonEmpty) {
                val Seq(a, b) = pairs(rnd.nextInt(pairs.size)): @unchecked
                ht.mergeChunks(a.startMicros, b.startMicros)
              }
            case 5 if cs.nonEmpty =>
              try ht.splitChunk(cs(rnd.nextInt(cs.size)).startMicros)
              catch { case _: IllegalArgumentException => () } // collision
            case 6 =>
              ht.deleteWhere(pmod(col("event_id"), lit(97))
                === rnd.nextInt(97))
            case _ if cs.size > 2 =>
              ht.dropChunks(Some(cs.head.endMicros), None)
            case _ => ()
          }
        }
        q.processAllAvailable()
      } finally q.stop()
      val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      assert(got.length === got.distinct.length,
        s"[seed=$seed] a rewrite or replay re-emitted rows")
      assert(got.toSet === appended.toSet,
        s"[seed=$seed] appended-feed mismatch: missing=${
          (appended.toSet -- got.toSet).take(5)} extra=${
          (got.toSet -- appended.toSet).take(5)}")
    }

  test("stream-log journal: a crash between the job commit and the log " +
    "append heals — the batch's files surface on the next logging batch") {
    val dir = Files.createTempDirectory("graft_catstream_journal").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    def slice(k: Int) = events.where(pmod(col("event_id"), lit(3)) === k)
    ht.write(slice(0))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen) // snapshot; log enabled from here on
    // crash AFTER the parquet job commit, BEFORE the stream-log append
    // (write.before_sync sits exactly in that window): the rows are on
    // disk and batch-visible, but no entry was written — pre-round-11
    // the stream silently diverged forever
    Hypertable.crashHook = name =>
      if (name == "write.before_sync")
        throw new Hypertable.InjectedCrash(name)
    try intercept[Hypertable.InjectedCrash] { ht.write(slice(1)) }
    finally Hypertable.crashHook = _ => ()
    // next logging batch heals the journal (its own entry follows)
    ht.write(slice(2))
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length, "journal heal re-emitted rows")
    assert(got.sorted.toSeq === events.select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq,
      "the crashed batch's committed rows must reach the stream via the journal")
  }

  test("checkpoint compaction: b-files fold into a compact file, restarts " +
    "read the compacted state, exactly-once holds throughout") {
    val dir = Files.createTempDirectory("graft_catstream_compact").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    spark.conf.set("spark.graft.stream.compactEvery", "1")
    try {
      def slice(k: Int) = events.where(pmod(col("event_id"), lit(6)) === k)
      ht.write(slice(0))
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val ckpt = s"$dir/ckpt"
      (0 to 4).foreach { i =>
        if (i > 0) ht.write(slice(i))
        drainTo(ht, ckpt, seen) // each drain restarts the source
      }
      ht.write(slice(5))
      drainTo(ht, ckpt, seen)
      val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      assert(got.length === got.distinct.length,
        "a restart over a compacted checkpoint replayed rows")
      assert(got.sorted.toSeq === events.select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq)
      // the state actually compacted: one c-file, no b-files at or below it
      val metaDir = new java.io.File(s"$ckpt/sources/0/graft-batches")
      val names = metaDir.listFiles().map(_.getName).filterNot(_.endsWith(".crc"))
      val cIds = names.filter(_.startsWith("c")).map(_.stripPrefix("c").toLong)
      assert(cIds.nonEmpty, s"no compact file was written: ${names.toSeq}")
      val bIds = names.filter(n => n.startsWith("b") && !n.startsWith("batch"))
        .map(_.stripPrefix("b").toLong)
      assert(bIds.forall(_ > cIds.max),
        s"compacted b-files must be deleted: b=${bIds.toSeq} c=${cIds.toSeq}")
      assert(cIds.length === 1, s"superseded compact files must be deleted: ${cIds.toSeq}")
    } finally spark.conf.unset("spark.graft.stream.compactEvery")
  }

  test("bucketed log layout: entries land in t<hour> subdirs; a legacy " +
    "flat entry at the log root is still consumed and dedup'd") {
    val dir = Files.createTempDirectory("graft_catstream_bucket").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    val (early, late) = (events.where(dayofmonth($"ts") <= 20),
      events.where(dayofmonth($"ts") > 20))
    ht.write(early)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen)
    ht.write(late)
    // entries are bucketed now
    val fs = new org.apache.hadoop.fs.Path(s"$dir/ht")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new org.apache.hadoop.fs.Path(s"$dir/ht/_graft_stream_log")
    val buckets = fs.listStatus(logDir).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("t"))
    assert(buckets.nonEmpty, "append entries must land in bucket subdirs")
    val entry = fs.listStatus(buckets.head.getPath)
      .filter(_.getPath.getName.startsWith("e_")).head.getPath
    // a legacy (pre-bucketing) flat entry with the SAME file list: the
    // source must list it AND dedup its files against the bucketed twin
    val body = graft.streaming.CatalogStreamCore.readText(fs, entry)
    graft.streaming.CatalogStreamCore.writeText(fs,
      new org.apache.hadoop.fs.Path(logDir,
        s"e_${System.currentTimeMillis()}_legacy1"), body)
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length,
      "legacy-entry overlap must dedup by path")
    assert(got.sorted.toSeq === events.select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq)
  }

  // SPARK_GRAFT_STREAM_CRASH_SEEDS widens the evidence pass (default 2)
  for (seed <- (0 until sys.env.getOrElse(
      "SPARK_GRAFT_STREAM_CRASH_SEEDS", "2").toInt).map(7L + 12 * _))
    test("catalog stream vs CRASHED writes: journaled entries converge the " +
      s"stream to exactly the table's committed rowset (seed=$seed)") {
      // writes are killed at random publish boundaries (after the job
      // commit, before the catalog sync / log append). Their rows ARE on
      // disk — batch readers see them — so the stream must converge to
      // the same rowset via the .pending journal heal, exactly once.
      val rnd = new scala.util.Random(seed)
      def injected(t: Throwable): Boolean = {
        var c: Throwable = t
        while (c != null) {
          if (c.isInstanceOf[Hypertable.InjectedCrash]) return true
          c = c.getCause
        }
        false
      }
      val dir = Files.createTempDirectory(s"graft_catstream_cr$seed").toString
      val ht = Hypertable.create(spark, s"$dir/ht", "ts",
        chunkWidth = "7 days", catalog = "table")
      def slice(k: Int) = events.where(pmod(col("event_id"), lit(9)) === k)
      ht.write(slice(0))
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = ht.readStreamCatalog()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("event_id").collect().foreach(r => seen.add(r.getLong(0)))
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.ProcessingTime(200))
        .start()
      try {
        (1 to 8).foreach { k =>
          if (rnd.nextBoolean()) {
            val target = rnd.nextInt(2) // after_job / before_sync
            val calls = new java.util.concurrent.atomic.AtomicInteger(0)
            Hypertable.crashHook = name =>
              if (calls.getAndIncrement() == target)
                throw new Hypertable.InjectedCrash(name)
            try ht.write(slice(k))
            catch { case t: Throwable if injected(t) => () }
            finally Hypertable.crashHook = _ => ()
          } else ht.write(slice(k))
        }
        // quiesce: a settle write heals pending journals, then drain
        Hypertable.at(spark, s"$dir/ht").write(events.limit(0))
        q.processAllAvailable()
      } finally { q.stop(); Hypertable.crashHook = _ => () }
      val table = Hypertable.at(spark, s"$dir/ht").read()
        .select("event_id").collect().map(_.getLong(0))
      val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      assert(got.length === got.distinct.length,
        s"[seed=$seed] journal heal re-emitted rows")
      assert(got.sorted.toSeq === table.sorted.toSeq,
        s"[seed=$seed] stream diverged from the committed table: " +
          s"missing=${(table.toSet -- got.toSet).take(5)} " +
          s"extra=${(got.toSet -- table.toSet).take(5)}")
    }

  test("an empty table streams with an explicit schema; writes flow in") {
    val dir = Files.createTempDirectory("graft_catstream_empty").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    val withChunk = org.apache.spark.sql.types.StructType(
      events.schema.fields :+
        org.apache.spark.sql.types.StructField("_chunk",
          org.apache.spark.sql.types.LongType))
    val stream = ht.readStreamCatalog(schema = Some(withChunk))
    ht.write(events.limit(50))
    val q = stream.writeStream.format("memory").queryName("cat_empty_sink")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("cat_empty_sink").count() === 50)
  }
}
