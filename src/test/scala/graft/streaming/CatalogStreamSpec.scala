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

  private def logDirOf(tableDir: String) =
    new org.apache.hadoop.fs.Path(s"$tableDir/_graft_stream_log")

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Rename the v2 entry holding `seq` so its embedded writer ts shifts
    * by `deltaMs` — simulating an appender HOST whose wall clock is
    * skewed (entry names are the only place writer clocks appear).
    */
  private def skewEntry(tableDir: String, seq: Long, deltaMs: Long): Unit = {
    val fs = fsOf(tableDir)
    val log = logDirOf(tableDir)
    fs.listStatus(log).filter(d => d.isDirectory &&
        Hypertable.streamBucketIdxOf(d.getPath.getName) >= 0).foreach { d =>
      fs.listStatus(d.getPath).filter(_.isFile).foreach { st =>
        val name = st.getPath.getName
        if (Hypertable.streamEntrySeq(name) == seq) {
          val parts = name.split('_')
          val ts = parts(2).toLong + deltaMs
          fs.rename(st.getPath, new org.apache.hadoop.fs.Path(d.getPath,
            s"${parts(0)}_${parts(1)}_${ts}_${parts(3)}"))
        }
      }
    }
  }

  test("seq-bucketed log layout: entries land in s<seq/512> subdirs with " +
    "consecutive seqs; a root-flat legacy entry is ignored by the reader " +
    "(round 13 deleted the legacy branches — fold-on-write owns legacy " +
    "delivery) and folded by the next write") {
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
    val fs = fsOf(s"$dir/ht")
    val logDir = logDirOf(s"$dir/ht")
    val buckets = fs.listStatus(logDir).filter(s =>
      s.isDirectory && Hypertable.streamBucketIdxOf(s.getPath.getName) >= 0)
    assert(buckets.nonEmpty, "append entries must land in seq-bucket subdirs")
    val entries = buckets.flatMap(b => fs.listStatus(b.getPath))
      .filter(_.getPath.getName.startsWith("e_"))
    val seqs = entries.map(st =>
      Hypertable.streamEntrySeq(st.getPath.getName)).sorted.toSeq
    assert(seqs === (0L until seqs.size).toSeq,
      s"verified entries must be consecutive from 0: $seqs")
    // a legacy (pre-seq) flat entry with the SAME file list: the reader
    // IGNORES it (its branches were deleted round 13); the next write
    // folds it into a seq bucket, where path-dedup absorbs the overlap
    val body = graft.streaming.CatalogStreamCore.readText(fs,
      entries.last.getPath)
    graft.streaming.CatalogStreamCore.writeText(fs,
      new org.apache.hadoop.fs.Path(logDir,
        s"e_${System.currentTimeMillis()}_legacy1"), body)
    drainTo(ht, ckpt, seen)
    assert(fs.listStatus(logDir).exists(s =>
      s.isFile && s.getPath.getName.startsWith("e_")),
      "the reader must leave the legacy entry for the fold, not consume it")
    // the fold needs a fresh-listing write: drop any held claim first
    spark.conf.set("spark.graft.stream.seqClaimHoldMs", "0")
    try ht.write(late.limit(1)
      .withColumn("event_id", col("event_id") + 2000000))
    finally spark.conf.unset("spark.graft.stream.seqClaimHoldMs")
    assert(!fs.listStatus(logDir).exists(s =>
      s.isFile && s.getPath.getName.startsWith("e_")),
      "the next write must fold the legacy entry into a seq bucket")
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length,
      "folded legacy-entry overlap must dedup by path")
    assert(got.sorted.toSeq === (events.select("event_id").collect()
      .map(_.getLong(0)).toSeq :+
      (late.select("event_id").limit(1).head().getLong(0) + 2000000))
      .sorted)
  }

  test("writer clock skew CANNOT floor an appender out of the stream: " +
    "entries named ±30 min apart converge to the exact rowset (round-11 " +
    "verdict item 1 — the pre-round-12 wall-clock floor lost the slow " +
    "writer's batch)") {
    val dir = Files.createTempDirectory("graft_catstream_skew").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    def slice(k: Int) = events.where(pmod(col("event_id"), lit(3)) === k)
    ht.write(slice(0))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen)
    // writer A's host clock runs 30 min FAST: its entry is future-dated.
    // Processing it pushed the old wall-clock floor basis 30 min ahead —
    // 20 min past the 10 min skew window.
    ht.write(slice(1))
    skewEntry(s"$dir/ht", 1L, 1800000L)
    drainTo(ht, ckpt, seen)
    // writer B's host clock runs 30 min SLOW: pre-round-12 this entry sat
    // a full hour below the floor basis and was skipped as "guaranteed
    // already processed" — silent, restart-surviving data loss. The seq
    // floor doesn't read clocks at all.
    ht.write(slice(2))
    skewEntry(s"$dir/ht", 2L, -1800000L)
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length, "skewed entries re-emitted")
    assert(got.sorted.toSeq === events.select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq,
      "a clock-skewed writer's batch was floored out of the stream")
  }

  test("legacy layouts fold into seq buckets on the FIRST write (round-11 " +
    "verdict item 4): the root and t<hour> dirs empty out, overlapping " +
    "migrated entries dedup by path, nothing is lost") {
    val dir = Files.createTempDirectory("graft_catstream_migrate").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    // per-batch claims: this test retro-writes LEGACY entries between two
    // writes — production legacy state predates any held claim (the fold
    // happens on a claim session's first, fresh-listing write)
    spark.conf.set("spark.graft.stream.seqClaimHoldMs", "0")
    try {
    def slice(k: Int) = events.where(pmod(col("event_id"), lit(3)) === k)
    ht.write(slice(0))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen) // snapshot covers slice 0; log enabled
    // recreate the pre-round-12 on-disk state: write slice 1 (one v2
    // entry), then demote that entry into BOTH legacy layouts — a
    // root-flat round-10 entry and a t<hour> round-11 bucket entry with
    // the same file list (concurrent-appender overlap was legal then)
    ht.write(slice(1))
    val fs = fsOf(s"$dir/ht")
    val logDir = logDirOf(s"$dir/ht")
    val v2entry = fs.listStatus(logDir)
      .filter(d => d.isDirectory &&
        Hypertable.streamBucketIdxOf(d.getPath.getName) >= 0)
      .flatMap(d => fs.listStatus(d.getPath)).filter(_.isFile)
      .map(_.getPath).head
    val body = graft.streaming.CatalogStreamCore.readText(fs, v2entry)
    val now = System.currentTimeMillis()
    graft.streaming.CatalogStreamCore.writeText(fs,
      new org.apache.hadoop.fs.Path(logDir, s"e_${now}_r10leg"), body)
    graft.streaming.CatalogStreamCore.writeText(fs,
      new org.apache.hadoop.fs.Path(logDir,
        s"t${now / Hypertable.STREAM_LOG_BUCKET_MS}/e_${now}_r11leg"), body)
    fs.delete(v2entry, false)
    fs.delete(new org.apache.hadoop.fs.Path(logDir, "_hw"), false)
    // the first round-12 write migrates, then appends its own entry
    ht.write(slice(2))
    val top = fs.listStatus(logDir).toSeq
    assert(!top.exists(s => s.isFile && s.getPath.getName.startsWith("e_")),
      "root-flat legacy entries must fold into seq buckets on first write")
    assert(!top.exists(s => s.isDirectory && s.getPath.getName.startsWith("t") &&
      s.getPath.getName.drop(1).forall(_.isDigit)),
      "emptied t<hour> dirs must be removed")
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length,
      "migrated twin entries must dedup by path")
    assert(got.sorted.toSeq === events.select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq)
    } finally spark.conf.unset("spark.graft.stream.seqClaimHoldMs")
  }

  test("restart reaps compaction-crash orphans: b/c files at/below the " +
    "compact id are deleted (round-11 verdict item 5) and state holds") {
    val dir = Files.createTempDirectory("graft_catstream_orphan").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    spark.conf.set("spark.graft.stream.compactEvery", "1")
    try {
      def slice(k: Int) = events.where(pmod(col("event_id"), lit(3)) === k)
      ht.write(slice(0))
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val ckpt = s"$dir/ckpt"
      drainTo(ht, ckpt, seen)
      ht.write(slice(1))
      drainTo(ht, ckpt, seen)
      val metaDir = new java.io.File(s"$ckpt/sources/0/graft-batches")
      val cid = metaDir.listFiles().map(_.getName)
        .filter(n => n.startsWith("c") && !n.endsWith(".crc"))
        .map(_.stripPrefix("c").toLong).max
      // a compaction crash between the c-write and the b-deletes leaves
      // orphans at/below the compact id; if the stream then stops forever,
      // nothing ever reaps them — restart must
      val orphanB = new java.io.File(metaDir, s"b${math.max(0, cid - 1)}")
      val orphanC = new java.io.File(metaDir, s"c${math.max(0, cid - 1)}")
      val mfs = fsOf(metaDir.toString)
      graft.streaming.CatalogStreamCore.writeText(mfs,
        new org.apache.hadoop.fs.Path(orphanB.toString), "#ts=1\n#seq=-1")
      graft.streaming.CatalogStreamCore.writeText(mfs,
        new org.apache.hadoop.fs.Path(orphanC.toString), "#seq=-1")
      ht.write(slice(2))
      drainTo(ht, ckpt, seen) // restart
      assert(!orphanB.exists(), "restart must reap b-orphans ≤ compact id")
      assert(!orphanC.exists(), "restart must reap superseded c-orphans")
      val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      assert(got.length === got.distinct.length)
      assert(got.sorted.toSeq === events.select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq)
    } finally spark.conf.unset("spark.graft.stream.compactEvery")
  }

  test("expired seq buckets are deleted WHOLE at compaction cadence, and " +
    "the pruning-surviving high-water keeps the sequence monotonic — a " +
    "table idle past retention cannot restart seqs under a standing " +
    "reader's floor") {
    val dir = Files.createTempDirectory("graft_catstream_gc").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    spark.conf.set("spark.graft.stream.compactEvery", "1")
    // per-batch claims: the test splices a synthetic frontier entry into
    // the log between writes — external log surgery a held claim's cached
    // allocation is (correctly) blind to
    spark.conf.set("spark.graft.stream.seqClaimHoldMs", "0")
    try {
      def slice(k: Int) = events.where(pmod(col("event_id"), lit(4)) === k)
      ht.write(slice(0))
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val ckpt = s"$dir/ckpt"
      drainTo(ht, ckpt, seen)
      ht.write(slice(1)); ht.write(slice(2))
      drainTo(ht, ckpt, seen)
      // bucket s0 (seqs 0..2) goes wholly past retention; a young
      // frontier entry sits in bucket s1 (seq 512 — duplicate file list,
      // dedup'd by path), so only s0 is prunable
      val fs = fsOf(s"$dir/ht")
      val logDir = logDirOf(s"$dir/ht")
      def bucketDirs = fs.listStatus(logDir).filter(d => d.isDirectory &&
        Hypertable.streamBucketIdxOf(d.getPath.getName) >= 0)
      val s0entries = fs.listStatus(
        new org.apache.hadoop.fs.Path(logDir, "s0")).filter(_.isFile)
      val maxSeqBefore = s0entries
        .map(st => Hypertable.streamEntrySeq(st.getPath.getName)).max
      (0L to maxSeqBefore).foreach(s =>
        skewEntry(s"$dir/ht", s, -8L * 24 * 3600 * 1000))
      val body = graft.streaming.CatalogStreamCore.readText(fs,
        fs.listStatus(new org.apache.hadoop.fs.Path(logDir, "s0"))
          .filter(_.isFile).head.getPath)
      graft.streaming.CatalogStreamCore.writeText(fs,
        new org.apache.hadoop.fs.Path(logDir,
          s"s1/${"e_%012d".format(512L)}_${System.currentTimeMillis()}_syn1"),
        body)
      // the next write allocates ABOVE the synthetic frontier (513), and
      // its drain's compaction GC prunes s0 whole
      ht.write(slice(3))
      drainTo(ht, ckpt, seen)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(logDir, "s0")),
        s"the expired bucket must be GC'd whole: ${bucketDirs.map(_.getPath).toSeq}")
      val newSeqs = bucketDirs
        .flatMap(d => fs.listStatus(d.getPath)).filter(_.isFile)
        .map(st => Hypertable.streamEntrySeq(st.getPath.getName))
      assert(newSeqs.forall(_ >= 512L),
        s"post-frontier seqs must stay above pruned history: ${newSeqs.toSeq}")
      // the floor snaps past the pruned bucket on the next pass and the
      // standing checkpoint still receives later appends exactly once
      val hw = graft.streaming.CatalogStreamCore.readText(fs,
        new org.apache.hadoop.fs.Path(logDir, "_hw")).trim.toLong
      assert(hw >= 513L, s"high-water must cover every allocated seq: $hw")
      drainTo(ht, ckpt, seen)
      val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      assert(got.length === got.distinct.length, "post-GC replay")
      assert(got.sorted.toSeq === events.select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq,
        "a post-GC append was floored out by a restarted sequence")
    } finally {
      spark.conf.unset("spark.graft.stream.compactEvery")
      spark.conf.unset("spark.graft.stream.seqClaimHoldMs")
    }
  }

  test("seq-claim takeover mid-append: the post-write ownership verify " +
    "REDOES the allocation under a fresh claim; the stale twin entry " +
    "dedups by path and the reader stays exactly-once") {
    val dir = Files.createTempDirectory("graft_catstream_tko").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    def slice(k: Int) = events.where(pmod(col("event_id"), lit(2)) === k)
    ht.write(slice(0))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen) // snapshot; log enabled
    val fs = fsOf(s"$dir/ht")
    val logDir = logDirOf(s"$dir/ht")
    val claim = new org.apache.hadoop.fs.Path(logDir, ".seq_claim")
    // between the entry write and the ownership verify, the claim is
    // taken over (this writer "paused past staleness"; the marker left
    // behind is the taker-over's, already gone stale again so the redo
    // can arbitrate it instead of waiting out a live heartbeat)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Hypertable.crashHook = name =>
      if (name == "write.streamlog.after_entry" &&
          fired.compareAndSet(false, true)) {
        val old = System.currentTimeMillis() - 900000
        val out = fs.create(claim, true)
        out.write(s"takeover-proc\n$old\n$old".getBytes("UTF-8"))
        out.close()
        fs.setTimes(claim, old, -1)
      }
    try ht.write(slice(1))
    finally Hypertable.crashHook = _ => ()
    assert(fired.get, "the takeover hook must have fired")
    // the redo leaves TWO entries naming slice 1's files: the stale twin
    // (first attempt) and the verified retry, on consecutive seqs
    val entries = fs.listStatus(logDir)
      .filter(d => d.isDirectory &&
        Hypertable.streamBucketIdxOf(d.getPath.getName) >= 0)
      .flatMap(d => fs.listStatus(d.getPath)).filter(_.isFile)
      .map(_.getPath)
    val bodies = entries.map(p =>
      graft.streaming.CatalogStreamCore.readText(fs, p).linesIterator
        .filter(_.nonEmpty).toSet)
    // slice 0 predates the log (the snapshot covers it), so the log holds
    // exactly the first attempt (stale twin) and the verified retry, on
    // consecutive seqs with identical file lists
    assert(entries.length === 2,
      s"expected twin + retry: ${entries.map(_.getName).toSeq}")
    assert(entries.map(p => Hypertable.streamEntrySeq(p.getName)).sorted
      .toSeq === Seq(0L, 1L))
    assert(bodies.distinct.length === 1,
      "twin and retry must carry the same file list")
    // round 13: the redo's fresh claim may be RETAINED for amortization
    // (seqClaimHoldMs) — released on idle; what matters is it is OURS
    // (never the stale taker-over's leftover)
    assert(!fs.exists(claim) ||
      graft.streaming.CatalogStreamCore.readText(fs, claim)
        .startsWith(Hypertable.processId),
      "a retained claim must be this process's own")
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length,
      "the stale twin re-emitted its files")
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
            // after_job / before_sync / streamlog.after_entry (the last
            // crashes INSIDE the seq-claim critical section: entry
            // visible, high-water behind, claim released on the error
            // path — the journal heal must still converge)
            val target = rnd.nextInt(3)
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

  test("winner-commits-then-reader-processes-then-LOSER-TWIN: a late " +
    "stale twin at an already-processed seq is skipped without loss — " +
    "its files arrive via the loser's redo at a fresh seq, exactly once " +
    "(the appendStreamLog scaladoc's safety argument, pinned)") {
    val dir = Files.createTempDirectory("graft_catstream_twin2").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    def slice(k: Int) = events.where(pmod(col("event_id"), lit(3)) === k)
    ht.write(slice(0))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen) // snapshot; log enabled
    ht.write(slice(1)) // the WINNER's verified entry at seq 0
    drainTo(ht, ckpt, seen) // the reader PROCESSES seq 0 (floor = 0)
    val fs = fsOf(s"$dir/ht")
    val logDir = logDirOf(s"$dir/ht")
    val root = new org.apache.hadoop.fs.Path(s"$dir/ht")
    // the paused LOSER's batch: files committed by the job, no log entry
    // (write.before_sync crashes between the job commit and the append);
    // its journal is removed — the loser is PAUSED, not crashed, and its
    // redo below is the delivery path under test
    val pre = Hypertable.listDataFilesRec(fs, root).toSet
    Hypertable.crashHook = name =>
      if (name == "write.before_sync")
        throw new Hypertable.InjectedCrash(name)
    try intercept[Hypertable.InjectedCrash] { ht.write(slice(2)) }
    finally Hypertable.crashHook = _ => ()
    fs.delete(new org.apache.hadoop.fs.Path(logDir, ".pending"), true)
    val g = (Hypertable.listDataFilesRec(fs, root).toSet -- pre).toSeq.sorted
    assert(g.nonEmpty, "the crashed job must have committed files")
    // the loser wakes and writes its TWIN at the winner's seq 0 — same
    // seq, DIFFERENT file list than the verified entry the reader already
    // processed. The protocol guarantees this ordering (the twin can only
    // exist after the winner's verified entry was visible), so the
    // seq-keyed skip can never drop a verified entry — only the twin.
    val now = System.currentTimeMillis()
    graft.streaming.CatalogStreamCore.writeText(fs,
      new org.apache.hadoop.fs.Path(logDir,
        s"s0/${Hypertable.streamEntryName(0L, now)}"), g.mkString("\n"))
    drainTo(ht, ckpt, seen)
    val mid = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(mid.length === mid.distinct.length,
      "the twin must be skipped, not re-processed")
    val gIds = slice(2).select("event_id").collect().map(_.getLong(0)).sorted
    assert(!mid.contains(gIds.head),
      "the twin alone delivers nothing — delivery is the redo's job")
    // the loser's REDO under a fresh claim: same files, fresh seq
    graft.streaming.CatalogStreamCore.writeText(fs,
      new org.apache.hadoop.fs.Path(logDir,
        s"s0/${Hypertable.streamEntryName(1L, now)}"), g.mkString("\n"))
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length,
      "twin + redo must dedup by path")
    assert(got.sorted.toSeq === events.select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq,
      "the loser's batch must arrive exactly once via the redo")
  }

  test("reader-side journal heal: an appender crash mid-batch on a table " +
    "that then goes PERMANENTLY idle still delivers the committed batch " +
    "(round-12 advisor: the heal ran only on the next write before)") {
    val dir = Files.createTempDirectory("graft_catstream_idleheal").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    def slice(k: Int) = events.where(pmod(col("event_id"), lit(2)) === k)
    ht.write(slice(0))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    drainTo(ht, ckpt, seen) // snapshot; log enabled
    // the appender dies between the job commit and the log append — its
    // journal stays pending and NOTHING ever writes this table again
    Hypertable.crashHook = name =>
      if (name == "write.before_sync")
        throw new Hypertable.InjectedCrash(name)
    try intercept[Hypertable.InjectedCrash] { ht.write(slice(1)) }
    finally Hypertable.crashHook = _ => ()
    // the reader's next START heals the journal (an own-process journal
    // heals immediately; a foreign crashed appender's after gate.staleMs)
    // and the same drain delivers the batch
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length,
      "the heal must not duplicate rows")
    assert(got.sorted.toSeq === events.select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq,
      "the idle table's crashed batch must reach the stream via the " +
        "reader-side heal")
  }

  test("seq-claim amortization: back-to-back batches HOLD the claim and " +
    "allocate consecutive seqs without re-listing; a `.seq_want` " +
    "contender is yielded to at the next batch; a stale (paused) holder " +
    "is still taken over within staleMs (verdict r12 item 3)") {
    val dir = Files.createTempDirectory("graft_catstream_hold").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    def slice(k: Int) = events.where(pmod(col("event_id"), lit(4)) === k)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = s"$dir/ckpt"
    ht.write(slice(0))
    drainTo(ht, ckpt, seen) // snapshot; log enabled
    val fs = fsOf(s"$dir/ht")
    val logDir = logDirOf(s"$dir/ht")
    val claim = new org.apache.hadoop.fs.Path(logDir, ".seq_claim")
    ht.write(slice(1)) // seq 0, fresh acquire
    assert(fs.exists(claim) &&
      graft.streaming.CatalogStreamCore.readText(fs, claim)
        .startsWith(Hypertable.processId),
      "the claim must be RETAINED (held) after the batch")
    ht.write(slice(2)) // seq 1 from the cached allocation, no re-acquire
    val seqs = fs.listStatus(logDir)
      .filter(d => d.isDirectory &&
        Hypertable.streamBucketIdxOf(d.getPath.getName) >= 0)
      .flatMap(d => fs.listStatus(d.getPath)).filter(_.isFile)
      .map(st => Hypertable.streamEntrySeq(st.getPath.getName)).sorted.toSeq
    assert(seqs === Seq(0L, 1L),
      s"held-claim batches must allocate consecutive seqs: $seqs")
    // a contender writes `.seq_want`: the holder's NEXT batch yields the
    // hold, re-contends, and still commits (the contender here is
    // simulated — nothing actually races the re-acquisition)
    graft.streaming.CatalogStreamCore.writeText(fs,
      new org.apache.hadoop.fs.Path(logDir, ".seq_want"), "contender-1")
    ht.write(slice(3)) // must yield, re-acquire, commit seq 2
    assert(!fs.exists(new org.apache.hadoop.fs.Path(logDir, ".seq_want")),
      "the next acquirer must consume the want marker")
    // the idle releaser drops the hold once no batches follow (a writer
    // that stopped streaming must not starve other appenders)
    val dl = System.currentTimeMillis() + 15000
    while (fs.exists(claim) && System.currentTimeMillis() < dl)
      Thread.sleep(100)
    assert(!fs.exists(claim), "the idle releaser must drop the hold")
    // a PAUSED holder (heartbeat frozen past staleMs): a foreign claimant
    // takes the claim over at once via the staleness arbitration — the
    // hold adds no takeover latency beyond the existing staleMs contract
    val now = System.currentTimeMillis()
    val old = now - 900000
    val out = fs.create(claim, true)
    out.write(s"paused-writer\n$old\n$old".getBytes("UTF-8"))
    out.close()
    fs.setTimes(claim, old, -1)
    val taken = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      graft.sources.MutationGate.claimOwnerOverride.set("foreign-taker")
      try {
        taken.set(graft.sources.MutationGate.tryClaimExclusive(spark, fs,
          claim, None))
        if (taken.get) graft.sources.MutationGate.removeMarker(fs, claim)
      } finally graft.sources.MutationGate.claimOwnerOverride.remove()
    })
    t.start(); t.join(30000)
    assert(taken.get, "a stale held claim must be takeable within staleMs")
    assert(!fs.exists(claim))
    // the writer resumes after the idle release: a fresh acquire, fresh
    // listing, next consecutive seq — exactly-once end to end
    ht.write(slice(0).limit(1)
      .withColumn("event_id", col("event_id") + 1000000))
    drainTo(ht, ckpt, seen)
    val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length === got.distinct.length,
      "hold/yield/takeover must keep the stream exactly-once")
    assert(got.toSet.size === events.count() + 1,
      "every batch incl. the post-takeover one must be delivered")
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
