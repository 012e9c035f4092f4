package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hypertable
import graft.streaming.{CaggDef, ContinuousAggregate}
import graft.{functions => gf}

/** Concurrency/isolation coverage — graft's analogue of the reference's
  * isolation suite (`test/isolation/specs/dropchunks_race.spec`,
  * `tsl/test/isolation/specs/cagg_*.spec`): several threads drive the
  * public surface of ONE hypertable (+ continuous aggregate) at once, and
  * the invariants the scaladocs claim are asserted both mid-flight and at
  * quiescence.
  *
  * Isolation model under test (weaker than the reference's MVCC, stated at
  * [[ContinuousAggregate.refresh]] / [[Hypertable.refreshChunkCatalog]]):
  *  - raw ingest is append-only, so concurrent readers see a PREFIX of the
  *    committed batches — never rows that were not committed, never a chunk
  *    twice (the duplicate-start guard in showChunks throws if the catalog
  *    ever serves one);
  *  - refreshes serialize on the cagg lock file; invalidation-log entries
  *    are cut only from the snapshot a completed materialization actually
  *    saw, so a batch landing mid-refresh is never lost — at quiescence one
  *    repair pass converges the materialization to the exact direct
  *    aggregation;
  *  - catalog snapshots (mutator sync + fresh-handle crash heal) serialize
  *    on a per-path JVM lock, and the swap's no-file window reads as
  *    "stale, re-snapshot" — a reader never observes it as an error.
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = Graft.session("concurrency-spec", "local[8]", 8)

  private def events = Tables.table(spark, "/root/testdata/sf0.001", "events")
  private def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L

  /** Run `body` in a named thread, funneling any throwable into `errs`. */
  private def thread(name: String, errs: ConcurrentLinkedQueue[Throwable])(
      body: => Unit): Thread = {
    val t = new Thread(() => {
      try body
      catch { case e: Throwable => errs.add(e) }
    }, name)
    t.start()
    t
  }

  private def assertNoErrors(errs: ConcurrentLinkedQueue[Throwable]): Unit = {
    val es = errs.toArray(Array.empty[Throwable])
    assert(es.isEmpty, es.map(e =>
      s"${e.getClass.getSimpleName}: ${e.getMessage}").mkString("; "))
  }

  test("concurrent ingest + refresh + read: no lost invalidations, " +
    "prefix-consistent reads, exact convergence") {
    val dir = Files.createTempDirectory("graft_conc").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    val nBatches = 6
    val batch = (0 until nBatches).map(i =>
      events.where(pmod(col("event_id"), lit(nBatches)) === i))
    ht.write(batch(0))
    val batch0Rows = ht.read().count()
    val totalRows = events.count()

    // order-insensitive exact aggregates (no float-sum reorder noise)
    val defn = CaggDef("1 hour", Seq("event_type"), Seq(
      count(lit(1)).as("n"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value")))
    val cagg = ContinuousAggregate.create(spark, s"$dir/cagg", ht, defn)
    cagg.refresh(us("2024-01-01 00:00:00"), us("2024-02-01 00:00:00"))

    val errs = new ConcurrentLinkedQueue[Throwable]()
    val done = new AtomicBoolean(false)

    val writer = thread("conc-writer", errs) {
      (1 until nBatches).foreach { i =>
        ht.write(batch(i))
        Thread.sleep(20)
      }
    }
    // two refreshers race each other on the lock file AND the writer on
    // the invalidation log
    val refreshers = (0 until 2).map(i => thread(s"conc-refresh-$i", errs) {
      while (!done.get()) {
        cagg.refreshInvalidated()
        Thread.sleep(15)
      }
    })
    // readers: shared handle + periodic FRESH handles (fresh handles run
    // the once-per-handle catalogFresh heal, racing the writer's sync)
    val readers = (0 until 2).map(r => thread(s"conc-reader-$r", errs) {
      var k = 0
      while (!done.get()) {
        val h = if (k % 3 == 2) Hypertable.at(spark, s"$dir/ht") else ht
        val n = h.read().count()
        // append-only raw side: every read is a committed prefix
        assert(n >= batch0Rows && n <= totalRows,
          s"read count $n outside committed range [$batch0Rows, $totalRows]")
        // showChunks throws on a duplicate chunk start — the double-read guard
        val chunks = h.showChunks()
        assert(chunks.map(_.startMicros).distinct.size === chunks.size)
        val _ = h.between(us("2024-01-08 00:00:00"), us("2024-01-15 00:00:00")).count()
        k += 1
      }
    })

    writer.join()
    done.set(true)
    (refreshers ++ readers).foreach(_.join())
    assertNoErrors(errs)

    // quiescence: every batch was either materialized by a racing pass or
    // survives in the log (the snapshot-cut contract) — bounded repair
    // passes must drain it
    var rounds = 0
    while (cagg.pendingInvalidations().nonEmpty && rounds < 10) {
      cagg.refreshInvalidated()
      rounds += 1
    }
    assert(cagg.pendingInvalidations().isEmpty,
      s"invalidation log not drained after $rounds repair passes")

    // exact convergence: nothing lost, nothing doubled
    val freshHt = Hypertable.at(spark, s"$dir/ht")
    assert(freshHt.read().count() === totalRows)
    val direct = freshHt.read()
      .groupBy(gf.time_bucket("1 hour", col("ts")).as("bucket"), col("event_type"))
      .agg(defn.aggs.head, defn.aggs.tail: _*)
      .collect().toSet
    assert(cagg.materialized.collect().toSet === direct)
  }

  test("concurrent disjoint DML sweeps serialize: no lost copy-on-write " +
    "rewrites, no rows lost to an append racing a rewrite swap") {
    val dir = Files.createTempDirectory("graft_conc_dml").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    // hold back one slice so an APPEND races the delete rewrites too
    ht.write(events.where(pmod(col("event_id"), lit(5)) =!= 4))
    val appendSlice = events.where(pmod(col("event_id"), lit(5)) === 4)
    val expectDeleted = events
      .where(pmod(col("event_id"), lit(5)).isin(0L, 1L, 2L)).count()
    val expectKept = events.count() - expectDeleted

    val errs = new ConcurrentLinkedQueue[Throwable]()
    // three deleters hit DISJOINT row sets in the SAME chunks: without the
    // per-table mutation monitor each copy-on-write rewrite reads the same
    // base files and the last tmp-swap silently undoes the others
    val deleters = (0 until 3).map(i => thread(s"conc-del-$i", errs) {
      val n = ht.deleteWhere(pmod(col("event_id"), lit(5)) === i)
      assert(n > 0, s"deleter $i matched no rows")
    })
    val appender = thread("conc-append", errs) { ht.write(appendSlice) }
    (deleters :+ appender).foreach(_.join())
    assertNoErrors(errs)
    assert(ht.read().count() === expectKept)
    assert(ht.read().where(pmod(col("event_id"), lit(5)).isin(0L, 1L, 2L)).count() === 0L)
  }

  test("hierarchical caggs: concurrent parent and child refreshes serialize " +
    "on the ancestor chain and converge through the propagation flow") {
    val dir = Files.createTempDirectory("graft_conc_hier").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    val nBatches = 5
    val batch = (0 until nBatches).map(i =>
      events.where(pmod(col("event_id"), lit(nBatches)) === i))
    ht.write(batch(0))
    val hourly = ContinuousAggregate.create(spark, s"$dir/hourly", ht,
      CaggDef("1 hour", Seq("event_type"), Seq(count(lit(1)).as("n"))))
    hourly.refresh(us("2024-01-01 00:00:00"), us("2024-02-01 00:00:00"))
    // child reads the PARENT's materialization — its refresh must
    // serialize against parent mat-chunk swaps (ancestor-chain monitors)
    val daily = ContinuousAggregate.create(spark, s"$dir/daily", hourly.asSource,
      CaggDef("1 day", Seq("event_type"), Seq(sum(col("n")).as("n"))))
    daily.refresh(us("2024-01-01 00:00:00"), us("2024-02-01 00:00:00"))

    val errs = new ConcurrentLinkedQueue[Throwable]()
    val done = new AtomicBoolean(false)
    val writer = thread("hier-writer", errs) {
      (1 until nBatches).foreach { i => ht.write(batch(i)); Thread.sleep(30) }
    }
    val parentRefresher = thread("hier-parent", errs) {
      while (!done.get()) { hourly.refreshInvalidated(); Thread.sleep(15) }
    }
    val childRefresher = thread("hier-child", errs) {
      while (!done.get()) { daily.refreshInvalidated(); Thread.sleep(15) }
    }
    writer.join()
    done.set(true)
    Seq(parentRefresher, childRefresher).foreach(_.join())
    assertNoErrors(errs)

    // quiesce the chain top-down: parent first, then the child picks up
    // the propagated invalidations
    var rounds = 0
    while ((hourly.pendingInvalidations().nonEmpty ||
        daily.pendingInvalidations().nonEmpty) && rounds < 10) {
      hourly.refreshInvalidated(); daily.refreshInvalidated(); rounds += 1
    }
    assert(hourly.pendingInvalidations().isEmpty &&
      daily.pendingInvalidations().isEmpty)
    val directDaily = ht.read()
      .groupBy(gf.time_bucket("1 day", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(daily.materialized.collect().toSet === directDaily.collect().toSet)
  }

  test("parallel per-chunk compression races a DML sweep: different chunks " +
    "compress concurrently, the sweep excludes them, final state exact") {
    val dir = Files.createTempDirectory("graft_conc_cmp").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    ht.write(events)
    val total = events.count()
    val delPred = pmod(col("event_id"), lit(7)) === 3
    val expectDeleted = events.where(delPred).count()
    val opts = graft.sources.Columnstore.Options(
      segmentBy = Seq("event_type"), orderBy = Seq("ts"))

    val errs = new ConcurrentLinkedQueue[Throwable]()
    // one compressor thread per chunk (the policies' Par.foreach shape) —
    // these may run concurrently with EACH OTHER but serialize against the
    // deleter's copy-on-write sweep via the root read/write lock
    val compressors = ht.showChunks().map(c =>
      thread(s"conc-cmp-${c.startMicros}", errs) {
        graft.sources.Columnstore.compressChunk(spark, c.path, opts)
      })
    val deleter = thread("conc-del", errs) {
      assert(ht.deleteWhere(delPred) === expectDeleted)
    }
    (compressors :+ deleter).foreach(_.join())
    assertNoErrors(errs)
    assert(ht.read().count() === total - expectDeleted)
    assert(ht.read().where(delPred).count() === 0L)
    // whichever order each chunk saw (compress→delete-rewrite keeps the
    // columnstore state; delete→compress ends compressed), every chunk
    // must end in columnstore layout
    ht.showChunks().foreach(c =>
      assert(graft.sources.Columnstore.isCompressed(spark, c.path),
        s"chunk ${c.path} lost its columnstore state in the race"))
  }

  test("a tablespace-resident chunk's rewrite serializes against a table " +
    "sweep through the primary-root pointer marker") {
    val dir = Files.createTempDirectory("graft_conc_tblspc").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(events)
    val total = events.count()
    ht.attachTablespace(s"$dir/cold")
    val moved = ht.moveChunk(ht.showChunks().head.startMicros, Some(s"$dir/cold"))
    // the pointer home exists (moveChunk wrote it) — the chunk-level lock
    // resolves to the PRIMARY root even though the dir lives elsewhere
    val fs = new org.apache.hadoop.fs.Path(moved.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(moved.path).getParent, "_graft_primary")))

    val delPred = pmod(col("event_id"), lit(13)) === 5
    val expectDeleted = events.where(delPred).count()
    val opts = graft.sources.Columnstore.Options(orderBy = Seq("ts"))
    val errs = new ConcurrentLinkedQueue[Throwable]()
    // compressors hit every chunk INCLUDING the moved one, racing a DELETE
    // sweep of the whole table: without the marker the moved chunk's
    // rewrite would key a different lock than the sweep and lose updates
    val compressors = ht.showChunks().map(c =>
      thread(s"tblspc-cmp-${c.startMicros}", errs) {
        graft.sources.Columnstore.compressChunk(spark, c.path, opts)
      })
    val deleter = thread("tblspc-del", errs) {
      assert(ht.deleteWhere(delPred) === expectDeleted)
    }
    (compressors :+ deleter).foreach(_.join())
    assertNoErrors(errs)
    assert(ht.read().count() === total - expectDeleted)
    assert(ht.read().where(delPred).count() === 0L)
    ht.showChunks().foreach(c =>
      assert(graft.sources.Columnstore.isCompressed(spark, c.path)))
  }

  test("concurrent fresh handles heal a stale table catalog exactly once " +
    "each, without colliding on the snapshot swap") {
    val dir = Files.createTempDirectory("graft_conc_heal").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    ht.write(events)
    val expect = ht.showChunks().map(c => (c.startMicros, c.endMicros))

    // simulate the crash the heal exists for: data committed, snapshot
    // missing (process died between the data commit and syncChunkCatalog)
    val fs = new org.apache.hadoop.fs.Path(s"$dir/ht")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/ht/_graft_catalog"), true)

    val errs = new ConcurrentLinkedQueue[Throwable]()
    val gate = new CountDownLatch(1)
    val results = new ConcurrentLinkedQueue[Seq[(Long, Long)]]()
    val threads = (0 until 8).map(i => thread(s"conc-heal-$i", errs) {
      val h = Hypertable.at(spark, s"$dir/ht") // fresh handle: heal path armed
      gate.await()
      results.add(h.showChunks().map(c => (c.startMicros, c.endMicros)))
    })
    gate.countDown()
    threads.foreach(_.join())
    assertNoErrors(errs)
    assert(results.size === 8)
    results.forEach(r => assert(r === expect))
    // the healed snapshot serves subsequent reads (no re-listing)
    assert(Hypertable.at(spark, s"$dir/ht").read().count() === events.count())
  }

  test("snapshot isolation: readers NEVER miss a chunk while compress/" +
    "decompress and DML sweeps continuously rewrite the table (gen layout)") {
    // The round-8 contract (SCALE.md §14): a rewrite publishes the next
    // generation and grace-retains the old one, so a reader pinned to any
    // manifest version reads a complete, consistent chunk set — the
    // file-listing analogue of the MVCC snapshot every reference
    // isolation spec leans on. Every op below preserves the row count, so
    // ANY deviation (a transiently-missing chunk, a half-swapped dir, a
    // double-listed generation) is observable as a wrong count or an
    // exception. Round 7's version of this test tolerated the transient;
    // this one does not.
    val dir = Files.createTempDirectory("graft_conc_snap").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    ht.write(events)
    snapshotHammer(ht, events.count())
  }

  test("snapshot isolation holds on a table MIGRATED from the flat layout") {
    // migrateToGenLayout's product must be the same contract a born-gen
    // table has: the identical hammer runs against a flat table (one
    // chunk compressed BEFORE migration, so a converted columnstore
    // chunk is in the rewrite mix) upgraded in place
    val dir = Files.createTempDirectory("graft_conc_snapmig").toString
    val flat = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days")
    flat.write(events)
    graft.sources.Columnstore.compressChunk(spark,
      flat.showChunks().head.path,
      graft.sources.Columnstore.Options(orderBy = Seq("ts")))
    snapshotHammer(flat.migrateToGenLayout(), events.count())
  }

  /** `total` is the INDEPENDENTLY-known expected row count — deriving it
    * from `ht.read()` would re-baseline the hammer on a table already
    * damaged by write/migration bugs.
    */
  private def snapshotHammer(ht: Hypertable, total: Long): Unit = {
    val window = (Timestamp.valueOf("2024-01-08 00:00:00"),
      Timestamp.valueOf("2024-01-22 00:00:00"))
    val windowCount = ht.read().where(
      col("ts") >= lit(window._1) && col("ts") < lit(window._2)).count()
    val opts = graft.sources.Columnstore.Options(orderBy = Seq("ts"))
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val stop = new AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val readers = (0 until 3).map(i => thread(s"snap-reader-$i", errs) {
      while (!stop.get()) {
        // full read (memoized scan, pinned file listing) and a between
        // window (fresh per-call listing of only the hit generations)
        assert(ht.read().count() === total, "full read lost rows mid-sweep")
        assert(ht.between(window._1, window._2).count() === windowCount,
          "between() lost rows mid-sweep")
        reads.incrementAndGet()
      }
    })
    val compressor = thread("snap-compress", errs) {
      var i = 0
      while (i < 3) {
        ht.showChunks().foreach(c =>
          graft.sources.Columnstore.compressChunk(spark, c.path, opts))
        ht.showChunks().foreach(c =>
          graft.sources.Columnstore.decompressChunk(spark, c.path))
        i += 1
      }
    }
    val dml = thread("snap-dml", errs) {
      var i = 0
      while (i < 4) {
        // count-preserving copy-on-write rewrite of every touched chunk
        val n = ht.updateWhere(pmod(col("event_id"), lit(5)) === (i % 5),
          Map("value" -> (col("value") + lit(0.0))))
        assert(n > 0)
        i += 1
      }
    }
    compressor.join(); dml.join()
    stop.set(true)
    readers.foreach(_.join())
    assertNoErrors(errs)
    assert(reads.get() >= 10, s"readers only completed ${reads.get()} loops")
    // the sweeps really did publish generations (and the live set moved on)
    val gens = ht.showChunks().map(c =>
      "_gen=(\\d+)".r.findFirstMatchIn(c.path).map(_.group(1).toInt).getOrElse(-1))
    assert(gens.forall(_ > 0), s"expected advanced generations, got $gens")
    assert(ht.read().count() === total)
  }

  test("drop_chunks racing a continuous compress sweep: no deadlock, the " +
    "drop always wins (deadlock_drop_chunks_compress.spec + tombstone-abort)") {
    // the reference's test/isolation/specs/deadlock_dropchunks_select /
    // compression race class: drop takes the table write lock +
    // catalog lock, compress the root read lock + chunk monitor +
    // catalog lock — same order everywhere, so the interleaving must
    // complete without deadlock, and every compress whose snapshot
    // predates the drop must DISCARD its publish (tombstone-abort;
    // a committed publish above the tombstone would resurrect the chunk)
    val dir = Files.createTempDirectory("graft_conc_dropcomp").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    ht.write(events)
    val chunks = ht.showChunks().sortBy(_.startMicros)
    val opts = graft.sources.Columnstore.Options(orderBy = Seq("ts"))
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val compressor = thread("dropcomp-compress", errs) {
      // stale snapshot on purpose: keeps compressing the ORIGINAL chunk
      // list while the dropper tombstones it out from under the sweep
      (1 to 3).foreach { _ =>
        chunks.foreach(c =>
          graft.sources.Columnstore.compressChunk(spark, c.path, opts))
      }
    }
    val dropper = thread("dropcomp-drop", errs) {
      chunks.foreach { c =>
        ht.dropChunks(Some(c.endMicros), None)
        Thread.sleep(20L)
      }
    }
    compressor.join(120000L); dropper.join(120000L)
    assert(!compressor.isAlive && !dropper.isAlive,
      "drop/compress interleaving deadlocked")
    assertNoErrors(errs)
    assert(ht.showChunks().isEmpty && ht.read().count() === 0,
      "a racing compress resurrected dropped chunks")
  }

  test("drop_chunks racing concurrent SELECTs: every observed count is a " +
    "pre-drop or post-drop prefix, never a partial (dropchunks_race.spec)") {
    // the reference's test/isolation/specs/dropchunks_race.spec outcome:
    // a SELECT concurrent with drop_chunks sees the chunk set before or
    // after the drop — never a half-dropped table. Gen layout: drops
    // tombstone (the manifest stops listing; pinned readers keep their
    // grace-retained files), so the only observable counts are the
    // drop-prefix sums.
    val dir = Files.createTempDirectory("graft_conc_dropsel").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    ht.write(events)
    val chunks = ht.showChunks().sortBy(_.startMicros)
    val perChunk = chunks.map(c =>
      ht.between(c.startMicros, c.endMicros).count())
    val total = perChunk.sum
    // counts observable mid-drop: total minus each oldest-first prefix
    val valid = (0 to chunks.size).map(k => total - perChunk.take(k).sum).toSet
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val stop = new AtomicBoolean(false)
    val observed = new ConcurrentLinkedQueue[Long]()
    val readers = (0 until 3).map(i => thread(s"dropsel-reader-$i", errs) {
      while (!stop.get()) observed.add(ht.read().count())
    })
    val dropper = thread("dropsel-dropper", errs) {
      chunks.foreach { c =>
        ht.dropChunks(Some(c.endMicros), None)
        Thread.sleep(50L)
      }
    }
    dropper.join()
    stop.set(true)
    readers.foreach(_.join())
    assertNoErrors(errs)
    assert(observed.size > 0)
    observed.forEach { n =>
      assert(valid(n), s"reader observed partial drop state: $n not in $valid")
    }
    assert(ht.showChunks().isEmpty && ht.read().count() === 0)
  }
}
