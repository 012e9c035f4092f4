package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, Hypertable}

/** Tablespaces + move_chunk (`tsl/src/chunk_api.c`, `src/tablespace.c`,
  * `sql/ddl_api.sql` attach/detach_tablespace): chunks relocated to other
  * storage roots stay fully live — reads union the roots with chunk
  * exclusion on each, appends fold into the moved dirs, maintenance
  * resolves chunks at their current location.
  */
class TablespaceSpec extends AnyFunSuite {
  lazy val spark = Graft.session("tablespace-spec", "local[4]", 4)

  private def events = Tables.table(spark, "/root/testdata/sf0.001", "events")

  private def fresh(): (Hypertable, String) = {
    val dir = Files.createTempDirectory("graft_tblspc").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(events)
    (ht, dir)
  }

  /** All parquet leaf scans of a plan, unwrapping AQE. */
  private def leafScans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect { case f: FileSourceScanExec => f }
  }

  test("move_chunk relocates; reads union roots; answers unchanged") {
    val (ht, dir) = fresh()
    val before = ht.read().groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = ht.showChunks()
    assert(all.size === 5)

    ht.attachTablespace(s"$dir/cold")
    assert(ht.showTablespaces === Seq(s"$dir/cold"))
    val moved = ht.moveChunk(all.head.startMicros, Some(s"$dir/cold"))
    assert(moved.path.contains("/cold/"))
    // catalog still sees 5 chunks, one of them at the new root
    val after = ht.showChunks()
    assert(after.size === 5)
    assert(after.head.path === moved.path)
    // answers identical through the union read
    val now = ht.read().groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(now === before)
  }

  test("chunk exclusion prunes each storage root's scan independently") {
    val (ht, dir) = fresh()
    ht.attachTablespace(s"$dir/cold")
    val all = ht.showChunks()
    all.take(2).foreach(c => ht.moveChunk(c.startMicros, Some(s"$dir/cold")))

    // a range covering only the 2 moved chunks: the tablespace scan keeps
    // both partitions, the primary scan keeps none
    val df = ht.read().where(col("ts") < new Timestamp(all(1).endMicros / 1000))
    val scans = leafScans(df)
    assert(scans.nonEmpty)
    val parts = scans.map(_.selectedPartitions.partitionCount)
    assert(parts.sum === 2,
      s"expected 2 chunk partitions total across roots, got $parts")

    // a range covering only primary-resident chunks prunes the moved ones
    val df2 = ht.read().where(col("ts") >= new Timestamp(all(2).startMicros / 1000))
    assert(leafScans(df2).map(_.selectedPartitions.partitionCount).sum === 3)
  }

  test("appends into moved chunks fold into the tablespace dir") {
    val (ht, dir) = fresh()
    val total = ht.read().count()
    ht.attachTablespace(s"$dir/cold")
    val first = ht.showChunks().head
    val chunkRowsBefore = spark.read.parquet(first.path).count()
    val movedPath = ht.moveChunk(first.startMicros, Some(s"$dir/cold")).path

    // append rows that route into the MOVED chunk (same time range)
    val late = events.where(
      col("ts") < new Timestamp(first.endMicros / 1000)).limit(100)
    val nLate = late.count()
    ht.write(late)

    // no stub dir left under the primary root; rows land in the moved dir
    assert(!ht.showChunks().exists(c =>
      c.startMicros == first.startMicros && !c.path.contains("/cold/")))
    assert(ht.read().count() === total + nLate)
    assert(spark.read.parquet(movedPath).count() === chunkRowsBefore + nLate)
  }

  test("a CRASHED relocation's primary-root stub: fresh handles refuse " +
    "loudly (duplicate start), the owning session's next write heals it") {
    // since round 9 fresh rows write DIRECTLY into the owning root, so a
    // stub only exists from a pre-r9 crash (or external tooling) — the
    // relocate path is now pure heal. Build the stub by hand.
    val (ht, dir) = fresh()
    val total = ht.read().count()
    ht.attachTablespace(s"$dir/cold")
    val first = ht.showChunks().head
    ht.moveChunk(first.startMicros, Some(s"$dir/cold"))
    val stubRows = events
      .where(col("ts") < new Timestamp(first.endMicros / 1000)).limit(7)
    val refCols = spark.read.parquet(ht.showChunks().head.path).columns
    stubRows.select(refCols.map(col): _*).coalesce(1).write
      .parquet(s"$dir/ht/_chunk=${first.startMicros}")
    // a FRESH handle re-snapshots and sees the chunk in two roots: the
    // documented loud refusal, never a double-counted read
    val e = intercept[IllegalStateException] {
      Hypertable.at(spark, s"$dir/ht").read().count()
    }
    assert(e.getMessage.contains("multiple storage roots"))
    // the session that owns the table (warm catalog memo) heals on its
    // next write: relocateFreshWrites folds the stub into the moved dir
    ht.write(events.limit(0)) // empty batch still runs the heal
    assert(ht.read().count() === total + 7)
    assert(Hypertable.at(spark, s"$dir/ht").read().count() === total + 7)
    assert(!new java.io.File(s"$dir/ht/_chunk=${first.startMicros}").exists())
  }

  test("maintenance resolves moved chunks: compress + merge in place") {
    val (ht, dir) = fresh()
    ht.attachTablespace(s"$dir/cold")
    val all = ht.showChunks()
    val a = ht.moveChunk(all(0).startMicros, Some(s"$dir/cold"))
    val b = ht.moveChunk(all(1).startMicros, Some(s"$dir/cold"))

    // columnstore conversion operates on the tablespace-resident path
    Columnstore.compressChunk(spark, a.path, Columnstore.Options(Seq("event_type"), Seq("ts")))
    assert(Columnstore.isCompressed(spark, a.path))

    // merge keeps the earlier (moved) chunk's root; decompressed first so
    // the merge result stays rowstore
    Columnstore.decompressChunk(spark, a.path)
    val merged = ht.mergeChunksConcurrently(Seq(a.startMicros, b.startMicros))
    assert(merged.path.contains("/cold/"))
    assert(ht.showChunks().size === 4)
    assert(ht.read().count() === events.count())
  }

  test("detach_tablespace refuses while chunks live there; empty detach ok") {
    val (ht, dir) = fresh()
    ht.attachTablespace(s"$dir/cold")
    intercept[IllegalArgumentException](ht.attachTablespace(s"$dir/cold"))
    val first = ht.showChunks().head
    ht.moveChunk(first.startMicros, Some(s"$dir/cold"))
    intercept[IllegalArgumentException](ht.detachTablespace(s"$dir/cold"))
    // move back to primary, then detach succeeds
    val home = ht.moveChunk(first.startMicros, None)
    assert(!home.path.contains("/cold/"))
    assert(ht.detachTablespaces() === Seq(s"$dir/cold"))
    assert(ht.showTablespaces.isEmpty)
    intercept[IllegalArgumentException](ht.detachTablespace(s"$dir/cold"))
  }

  test("hypertable_detailed_size counts tablespace-resident chunks") {
    val (ht, dir) = fresh()
    val before = graft.operators.Stats.hypertableDetailedSize(ht)
    assert(before.tableBytes > 0 && before.totalBytes >= before.tableBytes)
    ht.attachTablespace(s"$dir/cold")
    ht.moveChunk(ht.showChunks().head.startMicros, Some(s"$dir/cold"))
    val after = graft.operators.Stats.hypertableDetailedSize(ht)
    // moving storage must not change accounted data bytes
    assert(after.tableBytes === before.tableBytes)
    assert(graft.operators.Stats.hypertableSize(ht) === after.totalBytes)
  }

  test("a pre-marker tablespace layout heals _graft_primary on open") {
    // layouts written before round 7's pointer-home marker existed: the
    // per-chunk mutation lock falls back to keying on the tablespace dir
    // itself — a different monitor than table-level sweeps use. Opening
    // the table stamps the marker so legacy layouts get the fix.
    val (ht, dir) = fresh()
    ht.attachTablespace(s"$dir/cold")
    ht.moveChunk(ht.showChunks().head.startMicros, Some(s"$dir/cold"))
    val tsDir = ht.tablespaceTableDir(s"$dir/cold")
    val fs = tsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(tsDir, "_graft_primary")
    assert(fs.exists(marker))
    fs.delete(marker, false) // simulate the pre-round-7 layout
    val reopened = Hypertable.at(spark, ht.path)
    reopened.showChunks()
    assert(fs.exists(marker), "reopen did not heal the pointer-home marker")
    val stamped = Hypertable.readSmallFile(fs, marker).trim
    assert(stamped === fs.makeQualified(
      new org.apache.hadoop.fs.Path(ht.path)).toString)
  }

  test("a start LIVE at the primary with a graced tombstone at a " +
    "tablespace: appends route to the live root, not the dead dir") {
    // merge absorbs a cold-resident chunk (tombstoning its tablespace
    // dir for the grace window), then a split recreates the SAME start
    // live at the primary — tuple routing must send that start's rows
    // to the live generation's actual root; writing them into the
    // tombstoned tablespace dir would make them invisible to every
    // reader and eventually GC'd (silent loss of acked rows).
    val dir = Files.createTempDirectory("graft_tblspc").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts",
      chunkWidth = "7 days", catalog = "table")
    ht.write(events)
    ht.attachTablespace(s"$dir/cold")
    val all = ht.showChunks().sortBy(_.startMicros)
    val a = all(0); val b = all(1)
    ht.moveChunk(b.startMicros, Some(s"$dir/cold"))
    ht.mergeChunksConcurrently(Seq(a.startMicros, b.startMicros))
    ht.splitChunk(a.startMicros, b.startMicros)
    val liveB = ht.showChunks().find(_.startMicros == b.startMicros).get
    assert(!liveB.path.contains("/cold/"),
      "split should recreate the upper half at the primary root")
    // b's tombstoned dir still sits at the cold root (graced)
    val tsDir = ht.tablespaceTableDir(s"$dir/cold")
    val cfs = tsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val coldB = cfs.listStatus(tsDir).map(_.getPath)
      .find(_.getName.startsWith("_chunk="))
    assert(coldB.isDefined, "expected the absorbed cold dir to be graced")

    val total = ht.read().count()
    val coldFilesBefore =
      cfs.getContentSummary(coldB.get).getFileCount
    val late = events.where(
      col("ts") >= new Timestamp(b.startMicros / 1000) &&
      col("ts") < new Timestamp(b.endMicros / 1000)).limit(50)
    val nLate = late.count()
    assert(nLate > 0)
    ht.write(late)
    // every acked row is visible through the normal read path...
    assert(ht.read().count() === total + nLate)
    // ...and none leaked into the tombstoned cold dir
    assert(cfs.getContentSummary(coldB.get).getFileCount === coldFilesBefore,
      "append wrote files into the tombstoned tablespace dir")
  }

  test("drop() removes tablespace-resident chunk dirs too") {
    val (ht, dir) = fresh()
    ht.attachTablespace(s"$dir/cold")
    ht.moveChunk(ht.showChunks().head.startMicros, Some(s"$dir/cold"))
    val tsDir = ht.tablespaceTableDir(s"$dir/cold")
    val fs = tsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(tsDir))
    ht.drop()
    assert(!fs.exists(tsDir))
  }
}
