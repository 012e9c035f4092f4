package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import graft.sources.Hypertable

/** Catalog/log plumbing for the catalog-backed streaming source
  * ([[org.apache.spark.sql.graftstream.GraftStreamSource]] — that class
  * lives under the `org.apache.spark.sql` package tree for access to
  * Spark's `private[sql]` V1 streaming SPI; everything graft-specific is
  * HERE, where `private[graft]` members are reachable).
  *
  * Why a custom source at all: Spark's `FileStreamSource` re-lists the
  * table's entire file set every micro-batch (and at start) — measured
  * 14.2 s at 10,080 chunks, SCALE.md §16, and O(files) per trigger
  * forever after. Graft already owns the authoritative change feed: every
  * `write()` batch appends a `_graft_stream_log/` entry naming EXACTLY
  * the files its job committed. Tailing that log makes per-trigger
  * discovery O(new files + the floor window): entries bucket into hourly
  * subdirs, buckets below the processed floor are skipped without
  * listing, and buckets past retention are deleted whole — so the cost
  * is the current/previous bucket's entry count, independent of table
  * width AND of how long the log has accumulated (the round-10 version
  * listed every entry within retention each trigger). The one-time
  * initial snapshot (earliest start) enumerates live chunks from the
  * MANIFEST — dead/graced generations and tombstoned dirs are never
  * listed, so the dead-at-start filtering readStream needs a file-path
  * blocklist for comes free here.
  * Rewrites (compress/merge/DML) never appear in the log, so their
  * re-encoded files never re-emit — a STRONGER contract than the
  * file-tailing append-only one (readStream's scaladoc).
  */
object CatalogStreamCore {

  /** Log-entry retention: a stream down longer than this may miss appends
    * pruned from the log (restart with a fresh checkpoint to resnapshot).
    */
  def logRetainMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.stream.logRetainMs", "604800000").toLong

  def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // small-file IO re-exports for the sql-package source class (the
  // Hypertable primitives are private[graft])
  def readText(fs: FileSystem, p: Path): String =
    Hypertable.readSmallFile(fs, p)
  def writeText(fs: FileSystem, p: Path, s: String): Unit =
    Hypertable.writeSmallFile(fs, p, s)

  def enableLog(spark: SparkSession, tablePath: String): Unit =
    Hypertable.enableStreamLog(fsOf(spark, tablePath), tablePath)

  /** (output schema, relation schema, partition column names). The
    * relation schema feeds the per-root parquet relation (includes the
    * `_gen` physical column on gen layouts); the output schema is what
    * the stream emits (matches `readStream`: data + `_chunk` [+ `_space`],
    * no `_gen`).
    */
  /** (output schema, relation schema, partition cols, the opened handle —
    * reuse it for the snapshot; each fresh open re-resolves the manifest).
    */
  def schemas(spark: SparkSession, tablePath: String,
      userSchema: Option[StructType], handle: Option[Hypertable] = None)
      : (StructType, StructType, Seq[String], Hypertable) = {
    val ht = handle.getOrElse(Hypertable.at(spark, tablePath))
    val genLayout = ht.genLayout
    userSchema match {
      case Some(s) =>
        val rel =
          if (genLayout && !s.fieldNames.contains("_gen"))
            StructType(s.fields :+ org.apache.spark.sql.types.StructField(
              "_gen", org.apache.spark.sql.types.IntegerType))
          else s
        val parts = rel.fieldNames.filter(n =>
          n == "_chunk" || n == "_gen" || n.startsWith("_space")).toSeq
        (s, rel, parts, ht)
      case None =>
        val cs = ht.showChunks()
        require(cs.nonEmpty,
          "hypertable has no chunks yet — pass an explicit schema to " +
            "readStreamCatalog (parquet cannot infer one from an empty table)")
        val c = new Path(cs.head.path)
        val root = Hypertable.storageRootOf(c)
        val rel = spark.read.option("basePath", root.toString)
          .parquet(c.toString).schema
        val out = StructType(rel.fields.filterNot(_.name == "_gen"))
        val parts = rel.fieldNames.filter(n =>
          n == "_chunk" || n == "_gen" || n.startsWith("_space")).toSeq
        (out, rel, parts, ht)
    }
  }

  /** One-time initial snapshot: every LIVE chunk's data files, resolved
    * from the manifest (graced/tombstoned generations never listed) —
    * parallel per-chunk listings, the only O(chunks) step in the source's
    * life (first start only; per-trigger work is O(new files)).
    */
  def openTable(spark: SparkSession, tablePath: String): Hypertable =
    Hypertable.at(spark, tablePath)

  def snapshotFiles(spark: SparkSession, tablePath: String,
      handle: Option[Hypertable] = None): Seq[String] = {
    val ht = handle.getOrElse(Hypertable.at(spark, tablePath))
    // wide parallelism: these are tiny metadata calls (one listStatus per
    // chunk), so the listing is latency-bound, not CPU-bound — 32 threads
    // cut the 10k-chunk snapshot to ~1 s (ScaleProbe stream_start_catalog)
    graft.Par.map(ht.showChunks(), parallelism = 32) { c =>
      val d = new Path(c.path)
      Hypertable.listDataFilesRec(
        d.getFileSystem(spark.sparkContext.hadoopConfiguration), d)
    }.flatten
  }

  /** The wall-clock a log entry's name embeds; -1 when unparsable. */
  def entryTs(name: String): Long = scala.util.Try(
    name.stripPrefix("e_").takeWhile(_.isDigit).toLong).getOrElse(-1L)

  /** How far below the highest PROCESSED entry ts an entry may still
    * appear. Must exceed the writer naming-to-visibility delay (one
    * small-file write plus worst-case process pause) PLUS the wall-clock
    * skew between concurrent WRITER hosts (entry names embed each
    * writer's own clock) — the 10 min default is generous for both.
    * Entries below `maxProcessedTs - floorSkewMs` are guaranteed already
    * processed, so the source skips them — and whole buckets below the
    * floor — without reading, making per-trigger listing
    * O(new files + floor window) instead of O(entries within retention).
    */
  def floorSkewMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.stream.floorSkewMs", "600000").toLong

  /** Unprocessed log entries, oldest first: (entry name, file paths).
    *
    * Listing is bucket-aware: one listStatus of the log root yields the
    * `t<epochHour>` bucket dirs; buckets wholly past retention are
    * deleted recursively, buckets wholly below `floorTs` (< 0 = no
    * floor, e.g. first pass after a restart) are skipped unread, and
    * only the remainder — the floor window, typically the current and
    * previous hour — is descended into. Legacy flat entries at the root
    * (pre-round-11 layout) keep working: listed every pass, pruned
    * per-entry.
    */
  def newLogEntries(spark: SparkSession, tablePath: String,
      processed: java.util.Set[String], floorTs: Long)
      : Seq[(String, Seq[String])] = {
    val fs = fsOf(spark, tablePath)
    val dir = new Path(tablePath, Hypertable.STREAM_LOG)
    val retain = logRetainMs(spark)
    val bucket = Hypertable.STREAM_LOG_BUCKET_MS
    val now = System.currentTimeMillis()
    val top =
      try fs.listStatus(dir).toSeq
      catch { case _: java.io.FileNotFoundException => return Nil }
    val bucketed = top
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("t"))
      .flatMap { d =>
        val idx = scala.util.Try(
          d.getPath.getName.stripPrefix("t").toLong).getOrElse(-1L)
        if (idx < 0) Nil
        else if (now - (idx + 1) * bucket > retain) {
          // the whole bucket aged out: one recursive delete, no per-entry
          // listing — this is also what bounds the on-disk entry count
          try fs.delete(d.getPath, true)
          catch { case _: java.io.IOException => () }
          Nil
        } else if (floorTs >= 0 && (idx + 1) * bucket <= floorTs)
          Nil // wholly below the floor: every entry inside is processed
        else
          try fs.listStatus(d.getPath).toSeq.filter(_.isFile)
          catch { case _: java.io.FileNotFoundException => Nil }
      }
    val legacy = top.filter(s => s.isFile && s.getPath.getName.startsWith("e_"))
    (legacy ++ bucketed).flatMap { st =>
      val name = st.getPath.getName
      val created = entryTs(name) match { case -1L => now; case t => t }
      if (now - created > retain) {
        try fs.delete(st.getPath, false)
        catch { case _: java.io.IOException => () }
        None
      } else if (floorTs >= 0 && created < floorTs) None // processed (floor)
      else if (processed.contains(name)) None
      else {
        try Some(name -> Hypertable.readSmallFile(fs, st.getPath)
          .linesIterator.filter(_.nonEmpty).toSeq)
        catch { case _: java.io.IOException => None } // racing writer/prune
      }
    }.sortBy(_._1)
  }
}
