package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Columnstore conversion — the Spark-native equivalent of
  * `compress_chunk` / `convert_to_columnstore`
  * (reference `tsl/src/compression/api.c:889-907`, layout rules
  * `tsl/src/compression/create.c:589-650`).
  *
  * The reference rewrites a row chunk into compressed batches with
  * `segmentby` plain columns, `orderby`-sorted rows, and per-batch min/max +
  * bloom sparse indexes. Parquet already IS that format: dictionary/RLE/
  * delta pages, per-row-group min/max statistics, optional bloom filters,
  * ZSTD. Compression here is a chunk-partition rewrite:
  *   - `repartition(segmentBy)` → rows of one segment co-located per file
  *     (the "all rows in a batch share the segment key" property)
  *   - `sortWithinPartitions(segmentBy ++ orderBy)` → row-group min/max on
  *     the orderby columns become tight, enabling row-group skipping (the
  *     `_ts_meta_v2` sparse minmax equivalent)
  *   - ZSTD + bloom filters on requested columns (bloom1 equivalent)
  *
  * At 100 TB this is the compaction job: it runs per chunk (parallelizable
  * across chunks), and never materializes data on the driver.
  */
object Columnstore {

  case class Options(
      segmentBy: Seq[String] = Nil,
      orderBy: Seq[String] = Nil,
      bloomFilterCols: Seq[String] = Nil,
      /** parquet row-group target — the reference's batch-size analogue. */
      rowGroupBytes: Long = 64L * 1024 * 1024)

  private val MARKER = "_graft_compressed"

  def isCompressed(spark: SparkSession, chunkPath: String): Boolean = {
    val p = new Path(chunkPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(new Path(p, MARKER))
  }

  /** Rewrite one chunk directory into columnstore layout. Returns row count.
    * Safe to re-run (idempotent); concurrent readers of the same chunk see
    * either the old or the new files, not a mix (tmp-dir swap).
    */
  def compressChunk(spark: SparkSession, chunkPath: String, opts: Options): Long = {
    val fs = new Path(chunkPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(chunkPath)
    val spacePart = df.schema.fieldNames.filter(_ == Hypertable.SPACE).toSeq
    val arranged = (opts.segmentBy match {
      case Nil  => df.coalesce(1)
      case segs => df.repartition(segs.map(col): _*)
    }).sortWithinPartitions((opts.segmentBy ++ opts.orderBy).map(col): _*)
    val tmp = chunkPath.stripSuffix("/") + "__compress_tmp"
    var w = arranged.write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.block.size", opts.rowGroupBytes.toString)
    opts.bloomFilterCols.foreach { c =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    if (spacePart.nonEmpty) w = w.partitionBy(spacePart: _*)
    w.parquet(tmp)
    val n = spark.read.parquet(tmp).count()
    fs.delete(new Path(chunkPath), true)
    fs.rename(new Path(tmp), new Path(chunkPath))
    val touch = fs.create(new Path(chunkPath, MARKER), true)
    touch.close()
    n
  }

  /** Compress every not-yet-compressed chunk fully older than the cutoff —
    * `add_columnstore_policy` semantics (`sql/policy_api.sql:66-93`).
    */
  def compress(ht: Hypertable, opts: Options,
      olderThanMicros: Option[Long] = None): Seq[ChunkInfo] = {
    val todo = ht.showChunks(olderThanMicros)
      .filterNot(c => isCompressed(ht.spark, c.path))
    todo.foreach(c => compressChunk(ht.spark, c.path, opts))
    todo
  }
}

/** Policy runner pairing with [[RetentionPolicy]]. */
object CompressionPolicy {
  def run(ht: Hypertable, opts: Columnstore.Options, olderThanMicros: Long): Seq[ChunkInfo] =
    Columnstore.compress(ht, opts, Some(olderThanMicros))
}

/** reorder_chunk (`sql/maintenance_utils.sql:83-100`) — physically re-sort
  * a chunk by the given columns (the reference reorders along an index).
  * Same rewrite machinery as compression, without changing segmentation.
  */
object ReorderPolicy {
  def run(ht: Hypertable, orderBy: Seq[String],
      olderThanMicros: Option[Long] = None): Seq[ChunkInfo] = {
    val todo = ht.showChunks(olderThanMicros)
    todo.foreach(c => Columnstore.compressChunk(ht.spark, c.path,
      Columnstore.Options(orderBy = orderBy)))
    todo
  }
}
