package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, CompressionPolicy, Hypertable}

class ColumnstoreSpec extends AnyFunSuite {
  lazy val spark = Graft.session("columnstore-spec", "local[4]", 4)
  import spark.implicits._

  private val opts = Columnstore.Options(
    segmentBy = Seq("event_type"), orderBy = Seq("ts"),
    bloomFilterCols = Seq("event_type"))

  private lazy val ht = {
    val dir = Files.createTempDirectory("graft_cs").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    h.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    h
  }

  test("compression preserves data and marks chunks") {
    val before = ht.read().agg(count(lit(1)), sum($"event_id")).head()
    val done = Columnstore.compress(ht, opts)
    assert(done.size === 5) // 30 days / 7-day chunks
    assert(ht.showChunks().forall(c => Columnstore.isCompressed(spark, c.path)))
    val after = ht.read().agg(count(lit(1)), sum($"event_id")).head()
    assert(after === before)
  }

  test("compression is idempotent (already-compressed chunks skipped)") {
    Columnstore.compress(ht, opts)
    assert(Columnstore.compress(ht, opts).isEmpty)
  }

  test("rows are segment-grouped and time-sorted within each file") {
    Columnstore.compress(ht, opts)
    val perFile = ht.read()
      .withColumn("f", input_file_name())
      .select($"f", $"event_type", unix_micros($"ts").as("us"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1)
    assert(perFile.nonEmpty)
    perFile.foreach { case (f, rows) =>
      val keys = rows.map(r => (r._2, r._3)).toSeq
      assert(keys === keys.sorted, s"file $f not sorted by (event_type, ts)")
    }
  }

  test("no-segmentby compression sizes output files from input bytes (no 1-task funnel)") {
    val dir = Files.createTempDirectory("graft_cs5").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "30 days")
    h.write(Tables.table(spark, "/root/testdata/sf0.01", "events"))
    val chunk = h.showChunks().head
    val chunkRows = spark.read.parquet(chunk.path).count()
    // tiny row-group target → the chunk's bytes demand several output files
    val n = Columnstore.compressChunk(spark, chunk.path,
      Columnstore.Options(orderBy = Seq("ts"), rowGroupBytes = 16 * 1024))
    assert(n === chunkRows)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(chunk.path))
      .count(_.getPath.getName.startsWith("part-"))
    assert(files > 1, s"expected multiple output files, got $files")
  }

  test("decompress round-trips: compress → decompress → identical rows, marker gone") {
    val dir = Files.createTempDirectory("graft_cs3").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    h.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    val before = h.read().drop("_chunk").orderBy("event_id").collect()
    Columnstore.compress(h, opts)
    val undone = Columnstore.decompress(h)
    assert(undone.nonEmpty)
    assert(h.showChunks().forall(c => !Columnstore.isCompressed(spark, c.path)))
    assert(h.read().drop("_chunk").orderBy("event_id").collect() === before)
    // decompressing an uncompressed table is a no-op
    assert(Columnstore.decompress(h).isEmpty)
  }

  test("compress/decompress preserve a merged chunk's recorded range") {
    val dir = Files.createTempDirectory("graft_cs4").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    h.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    val Seq(c0, c1, _*) = h.showChunks()
    val merged = h.mergeChunks(c0.startMicros, c1.startMicros)
    Columnstore.compressChunk(spark, merged.path, opts)
    val afterCompress = h.showChunks().find(_.startMicros == merged.startMicros).get
    assert(afterCompress.endMicros === merged.endMicros,
      "compressChunk must carry the _graft_range catalog file over the rewrite")
    Columnstore.decompressChunk(spark, merged.path)
    val afterDecompress = h.showChunks().find(_.startMicros == merged.startMicros).get
    assert(afterDecompress.endMicros === merged.endMicros)
  }

  test("suggestOptions picks an even low-cardinality segmentby (compression_defaults.sql)") {
    // the sf0.001 chunk has ~250 rows: scale the per-segment floor down
    val s = Columnstore.suggestOptions(ht, minSegmentRows = 20)
    // event_id is near-unique and props/user_id segment too finely at this
    // floor; value is a measure column — event_type is the even candidate
    assert(s.confidence === 7)
    assert(s.options.segmentBy === Seq("event_type"))
    assert(s.options.orderBy === Seq("ts"))
    // empty hypertable → orderby-only with a message, zero confidence
    val dir = Files.createTempDirectory("graft_cs_empty").toString
    val empty = Hypertable.create(spark, s"$dir/ht", "ts")
    val se = Columnstore.suggestOptions(empty)
    assert(se.confidence === 0 && se.options.segmentBy.isEmpty)
    assert(se.options.orderBy === Seq("ts") && se.message.isDefined)
    // a table whose only candidate is near-unique falls back with advice
    val dir2 = Files.createTempDirectory("graft_cs_uni").toString
    val uni = Hypertable.create(spark, s"$dir2/ht", "ts", chunkWidth = "30 days")
    uni.write(Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select($"ts", $"event_id"))
    val su = Columnstore.suggestOptions(uni)
    assert(su.confidence === 5 && su.options.segmentBy.isEmpty && su.message.isDefined)
  }

  test("policy runner compresses only chunks older than cutoff") {
    val dir = Files.createTempDirectory("graft_cs2").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    h.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    // weekly chunks align to Monday origin: 2024-01-01, 01-08, 01-15, 01-22, 01-29
    val cutoff = java.sql.Timestamp.valueOf("2024-01-20 00:00:00").getTime * 1000L
    val done = CompressionPolicy.run(h, opts, cutoff)
    assert(done.size === 2) // chunks ending 01-08 and 01-15
    val states = h.showChunks().map(c => Columnstore.isCompressed(spark, c.path))
    assert(states === Seq(true, true, false, false, false))
  }

  test("merge/split/DML preserve columnstore state (reference keeps " +
      "compressed chunks compressed through all three)") {
    val dir = Files.createTempDirectory("graft_cs3").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
    h.write(ev)
    val rows = h.read().count()
    Columnstore.compress(h, Columnstore.Options(orderBy = Seq("ts")))
    val all = h.showChunks()
    // merge of two compressed chunks → compressed result
    val merged = h.mergeChunks(all(0).startMicros, all(1).startMicros)
    assert(Columnstore.isCompressed(spark, merged.path))
    // split of the compressed merged chunk → both halves compressed
    val (lo, hi) = h.splitChunk(merged.startMicros,
      (merged.startMicros + merged.endMicros) / 2)
    assert(Columnstore.isCompressed(spark, lo.path))
    assert(Columnstore.isCompressed(spark, hi.path))
    // compressed DML: copy-on-write rewrite keeps the chunk compressed
    val deleted = h.deleteWhere(col("event_type") === lit("click"),
      timeRange = Some((lo.startMicros, lo.endMicros)))
    assert(deleted > 0)
    assert(Columnstore.isCompressed(spark, lo.path))
    // duplicate chunk in merge errors like ts_merge_chunks
    intercept[IllegalArgumentException] {
      h.mergeChunks(Seq(lo.startMicros, lo.startMicros), 128L << 20)
    }
    // mixed merge (compressed lo/hi halves + raw tail chunk) → rowstore
    val raw = h.showChunks().filterNot(c => Columnstore.isCompressed(spark, c.path))
    assert(raw.isEmpty) // everything above was compressed
    Columnstore.decompressChunk(spark, hi.path)
    val mixed = h.mergeChunks(lo.startMicros, hi.startMicros)
    assert(!Columnstore.isCompressed(spark, mixed.path))
    assert(h.read().count() === rows - deleted)
  }

  test("segmentwise recompress rewrites only the files a late batch touches " +
      "(recompress.c: untouched segments keep their bytes)") {
    val dir = Files.createTempDirectory("graft_cs_rw").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "30 days")
    val ev = Tables.table(spark, "/root/testdata/sf0.01", "events")
    h.write(ev)
    val c = h.showChunks().head
    val segOpts = Columnstore.Options(segmentBy = Seq("user_id"), orderBy = Seq("ts"))
    // AQE off so the range shuffle keeps several output files at test scale
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Columnstore.compressChunk(spark, c.path, segOpts)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def files() = fs.listStatus(new org.apache.hadoop.fs.Path(c.path))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.getName -> f.getModificationTime).toMap
    val before = files()
    assert(before.size > 2, s"need a multi-file layout, got ${before.size}")
    val rows = spark.read.parquet(c.path).count()

    // late batch touching ONE segment key — range-partitioned files give
    // non-overlapping user_id footer ranges, so only one file can match
    val probe = ev.where(col("ts") >= new java.sql.Timestamp(c.startMicros / 1000))
      .where(col("ts") < new java.sql.Timestamp(c.endMicros / 1000))
    val uid = probe.agg(min($"user_id")).head().getLong(0)
    val late = probe.where($"user_id" === uid).limit(50)
      .withColumn("event_id", $"event_id" + lit(9000000))
    val lateN = late.count()
    assert(lateN > 0)
    h.write(late)
    assert(Columnstore.isPartial(spark, c.path))

    val consumed = Columnstore.recompressChunkSegmentwise(spark, c.path, segOpts)
    assert(consumed >= 1)
    assert(!Columnstore.isPartial(spark, c.path))
    assert(Columnstore.isCompressed(spark, c.path))
    val after = files()
    // at least one pre-existing file survived byte-identical (same name and
    // mtime) — the whole point of segmentwise over full recompression
    val survivors = before.filter { case (n, t) => after.get(n).contains(t) }
    assert(survivors.size >= before.size - 2,
      s"expected most files untouched: ${survivors.size} of ${before.size}")
    assert(survivors.size < after.size, "the rewritten file(s) must be new")
    assert(spark.read.parquet(c.path).count() === rows + lateN)
    // the appended rows are present and the untouched segments unharmed
    assert(h.read().where($"event_id" >= 9000000).count() === lateN)
    // clean chunk → no-op
    assert(Columnstore.recompressChunkSegmentwise(spark, c.path, segOpts) === -1)
  }

  test("stored columnstore settings drive option-less maintenance " +
      "(ALTER TABLE SET timescaledb.segmentby/orderby analogue)") {
    val dir = Files.createTempDirectory("graft_cs_settings").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "30 days")
    h.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    // no settings stored: resolution falls back to the stats-derived
    // defaults (compression_defaults.c behavior)
    assert(h.columnstoreSettings === None)
    val derived = Columnstore.resolveOptions(h)
    assert(derived.orderBy === Seq("ts"))
    // first resolution PERSISTS the derived defaults (stable layout across
    // policy passes, no repeated stats sweep)
    assert(h.columnstoreSettings === Some(derived))
    // store settings; resolution and the info view now read them back
    h.setColumnstoreSettings(Columnstore.Options(
      segmentBy = Seq("event_type"), orderBy = Seq("ts")))
    assert(Columnstore.resolveOptions(h) ===
      Columnstore.Options(segmentBy = Seq("event_type"), orderBy = Seq("ts")))
    val view = graft.operators.Info.hypertableColumnstoreSettings(h).head()
    assert(view.getString(1) === "event_type" && view.getString(2) === "ts")
    // unknown columns are rejected up front
    intercept[IllegalArgumentException] {
      h.setColumnstoreSettings(Columnstore.Options(segmentBy = Seq("nope")))
    }
    // option-less compress uses the stored layout: every chunk compresses
    val before = h.read().agg(count(lit(1)), sum($"event_id")).head()
    assert(Columnstore.compress(h).nonEmpty)
    assert(h.showChunks().forall(c => Columnstore.isCompressed(spark, c.path)))
    assert(h.read().agg(count(lit(1)), sum($"event_id")).head() === before)
  }

  test("segmentwise recompress without segmentby folds ONLY the appended " +
      "files; recompressChunk dispatches raw/partial/clean") {
    val dir = Files.createTempDirectory("graft_cs_rw2").toString
    val h = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "30 days")
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
    h.write(ev)
    val c = h.showChunks().head
    val plain = Columnstore.Options(orderBy = Seq("ts"))
    // raw chunk: recompressChunk = full compression (reports rows written)
    val rows = spark.read.parquet(c.path).count()
    assert(Columnstore.recompressChunk(spark, c.path, plain) ===
      Columnstore.RecompressedFull(rows))
    assert(Columnstore.isCompressed(spark, c.path))
    // clean compressed chunk: no-op
    assert(Columnstore.recompressChunk(spark, c.path, plain) ===
      Columnstore.RecompressNoop)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def files() = fs.listStatus(new org.apache.hadoop.fs.Path(c.path))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.getName -> f.getModificationTime).toMap
    val before = files()
    val late = ev.where(col("ts") >= new java.sql.Timestamp(c.startMicros / 1000))
      .where(col("ts") < new java.sql.Timestamp(c.endMicros / 1000))
      .limit(20).withColumn("event_id", $"event_id" + lit(9000000))
    val lateN = late.count()
    h.write(late)
    assert(Columnstore.recompressChunk(spark, c.path, plain) match {
      case Columnstore.RecompressedSegmentwise(n) => n >= 1
      case _ => false
    })
    val after = files()
    // with no segmentby every pre-existing columnstore file is untouched
    assert(before.forall { case (n, t) => after.get(n).contains(t) })
    assert(!Columnstore.isPartial(spark, c.path))
    assert(spark.read.parquet(c.path).count() === rows + lateN)
  }
}
