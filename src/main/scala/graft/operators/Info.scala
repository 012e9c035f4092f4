package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Columnstore, Hypertable, Jobs, Policies}

/** Informational views — `timescaledb_information.*` (`sql/views.sql`):
  * the catalog-introspection surface, as DataFrames with the reference's
  * column names so monitoring queries port 1:1. Everything derives from
  * the on-disk catalog (dir listing, `_graft_*` markers, parquet footers);
  * chunk counts and sizes are metadata-only.
  */
object Info {

  /** Micros → Timestamp keeping sub-millisecond precision; floorDiv so
    * pre-1970 boundaries don't shift by 1 ms under toward-zero division.
    */
  private def microsToTimestamp(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      java.lang.Math.floorDiv(us, 1000000L),
      java.lang.Math.floorMod(us, 1000000L) * 1000L))

  /** timescaledb_information.hypertables (`sql/views.sql:9-52`). */
  def hypertables(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    paths.map { p =>
      val ht = Hypertable.at(spark, p)
      val chunks = ht.showChunks()
      (p, ht.timeCol, ht.timeKind,
        1 + ht.spaceDims.size,
        chunks.size.toLong,
        chunks.count(c => Columnstore.isCompressed(spark, c.path)).toLong)
    }.toDF("hypertable_name", "primary_dimension", "primary_dimension_type",
      "num_dimensions", "num_chunks", "num_compressed_chunks")
  }

  /** timescaledb_information.chunks (`sql/views.sql:157-224`): one row per
    * chunk with its primary-dimension range (timestamps for timestamp-kind
    * dimensions, raw integers for bigint — both columns present, the
    * inapplicable one NULL, like the reference's
    * range_start/range_start_integer split).
    */
  def chunks(ht: Hypertable): DataFrame = {
    import ht.spark.implicits._
    val integral = ht.timeKind == "bigint"
    ht.showChunks().map { c =>
      (ht.path, c.path.substring(c.path.lastIndexOf('/') + 1),
        ht.timeCol, ht.timeKind,
        if (integral) None else Some(microsToTimestamp(c.startMicros)),
        if (integral) None else Some(microsToTimestamp(c.endMicros)),
        if (integral) Some(c.startMicros) else None,
        if (integral) Some(c.endMicros) else None,
        Columnstore.isCompressed(ht.spark, c.path),
        ht.chunkStatusText(c)) // ChunkInfo overload: no catalog re-listing
    }.toDF("hypertable_name", "chunk_name", "primary_dimension",
      "primary_dimension_type", "range_start", "range_end",
      "range_start_integer", "range_end_integer", "is_compressed",
      "chunk_status")
  }

  /** chunk_columnstore_stats / chunk_compression_stats
    * (`sql/size_utils.sql:413+`, both names are the same function in the
    * reference): per-chunk compression state and before/after sizes with
    * the reference's column names, so monitoring queries port 1:1. Sizes
    * come from parquet footers on executors ([[Stats.compressionStats]]);
    * before/after are NULL for uncompressed chunks like the reference.
    */
  def chunkColumnstoreStats(ht: Hypertable): DataFrame = {
    import ht.spark.implicits._
    Stats.compressionStats(ht).map { s =>
      (ht.path, s.path.substring(s.path.lastIndexOf('/') + 1),
        if (s.compressed) "Compressed" else "Uncompressed",
        s.rows,
        if (s.compressed) Some(s.uncompressedBytes) else None,
        if (s.compressed) Some(s.compressedBytes) else None)
    }.toDF("hypertable_name", "chunk_name", "compression_status",
      "numrows_pre_compression", "before_compression_total_bytes",
      "after_compression_total_bytes")
  }

  /** hypertable_columnstore_stats / hypertable_compression_stats
    * (`sql/size_utils.sql:455+`): the per-hypertable rollup of
    * [[chunkColumnstoreStats]].
    */
  def hypertableColumnstoreStats(ht: Hypertable): DataFrame = {
    import ht.spark.implicits._
    val stats = Stats.compressionStats(ht)
    val comp = stats.filter(_.compressed)
    Seq((ht.path, stats.size.toLong, comp.size.toLong,
      comp.map(_.uncompressedBytes).sum, comp.map(_.compressedBytes).sum))
      .toDF("hypertable_name", "total_chunks", "number_compressed_chunks",
        "before_compression_total_bytes", "after_compression_total_bytes")
  }

  /** timescaledb_information.hypertable_columnstore_settings
    * (`sql/views.sql:368-420`): the table's STORED columnstore layout
    * ([[graft.sources.Hypertable.setColumnstoreSettings]]) with the
    * reference's comma-joined column-list shape; one all-null settings row
    * when none are configured (the reference's LEFT JOIN against the
    * settings catalog).
    */
  def hypertableColumnstoreSettings(ht: Hypertable): DataFrame = {
    import ht.spark.implicits._
    val s = ht.columnstoreSettings
    // an EMPTY stored list reads as NULL like the reference view (its
    // LEFT JOIN yields NULL, never ''): isNull consumers must not see a
    // phantom empty-string segmentby
    Seq((ht.path,
        s.map(_.segmentBy.mkString(",")).filter(_.nonEmpty),
        s.map(_.orderBy.mkString(",")).filter(_.nonEmpty),
        s.map(_.rowGroupBytes)))
      .toDF("hypertable", "segmentby", "orderby", "row_group_bytes")
  }

  /** timescaledb_information.dimensions (`sql/views.sql:226-256`). */
  def dimensions(ht: Hypertable): DataFrame = {
    import ht.spark.implicits._
    val integral = ht.timeKind == "bigint"
    // calendar-chunked tables (chunkWidth = "N months") have
    // chunkWidthMicros = 0 — report the month count instead of a bogus
    // zero-width micros interval (reference dimensions view shows the
    // calendar interval)
    val monthly = ht.chunkMonths > 0
    val time = (ht.path, 1, ht.timeCol, ht.timeKind, "Time",
      if (integral || monthly) None else Some(ht.chunkWidthMicros),
      if (integral) Some(ht.chunkWidthMicros) else None,
      if (monthly) Some(ht.chunkMonths) else None,
      None: Option[Int])
    val space = ht.spaceDims.zipWithIndex.map { case ((sc, n, _), i) =>
      (ht.path, i + 2, sc, "hash", "Space", None: Option[Long], None: Option[Long],
        None: Option[Int], Some(n))
    }
    (Seq(time) ++ space)
      .toDF("hypertable_name", "dimension_number", "column_name",
        "column_type", "dimension_type", "time_interval_micros",
        "integer_interval", "month_interval", "num_partitions")
  }

  /** timescaledb_information.jobs (`sql/views.sql` jobs view): one row per
    * registered job with its schedule and config.
    */
  def jobs(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    Jobs.list(spark, root).map { case (j, s) =>
      (j.id, j.jobName.getOrElse(j.proc), j.proc,
        j.scheduleIntervalMicros, j.maxRetries, j.retryPeriodMicros,
        j.scheduled, j.fixedSchedule,
        j.config.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","),
        j.initialStartMicros.map(microsToTimestamp),
        s.nextStartMicros.map(microsToTimestamp),
        j.timezone)
    }.toDF("job_id", "application_name", "proc_name",
      "schedule_interval_micros", "max_retries", "retry_period_micros",
      "scheduled", "fixed_schedule", "config", "initial_start", "next_start",
      "timezone")
  }

  /** timescaledb_information.job_stats (`sql/views.sql` job_stats view). */
  def jobStats(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    Jobs.list(spark, root).map { case (j, s) =>
      (j.id, s.lastRunStartMicros.map(microsToTimestamp),
        s.lastSuccessfulFinishMicros.map(microsToTimestamp),
        s.lastRunSuccess.map(if (_) "Success" else "Failed"),
        if (j.scheduled) "Scheduled" else "Paused",
        s.nextStartMicros.map(microsToTimestamp),
        s.totalRuns, s.totalSuccesses, s.totalFailures,
        s.consecutiveFailures)
    }.toDF("job_id", "last_run_started_at", "last_successful_finish",
      "last_run_status", "job_status", "next_start",
      "total_runs", "total_successes", "total_failures",
      "consecutive_failures")
  }

  /** timescaledb_information.chunk_columnstore_settings
    * (`sql/views.sql:398-423`): one row per COMPRESSED chunk with the
    * settings it was compressed under — recorded in its marker at
    * compress time, falling back to the table's stored settings for
    * chunks whose marker predates recording (rewrite paths).
    */
  def chunkColumnstoreSettings(ht: Hypertable): DataFrame = {
    import ht.spark.implicits._
    ht.showChunks()
      .filter(c => Columnstore.isCompressed(ht.spark, c.path))
      .map { c =>
        val opts = Columnstore.chunkRecordedSettings(ht.spark, c.path)
          .getOrElse(Columnstore.resolveOptions(ht))
        (ht.path, c.path.substring(c.path.lastIndexOf('/') + 1),
          opts.segmentBy.mkString(","), opts.orderBy.mkString(","),
          opts.rowGroupBytes)
      }.toDF("hypertable", "chunk", "segmentby", "orderby", "row_group_bytes")
  }

  /** timescaledb_information.stat_chunk_activity (`sql/views.sql:426+`),
    * compression section: per-chunk batch (parquet row-group) counts and
    * row/byte distributions from footers ([[Stats.chunkActivity]]).
    */
  def statChunkActivity(ht: Hypertable): DataFrame = {
    import ht.spark.implicits._
    Stats.chunkActivity(ht).map { a =>
      (ht.path, a.path.substring(a.path.lastIndexOf('/') + 1), a.compressed,
        a.batchCount, a.rowsMin, a.rowsMax, a.rowsAvg,
        a.bytesMin, a.bytesMax, a.bytesAvg)
    }.toDF("hypertable_name", "chunk_name", "is_compressed", "batch_count",
      "batch_rows_min", "batch_rows_max", "batch_rows_avg",
      "batch_bytes_min", "batch_bytes_max", "batch_bytes_avg")
  }

  /** timescaledb_information.job_history (`sql/views.sql:328-366`): one
    * row per recorded run, latest last. pid/sqlerrcode have no Spark
    * analogue and are omitted; `err_message` is NULL on success like the
    * reference.
    */
  def jobHistory(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    Jobs.history(spark, root).map { r =>
      (r.id, r.jobId, r.succeeded, r.proc,
        microsToTimestamp(r.startMicros), microsToTimestamp(r.finishMicros),
        r.config.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","),
        r.error)
    }.toDF("id", "job_id", "succeeded", "proc_name",
      "start_time", "finish_time", "config", "err_message")
  }

  /** timescaledb_information.job_errors (`sql/views.sql:293-326`): the
    * failed subset of [[jobHistory]] — failure forensics without scanning
    * the full history.
    */
  def jobErrors(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    Jobs.history(spark, root).filterNot(_.succeeded).map { r =>
      (r.jobId, r.proc,
        microsToTimestamp(r.startMicros), microsToTimestamp(r.finishMicros),
        r.error)
    }.toDF("job_id", "proc_name", "start_time", "finish_time", "err_message")
  }

  /** timescaledb_information.continuous_aggregates (`sql/views.sql`
    * continuous_aggregates view): one row per cagg handle with its bucket
    * definition, materialization state, and compression status. Caggs are
    * handle-based (the definition holds live Columns), so the view takes
    * the open handles rather than paths. `finalized` is always true —
    * graft materializes finalized values (plus exact partial components
    * where the definition asks for them), never bare transition state.
    */
  def continuousAggregates(
      caggs: Seq[graft.streaming.ContinuousAggregate]): DataFrame = {
    require(caggs.nonEmpty, "pass at least one cagg handle")
    val spark = caggs.head.spark
    import spark.implicits._
    caggs.map { c =>
      val mat = c.matChunks
      val compressed = c.compressedMatChunks
      val wm = c.watermark
      (c.path, c.sourcePath, c.defn.bucketWidth, c.defn.bucketCol,
        c.defn.groupCols.mkString(","), true, false,
        compressed.nonEmpty ||
          Policies.show(c.spark, c.path).exists(_.columnstoreAfterMicros.nonEmpty),
        mat.size.toLong, compressed.size.toLong,
        if (wm == Long.MinValue) None else Some(wm),
        c.pendingInvalidations().size.toLong,
        c.childCaggPaths.size.toLong,
        // bucket-function catalog columns (continuous_aggs_bucket_function:
        // bucket_timezone / bucket_origin / bucket_fixed_width)
        c.defn.bucketTz, c.defn.bucketOriginMicros,
        c.defn.widthMonths == 0 && c.defn.bucketTz.isEmpty)
    }.toDF("view_name", "hypertable_name", "bucket_width", "bucket_column",
      "group_columns", "finalized", "materialized_only",
      "compression_enabled", "num_mat_chunks", "num_compressed_mat_chunks",
      "watermark_micros", "pending_invalidations", "num_children",
      "bucket_timezone", "bucket_origin_micros", "bucket_fixed_width")
  }

  /** timescaledb_information.jobs, policy subset (`sql/views.sql:94-117`):
    * the configured policy bundle as rows (scheduling is external, so
    * next_start/job_id have no analogue).
    */
  def policies(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    Policies.show(spark, path).toSeq.flatMap { set =>
      Seq(
        set.refreshStartOffsetMicros.map(s => ("policy_refresh_continuous_aggregate",
          s, set.refreshEndOffsetMicros.getOrElse(0L))),
        set.columnstoreAfterMicros.map(l => ("policy_columnstore", l, 0L)),
        set.dropAfterMicros.map(l => ("policy_retention", l, 0L))).flatten
    }.toDF("application_name", "start_offset_micros", "end_offset_micros")
  }
}
