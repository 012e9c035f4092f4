package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression, Literal, TimeZoneAwareExpression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

import graft.sources.{Columnstore, Hypertable, Jobs}

/** The reference's ADMINISTRATIVE SQL surface (`sql/ddl_api.sql`,
  * `sql/maintenance_utils.sql`, `sql/policy_api.sql`): statements like
  * `SELECT create_hypertable('/data/events', 'ts')`,
  * `SELECT show_chunks('/data/events', older_than => TIMESTAMP '...')`,
  * `SELECT compress_chunk('<chunk>')`, `CALL refresh_continuous_aggregate(...)`.
  *
  * Spark has no stored procedures, so the idiomatic mapping is a PARSER
  * extension ([[GraftSqlParser]], injected via `spark.sql.extensions`): a
  * statement of the shape `SELECT <admin_fn>(args)` / `CALL <admin_fn>(args)`
  * (or `SELECT * FROM <admin_fn>(args)`) parses to a [[GraftAdminCommand]] —
  * a standard `RunnableCommand`, executed eagerly by Spark exactly like its
  * own DDL, returning the reference's result rows. Everything else delegates
  * to Spark's parser untouched, so the extension costs one regex probe per
  * statement.
  *
  * Tables are addressed by PATH (graft's hypertable identity), not by
  * catalog name — the one deliberate difference from the reference's
  * regclass arguments. Chunk arguments take the chunk paths that
  * `show_chunks` returns, mirroring the reference's show_chunks →
  * compress_chunk flow. Positional and `name => value` named arguments are
  * both supported, like PostgreSQL calls.
  */
object SqlAdmin {

  /** Declared output schema per admin function (column named after the
    * function, as PostgreSQL names scalar-function result columns).
    */
  val outputs: Map[String, StructType] = Map(
    "create_hypertable" -> StructType(Seq(
      StructField("hypertable", StringType), StructField("created", BooleanType))),
    "show_chunks" -> StructType(Seq(StructField("show_chunks", StringType))),
    "drop_chunks" -> StructType(Seq(StructField("drop_chunks", StringType))),
    "approximate_row_count" -> StructType(Seq(
      StructField("approximate_row_count", LongType))),
    "hypertable_size" -> StructType(Seq(StructField("hypertable_size", LongType))),
    "set_chunk_time_interval" -> StructType(Seq(
      StructField("set_chunk_time_interval", BooleanType))),
    // dimension DDL (sql/ddl_api.sql:56-87,115-177)
    "add_dimension" -> StructType(Seq(
      StructField("dimension_id", IntegerType),
      StructField("column_name", StringType),
      StructField("created", BooleanType))),
    "set_number_partitions" -> StructType(Seq(
      StructField("set_number_partitions", BooleanType))),
    "set_partitioning_interval" -> StructType(Seq(
      StructField("set_partitioning_interval", BooleanType))),
    "set_integer_now_func" -> StructType(Seq(
      StructField("set_integer_now_func", BooleanType))),
    "enable_chunk_skipping" -> StructType(Seq(
      StructField("column_name", StringType), StructField("enabled", BooleanType))),
    "disable_chunk_skipping" -> StructType(Seq(
      StructField("column_name", StringType), StructField("disabled", BooleanType))),
    "compress_chunk" -> StructType(Seq(StructField("compress_chunk", StringType))),
    "decompress_chunk" -> StructType(Seq(StructField("decompress_chunk", StringType))),
    // the columnstore-era names (sql/maintenance_utils.sql): same ops
    "convert_to_columnstore" -> StructType(Seq(
      StructField("convert_to_columnstore", StringType))),
    "convert_to_rowstore" -> StructType(Seq(
      StructField("convert_to_rowstore", StringType))),
    "attach_chunk" -> StructType(Seq(StructField("attach_chunk", StringType))),
    "detach_chunk" -> StructType(Seq(StructField("detach_chunk", StringType))),
    "merge_chunks_concurrently" -> StructType(Seq(
      StructField("merge_chunks_concurrently", StringType))),
    "detach_tablespaces" -> StructType(Seq(
      StructField("detach_tablespaces", StringType))),
    // approximate sizes: graft's listing IS the catalog, so approximate
    // equals exact (sql/size_utils.sql:300-360 reads catalog stats)
    "hypertable_approximate_size" -> StructType(Seq(
      StructField("hypertable_approximate_size", LongType))),
    "hypertable_approximate_detailed_size" -> StructType(Seq(
      StructField("table_bytes", LongType), StructField("index_bytes", LongType),
      StructField("toast_bytes", LongType), StructField("total_bytes", LongType))),
    "hypertable_index_size" -> StructType(Seq(
      StructField("hypertable_index_size", LongType))),
    "compact_chunk" -> StructType(Seq(StructField("compact_chunk", StringType))),
    "freeze_chunk" -> StructType(Seq(StructField("freeze_chunk", BooleanType))),
    "unfreeze_chunk" -> StructType(Seq(StructField("unfreeze_chunk", BooleanType))),
    "move_chunk" -> StructType(Seq(StructField("move_chunk", StringType))),
    "attach_tablespace" -> StructType(Seq(
      StructField("attach_tablespace", BooleanType))),
    "detach_tablespace" -> StructType(Seq(
      StructField("detach_tablespace", BooleanType))),
    "show_tablespaces" -> StructType(Seq(StructField("show_tablespaces", StringType))),
    "add_retention_policy" -> StructType(Seq(
      StructField("add_retention_policy", IntegerType))),
    "remove_retention_policy" -> StructType(Seq(
      StructField("remove_retention_policy", BooleanType))),
    "add_columnstore_policy" -> StructType(Seq(
      StructField("add_columnstore_policy", IntegerType))),
    "add_compression_policy" -> StructType(Seq(
      StructField("add_compression_policy", IntegerType))),
    "remove_columnstore_policy" -> StructType(Seq(
      StructField("remove_columnstore_policy", BooleanType))),
    "remove_compression_policy" -> StructType(Seq(
      StructField("remove_compression_policy", BooleanType))),
    "add_compaction_policy" -> StructType(Seq(
      StructField("add_compaction_policy", IntegerType))),
    "remove_compaction_policy" -> StructType(Seq(
      StructField("remove_compaction_policy", BooleanType))),
    "refresh_continuous_aggregate" -> StructType(Seq(
      StructField("refresh_continuous_aggregate", BooleanType))),
    "merge_chunks" -> StructType(Seq(StructField("merge_chunks", StringType))),
    "split_chunk" -> StructType(Seq(StructField("split_chunk", StringType))),
    "reorder_chunk" -> StructType(Seq(StructField("reorder_chunk", StringType))),
    "recompress_chunk" -> StructType(Seq(
      StructField("recompress_chunk", StringType))),
    "hypertable_detailed_size" -> StructType(Seq(
      StructField("table_bytes", LongType), StructField("index_bytes", LongType),
      StructField("toast_bytes", LongType), StructField("total_bytes", LongType))),
    "chunks_detailed_size" -> StructType(Seq(
      StructField("chunk", StringType), StructField("total_bytes", LongType),
      StructField("files", LongType), StructField("rows", LongType))),
    "add_reorder_policy" -> StructType(Seq(
      StructField("add_reorder_policy", IntegerType))),
    "remove_reorder_policy" -> StructType(Seq(
      StructField("remove_reorder_policy", BooleanType))),
    "add_continuous_aggregate_policy" -> StructType(Seq(
      StructField("add_continuous_aggregate_policy", IntegerType))),
    "remove_continuous_aggregate_policy" -> StructType(Seq(
      StructField("remove_continuous_aggregate_policy", BooleanType))),
    "add_job" -> StructType(Seq(StructField("add_job", IntegerType))),
    "delete_job" -> StructType(Seq(StructField("delete_job", BooleanType))),
    "run_job" -> StructType(Seq(StructField("run_job", BooleanType))),
    "alter_job" -> StructType(Seq(StructField("alter_job", IntegerType))),
    // timescaledb_experimental policy bundle (sql/policy_experimental.sql)
    "add_policies" -> StructType(Seq(StructField("add_policies", BooleanType))),
    "alter_policies" -> StructType(Seq(
      StructField("alter_policies", BooleanType))),
    "remove_policies" -> StructType(Seq(
      StructField("remove_policies", BooleanType))),
    "remove_all_policies" -> StructType(Seq(
      StructField("remove_all_policies", BooleanType))),
    "show_policies" -> StructType(Seq(
      StructField("application_name", StringType),
      StructField("start_offset_micros", LongType, nullable = true),
      StructField("end_offset_micros", LongType, nullable = true))),
    // the CREATE MATERIALIZED VIEW ... WITH (timescaledb.continuous)
    // surface, function form (path-addressed like everything else here)
    "create_continuous_aggregate" -> StructType(Seq(
      StructField("continuous_aggregate", StringType),
      StructField("created", BooleanType))),
    "drop_continuous_aggregate" -> StructType(Seq(
      StructField("drop_continuous_aggregate", BooleanType)))) ++
    viewOutputs ++
    // bare table-function forms of the stats views (sql/size_utils.sql)
    Map(
      "chunk_columnstore_stats" -> viewBaseOutputs("chunk_columnstore_stats"),
      "chunk_compression_stats" -> viewBaseOutputs("chunk_columnstore_stats"),
      "hypertable_columnstore_stats" -> viewBaseOutputs("hypertable_columnstore_stats"),
      "hypertable_compression_stats" -> viewBaseOutputs("hypertable_columnstore_stats"))

  /** `timescaledb_information.*` views (`sql/views.sql`) as table
    * functions over a path: `SELECT * FROM
    * timescaledb_information.chunks('/path')`. Underscore aliases
    * (`timescaledb_information_chunks`) work where dotted names are
    * awkward. Schemas mirror [[graft.operators.Info]]'s DataFrames
    * column-for-column (asserted in SqlAdminSpec).
    */
  private def viewSchema(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  lazy val viewBaseOutputs: Map[String, StructType] = Map(
    "hypertables" -> viewSchema(
      "hypertable_name" -> StringType, "primary_dimension" -> StringType,
      "primary_dimension_type" -> StringType, "num_dimensions" -> IntegerType,
      "num_chunks" -> LongType, "num_compressed_chunks" -> LongType),
    "chunks" -> viewSchema(
      "hypertable_name" -> StringType, "chunk_name" -> StringType,
      "primary_dimension" -> StringType, "primary_dimension_type" -> StringType,
      "range_start" -> TimestampType, "range_end" -> TimestampType,
      "range_start_integer" -> LongType, "range_end_integer" -> LongType,
      "is_compressed" -> BooleanType,
      "chunk_status" -> ArrayType(StringType)),
    "dimensions" -> viewSchema(
      "hypertable_name" -> StringType, "dimension_number" -> IntegerType,
      "column_name" -> StringType, "column_type" -> StringType,
      "dimension_type" -> StringType, "time_interval_micros" -> LongType,
      "integer_interval" -> LongType, "month_interval" -> IntegerType,
      "num_partitions" -> IntegerType),
    "chunk_columnstore_stats" -> viewSchema(
      "hypertable_name" -> StringType, "chunk_name" -> StringType,
      "compression_status" -> StringType, "numrows_pre_compression" -> LongType,
      "before_compression_total_bytes" -> LongType,
      "after_compression_total_bytes" -> LongType),
    "hypertable_columnstore_stats" -> viewSchema(
      "hypertable_name" -> StringType, "total_chunks" -> LongType,
      "number_compressed_chunks" -> LongType,
      "before_compression_total_bytes" -> LongType,
      "after_compression_total_bytes" -> LongType),
    "hypertable_columnstore_settings" -> viewSchema(
      "hypertable" -> StringType, "segmentby" -> StringType,
      "orderby" -> StringType, "row_group_bytes" -> LongType),
    "chunk_columnstore_settings" -> viewSchema(
      "hypertable" -> StringType, "chunk" -> StringType,
      "segmentby" -> StringType, "orderby" -> StringType,
      "row_group_bytes" -> LongType),
    "stat_chunk_activity" -> viewSchema(
      "hypertable_name" -> StringType, "chunk_name" -> StringType,
      "is_compressed" -> BooleanType, "batch_count" -> LongType,
      "batch_rows_min" -> LongType, "batch_rows_max" -> LongType,
      "batch_rows_avg" -> DoubleType, "batch_bytes_min" -> LongType,
      "batch_bytes_max" -> LongType, "batch_bytes_avg" -> DoubleType),
    "jobs" -> viewSchema(
      "job_id" -> IntegerType, "application_name" -> StringType,
      "proc_name" -> StringType, "schedule_interval_micros" -> LongType,
      "max_retries" -> IntegerType, "retry_period_micros" -> LongType,
      "scheduled" -> BooleanType, "fixed_schedule" -> BooleanType,
      "config" -> StringType, "initial_start" -> TimestampType,
      "next_start" -> TimestampType, "timezone" -> StringType),
    "job_stats" -> viewSchema(
      "job_id" -> IntegerType, "last_run_started_at" -> TimestampType,
      "last_successful_finish" -> TimestampType, "last_run_status" -> StringType,
      "job_status" -> StringType, "next_start" -> TimestampType,
      "total_runs" -> LongType, "total_successes" -> LongType,
      "total_failures" -> LongType, "consecutive_failures" -> IntegerType),
    "job_history" -> viewSchema(
      "id" -> LongType, "job_id" -> IntegerType, "succeeded" -> BooleanType,
      "proc_name" -> StringType, "start_time" -> TimestampType,
      "finish_time" -> TimestampType, "config" -> StringType,
      "err_message" -> StringType),
    "job_errors" -> viewSchema(
      "job_id" -> IntegerType, "proc_name" -> StringType,
      "start_time" -> TimestampType, "finish_time" -> TimestampType,
      "err_message" -> StringType),
    "continuous_aggregates" -> viewSchema(
      "view_name" -> StringType, "hypertable_name" -> StringType,
      "bucket_width" -> StringType, "bucket_column" -> StringType,
      "group_columns" -> StringType, "finalized" -> BooleanType,
      "materialized_only" -> BooleanType, "compression_enabled" -> BooleanType,
      "num_mat_chunks" -> LongType, "num_compressed_mat_chunks" -> LongType,
      "watermark_micros" -> LongType, "pending_invalidations" -> LongType,
      "num_children" -> LongType, "bucket_timezone" -> StringType,
      "bucket_origin_micros" -> LongType, "bucket_fixed_width" -> BooleanType),
    "policies" -> viewSchema(
      "application_name" -> StringType, "start_offset_micros" -> LongType,
      "end_offset_micros" -> LongType))

  /** The reference keeps the pre-columnstore-rename view names as
    * aliases (`sql/views.sql:368-423`: the `*_compression_*` views are
    * `SELECT * FROM` their `*_columnstore_*` twins, and vice versa).
    */
  private lazy val viewAliases: Map[String, String] = Map(
    "hypertable_compression_settings" -> "hypertable_columnstore_settings",
    "chunk_compression_settings" -> "chunk_columnstore_settings",
    "hypertable_compression_stats" -> "hypertable_columnstore_stats",
    "chunk_compression_stats" -> "chunk_columnstore_stats")

  private lazy val viewOutputs: Map[String, StructType] =
    (viewBaseOutputs ++ viewAliases.map { case (a, t) => a -> viewBaseOutputs(t) })
      .flatMap { case (n, s) =>
        Seq(s"timescaledb_information.$n" -> s, s"timescaledb_information_$n" -> s)
      }

  /** One evaluated call argument: optional `name =>` plus the literal. */
  case class Arg(name: Option[String], value: Any, dataType: DataType)

  /** Positional+named argument accessor with the conversions the admin
    * surface needs. Positional index counts ONLY positional args.
    */
  class Args(fn: String, args: Seq[Arg],
      timeZone: java.time.ZoneId = java.time.ZoneOffset.UTC) {
    private val positional = args.takeWhile(_.name.isEmpty)
    private val named = args.collect { case Arg(Some(n), v, t) => n -> ((v, t)) }.toMap
    require(args.dropWhile(_.name.isEmpty).forall(_.name.isDefined),
      s"$fn: positional arguments cannot follow named arguments")
    private val unknown = named.keySet
    private var consumed = Set.empty[String]
    private var positionalRead = 0

    private[SqlAdmin] def zone: java.time.ZoneId = timeZone

    private def raw(i: Int, name: String): Option[(Any, DataType)] = {
      consumed += name
      if (i < positional.size) {
        // specifying the same argument both ways is an error, like Postgres
        require(!named.contains(name),
          s"$fn: argument '$name' given both positionally and by name")
        positionalRead = math.max(positionalRead, i + 1)
        Some((positional(i).value, positional(i).dataType))
          .filter(_._1 != null)
      } else named.get(name).filter(_._1 != null) // SQL NULL = absent
    }
    def str(i: Int, name: String): String = strOpt(i, name).getOrElse(
      throw new IllegalArgumentException(s"$fn: missing argument '$name'"))
    def strOpt(i: Int, name: String): Option[String] = raw(i, name).map {
      case (s: UTF8String, _) => s.toString
      case (s: String, _) => s
      case (v, t) => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be a string, got ${t.sql} ($v)")
    }
    def boolOpt(i: Int, name: String): Option[Boolean] = raw(i, name).map {
      case (b: java.lang.Boolean, _) => b.booleanValue
      case (v, t) => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be a boolean, got ${t.sql} ($v)")
    }
    def intOpt(i: Int, name: String): Option[Int] = raw(i, name).map {
      case (n: java.lang.Integer, _) => n.intValue
      case (n: java.lang.Long, _) => n.intValue
      case (v, t) => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be an integer, got ${t.sql} ($v)")
    }
    /** A time bound in the dimension's units: TIMESTAMP literal → micros;
      * integer → as-is (bigint dimensions / already-micros).
      */
    def microsOpt(i: Int, name: String): Option[Long] = raw(i, name).map {
      case (us: java.lang.Long, TimestampType | TimestampNTZType) => us.longValue
      case (n: java.lang.Long, LongType) => n.longValue
      case (n: java.lang.Integer, _) => n.longValue
      case (s: UTF8String, StringType) =>
        // 'YYYY-MM-DD ...' strings bind in the SESSION timezone — the same
        // instant a TIMESTAMP literal of the same text would produce
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .stringToTimestamp(s, timeZone).getOrElse(
            throw new IllegalArgumentException(
              s"$fn: cannot parse '$s' as a timestamp for '$name'"))
      case (v, t) => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be a timestamp or integer, got ${t.sql} ($v)")
    }
    def micros(i: Int, name: String): Long = microsOpt(i, name).getOrElse(
      throw new IllegalArgumentException(s"$fn: missing argument '$name'"))
    /** An interval argument in MICROSECONDS (calendar months rejected —
      * policy lags are fixed durations, like the reference's bigint lags).
      */
    def intervalMicrosOpt(i: Int, name: String): Option[Long] = raw(i, name).map {
      case (us: java.lang.Long, _: DayTimeIntervalType) => us.longValue
      case (n: java.lang.Long, LongType) => n.longValue
      case (n: java.lang.Integer, _) => n.longValue
      case (ci: CalendarInterval, _) =>
        require(ci.months == 0, s"$fn: '$name' must not contain calendar months")
        ci.days * 86400000000L + ci.microseconds
      case (s: UTF8String, StringType) =>
        val ci = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(s)
        require(ci.months == 0, s"$fn: '$name' must not contain calendar months")
        ci.days * 86400000000L + ci.microseconds
      case (v, t) => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be an interval, got ${t.sql} ($v)")
    }
    /** An interval as a chunk-width STRING (months allowed — calendar
      * chunks are a supported width), in `Hypertable.create` syntax.
      */
    def widthStrOpt(i: Int, name: String): Option[String] = raw(i, name).map {
      case (s: UTF8String, StringType) => s.toString
      case (us: java.lang.Long, _: DayTimeIntervalType) => s"$us microseconds"
      case (m: java.lang.Integer, _: YearMonthIntervalType) => s"$m months"
      case (n: java.lang.Long, LongType) => n.toString // bigint width
      case (n: java.lang.Integer, _) => n.toString
      case (ci: CalendarInterval, _) =>
        if (ci.months != 0) {
          require(ci.days == 0 && ci.microseconds == 0,
            s"$fn: '$name' cannot mix months with day/time parts")
          s"${ci.months} months"
        } else s"${ci.days * 86400000000L + ci.microseconds} microseconds"
      case (v, t) => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be an interval or string, got ${t.sql} ($v)")
    }
    /** Peek a positional slot's type WITHOUT consuming it — for the
      * type-dispatched create_hypertable slot 3.
      */
    def typeAt(i: Int): Option[DataType] =
      if (i < positional.size) Some(positional(i).dataType) else None
    /** Mark an argument consumed without conversion (non-scalar args). */
    def ack(name: String): Unit = { consumed += name; positionalRead += 1 }
    def done(): Unit = {
      val extra = unknown -- consumed
      require(extra.isEmpty, s"$fn: unknown argument(s) ${extra.mkString(", ")}")
      // every positional slot must have been READ, not merely probed —
      // extra trailing positionals are an error, never a silent no-op
      require(positional.size <= positionalRead,
        s"$fn: too many positional arguments " +
          s"(${positional.size} given, $positionalRead understood)")
    }
  }

  /** Hypertable path + chunk start parsed from a chunk path (the strings
    * `show_chunks` returns: `<ht>/_chunk=<start>[/...]`).
    */
  private def chunkAddr(chunkPath: String): (String, Long) = {
    val marker = "/_chunk="
    val i = chunkPath.lastIndexOf(marker)
    require(i > 0, s"'$chunkPath' is not a chunk path (no /_chunk= component)")
    val rest = chunkPath.substring(i + marker.length)
    val end = rest.indexOf('/')
    val start = (if (end < 0) rest else rest.substring(0, end)).toLong
    (chunkPath.substring(0, i), start)
  }

  /** Split a SQL expression list on top-level commas (quote- and
    * paren-aware) — for comma-joined expression arguments like
    * `create_continuous_aggregate`'s aggs.
    */
  private[plans] def splitTopLevel(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        cur.append(c)
        if (c == '\'')
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1
          } else inQuote = false
      } else c match {
        case '\'' => inQuote = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** True when the parsed SELECT-list expression is a window function call
    * (`fn(...) OVER (...)`) — routed to [[graft.streaming.CaggDef]]'s
    * `windowCols` (the reference's experimental cagg-window surface)
    * instead of `aggs`.
    */
  private[plans] def isWindowExpr(c: org.apache.spark.sql.Column): Boolean =
    org.apache.spark.sql.GraftShims.toExpressionEager(c).exists {
      case _: org.apache.spark.sql.catalyst.expressions.WindowExpression => true
      case _: org.apache.spark.sql.catalyst.expressions.UnresolvedWindowExpression => true
      case _ => false
    }

  private def policyJobId(spark: SparkSession, root: String, proc: String): Option[Int] =
    Jobs.list(spark, root).collectFirst { case (spec, _) if spec.proc == proc => spec.id }

  /** Register a policy job at `path` after `validate` passes; duplicate
    * procs for the same target error like the reference's default
    * if_not_exists=false.
    */
  private def addPolicyJob(spark: SparkSession, path: String, proc: String,
      scheduleMicros: Long, config: Map[String, String],
      validate: => Unit = ()): Int = {
    require(policyJobId(spark, path, proc).isEmpty,
      s"$proc already exists for $path (remove it first)")
    validate
    Jobs.add(spark, path, proc, scheduleMicros,
      nowMicros = System.currentTimeMillis * 1000L, config = config)
  }

  private def removePolicyJob(spark: SparkSession, path: String, proc: String): Boolean =
    policyJobId(spark, path, proc) match {
      case Some(id) => Jobs.delete(spark, path, id); true
      case None => false
    }

  private val DAY_MICROS = 86400000000L

  /** Execute `fn(args)`; the rows conform to `outputs(fn)`. */
  def run(spark: SparkSession, fn: String, rawArgs: Seq[Arg]): Seq[Row] = {
    val a = new Args(fn, rawArgs,
      java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
    def ht(path: String) = Hypertable.at(spark, path)
    val rows: Seq[Row] = fn match {
      case "create_hypertable" =>
        val path = a.str(0, "relation")
        val timeCol = a.str(1, "time_column_name")
        // Positional order matches the reference (`sql/ddl_api.sql`
        // old-style signature): partitioning_column 3rd, number_partitions
        // 4th — `create_hypertable('/p','ts','device',4)` binds like
        // PostgreSQL. chunk_time_interval binds by NAME (chunk_time_interval
        // or chunk_interval), with one unambiguous convenience: a positional
        // INTERVAL literal in slot 3 cannot be a column name and is taken
        // as the chunk width.
        val slot2Width = a.typeAt(2).exists {
          case _: DayTimeIntervalType | _: YearMonthIntervalType |
               CalendarIntervalType => true
          case _ => false
        }
        val width =
          (if (slot2Width) a.widthStrOpt(2, "chunk_time_interval") else None)
            .orElse(a.widthStrOpt(Int.MaxValue, "chunk_time_interval"))
            .orElse(a.widthStrOpt(Int.MaxValue, "chunk_interval"))
        val spaceCol =
          if (slot2Width) a.strOpt(Int.MaxValue, "partitioning_column")
          else a.strOpt(2, "partitioning_column")
        // a STRING in slot 3 that parses as an interval ('7 days') is a
        // mis-positioned chunk width, not a column name — binding it as a
        // hash dimension would only fail much later at write time with an
        // unrelated routing error; refuse with the fix spelled out
        spaceCol.foreach { sc =>
          val looksLikeWidth = scala.util.Try(
            org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
              org.apache.spark.unsafe.types.UTF8String.fromString(
                graft.expressions.TimeBucketUtil.pgIntervalText(sc)))).isSuccess
          require(!looksLikeWidth,
            s"$fn: partitioning column '$sc' parses as an interval — " +
              s"if this is the chunk width, pass chunk_interval => " +
              s"INTERVAL '$sc'")
        }
        val nParts =
          if (slot2Width) a.intOpt(Int.MaxValue, "number_partitions")
          else a.intOpt(3, "number_partitions")
        val kind = a.strOpt(Int.MaxValue, "time_kind").getOrElse("timestamp")
        val defaultWidth = if (kind == "bigint") "604800000000" else "7 days"
        Hypertable.create(spark, path, timeCol,
          chunkWidth = width.getOrElse(defaultWidth),
          spaceCol = spaceCol, spacePartitions = nParts.getOrElse(4),
          timeKind = kind)
        Seq(Row(path, true))
      case "add_dimension" =>
        // two reference forms (sql/ddl_api.sql:115-143):
        //   add_dimension(ht, column_name, number_partitions)
        //   add_dimension(ht, by_hash(column_name, number_partitions))
        // by_range second dimensions are rejected: graft hypertables have
        // ONE open (range) dimension plus hash dimensions (SURVEY §2.1
        // hyperspace mapping) — the reference's multi-range hypertables
        // exist but its own docs call one range + N hash the norm.
        val h = ht(a.str(0, "hypertable"))
        val byCall = """(?is)^\s*by_(hash|range)\s*\((.*)\)\s*$""".r
        def unquote(s: String): String = {
          val t = s.trim
          if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
            t.substring(1, t.length - 1).replace("''", "'")
          else t
        }
        val second = a.strOpt(1, "dimension")
          .orElse(a.strOpt(Int.MaxValue, "column_name"))
          .getOrElse(throw new IllegalArgumentException(
            s"$fn: missing dimension (column_name or by_hash(...))"))
        val (colName, nParts) = second match {
          case byCall(kind, argsText) =>
            val parts = splitTopLevel(argsText).map(_.trim)
            if (kind.toLowerCase(java.util.Locale.ROOT) == "range")
              throw new IllegalArgumentException(
                s"$fn: by_range second dimensions are not supported — a " +
                  "graft hypertable has one open (range) dimension; add " +
                  "hash dimensions with by_hash(column_name, number_partitions)")
            require(parts.size == 2,
              s"$fn: by_hash takes (column_name, number_partitions)")
            (unquote(parts(0)), parts(1).toInt)
          case colName0 =>
            (colName0, a.intOpt(2, "number_partitions").getOrElse(
              throw new IllegalArgumentException(
                s"$fn: missing argument 'number_partitions'")))
        }
        val updated = h.addDimension(colName, nParts)
        // dimension_id: 1 = the open dimension, closed dims numbered after
        Seq(Row(updated.spaceDims.size + 1, colName, true))
      case "set_number_partitions" =>
        val h = ht(a.str(0, "hypertable"))
        val n = a.intOpt(1, "number_partitions").getOrElse(
          throw new IllegalArgumentException(
            s"$fn: missing argument 'number_partitions'"))
        val dim = a.strOpt(2, "dimension_name").orElse(h.spaceCol).getOrElse(
          throw new IllegalArgumentException(
            s"$fn: hypertable has no closed dimension"))
        h.setNumberPartitions(dim, n)
        Seq(Row(true))
      case "set_partitioning_interval" =>
        val h = ht(a.str(0, "hypertable"))
        val w = a.widthStrOpt(1, "partition_interval").getOrElse(
          throw new IllegalArgumentException(
            s"$fn: missing argument 'partition_interval'"))
        a.strOpt(2, "dimension_name").foreach(d => require(d == h.timeCol,
          s"$fn: only the open dimension '${h.timeCol}' has an interval"))
        h.setPartitioningInterval(w)
        Seq(Row(true))
      case "set_integer_now_func" =>
        ht(a.str(0, "hypertable")).setIntegerNowFunc(
          a.str(1, "integer_now_func"))
        Seq(Row(true))
      case "show_chunks" =>
        val h = ht(a.str(0, "relation"))
        val (ot, nt) = (a.microsOpt(1, "older_than"), a.microsOpt(2, "newer_than"))
        val (cb, ca) = (a.microsOpt(Int.MaxValue, "created_before"),
          a.microsOpt(Int.MaxValue, "created_after"))
        if (cb.isDefined || ca.isDefined) {
          // creation bounds can't mix with dimension bounds (src/chunk.c:2360)
          require(ot.isEmpty && nt.isEmpty,
            s"$fn: cannot mix created_before/created_after with older_than/newer_than")
          h.showChunksCreated(cb, ca).map(c => Row(c.path))
        } else h.showChunks(ot, nt).map(c => Row(c.path))
      case "drop_chunks" =>
        val h = ht(a.str(0, "relation"))
        val (ot, nt) = (a.microsOpt(1, "older_than"), a.microsOpt(2, "newer_than"))
        val (cb, ca) = (a.microsOpt(Int.MaxValue, "created_before"),
          a.microsOpt(Int.MaxValue, "created_after"))
        if (cb.isDefined || ca.isDefined) {
          require(ot.isEmpty && nt.isEmpty,
            s"$fn: cannot mix created_before/created_after with older_than/newer_than")
          h.dropChunksCreated(cb, ca).map(c => Row(c.path))
        } else h.dropChunks(ot, nt).map(c => Row(c.path))
      case "approximate_row_count" =>
        Seq(Row(graft.operators.Stats.rowCount(spark, a.str(0, "relation"))))
      case "hypertable_size" =>
        Seq(Row(graft.operators.Stats.hypertableSize(ht(a.str(0, "relation")))))
      case "set_chunk_time_interval" =>
        ht(a.str(0, "relation")).setChunkTimeInterval(
          a.widthStrOpt(1, "chunk_time_interval").getOrElse(
            throw new IllegalArgumentException(
              s"$fn: missing argument 'chunk_time_interval'")))
        Seq(Row(true))
      case "enable_chunk_skipping" =>
        val col = a.str(1, "column_name")
        ht(a.str(0, "relation")).enableChunkSkipping(col)
        Seq(Row(col, true))
      case "disable_chunk_skipping" =>
        val col = a.str(1, "column_name")
        ht(a.str(0, "relation")).disableChunkSkipping(col)
        Seq(Row(col, true))
      case "compress_chunk" | "convert_to_columnstore" =>
        val p = a.str(0, "chunk")
        val (htPath, _) = chunkAddr(p)
        Columnstore.compressChunk(spark, p, Columnstore.resolveOptions(ht(htPath)))
        Seq(Row(p))
      case "decompress_chunk" | "convert_to_rowstore" =>
        val p = a.str(0, "chunk")
        Columnstore.decompressChunk(spark, p)
        Seq(Row(p))
      case "attach_chunk" =>
        // attach_chunk(hypertable, chunk_src, slice_start, slice_end) —
        // sql/chunk.sql:67-70 takes a jsonb slice; graft binds the range
        // as two time bounds in the dimension's units
        val h = ht(a.str(0, "hypertable"))
        val src = a.str(1, "chunk")
        val start = a.micros(2, "slice_start")
        val end = a.micros(3, "slice_end")
        Seq(Row(h.attachChunk(src, start, end).path))
      case "detach_chunk" =>
        val p = a.str(0, "chunk")
        val dest = a.str(1, "destination")
        val (htPath, start) = chunkAddr(p)
        Seq(Row(ht(htPath).detachChunk(start, dest).path))
      case "detach_tablespaces" =>
        ht(a.str(0, "hypertable")).detachTablespaces().map(Row(_))
      case "hypertable_approximate_size" =>
        Seq(Row(graft.operators.Stats.hypertableSize(ht(a.str(0, "relation")))))
      case "hypertable_index_size" =>
        // index bytes = the pruning-metadata analogue reported by
        // hypertable_detailed_size (catalog markers, ranges, stats)
        val d = graft.operators.Stats.hypertableDetailedSize(ht(a.str(0, "relation")))
        Seq(Row(d.indexBytes))
      case "compact_chunk" =>
        val p = a.str(0, "chunk")
        Columnstore.compactChunk(spark, p)
        Seq(Row(p))
      case "freeze_chunk" =>
        val (htPath, start) = chunkAddr(a.str(0, "chunk"))
        Seq(Row(ht(htPath).freezeChunk(start)))
      case "unfreeze_chunk" =>
        val (htPath, start) = chunkAddr(a.str(0, "chunk"))
        Seq(Row(ht(htPath).unfreezeChunk(start)))
      case "move_chunk" =>
        val (htPath, start) = chunkAddr(a.str(0, "chunk"))
        val dest = a.str(1, "destination_tablespace")
        Seq(Row(ht(htPath).moveChunk(start, dest).path))
      case "attach_tablespace" =>
        ht(a.str(1, "hypertable")).attachTablespace(a.str(0, "tablespace"))
        Seq(Row(true))
      case "detach_tablespace" =>
        ht(a.str(1, "hypertable")).detachTablespace(a.str(0, "tablespace"))
        Seq(Row(true))
      case "show_tablespaces" =>
        ht(a.str(0, "hypertable")).showTablespaces.map(Row(_))
      case "add_retention_policy" =>
        val path = a.str(0, "relation")
        val drop = a.intervalMicrosOpt(1, "drop_after").getOrElse(
          throw new IllegalArgumentException(s"$fn: missing argument 'drop_after'"))
        val sched = a.intervalMicrosOpt(Int.MaxValue, "schedule_interval")
          .getOrElse(DAY_MICROS)
        Seq(Row(addPolicyJob(spark, path, "policy_retention", sched,
          Map("hypertable" -> path, "drop_after" -> drop.toString),
          validate = ht(path))))
      case "remove_retention_policy" =>
        Seq(Row(removePolicyJob(spark, a.str(0, "relation"), "policy_retention")))
      case "add_columnstore_policy" | "add_compression_policy" =>
        val path = a.str(0, "relation")
        val after = a.intervalMicrosOpt(1, "after")
          .orElse(a.intervalMicrosOpt(Int.MaxValue, "compress_after")).getOrElse(
            throw new IllegalArgumentException(s"$fn: missing argument 'after'"))
        val sched = a.intervalMicrosOpt(Int.MaxValue, "schedule_interval")
          .getOrElse(DAY_MICROS)
        Seq(Row(addPolicyJob(spark, path, "policy_columnstore", sched,
          Map("hypertable" -> path, "compress_after" -> after.toString),
          validate = ht(path))))
      case "remove_columnstore_policy" | "remove_compression_policy" =>
        Seq(Row(removePolicyJob(spark, a.str(0, "relation"), "policy_columnstore")))
      case "add_compaction_policy" =>
        val path = a.str(0, "relation")
        val sched = a.intervalMicrosOpt(1, "schedule_interval").getOrElse(DAY_MICROS)
        Seq(Row(addPolicyJob(spark, path, "policy_compaction", sched,
          Map("hypertable" -> path), validate = ht(path))))
      case "remove_compaction_policy" =>
        Seq(Row(removePolicyJob(spark, a.str(0, "relation"), "policy_compaction")))
      case "refresh_continuous_aggregate" =>
        val path = a.str(0, "continuous_aggregate")
        val cagg = graft.streaming.ContinuousAggregate.atPath(spark, path).getOrElse(
          throw new IllegalArgumentException(
            s"no continuous aggregate registered at '$path' in this session " +
              "(build it with ContinuousAggregate.create, which registers it)"))
        // reference signature (sql/ddl_api.sql:200-206): window_start,
        // window_end, force = false, options = NULL jsonb with
        // buckets_per_batch / max_batches_per_execution /
        // refresh_newest_first (tsl refresh.c batching)
        val force = a.boolOpt(3, "force").getOrElse(false)
        val options = a.strOpt(4, "options")
        val (s, e) = (a.microsOpt(1, "window_start"), a.microsOpt(2, "window_end"))
        options match {
          case Some(json) if json.trim.nonEmpty && json.trim != "null" =>
            val node = graft.sources.Hypertable.jsonMapper.readTree(json)
            // the reference validates the jsonb strictly — a mistyped value
            // must error, not silently degrade to an unbatched refresh
            require(node.isObject,
              s"$fn: options must be a JSON object, got '$json'")
            val known = Set("buckets_per_batch", "max_batches_per_execution",
              "refresh_newest_first")
            val unknown = scala.jdk.CollectionConverters
              .IteratorHasAsScala(node.fieldNames()).asScala.toSet -- known
            require(unknown.isEmpty,
              s"$fn: unsupported option(s): ${unknown.mkString(", ")}")
            def intOf(k: String, default: Int): Int =
              if (!node.has(k)) default
              else {
                val v = node.get(k)
                // canConvertToInt guards BigInteger wrap-around (2^64+5
                // would otherwise truncate through asLong to batch size 5)
                require(v.isIntegralNumber && v.canConvertToInt && v.asInt() >= 0,
                  s"$fn: option '$k' must be a non-negative integer, got $v")
                v.asInt()
              }
            val newestFirst =
              if (!node.has("refresh_newest_first")) true
              else {
                val v = node.get("refresh_newest_first")
                require(v.isBoolean,
                  s"$fn: option 'refresh_newest_first' must be a boolean, got $v")
                v.asBoolean()
              }
            // buckets_per_batch defaults to DEFAULT_BUCKETS_PER_BATCH=10
            // when the key is absent (refresh.c:788) — manual refreshes
            // batch by default; an explicit 0 forces the single atomic pass
            cagg.refreshBatched(s, e,
              bucketsPerBatch = intOf("buckets_per_batch", 10),
              maxBatchesPerExecution = intOf("max_batches_per_execution", 0),
              refreshNewestFirst = newestFirst,
              force = force)
          // NULL/absent options still batch at the reference default
          // (refresh.c:784-788: "Manual refreshes batch by default") —
          // end state is identical to a single pass (no cap ⇒ nothing
          // skipped), only the materialization granularity differs
          case _ => cagg.refreshBatched(s, e, bucketsPerBatch = 10,
            force = force)
        }
        Seq(Row(true))
      case "merge_chunks" | "merge_chunks_concurrently" =>
        // graft's merge is already non-blocking for readers (tmp + atomic
        // swap), so the _concurrently variant is the same operation
        // (sql/maintenance_utils.sql:31-58)
        // two chunk-path args, or one ARRAY['...', ...] of paths
        val paths: Seq[String] = rawArgs.headOption match {
          case Some(Arg(_, ad: org.apache.spark.sql.catalyst.util.ArrayData, _))
              if rawArgs.size == 1 =>
            (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
          case _ => Seq(a.str(0, "chunk1"), a.str(1, "chunk2"))
        }
        val addrs = paths.map(chunkAddr)
        require(addrs.map(_._1).distinct.size == 1,
          "merge_chunks: chunks belong to different hypertables")
        if (rawArgs.size == 1) a.ack("chunks") // the array arg is consumed
        Seq(Row(ht(addrs.head._1).mergeChunks(addrs.map(_._2),
          targetFileBytes = 128L << 20).path))
      case "split_chunk" =>
        val (htPath, start) = chunkAddr(a.str(0, "chunk"))
        val h = ht(htPath)
        val (c1, c2) = a.microsOpt(1, "split_at") match {
          case Some(at) => h.splitChunk(start, at)
          case None => h.splitChunk(start)
        }
        Seq(Row(c1.path), Row(c2.path))
      case "reorder_chunk" =>
        val p = a.str(0, "chunk")
        val (htPath, _) = chunkAddr(p)
        val h = ht(htPath)
        val orderBy = a.strOpt(1, "orderby")
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Columnstore.resolveOptions(h).orderBy)
        require(orderBy.nonEmpty,
          "reorder_chunk: no orderby given and none derivable from settings")
        Columnstore.compressChunk(spark, p, Columnstore.Options(orderBy = orderBy))
        Seq(Row(p))
      case "recompress_chunk" =>
        val p = a.str(0, "chunk")
        val (htPath, _) = chunkAddr(p)
        Columnstore.recompressChunk(spark, p, Columnstore.resolveOptions(ht(htPath)))
        Seq(Row(p))
      case "hypertable_detailed_size" | "hypertable_approximate_detailed_size" =>
        val d = graft.operators.Stats.hypertableDetailedSize(ht(a.str(0, "relation")))
        Seq(Row(d.tableBytes, d.indexBytes, d.toastBytes, d.totalBytes))
      case "chunk_columnstore_stats" | "chunk_compression_stats" =>
        // bare table-function forms (sql/size_utils.sql:413+) — same rows
        // as the timescaledb_information views
        graft.operators.Info.chunkColumnstoreStats(ht(a.str(0, "hypertable")))
          .collect().toSeq
      case "hypertable_columnstore_stats" | "hypertable_compression_stats" =>
        graft.operators.Info.hypertableColumnstoreStats(ht(a.str(0, "hypertable")))
          .collect().toSeq
      case "chunks_detailed_size" =>
        graft.operators.Stats.chunksDetailedSize(ht(a.str(0, "relation")))
          .map(c => Row(c.path, c.bytes, c.files, c.rows))
      case "add_reorder_policy" =>
        val path = a.str(0, "relation")
        val orderBy = a.str(1, "orderby")
        val sched = a.intervalMicrosOpt(Int.MaxValue, "schedule_interval")
          .getOrElse(DAY_MICROS)
        Seq(Row(addPolicyJob(spark, path, "policy_reorder", sched,
          Map("hypertable" -> path, "orderby" -> orderBy),
          validate = ht(path))))
      case "remove_reorder_policy" =>
        Seq(Row(removePolicyJob(spark, a.str(0, "relation"), "policy_reorder")))
      case "add_continuous_aggregate_policy" =>
        val path = a.str(0, "continuous_aggregate")
        val start = a.intervalMicrosOpt(1, "start_offset").getOrElse(
          throw new IllegalArgumentException(s"$fn: missing argument 'start_offset'"))
        val end = a.intervalMicrosOpt(2, "end_offset").getOrElse(
          throw new IllegalArgumentException(s"$fn: missing argument 'end_offset'"))
        val sched = a.intervalMicrosOpt(3, "schedule_interval").getOrElse(DAY_MICROS)
        // jobs catalog lives at the CAGG path; validate it's a known cagg
        Seq(Row(addPolicyJob(spark, path,
          "policy_refresh_continuous_aggregate", sched,
          Map("continuous_aggregate" -> path,
            "start_offset" -> start.toString, "end_offset" -> end.toString),
          validate = require(
            graft.streaming.ContinuousAggregate.atPath(spark, path).isDefined,
            s"no continuous aggregate registered at '$path' in this session"))))
      case "remove_continuous_aggregate_policy" =>
        Seq(Row(removePolicyJob(spark, a.str(0, "continuous_aggregate"),
          "policy_refresh_continuous_aggregate")))
      case "add_job" =>
        val root = a.str(0, "root")
        val proc = a.str(1, "proc")
        val sched = a.intervalMicrosOpt(2, "schedule_interval").getOrElse(DAY_MICROS)
        Seq(Row(Jobs.add(spark, root, proc, sched,
          nowMicros = System.currentTimeMillis * 1000L,
          config = Map("hypertable" -> root))))
      case "delete_job" =>
        Jobs.delete(spark, a.str(0, "root"), a.intOpt(1, "job_id").getOrElse(
          throw new IllegalArgumentException(s"$fn: missing argument 'job_id'")))
        Seq(Row(true))
      case "run_job" =>
        Seq(Row(Jobs.run(spark, a.str(0, "root"),
          a.intOpt(1, "job_id").getOrElse(throw new IllegalArgumentException(
            s"$fn: missing argument 'job_id'")),
          nowMicros = System.currentTimeMillis * 1000L)))
      case "alter_job" =>
        val root = a.str(0, "root")
        val id = a.intOpt(1, "job_id").getOrElse(
          throw new IllegalArgumentException(s"$fn: missing argument 'job_id'"))
        Jobs.alter(spark, root, id,
          scheduleIntervalMicros = a.intervalMicrosOpt(Int.MaxValue, "schedule_interval"),
          scheduled = a.boolOpt(Int.MaxValue, "scheduled"),
          nextStartMicros = a.microsOpt(Int.MaxValue, "next_start"),
          maxRetries = a.intOpt(Int.MaxValue, "max_retries"))
        Seq(Row(id))
      case "create_continuous_aggregate" =>
        // the reference's CREATE MATERIALIZED VIEW ... WITH
        // (timescaledb.continuous) AS SELECT time_bucket(w, ts), aggs ...
        // GROUP BY ..., as a call: group_cols is a comma list, aggs a
        // comma list of SQL aggregate expressions with AS aliases
        // (parsed by Spark's own expression parser)
        val caggPath = a.str(0, "continuous_aggregate")
        val htPath = a.str(1, "hypertable")
        val width = a.widthStrOpt(2, "bucket_width").getOrElse(
          throw new IllegalArgumentException(
            s"$fn: missing argument 'bucket_width'"))
        val groupCols = a.strOpt(3, "group_cols")
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        val aggsStr = a.str(4, "aggs")
        val tz = a.strOpt(Int.MaxValue, "timezone")
        // offset-form caggs (`time_bucket(w, ts, '30m'::interval)`,
        // reference cagg_4_hours_offset in cagg_query_common.sql): a bucket
        // offset is the default origin shifted by the offset
        val origin = a.microsOpt(Int.MaxValue, "origin")
          .orElse(a.intervalMicrosOpt(Int.MaxValue, "offset")
            .map(graft.expressions.TimeBucketUtil.DEFAULT_ORIGIN_MICROS + _))
        val withData = a.boolOpt(Int.MaxValue, "with_data").getOrElse(false)
        val parsedCols = splitTopLevel(aggsStr).map(s =>
          org.apache.spark.sql.functions.expr(s.trim))
        // window-function items (`rank() OVER (PARTITION BY bucket) AS r`)
        // go to windowCols — they compute over the AGGREGATED rows and
        // reference output aliases, not raw columns
        val (winCols, aggCols) = parsedCols.partition(isWindowExpr)
        require(parsedCols.nonEmpty, s"$fn: empty aggs list")
        val defn = graft.streaming.CaggDef(
          bucketWidth = width, groupCols = groupCols, aggs = aggCols,
          bucketTz = tz, bucketOriginMicros = origin, windowCols = winCols)
        graft.streaming.ContinuousAggregate.create(
          spark, caggPath, ht(htPath), defn, withData = withData)
        Seq(Row(caggPath, true))
      case "drop_continuous_aggregate" =>
        val path = a.str(0, "continuous_aggregate")
        graft.streaming.ContinuousAggregate.atPath(spark, path) match {
          case Some(c) => c.drop(); Seq(Row(true))
          case None => Seq(Row(false))
        }
      case "add_policies" | "alter_policies" =>
        val path = a.str(0, "relation")
        val set = graft.sources.PolicySet(
          refreshStartOffsetMicros =
            a.intervalMicrosOpt(Int.MaxValue, "refresh_start_offset"),
          refreshEndOffsetMicros =
            a.intervalMicrosOpt(Int.MaxValue, "refresh_end_offset"),
          columnstoreAfterMicros =
            a.intervalMicrosOpt(Int.MaxValue, "compress_after"),
          dropAfterMicros = a.intervalMicrosOpt(Int.MaxValue, "drop_after"))
        if (fn == "add_policies") graft.sources.Policies.add(spark, path, set)
        else graft.sources.Policies.alter(spark, path, set)
        Seq(Row(true))
      case "remove_policies" =>
        Seq(Row(graft.sources.Policies.remove(spark, a.str(0, "relation"))))
      case "remove_all_policies" =>
        // sql/policy_api.sql:147-152: bundle + every policy_* job go in one
        // call; if_exists=false errors when nothing was configured
        val path = a.str(0, "relation")
        val ifExists = a.boolOpt(1, "if_exists").getOrElse(false)
        val removed = graft.sources.Policies.removeAll(spark, path)
        require(removed || ifExists,
          s"remove_all_policies: no policies found for $path " +
            "(use if_exists => true)")
        Seq(Row(removed))
      case "show_policies" =>
        graft.operators.Info.policies(spark, a.str(0, "relation")).collect().toSeq
      case v if v.startsWith("timescaledb_information") =>
        import graft.operators.Info
        val named = v.stripPrefix("timescaledb_information")
          .stripPrefix(".").stripPrefix("_")
        val base = viewAliases.getOrElse(named, named)
        val arg = a.str(0, "relation")
        val df = base match {
          case "hypertables" => Info.hypertables(spark, Seq(arg))
          case "chunks" => Info.chunks(ht(arg))
          case "dimensions" => Info.dimensions(ht(arg))
          case "chunk_columnstore_stats" => Info.chunkColumnstoreStats(ht(arg))
          case "hypertable_columnstore_stats" =>
            Info.hypertableColumnstoreStats(ht(arg))
          case "hypertable_columnstore_settings" =>
            Info.hypertableColumnstoreSettings(ht(arg))
          case "chunk_columnstore_settings" =>
            Info.chunkColumnstoreSettings(ht(arg))
          case "stat_chunk_activity" => Info.statChunkActivity(ht(arg))
          case "jobs" => Info.jobs(spark, arg)
          case "job_stats" => Info.jobStats(spark, arg)
          case "job_history" => Info.jobHistory(spark, arg)
          case "job_errors" => Info.jobErrors(spark, arg)
          case "policies" => Info.policies(spark, arg)
          case "continuous_aggregates" =>
            val cagg = graft.streaming.ContinuousAggregate.atPath(spark, arg).getOrElse(
              throw new IllegalArgumentException(
                s"no continuous aggregate registered at '$arg' in this session"))
            Info.continuousAggregates(Seq(cagg))
        }
        df.collect().toSeq // metadata-sized by construction
      case other =>
        throw new IllegalArgumentException(s"unknown admin function $other")
    }
    a.done()
    rows
  }

  private def parseBoolOpt(fn: String, name: String, v: String): Boolean =
    v.toLowerCase(java.util.Locale.ROOT) match {
      case "true" | "on" | "1" => true
      case "false" | "off" | "0" => false
      case other => throw new IllegalArgumentException(
        s"$fn: option '$name' must be boolean, got '$other'")
    }

  private def splitCols(v: String): Seq[String] =
    v.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** [[GraftCreateTableDDL]]'s executor. */
  private[plans] def runCreateTableDDL(spark: SparkSession, path: String,
      schema: StructType, opts: Map[String, String],
      ifNotExists: Boolean): Unit = {
    val fn = "CREATE TABLE ... WITH (tsdb.hypertable)"
    val ignored = Set("create_default_indexes", "associated_schema",
      "associated_table_prefix", "index", "sparse_index", "compress_index",
      "compress_sparse_index")
    val known = ignored ++ Set("hypertable", "columnstore",
      "enable_columnstore", "compress", "partition_column",
      "partitioning_column", "chunk_interval", "segmentby", "segment_by",
      "compress_segmentby", "orderby", "order_by", "compress_orderby")
    val unknown = opts.keySet -- known
    require(unknown.isEmpty,
      s"$fn: unsupported option(s): ${unknown.mkString(", ")}")
    require(opts.get("hypertable").forall(parseBoolOpt(fn, "hypertable", _)),
      s"$fn: tsdb.hypertable=false makes no sense on a path-addressed table")
    if (scala.util.Try(Hypertable.at(spark, path)).isSuccess) {
      // a bare CREATE TABLE on an existing hypertable must ERROR, like
      // Postgres — silently rewriting meta would change the chunk grid
      // (and reset the catalog mode) under existing chunk dirs
      require(ifNotExists, s"$fn: a hypertable already exists at '$path' " +
        "(use CREATE TABLE IF NOT EXISTS, or DROP TABLE first)")
      return
    }
    // partition column: explicit option, else the first timestamp column
    // (the reference's default rule, src/process_utility.c:4245-4260)
    val timeCol = opts.get("partition_column")
      .orElse(opts.get("partitioning_column"))
      .getOrElse(schema.fields.collectFirst {
        case f if f.dataType == TimestampType || f.dataType == TimestampNTZType => f.name
      }.getOrElse(throw new IllegalArgumentException(
        s"$fn: no timestamp column to partition by — " +
          "use tsdb.partition_column to specify one")))
    val field = schema.fields.find(_.name.equalsIgnoreCase(timeCol)).getOrElse(
      throw new IllegalArgumentException(
        s"$fn: partition column '$timeCol' is not in the column list"))
    val timeKind = field.dataType match {
      case LongType | IntegerType | ShortType => "bigint"
      case TimestampType | TimestampNTZType | DateType => "timestamp"
      case dt => throw new IllegalArgumentException(
        s"$fn: cannot partition on ${dt.sql} column '$timeCol'")
    }
    val width = opts.get("chunk_interval").getOrElse(
      if (timeKind == "bigint") "604800000000" else "7 days")
    Hypertable.create(spark, path, field.name, chunkWidth = width,
      timeKind = timeKind)
    val seg = opts.get("segmentby").orElse(opts.get("segment_by"))
      .orElse(opts.get("compress_segmentby")).map(splitCols).getOrElse(Nil)
    val ord = opts.get("orderby").orElse(opts.get("order_by"))
      .orElse(opts.get("compress_orderby")).map(splitCols).getOrElse(Nil)
    if (seg.nonEmpty || ord.nonEmpty)
      Hypertable.at(spark, path).setColumnstoreSettings(
        Columnstore.Options(segmentBy = seg, orderBy = ord))
  }

  /** [[GraftAlterTableDDL]]'s executor — the
    * `ALTER TABLE ... SET (timescaledb.*)` surface
    * (`src/with_clause/alter_table_with_clause.c`): columnstore settings
    * land in the per-table settings catalog; chunk_interval applies to
    * future chunks. Index/sparse-index and direct-compress knobs are
    * accepted and ignored (no parquet analogue); unknown options error.
    */
  private[plans] def runAlterTableDDL(spark: SparkSession, path: String,
      opts: Map[String, String]): Unit = {
    val fn = "ALTER TABLE ... SET (tsdb.*)"
    val ignored = Set("compress_index", "compress_sparse_index", "index",
      "sparse_index", "direct_compress", "compress_chunk_interval",
      "compress_chunk_time_interval")
    val known = ignored ++ Set("compress", "columnstore", "enable_columnstore",
      "chunk_interval", "compress_segmentby", "segmentby", "segment_by",
      "compress_orderby", "orderby", "order_by")
    val unknown = opts.keySet -- known
    require(unknown.isEmpty, s"$fn: unsupported option(s): ${unknown.mkString(", ")}")
    val h = Hypertable.at(spark, path)
    val enable = opts.get("compress").orElse(opts.get("columnstore"))
      .orElse(opts.get("enable_columnstore"))
    require(enable.forall(parseBoolOpt(fn, "enable_columnstore", _)),
      s"$fn: columnstore cannot be disabled — decompress_chunk reverts " +
        "chunks and removing the policy stops compressing")
    val seg = opts.get("segmentby").orElse(opts.get("segment_by"))
      .orElse(opts.get("compress_segmentby")).map(splitCols)
    val ord = opts.get("orderby").orElse(opts.get("order_by"))
      .orElse(opts.get("compress_orderby")).map(splitCols)
    if (seg.isDefined || ord.isDefined)
      h.setColumnstoreSettings(Columnstore.Options(
        segmentBy = seg.getOrElse(Nil), orderBy = ord.getOrElse(Nil)))
    opts.get("chunk_interval").foreach(h.setChunkTimeInterval)
  }

  /** [[GraftCreateCaggDDL]]'s executor. */
  private[plans] def runCreateCaggDDL(spark: SparkSession,
      c: GraftCreateCaggDDL): Unit = {
    val ht = Hypertable.at(spark, c.htPath)
    require(c.timeColName.equalsIgnoreCase(ht.timeCol),
      s"CREATE MATERIALIZED VIEW: time_bucket must be over the " +
        s"hypertable's time column '${ht.timeCol}', got '${c.timeColName}'")
    val (winCols, aggCols) = c.aggSqls
      .map(org.apache.spark.sql.functions.expr).partition(isWindowExpr)
    val defn = graft.streaming.CaggDef(
      bucketWidth = c.bucketWidth,
      groupCols = c.groupCols,
      aggs = aggCols,
      bucketCol = c.bucketCol,
      matChunkWidth = c.matChunkWidth.getOrElse("auto"),
      bucketTz = c.bucketTz,
      bucketOriginMicros = c.originMicros,
      windowCols = winCols)
    graft.streaming.ContinuousAggregate.create(
      spark, c.caggPath, ht, defn, withData = c.withData)
  }
}

/** Eagerly-executed admin call — Spark runs `RunnableCommand`s at
  * `Dataset.ofRows` time exactly like its own DDL commands.
  */
case class GraftAdminCommand(fn: String, args: Seq[SqlAdmin.Arg])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    SqlAdmin.outputs(fn).fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    SqlAdmin.run(sparkSession, fn, args)
}

/** The reference's DECLARATIVE hypertable DDL
  * (`src/with_clause/create_table_with_clause.c:15-28` option names;
  * `src/process_utility.c:4245` default-partition-column rule):
  * `CREATE TABLE '<path>' (<cols>) WITH (tsdb.hypertable, ...)`.
  * Creates the hypertable at the path and stores any declared columnstore
  * settings; the declared schema picks/validates the partition column and
  * its time kind (rows arrive via `Hypertable.write`/COPY, as everywhere
  * in graft). Postgres-only knobs (`create_default_indexes`,
  * `associated_schema`, `associated_table_prefix`, sparse-index options)
  * are accepted and ignored — parquet chunks have no btree indexes or
  * schema-qualified chunk names; unknown options error.
  */
case class GraftCreateTableDDL(path: String, declaredSchema: StructType,
    opts: Map[String, String], ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    SqlAdmin.runCreateTableDDL(sparkSession, path, declaredSchema, opts, ifNotExists)
    Nil
  }
}

/** The reference's declarative continuous-aggregate DDL
  * (`tsl/src/continuous_aggs/create.c:779`; option names in
  * `src/with_clause/create_materialized_view_with_clause.c`; test shapes
  * in `tsl/test/sql/cagg_ddl.sql`):
  * `CREATE MATERIALIZED VIEW '<path>' WITH (tsdb.continuous[, ...]) AS
  * SELECT time_bucket(w, ts) AS b, g..., aggs... FROM '<ht>' GROUP BY ...
  * [WITH [NO] DATA]`. Maps onto `ContinuousAggregate.create` exactly like
  * the `create_continuous_aggregate` call form. `materialized_only` is
  * accepted without effect: graft exposes BOTH `materialized` and
  * `realtime` reads on every cagg handle (the reference's flag only
  * toggles which one the view's SELECT serves). Absent WITH [NO] DATA
  * defaults to WITH DATA, Postgres's default for materialized views.
  */
/** `ALTER TABLE '<path>' SET (timescaledb.*)` — columnstore settings and
  * chunk interval through the reference's declarative form
  * (`src/with_clause/alter_table_with_clause.c` option names).
  */
case class GraftAlterTableDDL(path: String, opts: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    SqlAdmin.runAlterTableDDL(sparkSession, path, opts)
    Nil
  }
}

/** `DROP MATERIALIZED VIEW [IF EXISTS] '<path>'` → drop the continuous
  * aggregate (the statement-form twin of `drop_continuous_aggregate`).
  */
case class GraftDropCaggDDL(path: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    graft.streaming.ContinuousAggregate.atPath(sparkSession, path) match {
      case Some(c) => c.drop()
      case None => require(ifExists,
        s"no continuous aggregate registered at '$path' in this session")
    }
    Nil
  }
}

/** `DROP TABLE [IF EXISTS] '<path>'` → drop the hypertable (chunks,
  * catalog markers, registered cagg links — `Hypertable.drop`).
  */
case class GraftDropTableDDL(path: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    scala.util.Try(Hypertable.at(sparkSession, path)) match {
      case scala.util.Success(h) => h.drop()
      case scala.util.Failure(_) => require(ifExists,
        s"no hypertable at '$path'")
    }
    Nil
  }
}

case class GraftCreateCaggDDL(caggPath: String, htPath: String,
    bucketWidth: String, bucketCol: String, timeColName: String,
    bucketTz: Option[String], originMicros: Option[Long],
    matChunkWidth: Option[String], groupCols: Seq[String],
    aggSqls: Seq[String], withData: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    SqlAdmin.runCreateCaggDDL(sparkSession, this)
    Nil
  }
}

/** Parser extension: intercepts the admin-call statement shapes, delegates
  * every other statement (and every other ParserInterface method) to
  * Spark's own parser.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val callShapes = Seq(
    // SELECT fn(args)  /  SELECT * FROM fn(args)  /  CALL fn(args)
    """(?is)^\s*select\s+([a-z_][a-z0-9_.]*)\s*\((.*)\)\s*;?\s*$""".r,
    """(?is)^\s*select\s+\*\s+from\s+([a-z_][a-z0-9_.]*)\s*\((.*)\)\s*;?\s*$""".r,
    """(?is)^\s*call\s+([a-z_][a-z0-9_.]*)\s*\((.*)\)\s*;?\s*$""".r)

  // the reference's declarative DDL (option names:
  // src/with_clause/create_table_with_clause.c and
  // create_materialized_view_with_clause.c; both tsdb. and timescaledb.
  // prefixes are accepted, like the reference)
  private val createTableShape =
    ("""(?is)^\s*create\s+table\s+(if\s+not\s+exists\s+)?'([^']+)'""" +
      """\s*\((.*)\)\s*with\s*\((.*?)\)\s*;?\s*$""").r
  private val createMatViewShape =
    ("""(?is)^\s*create\s+materialized\s+view\s+(?:if\s+not\s+exists\s+)?""" +
      """'([^']+)'\s*with\s*\((.*?)\)\s*as\s+(.*?)""" +
      """(\s+with\s+(?:no\s+)?data)?\s*;?\s*$""").r
  private val alterTableSetShape =
    """(?is)^\s*alter\s+table\s+'([^']+)'\s+set\s*\((.*?)\)\s*;?\s*$""".r
  private val dropMatViewShape =
    """(?is)^\s*drop\s+materialized\s+view\s+(if\s+exists\s+)?'([^']+)'\s*;?\s*$""".r
  private val dropTableShape =
    """(?is)^\s*drop\s+table\s+(if\s+exists\s+)?'([^']+)'\s*;?\s*$""".r

  override def parsePlan(sqlText: String): LogicalPlan = {
    for (m <- alterTableSetShape.findFirstMatchIn(sqlText);
         opts <- parseTsdbOptions(m.group(2)))
      return GraftAlterTableDDL(m.group(1), opts)
    for (m <- dropMatViewShape.findFirstMatchIn(sqlText))
      return GraftDropCaggDDL(m.group(2), m.group(1) != null)
    for (m <- dropTableShape.findFirstMatchIn(sqlText))
      return GraftDropTableDDL(m.group(2), m.group(1) != null)
    for (m <- createTableShape.findFirstMatchIn(sqlText);
         opts <- parseTsdbOptions(m.group(4))) {
      require(opts.contains("hypertable"),
        "CREATE TABLE with tsdb options requires tsdb.hypertable")
      return GraftCreateTableDDL(m.group(2),
        delegate.parseTableSchema(m.group(3)), opts, m.group(1) != null)
    }
    for (m <- createMatViewShape.findFirstMatchIn(sqlText);
         opts <- parseTsdbOptions(m.group(2))) {
      require(opts.get("continuous").forall(_.toLowerCase == "true") &&
          opts.contains("continuous"),
        "CREATE MATERIALIZED VIEW with tsdb options requires tsdb.continuous")
      return parseCaggDDL(m.group(1), opts, m.group(3), m.group(4))
    }
    for (shape <- callShapes; m <- shape.findFirstMatchIn(sqlText)) {
      val fn = m.group(1).toLowerCase(java.util.Locale.ROOT)
      if (SqlAdmin.outputs.contains(fn)) {
        // the greedy capture runs to the LAST ')': a composite statement
        // (UNION, WHERE, alias after the call...) leaves unbalanced parens
        // or trailing clauses in the args region — those are NOT simple
        // admin calls and must reach Spark's parser untouched
        parseArgs(fn, m.group(2)) match {
          case Some(args) => return GraftAdminCommand(fn, args)
          case None => return delegate.parsePlan(sqlText)
        }
      }
    }
    delegate.parsePlan(sqlText)
  }

  /** Split `argsText` on top-level commas (quote- and paren-aware), parse
    * each with Spark's expression parser, fold to a literal. Returns None
    * when the text is not a plain argument list (paren underflow — the
    * statement had structure after the call).
    */
  private def parseArgs(fn: String, argsText: String): Option[Seq[SqlAdmin.Arg]] = {
    if (argsText.trim.isEmpty) return Some(Nil)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < argsText.length) {
      val c = argsText.charAt(i)
      if (inQuote) {
        cur.append(c)
        if (c == '\'')
          // '' escape: consume the second quote and stay in-quote
          if (i + 1 < argsText.length && argsText.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1
          } else inQuote = false
      } else c match {
        case '\'' => inQuote = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' =>
          depth -= 1
          if (depth < 0) return None // ')' closing the CALL itself mid-text
          cur.append(c)
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    if (depth != 0 || inQuote) return None
    parts += cur.toString
    val named = """(?s)^\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*=>\s*(.*)$""".r
    Some(parts.toSeq.map { p =>
      val (name, exprText) = p match {
        case named(n, rest) => (Some(n.toLowerCase(java.util.Locale.ROOT)), rest)
        case _ => (None, p)
      }
      val (value, dt) = foldLiteral(fn, exprText.trim)
      SqlAdmin.Arg(name, value, dt)
    })
  }

  /** Parse a WITH-clause option list where EVERY entry is a
    * `tsdb.`/`timescaledb.`-prefixed option (flag or `= value`); any other
    * entry → None, so plain-Spark WITH clauses reach the delegate parser
    * untouched. String values are unquoted ('' unescaped); bare flags
    * default to "true" (the reference's boolean-flag behavior).
    */
  private def parseTsdbOptions(text: String): Option[Map[String, String]] = {
    if (text.trim.isEmpty) return None
    val opt =
      """(?is)^\s*(?:tsdb|timescaledb)\s*\.\s*([a-z_]+)\s*(?:=\s*(.+?)\s*)?$""".r
    val out = scala.collection.mutable.Map.empty[String, String]
    for (entry <- SqlAdmin.splitTopLevel(text)) entry match {
      case opt(name, value) =>
        val v = Option(value).map { s0 =>
          val s = s0.trim
          if (s.length >= 2 && s.startsWith("'") && s.endsWith("'"))
            s.substring(1, s.length - 1).replace("''", "'")
          else s
        }.getOrElse("true")
        out += name.toLowerCase(java.util.Locale.ROOT) -> v
      case _ => return None
    }
    Some(out.toMap)
  }

  /** Parse the `AS SELECT time_bucket(...), g..., aggs... FROM '<ht>'
    * GROUP BY ...` body of a declarative continuous aggregate into a
    * [[GraftCreateCaggDDL]].
    */
  private def parseCaggDDL(caggPath: String, opts: Map[String, String],
      query: String, withDataClause: String): LogicalPlan = {
    val fn = "CREATE MATERIALIZED VIEW (tsdb.continuous)"
    val ignored = Set("create_group_indexes", "materialized_only")
    val known = ignored ++ Set("continuous", "chunk_interval")
    val unknown = opts.keySet -- known
    require(unknown.isEmpty, s"$fn: unsupported option(s): ${unknown.mkString(", ")}")
    val qm = ("""(?is)^\s*select\s+(.*?)\s+from\s+'([^']+)'""" +
      """\s*group\s+by\s+(.*?)\s*$""").r
    val (selText, htPath, grpText) = query match {
      case qm(s, h, g) => (s, h, g)
      case _ => throw new IllegalArgumentException(
        s"$fn: expected AS SELECT ... FROM '<hypertable-path>' GROUP BY ...")
    }
    val items = SqlAdmin.splitTopLevel(selText)
    val aliased = """(?is)^(.*)\s+as\s+([a-zA-Z_][a-zA-Z0-9_]*)\s*$""".r
    val bucketRe = """(?is)^time_bucket\s*\((.*)\)$""".r
    val bareCol = """^[a-zA-Z_][a-zA-Z0-9_]*$""".r
    var bucket: Option[(String, String, String)] = None // (argsText, alias, index)
    val groupColsB = scala.collection.mutable.ArrayBuffer.empty[String]
    val aggsB = scala.collection.mutable.ArrayBuffer.empty[String]
    // items by ordinal for GROUP BY 1,2 resolution
    val itemNames = items.zipWithIndex.map { case (it, ix) =>
      it.trim match {
        case aliased(_, a) => a
        case t => t
      }
    }
    val groupRefs = SqlAdmin.splitTopLevel(grpText).map(_.trim).map { g =>
      if (g.matches("""\d+""")) {
        val ix = g.toInt - 1
        require(ix >= 0 && ix < items.size, s"$fn: GROUP BY ordinal $g out of range")
        itemNames(ix)
      } else g
    }.toSet
    // pre-pass: locate the single time_bucket item FIRST — window-function
    // items may reference it from any select-list position (the reference
    // style `rank() OVER (PARTITION BY time_bucket('1 week', time))`,
    // cagg_ddl.sql:1459-1470)
    items.foreach { raw =>
      val it = raw.trim
      val (body, alias) = it match {
        case aliased(b, a) => (b.trim, Some(a))
        case _ => (it, None)
      }
      body match {
        case bucketRe(args) =>
          require(bucket.isEmpty, s"$fn: more than one time_bucket item")
          // store the EXPRESSION text (no alias) — GROUP BY may repeat
          // the raw time_bucket(...) call, the standard Postgres form
          bucket = Some((args, alias.getOrElse("bucket"), body))
        case _ => ()
      }
    }
    val (bArgsText, bAlias, bItem) = bucket.getOrElse(throw
      new IllegalArgumentException(s"$fn: SELECT must contain a time_bucket item"))
    // a `time_bucket(...)` call inside a window item's OVER clause names
    // the GROUP BY bucket (PostgreSQL matches it to the grouping expression
    // after literal normalization, so the width text may differ: '1week'
    // in the select vs '1 week' in OVER in the reference's cagg_window_1).
    // Rewrite it to the bucket's output alias — windows compute over the
    // aggregated rows, where only the alias exists — after checking it IS
    // the same bucket.
    val winBucketCall = """(?is)time_bucket\s*\(([^()]*)\)""".r
    val quotedW = """(?is)^(?:interval\s+)?'(.*)'$""".r
    def sameWidth(a: String, b: String): Boolean = {
      def micros(s: String): Option[(Int, Long)] = {
        val t = s match { case quotedW(w) => w; case o => o }
        if (t.matches("""\d+""")) Some((0, t.toLong))
        else scala.util.Try {
          // same PG-tolerant lexing as CaggDef.interval ('1week', '30m')
          val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
            org.apache.spark.unsafe.types.UTF8String.fromString(
              graft.expressions.TimeBucketUtil.pgIntervalText(t)))
          (iv.months, iv.days * 86400000000L + iv.microseconds)
        }.toOption
      }
      (micros(a), micros(b)) match {
        case (Some(x), Some(y)) => x == y
        case _ => a.replaceAll("\\s+", "") == b.replaceAll("\\s+", "")
      }
    }
    def rewriteWindowBody(body: String): String =
      winBucketCall.replaceAllIn(body, m => {
        val args = SqlAdmin.splitTopLevel(m.group(1)).map(_.trim)
        val bArgs0 = SqlAdmin.splitTopLevel(bArgsText).map(_.trim)
        require(args.size >= 2 && sameWidth(args(0), bArgs0(0)) &&
            args(1) == bArgs0(1) &&
            args.drop(2).map(_.replaceAll("\\s+", "")) ==
              bArgs0.drop(2).map(_.replaceAll("\\s+", "")),
          s"$fn: window expression references time_bucket(${m.group(1)}) " +
            s"which does not match the GROUP BY bucket time_bucket($bArgsText)")
        java.util.regex.Matcher.quoteReplacement(bAlias)
      })
    val overRx = """(?is)\bover\s*\(""".r
    items.foreach { raw =>
      val it = raw.trim
      val (body, alias) = it match {
        case aliased(b, a) => (b.trim, Some(a))
        case _ => (it, None)
      }
      body match {
        case bucketRe(_) => ()
        case bareCol() =>
          // a plain column: must be grouped; aliasing a group column would
          // rename it in the materialization — unsupported, like the call
          // form's group_cols list
          require(alias.forall(_ == body),
            s"$fn: cannot alias group column '$body'")
          require(groupRefs.contains(body),
            s"$fn: non-aggregate column '$body' is not in GROUP BY")
          groupColsB += body
        case _ =>
          require(alias.isDefined, s"$fn: aggregate '$body' needs an AS alias")
          val fixed = if (overRx.findFirstIn(body).isDefined) {
            val r = rewriteWindowBody(body)
            // a residual time_bucket call (e.g. nested parens the rewrite
            // regex cannot match) would only fail later with a generic
            // unresolved-column error — refuse with the targeted one
            require("""(?is)time_bucket\s*\(""".r.findFirstIn(r).isEmpty,
              s"$fn: window expression contains a time_bucket call that " +
                s"could not be matched to the GROUP BY bucket — reference " +
                s"the bucket's output alias instead: $body")
            r
          } else body
          aggsB += s"$fixed AS ${alias.get}"
      }
    }
    require(groupRefs.contains(bAlias) ||
        groupRefs.exists(_.replaceAll("\\s+", "") == bItem.replaceAll("\\s+", "")),
      s"$fn: the time_bucket item must be in GROUP BY")
    val bArgs = SqlAdmin.splitTopLevel(bArgsText).map(_.trim)
    require(bArgs.size >= 2, s"$fn: time_bucket needs (width, time_column)")
    val quoted = """(?is)^(?:interval\s+)?'(.*)'$""".r
    val width = bArgs(0) match {
      case quoted(w) => w
      case n if n.matches("""\d+""") => n // integer-time bucket width
      case other => throw new IllegalArgumentException(
        s"$fn: cannot parse time_bucket width '$other'")
    }
    val timeCol = bArgs(1)
    require(timeCol.matches(bareCol.regex),
      s"$fn: time_bucket's second argument must be the time column, got '$timeCol'")
    // optional 3rd arg: timezone (text) or origin (timestamp literal) —
    // disambiguated like the reference's overloads: a literal that parses
    // as a timestamp is an origin, otherwise a timezone name
    var tz: Option[String] = None
    var origin: Option[Long] = None
    val named = """(?is)^(timezone|origin|offset)\s*=>\s*(.*)$""".r
    val tsLit = """(?is)^timestamp\s+'(.*)'$""".r
    // a fixed interval (no month component) as offset — the reference's
    // offset-form caggs (`time_bucket('4 hour', time, '30m'::interval)`,
    // cagg_4_hours_offset): equivalent to the default origin shifted
    def asOffsetMicros(text: String): Option[Long] = scala.util.Try {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          graft.expressions.TimeBucketUtil.pgIntervalText(text)))
      require(iv.months == 0, "month offsets are not supported")
      iv.days * 86400000000L + iv.microseconds
    }.toOption
    bArgs.drop(2).foreach { a =>
      val (slot, value) = a match {
        case named(n, v) => (Some(n.toLowerCase(java.util.Locale.ROOT)), v.trim)
        case v => (None, v.trim)
      }
      val text = value match {
        case tsLit(s) => s
        case quoted(s) => s
        case other => other
      }
      val asTs = org.apache.spark.sql.catalyst.util.DateTimeUtils
        .stringToTimestamp(org.apache.spark.unsafe.types.UTF8String.fromString(text),
          java.time.ZoneId.of(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
      def offsetOrigin = asOffsetMicros(text).map(
        graft.expressions.TimeBucketUtil.DEFAULT_ORIGIN_MICROS + _)
      slot match {
        case Some("timezone") => tz = Some(text)
        case Some("origin") => origin = Some(asTs.getOrElse(
          throw new IllegalArgumentException(s"$fn: cannot parse origin '$text'")))
        case Some("offset") => origin = Some(offsetOrigin.getOrElse(
          throw new IllegalArgumentException(s"$fn: cannot parse offset '$text'")))
        case _ if asTs.isDefined => origin = asTs
        case _ if offsetOrigin.isDefined => origin = offsetOrigin
        case _ => tz = Some(text)
      }
    }
    val withData = withDataClause == null ||
      !withDataClause.toLowerCase(java.util.Locale.ROOT).contains("no")
    GraftCreateCaggDDL(caggPath, htPath, width, bAlias, timeCol, tz, origin,
      opts.get("chunk_interval"), groupColsB.toSeq, aggsB.toSeq, withData)
  }

  private val dimensionInfoCall = """(?is)^\s*by_(?:hash|range)\s*\(.*\)\s*$""".r

  private def foldLiteral(fn: String, exprText: String): (Any, DataType) = {
    // add_dimension's dimension_info constructors (sql/ddl_api.sql:167-177
    // by_hash/by_range) are not SQL literals — pass their text through for
    // the command to interpret
    if (fn == "add_dimension" && dimensionInfoCall.findFirstIn(exprText).isDefined)
      return (UTF8String.fromString(exprText.trim), StringType)
    val e = delegate.parseExpression(exprText)
    // bind timezone-less expressions (CAST('...' AS TIMESTAMP)) in the
    // SESSION zone — the same instant Spark's analyzer or Args' bare-string
    // binding would produce for the same wall-clock text; a fixed zone here
    // would silently shift destructive drop_chunks/retention cutoffs
    val sessionTz = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    val withTz = e.transformUp {
      case tz: TimeZoneAwareExpression if tz.timeZoneId.isEmpty =>
        tz.withTimeZone(sessionTz)
    }
    withTz match {
      case l: Literal => (l.value, l.dataType)
      case other if other.foldable => (other.eval(null), other.dataType)
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$exprText' must be a literal")
    }
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
