package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap: SQL function registration + scale-oriented defaults.
  * Call [[Graft.init]] on any session before using graft SQL functions;
  * the Column-API facade in [[graft.functions]] works without it.
  */
object Graft {

  /** Register graft SQL functions + optimizer rules on an existing
    * session. Idempotent. (New sessions can instead be built with
    * `withExtensions(new GraftExtensions)` / `spark.sql.extensions`.)
    */
  def init(spark: SparkSession): SparkSession = {
    val reg = spark.sessionState.functionRegistry
    // one registration pass per session, tracked by a sentinel: a per-name
    // exists-check would wrongly skip intentional BUILTIN overrides
    // (first/last gain the reference's 2-arg bookend forms), and
    // re-registering every init call spams "replaced a previously
    // registered function" per query. GraftExtensions injects the SAME
    // sentinel, so init() on an extensions-built session is a full no-op —
    // appending the rules again would run every rule twice per query.
    val marker = org.apache.spark.sql.catalyst.FunctionIdentifier(
      GraftExtensions.SENTINEL)
    if (!reg.functionExists(marker)) {
      GraftExtensions.functionBuilders.foreach { case (name, builder) =>
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      }
      reg.createOrReplaceTempFunction(marker.funcName,
        _ => org.apache.spark.sql.catalyst.expressions.Literal(true), "scala_udf")
      for (rule <- Seq(graft.plans.GapfillRewrite, graft.plans.SortTransform,
          graft.plans.CaggRewrite, graft.plans.ChunkExclusion))
        if (!spark.experimental.extraOptimizations.contains(rule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
      if (!spark.experimental.extraStrategies.contains(graft.plans.GraftStrategies))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.GraftStrategies
    }
    spark
  }

  /** Opt a continuous aggregate into transparent query rewrite: matching
    * raw-hypertable aggregations are answered from its realtime view
    * (reference `rewrite_with_caggs.c`).
    */
  /** Register an atomic conditional-PUT backend for a filesystem scheme
    * (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`, ABFS ETag
    * preconditions): exclusive claims — including the stream-log seq
    * claim — then decide in ONE store round-trip on that scheme, and the
    * blind-PUT readback + settle belt retires for it.
    */
  def registerConditionalPutClaims(scheme: String,
      backend: graft.sources.ConditionalPutBackend): Unit =
    graft.sources.MutationGate.registerConditionalPut(scheme, backend)

  def registerCaggRewrite(cagg: graft.streaming.ContinuousAggregate): Unit =
    graft.plans.CaggRewrite.register(cagg)

  /** Shared session builder for the measurement tools (Bench, Profile,
    * PlanDump): one config block — including the env-overridable scan-split
    * and AQE knobs — so profiles and plan dumps are captured under exactly
    * the session configuration the bench measures (a profile taken with
    * SPARK_GRAFT_AQE_* set must not silently run different AQE settings
    * than the bench it is evidence for).
    */
  def toolSession(cpus: String): SparkSession =
    init(SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      // NOT set: fs.file.impl=RawLocalFileSystem (checksum-free local FS).
      // Measured r14 A/B on the machinery subset (q62/q72/q73/q75/q76/
      // q100): 11.53 s (LocalFileSystem) vs 11.67 s (RawLocal) — the .crc
      // sidecar savings are repaid by RawLocal's fork-per-getFileStatus
      // permission loading; the r13 nio fast path already removed the
      // checksum cost where it mattered (graft's own metadata files).
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing knobs, env-overridable for A/B and deployments —
      // kept at Spark defaults locally (see Bench for the measured A/B)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  /** Local session with the defaults every graft entry point uses. */
  def session(appName: String = "graft", master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession = {
    init(SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Scan split sizing, unified with Bench (the bench must measure the
      // library's real default, not a bench-only config): single-file
      // fixture-scale tables split near row-group granularity so a plain
      // scan-agg parallelizes; a many-file 100 TB layout is unaffected in
      // practice (files ≥ the split size parallelize naturally) and
      // deployments override via env or a builder config.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing knobs, env-overridable (see Bench for the sf0.1
      // A/B: size-driven coalescing traded write-row gains for read-row
      // single-task serialization — kept at Spark defaults locally;
      // clusters that oversize shuffle.partitions flip parallelismFirst
      // per the optimization guide §2.2/§9 without touching code)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.sql.parquet.filterPushdown", "true")
      // INT96 timestamps carry no parquet min/max stats — micros keep
      // row-group skipping and footer-stats queries working on time columns
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // task commits rename straight into the destination (v2): the v1
      // driver-side sequential rename pass costs ~45 ms/dir and dominates
      // partitioned writes with many chunk dirs
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
  }
}
