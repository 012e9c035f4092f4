package graft.sources

import java.time.{Instant, LocalDateTime, ZoneId}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.expressions.TimeBucketUtil

/** A registered background job — the reference's `bgw_job` row
  * (`sql/job_api.sql:5-15` `add_job`, catalog `src/bgw/job.c`).
  *
  * `proc` names an action in the in-session [[Jobs.registerProc]] registry —
  * the REGPROC analog: the reference stores a function reference that must
  * resolve when the job fires; here the session must register the action
  * under the same name before running it.
  */
case class JobSpec(
    id: Int,
    proc: String,
    scheduleIntervalMicros: Long,
    config: Map[String, String] = Map.empty,
    initialStartMicros: Option[Long] = None,
    scheduled: Boolean = true,
    /** Fixed schedules fire on the grid `initial_start + n*interval`
      * (no drift); drifting schedules fire `interval` after each finish
      * (`src/bgw/job_stat.c:282-302`).
      */
    fixedSchedule: Boolean = true,
    /** Local timezone for the fixed-schedule grid (DST-aware slot
      * alignment, `job_stat.c:263-271`).
      */
    timezone: Option[String] = None,
    jobName: Option[String] = None,
    /** −1 = retry forever (reference default). */
    maxRetries: Int = -1,
    retryPeriodMicros: Long = Jobs.DEFAULT_RETRY_PERIOD)

/** Per-job run statistics — `timescaledb_information.job_stats`
  * (`sql/views.sql` job_stats; fields from `src/bgw/job_stat.c`).
  */
case class JobStat(
    nextStartMicros: Option[Long] = None,
    lastRunStartMicros: Option[Long] = None,
    lastFinishMicros: Option[Long] = None,
    /** Finish time of the last SUCCESSFUL run — survives later failures
      * (the reference view's `last_successful_finish`).
      */
    lastSuccessfulFinishMicros: Option[Long] = None,
    lastRunSuccess: Option[Boolean] = None,
    totalRuns: Long = 0,
    totalSuccesses: Long = 0,
    totalFailures: Long = 0,
    consecutiveFailures: Int = 0)

/** One recorded job run — a `_timescaledb_internal.bgw_job_stat_history`
  * row (`sql/views.sql:293-366` job_history/job_errors; populated by
  * `src/bgw/job_stat_history.c`). `error` carries the failure's message
  * (the reference's `err_message`); pid/sqlerrcode have no analogue in a
  * Spark session.
  */
case class JobRun(
    id: Long,
    jobId: Int,
    proc: String,
    succeeded: Boolean,
    startMicros: Long,
    finishMicros: Long,
    config: Map[String, String],
    error: Option[String])

/** The general job/automation API — `add_job` / `alter_job` / `delete_job` /
  * `run_job` (`sql/job_api.sql`) plus the next-start scheduling semantics of
  * `src/bgw/job_stat.c`.
  *
  * The background-worker *scheduler* stays external by design (SURVEY §2.11:
  * cron/Airflow drive Spark jobs); what lives here is everything the
  * reference keeps in its catalog: the job records, their configs, the
  * fixed/drifting/backoff next-start math, and run statistics. An external
  * scheduler's whole loop is `Jobs.due(...)` → `Jobs.run(...)`.
  *
  * All clock inputs are explicit `nowMicros` arguments — deterministic under
  * test, and the scheduler owns the clock anyway.
  *
  * Deviation from the reference: no random jitter on failure backoff
  * (`job_stat.c:326-331` adds ±12.5% to avoid thundering herds of C workers;
  * a Spark-cluster scheduler submits jobs serially, and determinism is worth
  * more here).
  */
object Jobs {
  private val FILE = "_graft_jobs.json"
  /** User job ids start above the reference's reserved policy range
    * (`src/bgw/job.c` — ids < 1000 are internal).
    */
  private val FIRST_ID = 1000
  val DEFAULT_RETRY_PERIOD: Long = 5L * 60 * 1000000 // 5 min, job_api defaults
  private val MAX_INTERVALS_BACKOFF = 5 // job_stat.c:25
  private val MAX_FAILURES_MULTIPLIER = 20 // job_stat.c:26

  private val procs =
    new ConcurrentHashMap[String, (SparkSession, Map[String, String]) => Unit]()
  private val lock = new Object

  /** Register an action under a proc name (the REGPROC analog). Built-in
    * policy procs are pre-registered below.
    */
  def registerProc(name: String)(f: (SparkSession, Map[String, String]) => Unit): Unit =
    procs.put(name, f)

  // ------------------------------------------------------------- catalog IO

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val mapper = new ObjectMapper()

  private def toJson(j: JobSpec, s: JobStat): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", j.id)
    o.put("proc", j.proc)
    o.put("schedule_interval", j.scheduleIntervalMicros)
    val cfg = o.putObject("config")
    j.config.foreach { case (k, v) => cfg.put(k, v) }
    j.initialStartMicros.foreach(o.put("initial_start", _))
    o.put("scheduled", j.scheduled)
    o.put("fixed_schedule", j.fixedSchedule)
    j.timezone.foreach(o.put("timezone", _))
    j.jobName.foreach(o.put("job_name", _))
    o.put("max_retries", j.maxRetries)
    o.put("retry_period", j.retryPeriodMicros)
    s.nextStartMicros.foreach(o.put("next_start", _))
    s.lastRunStartMicros.foreach(o.put("last_run_start", _))
    s.lastFinishMicros.foreach(o.put("last_finish", _))
    s.lastSuccessfulFinishMicros.foreach(o.put("last_successful_finish", _))
    s.lastRunSuccess.foreach(o.put("last_run_success", _))
    o.put("total_runs", s.totalRuns)
    o.put("total_successes", s.totalSuccesses)
    o.put("total_failures", s.totalFailures)
    o.put("consecutive_failures", s.consecutiveFailures)
    o
  }

  private def optLong(n: JsonNode, k: String): Option[Long] =
    if (n.has(k)) Some(n.get(k).asLong) else None
  private def optStr(n: JsonNode, k: String): Option[String] =
    if (n.has(k)) Some(n.get(k).asText) else None

  private def fromJson(n: JsonNode): (JobSpec, JobStat) = {
    val cfg = Option(n.get("config")).map { c =>
      c.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty[String, String])
    val spec = JobSpec(
      id = n.get("id").asInt,
      proc = n.get("proc").asText,
      scheduleIntervalMicros = n.get("schedule_interval").asLong,
      config = cfg,
      initialStartMicros = optLong(n, "initial_start"),
      scheduled = n.get("scheduled").asBoolean,
      fixedSchedule = n.get("fixed_schedule").asBoolean,
      timezone = optStr(n, "timezone"),
      jobName = optStr(n, "job_name"),
      maxRetries = n.get("max_retries").asInt,
      retryPeriodMicros = n.get("retry_period").asLong)
    val stat = JobStat(
      nextStartMicros = optLong(n, "next_start"),
      lastRunStartMicros = optLong(n, "last_run_start"),
      lastFinishMicros = optLong(n, "last_finish"),
      lastSuccessfulFinishMicros = optLong(n, "last_successful_finish"),
      lastRunSuccess = if (n.has("last_run_success")) Some(n.get("last_run_success").asBoolean) else None,
      totalRuns = n.get("total_runs").asLong,
      totalSuccesses = n.get("total_successes").asLong,
      totalFailures = n.get("total_failures").asLong,
      consecutiveFailures = n.get("consecutive_failures").asInt)
    (spec, stat)
  }

  /** All jobs with their stats, in id order. */
  def list(spark: SparkSession, root: String): Seq[(JobSpec, JobStat)] =
    readCatalog(spark, root)._2

  /** (next id to allocate, jobs). Ids come from a persisted counter — never
    * recycled after delete_job, like the reference's bgw_job sequence (an
    * external scheduler holding a stale id must not fire a different job).
    */
  private def readCatalog(spark: SparkSession,
      root: String): (Int, Seq[(JobSpec, JobStat)]) = {
    val p = new Path(root, FILE)
    val filesys = fs(spark, root)
    if (!filesys.exists(p)) return (FIRST_ID, Seq.empty)
    val tree = mapper.readTree(Hypertable.readSmallFile(filesys, p))
    // migrate a bare-array catalog written before the next_id counter
    // existed: treat max(id)+1 as the counter
    if (tree.isArray) {
      val jobs = tree.elements().asScala.map(fromJson).toSeq.sortBy(_._1.id)
      return (((FIRST_ID - 1) +: jobs.map(_._1.id)).max + 1, jobs)
    }
    val jobs = tree.get("jobs").elements().asScala.map(fromJson).toSeq.sortBy(_._1.id)
    (tree.get("next_id").asInt, jobs)
  }

  private def save(spark: SparkSession, root: String, nextId: Int,
      jobs: Seq[(JobSpec, JobStat)]): Unit = {
    val o = mapper.createObjectNode()
    o.put("next_id", nextId)
    val arr = o.putArray("jobs")
    jobs.sortBy(_._1.id).foreach { case (j, s) => arr.add(toJson(j, s)) }
    Hypertable.writeSmallFile(fs(spark, root), new Path(root, FILE), o.toString)
  }

  // ------------------------------------------------------------------- API

  /** `add_job(proc, schedule_interval, config, initial_start, scheduled,
    * fixed_schedule, timezone, job_name)` → job id (`sql/job_api.sql:5-15`).
    * First fire is at `initial_start` when given, else one interval from
    * `nowMicros`; a fixed schedule with no `initial_start` anchors its grid
    * at `nowMicros` (the reference anchors at the transaction timestamp).
    */
  def add(spark: SparkSession, root: String, proc: String,
      scheduleIntervalMicros: Long, nowMicros: Long,
      config: Map[String, String] = Map.empty,
      initialStartMicros: Option[Long] = None,
      scheduled: Boolean = true,
      fixedSchedule: Boolean = true,
      timezone: Option[String] = None,
      jobName: Option[String] = None): Int = lock.synchronized {
    require(scheduleIntervalMicros > 0, "schedule_interval must be positive")
    timezone.foreach(ZoneId.of(_)) // fail fast on a bad zone, like the reference
    val (nextId, existing) = readCatalog(spark, root)
    val id = nextId
    val spec = JobSpec(id, proc, scheduleIntervalMicros, config,
      initialStartMicros.orElse(if (fixedSchedule) Some(nowMicros) else None),
      scheduled, fixedSchedule, timezone, jobName)
    val next = initialStartMicros.getOrElse(nowMicros + scheduleIntervalMicros)
    save(spark, root, id + 1, existing :+ (spec, JobStat(nextStartMicros = Some(next))))
    id
  }

  /** `alter_job` (`sql/job_api.sql:22-42`): apply the given changes, return
    * the updated spec. `nextStart` overrides the computed schedule like the
    * reference's explicit `next_start` argument. Unknown id errors unless
    * `ifExists`.
    */
  def alter(spark: SparkSession, root: String, id: Int,
      scheduleIntervalMicros: Option[Long] = None,
      scheduled: Option[Boolean] = None,
      config: Option[Map[String, String]] = None,
      configMerge: Option[Map[String, String]] = None,
      nextStartMicros: Option[Long] = None,
      fixedSchedule: Option[Boolean] = None,
      initialStartMicros: Option[Long] = None,
      timezone: Option[String] = None,
      jobName: Option[String] = None,
      maxRetries: Option[Int] = None,
      retryPeriodMicros: Option[Long] = None,
      ifExists: Boolean = false): Option[JobSpec] = lock.synchronized {
    require(config.isEmpty || configMerge.isEmpty,
      "config and config_merge are mutually exclusive") // job_api.sql config_merge
    // the same bounds add() enforces — run()'s next-start math divides by
    // and buckets with these
    scheduleIntervalMicros.foreach(w =>
      require(w > 0, "schedule_interval must be positive"))
    retryPeriodMicros.foreach(w => require(w > 0, "retry_period must be positive"))
    maxRetries.foreach(m => require(m >= -1, "max_retries must be >= -1"))
    timezone.foreach(ZoneId.of(_))
    val (nextId, jobs) = readCatalog(spark, root)
    val hit = jobs.find(_._1.id == id)
    if (hit.isEmpty) {
      if (ifExists) return None
      throw new IllegalArgumentException(s"job $id not found")
    }
    val (j, s) = hit.get
    val updated = j.copy(
      scheduleIntervalMicros = scheduleIntervalMicros.getOrElse(j.scheduleIntervalMicros),
      scheduled = scheduled.getOrElse(j.scheduled),
      config = config.getOrElse(configMerge.map(j.config ++ _).getOrElse(j.config)),
      fixedSchedule = fixedSchedule.getOrElse(j.fixedSchedule),
      // flipping a drifting job to a fixed schedule needs a grid anchor:
      // without one the grid would snap to epoch 0 — anchor at the job's
      // current next_start (the first fixed slot the operator observes)
      initialStartMicros = initialStartMicros.orElse(j.initialStartMicros)
        .orElse(if (fixedSchedule.contains(true)) s.nextStartMicros else None),
      timezone = timezone.orElse(j.timezone),
      jobName = jobName.orElse(j.jobName),
      maxRetries = maxRetries.getOrElse(j.maxRetries),
      retryPeriodMicros = retryPeriodMicros.getOrElse(j.retryPeriodMicros))
    val stat = nextStartMicros.map(n => s.copy(nextStartMicros = Some(n))).getOrElse(s)
    save(spark, root, nextId, jobs.filterNot(_._1.id == id) :+ (updated, stat))
    Some(updated)
  }

  /** `delete_job(job_id)`. Errors on unknown id like the reference. */
  def delete(spark: SparkSession, root: String, id: Int): Unit = lock.synchronized {
    val (nextId, jobs) = readCatalog(spark, root)
    require(jobs.exists(_._1.id == id), s"job $id not found")
    save(spark, root, nextId, jobs.filterNot(_._1.id == id))
  }

  /** Jobs an external scheduler should fire now: scheduled, with
    * `next_start <= nowMicros`.
    */
  def due(spark: SparkSession, root: String, nowMicros: Long): Seq[JobSpec] =
    list(spark, root).collect {
      case (j, s) if j.scheduled && s.nextStartMicros.exists(_ <= nowMicros) => j
    }

  /** `run_job(job_id)` + the scheduler's post-run bookkeeping
    * (`src/bgw/job_stat.c:480-520`): execute the proc, record stats, compute
    * the next start (fixed grid / drift / failure backoff). Returns whether
    * the run succeeded; rethrows nothing (failures are recorded, like a
    * crashed background worker). `finishMicros` defaults to `nowMicros` —
    * pass the real finish time when the action's duration matters to the
    * drifting schedule.
    */
  def run(spark: SparkSession, root: String, id: Int, nowMicros: Long,
      finishMicros: Option[Long] = None): Boolean = {
    val (spec, _) = list(spark, root).find(_._1.id == id)
      .getOrElse(throw new IllegalArgumentException(s"job $id not found"))
    val f = Option(procs.get(spec.proc)).getOrElse(
      throw new IllegalStateException(
        s"proc '${spec.proc}' is not registered in this session"))
    val err: Option[String] =
      try { f(spark, spec.config); None }
      catch { case scala.util.control.NonFatal(e) =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    val ok = err.isEmpty
    lock.synchronized {
      val (nextId, jobs) = readCatalog(spark, root)
      jobs.find(_._1.id == id).foreach { case (j, s) =>
        val finish = finishMicros.getOrElse(nowMicros)
        val fails = if (ok) 0 else s.consecutiveFailures + 1
        val next =
          if (ok) nextStartOnSuccess(j, finish)
          else nextStartOnFailure(j, finish, fails)
        val stat = JobStat(
          nextStartMicros = Some(next),
          lastRunStartMicros = Some(nowMicros),
          lastFinishMicros = Some(finish),
          lastSuccessfulFinishMicros =
            if (ok) Some(finish) else s.lastSuccessfulFinishMicros,
          lastRunSuccess = Some(ok),
          totalRuns = s.totalRuns + 1,
          totalSuccesses = s.totalSuccesses + (if (ok) 1 else 0),
          totalFailures = s.totalFailures + (if (ok) 0 else 1),
          consecutiveFailures = fails)
        save(spark, root, nextId, jobs.filterNot(_._1.id == id) :+ (j, stat))
        appendHistory(spark, root,
          JobRun(0, id, j.proc, ok, nowMicros, finish, j.config, err))
      }
    }
    ok
  }

  // --------------------------------------------------------- run history
  // The reference keeps every run's outcome in
  // _timescaledb_internal.bgw_job_stat_history (job_stat_history.c),
  // surfaced by timescaledb_information.job_history/job_errors and pruned
  // by the built-in retention job (sql/job_stat_history_log_retention.sql).
  // Graft's analogue is a per-root `_graft_job_history.json` appended
  // under the catalog lock; entries carry a never-recycled sequence id.

  private val HISTORY_FILE = "_graft_job_history.json"

  /** All recorded runs, id (= execution) order. */
  def history(spark: SparkSession, root: String): Seq[JobRun] =
    readHistory(spark, root)._2

  private def readHistory(spark: SparkSession,
      root: String): (Long, Seq[JobRun]) = {
    val p = new Path(root, HISTORY_FILE)
    val filesys = fs(spark, root)
    if (!filesys.exists(p)) return (1L, Seq.empty)
    val tree = mapper.readTree(Hypertable.readSmallFile(filesys, p))
    val runs = tree.get("runs").elements().asScala.map { n =>
      val cfg = Option(n.get("config")).map { c =>
        c.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
      }.getOrElse(Map.empty[String, String])
      JobRun(n.get("id").asLong, n.get("job_id").asInt, n.get("proc").asText,
        n.get("succeeded").asBoolean, n.get("start").asLong,
        n.get("finish").asLong, cfg, optStr(n, "error"))
    }.toSeq.sortBy(_.id)
    (tree.get("next_id").asLong, runs)
  }

  private def saveHistory(spark: SparkSession, root: String, nextId: Long,
      runs: Seq[JobRun]): Unit = {
    val o = mapper.createObjectNode()
    o.put("next_id", nextId)
    val arr = o.putArray("runs")
    runs.sortBy(_.id).foreach { r =>
      val n = arr.addObject()
      n.put("id", r.id)
      n.put("job_id", r.jobId)
      n.put("proc", r.proc)
      n.put("succeeded", r.succeeded)
      n.put("start", r.startMicros)
      n.put("finish", r.finishMicros)
      val cfg = n.putObject("config")
      r.config.foreach { case (k, v) => cfg.put(k, v) }
      r.error.foreach(n.put("error", _))
    }
    Hypertable.writeSmallFile(fs(spark, root), new Path(root, HISTORY_FILE),
      o.toString)
  }

  /** Size backstop on the history file: each append rewrites the whole
    * JSON (small-file catalog semantics), so unbounded growth would make
    * run_job bookkeeping O(total runs). Time-based pruning belongs to the
    * retention proc; this cap only bounds the rewrite cost between its
    * passes — the reference's bgw_job_stat_history has the same
    * two-layer shape (append table + scheduled retention job).
    */
  private val MAX_HISTORY = 10000

  /** Callers hold [[lock]] (invoked from [[run]]'s bookkeeping block). */
  private def appendHistory(spark: SparkSession, root: String,
      run: JobRun): Unit = {
    val (nextId, runs) = readHistory(spark, root)
    val appended = runs :+ run.copy(id = nextId)
    saveHistory(spark, root, nextId + 1,
      if (appended.size > MAX_HISTORY) appended.takeRight(MAX_HISTORY)
      else appended)
  }

  /** Drop history entries that FINISHED before `cutoffMicros` — the
    * retention proc's core (`sql/job_stat_history_log_retention.sql`
    * deletes on `execution_finish < now() - drop_after`). Returns the
    * number pruned.
    */
  def historyRetention(spark: SparkSession, root: String,
      cutoffMicros: Long): Long = lock.synchronized {
    val (nextId, runs) = readHistory(spark, root)
    val keep = runs.filter(_.finishMicros >= cutoffMicros)
    if (keep.size != runs.size) saveHistory(spark, root, nextId, keep)
    (runs.size - keep.size).toLong
  }

  // ------------------------------------------------------- next-start math

  /** Fixed: the next grid slot `initial_start + n*interval` strictly after
    * `finish` (`job_stat.c:ts_get_next_scheduled_execution_slot` — bucket
    * with origin = initial_start, in the job's timezone when set, then step
    * past `finish`). Drifting: `finish + interval` (`job_stat.c:292-299`).
    */
  private[graft] def nextStartOnSuccess(j: JobSpec, finishMicros: Long): Long = {
    if (!j.fixedSchedule)
      return finishMicros + j.scheduleIntervalMicros
    val origin = j.initialStartMicros.getOrElse(0L)
    j.timezone match {
      case Some(tz) =>
        // bucket AND step in local wall-clock space so a daily 09:00 job
        // stays at 09:00 local across DST (the reference's timezone bucket
        // grid, job_stat.c:263-271)
        val zone = ZoneId.of(tz)
        def toLocal(us: Long): Long = {
          val i = Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L)
          val l = LocalDateTime.ofInstant(i, zone)
          l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000L
        }
        def fromLocal(us: Long): Long = {
          val l = LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
          val i = l.atZone(zone).toInstant
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        var lslot = TimeBucketUtil.bucketMicros(toLocal(finishMicros),
          j.scheduleIntervalMicros, toLocal(origin))
        while (fromLocal(lslot) <= finishMicros) lslot += j.scheduleIntervalMicros
        fromLocal(lslot)
      case None =>
        var slot =
          TimeBucketUtil.bucketMicros(finishMicros, j.scheduleIntervalMicros, origin)
        while (slot <= finishMicros) slot += j.scheduleIntervalMicros
        slot
    }
  }

  /** Backoff: `finish + min(retry_period * min(fails, 20),
    * 5 * schedule_interval)` (`job_stat.c:340-380`, jitter omitted). Once
    * `max_retries` consecutive failures are exhausted the job falls back to
    * its regular schedule.
    */
  private[graft] def nextStartOnFailure(j: JobSpec, finishMicros: Long,
      consecutiveFailures: Int): Long = {
    if (j.maxRetries >= 0 && consecutiveFailures > j.maxRetries)
      return nextStartOnSuccess(j, finishMicros)
    val mult = math.min(consecutiveFailures, MAX_FAILURES_MULTIPLIER).toLong
    val backoff = math.min(j.retryPeriodMicros * mult,
      j.scheduleIntervalMicros * MAX_INTERVALS_BACKOFF)
    finishMicros + backoff
  }

  // ------------------------------------------------- built-in policy procs
  // The reference implements its policies AS jobs (policy_retention etc.,
  // `sql/policy_internal.sql`); registering the same proc names makes
  // add_job the automation entry point for graft's policy machinery too.
  // Config keys: hypertable (path), plus the per-policy lag in dimension
  // units. "now" is the config key when present (tests / replays), else the
  // hypertable's own clock — wall micros for timestamp dimensions, the
  // registered integer-now func for bigint ones (ddl_api.sql:73-79).

  private def cfgNow(config: Map[String, String], ht: Hypertable): Long =
    config.get("now").map(_.toLong).getOrElse(ht.nowMicros())

  registerProc("policy_retention") { (spark, config) =>
    val ht = Hypertable.at(spark, config("hypertable"))
    ht.dropChunks(cfgNow(config, ht) - config("drop_after").toLong)
  }

  registerProc("policy_compaction") { (spark, config) =>
    val ht = Hypertable.at(spark, config("hypertable"))
    CompactionPolicy.run(ht,
      targetFileBytes = config.get("target_file_bytes").map(_.toLong)
        .getOrElse(Columnstore.DEFAULT_FILE_BYTES),
      maxChunks = config.get("max_chunks").map(_.toInt).getOrElse(0),
      maxFiles = config.get("max_batches").map(_.toInt).getOrElse(0),
      inactiveForMicros = config.get("inactive_for").map(_.toLong),
      // the inactive_for gate compares FILE MTIMES, so `now` here is
      // WALL-CLOCK micros (config "wall_now" overrides for replay) — NOT
      // cfgNow, whose integer-dimension values are in table units and
      // would make the cutoff nonsense on bigint hypertables
      nowMicros = () => config.get("wall_now").map(_.toLong)
        .getOrElse(System.currentTimeMillis * 1000L))
  }

  registerProc("policy_columnstore") { (spark, config) =>
    val ht = Hypertable.at(spark, config("hypertable"))
    // layout resolution mirrors the reference policy: explicit job-config
    // "segmentby"/"orderby" keys win, else the table's STORED settings
    // (setColumnstoreSettings = the compression_settings catalog), else
    // the stats-derived defaults
    def cols(k: String): Seq[String] =
      config.get(k).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val opts =
      if (config.contains("segmentby") || config.contains("orderby"))
        Columnstore.Options(segmentBy = cols("segmentby"), orderBy = cols("orderby"))
      else Columnstore.resolveOptions(ht)
    Columnstore.compress(ht, opts,
      Some(cfgNow(config, ht) - config("compress_after").toLong))
  }

  registerProc("policy_reorder") { (spark, config) =>
    val ht = Hypertable.at(spark, config("hypertable"))
    val orderBy = config("orderby").split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(orderBy.nonEmpty, "policy_reorder: empty orderby")
    ReorderPolicy.run(ht, orderBy,
      olderThanMicros = config.get("older_than").map(_.toLong))
  }

  // the reference's history retention job (job id 3 in its catalog,
  // `sql/job_stat_history_log_retention.sql`: DELETE WHERE
  // execution_finish < now() - drop_after, default 1 month) — here a
  // registrable proc with config keys root, drop_after (micros), and the
  // usual "now" override for deterministic replay
  registerProc("policy_job_stat_history_retention") { (spark, config) =>
    val root = config("root")
    val now = config.get("now").map(_.toLong)
      .getOrElse(System.currentTimeMillis * 1000L)
    val dropAfter = config.get("drop_after").map(_.toLong)
      .getOrElse(30L * 86400000000L)
    historyRetention(spark, root, now - dropAfter)
  }

  // the reference's cagg refresh policy (`policy_internal.sql`
  // policy_refresh_continuous_aggregate): offsets back from the cagg's
  // clock, window inscribed to whole buckets, optional batching. The cagg
  // must be `create`d in this session (definitions carry Column
  // expressions — there is no on-disk form to re-open, like views).
  registerProc("policy_refresh_continuous_aggregate") { (spark, config) =>
    val path = config("continuous_aggregate")
    val cagg = graft.streaming.ContinuousAggregate.atPath(spark, path).getOrElse(
      throw new IllegalStateException(
        s"no continuous aggregate registered at '$path' in this session — " +
          "ContinuousAggregate.create it first"))
    val now = config.get("now").map(_.toLong).getOrElse(cagg.source match {
      case h: Hypertable => h.nowMicros()
      case _ => System.currentTimeMillis * 1000L
    })
    graft.streaming.CaggRefreshPolicy.run(cagg, now,
      config("start_offset").toLong, config("end_offset").toLong,
      bucketsPerBatch = config.get("buckets_per_batch").map(_.toInt).getOrElse(0),
      maxBatchesPerExecution =
        config.get("max_batches_per_execution").map(_.toInt).getOrElse(0))
  }
}
