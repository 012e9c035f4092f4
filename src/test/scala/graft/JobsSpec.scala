package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, Hypertable, Jobs, JobSpec}
import graft.operators.Info

/** The general job API — add/alter/delete/run_job (`sql/job_api.sql`) and
  * the next-start scheduling semantics of `src/bgw/job_stat.c`.
  */
class JobsSpec extends AnyFunSuite {
  lazy val spark = Graft.session("jobs-spec", "local[4]", 4)

  private val HOUR = 3600L * 1000000
  private def root() = Files.createTempDirectory("graft_jobs").toString

  test("add_job allocates ids from 1000, delete_job removes, unknown id errors") {
    val r = root()
    val a = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L)
    val b = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L)
    assert(a === 1000 && b === 1001)
    Jobs.delete(spark, r, a)
    assert(Jobs.list(spark, r).map(_._1.id) === Seq(b))
    intercept[IllegalArgumentException](Jobs.delete(spark, r, a))
    intercept[IllegalArgumentException](Jobs.alter(spark, r, a, scheduled = Some(false)))
    assert(Jobs.alter(spark, r, a, scheduled = Some(false), ifExists = true).isEmpty)
  }

  test("run history: outcomes land in job_history, failures in job_errors, retention prunes") {
    val r = root()
    Jobs.registerProc("spec_ok") { (_, _) => () }
    Jobs.registerProc("spec_boom") { (_, _) =>
      throw new IllegalStateException("boom: chunk not found")
    }
    val ok = Jobs.add(spark, r, "spec_ok", HOUR, nowMicros = 0L)
    val bad = Jobs.add(spark, r, "spec_boom", HOUR, nowMicros = 0L)
    assert(Jobs.run(spark, r, ok, nowMicros = 1000L))
    assert(!Jobs.run(spark, r, bad, nowMicros = 2000L))
    assert(!Jobs.run(spark, r, bad, nowMicros = 3000L))

    // every run recorded, ids sequential, error text captured
    val hist = Jobs.history(spark, r)
    assert(hist.map(h => (h.jobId, h.succeeded)) ===
      Seq((ok, true), (bad, false), (bad, false)))
    assert(hist.map(_.id) === Seq(1L, 2L, 3L))
    assert(hist.last.error.exists(_.contains("boom")))

    // the views: job_history has all rows, job_errors only failures
    assert(Info.jobHistory(spark, r).count() === 3)
    val errs = Info.jobErrors(spark, r).collect()
    assert(errs.length === 2)
    assert(errs.forall(_.getAs[String]("err_message").contains("boom")))
    assert(errs.forall(_.getAs[String]("proc_name") == "spec_boom"))
    // SQL surface
    assert(spark.sql(
      s"SELECT * FROM timescaledb_information.job_errors('$r')").count() === 2)
    assert(spark.sql(
      s"SELECT * FROM timescaledb_information.job_history('$r')").count() === 3)

    // the retention proc prunes by finish time; survivors keep their ids
    val rid = Jobs.add(spark, r, "policy_job_stat_history_retention", HOUR,
      nowMicros = 0L,
      config = Map("root" -> r, "drop_after" -> "500", "now" -> "3000"))
    assert(Jobs.run(spark, r, rid, nowMicros = 4000L))
    // cutoff = 3000 - 500 = 2500: runs finished at 1000 and 2000 go, the
    // 3000 one stays, and the retention run itself is recorded
    val after = Jobs.history(spark, r)
    assert(after.map(h => (h.id, h.jobId)) === Seq((3L, bad), (4L, rid)))
  }

  test("initial_start anchors the first fire; otherwise now + interval") {
    val r = root()
    val a = Jobs.add(spark, r, "noop", HOUR, nowMicros = 10L,
      initialStartMicros = Some(42L))
    val b = Jobs.add(spark, r, "noop", HOUR, nowMicros = 10L)
    val byId = Jobs.list(spark, r).map(x => x._1.id -> x._2).toMap
    assert(byId(a).nextStartMicros === Some(42L))
    assert(byId(b).nextStartMicros === Some(10L + HOUR))
  }

  test("run_job executes the proc with its config and records stats") {
    val r = root()
    @volatile var got: Map[String, String] = null
    Jobs.registerProc("spec_capture") { (_, cfg) => got = cfg }
    val id = Jobs.add(spark, r, "spec_capture", HOUR, nowMicros = 0L,
      config = Map("k" -> "v", "quoted" -> """say "hi"\back"""))
    assert(Jobs.run(spark, r, id, nowMicros = 500L))
    assert(got === Map("k" -> "v", "quoted" -> """say "hi"\back"""))
    val s = Jobs.list(spark, r).head._2
    assert(s.totalRuns === 1 && s.totalSuccesses === 1 && s.totalFailures === 0)
    assert(s.lastRunSuccess === Some(true) && s.lastRunStartMicros === Some(500L))
  }

  test("fixed schedule snaps to the initial_start grid; drifting adds to finish") {
    val r = root()
    Jobs.registerProc("noop") { (_, _) => () }
    val fixed = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L,
      initialStartMicros = Some(15L * 60 * 1000000)) // grid at :15 each hour
    val drift = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L,
      fixedSchedule = false)
    // run at 1:40 — fixed job's next slot is 2:15, drifting job's is 2:40
    val at = HOUR + 40L * 60 * 1000000
    Jobs.run(spark, r, fixed, at)
    Jobs.run(spark, r, drift, at)
    val byId = Jobs.list(spark, r).map(x => x._1.id -> x._2).toMap
    assert(byId(fixed).nextStartMicros === Some(2L * HOUR + 15L * 60 * 1000000))
    assert(byId(drift).nextStartMicros === Some(at + HOUR))
  }

  test("a fixed daily schedule with a timezone keeps local wall time across DST") {
    // daily 09:00 New York: the UTC instant shifts 14:00Z (EST) → 13:00Z
    // (EDT) over the 2024-03-10 spring-forward (job_stat.c timezone grid)
    val day = 24L * HOUR
    def utc(s: String) = java.time.Instant.parse(s).toEpochMilli * 1000L
    val j = JobSpec(1, "noop", day,
      initialStartMicros = Some(utc("2024-03-08T14:00:00Z")),
      timezone = Some("America/New_York"))
    val afterRun = Jobs.nextStartOnSuccess(j, utc("2024-03-09T14:00:05Z"))
    assert(afterRun === utc("2024-03-10T13:00:00Z"))
    val noTz = Jobs.nextStartOnSuccess(j.copy(timezone = None),
      utc("2024-03-09T14:00:05Z"))
    assert(noTz === utc("2024-03-10T14:00:00Z"))
  }

  test("failures back off retry_period*fails capped at 5 intervals, then resume") {
    val r = root()
    Jobs.registerProc("spec_fail") { (_, _) => sys.error("boom") }
    val id = Jobs.add(spark, r, "spec_fail", HOUR, nowMicros = 0L,
      initialStartMicros = Some(0L))
    Jobs.alter(spark, r, id, retryPeriodMicros = Some(10L * 60 * 1000000),
      maxRetries = Some(2))
    assert(!Jobs.run(spark, r, id, nowMicros = HOUR))
    val s1 = Jobs.list(spark, r).head._2
    assert(s1.consecutiveFailures === 1 && s1.totalFailures === 1)
    assert(s1.nextStartMicros === Some(HOUR + 10L * 60 * 1000000)) // +retry_period
    assert(!Jobs.run(spark, r, id, nowMicros = 2 * HOUR))
    assert(Jobs.list(spark, r).head._2.nextStartMicros
      === Some(2 * HOUR + 20L * 60 * 1000000)) // +2×retry_period
    // third consecutive failure exceeds max_retries=2 → regular schedule
    assert(!Jobs.run(spark, r, id, nowMicros = 3 * HOUR))
    assert(Jobs.list(spark, r).head._2.nextStartMicros === Some(4 * HOUR))
    // cap check: with unlimited retries, backoff never exceeds 5 intervals
    assert(Jobs.nextStartOnFailure(
      JobSpec(1, "x", HOUR, retryPeriodMicros = 2 * HOUR), 0L, 20) === 5 * HOUR)
  }

  test("due() returns scheduled jobs whose next_start has arrived; alter pauses") {
    val r = root()
    val a = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L)
    val b = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L,
      initialStartMicros = Some(10 * HOUR))
    assert(Jobs.due(spark, r, 2 * HOUR).map(_.id) === Seq(a))
    assert(Jobs.due(spark, r, 11 * HOUR).map(_.id) === Seq(a, b))
    Jobs.alter(spark, r, a, scheduled = Some(false))
    assert(Jobs.due(spark, r, 2 * HOUR).isEmpty)
    // alter_job(next_start => ...) overrides the computed schedule
    Jobs.alter(spark, r, b, nextStartMicros = Some(HOUR))
    assert(Jobs.due(spark, r, 2 * HOUR).map(_.id) === Seq(b))
    // config vs config_merge are mutually exclusive; merge merges
    intercept[IllegalArgumentException](Jobs.alter(spark, r, b,
      config = Some(Map("a" -> "1")), configMerge = Some(Map("b" -> "2"))))
    Jobs.alter(spark, r, b, config = Some(Map("a" -> "1")))
    Jobs.alter(spark, r, b, configMerge = Some(Map("b" -> "2")))
    assert(Jobs.list(spark, r).find(_._1.id == b).get._1.config
      === Map("a" -> "1", "b" -> "2"))
  }

  test("built-in policy procs drive retention and columnstore via job config") {
    val r = root()
    val dir = Files.createTempDirectory("graft_jobsht").toString
    val ht = Hypertable.create(spark, s"$dir/ht", "ts", chunkWidth = "7 days")
    ht.write(Tables.table(spark, "/root/testdata/sf0.001", "events"))
    val all = ht.showChunks()
    assert(all.size === 5)
    val now = all.last.endMicros
    val keep2 = now - all(2).startMicros // drop chunks 0-1, compress the rest
    val ret = Jobs.add(spark, r, "policy_retention", HOUR, nowMicros = 0L,
      config = Map("hypertable" -> ht.path,
        "drop_after" -> keep2.toString, "now" -> now.toString))
    val cs = Jobs.add(spark, r, "policy_columnstore", HOUR, nowMicros = 0L,
      config = Map("hypertable" -> ht.path,
        "compress_after" -> (now - all(4).startMicros).toString,
        "now" -> now.toString))
    assert(Jobs.run(spark, r, ret, nowMicros = 0L))
    assert(ht.showChunks().map(_.startMicros) === all.drop(2).map(_.startMicros))
    assert(Jobs.run(spark, r, cs, nowMicros = 0L))
    assert(Columnstore.isCompressed(spark, all(2).path))
    assert(Columnstore.isCompressed(spark, all(3).path))
    assert(!Columnstore.isCompressed(spark, all(4).path))
  }

  test("a bare-array catalog from before the next_id counter still reads") {
    val r = root()
    val id = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L)
    // rewrite the catalog in the old format: the jobs array without the
    // wrapping {next_id, jobs} object
    val p = new org.apache.hadoop.fs.Path(r, "_graft_jobs.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = {
      val in = fs.open(p); val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, true)
      out.toString("UTF-8")
    }
    val arrayOnly = json.substring(json.indexOf("["), json.lastIndexOf("]") + 1)
    val o = fs.create(p, true); o.write(arrayOnly.getBytes("UTF-8")); o.close()
    assert(Jobs.list(spark, r).map(_._1.id) === Seq(id))
    // the migrated counter continues past the existing ids
    assert(Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L) === id + 1)
  }

  test("job ids are never recycled after delete_job (bgw_job sequence)") {
    val r = root()
    val a = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L)
    Jobs.delete(spark, r, a)
    // a stale external reference to id `a` must not resolve to the new job
    assert(Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L) === a + 1)
  }

  test("last_successful_finish survives later failures") {
    val r = root()
    @volatile var fail = false
    Jobs.registerProc("spec_flaky") { (_, _) => if (fail) sys.error("boom") }
    val id = Jobs.add(spark, r, "spec_flaky", HOUR, nowMicros = 0L)
    Jobs.run(spark, r, id, nowMicros = 100L)
    fail = true
    Jobs.run(spark, r, id, nowMicros = 200L)
    val s = Jobs.list(spark, r).head._2
    assert(s.lastRunSuccess === Some(false))
    assert(s.lastSuccessfulFinishMicros === Some(100L))
    assert(Info.jobStats(spark, r).collect().head
      .getAs[java.sql.Timestamp]("last_successful_finish").getTime === 0L) // 100us
  }

  test("alter validates intervals and anchors a drifting-to-fixed flip") {
    val r = root()
    Jobs.registerProc("noop") { (_, _) => () }
    val id = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L, fixedSchedule = false)
    intercept[IllegalArgumentException](
      Jobs.alter(spark, r, id, scheduleIntervalMicros = Some(0L)))
    intercept[IllegalArgumentException](
      Jobs.alter(spark, r, id, retryPeriodMicros = Some(-1L)))
    // drifting job has no initial_start; flipping to fixed anchors the grid
    // at its current next_start instead of the 1970 epoch
    val flipped = Jobs.alter(spark, r, id, fixedSchedule = Some(true)).get
    assert(flipped.initialStartMicros === Some(HOUR)) // next_start from add()
    Jobs.run(spark, r, id, nowMicros = HOUR + 1)
    assert(Jobs.list(spark, r).head._2.nextStartMicros === Some(2 * HOUR))
  }

  test("info views expose jobs and job_stats with reference column names") {
    val r = root()
    Jobs.registerProc("noop") { (_, _) => () }
    val id = Jobs.add(spark, r, "noop", HOUR, nowMicros = 0L,
      jobName = Some("my job"), config = Map("a" -> "1"))
    Jobs.run(spark, r, id, nowMicros = HOUR)
    val jobs = Info.jobs(spark, r)
    assert(jobs.columns.toSeq.take(4) ===
      Seq("job_id", "application_name", "proc_name", "schedule_interval_micros"))
    val jr = jobs.collect().head
    assert(jr.getInt(0) === id && jr.getString(1) === "my job")
    val stats = Info.jobStats(spark, r).collect().head
    assert(stats.getString(3) === "Success" && stats.getString(4) === "Scheduled")
    assert(stats.getLong(6) === 1L)
    // unregistered proc errors clearly
    val bad = Jobs.add(spark, r, "not_registered", HOUR, nowMicros = 0L)
    intercept[IllegalStateException](Jobs.run(spark, r, bad, nowMicros = 0L))
  }
}
