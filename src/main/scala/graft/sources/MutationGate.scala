package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-process append/rewrite coordination — the lease split that lets a
  * standing ingest process and a maintenance/policy process mutate one
  * hypertable concurrently, the way the reference runs concurrent INSERTs
  * alongside compression/retention jobs (per-chunk locks,
  * `tsl/src/compression/api.c`; isolation coverage
  * `tsl/test/isolation/specs/compression_ddl_iso.spec`).
  *
  * Three cooperating primitives, all small marker files at the table's
  * PRIMARY root, all heartbeated by the lease daemon while held:
  *
  *  - APPEND LEASE (`_graft_append_leases/a_<owner>`): advertises a live
  *    appender process. Shared — any number may coexist, and they coexist
  *    with the exclusive maintenance lease (`_graft_mutator_lease`, which
  *    after the split serializes REWRITE-class processes only).
  *  - APPEND INTENT (`_graft_intents/i_<owner>_<n>`): one per in-flight
  *    append batch. A rewriter drains intents created at-or-before its
  *    seal before reading its input, so no append started before the seal
  *    can land rows in a generation the rewrite is about to supersede.
  *  - SEAL (`_graft_seals/s<start>` / `s_ALL`): a rewriter's per-chunk
  *    (or, for DDL, table-wide) exclusion marker. An appender checks seals
  *    AFTER writing its intent; on overlap with its routed chunk set it
  *    YIELDS — removes its intent, waits for the seal to clear, re-creates
  *    the intent and re-checks. The write-intent-then-read-seal /
  *    write-seal-then-read-intent ordering means at least one side always
  *    sees the other (bounded clock skew assumed for the created-ts
  *    comparison, `spark.graft.gate.skewMs`).
  *
  * Deadlock-freedom: rewriters never yield and wait only on intents
  * CREATED at-or-before their seal; appenders always yield to any live
  * overlapping seal (dropping their intent while they wait). A yielded
  * appender's re-created intent is younger than the seal, so the rewriter
  * does not wait for it. Crash tolerance: every marker embeds a creation
  * ts and a heartbeat ts; a marker whose heartbeat (and mtime) is older
  * than `spark.graft.gate.staleMs` reads as a crashed holder and is
  * ignored (and reaped best-effort).
  *
  * File body layout: `owner \n createdTs \n heartbeatTs`. Heartbeats
  * rewrite only the third line (truncate-overwrite; readers treat an
  * unparsable/empty body as live-conservative within the mtime bound).
  */
private[graft] object MutationGate {
  import Hypertable.{readSmallFile, processId}

  private[sources] val APPEND_DIR = "_graft_append_leases"
  private[sources] val INTENT_DIR = "_graft_intents"
  private[sources] val SEAL_DIR = "_graft_seals"
  private[sources] val REBIRTH_LOCK = "_graft_rebirth_lock"
  private[sources] val CATALOG_FLOCK = "_graft_catalog_flock"

  /** Liveness horizon for gate markers. Shorter than the mutator lease's
    * staleness: gate markers are per-batch/per-op, and a rewriter's drain
    * (or an appender's yield) stalls for this long after an appender (or
    * rewriter) crash. Must comfortably exceed the 30 s heartbeat period.
    */
  private[graft] def staleMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.gate.staleMs", "120000").toLong

  /** Cross-host wall-clock skew allowance for the created-ts ordering. */
  private[graft] def skewMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.gate.skewMs", "5000").toLong

  /** How long a gate wait (drain / yield) may block before erroring. */
  private[graft] def timeoutMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.gate.timeoutMs", "600000").toLong

  private def pollMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.gate.pollMs", "50").toLong

  // ------------------------------------------------------- marker plumbing

  /** Markers this process holds, refreshed by [[heartbeatNow]] (wired into
    * the lease daemon's 30 s pass): qualified path -> (fs, path, owner,
    * createdTs).
    */
  private val held = new java.util.concurrent.ConcurrentHashMap[
    String, (FileSystem, Path, String, Long)]()

  private def body(owner: String, created: Long, hb: Long): String =
    s"$owner\n$created\n$hb"

  private[graft] case class Marker(path: Path, owner: String, created: Long,
      hb: Long, mtime: Long) {
    def live(now: Long, stale: Long): Boolean =
      math.max(hb, mtime) > now - stale
  }

  private def parse(fs: FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Option[Marker] =
    try {
      val lines = readSmallFile(fs, st.getPath).linesIterator.toSeq
      val owner = lines.headOption.getOrElse("")
      val created = lines.lift(1).flatMap(l =>
        scala.util.Try(l.trim.toLong).toOption).getOrElse(0L)
      val hb = lines.lift(2).flatMap(l =>
        scala.util.Try(l.trim.toLong).toOption).getOrElse(created)
      // an empty/torn body (heartbeat's truncate-overwrite window) reads
      // as a LIVE marker with created=0 — the conservative direction for
      // both drains (wait) and yields (wait), bounded by the file's mtime
      Some(Marker(st.getPath, owner, created, hb, st.getModificationTime))
    } catch { case _: java.io.IOException => None } // vanished mid-list

  private def writeMarker(fs: FileSystem, p: Path, created: Long): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write(body(processId, created, System.currentTimeMillis())
      .getBytes("UTF-8"))
    out.close()
  }

  private[graft] def createMarker(fs: FileSystem, p: Path): Path = {
    val created = System.currentTimeMillis()
    writeMarker(fs, p, created)
    held.put(fs.makeQualified(p).toString, (fs, p, processId, created))
    p
  }

  private[graft] def removeMarker(fs: FileSystem, p: Path): Unit = {
    held.remove(fs.makeQualified(p).toString)
    try fs.delete(p, false)
    catch { case _: java.io.IOException => () }
  }

  /** One heartbeat pass over every held marker (called by Hypertable's
    * lease daemon every 30 s, and registered for shutdown cleanup there).
    */
  private[graft] def heartbeatNow(): Unit =
    held.forEach { (k, v) =>
      val (fs, p, _, created) = v
      // a vanished marker means the table was dropped (or an operator
      // cleaned up) — drop it from the held set rather than resurrecting
      // the marker dir under a deleted root
      try {
        if (fs.exists(p)) writeMarker(fs, p, created) else held.remove(k)
      } catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Delete every marker this process still holds (shutdown hook belt —
    * the per-op finally blocks are the braces).
    */
  private[graft] def releaseAll(): Unit =
    held.forEach { (_, v) =>
      try v._1.delete(v._2, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Live markers under `dir` (missing dir = none). Stale markers are
    * reaped best-effort so crashed holders don't accumulate.
    */
  private[graft] def listLive(spark: SparkSession, fs: FileSystem,
      dir: Path): Seq[Marker] = {
    val stale = staleMs(spark)
    val now = System.currentTimeMillis()
    val all =
      try fs.listStatus(dir).toSeq.filter(_.isFile)
      catch { case _: java.io.FileNotFoundException => return Nil }
    all.flatMap(parse(fs, _)).flatMap { m =>
      if (m.live(now, stale)) Some(m)
      else { try fs.delete(m.path, false)
             catch { case _: java.io.IOException => () }; None }
    }
  }

  // ---------------------------------------------------------- append lease

  private val heldAppendLeases = new java.util.concurrent.ConcurrentHashMap[
    String, Path]()

  /** Whether THIS process holds an append lease on the table — the
    * "mutating process" test for paths appenders are allowed to run (e.g.
    * the catalog staleness write-heal).
    */
  private[sources] def holdsAppendLease(qualifiedRoot: String): Boolean =
    heldAppendLeases.containsKey(qualifiedRoot)

  /** Register this process as an appender of the table (idempotent; held
    * for the process lifetime like the exclusive lease). Never refuses:
    * appenders coexist with each other and with one maintenance process —
    * conflicts are fenced per-batch by the intent/seal gate instead.
    */
  private[graft] def acquireAppendLease(spark: SparkSession, fs: FileSystem,
      qualifiedRoot: String): Unit = {
    if (heldAppendLeases.containsKey(qualifiedRoot)) return
    val p = new Path(new Path(qualifiedRoot), s"$APPEND_DIR/a_$processId")
    createMarker(fs, p)
    heldAppendLeases.put(qualifiedRoot, p)
    Hypertable.ensureGateDaemon()
  }

  private[graft] def releaseAppendLease(fs: FileSystem,
      qualifiedRoot: String): Unit =
    Option(heldAppendLeases.remove(qualifiedRoot))
      .foreach(removeMarker(fs, _))

  // ------------------------------------------------------- seals (rewrite)

  private def sealScopeOf(name: String): Option[Long] =
    if (name == "s_ALL") None
    else scala.util.Try(name.stripPrefix("s").toLong).toOption

  private def sealPath(root: Path, scope: Option[Long]): Path =
    new Path(root, s"$SEAL_DIR/${scope.map(s => s"s$s").getOrElse("s_ALL")}")

  /** Run `body` with seals claimed on the given scopes (Some(start) =
    * one chunk; None = the whole table, DDL class), after draining every
    * live foreign append intent created at-or-before the seal. The
    * claimed seals exclude appends on the sealed chunks for the duration
    * — the cross-process analogue of the reference's per-chunk locks.
    *
    * Only rewrite-class ops call this, and they already hold the table's
    * EXCLUSIVE mutator lease plus the JVM lock hierarchy, so seals never
    * contend with other seals; the readback is a belt against clock-skew
    * takeover of a stale-looking live holder.
    */
  private[sources] def withSeals[T](spark: SparkSession, fs: FileSystem,
      qualifiedRoot: String, scopes: Seq[Option[Long]])(body: => T): T = {
    if (scopes.isEmpty) return body
    val root = new Path(qualifiedRoot)
    val claimed = scopes.distinct.sortBy(_.getOrElse(Long.MinValue))
      .map(s => createMarker(fs, sealPath(root, s)))
    Hypertable.ensureGateDaemon()
    try {
      drainIntents(spark, fs, root,
        claimed.map(p => held.get(fs.makeQualified(p).toString))
          .flatMap(Option(_)).map(_._4).maxOption
          .getOrElse(System.currentTimeMillis()))
      body
    } finally claimed.foreach(removeMarker(fs, _))
  }

  /** Wait until no live FOREIGN intent created at-or-before `sealTs` (plus
    * skew) remains — called by a rewriter AFTER its seal is visible, so
    * appends that started before the seal finish before the rewrite reads
    * its input, and appends that start after it yield to the seal.
    */
  private def drainIntents(spark: SparkSession, fs: FileSystem, root: Path,
      sealTs: Long): Unit = {
    val dir = new Path(root, INTENT_DIR)
    val horizon = sealTs + skewMs(spark)
    val deadline = System.currentTimeMillis() + timeoutMs(spark)
    while (listLive(spark, fs, dir)
        .exists(m => m.owner != processId && m.created <= horizon)) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"timed out draining append intents under $dir — an appender " +
            "batch has been in flight longer than " +
            s"spark.graft.gate.timeoutMs (${timeoutMs(spark)} ms)")
      Thread.sleep(pollMs(spark))
    }
  }

  // ------------------------------------------------------ appender's gate

  /** Per-batch append gate. Creates this batch's intent, then checks live
    * seals: none, or none overlapping the batch's routed chunk starts →
    * proceed; otherwise YIELD (drop the intent, wait for the overlapping
    * seals to clear, re-create the intent) and re-check. Returns the
    * intent path — the caller MUST remove it (removeMarker) after the
    * batch's data AND catalog sync are fully committed.
    *
    * `routedStarts` is invoked at most once, and only when a live seal
    * exists (it costs one distinct-aggregation action over the batch).
    */
  private[sources] def appendGate(spark: SparkSession, fs: FileSystem,
      qualifiedRoot: String, routedStarts: () => Set[Long]): Path = {
    val root = new Path(qualifiedRoot)
    val intentP = new Path(root,
      s"$INTENT_DIR/i_${processId}_${java.util.UUID.randomUUID().toString.take(8)}")
    var intent = createMarker(fs, intentP)
    Hypertable.ensureGateDaemon()
    val sealDir = new Path(root, SEAL_DIR)
    val deadline = System.currentTimeMillis() + timeoutMs(spark)
    var starts: Set[Long] = null
    var done = false
    while (!done) {
      val seals = listLive(spark, fs, sealDir).filter(_.owner != processId)
      if (seals.isEmpty) done = true
      else {
        if (starts == null) starts = routedStarts()
        val conflicts = seals.filter(m => sealScopeOf(m.path.getName)
          .forall(starts.contains)) // None (ALL) conflicts with everything
        if (conflicts.isEmpty) done = true
        else {
          // yield: our intent must not hold up the rewriter we are about
          // to wait for
          removeMarker(fs, intent)
          val names = conflicts.map(_.path.getName).toSet
          while (listLive(spark, fs, sealDir)
              .exists(m => m.owner != processId &&
                names.contains(m.path.getName))) {
            if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"timed out waiting for chunk seal(s) ${names.mkString(",")} " +
                  s"under $sealDir — a rewrite has held its seal longer " +
                  s"than spark.graft.gate.timeoutMs (${timeoutMs(spark)} ms)")
            Thread.sleep(pollMs(spark))
          }
          intent = createMarker(fs, intentP)
        }
      }
    }
    intent
  }

  // -------------------------------------------- rebirth lock (append path)

  /** Per-chunk mutual exclusion between APPENDERS re-ingesting into the
    * same tombstoned (dropped, grace-retained) chunk dir: two concurrent
    * rebirths would race the tombstone's drop-max normalization and could
    * stamp each other's just-committed generation dead. Claim-readback on
    * a heartbeated marker INSIDE the chunk dir; the GC also refuses to
    * reap a dir whose rebirth lock is live ([[Hypertable.gcChunkDir]]).
    * Returns the claimed paths; release via [[removeMarker]].
    */
  private[sources] def claimRebirthLocks(spark: SparkSession,
      chunkDirs: Seq[Path]): Seq[(FileSystem, Path)] =
    chunkDirs.sortBy(_.toString).map { d =>
      // each dir's OWN filesystem: a tombstoned chunk resident on a
      // cross-FS tablespace is locked where it lives
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new Path(d, REBIRTH_LOCK)
      val deadline = System.currentTimeMillis() + timeoutMs(spark)
      var claimed = false
      while (!claimed) {
        val cur =
          try parse(fs, fs.getFileStatus(p))
          catch { case _: java.io.IOException => None }
        val now = System.currentTimeMillis()
        cur match {
          case Some(m) if m.owner != processId &&
              m.live(now, staleMs(spark)) =>
            if (now > deadline)
              throw new IllegalStateException(
                s"timed out waiting for rebirth lock $p held by ${m.owner}")
            Thread.sleep(pollMs(spark))
          case _ =>
            createMarker(fs, p)
            val back =
              try parse(fs, fs.getFileStatus(p)).map(_.owner).getOrElse("")
              catch { case _: java.io.IOException => "" }
            if (back == processId) claimed = true
            else held.remove(fs.makeQualified(p).toString)
        }
      }
      (fs, p)
    }

  private[sources] def rebirthLockLive(fs: FileSystem,
      chunkDir: Path): Boolean = {
    val p = new Path(chunkDir, REBIRTH_LOCK)
    val stale = SparkSession.getActiveSession.map(staleMs)
      .getOrElse(120000L)
    try parse(fs, fs.getFileStatus(p))
      .exists(_.live(System.currentTimeMillis(), stale))
    catch { case _: java.io.IOException => false }
  }

  // --------------------------------------------- catalog commit lock (FS)

  // roots whose catalog FS lock this JVM holds, with depth (reentrancy:
  // syncCatalogForChunk's full-refresh fallback re-enters; in-process
  // serialization is the JVM catalogLock every caller already holds)
  private val flockDepth = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.Integer]()

  /** Serialize MANIFEST commits (full refresh, per-chunk patch, and the
    * gen-publish rename+stamp they index) across processes: without it a
    * standing appender's full refresh and the maintenance process's
    * publish/patch could interleave — a torn listing (new generation
    * renamed in, superseded stamp not yet visible) or a version-number
    * collision whose last writer persists the older view. Claim-readback
    * on a heartbeated marker at the primary root; held only for the
    * metadata commit (listing + one small-file write), never across a
    * data job.
    */
  private[sources] def withCatalogFsLock[T](spark: SparkSession,
      fs: FileSystem, qualifiedRoot: String)(body: => T): T = {
    if (flockDepth.containsKey(qualifiedRoot)) {
      flockDepth.put(qualifiedRoot, flockDepth.get(qualifiedRoot) + 1)
      try return body
      finally flockDepth.put(qualifiedRoot, flockDepth.get(qualifiedRoot) - 1)
    }
    val p = new Path(new Path(qualifiedRoot), CATALOG_FLOCK)
    val deadline = System.currentTimeMillis() + timeoutMs(spark)
    var claimed = false
    while (!claimed) {
      val cur =
        try parse(fs, fs.getFileStatus(p))
        catch { case _: java.io.IOException => None }
      val now = System.currentTimeMillis()
      cur match {
        case Some(m) if m.owner != processId && m.live(now, staleMs(spark)) =>
          if (now > deadline)
            throw new IllegalStateException(
              s"timed out waiting for catalog commit lock $p held by ${m.owner}")
          Thread.sleep(pollMs(spark))
        case _ =>
          createMarker(fs, p)
          val back =
            try parse(fs, fs.getFileStatus(p)).map(_.owner).getOrElse("")
            catch { case _: java.io.IOException => "" }
          if (back == processId) claimed = true
          else held.remove(fs.makeQualified(p).toString)
      }
    }
    flockDepth.put(qualifiedRoot, 1)
    try body
    finally {
      flockDepth.remove(qualifiedRoot)
      removeMarker(fs, p)
    }
  }
}
