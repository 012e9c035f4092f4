package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.sources.Hypertable

/** Reader-epoch registration for the cagg materialization's generation GC
  * (SCALE.md §15/§18): makes the "reader survives a concurrent refresh"
  * contract EXACT for registered readers instead of purely wall-clock.
  *
  * The round-12/13 grace rule alone is time-based: a retired generation
  * dir is deleted `matGraceMs` after the catalog write that dereferenced
  * it, so a cross-process reader whose plan-to-finish span exceeds the
  * grace could still lose planned files (the Delta-vacuum contract
  * class). With epochs, a reader that may still be executing BLOCKS the
  * deletion of every dir retired after it planned:
  *
  *  - before reading the mat catalog, [[begin]] registers an epoch
  *    (ts = now) and — when this process had no standing epoch for the
  *    cagg — synchronously writes `<cagg>/_mat_readers/r_<processId>`
  *    whose body is the oldest active epoch ts of this process. Order
  *    matters: the file is on disk BEFORE the catalog read, so any dir
  *    the reader can plan (live in the catalog it then reads) is only
  *    retired by a LATER catalog write, whose retire-ts is ≥ the
  *    epoch ts and therefore blocked.
  *  - the epoch's lifetime is tied to the planned DataFrame's
  *    REACHABILITY ([[Epoch.attach]] keeps a weak reference): as long as
  *    the plan could be (re-)executed the epoch stands; once collected,
  *    the next sweep drops it. No explicit "read finished" signal exists
  *    for a DataFrame, and reachability is the conservative superset.
  *  - a per-JVM daemon heartbeats each registered file every
  *    [[heartbeatMs]] (rewriting it — fresh mtime, body = min active
  *    ts) and deletes it when the last epoch of a cagg is gone; a JVM
  *    shutdown hook best-effort deletes all files.
  *  - GC side ([[ContinuousAggregate.syncMatCatalog]]): a retired dir is
  *    deletable only when its grace expired AND no LIVE epoch file
  *    (mtime within `matEpochStaleMs`) carries a ts ≤ retire-ts +
  *    `matEpochSkewMs`. A crashed reader's file stops heartbeating and
  *    goes stale, restoring the plain grace contract; the skew pad makes
  *    cross-process clock skew degrade toward over-retention, never
  *    under.
  *
  * Bounds: one epoch entry per DISTINCT planned DataFrame (weak-keyed,
  * earliest ts wins), one file per (process, cagg). A standing process
  * that holds a mat scan forever (e.g. the version-memoized
  * [[ContinuousAggregate.readMatLive]] scan of an idle handle) would
  * otherwise block GC indefinitely, so an epoch stops protecting after
  * `matEpochMaxMs` (default 1 h) — past that, the documented contract
  * reverts to "raise matGraceMs above the longest read".
  */
private[graft] object MatReaderEpochs {

  private[graft] val DIR = "_mat_readers"

  private[streaming] def heartbeatMs: Long = 10000L

  private[graft] def staleMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.cagg.matEpochStaleMs", "60000").toLong

  private[graft] def skewMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.cagg.matEpochSkewMs", "60000").toLong

  private[graft] def maxMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.cagg.matEpochMaxMs", "3600000").toLong

  /** One cagg's registered epochs in this process: planned-DataFrame
    * holder -> registration ts, weak-keyed so a collected plan drops out.
    */
  private final class EpochSet(val fs: FileSystem, val dir: Path,
      val spark: SparkSession) {
    val entries = new java.util.WeakHashMap[AnyRef, java.lang.Long]()
  }

  // qualified epoch-dir path -> set; the daemon sweeps this map
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, EpochSet]()

  private def fileOf(set: EpochSet): Path =
    new Path(set.dir, s"r_${Hypertable.processId}")

  /** Oldest still-protecting ts of the set, dropping capped entries.
    * None when no live entry remains (caller deletes the file).
    */
  private def minTs(set: EpochSet): Option[Long] = {
    val cap = System.currentTimeMillis() - maxMs(set.spark)
    set.entries.synchronized {
      import scala.jdk.CollectionConverters._
      val ts = set.entries.values.asScala.map(_.longValue).filter(_ >= cap)
      if (ts.isEmpty) None else Some(ts.min)
    }
  }

  private def writeFile(set: EpochSet, ts: Long): Unit =
    try Hypertable.writeSmallFile(set.fs, fileOf(set), ts.toString)
    catch { case _: java.io.IOException => () } // advisory: grace floor stands

  private def dropFile(set: EpochSet): Unit =
    try { set.fs.delete(fileOf(set), false); () }
    catch { case _: java.io.IOException => () }

  /** An in-flight registration. From [[begin]] it sits in the set keyed
    * by ITSELF (weak — an abandoned Epoch, e.g. the catalog read threw,
    * auto-drops once unreachable), so a sweep between begin and attach
    * cannot see an empty set and delete the epoch file mid-plan;
    * [[attach]] re-keys it to the planned frame, [[cancel]] discards it
    * (nothing was planned).
    */
  private[streaming] final class Epoch(set: EpochSet, ts: Long) {
    def attach(holder: AnyRef): Unit = set.entries.synchronized {
      set.entries.remove(this)
      val prev = set.entries.get(holder)
      if (prev == null || prev.longValue > ts)
        set.entries.put(holder, java.lang.Long.valueOf(ts))
      ()
    }
    def cancel(): Unit = set.entries.synchronized {
      set.entries.remove(this); ()
    }
  }

  /** Register an epoch for a mat read of the cagg rooted at `caggPath` —
    * call BEFORE reading the mat catalog. Synchronously writes the epoch
    * file only when this process has no standing (earlier) epoch for the
    * cagg; otherwise the standing heartbeat already covers this ts.
    */
  private[streaming] def begin(spark: SparkSession, fs: FileSystem,
      caggPath: Path): Epoch = {
    val dir = new Path(caggPath, DIR)
    val key = fs.makeQualified(dir).toString
    val set = registry.computeIfAbsent(key, _ => new EpochSet(fs, dir, spark))
    startSweeper()
    val ts = System.currentTimeMillis()
    val standing = minTs(set)
    val epoch = new Epoch(set, ts)
    set.entries.synchronized {
      set.entries.put(epoch, java.lang.Long.valueOf(ts)); ()
    }
    if (standing.isEmpty) writeFile(set, ts)
    epoch
  }

  /** One sweep: heartbeat every set with live entries (fresh mtime, body
    * = min active ts), delete the file and registry entry of emptied
    * sets. Exposed for tests.
    */
  private[graft] def sweepNow(): Unit = {
    val it = registry.entrySet().iterator()
    while (it.hasNext) {
      val set = it.next().getValue
      minTs(set) match {
        case Some(ts) => writeFile(set, ts)
        case None => dropFile(set); it.remove()
      }
    }
  }

  /** Tests: drop every registered epoch (as if all plans were collected)
    * and sweep — epoch files disappear, GC returns to the grace floor.
    */
  private[graft] def expireAll(): Unit = {
    val it = registry.values().iterator()
    while (it.hasNext) {
      val set = it.next()
      set.entries.synchronized { set.entries.clear() }
    }
    sweepNow()
  }

  /** Tests: forget an attached holder without waiting for the collector. */
  private[graft] def dropHolder(holder: AnyRef): Unit = {
    val it = registry.values().iterator()
    while (it.hasNext) {
      val set = it.next()
      set.entries.synchronized { set.entries.remove(holder); () }
    }
  }

  @volatile private var sweeperStarted = false
  private def startSweeper(): Unit =
    if (!sweeperStarted) synchronized {
      if (!sweeperStarted) {
        val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor {
          r =>
            val t = new Thread(r, "graft-mat-reader-epochs")
            t.setDaemon(true); t
        }
        ex.scheduleWithFixedDelay(() => sweepNow(),
          heartbeatMs, heartbeatMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          val it = registry.values().iterator()
          while (it.hasNext) dropFile(it.next())
        }, "graft-mat-reader-epochs-shutdown"))
        sweeperStarted = true
      }
    }

  /** GC side: the oldest ts any LIVE foreign-or-local epoch file under
    * `caggPath` protects — a retired dir with retire-ts ≥ (this − skew)
    * must be kept. `Long.MaxValue` when no live epoch exists. Also reaps
    * long-dead epoch files (mtime older than `matEpochMaxMs` — a live
    * reader's file is heartbeated every [[heartbeatMs]], so nothing that
    * old can belong to one; reaping at the much-larger cap instead of
    * `matEpochStaleMs` keeps a delete from racing a fresh heartbeat
    * rewrite).
    */
  private[streaming] def liveFloor(spark: SparkSession, fs: FileSystem,
      caggPath: Path): Long = {
    val dir = new Path(caggPath, DIR)
    val now = System.currentTimeMillis()
    val stale = staleMs(spark)
    val reapAge = maxMs(spark)
    val sts =
      try fs.listStatus(dir).toSeq.filter(st =>
        st.isFile && st.getPath.getName.startsWith("r_"))
      catch { case _: java.io.IOException => return Long.MaxValue }
    sts.foldLeft(Long.MaxValue) { (acc, st) =>
      val age = now - st.getModificationTime
      if (age > reapAge) {
        try fs.delete(st.getPath, false)
        catch { case _: java.io.IOException => () }
        acc
      } else if (age > stale) acc
      else {
        // unreadable/garbled body: treat as protecting everything — the
        // stale window bounds how long, and over-retention is the safe
        // direction
        val ts =
          try Hypertable.readSmallFile(fs, st.getPath).trim.toLong
          catch {
            case _: java.io.IOException | _: NumberFormatException => 0L
          }
        math.min(acc, ts)
      }
    }
  }
}
