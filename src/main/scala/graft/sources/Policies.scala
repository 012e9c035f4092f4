package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.streaming.{CaggRefreshPolicy, ContinuousAggregate}

/** Declarative per-table policy bundle —
  * `timescaledb_experimental.add_policies / show_policies /
  * alter_policies / remove_policies` (`sql/policy_api.sql` experimental
  * block): one record holding the refresh window, columnstore lag, and
  * retention lag for a cagg (or bare hypertable), persisted next to the
  * table so an external scheduler needs only `Policies.runAll(path, now)`.
  *
  * Scheduling itself stays external (cron/Airflow — SURVEY §2.11); the
  * bundle keeps the SEMANTICS (offsets, ordering) in-library:
  * refresh runs BEFORE retention/compression so raw rows are materialized
  * before their chunks are dropped or rewritten (the reference warns about
  * exactly this ordering between refresh and retention policies).
  */
case class PolicySet(
    /** cagg refresh window offsets back from `now` (start > end). */
    refreshStartOffsetMicros: Option[Long] = None,
    refreshEndOffsetMicros: Option[Long] = None,
    /** convert chunks fully older than now − lag to columnstore. */
    columnstoreAfterMicros: Option[Long] = None,
    /** drop chunks fully older than now − lag. */
    dropAfterMicros: Option[Long] = None) {
  private[sources] def toJson: String = {
    def f(k: String, v: Option[Long]) = v.map(x => s""""$k":$x""")
    Seq(f("refreshStart", refreshStartOffsetMicros),
      f("refreshEnd", refreshEndOffsetMicros),
      f("columnstoreAfter", columnstoreAfterMicros),
      f("dropAfter", dropAfterMicros)).flatten.mkString("{", ",", "}")
  }
}

object Policies {
  private val FILE = "_graft_policies.json"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** add_policies: persist the bundle at the table/cagg root. */
  def add(spark: SparkSession, path: String, set: PolicySet): Unit =
    Hypertable.writeSmallFileDirect(fs(spark, path),
      new Path(path, FILE), set.toJson)

  /** alter_policies: same write (full replacement, like the reference). */
  def alter(spark: SparkSession, path: String, set: PolicySet): Unit =
    add(spark, path, set)

  /** show_policies: the configured bundle, or None. */
  def show(spark: SparkSession, path: String): Option[PolicySet] = {
    val f = new Path(path, FILE)
    val filesys = fs(spark, path)
    if (!filesys.exists(f)) return None
    val json = Hypertable.readSmallFile(filesys, f)
    def num(k: String): Option[Long] =
      ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(json).map(_.group(1).toLong)
    Some(PolicySet(num("refreshStart"), num("refreshEnd"),
      num("columnstoreAfter"), num("dropAfter")))
  }

  /** remove_policies. Returns whether a bundle existed. */
  def remove(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path, FILE), false)

  /** remove_all_policies (`sql/policy_api.sql:147-152`,
    * `ts_policies_remove_all`): drop the experimental bundle AND every
    * registered per-policy job (`policy_*` procs in the job catalog) for
    * the relation in one call. Returns whether anything was removed.
    */
  def removeAll(spark: SparkSession, path: String): Boolean = {
    val policyJobs = Jobs.list(spark, path)
      .collect { case (spec, _) if spec.proc.startsWith("policy_") => spec.id }
    policyJobs.foreach(id => Jobs.delete(spark, path, id))
    val hadBundle = remove(spark, path)
    hadBundle || policyJobs.nonEmpty
  }

  /** Execute a stored bundle against the hypertable (and its cagg, when
    * the refresh offsets are set): refresh → columnstore → retention, in
    * that order. Returns a short human-readable action report.
    *
    * A bundle stored at the CAGG's own path targets the cagg, like the
    * reference's `add_policies(cagg)`: columnstore/retention then rewrite
    * and drop MATERIALIZATION chunks (the cagg's defaults pick the
    * segmentby/orderby; `columnstoreOpts` applies to hypertable chunks
    * only), leaving the raw hypertable untouched — the "downsample then
    * expire detail" pattern.
    */
  def runAll(ht: Hypertable, cagg: Option[ContinuousAggregate],
      policyPath: String, nowMicros: Long,
      columnstoreOpts: Columnstore.Options = Columnstore.Options()): Seq[String] = {
    val set = show(ht.spark, policyPath).getOrElse(return Seq.empty)
    val onCagg = cagg.exists(_.path == policyPath)
    val refreshed = (cagg, set.refreshStartOffsetMicros, set.refreshEndOffsetMicros) match {
      case (Some(c), Some(s), Some(e)) =>
        CaggRefreshPolicy.run(c, nowMicros, s, e)
          .map { case (lo, hi) => s"refreshed [$lo,$hi)" }
      case _ => Seq.empty
    }
    val compressed = set.columnstoreAfterMicros.toSeq.flatMap { lag =>
      if (onCagg)
        cagg.get.compressMaterialization(Some(nowMicros - lag))
          .map(k => s"columnstore mat $k")
      else
        Columnstore.compress(ht, columnstoreOpts, Some(nowMicros - lag))
          .map(c => s"columnstore ${c.startMicros}")
    }
    val dropped = set.dropAfterMicros.toSeq.flatMap { lag =>
      if (onCagg)
        cagg.get.dropMatChunks(nowMicros - lag).map(k => s"dropped mat $k")
      else
        ht.dropChunks(nowMicros - lag).map(c => s"dropped ${c.startMicros}")
    }
    refreshed ++ compressed ++ dropped
  }
}
