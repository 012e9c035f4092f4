package graft.plans

import org.apache.spark.sql.internal.SQLConf

/** Session-level optimization toggles — the Spark-conf analogue of the
  * reference's GUC surface (`src/guc.c`): every custom graft OPTIMIZATION
  * rewrite can be switched off per session (or per statement via `SET`)
  * for A/B diagnosis, exactly how a reference user flips
  * `timescaledb.enable_*`. Defaults all ON;
  * `spark.graft.enable_optimizations` is the master switch (`guc.c:677`,
  * `ts_guc_enable_optimizations`). GapfillRewrite is deliberately NOT
  * gated: it implements `time_bucket_gapfill`'s semantics (the query is
  * wrong without it), it is not a plan improvement — same reason the
  * reference has no GUC for its gapfill node.
  */
object Toggles {

  /** GUC-style boolean: accepts true/false/on/off/1/0/yes/no (PostgreSQL's
    * `SET` vocabulary); anything else names the offending key instead of
    * surfacing a bare NumberFormatException from inside the optimizer.
    */
  private def on(key: String, default: Boolean = true): Boolean =
    SQLConf.get.getConfString(key, default.toString).trim.toLowerCase match {
      case "true" | "on" | "1" | "yes"  => true
      case "false" | "off" | "0" | "no" => false
      case other => throw new IllegalArgumentException(
        s"$key must be a boolean (true/false/on/off/1/0), got '$other'")
    }

  /** Master switch — `timescaledb.enable_optimizations` (`src/guc.c:677`). */
  def optimizations: Boolean = on("spark.graft.enable_optimizations")

  /** Plan-time chunk exclusion — `timescaledb.enable_constraint_exclusion`
    * (`src/guc.c:757`).
    */
  def constraintExclusion: Boolean =
    optimizations && on("spark.graft.enable_constraint_exclusion")

  /** Monotone sort rewrite — under the reference's master switch
    * (`src/sort_transform.c` runs inside the `enable_optimizations` path);
    * individually addressable here for symmetric A/B testing.
    */
  def sortTransform: Boolean =
    optimizations && on("spark.graft.enable_sort_transform")

  /** Transparent cagg rewrite of raw aggregations —
    * `timescaledb.enable_cagg_rewrites` (`src/guc.c:974`). Unlike the
    * reference (whose flag is young and ships default-off), graft's rewrite
    * is oracle-gated and defaults ON; set false for reference-default
    * behavior.
    */
  def caggRewrites: Boolean =
    optimizations && on("spark.graft.enable_cagg_rewrites")

  /** Skip cagg invalidation logging during DML —
    * `timescaledb.skip_cagg_invalidation` (`tsl/test/sql/
    * cagg_skip_invalidation.sql`): a bulk-backfill escape hatch for loads
    * whose range the operator will refresh explicitly afterwards. Default
    * OFF (mutations log), deliberately NOT under the `optimizations`
    * master switch — it changes refresh-visible STATE, not plan shape.
    */
  def skipCaggInvalidation: Boolean =
    on("spark.graft.skip_cagg_invalidation", default = false)

  /** Allow window functions in cagg defining queries —
    * `timescaledb.enable_cagg_window_functions` (`src/guc.c:1031`, default
    * OFF both there and here). A FEATURE gate, not an optimization: like
    * [[skipCaggInvalidation]] it sits outside the `optimizations` master
    * switch. The reference flags the support experimental because window
    * values are recomputed per refresh region — deterministic only for
    * windows partitioned by the bucket (see [[graft.streaming.CaggDef]]).
    */
  def caggWindowFunctions: Boolean =
    on("spark.graft.enable_cagg_window_functions", default = false)

  /** Allow cagg window expressions whose partition spec LACKS the bucket
    * column. Such windows mix rows across buckets, so their values depend
    * on which refresh window recomputed them — the hazard behind the
    * reference's "may result in unexpected results" WARNING
    * (`tsl/src/continuous_aggs/common.c:692`). Graft detects the shape
    * statically at CREATE and rejects it unless this is set (default OFF;
    * the reference's own tests only exercise bucket-partitioned windows).
    */
  def caggWindowAllowUnpartitioned: Boolean =
    on("spark.graft.cagg_window_allow_unpartitioned", default = false)
}
