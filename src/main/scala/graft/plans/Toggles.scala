package graft.plans

import org.apache.spark.sql.internal.SQLConf

/** Session-level optimization toggles — the Spark-conf analogue of the
  * reference's GUC surface (`src/guc.c`): every custom graft rewrite can be
  * switched off per session (or per statement via `SET`) for A/B diagnosis,
  * exactly how a reference user flips `timescaledb.enable_*`. Defaults all
  * ON; `spark.graft.enable_optimizations` is the master switch gating every
  * rule (`guc.c:677`, `ts_guc_enable_optimizations`).
  */
object Toggles {

  private def on(key: String): Boolean =
    SQLConf.get.getConfString(key, "true").toBoolean

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
}
