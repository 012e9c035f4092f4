package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Every sampler keys
  * off a cryptographic hash of the ID COLUMN, not an RNG: the same call on
  * the same data always returns the same rows, on any cluster layout, any
  * partition count, any engine (md5 is engine-portable — `rand()` is not
  * reproducible across retries, and Spark's `sample()` is
  * partition-layout-dependent). Reproducible sampling is what makes
  * training mixtures auditable.
  */
object Sampling {

  /** md5 hex digest of the (salted) id — the sampling key. Fixed-length
    * lowercase hex, so LEXICOGRAPHIC order IS numeric order: engines
    * without hex→int conversion can compare/sort the string directly.
    */
  def hashKey(id: Column, salt: String = ""): Column =
    if (salt.isEmpty) md5(id.cast("string"))
    else md5(concat(lit(salt), lit("|"), id.cast("string")))

  /** Uniform [0,1) score for an id: first 12 hex digits of md5 (48 bits —
    * exactly representable in a double) scaled to [0,1).
    */
  def hashScore(id: Column, salt: String = ""): Column =
    conv(substring(hashKey(id, salt), 1, 12), 16, 10)
      .cast("double") / lit(281474976710656.0 /* 2^48 */)

  /** Bernoulli sample: keep each row independently with probability
    * `fraction`, decided by the row's id hash. One scan, no shuffle, no
    * state — the filter pushes into the scan stage.
    */
  def bernoulli(df: DataFrame, idCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.where(hashScore(col(idCol), salt) < lit(fraction))

  /** Stratified sample: EXACTLY `n` rows per stratum (fewer when the
    * stratum is smaller), chosen as the n smallest id-hashes — a
    * deterministic uniform draw without replacement. One shuffle on the
    * strata keys; the rank filter is recognized by Spark's
    * WindowGroupLimit, so each map task keeps only its local top-n per
    * stratum before the exchange (no stratum ever materializes fully).
    */
  def stratified(df: DataFrame, strataCols: Seq[String], idCol: String,
      n: Int, salt: String = ""): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    df.withColumn("_graft_rn", row_number().over(w))
      .where(col("_graft_rn") <= n)
      .drop("_graft_rn")
  }

  /** Weighted stratified QUOTAS: per-stratum target row counts (the
    * "mixture" of a training run). Strata absent from `quotas` are dropped.
    */
  def quotas(df: DataFrame, strataCol: String, idCol: String,
      quotas: Map[String, Int], salt: String = ""): DataFrame = {
    val q = typedLit(quotas)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    df.withColumn("_graft_q", q(col(strataCol)))
      .where(col("_graft_q").isNotNull)
      .withColumn("_graft_rn", row_number().over(w))
      .where(col("_graft_rn") <= col("_graft_q"))
      .drop("_graft_q", "_graft_rn")
  }

  /** TOKEN-budget mixture (the unit a training run is actually planned
    * in): per stratum (source/domain), keep documents — in deterministic
    * md5(id) order — while the RUNNING token total stays within that
    * stratum's budget. A doc is kept iff its inclusive prefix sum of
    * `tokensCol` ≤ the stratum's budget, so the kept set is a prefix of
    * the hash order: reproducible on any engine/layout, auditable, and
    * stable under corpus growth (new docs can only displace docs that
    * hash after them). Strata absent from `budgets` are dropped.
    *
    * One shuffle (the per-stratum window); exact-integer arithmetic
    * throughout — double accumulation would wobble past 2^53 tokens.
    * Skew note: a stratum's rows land in one window partition; at 100 TB
    * pre-aggregate per (stratum, doc) first — `tokensCol` is per-doc
    * already, and the window carries only (id, stratum, tokens), so the
    * sort is over narrow rows, not document text.
    */
  def tokenBudget(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: String, budgets: Map[String, Long],
      salt: String = ""): DataFrame = {
    val b = typedLit(budgets)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_graft_b", b(col(strataCol)))
      .where(col("_graft_b").isNotNull)
      .withColumn("_graft_cum", sum(col(tokensCol).cast("long")).over(w))
      .where(col("_graft_cum") <= col("_graft_b"))
      .drop("_graft_b", "_graft_cum")
  }
}
