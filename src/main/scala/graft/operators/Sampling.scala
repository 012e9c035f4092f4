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
  /** Deterministic GLOBAL TRAINING ORDER for one epoch: every row gets an
    * `epoch_shard` (hash partition) and `epoch_pos` (rank inside the
    * shard), both derived from md5(epoch|id) — so the order is uniform,
    * uncorrelated across epochs, identical on any engine/cluster layout,
    * and resumable (a reader at (shard, pos) can restart exactly there).
    * This is the "seeded epoch shuffle" of an LLM training run, expressed
    * as a column recipe instead of an RNG.
    *
    * One shuffle (the per-shard rank window) over narrow rows; shards
    * bound the window partitions, so pick shards ≈ the reader parallelism
    * (each shard is one contiguous stream).
    */
  def epochOrder(df: DataFrame, idCol: String, epoch: Long,
      shards: Int): DataFrame = {
    require(shards >= 1, "epochOrder: shards must be positive")
    val h = hashKey(col(idCol), salt = s"epoch$epoch")
    val hv = conv(substring(h, 1, 12), 16, 10).cast("long")
    val w = Window.partitionBy(col("epoch_shard"))
      .orderBy(col("_graft_eh"), col(idCol))
    df.withColumn("_graft_eh", h)
      .withColumn("epoch_shard", (hv % shards).cast("int"))
      .withColumn("epoch_pos", row_number().over(w))
      .drop("_graft_eh")
  }

  /** Hashed bag-of-words bucket ids of the text's whitespace tokens, in
    * document order (single-pass expression; PortableHash mod `buckets`, so
    * any engine reproduces the exact ids).
    */
  def tokenBuckets(text: Column, buckets: Int): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.TokenBuckets(
      org.apache.spark.sql.GraftShims.toExpression(split(trim(text), "\\s+")),
      buckets))

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score every document by how much
    * more likely its hashed-unigram features are under a TARGET corpus (the
    * rows where `isTarget`) than under the raw corpus.
    *
    * weight(doc) = Σ_tokens [ ln((tgt[b]+1)/(T+B)) − ln((raw[b]+1)/(R+B)) ]
    * with b = PortableHash(token) mod B, add-1 smoothing, T/R = total
    * target/raw token counts. The sum runs in DOCUMENT ORDER as a
    * sequential fold, so the double is bit-reproducible across engines
    * (`SparkEntry.oracleSql("q86_dsir_sample")` recomputes it in DuckDB).
    *
    * Dataflow at 100 TB: one narrow scan + a B-bounded groupBy builds the
    * bucket table (≤ `buckets` rows — the only shuffle); the per-bucket
    * log-ratios come to the driver as one Array[Double] (8·B bytes, same
    * bounded pull as the IVF centroids) and ship back as an array literal,
    * so SCORING is a pure narrow map — no join, no second shuffle. DSIR is
    * inherently two-pass over the text (counts, then scores).
    *
    * Returns `df` plus a `dsir_weight` column.
    */
  def dsirWeights(df: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      "dsirWeights: buckets must be in [2, 2^20] (the ratio table is a driver array)")
    val tb = tokenBuckets(col(textCol), buckets)
    val counts = df
      .select(explode(tb).as("_graft_b"), isTarget.cast("boolean").as("_graft_t"))
      .groupBy("_graft_b")
      .agg(count(lit(1)).as("raw"),
        sum(when(col("_graft_t"), 1L).otherwise(0L)).as("tgt"))
      .collect() // bounded: <= buckets rows
    var rawTot = 0L
    var tgtTot = 0L
    counts.foreach { r => rawTot += r.getLong(1); tgtTot += r.getLong(2) }
    val lam = new Array[Double](buckets)
    var b = 0
    while (b < buckets) { // unseen buckets get the pure-smoothing ratio
      lam(b) = math.log(1.0 / (tgtTot + buckets).toDouble) -
        math.log(1.0 / (rawTot + buckets).toDouble)
      b += 1
    }
    counts.foreach { r =>
      lam(r.getInt(0)) =
        math.log((r.getLong(2) + 1L).toDouble / (tgtTot + buckets).toDouble) -
          math.log((r.getLong(1) + 1L).toDouble / (rawTot + buckets).toDouble)
    }
    val lamLit = lit(lam)
    df.withColumn("dsir_weight",
      aggregate(transform(tb, x => element_at(lamLit, x + 1)),
        lit(0.0), (acc, v) => acc + v))
  }

  /** DSIR selection: the `k` documents whose hashed-feature distribution
    * looks most like the target corpus — deterministic top-k by
    * (weight desc, id asc), planned as TakeOrderedAndProject (no global
    * sort materializes).
    */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, buckets: Int = 1024): DataFrame =
    dsirWeights(df, textCol, isTarget, buckets)
      .orderBy(col("dsir_weight").desc, col(idCol))
      .limit(k)

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
