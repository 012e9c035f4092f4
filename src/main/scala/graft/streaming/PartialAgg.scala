package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Finalizable partial-aggregate components for continuous aggregates —
  * the reference's partial-state caggs (`tsl/src/continuous_aggs/
  * finalize.c`, partials stored unfinalized in the materialization and
  * finalized at query time): a cagg that stores these components instead
  * of finished values can (a) roll up into coarser hierarchical caggs and
  * (b) finalize `count/sum/avg/min/max/stddev/variance` — not just the
  * trivially-associative aggregates.
  *
  * The moment set is (n, Σx, Σx², min, max) in FIXED-SCALE DECIMALS, not
  * Welford/m2 floats: decimal sums are exact, so the merge is plainly
  * associative (sums add, min/max combine) and a hierarchical rollup is
  * bit-identical to aggregating the raw rows directly — the determinism
  * the oracle gate needs, with no pairwise-merge ordering sensitivity.
  * Σx is DECIMAL(18,6)-cast input summed (→ DECIMAL(28,6)); Σx² keeps the
  * full 12-dp product scale (→ DECIMAL(38,12)) so no intermediate
  * rounding happens before the final cast.
  *
  * Usage:
  * {{{
  *   CaggDef("1 hour", groups, PartialAgg.partials(col("value"), "v"))
  *   // hierarchical daily-from-hourly:
  *   CaggDef("1 day", groups, PartialAgg.rollup("v"))
  *   // at query time:
  *   daily.select(PartialAgg.avg("v"), PartialAgg.stddevSamp("v"), ...)
  * }}}
  */
object PartialAgg {

  private def dec(x: Column): Column = x.cast("decimal(18,6)")

  /** Component columns aggregating a raw measure `x` under `prefix`. */
  def partials(x: Column, prefix: String): Seq[Column] = Seq(
    count(x).as(s"${prefix}_n"),
    sum(dec(x)).as(s"${prefix}_sum"),
    sum(dec(x) * dec(x)).as(s"${prefix}_sumsq"),
    min(x).as(s"${prefix}_min"),
    max(x).as(s"${prefix}_max"))

  /** Re-aggregate components produced by [[partials]] (or by a previous
    * [[rollup]]) — the hierarchical-cagg merge. Associative and exact.
    */
  def rollup(prefix: String): Seq[Column] = Seq(
    sum(col(s"${prefix}_n")).as(s"${prefix}_n"),
    sum(col(s"${prefix}_sum")).as(s"${prefix}_sum"),
    sum(col(s"${prefix}_sumsq")).as(s"${prefix}_sumsq"),
    min(col(s"${prefix}_min")).as(s"${prefix}_min"),
    max(col(s"${prefix}_max")).as(s"${prefix}_max"))

  // ---- finalizers (`finalize.c` finalize_agg analogues) ----

  def countOf(prefix: String): Column = col(s"${prefix}_n")

  def sumOf(prefix: String): Column = col(s"${prefix}_sum").cast("double")

  def minOf(prefix: String): Column = col(s"${prefix}_min")

  def maxOf(prefix: String): Column = col(s"${prefix}_max")

  def avg(prefix: String): Column =
    col(s"${prefix}_sum").cast("double") / col(s"${prefix}_n")

  /** Sample variance from exact moments:
    * (Σx² − (Σx)²/n) / (n−1), finalized in double with a fixed operation
    * order so every engine computing the same decimals agrees bitwise.
    * n ≤ 1 yields NULL (SQL `var_samp`), not 0/0 = NaN; the result is
    * clamped at 0 — independent decimal→double roundings of Σx and Σx² can
    * make a constant group come out a hair negative, and sqrt of that in
    * [[stddevSamp]] would be NaN.
    */
  def varSamp(prefix: String): Column = {
    val n = col(s"${prefix}_n")
    val s = col(s"${prefix}_sum").cast("double")
    val s2 = col(s"${prefix}_sumsq").cast("double")
    when(n <= 1, lit(null).cast("double"))
      .otherwise(greatest((s2 - s * s / n) / (n - lit(1)), lit(0.0)))
  }

  def stddevSamp(prefix: String): Column = sqrt(varSamp(prefix))
}
