package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins the reference leaves to `LATERAL`/window SQL
  * (SURVEY §2.3: range/as-of joins are absent from the reference core —
  * `src/nodes/chunk_append/chunk_append.c:9` only composes chunk exclusion
  * with PostgreSQL's own join algorithms). Here they are first-class,
  * implemented shuffle-lean:
  *
  *  - [[asOf]]: one shuffle + one sort (union + window), NOT an inequality
  *    join — at 100 TB an inequality join would be a broadcast-nested-loop
  *    or a range-exploded SMJ; the union trick is a single
  *    `partitionBy(keys) orderBy(time)` pass.
  *  - [[rangeJoin]]: interval containment via bucketed equi-join — the
  *    right side's intervals are exploded into fixed-width buckets so the
  *    join is an equi-join on (key, bucket) that Catalyst can hash/merge,
  *    followed by the exact range filter.
  */
object Joins {

  /** As-of join: for every left row, the latest right row whose
    * `rightTime <= leftTime`, matched per `keys` (right rows at exactly
    * leftTime are visible). Right columns come back as `valueCols`,
    * null when no right row precedes. `toleranceMicros`: max staleness;
    * matches older than that become null.
    *
    * Plan shape: union of the two inputs, one window
    * (`partitionBy keys orderBy time, side`) carrying each right value
    * forward with `last(_, ignoreNulls)` — exactly one exchange on `keys`.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val SIDE = "_graft_side"
    val TS = "_graft_ts"
    val RT = "_graft_rts"
    val leftCols = left.columns.toSeq
    // shared layout: keys ++ ts ++ side ++ left payload ++ right payload
    val lNorm = left
      .withColumn(TS, col(leftTime))
      .withColumn(SIDE, lit(1))
      .withColumn(RT, lit(null).cast("timestamp"))
      .select((keys :+ TS :+ SIDE :+ RT).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val rNorm = right
      .withColumn(TS, col(rightTime))
      .withColumn(SIDE, lit(0))
      .withColumn(RT, col(rightTime))
      .select((keys :+ TS :+ SIDE :+ RT).map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TS).asc, col(SIDE).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var joined = lNorm.unionByName(rNorm)
      .withColumn(RT, last(col(RT), ignoreNulls = true).over(w))
    for (c <- valueCols)
      joined = joined.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    var out = joined.where(col(SIDE) === 1)
    for (c <- valueCols) {
      val fresh = toleranceMicros match {
        case Some(tol) => unix_micros(col(TS)) - unix_micros(col(RT)) <= tol
        case None      => lit(true)
      }
      out = out.withColumn(c + "_asof", when(fresh, col(s"_r_$c")))
    }
    out.withColumn(leftTime + "_matched",
        when(col(RT).isNotNull, col(RT)))
      .drop(TS, SIDE, RT)
      .drop(valueCols.map(c => s"_r_$c"): _*)
  }

  /** Range join: left rows with `leftPoint` falling inside right's
    * `[rightStart, rightEnd)` interval, per `keys`. `bucketWidthMicros`
    * turns the containment predicate into an equi-join on
    * (keys, bucket): each right interval is exploded into the buckets it
    * overlaps (intervals should be short relative to the bucket width —
    * pick width ≈ p95 interval length).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftPoint: String, rightStart: String, rightEnd: String,
      bucketWidthMicros: Long): DataFrame = {
    val B = "_graft_bucket"
    val lB = left.withColumn(B, (unix_micros(col(leftPoint)) / bucketWidthMicros).cast("long"))
    val rB = right.withColumn(B, explode(sequence(
      (unix_micros(col(rightStart)) / bucketWidthMicros).cast("long"),
      ((unix_micros(col(rightEnd)) - 1) / bucketWidthMicros).cast("long"))))
    lB.join(rB, keys :+ B)
      .where(col(leftPoint) >= col(rightStart) && col(leftPoint) < col(rightEnd))
      .drop(B)
  }
}
