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
    * (`partitionBy keys orderBy time, side`) carrying the matched right
    * row as ONE struct with `last(_, ignoreNulls)` — exactly one exchange
    * on `keys`, and all value columns come from the SAME right row
    * (a genuinely NULL right value stays NULL, like SQL ASOF JOIN).
    *
    * `skewBlockMicros`: hot-key mitigation — a single key's full history
    * otherwise serializes through one window partition. When set, rows
    * window within (key, time-block) partitions and the match carries
    * across blocks via a per-(key, block) boundary table (cardinality
    * keys × blocks, not rows), so no partition exceeds one block of one
    * key. Results are identical.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      toleranceMicros: Option[Long] = None,
      skewBlockMicros: Option[Long] = None): DataFrame = {
    val SIDE = "_graft_side"
    val TS = "_graft_ts"
    val PAY = "_graft_pay"
    val RT = "_rt"
    val leftCols = left.columns.toSeq
    // shared layout: keys ++ ts ++ side ++ left payload ++ right payload
    // (matched right row travels as one struct: time + value columns)
    val rNorm = right
      .withColumn(TS, col(rightTime))
      .withColumn(SIDE, lit(0))
      .withColumn(PAY, struct((col(rightTime).as(RT) +:
        valueCols.map(c => col(c).as(c))): _*))
      .select((keys :+ TS :+ SIDE :+ PAY).map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val payType = rNorm.schema(PAY).dataType
    val lNorm = left
      .withColumn(TS, col(leftTime))
      .withColumn(SIDE, lit(1))
      .withColumn(PAY, lit(null).cast(payType))
      .select((keys :+ TS :+ SIDE :+ PAY).map(col) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val union = lNorm.unionByName(rNorm)

    val matched = skewBlockMicros match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(TS).asc, col(SIDE).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        union.withColumn(PAY, last(col(PAY), ignoreNulls = true).over(w))
      case Some(blockW) =>
        val BLK = "_graft_blk"
        val CARRY = "_graft_carry"
        val blocked = union.withColumn(BLK,
          floor(unix_micros(col(TS)).cast("double") / blockW.toDouble).cast("long"))
        val wIn = Window.partitionBy((keys :+ BLK).map(col): _*)
          .orderBy(col(TS).asc, col(SIDE).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inBlock = blocked.withColumn(PAY, last(col(PAY), ignoreNulls = true).over(wIn))
        // boundary: the carried payload AT the end of each (key, block) —
        // one row per (key, block); carry it across earlier blocks only
        val boundary = inBlock
          .groupBy((keys :+ BLK).map(col): _*)
          .agg(max_by(col(PAY), struct(col(TS), col(SIDE))).as(PAY))
        val wPrev = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(BLK).asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = boundary
          .withColumn(CARRY, last(col(PAY), ignoreNulls = true).over(wPrev))
          .select((keys :+ BLK).map(col) :+ col(CARRY): _*)
        inBlock.join(carry, keys :+ BLK, "left")
          .withColumn(PAY, coalesce(col(PAY), col(CARRY)))
          .drop(BLK, CARRY)
    }

    var out = matched.where(col(SIDE) === 1)
    for (c <- valueCols) {
      val fresh = toleranceMicros match {
        case Some(tol) => unix_micros(col(TS)) - unix_micros(col(PAY)(RT)) <= tol
        case None      => lit(true)
      }
      out = out.withColumn(c + "_asof", when(fresh, col(PAY)(c)))
    }
    out.withColumn(leftTime + "_matched", col(PAY)(RT))
      .drop(TS, SIDE, PAY)
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
    // empty/inverted intervals (end <= start) can contain nothing under the
    // [start, end) contract — and an inverted one would otherwise make
    // `sequence` (default step −1) explode a single corrupt row into a
    // descending bucket list of unbounded size
    val rB = right
      .where(col(rightEnd) > col(rightStart))
      .withColumn(B, explode(sequence(
        (unix_micros(col(rightStart)) / bucketWidthMicros).cast("long"),
        ((unix_micros(col(rightEnd)) - 1) / bucketWidthMicros).cast("long"))))
    lB.join(rB, keys :+ B)
      .where(col(leftPoint) >= col(rightStart) && col(leftPoint) < col(rightEnd))
      .drop(B)
  }
}
