package graft

/** Interval utilities shared by the invalidation machinery. */
object Ranges {
  /** Merge overlapping/adjacent half-open [lo, hi) ranges; drops empties.
    * (The reference's invalidation-log compaction fold,
    * `tsl/src/continuous_aggs/invalidation.c` — one implementation, used
    * by both the hypertable-side fan-out and the per-cagg log reader.)
    */
  def mergeOverlapping(ranges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ranges.filter { case (lo, hi) => lo < hi }.sorted
      .foldLeft(List.empty[(Long, Long)]) {
        case ((lo0, hi0) :: acc, (lo, hi)) if lo <= hi0 =>
          (lo0, math.max(hi0, hi)) :: acc
        case (acc, r) => r :: acc
      }.reverse
}
