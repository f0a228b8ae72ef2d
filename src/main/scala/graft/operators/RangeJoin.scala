package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General POINT-IN-INTERVAL (range) join — `p.ts ∈ [i.start, i.end)` with
  * optional key equality — as an EQUI-join, not the nested-loop plan a
  * naive theta join gets (which is a full cross product per key at
  * 100 TB): the time axis is cut into fixed buckets; every interval
  * replicates to the ⌈span/bucket⌉ buckets it overlaps, every point lands
  * in exactly one, the hash join runs on `(keys…, bucket)`, and the exact
  * containment predicate is a residual filter after the join. The result
  * is row-identical to the theta join (a point matching an interval
  * shares at least the point's own bucket with it; the residual removes
  * same-bucket non-matches), while the plan is a plain shuffled/broadcast
  * hash join — the standard interval-binning reformulation.
  *
  * Sizing `bucket`: replication factor is avg-interval-span / bucket, so
  * pick a bucket near the typical span (an hour-scale bucket for
  * session-scale intervals). Too-large buckets cost residual-filter
  * comparisons instead; either way the work is bounded and hash-
  * partitioned, never a per-key cross product. The companion for interval
  * semantics the as-of family (nearest-event lookup) cannot express.
  */
object RangeJoin {

  /** Join each `points` row to every `intervals` row with equal `keys`
    * and `tsCol` in `[startCol, endCol)`. Output columns: `keys`, then
    * the remaining point columns, then the remaining interval columns.
    * Intervals with `end <= start` match nothing (dropped up front).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      bucket: String = "1 hour"): DataFrame = {
    val b = graft.streaming.StreamingCandles.durationMicros(bucket)
    require(b > 0, s"bucket must be positive, got '$bucket'")
    val p = points.withColumn("__bk",
      floor(unix_micros(col(tsCol)) / b).cast("long"))
    val i = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__bk", explode(sequence(
        floor(unix_micros(col(startCol)) / b).cast("long"),
        // end is exclusive: the last overlapped bucket is the one holding
        // end − 1 µs
        floor((unix_micros(col(endCol)) - 1) / b).cast("long"))))
    p.join(i, keys :+ "__bk")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bk")
  }

  /** INTERVAL-OVERLAP join — each `left` interval `[s1, e1)` against every
    * `right` interval `[s2, e2)` with equal `keys` that it overlaps
    * (`s1 < e2 && s2 < e1`) — by the same bucket-binning reformulation:
    * BOTH sides replicate to their covered buckets and hash-join on
    * `(keys…, bucket)`. An overlapping pair shares every bucket of the
    * intersection, so to emit it exactly ONCE the residual keeps only the
    * intersection's FIRST bucket — the one holding `max(s1, s2)` (covered
    * by both sides: it is ≥ each start's bucket and, because
    * `max(start) < min(end)` for overlapping half-open intervals, ≤ each
    * end's last covered bucket). No distinct, no nested loop: replication
    * factor is span/bucket per side, and the join stays a plain hash join
    * at any scale. Column-name collisions between the two sides are the
    * caller's to avoid (standard join contract).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      s1: String, e1: String, s2: String, e2: String,
      bucket: String = "1 hour"): DataFrame = {
    val b = graft.streaming.StreamingCandles.durationMicros(bucket)
    require(b > 0, s"bucket must be positive, got '$bucket'")
    def bins(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s)).withColumn("__bk", explode(sequence(
        floor(unix_micros(col(s)) / b).cast("long"),
        floor((unix_micros(col(e)) - 1) / b).cast("long"))))
    bins(left, s1, e1).join(bins(right, s2, e2), keys :+ "__bk")
      .filter(col(s1) < col(e2) && col(s2) < col(e1) &&
        col("__bk") === greatest(
          floor(unix_micros(col(s1)) / b).cast("long"),
          floor(unix_micros(col(s2)) / b).cast("long")))
      .drop("__bk")
  }
}
