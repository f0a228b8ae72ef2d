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
}
