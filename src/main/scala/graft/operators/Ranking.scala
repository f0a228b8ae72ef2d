package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL RANKING — dense 0-based ranks under a total order,
  * without the single-partition `row_number() OVER (ORDER BY …)` that
  * serializes a corpus-sized sort onto one task (the same bottleneck
  * [[Packing.packSequences]]' two-level prefix sum avoids for token
  * offsets; this is the row-count analog):
  *
  *  1. range-repartition + in-partition sort on the order columns — the
  *     distributed sort Spark already does for any ORDER BY;
  *  2. one tiny per-partition row-count aggregation; cumulative offsets
  *     via a window over |partitions| rows (the only serial step —
  *     bounded by the partition count, not the data);
  *  3. rank = partition offset + in-partition `row_number` (a window
  *     PARTITIONED by the range partition — parallel again).
  *
  * The order MUST be total (append a unique id as the last column):
  * range partitioning may split equal keys across partition boundaries,
  * and only a total order makes the rank independent of where the
  * split fell. With a total order the result is deterministic for ANY
  * partition count — pinned by RankingSpec.
  *
  * The classic consumer is curriculum ordering: rank docs by a score,
  * then feed the dense rank to [[Packing.packSequences]] as the packing
  * id — gated end-to-end as `pack_curriculum`.
  */
object Ranking {

  /** `df` plus a dense 0-based `rank` column under `order` (total order
    * required). `parts = 0` uses the session's shuffle parallelism.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
      parts: Int = 0): DataFrame = {
    require(order.nonEmpty, "rank needs at least one order column")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint pins the partitioning: the offsets aggregate and the
    // rank projection must see the SAME partition ids
    val sorted = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy("__pid").agg(count(lit(1)).as("__n"))
    // serial step: |partitions| rows, not |rows|
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wIn = Window.partitionBy("__pid").orderBy(order: _*)
    sorted.join(broadcast(offsets), "__pid")
      .withColumn("rank", col("__off") + row_number().over(wIn) - 1)
      .drop("__pid", "__off")
  }
}
