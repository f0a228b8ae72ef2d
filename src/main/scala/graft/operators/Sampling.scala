package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.md5Long

/** Deterministic sampling for training-data curation. Spark's own
  * `df.sample()` is seed-dependent on partitioning and row order — useless
  * as a reproducible pipeline stage. These hash the ROW IDENTITY instead,
  * so the same row is in or out of the sample on every engine, every run,
  * every partitioning.
  *
  *  - [[bernoulli]]: keep a row iff `md5(id) mod 10^6 < p·10^6` — a pure
  *    filter: zero shuffle, pushes past column pruning, scales to any size.
  *  - [[stratified]]: the `k` smallest-hash rows per group — cluster-then-
  *    sample curation (pair with [[Similarity.kMeans]] labels), balanced
  *    class subsets. One shuffle on the group key.
  */
object Sampling {

  private val M = 1000000L

  /** Deterministic Bernoulli sample: keep ≈ `fraction` of rows, decided by
    * the row id's md5 — engine- and partitioning-independent.
    */
  def bernoulli(df: DataFrame, idCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1], got $fraction")
    // round, don't truncate: 0.3 * 10^6 is 299999.9999… in binary — .toLong
    // would silently exclude the residue the contract includes
    df.filter(pmod(md5Long(idCol.cast("string")), lit(M)) <
      lit(math.round(fraction * M)))
  }

  /** Deterministic stratified sample: the `k` smallest-md5 rows per group
    * (id tie-break) — every group contributes exactly min(k, |group|) rows.
    */
  def stratified(df: DataFrame, groupCols: Seq[String], idCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5Long(idCol.cast("string")), idCol)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }
}
