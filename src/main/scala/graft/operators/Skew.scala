package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key mitigation for equi-joins.
  *
  * A shuffle join sends every row of a key to one partition; a key holding 1%
  * of 100 TB pins a terabyte on a single task. [[saltedJoin]] spreads each
  * left key over `factor` sub-keys — a deterministic per-row salt on the left,
  * the right side replicated once per salt value — so the hot key's rows land
  * on `factor` tasks. Semantics are identical to the plain join for inner and
  * left-side-preserving joins (each left row still meets every matching right
  * row exactly once).
  *
  * When to reach for this instead of AQE's skew-join split: AQE rebalances
  * sort-merge joins at runtime and usually wins, but it cannot split a
  * partition that a single key fills (the split is per-key-group), does not
  * apply inside `foreachBatch`/streaming micro-batch plans, and does nothing
  * for shuffled hash joins building one oversized hash map. Salting is the
  * static fallback for those shapes.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Per-row salt independent of row CONTENT: hashing the row would send
    * identical duplicate rows of a hot key to one salt (no spreading in
    * exactly the duplicate-heavy worst case) and fails analysis on
    * unhashable column types (e.g. maps). Partition id × position is
    * content-free and spreads duplicates uniformly.
    */
  private[graft] def salt(factor: Int): org.apache.spark.sql.Column =
    pmod(spark_partition_id().cast("long") * 7919L + monotonically_increasing_id(),
      lit(factor.toLong)).cast("int")

  /** Equi-join on `keys` with the left side salted `factor` ways. Only
    * left-row-preserving join types are allowed — replicating the right side
    * would duplicate unmatched right rows under outer types that keep them.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin preserves left rows only; $joinType would duplicate right rows")
    val l = left.withColumn(SaltCol, salt(factor))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
