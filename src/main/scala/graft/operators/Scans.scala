package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair shared by the pair-producing and
  * explode-heavy operators.
  *
  * Spark sizes a file scan's partitions by BYTES (`maxPartitionBytes` /
  * `openCostInBytes`), and parquet cannot split below a row group — so a
  * compact input (the driver testdata is ONE row group per table) pins
  * every stage up to the first exchange onto 1-3 cores, no matter what the
  * downstream work multiplies that input into (a |q|×n broadcast-join pair
  * space, a ~200× shingle explode with per-shingle md5). Fanning moves
  * only the compact pre-explosion relation and restores the session's full
  * parallelism; a corpus already at or above session parallelism — the
  * 100 TB case, thousands of splits — passes through untouched.
  *
  * Measured (BASELINE r12): ann_pq's 8M-pair stage 14 s → 1.1 s at the g1
  * tier; corpus_curation 14.4 → 8.1 s, minHashLsh 8.2 → 3.2 s, zipfFit
  * 3.0 → 1.1 s warm on stash-alternated builds. Negative where stage-1 is
  * light: the candle pipeline (post-shuffle gap-fill/carry dominates) and
  * bm25 (TF pre-agg) measured neutral.
  */
object Scans {

  /** Repartition `df` to the session default parallelism when that WIDENS
    * it and its plan-stats size estimate reaches `minBytes` (no job runs —
    * the estimate is plan-time). `minBytes = 0` skips the size guard: right
    * when per-byte compute dwarfs the exchange (text shingling); pass a
    * threshold when the downstream work is proportional to bytes (vector
    * math), where exchanging a tiny relation costs more than the
    * single-task stage it replaces.
    */
  def fanToParallelism(df: DataFrame, minBytes: Long = 0L): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target ||
        df.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(minBytes))
      df
    else df.repartition(target)
  }
}
