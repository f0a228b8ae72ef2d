package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CheckpointBridge

/** Distributed byte-pair-encoding (BPE) MERGE TRAINING — the iterative half
  * of tokenizer training ([[TextAnalysis.subwordVocab]] is the one-shot
  * counting half). Sennrich et al. 2016 semantics: start from characters,
  * repeatedly (1) count adjacent symbol pairs corpus-wide, (2) merge the
  * most frequent pair everywhere, greedy left-to-right within each word.
  *
  * The Spark shape mirrors [[Similarity.kMeans]]'s Lloyd loop: the corpus
  * collapses ONCE to a `(word, freq)` relation (vocabulary-sized — the only
  * thing the loop ever touches; a 100 TB corpus becomes millions of rows,
  * not trillions), then each round is one hash aggregation over exploded
  * adjacent pairs (map-side partials — the hot pair collapses per
  * partition) + a 1-row TakeOrdered argmax + one narrow per-row merge
  * projection. Only the single winning pair ever reaches the driver per
  * round; the learned merge table (the MODEL — `steps` rows) is the output.
  * Ties break on (count desc, left, right) — a total order, so the merge
  * sequence is deterministic on any engine.
  *
  * Greedy merge-application semantics (the subtle part, pinned by
  * BpeSpec): one left-to-right scan per word, non-overlapping — in a run
  * `a a a a` merging pair (a,a) yields `aa aa`, not `aa a a`. The fold
  * below reproduces exactly that: a just-merged symbol (`l+r`) can never
  * be the left side of another merge in the same round unless the merged
  * string itself equals `l`.
  *
  * Each round `localCheckpoint`s the new symbol relation — the standard
  * Spark iterative pattern ([[Dedup.components]] uses the same): without
  * it every round's plan embeds all previous rounds' HOF projections.
  */
object Bpe {

  /** Greedy left-to-right non-overlapping merge of adjacent (l, r) into
    * l+r over a symbol array — a single fold, evaluated per word row.
    */
  private[operators] def mergePair(sym: Column, l: String, r: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train `steps` BPE merges over the corpus' whitespace words. Returns
    * the merge table `(step, left, right, pair_count)` — pairs are counted
    * weighted by word frequency, and training stops early if no pair
    * occurs at least `minCount` times.
    */
  def train(df: DataFrame, textCol: String = "text", steps: Int = 6,
      minCount: Long = 2L): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = df.sparkSession
    import spark.implicits._
    val words = Scans.fanToParallelism(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var syms = words.select(col("freq"),
      transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("sym"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val best = syms.filter(size(col("sym")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(0), size(col("sym")) - 2),
            i => struct(element_at(col("sym"), i + 1).as("l"),
              element_at(col("sym"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((step, l, r, c))
        val prev = syms
        syms = syms.select(col("freq"),
          mergePair(col("sym"), l, r).as("sym")).localCheckpoint()
        // bound storage to two symbol copies, not O(steps). Dataset
        // .unpersist is a no-op for a localCheckpoint (RDD-level pin) —
        // the bridge releases the backing RDD's blocks; prev is dead (the
        // new checkpoint materialized eagerly), so this is safe.
        CheckpointBridge.unpersistCheckpoint(prev)
        step += 1
      }
    }
    // merges are already on the driver; the final symbol relation is dead
    CheckpointBridge.unpersistCheckpoint(syms)
    merges.toSeq.toDF("step", "left", "right", "pair_count")
      .select(col("step").cast("long").as("step"), col("left"), col("right"),
        col("pair_count"))
  }

  /** Tokenize `textCol` with a trained merge table: apply the merges in
    * step order and emit corpus-wide piece counts. The merge table is
    * collected to the driver (it is the MODEL — `steps` rows) and applied
    * as a fused column expression; crucially the fold runs once per
    * DISTINCT word (the dictionary trick: collapse to `(word, freq)`
    * first, encode the vocabulary, weight by `freq`) — |vocabulary| merge
    * evaluations instead of |corpus tokens|, a ~10³× cut on a Zipfian
    * corpus and the difference between a scan-bound and an
    * expression-bound encode at scale (measured 105 s → ~2 s at the g1
    * tier). No joins; one hash agg per side of the word collapse.
    */
  def encode(df: DataFrame, mergeTable: DataFrame,
      textCol: String = "text"): DataFrame = {
    val ms = mergeTable.select("step", "left", "right").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    val encoded = ms.foldLeft(chars) { case (sym, (_, l, r)) =>
      mergePair(sym, l, r)
    }
    Scans.fanToParallelism(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), explode(encoded).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("n"))
  }
}
