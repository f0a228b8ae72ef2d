package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** END-TO-END corpus curation: the composed pipeline a training-data team
  * actually ships — near-dup removal, quality filtering, and benchmark
  * decontamination over one document pool — as a single operator, the
  * LLM-pipeline analog of [[Rolling.indicators]]' shared fan-out.
  *
  * Stages (each individually oracle-gated elsewhere; this composition is
  * gated as `corpus_curation`):
  *
  *  1. MinHash-LSH near-dup pairs → connected components → per-cluster
  *     survivors ([[Dedup.minHashLsh]]/[[Dedup.survivors]]);
  *  2. quality floor on the composite score ([[TextAnalysis.quality]]);
  *  3. eval-leakage drop: any document sharing ≥ `minShared` word n-grams
  *     with a benchmark item is removed ([[TextAnalysis.contamination]]).
  *
  * Scale shape is the sum of its parts — banded LSH keeps dedup off the
  * all-pairs cliff, quality is a pure scan, decontamination broadcasts the
  * benchmark — and the filters between stages are semi/anti joins on
  * compact id relations. Known cost: decontamination re-derives shingles
  * over the surviving corpus (a second linear scan+explode; measured ~half
  * the pipeline at sf0.1) — a production deployment would materialize the
  * dedup stage's shingle relation once and share it with this stage.
  */
object Curation {

  /** Curated (doc_id, n_tokens, quality_score) rows surviving all three
    * stages. `bench` carries (`bench_id`, text).
    */
  def curate(docs: DataFrame, bench: DataFrame,
      minJaccard: Double = 0.5, minQuality: Double = 0.45,
      n: Int = 3, minShared: Int = 2): DataFrame = {
    val pairs = Dedup.minHashLsh(docs, minJaccard = minJaccard)
    val surv = Dedup.survivors(docs, pairs.select(col("id1"), col("id2")))
    val contaminated = TextAnalysis.contamination(surv, bench, n, minShared)
      .select(col("doc_id")).distinct()
    TextAnalysis.quality(surv)
      .filter(col("quality_score") >= minQuality)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality_score"))
  }
}
