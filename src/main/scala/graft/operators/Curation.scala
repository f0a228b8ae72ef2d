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
  * compact id relations. The corpus is shingled exactly ONCE: the pinned
  * `(id, shingle)` relation feeds the MinHash signature pipeline, the
  * exact-Jaccard verify, AND the decontamination probe. The probe runs over
  * the FULL corpus shingles un-restricted — the survivor restriction is
  * applied implicitly by the final left_anti, so probing the superset is
  * harmless and avoids a survivor semi-join. At 100 TB the explode scan is
  * the pipeline's dominant linear cost, and it is not paid twice.
  */
object Curation {

  /** Curated (doc_id, n_tokens, quality_score) rows surviving all three
    * stages. `bench` carries (`bench_id`, text). Pins the shared shingle
    * relation via [[Caches]] when `cache` — call `Caches.release(spark)`
    * after consuming the result (or pass `cache = false` to recompute).
    */
  def curate(docs: DataFrame, bench: DataFrame,
      minJaccard: Double = 0.5, minQuality: Double = 0.45,
      n: Int = 3, minShared: Int = 2, cache: Boolean = true): DataFrame = {
    val sh0 = Dedup.shingleRows(docs, "text", "doc_id", n)
    val sh = if (cache) Caches.pin(sh0) else sh0
    val pairs = Dedup.minHashLshFromShingles(sh, minJaccard = minJaccard,
      cache = cache)
    val surv = Dedup.survivors(docs, pairs.select(col("id1"), col("id2")))
    // contamination runs over the FULL corpus shingles (one more cache
    // read), not survivors: the superset is harmless — the left_anti below
    // can only remove docs that survived — and skipping the survivor
    // semi-join keeps this stage a single probe of the cached relation
    val contaminated = TextAnalysis
      .contaminationFromShingles(sh, bench, n, minShared)
      .select(col("doc_id")).distinct()
    TextAnalysis.quality(surv)
      .filter(col("quality_score") >= minQuality)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality_score"))
  }
}
