package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based profile statistics — the 100 TB scale path for the
  * questions whose EXACT forms are gated elsewhere (`q_distinct_agg`,
  * `q_percentile`): distinct counts and quantiles without shuffling every
  * distinct value or sorting any group.
  *
  *  - Distinct counts run as HyperLogLog++ (`approx_count_distinct`):
  *    fixed ~kilobytes of register state per group, merged associatively —
  *    map-side partials collapse each partition to one sketch row, so the
  *    shuffle carries O(groups) sketches regardless of cardinality. The
  *    exact form shuffles one row per distinct value.
  *  - Quantiles run as `percentile_approx` (a mergeable quantile summary
  *    with rank error ≤ 1/accuracy): again O(groups × accuracy) state,
  *    versus the exact percentile's per-group sort.
  *
  * Both are Spark's built-in, codegen-planned aggregates — no UDAF, no
  * driver involvement beyond the final merged row per group. Accuracy is
  * caller-tunable and the error CONTRACT is pinned by SketchesSpec against
  * the exact aggregates on the same data (relative distinct error well
  * under 3×rsd; quantile rank error under 1/accuracy) — the bound a 100 TB
  * profile job relies on when the exact job would not finish.
  *
  * Deliberately NOT DuckDB-oracle-gated: sketch estimates are
  * engine-specific by construction (DuckDB's approx_count_distinct uses a
  * different HLL seed/width), so the gate records the weaker rows+schema
  * check and the error bound lives in the spec, where it belongs.
  */
object Sketches {

  /** Per-group profile of the events table: row count, HLL distinct users
    * and props, mean, and approximate value quartiles. One hash aggregation
    * with map-side partials — scan-bound at any scale.
    */
  def eventProfile(events: DataFrame, rsd: Double = 0.02,
      accuracy: Int = 10000): DataFrame =
    events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      approx_count_distinct(col("user_id"), rsd).as("approx_users"),
      approx_count_distinct(col("props"), rsd).as("approx_props"),
      round(avg(col("value")), 6).as("avg_value"),
      percentile_approx(col("value"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy))
        .as("value_quartiles"))

  /** Corpus-wide document profile: HLL distinct tokens (vocabulary size
    * estimate) and approximate token-count quantiles per language — the
    * bootstrap statistics a curation pipeline reads before choosing
    * thresholds, at sketch cost instead of an exact vocabulary shuffle.
    */
  def docProfile(docs: DataFrame, rsd: Double = 0.02,
      accuracy: Int = 10000): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val base = docs.select(col("lang"), size(toks).as("n_toks"), toks.as("toks"))
    // doc-level stats BEFORE the token explode — exploding first would
    // weight each doc's length by its own token count in the quantiles
    val lens = base.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_toks")).cast("long").as("n_tokens"),
      percentile_approx(col("n_toks").cast("double"),
        array(lit(0.5), lit(0.9)), lit(accuracy)).as("len_quantiles"))
    val vocab = base.select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy("lang")
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_vocab"))
    lens.join(vocab, Seq("lang"), "left") // |langs| rows — trivially small
  }
}
