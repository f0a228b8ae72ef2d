package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Gating: sketch estimates are engine-specific by construction (DuckDB's
  * approx_count_distinct uses a different HLL seed/width), so the
  * ESTIMATES are never hashed against an oracle. The gates run the
  * `*Checked` forms below — exact facts both engines replay bit-identically
  * plus Spark-computed within-bound booleans the oracle asserts TRUE — so
  * the sketch contract is driver-gated without comparing estimates.
  */
object Sketches {

  /** HLL within-bound check: |approx − exact| ≤ 3·rsd·exact. Missing
    * groups on either side (e.g. a language with zero tokens) coalesce to
    * TRUE — absent ≈ absent.
    */
  private def hllOk(approx: Column, exact: Column, rsd: Double): Column =
    coalesce(abs(approx.cast("double") - exact.cast("double")) <=
      lit(3 * rsd) * exact.cast("double"), lit(true))

  /** Quantile rank check: the returned value's exact rank window
    * [#<, #≤] must straddle p·n within ±(2/accuracy)·n ± 1 row.
    */
  private def rankOk(lt: Column, le: Column, n: Column, p: Double,
      accuracy: Int): Column = {
    val err = 2.0 / accuracy
    (le.cast("double") >= lit(p - err) * n - 1) &&
      (lt.cast("double") <= lit(p + err) * n + 1)
  }

  /** Per-group profile of the events table: row count, HLL distinct users
    * and props, mean, and approximate value quartiles. One hash aggregation
    * with map-side partials — scan-bound at any scale. The three quartiles
    * come from ONE mergeable summary (the array form of percentile_approx),
    * unnested to scalar q25/q50/q75 columns so downstream consumers (and
    * the driver's row checker) see a flat schema.
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
        .as("__quartiles"))
      .select(col("event_type"), col("n"), col("approx_users"),
        col("approx_props"), col("avg_value"),
        col("__quartiles")(0).as("q25"),
        col("__quartiles")(1).as("q50"),
        col("__quartiles")(2).as("q75"))

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
        array(lit(0.5), lit(0.9)), lit(accuracy)).as("__lenq"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        // one summary, two scalar columns (p50/p90) — flat schema on purpose
        col("__lenq")(0).as("p50"), col("__lenq")(1).as("p90"))
    val vocab = base.select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy("lang")
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_vocab"))
    lens.join(vocab, Seq("lang"), "left") // |langs| rows — trivially small
  }

  /** Oracle-checkable form of [[eventProfile]] — the gate harness, not the
    * production path. Emits per-group EXACT facts both engines can compute
    * bit-identically (row count; micro-unit value sum, each term rounded to
    * an exact long BEFORE summing so the fold is order-independent) plus a
    * Spark-computed `*_ok` boolean per estimate that pins the sketch inside
    * its contract: HLL distincts within 3×rsd of the exact distinct count,
    * each approximate quantile's exact rank within p ± 2/accuracy (±1 row
    * of absolute slack for tiny groups). The DuckDB oracle replays the
    * exact facts and asserts the booleans TRUE — a hash match therefore
    * proves the estimates were in-bound, without ever hashing the
    * engine-specific estimates themselves.
    *
    * The exact distincts/ranks here are verification cost the 100 TB
    * standing job does NOT pay — that job runs [[eventProfile]]; this form
    * exists so the driver's oracle can gate the sketch contract.
    */
  def eventProfileChecked(events: DataFrame, rsd: Double = 0.02,
      accuracy: Int = 10000): DataFrame = {
    // NOT pinned: the profile subtree is referenced twice (the rank pass's
    // broadcast and the final join) and DOES compute twice — but caching
    // it was ABBA-measured ~2 s SLOWER at sf0.1: materializing the
    // multi-distinct Expand in row format and reading it back costs more
    // than the second codegen aggregation over a scan the OS cache holds
    val prof = events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(round(col("value") * lit(1000000)).cast("long")).as("sum_value_micro"),
      countDistinct(col("user_id")).as("__xu"),
      countDistinct(col("props")).as("__xp"),
      approx_count_distinct(col("user_id"), rsd).as("__au"),
      approx_count_distinct(col("props"), rsd).as("__ap"),
      percentile_approx(col("value"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("__q"))
    // exact rank of each returned quantile VALUE (strict and weak counts);
    // the profile side is |groups| rows — broadcast, the fact table scans
    // once more and nothing else shuffles
    val ranks = events
      .join(broadcast(prof.select(col("event_type"), col("__q"))),
        Seq("event_type"))
      .groupBy("event_type").agg(
        sum(when(col("value") < col("__q")(0), 1L).otherwise(0L)).as("__lt1"),
        sum(when(col("value") <= col("__q")(0), 1L).otherwise(0L)).as("__le1"),
        sum(when(col("value") < col("__q")(1), 1L).otherwise(0L)).as("__lt2"),
        sum(when(col("value") <= col("__q")(1), 1L).otherwise(0L)).as("__le2"),
        sum(when(col("value") < col("__q")(2), 1L).otherwise(0L)).as("__lt3"),
        sum(when(col("value") <= col("__q")(2), 1L).otherwise(0L)).as("__le3"))
    prof.join(ranks, Seq("event_type"))
      .select(col("event_type"), col("n"), col("sum_value_micro"),
        hllOk(col("__au"), col("__xu"), rsd).as("users_ok"),
        hllOk(col("__ap"), col("__xp"), rsd).as("props_ok"),
        rankOk(col("__lt1"), col("__le1"), col("n"), 0.25, accuracy).as("q25_ok"),
        rankOk(col("__lt2"), col("__le2"), col("n"), 0.50, accuracy).as("q50_ok"),
        rankOk(col("__lt3"), col("__le3"), col("n"), 0.75, accuracy).as("q75_ok"))
  }

  /** Oracle-checkable form of [[docProfile]] — same contract shape as
    * [[eventProfileChecked]]: exact per-language doc and token counts both
    * engines replay, plus booleans pinning the HLL vocabulary estimate
    * (3×rsd of the exact distinct-token count) and the doc-length quantile
    * ranks (p ± 2/accuracy, ±1 row). Production path stays [[docProfile]].
    */
  def docProfileChecked(docs: DataFrame, rsd: Double = 0.02,
      accuracy: Int = 10000): DataFrame = {
    val toksC = TextAnalysis.tokens(col("text"))
    // NOT pinned: the corpus tokenizes once per consumer plan (lens, the
    // vocab explode, and ranks), but caching the tokenized array rows was
    // ABBA-measured slower than re-running the codegen tokenizer scan
    val base = docs.select(col("lang"), size(toksC).as("n_toks"),
      toksC.as("toks"))
    val lens = base.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_toks").cast("long")).as("n_tokens"),
      percentile_approx(col("n_toks").cast("double"),
        array(lit(0.5), lit(0.9)), lit(accuracy)).as("__lenq"))
    val vocab = base.select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy("lang").agg(
        countDistinct(col("tok")).as("__xv"),
        approx_count_distinct(col("tok"), rsd).as("__av"))
    val ranks = base
      .join(broadcast(lens.select(col("lang"), col("__lenq"))), Seq("lang"))
      .groupBy("lang").agg(
        sum(when(col("n_toks") < col("__lenq")(0), 1L).otherwise(0L)).as("__lt1"),
        sum(when(col("n_toks") <= col("__lenq")(0), 1L).otherwise(0L)).as("__le1"),
        sum(when(col("n_toks") < col("__lenq")(1), 1L).otherwise(0L)).as("__lt2"),
        sum(when(col("n_toks") <= col("__lenq")(1), 1L).otherwise(0L)).as("__le2"))
    // vocab joins LEFT (as docProfile does): a language whose documents all
    // tokenize empty has no exploded rows — absent vocab ≈ 0, bound holds
    lens.join(vocab, Seq("lang"), "left").join(ranks, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        hllOk(col("__av"), col("__xv"), rsd).as("vocab_ok"),
        rankOk(col("__lt1"), col("__le1"), col("n_docs"), 0.5, accuracy).as("p50_ok"),
        rankOk(col("__lt2"), col("__le2"), col("n_docs"), 0.9, accuracy).as("p90_ok"))
  }

  /** Corpus-wide heavy-hitter tokens — every token covering ≥ `minFrac` of
    * all token occurrences, with its EXACT count and share. The classic
    * sketch→verify split (same shape as this engine's LSH→exact-Jaccard
    * dedup): a per-partition Misra–Gries summary nominates a small
    * candidate set, then one exact aggregation restricted to candidates
    * produces the answer — so the result is EXACT (DuckDB-oracle-gated)
    * while no stage ever shuffles the full vocabulary.
    *
    * Why the candidates are a guaranteed superset: Misra–Gries with
    * capacity k on a partition of nₚ occurrences keeps every item whose
    * partition count exceeds nₚ/k. If a token's GLOBAL count is
    * ≥ minFrac·N then by averaging some partition has count ≥ minFrac·nₚ,
    * and with k = ⌈2/minFrac⌉ that exceeds nₚ/k — so the token survives in
    * at least one partition's summary (the factor 2 covers the boundary).
    *
    * 100 TB shape: pass 1 is a narrow mapPartitions over the token scan
    * carrying ≤ k entries of state per task and emitting ≤ partitions × k
    * candidate rows (thousands — broadcast range). Pass 2 is a broadcast
    * semi-join + one hash aggregation whose map-side partials collapse the
    * hot tokens (the very ones this query selects) per partition before
    * the shuffle — the skew IS the signal, and it never concentrates.
    * The exact-everything alternative shuffles one row per distinct token.
    */
  def heavyHitters(docs: DataFrame, textCol: String = "text",
      minFrac: Double = 0.001, capacity: Int = 0): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac in (0,1], got $minFrac")
    val k = if (capacity > 0) capacity
      else math.max(math.ceil(2.0 / minFrac).toInt, 16)
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val candidates = toks.as[String].mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]()
      while (it.hasNext) {
        val t = it.next()
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None =>
            if (counters.size < k) counters.update(t, 1L)
            else {
              // decrement-all step; zeros drop out (amortized O(1) — each
              // decrement cancels one earlier increment)
              val dead = List.newBuilder[String]
              counters.mapValuesInPlace((_, c) => c - 1)
              counters.foreach { case (key, c) => if (c == 0) dead += key }
              dead.result().foreach(counters.remove)
            }
        }
      }
      counters.keysIterator
    }.toDF("tok").distinct()
    val total = toks.agg(count(lit(1)).as("__n"))
    toks.join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") >= lit(minFrac) * col("__n"))
      .select(col("tok"), col("cnt"),
        round(col("cnt").cast("double") / col("__n"), 6).as("frac"))
  }
}
