package graft

/** Whole-surface plan audit: no gated batch query may contain an
  * UNINTENTIONAL nested-loop or cartesian join — the two shapes that turn
  * a 100 TB input into a non-terminating job. Queries built around an
  * explicit broadcast cross join (brute-force ANN scoring, k-means
  * assignment, the gap-fill window×key grid, …) are allowlisted by name;
  * everything else must plan to hash/sort-merge joins only. The oracle
  * gates check values — this is the guard that a future optimizer or
  * operator change can't silently regress a plan into a pair blowup.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Explicit broadcast(cross/theta) designs: small side is provably tiny
    * (query set, centroids, window grid, percentile bounds, 1-row scalar).
    */
  private val intentionalNestedLoop = Set(
    "ann_topk",      // corpus × broadcast query set (exact baseline)
    "contamination_embed", // corpus × broadcast benchmark set
    "ann_quantized", // same shape on dequantized vectors
    "ann_rp",        // same shape on JL-projected vectors
    "ann_pq",        // codes scan × broadcast per-query distance tables
    "ann_ivf",       // corpus × broadcast centroids (assignment pass)
    "ann_ivf_auto",  // same shape, √n-auto stride (≈√n broadcast centroids)
    "ann_join",      // corpus × broadcast centroids (assignment pass)
    "fx_gapfill",    // windows × keys grid (both sides bounded)
    "fx_candles",    // gap-fill grid inside the candle pipeline
    "fx_candles_6h", // rollup over the same candle pipeline
    "fx_interp",     // interpolation over the same candle pipeline
    "text_tfidf",    // 1-row corpus-size cross join
    "feature_bins",  // 1-row quantile-edge-array cross join
    "feature_target_encode", // 1-row global-mean cross join
    "feature_impute", // 1-row global-mean fallback cross join
    "ev_cooccurrence", // 1-row user-total cross join (lift denominator)
    "layout_bloom",  // metadata-sized ledger × broadcast 5-probe table
    "fx_spread",     // candle pipeline upstream (gap-fill grid)
    "sample_temperature", // 1-row weight-total cross join
    "drift_ks",      // 1-row sample-totals cross join (CDF division)
    "profile_assoc", // |a|×|b| margin grid + 1-row total cross join
    "text_heavyhitters", // 1-row occurrence-total cross join (sketch→verify)
    "text_unigram_lp", // 1-row corpus-token-total cross join
    "dedup_ngram",   // 1-row document-frequency cap cross join
    "dedup_containment", // same DF-cap cross join (shared candidate engine)
    "fx_corr",       // candle pipeline upstream (gap-fill grid)
    "fx_corr_nan",   // same
    "fx_corr_underlying", // same (exploded includeUnderlying payload)
    "fx_corr_underlying_norm", // same (fact/dimension reconstruction)
    "ann_graph",     // corpus × broadcast 2-row seed-partition table
    // (ann_graph_search DOES cross entry sample × query set, but its hops
    // localCheckpoint eagerly, so the audited final plan starts from the
    // checkpointed frontier and the audit cannot see inside — no entry)
    "ann_recall",    // exact-baseline scan × broadcast queries + 1-row total
    "fx_returns",    // same
    "fx_point_counts", // same
    "fx_rolling", "fx_ewma", "fx_drawdown", "fx_macd",
    "fx_rsi", "fx_bollinger", "fx_indicators", // same
    "fx_cusum",       // same candle pipeline upstream
    "fx_var",         // same candle pipeline upstream
    "fx_corr_lagged", // same; the lag alignment itself is an equi-join
    "fx_autocorr",    // same; diagonal of the lag join, keyed (key, ts)
    "fx_beta",        // same + 1-row min-key scalar broadcast
    "fx_atr",         // same candle pipeline upstream
    "fx_stochastic",  // same candle pipeline upstream
    "text_bm25",      // 1-row corpus-stats broadcast (nd, avgdl)
    "text_pmi"        // 1-row bigram-total broadcast
  )

  test("no gated batch query plans an unintentional nested-loop/cartesian join") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      // stream_* replays EXECUTE eagerly when built; their returned plan is
      // a parquet read-back — nothing to audit, and far too slow here
      .filterNot(_.startsWith("stream_"))
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        val nested = plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")
        if (nested) Some(name) else None
      }
    val unintentional = offenders.filterNot(intentionalNestedLoop)
    val stale = intentionalNestedLoop -- offenders.toSet --
      Set[String]() // streams are skipped above, none allowlisted
    assert(unintentional.isEmpty,
      s"unintentional nested-loop/cartesian in: ${unintentional.mkString(", ")}")
    assert(stale.isEmpty,
      s"allowlist entries that no longer plan nested loops (remove them): ${stale.mkString(", ")}")
  }
}
