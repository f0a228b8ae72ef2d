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
    "ann_pq_rerank", // same ADC shortlist stage; the re-rank joins are equi
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
    "text_bigram_interp", // same 1-row token-total cross join (unigram leg)
    "dedup_ngram",   // 1-row document-frequency cap cross join
    "dedup_containment", // same DF-cap cross join (shared candidate engine)
    "fx_corr",       // candle pipeline upstream (gap-fill grid)
    "fx_corr_nan",   // same
    "fx_corr_topk",  // same (bounded-output top-k over the pruned path)
    "fx_corr_topk_dict", // same; the dictionary encode/decode joins are equi
    "fx_corr_underlying", // same (exploded includeUnderlying payload)
    "fx_corr_underlying_norm", // same (fact/dimension reconstruction)
    "fx_corr_underlying_topk", // same (bounded payload; dim join is equi)
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

  /** FP-boundary sweep (the fx_spread class): `round(x, n)` keeps IEEE's
    * sign bit, so a value ±ε around zero rounds to **-0.0 on one engine and
    * +0.0 on the other** — values equal, driver hash differs. Any gate whose
    * double output can hold a rounded near-zero must normalize (`+ 0.0`, or
    * the integer micro-unit pattern). This sweep EXECUTES every batch gate
    * at sf0.001 and fails on any -0.0 in a top-level double/float output
    * column — the SPARK-side half of the audit the r10 verdict asked for.
    * The DuckDB-side half (the actual fx_spread mode: Spark's BigDecimal
    * round normalizes the zero sign, DuckDB's round keeps it) can only be
    * seen by running the oracle — tools/check_oracle.py sweeps BOTH
    * engines' outputs for -0.0 and fails the local pre-check, so the class
    * is caught before the driver on either side. (stream_* twins execute
    * eagerly and share their rounding formulas with the audited batch
    * twins; nested array/struct doubles are out of scope — no gate hashes
    * them.)
    */
  test("no gated batch query emits IEEE -0.0 in a double output column") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    // detector self-check: a genuine -0.0 (arithmetic, not round — Spark's
    // BigDecimal round normalizes the sign; products/sums do not) must trip
    val probe = spark.range(1)
      .select((lit(-1.0) * lit(0.0)).as("z"), lit(0.0).as("p"))
      .agg(
        sum(when(col("z") === 0.0 &&
          col("z").cast("string").startsWith("-"), 1L).otherwise(0L)),
        sum(when(col("p") === 0.0 &&
          col("p").cast("string").startsWith("-"), 1L).otherwise(0L)))
      .head()
    assert(probe.getLong(0) == 1L && probe.getLong(1) == 0L,
      "the -0.0 detector itself is broken")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
      .flatMap { name =>
        val df = SparkEntry.queries(name)(spark, dir)
        val dcols = df.schema.fields
          .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
          .map(_.name).toSeq
        val bad =
          if (dcols.isEmpty) Nil
          else {
            // -0.0 detector: equal to zero AND renders with a sign (Spark's
            // `===` treats -0.0 == 0.0; the string cast keeps the sign bit,
            // and ANSI mode rules out the 1/x = -Inf reciprocal trick)
            val checks = dcols.map(c =>
              sum(when(col(c) === 0.0 &&
                  col(c).cast("string").startsWith("-"), 1L)
                .otherwise(0L)).as(c))
            val row = df.agg(checks.head, checks.tail: _*).head()
            dcols.zipWithIndex.collect {
              case (c, i) if !row.isNullAt(i) && row.getLong(i) > 0 => c
            }
          }
        operators.Caches.release(spark) // gates are independent; drop pins
        spark.catalog.clearCache()
        if (bad.isEmpty) None else Some(s"$name(${bad.mkString(",")})")
      }
    assert(offenders.isEmpty,
      s"negative zero in rounded double columns — normalize with `+ 0.0` " +
        s"on BOTH engines: ${offenders.mkString(", ")}")
  }
}
