package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window all-pairs Pearson correlation over candle log-returns.
  *
  * Re-expresses the reference's STEP 4-5 (`FXTimeSeriesPipelineDemo.java:270-348`)
  * — log-return projection (`DistributeWorkDataDoFn.java:60-71`), per-window
  * packet building (`CreateWorkPacketsDoFn.java:41-98`), manual 20-way
  * hash-partitioned Cartesian pairing
  * (`CreatePartitionWorkPacketsDoFn.java:37-99`) and commons-math Pearson
  * (`ComputeCorrelationsDoFn.java:34-209`) — as a point-level triangular
  * self-join plus Spark's built-in `corr` aggregate:
  *
  *  - `window(ts, size, slide)` replaces `SlidingWindows`; each point lands
  *    in size/slide windows;
  *  - the equi-join on (window, ts) with theta `key1 < key2` replaces the
  *    reference's hand-rolled pair fan-out + O(n) seen-pair dedup
  *    (`WorkPacketUtils.getMyPartitions:39-45`), and aligns series point-by-
  *    point on exact timestamps (safe: gap-fill guarantees every key has a
  *    candle in every window — the reference *relies* on this, commons-math
  *    throws on unequal arrays, `ComputeCorrelationsDoFn.java:140-160`);
  *  - built-in `corr` is the same Pearson estimator, NaN on zero variance
  *    exactly like `PearsonsCorrelation`.
  *
  * Scale notes (100 TB): two shuffles — the self-join hashes both sides on
  * (window, ts) so one task handles one time-slice of one window (n keys →
  * n(n−1)/2 pair rows, the same (n²−n)/2 work the reference advertises,
  * `README.MD:41`), then the corr aggregate hashes on (window, key1, key2)
  * with map-side partial aggregation. Everything stays in whole-stage
  * codegen; no arrays are materialized unless `includeUnderlying`.
  */
object Correlations {

  /** value = ln(close.ask / open.ask), stamped at candle close time
    * (`DistributeWorkDataDoFn.java:60-71` — bid is ignored by the reference).
    * Non-positive prices yield null instead of the reference's silent
    * -Infinity/NaN (`Math.log`) — ANSI-safe and droppable downstream; the
    * `when` guard keeps the division lazy so ANSI mode cannot throw.
    */
  def logReturns(candles: DataFrame): DataFrame =
    candles.select(
      col("key"),
      col("closeTime").as("ts"),
      when(col("close.askPrice") > 0 && col("open.askPrice") > 0,
        log(col("close.askPrice") / col("open.askPrice"))).as("ret"))

  /** All-pairs Pearson correlation per sliding window with the reference's
    * threshold / NaN policy (`ComputeCorrelationsDoFn.java:166-203`):
    * pairs with <2 points are skipped; NaN correlations are dropped unless
    * `propagateNaN`, in which case value := 1.0 and `isNaN` = true
    * (`ComputeCorrelationsDoFn.java:188-193` — intentional, replicated).
    */
  def correlate(
      returns: DataFrame,
      windowSize: String = "600 seconds",
      slide: String = "300 seconds",
      minCorr: Double = 0.5,
      propagateNaN: Boolean = false,
      includeUnderlying: Boolean = false): DataFrame = {

    // Points with no return (candles preceding a key's first live tick have
    // no prices to difference) are dropped up front: the moment aggregates
    // below must all see the *same* row subset, otherwise covar and the two
    // stddevs disagree on n and the ratio can leave [-1, 1].
    val slid = returns
      .filter(col("ret").isNotNull)
      .select(window(col("ts"), windowSize, slide).as("w"), col("key"), col("ts"), col("ret"))

    val a = slid.alias("a")
    val b = slid.alias("b")
    val joined = a.join(b,
      col("a.w") === col("b.w") && col("a.ts") === col("b.ts") &&
        col("a.key") < col("b.key"))

    // Pearson from pop-moments (n vs n−1 scaling cancels in the ratio) with
    // an explicit zero-variance guard: Spark 4's ANSI mode makes built-in
    // `corr` *throw* DIVIDE_BY_ZERO on constant series, whereas the reference
    // (commons-math `PearsonsCorrelation`) yields NaN — the NaN policy below
    // needs the NaN. `when` branches evaluate lazily, so this is ANSI-safe.
    val base = Seq(
      covar_pop(col("a.ret"), col("b.ret")).as("cxy"),
      stddev_pop(col("a.ret")).as("sdx"),
      stddev_pop(col("b.ret")).as("sdy"),
      count(lit(1)).as("n"))
    val under =
      if (includeUnderlying)
        Seq(sort_array(collect_list(struct(col("a.ts"), col("a.ret")))).as("xValues"),
            sort_array(collect_list(struct(col("b.ts"), col("b.ret")))).as("yValues"))
      else Nil

    val grouped = joined
      .groupBy(col("a.w").as("w"), col("a.key").as("key1"), col("b.key").as("key2"))
      .agg(base.head, (base.tail ++ under): _*)
      .filter(col("n") >= 2)
      .withColumn("r",
        when(col("sdx") === 0 || col("sdy") === 0, lit(Double.NaN))
          .otherwise(
            // clamp float noise only in the non-NaN branch — least/greatest
            // treat NaN as the largest double and would corrupt the NaN policy
            greatest(lit(-1.0), least(lit(1.0), col("cxy") / (col("sdx") * col("sdy"))))))

    val policy =
      if (propagateNaN)
        grouped.withColumn("isNaN", isnan(col("r")))
          .withColumn("r", when(col("isNaN"), lit(1.0)).otherwise(col("r")))
      else
        grouped.filter(!isnan(col("r"))).withColumn("isNaN", lit(false))

    policy
      .filter(abs(col("r")) >= lit(minCorr))
      .select(Seq(
        col("w.start").as("windowStart"),
        col("w.end").as("windowEnd"),
        col("key1"), col("key2"),
        col("r").as("corr"), col("n"), col("isNaN")) ++
        (if (includeUnderlying) Seq(col("xValues"), col("yValues")) else Nil): _*)
  }

  /** Candles → correlations, the reference demo's STEP 4+5 composed. */
  def fromCandles(
      candles: DataFrame,
      windowSize: String = "600 seconds",
      slide: String = "300 seconds",
      minCorr: Double = 0.5,
      propagateNaN: Boolean = false,
      includeUnderlying: Boolean = false): DataFrame =
    correlate(logReturns(candles), windowSize, slide, minCorr, propagateNaN, includeUnderlying)
}
