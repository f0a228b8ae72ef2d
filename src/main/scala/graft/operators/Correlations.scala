package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PearsonAligned

/** Sliding-window all-pairs Pearson correlation over candle log-returns.
  *
  * Re-expresses the reference's STEP 4-5 (`FXTimeSeriesPipelineDemo.java:270-348`)
  * — log-return projection (`DistributeWorkDataDoFn.java:60-71`), per-window
  * packet building (`CreateWorkPacketsDoFn.java:41-98`), manual 20-way
  * hash-partitioned Cartesian pairing
  * (`CreatePartitionWorkPacketsDoFn.java:37-99`) and commons-math Pearson
  * (`ComputeCorrelationsDoFn.java:34-209`) — as:
  *
  *  1. `window(ts, size, slide)` replaces `SlidingWindows`; each point lands
  *     in size/slide windows;
  *  2. pivot: one row per (window, key) holding the series as ts-sorted
  *     parallel arrays — the Spark shape of the reference's `WorkPacket`
  *     (`CreateWorkPacketsDoFn.java:41-98`); a few points per row, so the
  *     whole pivoted relation is ~|windows|·|keys| compact rows;
  *  3. triangular self-join on window alone (`a.key < b.key` replaces the
  *     hand-rolled pair fan-out + O(n) seen-pair dedup,
  *     `WorkPacketUtils.getMyPartitions:39-45`), evaluating
  *     [[PearsonAligned]] — a codegen'd two-pointer merge that aligns the
  *     two series on exact timestamps and computes Pearson in one pass.
  *
  * Scale notes (100 TB): the O(keys²) pair blow-up never touches a shuffle —
  * the only exchanges are the pivot groupBy (|points| rows) and the self-join
  * hash on window (|windows|·|keys| compact rows). Pair rows exist solely
  * inside whole-stage codegen between the join and the threshold filter,
  * which discards most of them immediately. The previous formulation
  * (point-level join + `corr` groupBy) shuffled O(windows·keys²·points) rows
  * — ~1.6B at sf0.1 — and was 10-20× slower. When `propagateNaN` is off,
  * constant series (zero variance over the whole window — every pair
  * involving one is NaN, because any timestamp-aligned subset of a constant
  * series is constant) are pruned BEFORE the join, which shrinks the
  * quadratic term to live keys only: gap-filled carry-forward candles make
  * most series constant-zero in quiet windows.
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

  /** One row per (sliding window, key): the series as ts-sorted parallel
    * arrays plus its full-window stddev (for NaN-pair pruning). The Spark
    * `WorkPacket`. Works on batch AND streaming inputs (the groupBy becomes a
    * watermarked streaming aggregation when `returns` is a stream —
    * [[graft.streaming.StreamingCorrelations]]).
    */
  private[graft] def packets(returns: DataFrame, windowSize: String, slide: String): DataFrame =
    returns
      .filter(col("ret").isNotNull)
      .select(window(col("ts"), windowSize, slide).as("w"), col("key"),
        col("ts"), col("ret"))
      .groupBy(col("w"), col("key"))
      .agg(sort_array(collect_list(struct(col("ts"), col("ret")))).as("pts"),
        stddev_pop(col("ret")).as("sd"))
      .select(col("w"), col("key"), col("pts"),
        transform(col("pts"), p => unix_micros(p.getField("ts"))).as("tss"),
        transform(col("pts"), p => p.getField("ret")).as("rets"),
        col("sd"))

  /** All-pairs Pearson correlation per sliding window with the reference's
    * threshold / NaN policy (`ComputeCorrelationsDoFn.java:166-203`):
    * pairs with <2 aligned points are skipped; NaN correlations are dropped
    * unless `propagateNaN`, in which case value := 1.0 and `isNaN` = true
    * (`ComputeCorrelationsDoFn.java:188-193` — intentional, replicated).
    */
  def correlate(
      returns: DataFrame,
      windowSize: String = "600 seconds",
      slide: String = "300 seconds",
      minCorr: Double = 0.5,
      propagateNaN: Boolean = false,
      includeUnderlying: Boolean = false): DataFrame =
    correlatePackets(packets(returns, windowSize, slide),
      minCorr, propagateNaN, includeUnderlying)

  /** Pair-join + Pearson + threshold/NaN policy over a packet relation (the
    * output shape of [[packets]]). Shared verbatim by the batch path above
    * and the streaming path's per-micro-batch join
    * ([[graft.streaming.StreamingCorrelations]]) so the two can't drift.
    */
  private[graft] def correlatePackets(
      pk0: DataFrame,
      minCorr: Double,
      propagateNaN: Boolean,
      includeUnderlying: Boolean,
      cache: Boolean = true): DataFrame = {

    // A constant series correlates NaN with everything; when NaN pairs are
    // dropped anyway, prune those packets before the quadratic join.
    //
    // Cache the packet relation: the self-join would otherwise execute the
    // whole upstream pipeline (candles → returns → pivot) once PER SIDE —
    // measured as ~70% of query time at sf0.1, vs 3 s for the 265 M-pair
    // join+Pearson itself. Packets are |windows|·|keys| compact rows (a few
    // hundred MB at 10k keys), safe to pin MEMORY_AND_DISK even at 100 TB
    // input; in foreachBatch this also prevents re-executing the stateful
    // streaming plan per side. The streaming path manages its own per-batch
    // persist/unpersist instead (caches here would leak across micro-batches).
    val pkF = if (propagateNaN) pk0 else pk0.filter(col("sd") > 0)
    val pk = if (cache) pkF.cache() else pkF

    val joined = pk.as("a").join(pk.as("b"),
      col("a.w") === col("b.w") && col("a.key") < col("b.key"))

    // inline(array(...)) unpacks the result struct through a Generate node —
    // an optimizer barrier that pins PearsonAligned to exactly ONE evaluation
    // per pair. Plain struct-field projection lets CollapseProject and
    // predicate pushdown inline the whole O(merge) expression once per
    // reference (r appears in the NaN policy, the threshold filter and the
    // output; n in the pair filter) — measured ~2.5× slower at sf0.1.
    val paired = joined
      .select(Seq(
        col("a.w").as("w"), col("a.key").as("key1"), col("b.key").as("key2")) ++
        (if (includeUnderlying) Seq(col("a.pts").as("xValues"), col("b.pts").as("yValues"))
         else Nil) ++
        Seq(inline(array(
          PearsonAligned(col("a.tss"), col("a.rets"), col("b.tss"), col("b.rets"))))): _*)
      .filter(col("n") >= 2)

    val policy =
      if (propagateNaN)
        paired.withColumn("isNaN", isnan(col("r")))
          .withColumn("r", when(col("isNaN"), lit(1.0)).otherwise(col("r")))
      else
        paired.filter(!isnan(col("r"))).withColumn("isNaN", lit(false))

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
