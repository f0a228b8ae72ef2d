package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window (rolling) statistics over an ordered per-key series — the
  * moving-average / rolling-volatility layer a timeseries engine exposes on
  * top of candles (the reference stops at per-window OHLC; rolling indicators
  * are the natural next derivation and a standard feature-engineering step).
  *
  * One window sort per key — a single shuffle on `keyCol`, then a sequential
  * frame scan inside each partition (whole-stage codegen window exec). At
  * 100 TB the cost is the sort within each key partition; there is no
  * cross-key state, so keys parallelize freely.
  */
object Rolling {

  /** Rolling count/avg/min/max/sample-stddev of `valueCol` over the trailing
    * `n` rows (current row inclusive) per `keyCol`, ordered by `orderCol`.
    * `roll_std` is null while the frame holds a single row (sample stddev
    * needs two points) — same convention in Spark and DuckDB.
    */
  def stats(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column, n: Int): DataFrame = {
    require(n >= 1, s"rolling frame must be >= 1 row, got $n")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(n - 1L), Window.currentRow)
    df.select(
      col(keyCol), col(orderCol),
      count(valueCol).over(w).as("roll_n"),
      avg(valueCol).over(w).as("roll_avg"),
      min(valueCol).over(w).as("roll_min"),
      max(valueCol).over(w).as("roll_max"),
      stddev_samp(valueCol).over(w).as("roll_std"))
  }

  /** Drawdown: each value relative to the running maximum so far per key —
    * `value / max_so_far - 1`, ≤ 0 by construction, the standard peak-to-
    * trough risk series. One growing-frame running max (incremental O(n)).
    * Null values pass through as null drawdowns without disturbing the
    * running max.
    */
  def drawdown(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = max(valueCol).over(w)
    df.select(col(keyCol), col(orderCol),
      when(valueCol.isNotNull && peak =!= 0.0, valueCol / peak - 1.0)
        .as("drawdown"))
  }

  /** Exponentially-weighted moving average over the trailing `n` rows per
    * key: weight `alpha^age` (age 0 = current row), normalized by the
    * closed-form weight sum — the adjusted EWMA every stats library
    * computes for a finite history. The frame folds directly inside the
    * window aggregate ([[graft.functions.EwmaWindowAgg]] — no intermediate
    * collect_list array is materialized); same single-shuffle shape as
    * [[stats]].
    *
    * NULL CONTRACT (unchanged from the collect_list form it replaced):
    * null values are SKIPPED, so a null inside the frame silently compacts
    * the history (ages shift) — filter or coalesce nulls upstream if that
    * matters. A frame of only nulls yields a null ewma (guarded — not a
    * division by zero).
    */
  def ewma(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column, n: Int, alpha: Double): DataFrame = {
    require(n >= 1, s"ewma frame must be >= 1 row, got $n")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(n - 1L), Window.currentRow)
    df.select(col(keyCol), col(orderCol),
      ewmaAgg(valueCol, alpha).over(w).as("ewma"))
  }

  /** Finite-history adjusted EWMA window aggregate over the frame's values
    * (oldest → newest): `Σ x_i·α^(age_i) / Σ α^(age)` with the closed-form
    * denominator — [[graft.functions.EwmaWindowAgg]], bit-identical to the
    * windowed collect_list → [[graft.functions.EwmaFold]] pipeline it
    * replaced (r16) with the frame array never materialized into the
    * Window operator's output row. The building block the whole indicator
    * family shares.
    */
  private def ewmaAgg(x: Column, alpha: Double): Column = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    graft.functions.EwmaWindowAgg(x, alpha)
  }

  /** MACD over a bounded trailing history of `n` rows: the fast/slow EWMA
    * difference, plus the signal
    * line (EWMA of the MACD series) and histogram. Two window passes over
    * ONE key partitioning — the second windows the first's output with the
    * same partition/order spec, so Catalyst plans a single exchange (and a
    * single sort: the sort order is unchanged between passes). The bounded
    * frame makes the indicator identical on any engine — classic
    * infinite-history MACD depends on where the stream "starts", which is
    * undefined at 100 TB and unreproducible across engines.
    */
  def macd(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column, fast: Int = 12, slow: Int = 26, signal: Int = 9,
      n: Int = 30): DataFrame = {
    require(fast < slow, s"fast span must be < slow span, got $fast/$slow")
    // ewmaAgg weights by decay^age — the standard span smoothing
    // 2/(span+1) is the COMPLEMENT convention, so decay = (span−1)/(span+1):
    // a shorter span decays history faster (the "fast" line)
    def decay(span: Int): Double = (span - 1.0) / (span + 1)
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(n - 1L), Window.currentRow)
    // Materialize each raw EWMA line ONCE: window expressions are extracted
    // per REFERENCE, and subEps references its argument twice — the inlined
    // form planned the frame history 4 times for the line and 2 more for
    // the signal per row (the bollinger dedup note; same fix, identical
    // arithmetic). The fast/slow folds run as direct window aggregates
    // (EwmaWindowAgg) — no collect_list array materializes per row.
    // MACD is a difference of near-equal EWMAs: on constant-value stretches
    // (carry-forward candles) the true value is 0 and the computed value is
    // catastrophic-cancellation noise (~value·1e-13) whose SIGN depends on
    // the engine's pow/accumulation order — so ±noise rounds to 0.0 vs -0.0
    // and hashes differ cross-engine. Clamp sub-epsilon values to exact 0.0
    // BEFORE the signal pass (so the signal's input series is engine-
    // identical too); any oracle must mirror the same clamp.
    val line = df
      .select(col(keyCol), col(orderCol),
        (ewmaAgg(valueCol, decay(fast)).over(w) -
          ewmaAgg(valueCol, decay(slow)).over(w)).as("__macd0"))
      .select(col(keyCol), col(orderCol), subEps(col("__macd0")).as("macd"))
    line
      .select(col(keyCol), col(orderCol), col("macd"),
        ewmaAgg(col("macd"), decay(signal)).over(w).as("__sig0"))
      .select(col(keyCol), col(orderCol), col("macd"),
        subEps(col("__sig0")).as("signal"))
      .withColumn("hist", subEps(col("macd") - col("signal")))
  }

  /** Clamp cancellation-scale noise to exact (positive) 0.0 — see [[macd]]. */
  private def subEps(x: Column, eps: Double = 1e-9): Column =
    when(abs(x) < eps, 0.0).otherwise(x)

  /** The WHOLE indicator family — rolling stats, EWMA, MACD (+signal,
    * histogram), Wilder RSI and Bollinger bands — computed over ONE key
    * partitioning in a single query: every frame shares the same
    * `partitionBy(key).orderBy(order)` spec, so Catalyst plans ONE
    * exchange and ONE sort with the window operators chained over it.
    * This is the plan a real user runs: derive candles once, fan the
    * family out — the marginal cost per indicator is the frame scan, not
    * a re-derivation of the upstream pipeline (which the per-indicator
    * gates pay only because each gate is independent by design).
    *
    * Semantics per indicator are IDENTICAL to the standalone operators
    * ([[stats]], [[ewma]], [[macd]], [[rsi]], [[bollinger]]) with one
    * framing difference: the first row of each key, which [[rsi]] drops
    * (no delta), is kept here with `rsi` null — a fan-out row set must be
    * the same for every column. Input should be pre-filtered of null
    * values (same contract as [[ewma]]).
    */
  def indicators(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column,
      statsN: Int = 4, ewmaN: Int = 10, ewmaAlpha: Double = 0.8,
      fast: Int = 12, slow: Int = 26, signal: Int = 9, macdN: Int = 30,
      rsiPeriod: Int = 14, rsiN: Int = 30,
      bollN: Int = 20, bollK: Double = 2.0): DataFrame = {
    val wLag = Window.partitionBy(keyCol).orderBy(orderCol)
    def fr(n: Int) = wLag.rowsBetween(-(n - 1L), Window.currentRow)
    def decay(span: Int): Double = (span - 1.0) / (span + 1)

    // pass 1: the per-step delta (RSI's input) — a window expression can't
    // nest inside another window's frame aggregate, so it gets its own
    // projection; same partitioning, no extra exchange
    val p1 = df.select(col(keyCol), col(orderCol), valueCol.as("__v"),
      (valueCol - lag(valueCol, 1).over(wLag)).as("__d"))

    // pass 2: every frame aggregate, each materialized EXACTLY ONCE —
    // window expressions are extracted per REFERENCE (the bollinger dedup
    // note), and the previous inlined form planned 4 macd-history
    // collect_lists, 5 rsi gain/loss frames and 6 avg + 12 stddev band
    // aggregates per row; this pass plans one of each, and the derivation
    // passes below work over the named columns with identical arithmetic.
    // The EWMA aggregate skips the first row's null delta (the
    // collect_list null-skip contract, kept by EwmaWindowAgg), so the
    // gain/loss histories match [[rsi]]'s filtered relation exactly
    // (verified frame-by-frame in RollingPropertySpec).
    val wilder = (rsiPeriod - 1.0) / rsiPeriod
    // greatest(null, 0.0) is 0.0 in Spark (nulls are IGNORED, not
    // propagated), so the first row's null delta must be guarded back to
    // null or it leaks a spurious 0.0 gain/loss into every frame that
    // still contains it — the aggregate's null-skip then drops it,
    // matching [[rsi]]'s filtered-relation frames exactly
    def gain(c: Column) =
      when(col("__d").isNotNull, greatest(c, lit(0.0)))
    val p2 = p1.select(col(keyCol), col(orderCol), col("__v"), col("__d"),
      count(col("__v")).over(fr(statsN)).as("roll_n"),
      avg(col("__v")).over(fr(statsN)).as("roll_avg"),
      min(col("__v")).over(fr(statsN)).as("roll_min"),
      max(col("__v")).over(fr(statsN)).as("roll_max"),
      stddev_samp(col("__v")).over(fr(statsN)).as("roll_std"),
      ewmaAgg(col("__v"), ewmaAlpha).over(fr(ewmaN)).as("ewma"),
      ewmaAgg(col("__v"), decay(fast)).over(fr(macdN)).as("__emaF"),
      ewmaAgg(col("__v"), decay(slow)).over(fr(macdN)).as("__emaS"),
      ewmaAgg(gain(col("__d")), wilder).over(fr(rsiN)).as("__ag"),
      ewmaAgg(gain(-col("__d")), wilder).over(fr(rsiN)).as("__al"),
      avg(col("__v")).over(fr(bollN)).as("bb_mid"),
      stddev_samp(col("__v")).over(fr(bollN)).as("__sd0"))

    // derivation pass: plain per-row arithmetic over the materialized
    // aggregates — the macd line's two folds run once each here
    val ag = col("__ag")
    val al = col("__al")
    val mid = col("bb_mid")
    val sd = when(isnan(col("__sd0")), 0.0).otherwise(col("__sd0"))
    val p3 = p2
      .withColumn("__macd0", col("__emaF") - col("__emaS"))
      .select(col(keyCol), col(orderCol),
        col("roll_n"), col("roll_avg"), col("roll_min"), col("roll_max"),
        col("roll_std"), col("ewma"),
        subEps(col("__macd0")).as("macd"),
        when(col("__d").isNotNull,
          when(al === 0.0 && ag === 0.0, 50.0)
            .when(al === 0.0, 100.0)
            .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + ag / al)))
          .as("rsi"),
        mid,
        (mid - lit(bollK) * sd).as("bb_lower"),
        (mid + lit(bollK) * sd).as("bb_upper"),
        // divide by (upper − lower), NOT the algebraically-equal 2k·sd: the
        // two differ in FP and the oracle computes the former
        when(sd > 1e-9,
          (col("__v") - (mid - lit(bollK) * sd))
            / ((mid + lit(bollK) * sd) - (mid - lit(bollK) * sd)))
          .as("bb_pctb"))

    // pass 3: the signal line windows the macd series — same partitioning
    // again, chained window exec; the fold materializes once before the
    // twice-referencing subEps
    p3
      .withColumn("__sig0", ewmaAgg(col("macd"), decay(signal)).over(fr(macdN)))
      .withColumn("signal", subEps(col("__sig0")))
      .withColumn("hist", subEps(col("macd") - col("signal")))
      .drop("__sig0")
  }

  /** RSI (Wilder) over a bounded trailing history: per-step deltas split
    * into gains/losses, each smoothed with the Wilder decay
    * `(period−1)/period` (the α^age form of his running average), then
    * `RSI = 100 − 100/(1 + avgGain/avgLoss)`. Zero-loss frames read 100,
    * zero-movement frames 50 — the standard conventions, made explicit so
    * the oracle can mirror them. The first row of each key (no delta) is
    * dropped. Bounded history keeps the indicator engine-reproducible,
    * same rationale as [[macd]]; one exchange, one frame scan.
    */
  def rsi(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column, period: Int = 14, n: Int = 30): DataFrame = {
    require(period >= 2, s"rsi period must be >= 2, got $period")
    val wLag = Window.partitionBy(keyCol).orderBy(orderCol)
    val w = wLag.rowsBetween(-(n - 1L), Window.currentRow)
    val deltas = df
      .select(col(keyCol), col(orderCol),
        (valueCol - lag(valueCol, 1).over(wLag)).as("__d"))
      .filter(col("__d").isNotNull)
    // materialize the two smoothed frames ONCE: window expressions are
    // extracted per REFERENCE, so inlining ag/al into the when-chain
    // planned 5 frame passes per row instead of 2 (the bollinger dedup
    // note; same fix, same unchanged arithmetic); the folds run as direct
    // window aggregates — no collect_list array materializes per row
    val smoothed = deltas.select(col(keyCol), col(orderCol),
      ewmaAgg(greatest(col("__d"), lit(0.0)),
        (period - 1.0) / period).over(w).as("__ag"),
      ewmaAgg(greatest(-col("__d"), lit(0.0)),
        (period - 1.0) / period).over(w).as("__al"))
    val ag = col("__ag")
    val al = col("__al")
    smoothed.select(col(keyCol), col(orderCol),
      when(al === 0.0 && ag === 0.0, 50.0)
        .when(al === 0.0, 100.0)
        .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + ag / al))
        .as("rsi"))
  }

  /** Stochastic oscillator (%K / %D, 14/3): where the close sits inside the
    * trailing `n`-candle high–low band (0 = at the low, 100 = at the high),
    * smoothed by a `d`-candle SMA. Degenerate bands (carry-forward runs
    * where high == low within FP noise) emit null rather than an FP-noise
    * explosion — the same epsilon guard as [[bollinger]]'s %B. Three
    * trailing frames over ONE per-key sort: single exchange, like every
    * indicator in this family.
    */
  def stochastic(df: DataFrame, keyCol: String, orderCol: String,
      highCol: Column, lowCol: Column, closeCol: Column,
      n: Int = 14, d: Int = 3): DataFrame = {
    require(n >= 2 && d >= 1, s"stochastic needs n >= 2, d >= 1; got $n/$d")
    val wN = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(n - 1L), Window.currentRow)
    val wD = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(d - 1L), Window.currentRow)
    // band extremes materialized once (window exprs extract per reference —
    // the bollinger dedup note): 2 frame aggregates per row, not 5
    val k = when(col("__hh") - col("__ll") > 1e-9,
      lit(100.0) * (col("__c") - col("__ll")) / (col("__hh") - col("__ll")))
    df.select(col(keyCol), col(orderCol), closeCol.as("__c"),
        max(highCol).over(wN).as("__hh"), min(lowCol).over(wN).as("__ll"))
      .select(col(keyCol), col(orderCol), k.as("pct_k"))
      .withColumn("pct_d", avg(col("pct_k")).over(wD))
  }

  /** Average True Range (Wilder's volatility measure, SMA form): the true
    * range `max(high − low, |high − prevClose|, |low − prevClose|)` per
    * candle (first candle: plain high − low), averaged over the trailing
    * `period` candles with finite-history semantics (early candles average
    * what exists). The OHLC-native volatility complement to [[bollinger]]
    * (which sees only closes). Two frames over ONE per-key sort — the lag
    * and the trailing mean share the partitioning, so the whole indicator
    * costs the same single exchange as every other member of this family.
    */
  def atr(df: DataFrame, keyCol: String, orderCol: String,
      highCol: Column, lowCol: Column, closeCol: Column,
      period: Int = 14): DataFrame = {
    require(period >= 2, s"atr period must be >= 2, got $period")
    val wLag = Window.partitionBy(keyCol).orderBy(orderCol)
    val wAvg = wLag.rowsBetween(-(period - 1L), Window.currentRow)
    // prev-close lag materialized once (window exprs extract per reference
    // — the bollinger dedup note): 1 offset function per row, not 3
    val prevClose = col("__pc")
    val tr = when(prevClose.isNull, col("__h") - col("__l"))
      .otherwise(greatest(col("__h") - col("__l"),
        abs(col("__h") - prevClose), abs(col("__l") - prevClose)))
    df.select(col(keyCol), col(orderCol), highCol.as("__h"),
        lowCol.as("__l"), lag(closeCol, 1).over(wLag).as("__pc"))
      .select(col(keyCol), col(orderCol), tr.as("tr"))
      .withColumn("atr", avg(col("tr")).over(wAvg))
  }

  /** Bollinger bands: the trailing-`n` mean ± `k` sample standard
    * deviations, plus %B — where the value sits inside the band (0 =
    * lower, 1 = upper; null while the band is undefined or degenerate).
    * Pure composition over [[stats]]' frame; same single-exchange shape.
    */
  def bollinger(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column, n: Int = 20, k: Double = 2.0): DataFrame = {
    require(n >= 2, s"bollinger frame must be >= 2 rows, got $n")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(n - 1L), Window.currentRow)
    // Materialize each frame aggregate ONCE before deriving the bands:
    // ExtractWindowExpressions emits one window expression PER REFERENCE,
    // so inlining `mid`/`sd` into lower/upper/%B planned 6 avg + 12
    // stddev_samp frame aggregates per row (r15 plan audit) — the Window
    // operator re-evaluates every one of them over the full frame for
    // every row. Deriving from the named columns keeps it at 1 + 1; the
    // band arithmetic is unchanged (same values, same FP order).
    val base = df.select(col(keyCol), col(orderCol), valueCol.as("__v"),
      avg(valueCol).over(w).as("bb_mid"),
      // near-constant frames: the shifted-variance formula can go
      // microscopically NEGATIVE, which sqrt turns into NaN (engines that
      // clamp return ~1e-12 instead) — clamp NaN to 0 and treat any
      // sub-epsilon band as degenerate, or %B explodes on FP noise
      stddev_samp(valueCol).over(w).as("__sd0"))
    val mid = col("bb_mid")
    val sd = when(isnan(col("__sd0")), 0.0).otherwise(col("__sd0"))
    val upper = mid + lit(k) * sd
    val lower = mid - lit(k) * sd
    base.select(col(keyCol), col(orderCol),
      mid, lower.as("bb_lower"), upper.as("bb_upper"),
      when(sd > 1e-9, (col("__v") - lower) / (upper - lower)).as("bb_pctb"))
  }

  /** CUSUM changepoint statistics per key — the classic drift detector over
    * a value series: the one-sided cumulative sums
    * `S+_t = max(0, S+_{t-1} + (x_t − μ_k))` and
    * `S−_t = max(0, S−_{t-1} − (x_t − μ_k))` against the key's own mean,
    * flagged when either exceeds `h · σ_k`. The textbook recurrence is
    * sequential, which would force a per-key scan — but both sums have a
    * closed window-algebra form: with `P_t = Σ_{i≤t}(x_i − μ)`,
    * `S+_t = P_t − min_{i≤t} P_i` and `S−_t = max_{i≤t} P_i − P_t`
    * (the running extremum absorbs every reset-to-zero). So the whole
    * detector is a prefix sum plus a running min/max — three incremental
    * O(n) growing-frame windows sharing ONE sort on one exchange, the same
    * shuffle budget as [[drawdown]], executor-parallel across keys at any
    * scale. μ_k and σ_k come from unbounded per-key window aggregates over
    * the same partitioning (no second shuffle, no driver pass).
    */
  def cusum(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column, h: Double = 3.0): DataFrame = {
    require(h > 0, s"threshold multiplier must be > 0, got $h")
    val wAll = Window.partitionBy(keyCol)
    val wRun = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // chained projections (windows can't nest in one expression); all four
    // window operators share the (key) partitioning and (key, order) sort,
    // so Catalyst plans ONE exchange + one sort for the lot
    df.select(col(keyCol), col(orderCol), valueCol.as("__x"))
      .withColumn("__mu", avg(col("__x")).over(wAll))
      .withColumn("__sd", stddev_samp(col("__x")).over(wAll))
      .withColumn("__p", sum(col("__x") - col("__mu")).over(wRun))
      // the running extremum must include the EMPTY prefix (P_0 = 0) —
      // without it S⁺ misses resets through zero before the first minimum
      // (caught by the recurrence property test)
      .withColumn("__up",
        round(col("__p") - least(min(col("__p")).over(wRun), lit(0.0)), 6))
      .withColumn("__dn",
        round(greatest(max(col("__p")).over(wRun), lit(0.0)) - col("__p"), 6))
      // rounded to 6 dp BEFORE the threshold test as well as the output
      // (the Behavior.anomalies convention), so the flag set is engine-exact
      .select(col(keyCol), col(orderCol),
        col("__up").as("cusum_up"), col("__dn").as("cusum_dn"),
        (col("__sd").isNotNull &&
          (col("__up") > round(lit(h) * col("__sd"), 6) ||
           col("__dn") > round(lit(h) * col("__sd"), 6))).as("changed"))
  }

  /** Historical VALUE-AT-RISK and EXPECTED SHORTFALL per key over a return
    * series: VaR(q) is the exact interpolated q-quantile of the returns
    * ("the loss not exceeded with probability 1−q"), ES the mean of the
    * tail at or below it ("how bad it is when it IS exceeded") — the two
    * numbers every risk report carries. One hash aggregation: `percentile`
    * runs as a single-pass partial aggregate, and the tail mean re-uses
    * the same exchange via a second conditional aggregate against the
    * 6-dp-rounded cut (rounded BEFORE the comparison on both engines, so
    * tail membership — and therefore ES — is engine-exact; the raw
    * interpolated quantile differs in the last ulp across engines).
    * Two aggregation passes over one partitioning, corpus scanned twice —
    * the second pass is the price of an exact value-conditional tail; a
    * single-pass t-digest approximation is the [[graft.operators.Sketches]]
    * path.
    */
  def varES(returns: DataFrame, keyCol: String, retCol: Column,
      q: Double = 0.05, minPoints: Int = 20): DataFrame = {
    require(q > 0 && q < 0.5, s"tail level in (0, 0.5), got $q")
    val cuts = returns.filter(retCol.isNotNull)
      .groupBy(col(keyCol))
      .agg(round(percentile(retCol, lit(q)), 6).as("var_q"),
        count(lit(1)).as("n"))
      .filter(col("n") >= minPoints)
    returns.filter(retCol.isNotNull)
      .join(cuts, keyCol)
      .groupBy(col(keyCol))
      .agg(first(col("var_q")).as("var_q"), first(col("n")).as("n"),
        round(avg(when(retCol <= col("var_q"), retCol)), 6).as("es_q"),
        count(when(retCol <= col("var_q"), lit(1))).as("n_tail"))
      .select(col(keyCol), col("var_q"), col("es_q"), col("n_tail"), col("n"))
  }

  /** Time-weighted average price per (key, tumbling event-time window):
    * each tick's price is weighted by its HOLDING time — until the next
    * tick of the same key in the window, or the window end for the last
    * one — so an instrument quoted once and held beats one that flickered
    * for a second, which a plain `avg` gets wrong. The tick-count `avg` is
    * emitted alongside for comparison.
    *
    * Input must be unique per (key, ts) — pre-aggregate duplicates first
    * (equal timestamps carry zero holding time but which duplicate owns
    * the onward span would be nondeterministic). One exchange on
    * (key, window): the lead() and the aggregation share it.
    */
  def twap(df: DataFrame, keyCol: String, tsCol: String,
      priceCol: Column, windowDur: String): DataFrame = {
    val lw = Window.partitionBy(col(keyCol), col("__w")).orderBy(tsCol)
    df
      .withColumn("__w", window(col(tsCol), windowDur))
      .withColumn("__p", priceCol)
      .withColumn("__wt",
        unix_micros(coalesce(lead(col(tsCol), 1).over(lw), col("__w.end")))
          - unix_micros(col(tsCol)))
      .groupBy(col(keyCol), col("__w.start").as("wstart"))
      .agg(
        round(sum(col("__p") * col("__wt")) / sum(col("__wt")), 6).as("twap"),
        round(avg(col("__p")), 6).as("tick_avg"),
        count(lit(1)).as("n_ticks"))
  }
}
