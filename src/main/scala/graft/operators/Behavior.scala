package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the `events` table — the product-analytics
  * surface (funnels, cohort retention, JSON-property profiling) a
  * training-data pipeline reuses for interaction-log curation: which users
  * progressed through a labeling flow, how cohorts decay, what the opaque
  * metadata column actually carries.
  *
  * Scale design: every operator here is one or two hash shuffles on
  * `user_id` / small group keys — no self-joins, no windows over the whole
  * table, no driver-side iteration. Per-user state is bounded by that
  * user's own event count, so the operators survive a 1000-executor × 100 TB
  * run exactly as written.
  */
object Behavior {

  /** Ordered conversion funnel: for each user, stage i counts only if an
    * event of `stages(i)` occurs at-or-after the time the user reached
    * stage i−1 (earliest-qualifying-event semantics — equivalent to the
    * classic sequential conditional-min formulation, but computed in ONE
    * shuffle instead of one join per stage).
    *
    * Implementation: group by user collecting, per stage, the timestamps of
    * that stage's events (stage 0 needs only its min); then walk the stages
    * with `array_min(filter(...))` — all inside whole-stage codegen, no
    * UDFs. A user missing stage i yields null from the empty-array min and
    * stays null for every later stage. Output: one row per stage with the
    * user count that reached it.
    *
    * At 100 TB: the single shuffle carries one row per (user, stage-event);
    * the per-user arrays are bounded by that user's own activity. The final
    * stage-count aggregation is O(|stages|) scalars.
    */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val firstAgg =
      min(when(col(typeCol) === stages.head, col(tsCol))).as("t0")
    val restAggs = stages.tail.zipWithIndex.map { case (s, i) =>
      collect_list(when(col(typeCol) === s, col(tsCol))).as(s"a${i + 1}")
    }
    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol))
      .agg(firstAgg, restAggs: _*)
    val stepped = stages.indices.tail.foldLeft(perUser) { (d, i) =>
      d.withColumn(s"t$i",
        array_min(filter(col(s"a$i"), x => x >= col(s"t${i - 1}"))))
    }
    val countCols = stages.indices.map(i => count(col(s"t$i")).as(s"n$i"))
    val counts = stepped.agg(countCols.head, countCols.tail: _*)
    val names = array(stages.map(lit): _*)
    counts
      .select(posexplode(array(stages.indices.map(i => col(s"n$i")): _*))
        .as(Seq("stage_idx", "n_users")))
      .select(col("stage_idx").cast("int").as("stage_idx"),
        element_at(names, col("stage_idx") + 1).as("stage"),
        col("n_users"))
  }

  /** Cohort retention: users are cohorted by their first active day; for
    * every (cohort_day, day_offset) cell, count the cohort's users active
    * that day. The input collapses to DISTINCT (user, day) first, so the
    * final count is a plain `count(*)` — no `count(distinct)` expansion —
    * and the join back to cohorts is co-partitioned on `user_id`.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val days = events
      .select(col(userCol), to_date(col(tsCol)).as("day")).distinct()
    val cohorts = days.groupBy(col(userCol))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order MARKOV TRANSITIONS over per-user event sequences: each
    * user's events ordered by (ts, event_id) yield (state → next state)
    * steps via `lead`; the output is the transition count matrix with
    * row-normalized probabilities — "after a click, what happens next".
    * The sequence reconstruction is ONE shuffle on user (the lead window);
    * the matrix aggregation then collapses to |types|² rows, over which the
    * row-sum denominator is a window on a relation small enough for any
    * partitioning. Each user's last event has no successor and drops out.
    */
  def transitions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val seq = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val steps = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(seq))
      .filter(col("to_type").isNotNull)
    val m = steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy("from_type")
    m.select(col("from_type"), col("to_type"), col("n"),
      round(col("n") / sum(col("n")).over(wFrom), 6).as("p"))
  }

  /** Top-`k` 3-STEP PATHS — the sequence-mining complement to the
    * [[transitions]] bigram matrix: each user's consecutive event-type
    * triples (two `lead`s over the same per-user sort, one exchange),
    * counted and ranked globally. The path relation collapses to at most
    * |types|³ rows before the rank, so the final ordering is over a
    * constant-bounded relation regardless of event volume.
    */
  def topPaths(events: DataFrame, k: Int = 20, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val seq = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val paths = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(seq))
      .withColumn("s3", lead(col("s1"), 2).over(seq))
      .filter(col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
    val rk = Window.orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
    paths.withColumn("rk", row_number().over(rk)).filter(col("rk") <= k)
      .select(col("s1"), col("s2"), col("s3"), col("n"),
        col("rk").cast("long").as("rk"))
  }

  /** Cumulative distinct users by day — "total users ever seen" as a time
    * series. The naive form (count(distinct) over a growing frame)
    * re-scans the whole history per day; the scale form is FIRST-SIGHT +
    * PREFIX SUM: one aggregation finds each user's first active day (one
    * shuffle on user, map-side partial min), the per-day new-user counts
    * collapse to a days-sized relation, and the running total is a window
    * prefix sum over those few hundred rows (the single-partition window
    * is on the DAYS relation, never the events). Exactly the
    * [[graft.operators.Sampling.trimToTokenBudget]] two-level pattern with
    * the second level degenerate.
    */
  def cumulativeUsers(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firstDay = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("day"))
    val perDay = firstDay.groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.select(col("day"), col("new_users"),
      sum(col("new_users")).over(wRun).as("cum_users"))
  }

  /** Rolling `windowDays`-day distinct active users per day (the DAU /
    * WAU / MAU family): for each calendar day with traffic, the count of
    * distinct users seen in `[day − windowDays + 1, day]`, next to that
    * day's own DAU. Rolling DISTINCT doesn't decompose into a window
    * aggregate (users repeat across days), so the engine rewrites it as a
    * contribution explode: the deduplicated (day, user) relation fans each
    * row out to the `windowDays` days it makes active, then one
    * count-distinct per day.
    *
    * Scale shape: the corpus collapses FIRST to distinct (day, user) —
    * the one event-scale shuffle; the ×`windowDays` explode and both
    * day-keyed aggregations run over that compact relation (|users|·|days|
    * ≪ |events|). Emitted days are restricted to days with traffic via a
    * broadcast semi join on the tiny day dimension. At 100 TB the same
    * plan holds; if exactness is negotiable, `approx_count_distinct`
    * replaces the final aggregate and the explode disappears into a
    * mergeable HLL sketch per (day) — this operator keeps the exact form
    * the oracle can check.
    */
  def rollingActive(events: DataFrame, windowDays: Int = 7,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    rollingActiveFromPairs(
      events.select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
        .distinct(),
      windowDays)

  /** [[rollingActive]] from an already-deduplicated (day, __u) relation —
    * exposed because the distinct pair SET is associative under union:
    * per-epoch first-sight slices from a streaming ingest re-distinct into
    * exactly this relation, making the streaming twin slicing-invariant.
    */
  def rollingActiveFromPairs(du: DataFrame,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val contrib = du.select(
      explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("day"),
      col("__u"))
    val roll = contrib
      .join(broadcast(dau.select("day")), Seq("day"), "left_semi")
      .groupBy("day")
      .agg(countDistinct(col("__u")).as("active"))
    dau.join(roll, "day")
      .select(col("day").cast("timestamp").as("day"), col("dau"),
        col("active"))
  }

  /** Windowed ANOMALY detection: events whose value deviates ≥ `minZ`
    * standard deviations from their (event_type, tumbling window) cohort.
    * Deliberately NOT a per-type ordered rolling window — that serializes
    * each type onto one task (5 types ⇒ 5 tasks at any scale); the cohort
    * form is one hash aggregation for the window statistics plus an
    * equi-join back on (type, window), both hash-partitioned. Windows with
    * zero variance (or a single row) flag nothing. z is rounded to 6 dp
    * before both the threshold test and the output, so the flag set is
    * engine-exact.
    */
  def anomalies(events: DataFrame, windowLen: String = "1 hour",
      minZ: Double = 3.0, tsCol: String = "ts", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    require(minZ > 0, s"minZ must be positive, got $minZ")
    val w = events.withColumn("__w", window(col(tsCol), windowLen))
    val stats = w.groupBy(col(typeCol), col("__w"))
      .agg(avg(col(valueCol)).as("__mu"),
        stddev(col(valueCol)).as("__sd"))
      .filter(col("__sd") > 0)
    val z = round((col(valueCol) - col("__mu")) / col("__sd"), 6)
    w.join(stats, Seq(typeCol, "__w"))
      .withColumn("z", z)
      .filter(abs(col("z")) >= minZ)
      .select(col("event_id"), col(typeCol), col(tsCol), col(valueCol),
        col("z"))
  }

  /** Profile a numeric field inside the opaque JSON `props` column, per
    * event type — the "what is actually in this metadata blob" scan every
    * interaction log needs before its properties can be trusted as labels.
    * `get_json_object` is a codegen'd path expression (no UDF, no
    * driver-side parsing); rows whose `props` lack the field contribute
    * null and drop out of the aggregates.
    */
  def propsStats(events: DataFrame, field: String = "k",
      typeCol: String = "event_type",
      propsCol: String = "props"): DataFrame =
    events
      .select(col(typeCol),
        get_json_object(col(propsCol), s"$$.$field").cast("long").as("v"))
      .groupBy(col(typeCol))
      .agg(count(col("v")).as("n"), sum(col("v")).as("sum_v"),
        round(avg(col("v")), 6).as("avg_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))

  /** Hour-of-week seasonality profile: event counts per (type, hour-of-week
    * slot 0–167), z-scored against that type's own distribution across
    * slots — the traffic-shape baseline that separates "Tuesday 9am is
    * always like this" from a real anomaly ([[anomalies]] z-scores VALUES;
    * this profiles load). Zero-variance types emit z = 0 (the aggregate
    * runs before the guard — divide lazily, ANSI throws otherwise).
    *
    * Scale shape: one hash aggregation to |types|×168 rows, then a
    * |types|-row stats aggregation broadcast back — metadata-sized output
    * regardless of corpus size.
    */
  def seasonality(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame =
    seasonalityFromCounts(slotCounts(events, typeCol, tsCol), typeCol)

  /** The per-(type, hour-of-week) count relation [[seasonality]] z-scores —
    * exposed separately because the counts are ASSOCIATIVE: per-epoch slot
    * counts from a streaming ingest merge with one sum into exactly this
    * relation, which is what makes the streaming twin batch-identical
    * under any slicing.
    */
  def slotCounts(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame =
    events
      .select(col(typeCol),
        ((dayofweek(col(tsCol)) - 1) * 24 + hour(col(tsCol))).as("how"))
      .groupBy(col(typeCol), col("how")).agg(count(lit(1)).as("n"))

  /** Z-score a slot-count relation per type (the second half of
    * [[seasonality]]); `slots` must carry (`typeCol`, how, n).
    */
  def seasonalityFromCounts(slots: DataFrame,
      typeCol: String = "event_type"): DataFrame = {
    val stats = slots.groupBy(col(typeCol))
      .agg(avg(col("n")).as("__mu"), stddev_samp(col("n")).as("__sd"))
    slots.join(broadcast(stats), typeCol)
      .withColumn("z", when(col("__sd") > 0.0,
        round((col("n") - col("__mu")) / col("__sd"), 6)).otherwise(0.0))
      .select(col(typeCol), col("how"), col("n"), col("z"))
  }

  /** Time-window event dedup: drop an event whose previous event with the
    * same key columns is closer than `windowSec` — the telemetry
    * double-fire / retry-storm filter. Lag-based (each survivor is
    * compared to its immediate predecessor, kept or not), so the decision
    * is one `lag` over a per-key sort: ONE shuffle on the key, state per
    * key = one timestamp. The streaming analog is
    * `dropDuplicatesWithinWatermark` with the same key ([[graft.streaming.StreamingDedup]]).
    */
  def windowDedup(events: DataFrame, keys: Seq[String], windowSec: Long,
      tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("event_id"))
    events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__prev").isNull ||
        unix_micros(col(tsCol)) - col("__prev") >= windowSec * 1000000L)
      .drop("__prev")
  }

  /** The trigger→outcome pair join both attribution gates share: ALL
    * (click, purchase) pairs for the same user with the purchase inside
    * `[click.ts, click.ts + horizonMin)` — the raw relation every
    * attribution model (last-touch, first-touch, linear) aggregates from.
    * Inputs must carry (user_id, c_ts, click_id) and (p_user, p_ts,
    * purchase_id); emitting every qualifying pair (rather than a per-
    * purchase argmax) is what makes the streaming twin possible — Spark's
    * stream-stream inner join emits exactly this relation incrementally.
    *
    * Scale shape: ONE equi-join shuffle on the user key with the time
    * range as a post-join predicate (AQE handles hot-user skew); output is
    * bounded by each user's own click×purchase density inside the horizon,
    * never a corpus-level pair space.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      horizonMin: Int, joinType: String = "inner"): DataFrame =
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") + expr(s"INTERVAL $horizonMin MINUTES"),
        joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))

  /** Batch form over the raw events table (the streaming twin is
    * [[graft.streaming.StreamingJoin]]). `joinType = "left_outer"` keeps
    * unconverted clicks with null purchase columns — the abandoned-intent
    * relation conversion models train on.
    */
  def attribution(events: DataFrame, horizonMin: Int = 60,
      joinType: String = "inner"): DataFrame =
    attributionJoin(
      events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"),
          col("event_id").as("click_id")),
      events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id")),
      horizonMin, joinType)

  /** ITEM CO-OCCURRENCE with lift — the market-basket matrix over per-user
    * item sets: for each unordered item pair, how many users touched both,
    * and the lift `P(a,b)/(P(a)P(b))` that separates genuine affinity from
    * popularity. The recommender/affinity starting point.
    *
    * Scale: the fact FIRST collapses to the distinct (user, item)
    * relation — bounded by users × catalog, far below event volume — and
    * the pair self-join runs per user with `a < b`, so its output is
    * bounded by users · (items-per-user choose 2), never catalog². Margins
    * and the user total are dimension-sized broadcasts.
    */
  def cooccurrence(events: DataFrame, entityCol: String = "user_id",
      itemCol: String = "event_type"): DataFrame = {
    val ut = events.select(col(entityCol).as("__e"), col(itemCol).as("__i"))
      .distinct()
    val margins = ut.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val total = ut.agg(countDistinct(col("__e")).as("__tot"))
    val a = ut.select(col("__e"), col("__i").as("item_a"))
    val b = ut.select(col("__e"), col("__i").as("item_b"))
    a.join(b, Seq("__e")).filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_both"))
      .join(broadcast(margins.select(col("__i").as("item_a"),
        col("__n").as("__na"))), "item_a")
      .join(broadcast(margins.select(col("__i").as("item_b"),
        col("__n").as("__nb"))), "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_both"),
        round(col("n_both") * col("__tot") /
          (col("__na") * col("__nb")), 6).as("lift"))
  }

  /** MULTI-TOUCH (linear) attribution: every click inside a conversion's
    * horizon splits that conversion's credit equally (1/k to each of its
    * k touchpoints), and a click's total credit sums over the conversions
    * it touched — the model marketing mix analyses start from, vs
    * [[attribution]]'s every-pair relation.
    *
    * Scale: the same per-user interval join builds the touch pairs (hash
    * join on user_id, time predicate as residual — output is the touch
    * volume), then k comes from ONE hash agg on purchase_id re-joined on
    * that key, and the final per-click rollup is a second hash agg. No
    * windows, no per-conversion sort; every shuffle key is a real entity
    * id, so AQE's skew split applies if one user or one conversion is
    * hot.
    */
  def multiTouchAttribution(events: DataFrame, horizonMin: Int = 60)
      : DataFrame = {
    val touches = attribution(events, horizonMin)
    val perConv = touches.groupBy("purchase_id")
      .agg(count(lit(1)).as("__k"))
    touches.join(perConv, "purchase_id")
      .groupBy(col("click_id"), col("user_id"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(lit(1.0) / col("__k")), 6).as("credit"))
  }
}
