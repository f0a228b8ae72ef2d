package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plain watermarked windowed aggregation — the canonical Structured
  * Streaming shape (`withWatermark` → `groupBy(window(...))` → agg in append
  * mode), exposed directly: the candle/correlation pipelines wrap richer
  * state around it, this is the unadorned building block a user reaches for
  * first. Append mode emits each window exactly once, when the watermark
  * passes its end — so the streaming result over a replayed bounded table is
  * bit-identical to the batch windowed aggregation.
  */
object StreamingAgg {

  /** Integer-exact mean to micro-units from a cents sum `__cents` and a
    * count `n`: round-half-up (toward +∞) = floor((cents/n)·10⁴ + ½),
    * expressed as pure integer arithmetic. The floor is emulated with
    * `pmod` because Spark's `div` truncates toward zero while the DuckDB
    * oracles' `//` floors — for a NEGATIVE cents sum the two disagree by
    * one; this form is sign-safe and matches `//` exactly. (The generator's
    * 6-dp values quantize to exact cents under `round(value·100)` on both
    * engines, so the per-row terms are identical longs.)
    */
  val avgMicroExpr: String =
    "((__cents * 20000 + n) - pmod(__cents * 20000 + n, n * 2)) div (n * 2)"

  /** Sliding-window count/avg of `value` per event_type over a stream. */
  def sliding(stream: DataFrame, size: String, slide: String,
      tsCol: String = "ts"): DataFrame =
    stream.withWatermark(tsCol, "0 seconds")
      .groupBy(window(col(tsCol), size, slide).as("w"), col("event_type"))
      // integer-exact mean (exact cents per row → integer sum → sign-safe
      // half-up integer division to micro-units): bit-identical on any
      // engine, any arrival order — matches the batch gates' formulation
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("__cents"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"),
        expr(avgMicroExpr).as("avg_micro"))

  /** Replay a bounded event table through [[sliding]] in `batches`
    * time-sliced micro-batches (FileReplay). A sentinel row past the last
    * window end advances the watermark so every real window flushes; the
    * sentinel's own (never-closed) windows are filtered back out.
    */
  def slidingReplayBatch(events: DataFrame, size: String, slide: String,
      batches: Int = 6, sentinelType: String = "__WM__"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    val in = events.select(col("ts"), col("event_type"), col("value"))
    val (chunk, _, hi) = FileReplay.timeChunks(in, "ts", batches)

    // sentinel strictly past every real window's end; doubled so the final
    // watermark advance is followed by one more batch that flushes state
    val sentinelTs = hi + 2 * StreamingCandles.durationMicros(size)
    def sentinel(off: Long) = Seq(
      (new java.sql.Timestamp(sentinelTs / 1000 + off), sentinelType,
        0.0)).toDF("ts", "event_type", "value")

    val root = FileReplay.stage(in, chunk, Seq(sentinel(0), sentinel(1000)))
    FileReplay.run(spark, root, in.schema)(src => sliding(src, size, slide))
      .filter(col("event_type") =!= sentinelType)
  }

  /** Streaming TRENDING twin: the tumbling per-(window, type) counts are
    * the incremental piece (watermarked state, append mode emits each
    * window-type count exactly once on close); the top-3 rank is a final
    * rollup over that |windows|×|types| emission — dimension-sized, so
    * running it batch-side after the replay is the honest production
    * shape (a rank is not incrementally maintainable in append mode, and
    * doesn't need to be: its input never exceeds the window×type grid).
    * Same oracle as ev_trending.
    */
  def trendingReplayBatch(events: DataFrame, size: String, topK: Int,
      batches: Int = 6, sentinelType: String = "__WM__"): DataFrame = {
    val counts = slidingReplayBatch(events, size, size, batches,
      sentinelType)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("wstart")).orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("wstart"), col("event_type"), col("n"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Session-window (inactivity-gap) count/sum per user over a stream —
    * the merging-window family: unlike fixed/sliding windows a session's
    * extent is data-dependent, so the state store merges adjacent windows
    * as events arrive and append mode emits each session exactly once, when
    * the watermark passes `last event + gap`. Bit-identical to the batch
    * `session_window` aggregation over the same bounded input.
    */
  def session(stream: DataFrame, gap: String, tsCol: String = "ts"): DataFrame =
    stream.withWatermark(tsCol, "0 seconds")
      .groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("sum_v"))

  /** Replay a bounded event table through [[session]] in `batches`
    * micro-batches. The sentinel user (`user_id = -1`, impossible in the
    * data) lands past every possible session close (`hi + 2·gap >
    * hi + gap`), advancing the watermark so every real session flushes;
    * doubled so the advance itself is followed by one more batch.
    */
  def sessionReplayBatch(events: DataFrame, gap: String,
      batches: Int = 6): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    val in = events.select(col("user_id"), col("ts"), col("value"))
    val (chunk, _, hi) = FileReplay.timeChunks(in, "ts", batches)

    val sentinelTs = hi + 2 * StreamingCandles.durationMicros(gap)
    def sentinel(off: Long) = Seq(
      (-1L, new java.sql.Timestamp(sentinelTs / 1000 + off), 0.0))
      .toDF("user_id", "ts", "value")

    val root = FileReplay.stage(in, chunk, Seq(sentinel(0), sentinel(1000)))
    FileReplay.run(spark, root, in.schema)(src => session(src, gap))
      .filter(col("user_id") >= 0)
  }
}
