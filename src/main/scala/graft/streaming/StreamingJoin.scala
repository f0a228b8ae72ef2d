package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the online twin of
  * [[graft.operators.Behavior.attribution]]: two live event streams (here
  * both filtered from one replayed source) joined on the user key with a
  * time-range constraint, emitting every (click, purchase) pair whose
  * purchase lands inside the attribution horizon.
  *
  * This is the one join shape that genuinely needs streaming machinery:
  * both sides grow without bound, so each must buffer only the slice of
  * itself the other side can still legally match. Spark derives that state
  * bound FROM the join's own time-range predicate: a buffered click is
  * evicted once the watermark passes `c_ts + horizon` (no purchase can
  * match it anymore), and a buffered purchase once the watermark passes
  * its own `p_ts` — state is horizon × arrival-rate, independent of stream
  * length. At 100 TB/day both sides shuffle on `user_id` into co-located
  * state stores; hot users bound their own pair output exactly as in the
  * batch twin.
  *
  * Replay correctness: the FileReplay slices are strictly time-monotone
  * (equal timestamps share a chunk), so a zero-second watermark delay
  * never evicts a click a later purchase could still match — the emitted
  * union over micro-batches equals the batch join row-for-row, and the two
  * gates share one DuckDB oracle.
  */
object StreamingJoin {

  /** Build the streaming attribution join over a (possibly streaming)
    * events frame carrying (event_id, ts, user_id, event_type).
    */
  def attribution(src: DataFrame, horizonMin: Int,
      wmDelay: String = "0 seconds", joinType: String = "inner"): DataFrame = {
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", wmDelay)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", wmDelay)
    graft.operators.Behavior.attributionJoin(clicks, purchases, horizonMin,
      joinType)
  }

  /** Replay the bounded events table through the stream-stream join in
    * `batches` time-sliced micro-batches; the result equals the batch
    * attribution (same oracle).
    *
    * `joinType = "left_outer"` adds the unmatched-click rows: append mode
    * emits a null-extended row only when the CLICK's state is evicted —
    * i.e. when the watermark proves no purchase can still match — so two
    * sentinel rows per side past `hi + 2·horizon` drive the final
    * watermark advance that flushes the tail (the [[StreamingAgg]] sentinel
    * pattern); sentinel rows (negative ids) are filtered back out.
    */
  def replayBatch(events: DataFrame, horizonMin: Int = 60,
      batches: Int = 16, joinType: String = "inner"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val in = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val (chunk, _, hi) = FileReplay.timeChunks(in, "ts", batches)
    val tails = if (joinType == "inner") Seq.empty[org.apache.spark.sql.DataFrame]
    else {
      val sentinelTs = hi + 2L * horizonMin * 60L * 1000000L
      def sentinel(off: Long) = Seq(
        (-1L, new java.sql.Timestamp(sentinelTs / 1000 + off), -1L, "click"),
        (-2L, new java.sql.Timestamp(sentinelTs / 1000 + off), -1L, "purchase"))
        .toDF("event_id", "ts", "user_id", "event_type")
      Seq(sentinel(0), sentinel(1000))
    }
    val root = FileReplay.stage(in, chunk, tails)
    val out = FileReplay.run(spark, root, in.schema)(
      src => attribution(src, horizonMin, joinType = joinType))
    if (joinType == "inner") out else out.filter(col("user_id") >= 0)
  }
}
