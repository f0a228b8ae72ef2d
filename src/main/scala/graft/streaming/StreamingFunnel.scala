package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming ordered-funnel tracking — the online twin of
  * [[graft.operators.Behavior.funnel]]: per-user keyed state holds the
  * highest stage reached and the time it was reached; each arriving event
  * either advances the funnel (emitting one attainment row, exactly once per
  * (user, stage)) or is dropped. The product-analytics ingest shape: funnel
  * dashboards update per micro-batch instead of rescanning the event log.
  *
  * Semantics: identical to the batch operator's
  * earliest-qualifying-event rule. Batch computes `tᵢ = min{ts of stage-i
  * events ≥ tᵢ₋₁}`; a greedy walk over events in ascending event-time order
  * reaches the same `tᵢ` by induction (the first qualifying stage-i event
  * encountered IS the min, given tᵢ₋₁ already matches). Within a micro-batch
  * the handler sorts its rows by `(ts, stage_idx)` — ties between a stage
  * and its successor at the same timestamp resolve in stage order, matching
  * the batch `>=` comparison — and `FileReplay.timeChunks` never splits
  * equal timestamps across epochs, so replay order is globally
  * ascending-time and the union of epoch outputs equals the batch
  * attainment set regardless of slicing.
  *
  * State per user is two scalars (stage index + timestamp) — at 100 TB the
  * store holds |active users| fixed-size entries in RocksDB, independent of
  * event volume; nothing is ever re-read or re-scanned.
  */
object StreamingFunnel {

  /** `(user, tsMicros, stageIdx)` input row — stage mapping happens before
    * the stateful operator so the state schema is stage-list-agnostic. */
  private[streaming] case class FunnelEvent(userId: Long, tsMicros: Long,
      stageIdx: Int)

  /** Highest stage reached (0-based) and when. */
  private[streaming] case class FunnelState(stage: Int, tMicros: Long)

  /** One attainment: `userId` first reached `stageIdx`. */
  private[streaming] case class FunnelHit(userId: Long, stageIdx: Int)

  private[streaming] class FunnelProcessor(nStages: Int)
      extends StatefulProcessor[Long, FunnelEvent, FunnelHit] {
    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelHit] = {
      val cur = if (st.exists()) st.get() else FunnelState(-1, Long.MinValue)
      var stage = cur.stage
      var t = cur.tMicros
      val hits = ArrayBuffer.empty[FunnelHit]
      // ties sort stage-first so a same-timestamp successor still advances
      rows.toArray.sortBy(e => (e.tsMicros, e.stageIdx)).foreach { e =>
        if (stage + 1 < nStages && e.stageIdx == stage + 1 &&
            (stage == -1 || e.tsMicros >= t)) {
          stage += 1; t = e.tsMicros
          hits += FunnelHit(key, stage)
        }
      }
      if (stage > cur.stage) st.update(FunnelState(stage, t))
      hits.iterator
    }
  }

  /** Apply the streaming funnel to `stream`; returns one append-mode row
    * per (user, newly-reached stage). Events not matching any stage are
    * filtered before the shuffle.
    */
  def funnel(stream: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = stream.sparkSession
    import spark.implicits._
    val idx = stages.zipWithIndex.map { case (s, i) => (s, i) }
      .toDF(typeCol, "__stage_idx")
    val keyed = stream
      .join(broadcast(idx), typeCol) // maps type → stage idx, drops the rest
      .select(col(userCol).cast("long").as("userId"),
        unix_micros(col(tsCol)).as("tsMicros"),
        col("__stage_idx").cast("int").as("stageIdx"))
      .as[FunnelEvent]
      .groupByKey(_.userId)
    keyed.transformWithState(new FunnelProcessor(stages.size),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Replay a bounded event table through the streaming funnel in `batches`
    * time-sliced micro-batches and aggregate the emitted attainments into
    * the batch operator's `(stage_idx, stage, n_users)` shape — the
    * correctness gate (same oracle as `ev_funnel`, zero-reach stages
    * included via the static stage list).
    */
  def replayBatch(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", batches: Int = 16): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val in = events.select(col(userCol), col(tsCol), col(typeCol))
      .filter(col(typeCol).isin(stages: _*))
    val (chunk, _, _) = FileReplay.timeChunks(in, tsCol, batches)
    val root = FileReplay.stage(in, chunk, Seq.empty)
    val confs = Map(
      "spark.sql.shuffle.partitions" -> FileReplay.defaultStateParts.toString,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
    val hits = FileReplay.run(spark, root, in.schema, confs)(
      src => funnel(src, stages, userCol, tsCol, typeCol))
    val names = stages.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("stage_idx", "stage")
    names.join(hits.groupBy(col("stageIdx").as("stage_idx"))
        .agg(count(lit(1)).as("n_users")),
        Seq("stage_idx"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }
}
