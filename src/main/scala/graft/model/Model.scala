package graft.model

import java.sql.Timestamp

/** Core data model of the engine.
  *
  * Mirrors the reference's protobuf catalog (reference:
  * `src/TimeSeriesProtos.proto:24-104`) re-expressed as Spark-encodable case
  * classes. Proto-default prices (0.0) on gap-fill synthetics are replaced by
  * explicit `Option`/null — a documented fix (SURVEY.md §2.11).
  */

/** Raw tick — reference `TSProto` (`src/TimeSeriesProtos.proto:30-37`).
  * `isLive = false` marks values synthesized by gap-fill.
  */
case class Tick(
    key: String,
    ts: Timestamp,
    bidPrice: Option[Double],
    askPrice: Option[Double],
    isLive: Boolean)

/** A tick occupying a candle slot — the reference keeps the *entire* tick in
  * each min/max/open/close slot, not just the price
  * (`TSAggValueProto`, `src/TimeSeriesProtos.proto:39-51`).
  */
case class TickS(
    ts: Timestamp,
    bidPrice: Option[Double],
    askPrice: Option[Double],
    isLive: Boolean)

/** OHLC candle for one (key, tumbling window).
  * `closeTime` = window max timestamp (windowEnd − 1 ms), matching the
  * reference's `window.maxTimestamp()` stamping
  * (`EmbedWindowTimeIntoAggregateDoFn.java:28-42`).
  */
case class Candle(
    key: String,
    windowStart: Timestamp,
    windowEnd: Timestamp,
    closeTime: Timestamp,
    open: TickS,
    close: TickS,
    minAsk: TickS,
    maxAsk: TickS,
    minBid: TickS,
    maxBid: TickS,
    isLive: Boolean)

/** One (time, log-return) point — reference `WorkDataPoint`
  * (`src/TimeSeriesProtos.proto:88-92`); value = ln(close.ask / open.ask)
  * (`DistributeWorkDataDoFn.java:60-71`).
  */
case class ReturnPoint(key: String, ts: Timestamp, ret: Double)

/** Pairwise correlation over one sliding window — reference `Correlation`
  * (`src/TimeSeriesProtos.proto:94-104`). `key1 < key2` canonical ordering
  * replaces the reference's "A :: B" concatenated key
  * (`WorkPacketUtils.java:55-62`).
  */
case class CorrelationResult(
    windowStart: Timestamp,
    windowEnd: Timestamp,
    key1: String,
    key2: String,
    corr: Double,
    n: Long,
    isNaN: Boolean)
