package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.ReturnPoint
import graft.operators.Correlations

/** Structured-Streaming sliding-window all-pairs Pearson correlation.
  *
  * Streaming shape of the reference's STEP 4-5
  * (`FXTimeSeriesPipelineDemo.java:270-348`):
  *
  *  1. the packet pivot — one finalized row per (sliding window, key) holding
  *     the ts-sorted return series — runs as a watermarked streaming
  *     aggregation in append mode (the reference's `GroupByKey` +
  *     `CreateWorkPacketsDoFn.java:41-98`). Append mode guarantees a window's
  *     packets are emitted exactly once, all in the micro-batch whose
  *     watermark passed the window end — so every pair partner is present in
  *     the same batch;
  *  2. the O(keys²) triangular pair-join + codegen Pearson + threshold/NaN
  *     policy runs per micro-batch via `foreachBatch`, reusing
  *     [[Correlations.correlatePackets]] verbatim — batch and streaming
  *     cannot drift semantically.
  *
  * `foreachBatch` (not a chained stateful operator) is the idiomatic Spark
  * pattern here: the pair-join is a pure batch computation over one window
  * slice and needs no state of its own, exactly like the reference computes
  * correlations from a fully-materialized per-window side input
  * (`View.asSingleton`, Demo:286-287).
  *
  * Scale notes: per micro-batch the join input is |keys| compact rows per
  * closed window — the quadratic pair space exists only inside whole-stage
  * codegen between join and threshold filter, as in the batch path. State
  * held by the streaming agg is one packet per (open window, key), evicted by
  * the watermark.
  */
object StreamingCorrelations {

  /** Append-mode stream of finalized per-(window, key) return packets. */
  def packetStream(
      returns: DataFrame,
      windowSize: String = "600 seconds",
      slide: String = "300 seconds",
      watermarkDelay: String = "0 seconds"): DataFrame =
    Correlations.packets(
      returns.withWatermark("ts", watermarkDelay), windowSize, slide)

  /** Start the full streaming correlation pipeline; `sink` receives the
    * correlation rows (schema == batch [[Correlations.correlate]]) computed
    * from each micro-batch's finalized packets.
    */
  def start(
      returns: DataFrame,
      windowSize: String = "600 seconds",
      slide: String = "300 seconds",
      watermarkDelay: String = "0 seconds",
      minCorr: Double = 0.5,
      propagateNaN: Boolean = false,
      includeUnderlying: Boolean = false)(sink: DataFrame => Unit): StreamingQuery =
    packetStream(returns, windowSize, slide, watermarkDelay)
      .writeStream
      .outputMode("append")
      .foreachBatch { (packets: DataFrame, _: Long) =>
        // pin this epoch's packets: the pair self-join reads them twice, and
        // re-executing a stateful streaming plan per side is both slow and
        // unsound; unpersist once the sink has consumed the batch
        val p = packets.persist()
        try sink(Correlations.correlatePackets(
          p, minCorr, propagateNaN, includeUnderlying, cache = false))
        finally p.unpersist()
      }
      .start()

  /** Replay a bounded return-point table (key/ts/ret) through the streaming
    * pipeline via MemoryStream, accumulating each micro-batch's correlations
    * into a temp parquet dir, and return them as a batch DataFrame. Sentinel
    * points two window-lengths past the data close every real window without
    * overlapping any (a lone key pairs with nothing, and is filtered anyway).
    */
  def replayBatch(
      returns: DataFrame,
      windowSize: String = "600 seconds",
      slide: String = "300 seconds",
      minCorr: Double = 0.5,
      propagateNaN: Boolean = false,
      sentinelKey: String = "__WM__",
      batches: Int = 16): DataFrame = {
    val spark = returns.sparkSession
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // chronological chunked feed — watermark advances per chunk, windows
    // close incrementally, agg state stays at one packet per open window
    val pts = returns.filter(col("ret").isNotNull).as[ReturnPoint]
      .collect().sortBy(_.ts.getTime).toSeq
    require(pts.nonEmpty, "replayBatch needs at least one return point")
    val maxTs = pts.last.ts.getTime
    val winMs = StreamingCandles.durationMicros(windowSize) / 1000L
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_corr_").toString

    val ms = MemoryStream[ReturnPoint]
    val q = start(ms.toDF(), windowSize, slide, "0 seconds", minCorr, propagateNaN) {
      df => df.write.mode("append").parquet(outDir)
    }
    try {
      // time-sliced chunks that never split equal timestamps: each batch's
      // rows are strictly later than the previous batch's max (= watermark),
      // so the streaming agg drops nothing as late
      val lo = pts.head.ts.getTime
      val span = math.max(1L, pts.last.ts.getTime - lo)
      val chunks = pts.groupBy(p =>
          math.min(batches - 1L, (p.ts.getTime - lo) * batches / span))
        .toSeq.sortBy(_._1).map(_._2)
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      ms.addData(ReturnPoint(sentinelKey, new Timestamp(maxTs + 2 * winMs), 0.0))
      q.processAllAvailable()
      ms.addData(ReturnPoint(sentinelKey, new Timestamp(maxTs + 2 * winMs + 1000L), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(outDir)
      .filter(col("key1") =!= sentinelKey && col("key2") =!= sentinelKey)
  }
}
