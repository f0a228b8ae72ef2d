package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the online form of
  * [[graft.operators.Dedup.exact]]: emit each dedup key the first time it is
  * seen, drop every later copy. The training-data-pipeline use is ingest-time
  * dedup: new crawl/event batches stream in continuously and only
  * first-occurrence rows flow downstream.
  *
  * Two state regimes, chosen by `withinWatermark`:
  *
  *  - `None` — global dedup via `dropDuplicates`: state holds every key ever
  *    seen and never evicts. Exact, but at 100 TB the state store must hold
  *    |distinct keys| entries (RocksDB-backed state scales to billions of
  *    keys per executor; still, unbounded).
  *  - `Some(delay)` — bounded-state dedup via `dropDuplicatesWithinWatermark`:
  *    keys are evicted once the watermark passes their event time + `delay`,
  *    so state is bounded by the key arrival rate × `delay`. A duplicate
  *    arriving later than `delay` after the first copy is re-emitted — the
  *    standard state/recall trade every streaming dedup makes.
  *
  * Output is projected to the key columns only, so the result is
  * deterministic (which physical copy survives within a micro-batch is not).
  */
object StreamingDedup {

  /** Apply streaming dedup to `stream` (must carry an event-time `tsCol`
    * when `withinWatermark` is set). Returns one row per first-seen key,
    * key columns only.
    */
  def dedup(stream: DataFrame, keys: Seq[String], tsCol: String = "ts",
      withinWatermark: Option[String] = None): DataFrame = {
    val deduped = withinWatermark match {
      case Some(delay) =>
        stream.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
      case None => stream.dropDuplicates(keys)
    }
    deduped.select(keys.map(col): _*)
  }

  /** Replay a bounded event table through the streaming dedup in `batches`
    * time-sliced micro-batches (FileReplay — no driver materialization) and
    * return the deduped keys as a batch frame. With `withinWatermark = None`
    * the result equals `SELECT DISTINCT <keys>` — the correctness gate for
    * the streaming path.
    */
  def replayBatch(events: DataFrame, keys: Seq[String], tsCol: String = "ts",
      batches: Int = 16, withinWatermark: Option[String] = None): DataFrame = {
    val spark = events.sparkSession
    val in = events.select((keys :+ tsCol).distinct.map(col): _*)
    val (chunk, _, _) = FileReplay.timeChunks(in, tsCol, batches)
    val root = FileReplay.stage(in, chunk, Seq.empty)
    FileReplay.run(spark, root, in.schema)(
      src => dedup(src, keys, tsCol, withinWatermark))
  }
}
