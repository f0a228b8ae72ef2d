package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Streaming INGEST into the manifest-versioned table
  * ([[graft.operators.Layout.commitVersion]]) — the online twin of the
  * batch time-travel gate: every micro-batch lands as one atomic commit
  * (immutable data files + a manifest naming everything visible), so
  * downstream readers only ever see complete versions, never a
  * half-written directory — exactly-once table publication from an
  * at-least-once sink callback, the property Delta's transaction log
  * provides and a bare parquet `writeStream` does not.
  *
  * Exactly-once mechanics: the version number is a pure function of the
  * engine's `batchId` (version = batchId + 1 — the file source here emits
  * one non-empty micro-batch per staged slice, so ids are gapless), and
  * the MANIFEST is the commit point. A retried or checkpoint-recovered
  * micro-batch re-arrives with the SAME batchId, sees its manifest already
  * present, and is skipped; a torn earlier attempt (data files written,
  * crash before the manifest) was never visible to any reader, so its
  * directory is cleared and the re-run recommits it. No driver-side
  * counter participates in the version assignment.
  *
  * Semantics: version k is the union of the first k micro-batches — a
  * consistent PREFIX snapshot (pinned by StreamingSpec across epoch
  * counts); the final version equals the batch table exactly, for any
  * slicing. Commit work per epoch is the epoch's own files plus a
  * metadata-sized manifest write on the driver.
  */
object StreamingVersionedIngest {

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(Comparator.reverseOrder[Path]())
      .forEach(f => Files.delete(f))
    finally s.close()
  }

  /** Idempotent batchId-keyed commit (exposed for direct retry testing):
    * version = batchId + 1, the manifest is the commit point. A re-arrival
    * of the same batchId is a no-op once its manifest exists; a torn
    * earlier attempt (data files, no manifest) was never visible to any
    * reader and is cleared before the recommit. Returns the version.
    */
  def commitBatch(df: DataFrame, dir: String, batchId: Long): Int = {
    // exact, not truncating: a batchId past Int.MaxValue (multi-year
    // checkpointed stream) must fail loudly, not wrap into a colliding
    // negative version that silently overwrites earlier manifests
    val v = Math.toIntExact(batchId + 1L)
    val manifest = Paths.get(s"$dir/_manifests/v$v.json")
    if (!Files.exists(manifest)) {
      val dataDir = Paths.get(s"$dir/v$v")
      if (Files.exists(dataDir)) deleteRecursively(dataDir)
      // commit EVERY batch, even an empty one — version numbers must stay
      // gapless for the parent-manifest chain
      Layout.commitVersion(df, dir, v)
    }
    v
  }

  /** Replay `events` through versioned commits in `batches` time-sliced
    * micro-batches; returns (tableDir, lastVersion). */
  def ingest(events: DataFrame, batches: Int): (String, Int) = {
    val spark = events.sparkSession
    val in = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val (chunk, _, _) = FileReplay.timeChunks(in, "ts", batches)
    val root = FileReplay.stage(in, chunk, Seq.empty)
    val dir = FileReplay.scratchDir("graft_stream_tt").toString
    val last = new AtomicInteger(0)
    FileReplay.withStreamConfs(spark, FileReplay.baselineConfs) {
      val q = FileReplay.source(spark, root, in.schema)
        .writeStream
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          val v = commitBatch(df, dir, batchId)
          last.updateAndGet(m => math.max(m, v))
          ()
        }
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    (dir, last.get())
  }

  /** Correctness gate: the FINAL version's aggregate — slice-count
    * independent, same oracle as the raw events table. */
  def replayBatch(events: DataFrame, batches: Int = 3): DataFrame = {
    val spark = events.sparkSession
    val (dir, last) = ingest(events, batches)
    Layout.readVersion(spark, dir, last).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("user_id")).as("n_users"),
      round(sum(col("value")), 4).as("sum_v"))
  }
}
