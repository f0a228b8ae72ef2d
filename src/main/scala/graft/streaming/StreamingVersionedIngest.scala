package graft.streaming

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
  * at-least-once file sink, the property Delta's transaction log provides
  * and a bare parquet `writeStream` does not.
  *
  * Semantics: version k is the union of the first k micro-batches — a
  * consistent PREFIX snapshot (pinned by StreamingSpec across epoch
  * counts); the final version equals the batch table exactly, for any
  * slicing. Commit work per epoch is the epoch's own files plus a
  * metadata-sized manifest write on the driver.
  */
object StreamingVersionedIngest {

  /** Replay `events` through versioned commits in `batches` time-sliced
    * micro-batches; returns (tableDir, lastVersion). */
  def ingest(events: DataFrame, batches: Int): (String, Int) = {
    val spark = events.sparkSession
    val in = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val (chunk, _, _) = FileReplay.timeChunks(in, "ts", batches)
    val root = FileReplay.stage(in, chunk, Seq.empty)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_tt").toString
    val version = new AtomicInteger(0)
    FileReplay.withStreamConfs(spark, FileReplay.baselineConfs) {
      val q = FileReplay.source(spark, root, in.schema)
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          if (!df.isEmpty)
            Layout.commitVersion(df, dir, version.incrementAndGet())
        }
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    (dir, version.get())
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
