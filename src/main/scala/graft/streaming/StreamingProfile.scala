package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** PROFILE-AT-INGEST — the streaming twin of [[Profiling.tableProfile]]:
  * each arriving micro-batch reduces to ONE mergeable partial-profile row
  * ([[Profiling.partialProfile]]: counts, numeric ranges, one DataSketches
  * HLL sketch per column), written epoch-keyed (overwrite → retry-
  * idempotent); the final profile is [[Profiling.mergeProfiles]] over the
  * |epochs|-row partial relation.
  *
  * Why this is the right streaming shape: every partial component is
  * associative AND commutative (counts add, ranges min/max, HLL registers
  * max-merge), so the merged profile is IDENTICAL under any slicing of the
  * input — the exact facts hash-match the same DuckDB oracle as a batch
  * profile, and even the HLL estimate matches the batch sketch exactly
  * (register state depends only on the value SET, not arrival order),
  * which ProfilingSpec pins across different slice counts.
  *
  * Scale notes: NO keyed state store at any scale — the only state is the
  * per-epoch partial row (a few KB of sketch per column). A production
  * deployment keeps appending partials forever and re-merges on demand;
  * compaction is one merge job over the partial relation itself.
  */
object StreamingProfile {

  /** Replay a bounded table through the ingest profiler in `batches`
    * event-time slices and return the merged profile. Result facts ==
    * batch [[Profiling.tableProfile]] on the same table, by construction.
    */
  def replayBatch(df: DataFrame, tsCol: String, cols: Seq[String],
      batches: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val (chunk, _, _) = FileReplay.timeChunks(df, tsCol, batches)
    val root = FileReplay.stage(df, chunk, Seq.empty)
    val outDir = Files.createDirectories(root.resolve("partials"))

    val q = FileReplay.source(spark, root, df.schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        Profiling.partialProfile(batch, cols)
          .write.mode("overwrite")
          .parquet(outDir.resolve(f"epoch_$epoch%09d").toString)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val outs = {
      val s = Files.list(outDir)
      try s.iterator().asScala.map(_.toString).toList.sorted finally s.close()
    }
    val partials =
      if (outs.isEmpty) Profiling.partialProfile(df.limit(0), cols)
      else spark.read.parquet(outs: _*)
    Profiling.mergeProfiles(partials, cols)
  }

  /** DRIFT-AT-INGEST — the streaming twin of [[Profiling.psiDrift]]: the
    * reference side is a fixed batch relation (last month's corpus);
    * the current side ARRIVES, and each micro-batch appends its clamped
    * bin counts (epoch-keyed overwrite, retry-idempotent). The final PSI
    * merges the per-epoch counts with one per-bin sum — bin counts are
    * associative, so the streamed result is IDENTICAL to batch
    * [[Profiling.psiDrift]] under any slicing and shares its oracle.
    * State: |bins| rows per epoch — no keyed state store.
    */
  def replayDrift(ref: DataFrame, cur: DataFrame, tsCol: String,
      valueCol: String, lo: Double, hi: Double, bins: Int,
      batches: Int = 4, eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val spark = cur.sparkSession
    val (chunk, _, _) = FileReplay.timeChunks(cur, tsCol, batches)
    val root = FileReplay.stage(cur, chunk, Seq.empty)
    val outDir = Files.createDirectories(root.resolve("bins"))

    val q = FileReplay.source(spark, root, cur.schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        Profiling.binCounts(batch, valueCol, lo, hi, bins, "n_cur")
          .write.mode("overwrite")
          .parquet(outDir.resolve(f"epoch_$epoch%09d").toString)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val outs = {
      val s = Files.list(outDir)
      try s.iterator().asScala.map(_.toString).toList.sorted finally s.close()
    }
    val curCounts =
      if (outs.isEmpty) Profiling.binCounts(cur.limit(0), valueCol, lo, hi, bins, "n_cur")
      else spark.read.parquet(outs: _*)
        .groupBy("bin").agg(sum(col("n_cur")).cast("long").as("n_cur"))
    Profiling.psiFromCounts(
      Profiling.binCounts(ref, valueCol, lo, hi, bins, "n_ref"),
      curCounts, bins, eps)
  }
}
