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
}
