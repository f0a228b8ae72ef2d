package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** SEASONALITY-AT-INGEST — the streaming twin of [[Behavior.seasonality]]:
  * each arriving micro-batch reduces to its (type, hour-of-week) slot
  * counts, written epoch-keyed (overwrite → retry-idempotent); the final
  * profile merges the per-epoch counts with one sum per slot and z-scores
  * the merged relation. Counts are associative, so the streamed profile is
  * IDENTICAL to the batch one under any slicing and shares its oracle.
  *
  * State: |types|×168 rows per epoch — no keyed state store at any scale;
  * a production deployment appends partials forever and re-merges on
  * demand, exactly the [[StreamingProfile]] compaction story.
  */
object StreamingSeasonality {

  def replay(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", batches: Int = 4): DataFrame = {
    val spark = events.sparkSession
    val (chunk, _, _) = FileReplay.timeChunks(events, tsCol, batches)
    val root = FileReplay.stage(events, chunk, Seq.empty)
    val outDir = Files.createDirectories(root.resolve("slots"))

    val q = FileReplay.source(spark, root, events.schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        Behavior.slotCounts(batch, typeCol, tsCol)
          .write.mode("overwrite")
          .parquet(outDir.resolve(f"epoch_$epoch%09d").toString)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val outs = {
      val s = Files.list(outDir)
      try s.iterator().asScala.map(_.toString).toList.sorted finally s.close()
    }
    val slots =
      if (outs.isEmpty) Behavior.slotCounts(events.limit(0), typeCol, tsCol)
      else spark.read.parquet(outs: _*)
        .groupBy(col(typeCol), col("how"))
        .agg(sum(col("n")).cast("long").as("n"))
    Behavior.seasonalityFromCounts(slots, typeCol)
  }
}
