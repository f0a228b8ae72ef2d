package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** ACTIVE-USERS-AT-INGEST — the streaming twin of
  * [[Behavior.rollingActive]]: each arriving micro-batch collapses to its
  * distinct (day, user) pairs, written epoch-keyed (overwrite →
  * retry-idempotent); the final rolling-actives profile re-distincts the
  * appended pair relation and runs the same contribution explode. Distinct
  * pair SETS are associative under union, so the streamed profile is
  * IDENTICAL to the batch one under any slicing and shares its oracle.
  *
  * State: per-epoch pairs are bounded by that epoch's own traffic (first
  * sight per (day, user) within the batch); the persisted relation grows
  * with |users|×|active days| — the same compact relation the batch
  * operator builds, never the raw event stream.
  */
object StreamingActive {

  def replay(events: DataFrame, windowDays: Int = 7,
      userCol: String = "user_id", tsCol: String = "ts",
      batches: Int = 4): DataFrame = {
    val spark = events.sparkSession
    val (chunk, _, _) = FileReplay.timeChunks(events, tsCol, batches)
    val root = FileReplay.stage(events, chunk, Seq.empty)
    val outDir = Files.createDirectories(root.resolve("pairs"))

    val q = FileReplay.source(spark, root, events.schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        batch
          .select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
          .distinct()
          .write.mode("overwrite")
          .parquet(outDir.resolve(f"epoch_$epoch%09d").toString)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val outs = {
      val s = Files.list(outDir)
      try s.iterator().asScala.map(_.toString).toList.sorted finally s.close()
    }
    val du =
      if (outs.isEmpty)
        events.limit(0)
          .select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
      else spark.read.parquet(outs: _*).distinct()
    Behavior.rollingActiveFromPairs(du, windowDays)
  }
}
