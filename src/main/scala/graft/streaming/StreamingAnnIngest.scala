package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Similarity

/** Streaming ANN INGEST — the online form of the IVF index build behind
  * [[Similarity.ivfTopK]], and how a production vector store actually
  * works: the coarse quantizer is trained OFFLINE and held fixed; each
  * arriving embedding batch is assigned to its nearest centroid at ingest
  * (one broadcast pass over the batch — the expensive corpus-wide
  * assignment is amortized across arrivals) and appended to a persisted
  * inverted-list index; queries probe the index as it stands, never
  * re-scanning or re-assigning history.
  *
  * Semantics: assignment is ROW-LOCAL given the quantizer, so the final
  * index CONTENT is the set union of per-epoch assignments — equal to the
  * batch assignment of the full corpus for ANY epoch slicing — and a
  * probe over it runs [[Similarity.ivfProbe]] verbatim: result ==
  * `ivfTopK` by construction. The index storage is the same epoch-keyed
  * append + bounded compaction as the dedup gram index ([[GramIndex]]):
  * retry-idempotent epoch overwrites, crash-safe compaction, rows on
  * distributed storage — never the state store or the driver.
  */
object StreamingAnnIngest {

  private val idxSchema = StructType.fromDDL(
    "c_id BIGINT, vec_id BIGINT, v ARRAY<DOUBLE>, nrm DOUBLE")

  /** Replay a bounded embedding table through the ingest in `batches`
    * arrival slices (ascending `vec_id`), then answer `queries` from the
    * final index — the correctness gate (same oracle as `ann_ivf`).
    */
  def replayBatch(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      centroidEvery: Int = 40, nprobe: Int = 2,
      batches: Int = 4, compactEvery: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    // the offline-trained quantizer: same deterministic derivation as the
    // batch gate, materialized once and held fixed across epochs
    val cents = Similarity.ivfCentroids(corpus, centroidEvery).persist()
    cents.count()

    val in = corpus.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"))
    val staged = in.withColumn("__ts", timestamp_micros(col("vec_id")))
    val (chunk, _, _) = FileReplay.timeChunks(staged, "__ts", batches)
    val root = FileReplay.stage(staged, chunk, Seq.empty)
    val idxDir = Files.createDirectories(root.resolve("ivf"))
    val idx = new GramIndex(spark, idxDir, idxSchema, compactEvery)

    val q = FileReplay.source(spark, root, staged.schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        idx.compact(epoch)
        idx.append(
          Similarity.ivfAssign(batch.select("vec_id", "embedding"), cents)
            .select(col("c_id"), col("vec_id"), col("v"), col("nrm")),
          epoch)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    Similarity.ivfProbe(idx.read(Long.MaxValue), queries, k, cents, nprobe)
  }
}
