package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Online corpus-order NOVELTY scoring — the streaming form of
  * [[Dedup.corpusNovelty]], and the admission gate a training-data ingest
  * runs in production: every arriving document is priced ("how much of
  * this is new text?") against the whole corpus seen so far, at arrival
  * time, without re-scanning that corpus.
  *
  * WHY novelty streams exactly while the duplicate-span STATS cannot
  * (contrast [[StreamingSpanDedup]]'s scaladoc): a doc's novelty references
  * only EARLIER docs — `first_doc < doc_id` — so under ascending-`doc_id`
  * replay every input to the decision has already arrived, the decision is
  * MONOTONE-FINAL, and the union of per-epoch outputs equals the batch
  * relation under any slicing. `dup_ratio` by contrast references later
  * docs too (a future duplicate retroactively flips an earlier doc's
  * counts), which is exactly why the engine streams excision and novelty
  * but keeps the span stats batch-only.
  *
  * Per micro-batch (`foreachBatch`):
  *
  *  1. positional w-grams via the SAME [[Dedup.spanGrams]] code as batch;
  *  2. an occurrence is STALE iff its gram key is in the shared
  *     [[GramIndex]] of prior epochs (left-semi probe) or an in-batch doc
  *     with a SMALLER id carries the gram (batch-local `min(doc_id)` per
  *     key — a hash agg with map-side partials, never a sort). Intra-doc
  *     repeats stay novel, exactly like batch;
  *  3. per-doc `(n_pos, n_stale_pos, novelty)` rows are written once, in
  *     the doc's arrival epoch — epoch-keyed overwrite, retry-idempotent;
  *  4. the batch's new distinct gram keys are appended to the index.
  *
  * Scale notes: state is the same distinct-gram-key index excision keeps
  * (one compact row per distinct w-gram, distributed storage, bounded
  * directory count via [[GramIndex.compact]]); a deployment running BOTH
  * operators at ingest shares one physical index — the probe contract is
  * identical.
  */
object StreamingNovelty {

  private val outSchema = StructType.fromDDL(
    "doc_id BIGINT, n_pos BIGINT, n_stale_pos BIGINT, novelty DOUBLE")

  private val idxSchema = StructType.fromDDL("k STRING")

  /** Replay a bounded document table through the online novelty scorer in
    * `batches` arrival slices (ascending `idCol`) and return every doc's
    * score row. Result == [[Dedup.corpusNovelty]] on the same table, by
    * construction.
    */
  def replayBatch(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", w: Int = 8,
      batches: Int = 4, compactEvery: Int = 8,
      inspect: Path => Unit = _ => ()): DataFrame = {
    val spark = docs.sparkSession
    val in = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val staged = in.withColumn("__ts", timestamp_micros(col("doc_id")))
    val (chunk, _, _) = FileReplay.timeChunks(staged, "__ts", batches)
    val root = FileReplay.stage(staged, chunk, Seq.empty)

    val idxDir = Files.createDirectories(root.resolve("idx"))
    val outDir = Files.createDirectories(root.resolve("out"))
    val idx = new GramIndex(spark, idxDir, idxSchema, compactEvery)
    def epochDirs(d: Path): Seq[String] = {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.toString).toList.sorted finally s.close()
    }

    val q = FileReplay.source(spark, root, staged.schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        idx.compact(epoch)
        val b = batch.select(col("doc_id"), col("text")).persist()
        try {
          val g = Dedup.spanGrams(b, "text", "doc_id", w, fan = false).persist()
          try {
            val seen = idx.read(epoch)
            // seen-before grams: every batch occurrence is stale
            val staleIdx = g.join(seen, Seq("k"), "left_semi")
              .select(col("doc_id"), col("pos"))
            // new grams: stale iff a smaller in-batch doc carries the key
            // (identical to batch `first_doc < doc_id` because epochs
            // ascend by doc_id)
            val fresh = g.join(seen, Seq("k"), "left_anti").persist()
            try {
              val firstLocal = fresh.groupBy("k")
                .agg(min(col("doc_id")).as("first_doc"))
              val staleLocal = fresh.join(firstLocal, "k")
                .filter(col("first_doc") < col("doc_id"))
                .select(col("doc_id"), col("pos"))
              val stale = staleIdx.unionByName(staleLocal)
                .groupBy("doc_id").agg(count(lit(1)).as("n_stale_pos"))
              g.groupBy("doc_id").agg(count(lit(1)).as("n_pos"))
                .join(stale, Seq("doc_id"), "left")
                .select(col("doc_id"), col("n_pos"),
                  coalesce(col("n_stale_pos"), lit(0L)).as("n_stale_pos"))
                .withColumn("novelty", round(
                  (col("n_pos") - col("n_stale_pos")).cast("double") /
                    col("n_pos"), 6))
                .write.mode("overwrite")
                .parquet(outDir.resolve(f"epoch_$epoch%09d").toString)
              idx.append(fresh.select(col("k")).distinct(), epoch)
            } finally fresh.unpersist()
          } finally g.unpersist()
        } finally b.unpersist()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    inspect(root)

    val outs = epochDirs(outDir)
    if (outs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    else spark.read.parquet(outs: _*)
  }
}
