package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Online exact-substring EXCISION over an arriving document stream — the
  * streaming form of [[Dedup.exciseDuplicateSpans]], and the dedup-at-ingest
  * shape a training-data pipeline runs in production: every arriving
  * document is cleaned against the whole corpus seen so far, at arrival
  * time, without re-scanning that corpus and without ever revisiting an
  * already-emitted document.
  *
  * Per micro-batch (`foreachBatch`):
  *
  *  1. positional w-grams of the batch's documents via the SAME
  *     [[Dedup.spanGrams]] code as batch — no drift;
  *  2. an occurrence is excised iff an EARLIER occurrence of its gram
  *     exists: either the gram key is in the append-only GRAM-KEY INDEX of
  *     all prior epochs (left-semi probe — touches only matching keys), or
  *     an earlier (doc_id, pos) of the same new gram sits in this batch
  *     (the batch-local keep-first, the same skew-safe `min(struct)` hash
  *     agg as batch — never a sort-rank);
  *  3. the shared interval-union + token-filter tail
  *     ([[Dedup.cleanFromExcised]]) emits each doc's cleaned row ONCE, in
  *     its arrival epoch — epoch-keyed overwrite, so a retried batch is
  *     idempotent;
  *  4. the batch's NEW distinct gram keys are appended to the index.
  *
  * Because epochs replay in ascending `doc_id` order, "an earlier
  * occurrence exists" coincides exactly with the batch operator's corpus-
  * global keep-first — so the union of per-epoch outputs EQUALS batch
  * `exciseDuplicateSpans` regardless of slicing, which the `stream_excise`
  * gate proves against the same DuckDB oracle as `dedup_excise`.
  *
  * WHY excision streams exactly while the span STATS cannot: excision's
  * per-occurrence decision ("does an earlier occurrence exist?") is
  * MONOTONE — later arrivals never change it, so each doc's output is
  * final at arrival. `duplicateSpans`/`duplicateSpanRuns` are not: a doc
  * arriving later can turn an already-emitted doc's unique gram into a
  * duplicated one, retroactively changing that doc's counts. Their online
  * form would need either retraction (update-mode re-emission of amended
  * rows) or end-of-stream finalization — both legitimate, neither equal to
  * the batch relation mid-stream. The engine therefore streams the
  * operator whose semantics admit it and keeps the stats batch-only,
  * rather than shipping a twin that silently under-counts until the
  * stream ends.
  *
  * Scale notes (unbounded stream): state is the distinct-gram-key index —
  * the MINIMAL state this semantics admits, one compact string row per
  * distinct w-gram ever seen, on distributed storage (never the state store
  * or driver). Each epoch costs one semi/anti probe of the index (bucketed
  * by `k` in production ⇒ exchange-free on the index side), one batch-local
  * hash agg, and one append of new keys. Directory count is bounded by the
  * same compact-every-K fold as [[StreamingNearDup]] (tmp → atomic rename →
  * delete, crash-safe; double-reads are absorbed because index rows are
  * set-like and the probe is a semi-join).
  */
object StreamingSpanDedup {

  private val outSchema = StructType.fromDDL(
    "doc_id BIGINT, n_tokens BIGINT, n_removed BIGINT, text_clean STRING")

  private val idxSchema = StructType.fromDDL("k STRING")

  /** Replay a bounded document table through the online excision pipeline
    * in `batches` arrival slices (ascending `idCol`) and return every doc's
    * cleaned row. Result == `Dedup.exciseDuplicateSpans` on the same table,
    * by construction.
    */
  def replayBatch(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", w: Int = 8,
      batches: Int = 4, compactEvery: Int = 8,
      inspect: Path => Unit = _ => ()): DataFrame = {
    val spark = docs.sparkSession
    val in = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    // documents carry no event time: arrival order is the doc_id (monotone,
    // unique), turned into a synthetic timestamp for the shared chunker
    val staged = in.withColumn("__ts", timestamp_micros(col("doc_id")))
    val (chunk, _, _) = FileReplay.timeChunks(staged, "__ts", batches)
    val root = FileReplay.stage(staged, chunk, Seq.empty)

    val idxDir = Files.createDirectories(root.resolve("idx"))
    val outDir = Files.createDirectories(root.resolve("out"))

    // index semantics (incl. the strictly-before-epoch probe a retried
    // epoch relies on, and the crash-safe compaction fold) live in the
    // shared GramIndex, which StreamingNovelty probes identically
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
            // seen-before grams: every batch occurrence is excised
            val inIdx = g.join(seen, Seq("k"), "left_semi")
            // new grams: batch-local keep-first (min struct per key), the
            // rest excised — identical semantics to the batch operator's
            // corpus-global keep-first because epochs ascend by doc_id
            val fresh = g.join(seen, Seq("k"), "left_anti").persist()
            try {
              // only batch-duplicated new grams matter (cnt ≥ 2): singles
              // trivially keep their sole occurrence — filtering here keeps
              // the join payload proportional to actual duplication
              val keep = fresh.groupBy("k")
                .agg(count(lit(1)).as("cnt"),
                  min(struct(col("doc_id"), col("pos"))).as("first"))
                .filter(col("cnt") >= 2).select("k", "first")
              val freshEx = fresh.join(keep, "k")
                .filter(!(col("doc_id") === col("first.doc_id") &&
                  col("pos") === col("first.pos")))
                .select(col("doc_id"), col("pos"))
              val ex = inIdx.select(col("doc_id"), col("pos"))
                .unionByName(freshEx)
                .select(col("doc_id"), col("pos").cast("long").as("s"),
                  (col("pos") + lit(w - 1)).cast("long").as("e"))
              // each doc emits ONCE, in its arrival epoch — overwrite makes
              // a retried epoch idempotent
              Dedup.cleanFromExcised(
                  b.select(col("doc_id"),
                    graft.operators.TextAnalysis.tokens(col("text")).as("toks")),
                  ex)
                .write.mode("overwrite")
                .parquet(outDir.resolve(f"epoch_$epoch%09d").toString)
              // ONE index append per epoch: this batch's new distinct keys
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
