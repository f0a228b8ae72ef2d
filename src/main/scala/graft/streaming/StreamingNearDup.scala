package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Online MinHash near-dup detection over an ARRIVING document stream —
  * the streaming form of [[Dedup.minHashLsh]], and the shape a training-data
  * ingest pipeline actually runs: every new document must be checked against
  * the whole corpus seen so far, without ever re-scanning that corpus.
  *
  * Per micro-batch (`foreachBatch`):
  *
  *  1. shingle + MinHash-band the batch's documents with the SAME
  *     `Dedup.minHashSignatures`/`bandRows` code as batch — no drift;
  *  2. candidates = the batch's band rows equi-joined against the
  *     append-only BAND INDEX of all earlier documents, plus the
  *     within-batch triangular self-join. The index join touches only
  *     colliding band buckets — the arriving batch never scans the corpus;
  *  3. exact Jaccard over the full shingle sets (shared
  *     `Dedup.verifyJaccard`) decides ≥ `minJaccard`;
  *  4. the batch's band rows and shingle sets are APPENDED to the index —
  *     epoch-keyed directory writes, so a retried batch overwrites itself
  *     (idempotent) instead of double-appending.
  *
  * A pair is emitted exactly once: when its LATER member arrives. Over a
  * bounded replay the emitted pair set therefore equals the batch
  * `minHashLsh` result REGARDLESS of how the stream is sliced — which is
  * what the `stream_minhash` gate proves against the same DuckDB oracle as
  * `dedup_minhash`.
  *
  * Scale notes (100 TB corpus, unbounded stream): state is the band index —
  * O(corpus × numBands) compact rows on DISTRIBUTED storage, not in the
  * state store and never on the driver; each micro-batch's work is
  * |batch bands| probing a bucketed join plus exact verification of the few
  * colliding pairs. In production the index lives in a bucketed/partitioned
  * table (bucket by (band, bkey) → the probe is exchange-free on the index
  * side); here it is plain parquet, re-planned per batch.
  */
object StreamingNearDup {

  /** Replay a bounded document table through the online near-dup pipeline
    * in `batches` arrival slices (ascending `idCol` — the synthetic arrival
    * order) and return all emitted pairs. Result == `Dedup.minHashLsh` on
    * the same table, by construction.
    */
  def replayBatch(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, numHashes: Int = 32,
      numBands: Int = 8, minJaccard: Double = 0.5,
      batches: Int = 4): DataFrame = {
    val spark = docs.sparkSession

    val in = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    // documents carry no event time: arrival order is the id (monotone,
    // unique), turned into a synthetic timestamp for the shared chunker
    val staged = in.withColumn("__ts", timestamp_micros(col("id")))
    val (chunk, _, _) = FileReplay.timeChunks(staged, "__ts", batches)
    val root = FileReplay.stage(staged, chunk, Seq.empty)

    val bandsIdx = Files.createDirectories(root.resolve("bands_idx"))
    val shIdx = Files.createDirectories(root.resolve("sh_idx"))
    val pairsDir = Files.createDirectories(root.resolve("pairs"))

    def epochDirs(d: Path): Seq[String] = {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.toString).toList.sorted finally s.close()
    }
    def readIdx(d: Path, schema: StructType): DataFrame = {
      val dirs = epochDirs(d)
      if (dirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.parquet(dirs: _*)
    }

    val q = FileReplay.source(spark, root, staged.schema)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val b = batch.select(col("id"), col("text")).persist()
        try {
          val sh = Dedup.shingleRows(b, "text", "id", n).persist()
          val bands = Dedup.bandRows(
            Dedup.minHashSignatures(sh, numHashes), numHashes, numBands)
            .persist()
          try {
            // read the index BEFORE appending this batch: cross-candidates
            // pair old × new only, within-batch pairs come from the
            // triangular self-join — each unordered pair found once
            val seenBands = readIdx(bandsIdx, bands.schema)
            val within = bands.as("a").join(bands.as("b"),
                col("a.band") === col("b.band") &&
                  col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
              .select(col("a.id").as("id1"), col("b.id").as("id2"))
            val cross = seenBands.as("a").join(bands.as("b"),
                col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
              .select(least(col("a.id"), col("b.id")).as("id1"),
                greatest(col("a.id"), col("b.id")).as("id2"))
            // pinned: read three times below (id list ×2 sides + join probe)
            val cand = within.unionByName(cross).distinct().persist()
            try {
              // restrict the shingle index to the candidates' ids BEFORE the
              // exact verify: verifyJaccard aggregates sizes over its whole
              // input, and feeding it the full accumulated index would re-
              // aggregate the corpus every batch — the semi-join keeps
              // per-batch verify work proportional to band collisions, not
              // corpus size (in production the index is bucketed by id,
              // making this probe scan-free too)
              val candIds = cand.select(col("id1").as("id"))
                .unionByName(cand.select(col("id2").as("id"))).distinct()
              val shNeeded = readIdx(shIdx, sh.schema).unionByName(sh)
                .join(broadcast(candIds), "id")
              Dedup.verifyJaccard(cand, shNeeded, minJaccard)
                .write.mode("overwrite")
                .parquet(pairsDir.resolve(f"epoch_$epoch%09d").toString)
            } finally cand.unpersist()
            bands.write.mode("overwrite")
              .parquet(bandsIdx.resolve(f"epoch_$epoch%09d").toString)
            sh.write.mode("overwrite")
              .parquet(shIdx.resolve(f"epoch_$epoch%09d").toString)
          } finally { bands.unpersist(); sh.unpersist() }
        } finally b.unpersist()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val outs = epochDirs(pairsDir)
    if (outs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Nil))
    else spark.read.parquet(outs: _*)
  }
}
