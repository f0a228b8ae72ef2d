package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures whether fanning the single-row-group documents scan out to
  * session parallelism pays for the shingle/token-heavy operators: the
  * driver testdata parquet is ONE row group per table, so every stage-1
  * (scan + row-local transform + shuffle write) runs on one core no matter
  * what file-split configs say.
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.ScanFanProbe
  */
object ScanFanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = sources.Tables(spark, sfDir, "documents")
    println(s"documents scan partitions: ${docs.rdd.getNumPartitions}")
    // warm
    docs.write.format("noop").mode("overwrite").save()
    def drop(): Unit = {
      operators.Caches.release(spark); spark.catalog.clearCache()
    }
    // NOTE: with fanScan live in shingleRows, "as-is" IS the fanned form;
    // docs.coalesce(1) pins the unfanned baseline (fanScan sees 1 partition
    // but coalesce survives because fanScan only widens via repartition —
    // so compare docs (fanned) against a stash-toggled build for truth;
    // this probe now times curate, the one gate the gate-level A/B showed
    // consistently slower with the fan)
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .withColumnRenamed("doc_id", "bench_id")
    for (i <- 1 to 3) {
      time(s"[$i] curate") {
        operators.Curation.curate(docs, bench)
          .filter(col("doc_id") % 97 =!= 0)
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      time(s"[$i] dedup_ngram") {
        operators.Dedup.ngramJaccard(docs)
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      time(s"[$i] minhash lsh") {
        operators.Dedup.minHashLsh(docs)
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      // token-explode family: same starvation structure, cheaper per-byte
      // math (regex split, no md5) — is the fan worth it here too?
      time(s"[$i] bm25 as-is") {
        operators.TextAnalysis.bm25(docs, Seq("data", "model", "training"))
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      time(s"[$i] bm25 fanned") {
        operators.TextAnalysis.bm25(docs.repartition(32),
            Seq("data", "model", "training"))
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      time(s"[$i] zipf as-is") {
        operators.TextAnalysis.zipfFit(docs)
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      time(s"[$i] zipf fanned") {
        operators.TextAnalysis.zipfFit(docs.repartition(32))
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      // candle pipeline: does fanning the tick scan pay? (events is also
      // one row group; the map-side partial of the window agg runs there)
      val ticks = sources.Tables.eventsAsTicks(spark, sfDir)
      time(s"[$i] candles as-is") {
        operators.Candles.aggregate(ticks, "1 hour")
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      time(s"[$i] candles fanned ticks") {
        operators.Candles.aggregate(ticks.repartition(32), "1 hour")
          .write.format("noop").mode("overwrite").save()
      }
      drop()
      // wav synthesize+decode: fan regressed the sf0.1 gate 1.18->1.96 in
      // the record sweeps. Direct driver-side thread test: if
      // javax.sound's AudioSystem provider registry serializes under
      // concurrency, 32 threads will NOT be ~32x one thread
      def synthN(ids: Range): Unit = ids.foreach { id =>
        val rate = (8000L + (id % 8L) * 1000L).toInt
        val ch = (1L + id % 2L).toInt
        val frames = (500L + (id * 13L) % 2000L).toInt
        val bytes = operators.Multimodal.synthesizeWav(rate, ch, frames)
        assert(bytes.length > 44)
      }
      time(s"[$i] wav synth 5000 on 1 thread") { synthN(0 until 5000) }
      time(s"[$i] wav synth 5000 on 32 threads") {
        val ts = (0 until 32).map { t =>
          new Thread(() => synthN((t * 157) until ((t + 1) * 157)))
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      // javax encode control: the registry-serialization measurement that
      // forced the WAV table unfanned in r12 — kept as the A side now that
      // synthesizeWav is the hand-rolled lock-free writer (B side above)
      def synthJavaxN(ids: Range): Unit = ids.foreach { id =>
        val bytes = operators.Multimodal.synthesizeWavJavax(
          (8000L + (id % 8L) * 1000L).toInt, (1L + id % 2L).toInt,
          (500L + (id * 13L) % 2000L).toInt)
        assert(bytes.length > 44)
      }
      time(s"[$i] wav synth JAVAX 5000 on 1 thread") { synthJavaxN(0 until 5000) }
      time(s"[$i] wav synth JAVAX 5000 on 32 threads") {
        val ts = (0 until 32).map { t =>
          new Thread(() => synthJavaxN((t * 157) until ((t + 1) * 157)))
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      // DECODE A/B (the r12 verdict's open question): does
      // AudioSystem.getAudioFileFormat — which walks the same provider
      // registry per call — serialize like the encode did? And the
      // hand-rolled RIFF parse control on identical payloads.
      val wavs = (0 until 5000).map { id =>
        operators.Multimodal.synthesizeWav(
          (8000L + (id % 8L) * 1000L).toInt, (1L + id % 2L).toInt,
          (500L + (id * 13L) % 2000L).toInt)
      }.toArray
      def decodeJavaxN(ids: Range): Unit = ids.foreach { id =>
        assert(operators.Multimodal.decodeWavJavax(wavs(id % 5000)).isDefined)
      }
      def decodeRiffN(ids: Range): Unit = ids.foreach { id =>
        assert(operators.Multimodal.parseWavHeader(wavs(id % 5000)).isDefined)
      }
      time(s"[$i] wav decode JAVAX 5000 on 1 thread") { decodeJavaxN(0 until 5000) }
      time(s"[$i] wav decode JAVAX 5000 on 32 threads") {
        val ts = (0 until 32).map { t =>
          new Thread(() => decodeJavaxN((t * 157) until ((t + 1) * 157)))
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      time(s"[$i] wav decode RIFF 5000 on 1 thread") { decodeRiffN(0 until 5000) }
      time(s"[$i] wav decode RIFF 5000 on 32 threads") {
        val ts = (0 until 32).map { t =>
          new Thread(() => decodeRiffN((t * 157) until ((t + 1) * 157)))
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      time(s"[$i] wav gate (fanned build)") {
        operators.Multimodal.extractAudioFeatures(
            operators.Multimodal.wavMediaTable(docs, "doc_id"))
          .toDF().write.format("noop").mode("overwrite").save()
      }
      drop()
    }
    spark.stop()
  }
}
