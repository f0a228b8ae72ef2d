package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for the streaming near-dup twin gap: runs batch
  * `Dedup.minHashLsh` and the `StreamingNearDup.replayBatch` twin on the
  * same documents table under identical in-process conditions (same JVM,
  * warmed codegen), printing the streaming side's per-stage epoch
  * decomposition. The in-command A/B ratio is the comparable number —
  * absolute times here are NOT full-sweep medians (cold-ish JIT, no
  * surrounding queries) and must not be compared against recorded sweeps.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * GRAFT_STREAM_BATCHES (default 3 — the gate's slicing).
  */
object NearDupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("GRAFT_STREAM_BATCHES", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def reset(): Unit = {
      operators.Caches.release(spark); spark.catalog.clearCache()
    }

    // warm-up: JIT + codegen over the small SF so neither side eats it
    noop(operators.Dedup.minHashLsh(
      Tables(spark, "/root/testdata/sf0.001", "documents"), minJaccard = 0.5))
    reset()

    val docs = Tables(spark, sfDir, "documents")
    // A/B/A/B: alternate unprofiled batch and stream runs so host drift
    // hits both sides; report per-pair ratios and the median
    val pairs = (1 to 3).map { i =>
      val tb0 = System.nanoTime()
      noop(operators.Dedup.minHashLsh(docs, minJaccard = 0.5))
      val b = (System.nanoTime() - tb0) / 1e9
      reset()
      val ts0 = System.nanoTime()
      noop(streaming.StreamingNearDup.replayBatch(docs, minJaccard = 0.5,
        batches = batches))
      val s = (System.nanoTime() - ts0) / 1e9
      reset()
      println(f"pair $i: batch $b%6.2f s  stream $s%6.2f s  ratio ${s / b}%.2f x")
      (b, s)
    }
    val ratios = pairs.map { case (b, s) => s / b }.sorted
    println(f"median ratio: ${ratios(ratios.size / 2)}%.2f x at $batches slices")

    // decomposition pass (profile actions inflate totals — stages only)
    val acc = scala.collection.mutable.LinkedHashMap[String, (Int, Double)]()
    val ts0 = System.nanoTime()
    noop(streaming.StreamingNearDup.replayBatch(docs, minJaccard = 0.5,
      batches = batches,
      profile = (st, s) => {
        val (c, t) = acc.getOrElse(st, (0, 0.0)); acc(st) = (c + 1, t + s)
      }))
    val streamSec = (System.nanoTime() - ts0) / 1e9
    val staged = acc.values.map(_._2).sum
    println(f"profiled stream total: $streamSec%8.2f s — stages:")
    acc.foreach { case (st, (c, t)) =>
      println(f"  $st%-12s $t%8.2f s  ($c epochs)")
    }
    println(f"  ${"residual"}%-12s ${streamSec - staged}%8.2f s  " +
      "(staging write + query start/stop + per-epoch commit + readback)")
    spark.stop()
  }
}
