package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ReturnPoint
import graft.operators.{Candles, Correlations}
import graft.sources.Tables
import graft.streaming.{FileReplay, StreamingCandles, StreamingCorrelations}

/** Stage-decomposition measurement for the two streaming twins the bench
  * flags as ratio-heavy against their (now faster) batch denominators:
  * stream_corr and stream_candles. Splits each replay into
  * upstream-derivation → stage write → stream run (and for corr, the
  * stream run with and without the per-epoch pair join), so the recorded
  * floor in BASELINE.md states exactly which component the replay pays
  * that the batch twin does not. Measurement tooling, not a gate.
  */
object ReplayProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[replay-profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    // JVM warm-up on the small SF (untimed)
    noop(Candles.aggregate(Tables.eventsAsTicks(spark, "/root/testdata/sf0.001"), "1 hour"))

    val batches = sys.env.getOrElse("GRAFT_STREAM_BATCHES", "3").toInt
    println(s"[replay-profile] sf=$sfDir batches=$batches cpus=$cpus stateParts=${FileReplay.defaultStateParts}")

    // ================================================== stream_corr
    val ticks = Tables.eventsAsTicks(spark, sfDir)
    val returns = Correlations.logReturns(Candles.aggregate(ticks, "1 hour"))
    t("corr: upstream candles+returns (batch)")(noop(returns))

    val b = Tables(spark, sfDir, "events")
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val win = StreamingCandles.durationMicros("1 hour")
    def closeT(x: Long) = Candles.closeTimeMicros(x, win)
    val (lo, hi) = (closeT(b.getLong(0)), closeT(b.getLong(1)))

    // stage write exactly as replayBatch does with supplied bounds
    val pts = returns.filter(col("ret").isNotNull)
      .select(col("key"), col("ts"), col("ret"))
    val corrWinMs = StreamingCandles.durationMicros("6 hours") / 1000L
    val sentinels = Seq(
      ReturnPoint("__WM__", new Timestamp(hi / 1000L + 2 * corrWinMs), 0.0),
      ReturnPoint("__WM__", new Timestamp(hi / 1000L + 2 * corrWinMs + 1000L), 0.0))
    var root: java.nio.file.Path = null
    t("corr: stage write (incl upstream run)") {
      root = FileReplay.stage(pts,
        FileReplay.chunksFor("ts", lo, hi, batches),
        sentinels.map(p => spark.createDataset(Seq(p)).toDF()))
    }

    // per-micro-batch phase breakdown straight from the engine's progress
    // events: addBatch (the actual work) vs the harness bookkeeping
    // (offset log, planning, commit)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        def ms(k: String) = Option(d.get(k)).map(_.longValue).getOrElse(0L)
        println(s"[replay-profile]   epoch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerMs=${ms("triggerExecution")} addBatch=${ms("addBatch")} " +
          s"getBatch=${ms("getBatch")} latestOffset=${ms("latestOffset")} " +
          s"planning=${ms("queryPlanning")} walCommit=${ms("walCommit")} " +
          s"commitOffsets=${ms("commitOffsets")} " +
          s"stateCommitMs=${p.stateOperators.map(s => Option(s.customMetrics.get("commitTimeMs")).map(_.longValue).getOrElse(0L)).sum}")
      }
    }
    spark.streams.addListener(listener)

    // packet-agg-only stream: same harness, sink discards the (lazy) pair
    // join — isolates source+watermark-agg+state+persist fixed cost
    val joinParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    t("corr: stream run, pair join SKIPPED") {
      FileReplay.withStreamConfs(spark, Map(
        "spark.sql.shuffle.partitions" -> FileReplay.defaultStateParts.toString)) {
        val q = StreamingCorrelations.start(
          FileReplay.source(spark, root, pts.schema),
          "6 hours", "3 hours", "0 seconds", 0.4999,
          keyBlocks = 8, joinParallelism = Some(joinParts))(_ => ())
        try q.processAllAvailable() finally q.stop()
      }
    }

    // per-epoch pair-join timing inside a full run (fresh staging dir so
    // the two runs cannot share source offsets)
    var root2: java.nio.file.Path = null
    t("corr: stage write #2") {
      root2 = FileReplay.stage(pts,
        FileReplay.chunksFor("ts", lo, hi, batches),
        sentinels.map(p => spark.createDataset(Seq(p)).toDF()))
    }
    val outDir = root2.resolve("out").toString
    t("corr: stream run, pair join + parquet sink") {
      FileReplay.withStreamConfs(spark, Map(
        "spark.sql.shuffle.partitions" -> FileReplay.defaultStateParts.toString)) {
        val q = StreamingCorrelations.start(
          FileReplay.source(spark, root2, pts.schema),
          "6 hours", "3 hours", "0 seconds", 0.4999,
          keyBlocks = 8, joinParallelism = Some(joinParts)) { df =>
          val s0 = System.nanoTime()
          df.write.mode("append").parquet(outDir)
          println(f"[replay-profile]   corr epoch sink (join+write) ${(System.nanoTime() - s0) / 1e9}%8.3f s")
        }
        try q.processAllAvailable() finally q.stop()
      }
    }

    // batch twin reference (the gate denominator, minus oracle projection)
    t("corr: BATCH twin fx_corr-equivalent") {
      noop(Correlations.correlate(returns, "6 hours", "3 hours",
        minCorr = 0.4999))
    }

    // ================================================== stream_candles
    t("candles: BATCH twin aggregate+carry") {
      noop(Candles.flatten(Candles.aggregate(ticks, "1 hour")))
    }
    t("candles: full replayBatch (gate shape)") {
      noop(Candles.flatten(
        StreamingCandles.replayBatch(ticks, "1 hour", batches = batches)))
    }

    spark.stop()
  }
}
