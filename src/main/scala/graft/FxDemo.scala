package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixtures.SampleData
import graft.operators.{Bpe, Candles, Correlations, Dedup, Rolling, Sampling, TextAnalysis}
import graft.sources.Tables

/** End-to-end demo — the library-surface equivalent of the reference's
  * `FXTimeSeriesPipelineDemo.java:83-351`: ticks → 120 s OHLC candles with
  * gap-fill + carry-forward → log-returns → sliding-window (600 s / 300 s)
  * all-pairs Pearson correlations, θ = 0.5.
  *
  * Runs on the deterministic 42-tick fixture, then on the driver testdata
  * `events` table (arg 1 = sf dir, default sf0.001) mapped to ticks.
  */
object FxDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-fx-demo")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("=== fixture: 42 ticks, 5 series ===")
    val ticks = SampleData.dataset(spark).toDF()
    val candles = Candles.aggregate(ticks, "120 seconds", Some(SampleData.Keys))
    Candles.flatten(candles).orderBy("key", "closeTime").show(30, false)
    val corrs = Correlations.fromCandles(candles)
    corrs.orderBy("windowStart", "key1", "key2").show(50, false)

    println(s"=== events table as ticks ($sfDir) ===")
    val evTicks = Tables.eventsAsTicks(spark, sfDir)
    val evCandles = Candles.aggregate(evTicks, "1 hour")
    println(s"event candles: ${evCandles.count()}")
    Candles.flatten(evCandles).orderBy("key", "closeTime").show(5, false)
    val evCorrs = Correlations.fromCandles(evCandles, "6 hours", "3 hours", minCorr = 0.3)
    println(s"event correlations (|r|>=0.3): ${evCorrs.count()}")
    evCorrs.orderBy(abs(col("corr")).desc).show(5, false)

    println("=== derived indicators (U0) ===")
    Rolling.stats(evCandles, "key", "closeTime", col("close.askPrice"), 4)
      .filter(col("key") === "U0").orderBy("closeTime").show(3, false)
    Rolling.drawdown(evCandles, "key", "closeTime", col("close.askPrice"))
      .filter(col("key") === "U0").orderBy("closeTime").show(3, false)
    Candles.rollUp(Candles.flatten(evCandles), "6 hours")
      .filter(col("key") === "U0").orderBy("closeTime").show(3, false)

    println(s"=== training-data pipeline ($sfDir documents) ===")
    val docs = Tables(spark, sfDir, "documents")
    val pairs = Dedup.minHashLsh(docs, minJaccard = 0.5)
    val kept = Dedup.survivors(docs, pairs.select(col("id1"), col("id2")))
    println(s"docs: ${docs.count()}, near-dup pairs: ${pairs.count()}, " +
      s"survivors: ${kept.count()}")
    val sampled = Sampling.bernoulli(kept, col("doc_id"), 0.1)
    println(s"10% deterministic sample of survivors: ${sampled.count()}")
    val merges = Bpe.train(docs, steps = 4)
    println("4 BPE merges learned from the corpus:")
    merges.orderBy("step").show(4, false)
    val novelty = Dedup.corpusNovelty(docs)
    println("least-novel docs (most text already seen in earlier docs):")
    novelty.orderBy(col("novelty"), col("doc_id")).show(3, false)
    val splits = Sampling.split(docs, col("doc_id"),
      Seq("train" -> 900L, "val" -> 950L, "test" -> 1000L))
      .groupBy("split").count().orderBy("split")
    println("deterministic train/val/test split:")
    splits.show(3, false)
    val calibrated = TextAnalysis.winsorize(
      TextAnalysis.quality(docs).select(col("doc_id"), col("quality_score"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id"),
      "source", "quality_score")
    println("per-source score calibration (winsorize + min-max):")
    calibrated.groupBy("source")
      .agg(round(min("norm_score"), 3).as("min_norm"),
        round(avg("norm_score"), 3).as("avg_norm"),
        round(max("norm_score"), 3).as("max_norm"))
      .orderBy("source").show(3, false)

    println(s"=== CDC: events as a per-user changelog ($sfDir) ===")
    val ev = Tables(spark, sfDir, "events")
    val cdcArgs = (Seq("user_id"), col("ts"), col("event_id"),
      col("event_type") === "error",
      Seq("last_type" -> col("event_type"),
        "last_value" -> round(col("value"), 4)))
    val snap = operators.Cdc.latestSnapshot(ev, cdcArgs._1, cdcArgs._2,
      cdcArgs._3, cdcArgs._4, cdcArgs._5)
    println(s"latest-wins snapshot: ${snap.count()} of " +
      s"${ev.select("user_id").distinct().count()} keys survive " +
      "(deletes drop the rest)")
    snap.orderBy("user_id").show(3, false)

    println(s"=== risk & lead-lag analytics ($sfDir) ===")
    val rets = operators.Correlations.logReturns(evCandles)
      .filter(col("ret").isNotNull)
    println("historical VaR(5%) + expected shortfall, worst 3 keys:")
    operators.Rolling.varES(rets, "key", col("ret"))
      .orderBy("es_q").show(3, false)
    println("strongest lead-lag relationships (A's move now vs B's next hour):")
    operators.Correlations.laggedCorrelate(rets, "1 hour", minPoints = 8)
      .orderBy(abs(col("lag_corr")).desc, col("lead_key"), col("lag_key"))
      .show(3, false)
    val flagged = operators.Rolling.cusum(rets, "key", "ts", col("ret"))
      .filter(col("changed"))
    println(s"CUSUM changepoint flags: ${flagged.count()} candle-points " +
      "exceed 3 sigma of cumulative drift")

    println(s"=== data validation: profile, constraints, drift ($sfDir) ===")
    operators.Profiling.tableProfile(ev,
      Seq("user_id", "event_type", "value")).orderBy("col_name").show(false)
    val verdicts = operators.Profiling.checkConstraints(ev, Seq(
      operators.Profiling.NotNull("user_id"),
      operators.Profiling.Unique("event_id"),
      operators.Profiling.InRange("value", 0.0, 50.0)))
    verdicts.show(false)
    assert(verdicts.filter(col("kind") === "unique").head.getBoolean(3),
      "event_id must be unique in the fixture data")
    val psi = operators.Profiling.psiDrift(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"),
      "value", 0.0, 500.0, bins = 10)
      .agg(round(sum(col("contrib")), 4)).head.getDouble(0)
    println(s"PSI(view -> purchase value distribution) = $psi " +
      (if (psi < 0.1) "(stable)" else if (psi < 0.25) "(watch)" else "(drifted)"))

    // --- lakehouse + evaluation: versioned commits and sliced AUC -------
    val ttDir = java.nio.file.Files.createTempDirectory("fxdemo_tt").toString
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    operators.Layout.commitVersion(ev.filter(col("ts") < cut), ttDir, 1)
    operators.Layout.commitVersion(ev.filter(col("ts") >= cut), ttDir, 2)
    val v1n = operators.Layout.readVersion(spark, ttDir, 1).count()
    val v2n = operators.Layout.readVersion(spark, ttDir, 2).count()
    println(s"time travel: v1 = $v1n rows, v2 = $v2n rows (v1 still exact)")
    assert(v1n < v2n && v2n == ev.count(), "versioned reads must nest")
    val aucRow = operators.Ranking.binaryAuc(ev, col("value"),
      col("event_type") === "purchase").head
    println(s"AUC(value -> purchase) = ${aucRow.get(0)} " +
      s"(n+ ${aucRow.getLong(1)}, n- ${aucRow.getLong(2)})")

    // release exactly the relations the operators pinned (Caches owner
    // registry) — a caller's own caches would survive this, unlike
    // clearCache(). components' localCheckpoint labels are RDD-level
    // persists owned by the survivors DataFrame — release those explicitly
    // once the results are no longer needed.
    operators.Caches.release(spark, blocking = true)
    assert(operators.Caches.pinnedCount(spark) == 0, "graft pins leaked")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "pinned RDDs leaked past cleanup")

    spark.stop()
  }
}
