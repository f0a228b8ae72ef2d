package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixtures.SampleData
import graft.operators.{Candles, Correlations}
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

    // release the packet relations the correlation operator pinned (its
    // documented cache contract: unpersist when done, or pass cache = false)
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "pinned RDDs leaked past clearCache")

    spark.stop()
  }
}
