package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-decomposition measurement for the correlation pipeline — the
  * upstream shared by the 8 batch fx_corr* gates plus the staging pass of
  * the 3 stream_corr* replays. Times each composed prefix after a small-SF
  * warm-up: tick scan → candles → log-returns → packet pivot → pinned
  * packets → pair join + Pearson → full gate shapes. Measurement tooling,
  * not a gate (the CandleProfile pattern).
  */
object CorrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    import graft.operators.{Candles, Correlations, Caches}
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[corr-profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      Caches.release(spark); spark.catalog.clearCache()
    }

    // codegen audit hook: GRAFT_CODEGEN=1 prints the generated code of the
    // fx_corr_nan-shaped query (for counting per-pair comparisons) and exits
    if (sys.env.contains("GRAFT_CODEGEN")) {
      // AQE hides codegen from a pre-execution explain — disable for the dump
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Correlations.fromCandles(
          Candles.aggregate(Tables.eventsAsTicks(spark, sfDir), "1 hour"),
          "6 hours", "3 hours", minCorr = 0.4999, propagateNaN = true)
        .withColumn("r",
          when(col("isNaN"), col("corr")).otherwise(round(col("corr"), 6)))
        .filter(abs(col("r")) >= 0.5)
        .explain("codegen")
      spark.stop(); return
    }

    // warm-up on the small SF (classloading + codegen + shuffle machinery)
    noop(Correlations.fromCandles(
      Candles.aggregate(Tables.eventsAsTicks(spark, "/root/testdata/sf0.001"),
        "1 hour"), "6 hours", "3 hours", minCorr = 0.0))

    def ticks = Tables.eventsAsTicks(spark, sfDir)
    def candles = Candles.aggregate(ticks, "1 hour")
    def returns = Correlations.logReturns(candles)

    for (rnd <- 1 to (if (args.contains("once")) 1 else 2)) {
      println(s"--- round $rnd ---")
      t("tick scan")(noop(ticks))
      t("candles = aggregate(ticks)")(noop(candles))
      t("returns = logReturns(candles)")(noop(returns))
      t("packets (6h/3h pivot)")(noop(
        Correlations.packets(returns.filter(col("ret").isNotNull)
          .select(col("key"), col("ts"), col("ret")), "6 hours", "3 hours")))
      t("packets pinned+count") {
        val pk = Caches.pin(Correlations.packets(
          returns.filter(col("ret").isNotNull), "6 hours", "3 hours"))
        pk.count(); ()
      }
      t("fx_corr full (pruned)")(noop(
        Correlations.correlate(returns, "6 hours", "3 hours", minCorr = 0.0)
          .withColumn("r", round(col("corr"), 6))
          .filter(abs(col("r")) >= 0.5)))
      t("fx_corr_nan full")(noop(
        Correlations.correlate(returns, "6 hours", "3 hours", minCorr = 0.0,
            propagateNaN = true)
          .withColumn("r", round(col("corr"), 6))
          .filter(abs(col("r")) >= 0.5)))
    }
    spark.stop()
  }
}
