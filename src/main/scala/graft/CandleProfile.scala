package graft

import org.apache.spark.sql.SparkSession

/** Stage-decomposition measurement for the candle pipeline — the upstream
  * ~15 fx_* gates share, so a second saved here multiplies across the
  * bench. Times (after a small-SF warm-up) each composed prefix:
  * tick scan → gap-fill grid → union+OHLC aggregate → carry-forward, plus
  * the repeat-consumer shape (indicators re-derive candles per gate).
  * Measurement tooling, not a gate.
  */
object CandleProfile {
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
    import graft.operators.Candles
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[candle-profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    // warm-up on the small SF
    noop(Candles.aggregate(Tables.eventsAsTicks(spark, "/root/testdata/sf0.001"), "1 hour"))

    val ticks = Tables.eventsAsTicks(spark, sfDir)
    t("tick scan")(noop(ticks))
    t("gapFill only")(noop(Candles.gapFill(ticks, "1 hour")))
    t("ohlc agg (no fill)")(noop(Candles.aggregateWindows(ticks, "1 hour")))
    val all = ticks.select(Candles.TickCols.map(org.apache.spark.sql.functions.col): _*)
      .unionByName(Candles.gapFill(ticks, "1 hour"))
    t("union + ohlc agg")(noop(Candles.aggregateWindows(all, "1 hour")))
    t("full aggregate()")(noop(Candles.aggregate(ticks, "1 hour")))
    t("full aggregate() again")(noop(Candles.aggregate(ticks, "1 hour")))
    // variant: pin the (tiny) gap relation before the union — does the
    // 0.84 s aggregate survive the union when the second branch is a
    // materialized local relation?
    val gapsPinned = Candles.gapFill(ticks, "1 hour").localCheckpoint()
    val allPinned = ticks
      .select(Candles.TickCols.map(org.apache.spark.sql.functions.col): _*)
      .unionByName(gapsPinned)
    t("union(pinned gaps) + agg")(noop(Candles.aggregateWindows(allPinned, "1 hour")))
    t("union(pinned) + carry")(noop(Candles.carryForward(
      Candles.aggregateWindows(allPinned, "1 hour"))))
    if (sys.env.contains("GRAFT_PROFILE_EXPLAIN")) {
      println("=== agg over plain ticks ===")
      Candles.aggregateWindows(ticks, "1 hour").explain("formatted")
      println("=== agg over union ===")
      Candles.aggregateWindows(all, "1 hour").explain("formatted")
    }
    spark.stop()
  }
}
