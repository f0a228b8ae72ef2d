package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PearsonAligned
import graft.operators.{Caches, Candles, Correlations}
import graft.sources.Tables

/** Alternating A/B measurement for the r15 optimization round: each variant
  * pair runs interleaved (A,B,A,B,...) inside ONE JVM so host windows and
  * JIT warmth hit both sides equally (the BASELINE r10 methodology — never
  * compare cross-window absolutes). The OLD formulations are inlined here
  * verbatim so the committed operators can move on. Measurement tooling,
  * not a gate.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // wall clock AND process-CPU time: this host's CPU frequency swings in
    // multi-second waves (calibrated 1.7× on a fixed single-thread loop;
    // wall-clock on 32-thread runs swung 8×), so the per-rep ratio of
    // process-CPU — total work done, all threads — is the primary evidence,
    // wall the secondary.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed(body: => Unit): (Double, Double) = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (osBean.getProcessCpuTime - c0) / 1e9
      Caches.release(spark); spark.catalog.clearCache()
      (dt, dc)
    }

    def ticksAt(dir: String) = Tables.eventsAsTicks(spark, dir)

    // ---- OLD candle pipeline: 4-scan gap fill (pre-r15 formulation) ----
    def oldAggregate(ticks: DataFrame, resolution: String): DataFrame = {
      val in = ticks.select(Candles.TickCols.map(col): _*)
      val w = window(col("ts"), resolution).as("w")
      val keys = in.select("key").distinct()
      val windows = in.select(w).distinct()
      val observed = in.select(col("key"), w).distinct()
      val missing = windows
        .join(broadcast(keys))
        .join(observed, Seq("w", "key"), "left_anti")
      val gaps = missing.select(
        col("key"),
        timestamp_millis(unix_millis(col("w.end")) - 1).as("ts"),
        lit(null).cast("double").as("bidPrice"),
        lit(null).cast("double").as("askPrice"),
        lit(false).as("isLive"))
      val t = struct(col("ts"), col("bidPrice"), col("askPrice"), col("isLive"))
      val gapCandles = gaps
        .withColumn("w", window(col("ts"), resolution))
        .select(col("key"),
          col("w.start").as("windowStart"), col("w.end").as("windowEnd"),
          timestamp_millis(unix_millis(col("w.end")) - 1).as("closeTime"),
          t.as("minAsk"), t.as("maxAsk"), t.as("minBid"), t.as("maxBid"),
          t.as("close"), col("isLive"))
      Candles.carryForward(
        Candles.aggregateWindows(in, resolution).unionByName(gapCandles))
    }

    // ---- OLD pair join: full-width packet sides (pre-r15 formulation) ----
    def oldCorrelate(returns: DataFrame, propagateNaN: Boolean): DataFrame = {
      val pk0 = Correlations.packets(returns, "6 hours", "3 hours")
      val pkF = if (propagateNaN) pk0 else pk0.filter(col("sd") > 0)
      val pk = Caches.pin(pkF)
      val b = 8
      val blk = pmod(hash(col("key")), lit(b))
      val aSide = pk.withColumn("__blk", blk)
        .withColumn("__hi", explode(sequence(col("__blk"), lit(b - 1))))
      val bSide = pk.withColumn("__blk", blk)
        .withColumn("__lo", explode(sequence(lit(0), col("__blk"))))
      val joined = aSide.as("a").join(bSide.as("b"),
        col("a.w") === col("b.w") &&
          col("a.__blk") === col("b.__lo") && col("a.__hi") === col("b.__blk") &&
          (col("a.__blk") < col("b.__blk") || col("a.key") < col("b.key")))
      val aIsFirst = col("a.key") < col("b.key")
      def pick(first: Boolean, c: String => org.apache.spark.sql.Column) =
        if (first) when(aIsFirst, c("a")).otherwise(c("b"))
        else when(aIsFirst, c("b")).otherwise(c("a"))
      val paired = joined
        .select(
          col("a.w").as("w"),
          least(col("a.key"), col("b.key")).as("key1"),
          greatest(col("a.key"), col("b.key")).as("key2"),
          pick(first = true, s => size(col(s + ".pts"))).as("xCount"),
          pick(first = false, s => size(col(s + ".pts"))).as("yCount"),
          inline(array(PearsonAligned(
            col("a.tss"), col("a.rets"), col("b.tss"), col("b.rets")))))
        .filter(col("n") >= 2)
      val policy =
        if (propagateNaN)
          paired.withColumn("isNaN", isnan(col("r")))
            .withColumn("r", when(col("isNaN"), lit(1.0)).otherwise(col("r")))
        else paired.filter(!isnan(col("r"))).withColumn("isNaN", lit(false))
      policy
        .select(col("w.start").as("windowStart"), col("key1"), col("key2"),
          col("r").as("corr"), col("n"), col("xCount"), col("yCount"),
          col("isNaN"))
    }

    // ---- r15 slim join with toggles: surrogate key-order + SHJ hint ----
    def slimCorrelate(returns: DataFrame, propagateNaN: Boolean,
        surrogate: Boolean, shj: Boolean): DataFrame = {
      val pk0 = Correlations.packets(returns, "6 hours", "3 hours")
      val pkF = if (propagateNaN) pk0 else pk0.filter(col("sd") > 0)
      val pk = Caches.pin(pkF)
      val b = 8
      val blk = pmod(hash(col("key")), lit(b))
      def ordOf(k: org.apache.spark.sql.Column) = {
        def cp(i: Int) = {
          val c = ascii(substring(k, i, 1)).cast("long")
          when(c > 0xFFFFL, 0xFFFFL).otherwise(c)
        }
        (((cp(1) * 65536L + cp(2)) * 65536L + cp(3)) * 65536L) + cp(4)
      }
      val slim = pk.select(col("w"), col("key"), ordOf(col("key")).as("ord"),
        col("tss"), col("rets"), size(col("tss")).as("nPts"))
      val aSide = slim.withColumn("__blk", blk)
        .withColumn("__hi", explode(sequence(col("__blk"), lit(b - 1))))
      val bSide0 = slim.withColumn("__blk", blk)
        .withColumn("__lo", explode(sequence(lit(0), col("__blk"))))
      val bSide = if (shj) bSide0.hint("shuffle_hash") else bSide0
      val keyLt =
        if (surrogate) col("a.ord") < col("b.ord") ||
          (col("a.ord") === col("b.ord") && col("a.key") < col("b.key"))
        else col("a.key") < col("b.key")
      val joined = aSide.as("a").join(bSide.as("b"),
        col("a.w") === col("b.w") &&
          col("a.__blk") === col("b.__lo") && col("a.__hi") === col("b.__blk") &&
          (col("a.__blk") < col("b.__blk") || keyLt))
      def pick(first: Boolean, c: String => org.apache.spark.sql.Column) =
        if (first) when(keyLt, c("a")).otherwise(c("b"))
        else when(keyLt, c("b")).otherwise(c("a"))
      val paired = joined
        .select(
          col("a.w").as("w"),
          pick(first = true, s => col(s + ".key")).as("key1"),
          pick(first = false, s => col(s + ".key")).as("key2"),
          pick(first = true, s => col(s + ".nPts")).as("xCount"),
          pick(first = false, s => col(s + ".nPts")).as("yCount"),
          inline(array(PearsonAligned(
            col("a.tss"), col("a.rets"), col("b.tss"), col("b.rets")))))
        .filter(col("n") >= 2)
      val policy =
        if (propagateNaN)
          paired.withColumn("isNaN", isnan(col("r")))
            .withColumn("r", when(col("isNaN"), lit(1.0)).otherwise(col("r")))
        else paired.filter(!isnan(col("r"))).withColumn("isNaN", lit(false))
      policy.filter(abs(col("r")) >= lit(0.4999))
        .select(col("w.start").as("windowStart"), col("key1"), col("key2"),
          col("r").as("corr"), col("n"), col("xCount"), col("yCount"),
          col("isNaN"))
    }

    def corrShape(c: DataFrame): DataFrame =
      c.withColumn("r", round(col("corr"), 6)).filter(abs(col("r")) >= 0.5)

    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val sections = args.drop(1).toSet // optional section-name filter
    def want(name: String): Boolean =
      sections.isEmpty || sections.exists(name.startsWith)

    // warm-up both paths at sf0.001
    val warmT = ticksAt("/root/testdata/sf0.001")
    noop(oldAggregate(warmT, "1 hour")); Caches.release(spark)
    noop(Candles.aggregate(warmT, "1 hour")); Caches.release(spark)
    noop(corrShape(oldCorrelate(
      Correlations.logReturns(oldAggregate(warmT, "1 hour")), false)))
    Caches.release(spark); spark.catalog.clearCache()
    noop(corrShape(Correlations.correlate(
      Correlations.logReturns(Candles.aggregate(warmT, "1 hour")),
      "6 hours", "3 hours", minCorr = 0.0)))
    Caches.release(spark); spark.catalog.clearCache()

    val ticks = ticksAt(sfDir)
    def newAgg = Candles.aggregate(ticks, "1 hour")
    def oldAgg = oldAggregate(ticks, "1 hour")

    def ab(name: String)(old: => DataFrame)(nw: => DataFrame): Unit = {
      if (!want(name)) return
      println(s"=== $name ===")
      for (i <- 1 to reps) {
        val (aw, ac) = timed(noop(old))
        val (bw, bc) = timed(noop(nw))
        println(f"[ab] $name rep$i oldW=$aw%7.3f newW=$bw%7.3f wRatio=${bw / aw}%5.3f " +
          f"oldC=$ac%7.3f newC=$bc%7.3f cRatio=${bc / ac}%5.3f")
      }
    }

    ab("candles")(oldAgg)(newAgg)
    def nanShape(c: DataFrame): DataFrame =
      c.withColumn("r",
          when(col("isNaN"), col("corr")).otherwise(round(col("corr"), 6)))
        .filter(abs(col("r")) >= 0.5)
    def abc(name: String)(mk: (Boolean, Boolean) => DataFrame): Unit = {
      if (!want(name)) return
      println(s"=== $name: v1(slim) vs v2(+surrogate) vs v3(+shj) ===")
      for (i <- 1 to reps) {
        val (w1, c1) = timed(noop(mk(false, false)))
        val (w2, c2) = timed(noop(mk(true, false)))
        val (w3, c3) = timed(noop(mk(true, true)))
        println(f"[abc] $name rep$i v1W=$w1%7.3f v2W=$w2%7.3f v3W=$w3%7.3f " +
          f"v1C=$c1%8.2f v2C=$c2%8.2f v3C=$c3%8.2f " +
          f"c21=${c2 / c1}%5.3f c31=${c3 / c1}%5.3f")
      }
    }
    abc("fx_corr")((sur, shj) => corrShape(slimCorrelate(
      Correlations.logReturns(newAgg), propagateNaN = false, sur, shj)))
    abc("fx_corr_nan")((sur, shj) => nanShape(slimCorrelate(
      Correlations.logReturns(newAgg), propagateNaN = true, sur, shj)))

    // ---- complete old gate forms vs the COMMITTED operators ----
    // (old = pre-r15 formulation inlined above over the old candle
    // pipeline, full-width pair join, no raw prefilter, round-then-filter;
    // new = exactly what the gate registry now runs.)
    def gateSel(c: DataFrame): DataFrame =
      c.select(col("windowStart").as("wstart"), col("key1"), col("key2"),
        col("r"), col("n"), col("isNaN"))
    ab("gate_fx_corr")(
      gateSel(corrShape(oldCorrelate(
        Correlations.logReturns(oldAgg), propagateNaN = false))
        .withColumn("isNaN", lit(false))))(
      gateSel(Correlations.fromCandles(newAgg, "6 hours", "3 hours",
          minCorr = 0.4999, keyBlocks = 8)
        .withColumn("r", round(col("corr"), 6))
        .filter(abs(col("r")) >= 0.5)))
    ab("gate_fx_corr_nan")(
      gateSel(corrShape(oldCorrelate(
        Correlations.logReturns(oldAgg), propagateNaN = true))))(
      gateSel(Correlations.fromCandles(newAgg, "6 hours", "3 hours",
          minCorr = 0.4999, propagateNaN = true, keyBlocks = 8)
        .withColumn("r",
          when(col("isNaN"), col("corr")).otherwise(round(col("corr"), 6)))
        .filter(abs(col("r")) >= 0.5)))
    spark.stop()
  }
}
