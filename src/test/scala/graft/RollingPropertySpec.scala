package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Rolling

/** Property tests for the indicator family (ScalaCheck): invariants that
  * hold for EVERY input series, the class of check that catches
  * cancellation/convention bugs (like the fx_macd ±0.0 hash split) before
  * a cross-engine oracle does.
  */
class RollingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  /** One key's ordered value series; constant runs are common on purpose
    * (carry-forward candles produce them, and they are where FP
    * cancellation lives).
    */
  private val seriesGen: Gen[List[Double]] = for {
    n <- Gen.choose(2, 40)
    base <- Gen.choose(1.0, 200.0)
    vs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.const(base),                 // constant stretches
      2 -> Gen.choose(1.0, 200.0)))
  } yield vs

  private def indicatorRows(vs: List[Double],
      statsN: Int = 4, ewmaN: Int = 10): Seq[Row] = {
    val df = vs.zipWithIndex.map { case (v, i) => ("K", i.toLong, v) }
      .toDF("key", "i", "v")
    Rolling.indicators(df, "key", "i", col("v"), statsN = statsN,
        ewmaN = ewmaN)
      .orderBy("i").collect().toSeq
  }

  test("rsi stays in [0, 100]; null only on the first row") {
    check(Prop.forAll(seriesGen) { vs =>
      val rows = indicatorRows(vs)
      rows.zipWithIndex.forall { case (r, i) =>
        if (i == 0) r.isNullAt(r.fieldIndex("rsi"))
        else {
          val x = r.getDouble(r.fieldIndex("rsi"))
          x >= 0.0 && x <= 100.0
        }
      }
    }, minTests = 25)
  }

  test("bollinger bands are ordered: lower <= mid <= upper") {
    check(Prop.forAll(seriesGen) { vs =>
      indicatorRows(vs).forall { r =>
        // single-row frames have null stddev -> null bands (never inverted)
        if (r.isNullAt(r.fieldIndex("bb_lower")))
          r.isNullAt(r.fieldIndex("bb_upper"))
        else {
          val lo = r.getDouble(r.fieldIndex("bb_lower"))
          val mid = r.getDouble(r.fieldIndex("bb_mid"))
          val hi = r.getDouble(r.fieldIndex("bb_upper"))
          lo <= mid && mid <= hi
        }
      }
    }, minTests = 25)
  }

  test("ewma lies within [min, max] of its own frame") {
    check(Prop.forAll(seriesGen) { vs =>
      // statsN == ewmaN so roll_min/roll_max describe the ewma's frame
      indicatorRows(vs, statsN = 10, ewmaN = 10).forall { r =>
        val e = r.getDouble(r.fieldIndex("ewma"))
        val lo = r.getDouble(r.fieldIndex("roll_min"))
        val hi = r.getDouble(r.fieldIndex("roll_max"))
        e >= lo - 1e-9 && e <= hi + 1e-9
      }
    }, minTests = 25)
  }

  test("constant series: macd/signal/hist are exactly 0.0, rsi is 50") {
    check(Prop.forAll(Gen.choose(1.0, 500.0), Gen.choose(2, 50)) { (v, n) =>
      val rows = indicatorRows(List.fill(n)(v))
      rows.forall { r =>
        // exact +0.0 — the sub-epsilon clamp must normalize the
        // cancellation noise AND its engine-dependent sign
        java.lang.Double.doubleToRawLongBits(
          r.getDouble(r.fieldIndex("macd"))) == 0L &&
        java.lang.Double.doubleToRawLongBits(
          r.getDouble(r.fieldIndex("signal"))) == 0L &&
        java.lang.Double.doubleToRawLongBits(
          r.getDouble(r.fieldIndex("hist"))) == 0L
      } && rows.tail.forall(r => r.getDouble(r.fieldIndex("rsi")) == 50.0)
    }, minTests = 15)
  }

  test("combined indicators == standalone operators, column for column") {
    check(Prop.forAll(seriesGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("K", i.toLong, v) }
        .toDF("key", "i", "v")
      def byI(rows: Seq[Row], c: String): Map[Long, Option[Double]] =
        rows.map(r => r.getLong(r.fieldIndex("i")) ->
          (if (r.isNullAt(r.fieldIndex(c))) None
           else Some(r.getDouble(r.fieldIndex(c))))).toMap
      def eq(a: Map[Long, Option[Double]], b: Map[Long, Option[Double]],
          keys: Iterable[Long]): Boolean = keys.forall { k =>
        (a(k), b(k)) match {
          case (None, None) => true
          case (Some(x), Some(y)) =>
            x == y || (x.isNaN && y.isNaN)
          case _ => false
        }
      }
      val comb = indicatorRows(vs)
      val is = (0L until vs.size.toLong).toList
      val stats = Rolling.stats(df, "key", "i", col("v"), 4).collect().toSeq
      val ewma = Rolling.ewma(df, "key", "i", col("v"), 10, 0.8).collect().toSeq
      val macd = Rolling.macd(df, "key", "i", col("v")).collect().toSeq
      val rsi = Rolling.rsi(df, "key", "i", col("v")).collect().toSeq
      val boll = Rolling.bollinger(df, "key", "i", col("v")).collect().toSeq
      eq(byI(comb, "roll_avg"), byI(stats, "roll_avg"), is) &&
        eq(byI(comb, "roll_std"), byI(stats, "roll_std"), is) &&
        eq(byI(comb, "ewma"), byI(ewma, "ewma"), is) &&
        eq(byI(comb, "macd"), byI(macd, "macd"), is) &&
        eq(byI(comb, "signal"), byI(macd, "signal"), is) &&
        eq(byI(comb, "hist"), byI(macd, "hist"), is) &&
        // rsi: standalone drops the first row, combined keeps it as null
        eq(byI(comb, "rsi"), byI(rsi, "rsi") + (0L -> None), is) &&
        eq(byI(comb, "bb_mid"), byI(boll, "bb_mid"), is) &&
        eq(byI(comb, "bb_pctb"), byI(boll, "bb_pctb"), is)
    }, minTests = 15)
  }

  test("cusum window algebra equals the sequential recurrence") {
    // the closed form S+ = P - runningMin(P), S- = runningMax(P) - P must
    // reproduce the textbook reset-to-zero recurrence on EVERY series —
    // the identity the distributed formulation rests on
    check(Prop.forAll(seriesGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("K", i.toLong, v) }
        .toDF("key", "i", "v")
      val out = Rolling.cusum(df, "key", "i", col("v"), h = 3.0)
        .orderBy("i").collect()
      val mu = vs.sum / vs.size
      val (ups, dns) = vs.foldLeft((List.empty[Double], List.empty[Double])) {
        case ((us, ds), x) =>
          val up = math.max(0.0, us.headOption.getOrElse(0.0) + (x - mu))
          val dn = math.max(0.0, ds.headOption.getOrElse(0.0) - (x - mu))
          (up :: us, dn :: ds)
      }
      val refUp = ups.reverse
      val refDn = dns.reverse
      out.zipWithIndex.forall { case (r, i) =>
        math.abs(r.getAs[Double]("cusum_up") - refUp(i)) <= 1e-6 &&
          math.abs(r.getAs[Double]("cusum_dn") - refDn(i)) <= 1e-6 &&
          r.getAs[Double]("cusum_up") >= 0.0 &&
          r.getAs[Double]("cusum_dn") >= 0.0
      }
    }, minTests = 30)
  }

  test("varES: interpolated cut, tail mean at the rounded boundary") {
    val df = (1 to 100).map(i => ("K", i.toDouble)).toDF("key", "ret")
    val out = Rolling.varES(df, "key", col("ret"), q = 0.05, minPoints = 20)
      .collect()
    assert(out.length == 1)
    val r = out.head
    // quantile_cont(0.05) of 1..100 = 1 + 0.05*99 = 5.95; tail = {1..5}
    assert(r.getAs[Double]("var_q") == 5.95)
    assert(r.getAs[Double]("es_q") == 3.0)
    assert(r.getAs[Long]("n_tail") == 5L && r.getAs[Long]("n") == 100L)
    // below minPoints: no row
    val few = (1 to 10).map(i => ("K", i.toDouble)).toDF("key", "ret")
    assert(Rolling.varES(few, "key", col("ret"), minPoints = 20).count() == 0)
  }

  test("cusum: constant series never flags; a level shift does") {
    val flat = (0 until 20).map(i => ("K", i.toLong, 5.0)).toDF("key", "i", "v")
    assert(Rolling.cusum(flat, "key", "i", col("v"))
      .filter(col("changed")).count() == 0)
    // 10 @ 1.0 then 10 @ 2.0: the post-shift cumulative drift far exceeds
    // 3σ of the pooled series
    val shift = ((0 until 10).map(i => ("K", i.toLong, 1.0)) ++
      (10 until 20).map(i => ("K", i.toLong, 2.0))).toDF("key", "i", "v")
    assert(Rolling.cusum(shift, "key", "i", col("v"))
      .filter(col("changed")).count() > 0)
  }

  test("indicators fan-out plans exactly one shuffle exchange") {
    val df = (0 until 64).map(i => (s"K${i % 3}", i.toLong, i * 1.5))
      .toDF("key", "i", "v")
    val plan = Rolling.indicators(df, "key", "i", col("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "(?i)Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1,
      s"the whole indicator family must share ONE exchange, found $exchanges:\n$plan")
  }

  test("atr: hand-computed true ranges and trailing mean (period 2)") {
    val df = Seq(
      ("K", 0L, 10.0, 8.0, 9.0),
      ("K", 1L, 12.0, 9.0, 11.0),
      ("K", 2L, 9.0, 7.0, 8.0)
    ).toDF("key", "i", "h", "l", "c")
    val out = Rolling.atr(df, "key", "i", col("h"), col("l"), col("c"),
        period = 2)
      .orderBy("i").collect()
      .map(r => (r.getAs[Double]("tr"), r.getAs[Double]("atr")))
    // tr: 2 (first: h-l), max(3,|12-9|,|9-9|)=3, max(2,|9-11|,|7-11|)=4
    assert(out.toSeq == Seq((2.0, 2.0), (3.0, 2.5), (4.0, 3.5)), out.toSeq)
  }

  test("atr is nonnegative and at least high-low on every row") {
    check(Prop.forAll(seriesGen) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) =>
        ("K", i.toLong, v + 1.0, v - 1.0, v) }
        .toDF("key", "i", "h", "l", "c")
      Rolling.atr(rows, "key", "i", col("h"), col("l"), col("c"))
        .collect().forall { r =>
          val tr = r.getAs[Double]("tr"); val atr = r.getAs[Double]("atr")
          tr >= 2.0 - 1e-12 && atr >= 2.0 - 1e-12
        }
    }, minTests = 15)
  }

  test("stochastic: %K positions the close inside the trailing band") {
    val df = Seq(
      ("K", 0L, 10.0, 8.0, 9.0),   // band [8,10], close 9 -> 50
      ("K", 1L, 12.0, 9.0, 12.0),  // band [8,12], close 12 -> 100
      ("K", 2L, 9.0, 7.0, 7.0)     // band [7,12], close 7 -> 0
    ).toDF("key", "i", "h", "l", "c")
    val out = Rolling.stochastic(df, "key", "i", col("h"), col("l"),
        col("c"), n = 14, d = 2)
      .orderBy("i").collect()
      .map(r => (r.getAs[Double]("pct_k"), r.getAs[Double]("pct_d")))
    assert(out.toSeq == Seq((50.0, 50.0), (100.0, 75.0), (0.0, 50.0)),
      out.toSeq)
  }

  test("stochastic: degenerate (flat) band yields null, never NaN") {
    val df = (0L to 5L).map(i => ("K", i, 5.0, 5.0, 5.0))
      .toDF("key", "i", "h", "l", "c")
    val out = Rolling.stochastic(df, "key", "i", col("h"), col("l"),
        col("c")).collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("pct_k")) &&
      r.isNullAt(r.fieldIndex("pct_d"))), out.mkString(";"))
  }
}
