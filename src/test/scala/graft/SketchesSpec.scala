package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Sketches
import graft.sources.Tables

/** Error-bound contracts for the sketch profiles — the place the accuracy
  * guarantee lives, since sketch estimates are engine-specific and hence
  * deliberately not DuckDB-oracle-gated (see the Sketches scaladoc).
  */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("eventProfile: HLL distincts within 3×rsd of exact, quartiles rank-bounded") {
    val ev = Tables(spark, dir, "events")
    val prof = Sketches.eventProfile(ev, rsd = 0.02).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = ev.groupBy("event_type").agg(
        countDistinct(col("user_id")).as("du"),
        countDistinct(col("props")).as("dp"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(prof.keySet == exact.keySet && prof.nonEmpty)
    exact.foreach { case (et, (du, dp, n)) =>
      val p = prof(et)
      assert(p.getLong(p.fieldIndex("n")) == n, s"$et exact row count must hold")
      val au = p.getLong(p.fieldIndex("approx_users"))
      val ap = p.getLong(p.fieldIndex("approx_props"))
      assert(math.abs(au - du) <= math.max(3 * 0.02 * du, 1),
        s"$et users: approx $au vs exact $du")
      assert(math.abs(ap - dp) <= math.max(3 * 0.02 * dp, 1),
        s"$et props: approx $ap vs exact $dp")
    }
    // quartile rank error ≤ 1/accuracy ⇒ with accuracy=10000 and ~12k rows
    // per group, the estimate sits within a few ranks of the exact quantile
    val et = exact.keys.head
    val vals = ev.filter(col("event_type") === et).select("value")
      .collect().map(_.getDouble(0)).sorted
    val row = prof(et)
    val qs = Seq("q25", "q50", "q75").map(c => row.getDouble(row.fieldIndex(c)))
    Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (q, i) =>
      val rank = (q * (vals.length - 1)).toInt
      val slack = math.max(vals.length / 1000, 3)
      val lo = vals(math.max(rank - slack, 0))
      val hi = vals(math.min(rank + slack, vals.length - 1))
      assert(qs(i) >= lo && qs(i) <= hi,
        s"$et q$q: ${qs(i)} outside rank-window [$lo, $hi]")
    }
  }

  test("docProfile: vocabulary estimate bounded, doc-length quantiles doc-weighted") {
    val docs = Tables(spark, dir, "documents")
    val prof = Sketches.docProfile(docs, rsd = 0.02).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = docs
      .select(col("lang"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("lang").agg(countDistinct(col("tok")).as("v"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(prof.keySet == exact.keySet && prof.nonEmpty)
    exact.foreach { case (lang, (v, n)) =>
      val p = prof(lang)
      assert(p.getLong(p.fieldIndex("n_tokens")) == n,
        s"$lang exact token count must hold")
      val av = p.getLong(p.fieldIndex("approx_vocab"))
      assert(math.abs(av - v) <= math.max(3 * 0.02 * v, 1),
        s"$lang vocab: approx $av vs exact $v")
      // median doc length must be a plausible PER-DOC length (the corpus
      // is ~40-70 tokens/doc) — the regression this guards: exploding
      // before the quantile would length-weight docs upward
      val med = p.getDouble(p.fieldIndex("p50"))
      val nd = p.getLong(p.fieldIndex("n_docs"))
      assert(nd > 0 && med >= 1 && med <= 2.0 * n.toDouble / nd,
        s"$lang median len $med implausible vs mean ${n.toDouble / nd}")
      assert(p.getDouble(p.fieldIndex("p90")) >= med,
        s"$lang p90 must dominate p50")
    }
  }

  test("checked profiles: every within-bound boolean TRUE, exact facts exact") {
    val ev = Tables(spark, dir, "events")
    val evc = Sketches.eventProfileChecked(ev).collect()
    assert(evc.nonEmpty)
    val exactEv = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 1000000).cast("long")).as("s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    evc.foreach { r =>
      val et = r.getString(r.fieldIndex("event_type"))
      assert(r.getLong(r.fieldIndex("n")) == exactEv(et)._1)
      assert(r.getLong(r.fieldIndex("sum_value_micro")) == exactEv(et)._2)
      Seq("users_ok", "props_ok", "q25_ok", "q50_ok", "q75_ok").foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"$et.$c must hold")
      }
    }
    val docs = Tables(spark, dir, "documents")
    val dc = Sketches.docProfileChecked(docs).collect()
    assert(dc.nonEmpty)
    dc.foreach { r =>
      Seq("vocab_ok", "p50_ok", "p90_ok").foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)),
          s"${r.getString(r.fieldIndex("lang"))}.$c must hold")
      }
    }
  }

  test("heavyHitters == exact threshold counts, at any partitioning") {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
    val toks = docs.select(
      explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
    val n = toks.count().toDouble
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") >= lit(0.002) * lit(n))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "fixture corpus must have heavy hitters at 0.2%")
    for (parts <- Seq(1, 7)) {
      val got = Sketches.heavyHitters(docs.repartition(parts), minFrac = 0.002)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.map(t => t._1 -> t._2).toMap == exact,
        s"parts=$parts: sketch-verified set must equal the exact set")
      got.foreach { case (tok, cnt, frac) =>
        assert(math.abs(frac - cnt / n) < 1e-6, s"$tok frac") }
    }
  }

  test("heavyHitters property: frequent tokens always survive nomination (random Zipf corpora)") {
    import spark.implicits._
    // The Misra–Gries guarantee argued in the Sketches scaladoc, pinned
    // mechanically: with capacity k = ceil(2/minFrac), every token whose
    // GLOBAL count is >= minFrac·N must survive some partition's summary,
    // so the sketch→exact result equals the exact threshold set — for ANY
    // corpus, skew, shuffle order, and partitioning.
    val corpusGen: Gen[Vector[String]] = for {
      v <- Gen.choose(5, 40)        // vocabulary size
      zipf <- Gen.choose(0.8, 1.6)  // skew exponent
      scale <- Gen.choose(50, 400)  // occurrence scale
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield {
      val occ = (1 to v).flatMap { r =>
        val c = math.max(1L, math.round(scale / math.pow(r, zipf)))
        Seq.fill(c.toInt)(s"w$r")
      }
      new scala.util.Random(seed).shuffle(occ.toVector)
        .grouped(8).map(_.mkString(" ")).toVector
    }
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 7),
        Gen.oneOf(0.02, 0.05, 0.1)) { (docs, parts, minFrac) =>
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Sketches.heavyHitters(df.repartition(parts), minFrac = minFrac)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val toks = docs.flatMap(_.split(" "))
      val n = toks.size.toDouble
      val exact = toks.groupBy(identity)
        .map { case (w, l) => w -> l.size.toLong }
        .filter { case (_, c) => c.toDouble >= minFrac * n }
      got == exact
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("heavyHitters: tiny capacity still yields the exact set (superset nomination)") {
    import spark.implicits._
    // 'a' is 50% of occurrences; k=ceil(2/0.5)=4 counters suffice even
    // across adversarial partition splits
    val docs = (0 until 40).map(i =>
      (i, if (i % 2 == 0) "a a a a" else s"w$i x$i y$i z$i")).toDF("doc_id", "text")
    val got = Sketches.heavyHitters(docs.repartition(5), minFrac = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 80L)))
  }
}
