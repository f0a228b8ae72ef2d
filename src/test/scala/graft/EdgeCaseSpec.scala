package graft

import java.sql.Timestamp

import graft.model.Tick
import graft.operators.{AsOfJoin, Candles, Correlations, Dedup, TextAnalysis}

/** Degenerate inputs under Spark 4 ANSI mode: empty relations, singletons,
  * and empty text must flow through every operator without throwing.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: (String, Long, Double)*) =
    rows.map { case (k, ts, v) =>
      Tick(k, new Timestamp(ts), Some(v), Some(v), isLive = true)
    }.toDF()

  private val emptyTicks = Seq.empty[Tick].toDF()

  test("candle pipeline on empty and singleton input") {
    assert(Candles.aggregate(emptyTicks, "120 seconds").count() == 0)
    val one = Candles.aggregate(ticks(("A", 1000L, 5.0)), "120 seconds").collect()
    assert(one.length == 1)
    val c = one(0)
    assert(c.getAs[Boolean]("isLive"))
    // first candle seeds open := its own close
    assert(c.getAs[org.apache.spark.sql.Row]("open") ==
      c.getAs[org.apache.spark.sql.Row]("close"))
  }

  test("correlations on empty, singleton-key, and single-point inputs") {
    assert(Correlations.fromCandles(
      Candles.aggregate(emptyTicks, "120 seconds")).count() == 0)
    // one key: no pairs
    val c1 = Candles.aggregate(ticks(
      ("A", 0L, 1.0), ("A", 60000L, 2.0), ("A", 120000L, 3.0)), "60 seconds")
    assert(Correlations.fromCandles(c1, "600 seconds", "300 seconds", 0.0).count() == 0)
    // two keys but only one aligned point: pair skipped (n < 2)
    val c2 = Candles.aggregate(ticks(
      ("A", 0L, 1.0), ("B", 0L, 2.0)), "60 seconds")
    assert(Correlations.fromCandles(c2, "600 seconds", "300 seconds", 0.0,
      propagateNaN = true).count() == 0)
  }

  test("as-of join with empty right side null-extends every left row") {
    val left = ticks(("A", 1000L, 1.0))
    val right = emptyTicks
    val out = AsOfJoin.backward(left, right).collect()
    assert(out.length == 1 && out(0).isNullAt(left.columns.length))
  }

  test("text + dedup operators accept empty documents") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one real doc here")).toDF("doc_id", "text")
    assert(TextAnalysis.tokenStats(docs).count() == 3)
    assert(TextAnalysis.quality(docs).count() == 3)
    assert(TextAnalysis.langId(docs).count() == 3)
    assert(TextAnalysis.fingerprint(docs).count() == 3)
    assert(Dedup.simHash(docs).count() <= 3)          // empty docs have no tokens
    assert(Dedup.ngramJaccard(docs).count() == 0)     // nothing shares shingles
    assert(Dedup.minHashLsh(docs).count() == 0)
  }
}
