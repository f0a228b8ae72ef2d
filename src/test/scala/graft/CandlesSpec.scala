package graft

import org.apache.spark.sql.functions._

import graft.fixtures.SampleData
import graft.operators.Candles

/** Golden tests ported from the reference's JUnit suite
  * (`FXTimeSeriesPipelineSRGTests.java`, SURVEY.md §5 / FIXTURES.md §2).
  */
class CandlesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ticks = SampleData.dataset(spark).toDF()

  test("fixture has 42 elements (testDataInput, Tests:244-268)") {
    assert(ticks.count() === 42)
  }

  test("gap-fill adds exactly the two TS-3/TS-4 synthetics (testCompleteWindowData, Tests:270-289)") {
    val filled = Candles.gapFill(ticks, "120 seconds", Some(SampleData.Keys))
    val got = filled
      .select($"key", unix_millis($"ts").as("t"), $"isLive")
      .as[(String, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("TS-3", 1451577839999L, false),
      ("TS-4", 1451577839999L, false)))
  }

  test("TS-1 candles match the 5 golden rows (testCompleteCandleDataOneStream, Tests:291-366)") {
    val candles = Candles.aggregate(ticks, "120 seconds", Some(SampleData.Keys))
    val got = Candles.flatten(candles)
      .filter($"key" === "TS-1")
      .select(
        unix_millis($"closeTime"), unix_millis($"openStateTime"), unix_millis($"closeStateTime"),
        $"minAskPrice", $"maxAskPrice", $"minBidPrice", $"maxBidPrice")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toList

    val expected = List(
      (1451577719999L, 1451577660000L, 1451577660000L, 1d, 2d, 1d, 2d),
      (1451577839999L, 1451577660000L, 1451577780000L, 3d, 4d, 3d, 4d),
      (1451577959999L, 1451577780000L, 1451577900000L, 5d, 5d, 5d, 5d),
      (1451578079999L, 1451577900000L, 1451578020000L, 3d, 4d, 3d, 4d),
      (1451578199999L, 1451578020000L, 1451578140000L, 1d, 2d, 1d, 2d))
    assert(got === expected)
  }

  test("gap-filled candles: synthetic window carries previous close forward") {
    val candles = Candles.aggregate(ticks, "120 seconds", Some(SampleData.Keys))
    // TS-3 window [min2,min4) is fully synthetic: prices = previous close (9.0
    // at minute 1), close ts advanced to window max timestamp.
    val row = Candles.flatten(candles)
      .filter($"key" === "TS-3" && !$"isLive")
      .select(
        unix_millis($"closeTime"), unix_millis($"openStateTime"), unix_millis($"closeStateTime"),
        $"minAskPrice", $"maxAskPrice", $"minBidPrice", $"maxBidPrice")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toList
    assert(row === List(
      (1451577839999L, 1451577660000L, 1451577839999L, 9d, 9d, 9d, 9d)))
    // and the following live candle opens at the patched synthetic close
    val next = candles
      .filter($"key" === "TS-3" && unix_millis($"closeTime") === 1451577959999L)
      .select(unix_millis($"open.ts"), $"open.askPrice", $"open.isLive")
      .as[(Long, Double, Boolean)].collect().toList
    assert(next === List((1451577839999L, 9d, false)))
  }

  test("candle invariants hold for every key (property, all live candles)") {
    val candles = Candles.aggregate(ticks, "120 seconds", Some(SampleData.Keys))
    val bad = candles.filter($"isLive" &&
      ($"minAsk.askPrice" > $"maxAsk.askPrice" ||
       $"minBid.bidPrice" > $"maxBid.bidPrice" ||
       $"close.askPrice" < $"minAsk.askPrice" ||
       $"close.askPrice" > $"maxAsk.askPrice")).count()
    assert(bad === 0)
    // gap-fill ⇒ full grid: |universe| × |windows| candles
    assert(candles.count() === 5L * 5L)
  }

  test("carry-forward chain: openStateTime == previous closeStateTime per key") {
    val candles = Candles.aggregate(ticks, "120 seconds", Some(SampleData.Keys))
    val rows = candles
      .select($"key", unix_millis($"closeTime").as("ct"),
        unix_millis($"open.ts").as("o"), unix_millis($"close.ts").as("c"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { case (key, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur.getLong(2) === prev.getLong(3), s"key=$key carry-forward broken")
        case _ =>
      }
      assert(sorted.head.getLong(2) === sorted.head.getLong(3), s"key=$key first open != close")
    }
  }
}
