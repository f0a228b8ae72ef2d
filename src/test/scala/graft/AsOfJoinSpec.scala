package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.AsOfJoin

/** As-of join vs a brute-force reference on randomized keyed series. */
class AsOfJoinSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)
  private val base = 1700000000000L

  private def mkDf(n: Int, payload: String): (DataFrame, Seq[(String, Long, Double)]) = {
    val rows = (0 until n).map { _ =>
      val key = "K" + rnd.nextInt(5)
      val ts = base + rnd.nextInt(100000) * 1000L
      (key, ts, math.round(rnd.nextDouble() * 1e4) / 100.0)
    }
    import spark.implicits._
    val df = rows.toDF("key", "tsm", payload)
      .selectExpr("key", "timestamp_millis(tsm) AS ts", payload)
    (df, rows)
  }

  test("backward as-of join matches brute force (incl. ties and no-match)") {
    val (left, lrows) = mkDf(300, "lv")
    val (right, rrows) = mkDf(200, "rv")

    val got = AsOfJoin.backward(left, right)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2),
        Option(r.getTimestamp(3)).map(_.getTime), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2, t._3))

    val expected = lrows.map { case (k, ts, lv) =>
      val m = rrows.filter(r => r._1 == k && r._2 <= ts)
      // deterministic tie rule: latest ts, then GREATEST payload among ties
      val best = if (m.isEmpty) None else {
        val mt = m.map(_._2).max
        Some((mt, m.filter(_._2 == mt).map(_._3).max))
      }
      (k, ts, lv, best.map(_._1), best.map(_._2))
    }.sortBy(t => (t._1, t._2, t._3))

    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"\ngot: $g\nexp: $e") }
  }

  test("equal-ts right duplicates: greatest payload wins, deterministically") {
    import spark.implicits._
    val left = Seq(("A", 100L)).toDF("key", "tsm")
      .selectExpr("key", "timestamp_millis(tsm) AS ts")
    val right = Seq(("A", 50L, 3.0), ("A", 50L, 9.0), ("A", 50L, 7.0))
      .toDF("key", "tsm", "rv")
      .selectExpr("key", "timestamp_millis(tsm) AS ts", "rv")
    (1 to 3).foreach { _ =>
      // columns: key, ts, right_ts, right_rv
      val m = AsOfJoin.backward(left, right).collect()(0)
      assert(m.getDouble(3) == 9.0, s"expected greatest payload, got $m")
    }
  }

  test("forward as-of join matches brute force") {
    val (left, lrows) = mkDf(300, "lv")
    val (right, rrows) = mkDf(200, "rv")

    val got = AsOfJoin.forward(left, right)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2),
        Option(r.getTimestamp(3)).map(_.getTime)))
      .sortBy(t => (t._1, t._2, t._3))

    val expected = lrows.map { case (k, ts, lv) =>
      val m = rrows.filter(r => r._1 == k && r._2 >= ts)
      (k, ts, lv, if (m.isEmpty) None else Some(m.minBy(_._2)._2))
    }.sortBy(t => (t._1, t._2, t._3))

    got.zip(expected).foreach { case (g, e) => assert(g == e, s"\ngot: $g\nexp: $e") }
  }

  test("nearest as-of join matches brute force (backward wins ties)") {
    val (left, lrows) = mkDf(300, "lv")
    val (right, rrows) = mkDf(200, "rv")

    val got = AsOfJoin.nearest(left, right)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2),
        Option(r.getTimestamp(3)).map(_.getTime)))
      .sortBy(t => (t._1, t._2, t._3))

    val expected = lrows.map { case (k, ts, lv) =>
      val m = rrows.filter(_._1 == k)
      val best = if (m.isEmpty) None else {
        val byDist = m.map(r => (math.abs(r._2 - ts), r._2))
        val minD = byDist.map(_._1).min
        // tie between a backward and a forward match: backward (≤ ts) wins
        Some(byDist.filter(_._1 == minD).map(_._2).min)
      }
      (k, ts, lv, best)
    }.sortBy(t => (t._1, t._2, t._3))

    got.zip(expected).foreach { case (g, e) => assert(g == e, s"\ngot: $g\nexp: $e") }
  }

  test("tolerance drops stale matches") {
    import spark.implicits._
    val left = Seq(("A", 100000L, 1.0)).toDF("key", "tsm", "lv")
      .selectExpr("key", "timestamp_millis(tsm) AS ts", "lv")
    val right = Seq(("A", 10000L, 9.0), ("A", 95000L, 8.0)).toDF("key", "tsm", "rv")
      .selectExpr("key", "timestamp_millis(tsm) AS ts", "rv")

    val m = AsOfJoin.backward(left, right, tolerance = Some("10 seconds")).collect()(0)
    assert(m.getTimestamp(3).getTime == 95000L) // within 10 s → match
    val none = AsOfJoin.backward(left, right, tolerance = Some("1 second")).collect()(0)
    assert(none.isNullAt(3)) // 5 s stale → dropped
  }
}
