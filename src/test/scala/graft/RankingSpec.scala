package graft

import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** Pins the distributed global rank's contract: equals the single-partition
  * row_number under the same total order, for ANY partition count.
  */
class RankingSpec extends SparkSpec {

  import spark.implicits._

  test("withGlobalRank == row_number for any partition count, ties split safely") {
    // heavy ties on the score column: only the (score, id) TOTAL order
    // makes the rank well-defined when range partitioning splits a tie run
    val df = (0L until 500L).map(i => (i, (i % 7).toDouble)).toDF("id", "score")
    val want = df
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id"))) - 1)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    for (p <- Seq(1, 3, 16)) {
      val got = Ranking.withGlobalRank(df,
          Seq(col("score").desc, col("id")), parts = p)
        .select("id", "rank").as[(Long, Long)].collect().toMap
      assert(got == want, s"parts=$p diverged")
    }
  }

  test("ranks are dense 0..n-1 and empty input yields empty output") {
    val df = Seq((10L, 1.0), (20L, 2.0), (30L, 0.5)).toDF("id", "score")
    val r = Ranking.withGlobalRank(df, Seq(col("score").desc, col("id")))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(r == Map(20L -> 0L, 10L -> 1L, 30L -> 2L), s"$r")
    val empty = Seq.empty[(Long, Double)].toDF("id", "score")
    assert(Ranking.withGlobalRank(empty,
      Seq(col("score").desc, col("id"))).count() == 0)
  }

  test("withGlobalPrefixSum: exclusive, order-correct, any partition count") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("id", "v")
    for (parts <- Seq(1, 2, 7)) {
      val r = Ranking.withGlobalPrefixSum(df, Seq(col("id")), col("v"),
          "pre", parts = parts)
        .select("id", "pre").as[(Long, Long)].collect().toMap
      assert(r == Map(1L -> 0L, 2L -> 10L, 3L -> 30L, 4L -> 60L),
        s"parts=$parts: $r")
    }
  }

  test("binaryAuc: tie-corrected rank sum equals pair counting") {
    // (score, y): ties at 1 (pos-neg) and 2 (pos-neg-neg)
    val df = Seq((1.0, 0), (1.0, 1), (2.0, 0), (2.0, 0), (2.0, 1), (3.0, 1))
      .toDF("score", "y")
    val r = Ranking.binaryAuc(df, col("score"), col("y") === 1).head()
    // pairwise: (wins + ties/2) / 9 = 5.5/9
    assert(r.getAs[Double]("auc") == math.round(5.5 / 9.0 * 1e6) / 1e6,
      r.toString)
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 3L)
    // perfect and inverted separability hit the bounds exactly
    val sep = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("score", "y")
    assert(Ranking.binaryAuc(sep, col("score"), col("y") === 1)
      .head().getAs[Double]("auc") == 1.0)
    assert(Ranking.binaryAuc(sep, col("score"), col("y") === 0)
      .head().getAs[Double]("auc") == 0.0)
    // degenerate label set (single class) → null auc, never NaN/Infinity
    val onecls = Ranking.binaryAuc(sep, col("score"), lit(true)).head()
    assert(onecls.isNullAt(onecls.fieldIndex("auc")) &&
      onecls.getAs[Long]("n_neg") == 0L, onecls.toString)
  }

  test("groupedAuc == per-segment binaryAuc, any partition count") {
    val df = Seq(
      ("a", 1.0, 0), ("a", 1.0, 1), ("a", 2.0, 0), ("a", 2.0, 0),
      ("a", 2.0, 1), ("a", 3.0, 1),                 // the tie case: 5.5/9
      ("b", 1.0, 0), ("b", 2.0, 1),                 // perfect: 1.0
      ("c", 5.0, 1), ("c", 6.0, 1)                  // one class: null
    ).toDF("seg", "score", "y")
    for (parts <- Seq(1, 3)) {
      val got = Ranking.groupedAuc(
          df.repartition(parts), "seg", col("score"), col("y") === 1)
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(got("a") == math.round(5.5 / 9.0 * 1e6) / 1e6, s"$parts $got")
      assert(got("b") == 1.0 && got("c") == null, s"$parts $got")
    }
  }

  test("confusionSweep: counts at each cut; empty threshold bins survive") {
    val df = Seq((1.0, 0), (1.0, 1), (2.0, 0), (2.0, 0), (2.0, 1), (3.0, 1))
      .toDF("score", "y")
    val r = Ranking.confusionSweep(df, col("score"), col("y") === 1,
        edges = Seq(1.5, 2.5))
      .orderBy("threshold").collect()
    assert(r.length == 2)
    val t1 = r(0)
    assert(t1.getAs[Double]("threshold") == 1.5 &&
      t1.getAs[Long]("tp") == 2L && t1.getAs[Long]("fp") == 2L &&
      t1.getAs[Long]("fn") == 1L && t1.getAs[Long]("tn") == 1L &&
      t1.getAs[Double]("precision") == 0.5 &&
      t1.getAs[Double]("recall") == 0.666667, t1.toString)
    val t2 = r(1)
    assert(t2.getAs[Long]("tp") == 1L && t2.getAs[Long]("fp") == 0L &&
      t2.getAs[Long]("tn") == 3L && t2.getAs[Double]("precision") == 1.0,
      t2.toString)
    // interval (1.5, 1.6] holds no rows — its threshold row must still emit
    val gap = Ranking.confusionSweep(df, col("score"), col("y") === 1,
        edges = Seq(1.5, 1.6))
      .orderBy("threshold").collect()
    assert(gap.length == 2 &&
      gap(0).getAs[Long]("tp") == gap(1).getAs[Long]("tp"), gap.mkString)
  }
}
