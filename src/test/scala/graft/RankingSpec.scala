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
}
