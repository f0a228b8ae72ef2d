package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.{SqlFunctions, TopKPackedAgg, TopKPackedHeapAgg}

/** `top_k_packed` at LARGE k — the boundary the declarative form cannot
  * reach (its merge tree grows ~4.4^k: minutes/OOM to even plan at k≈12).
  * Proves the routed builder's heap form ([[TopKPackedHeapAgg]]) plans in
  * bounded time and answers correctly at k = 64 and k = maxK = 256, that
  * it agrees with the declarative form exactly at the routing boundary,
  * and that it shares the declarative contract (null-skip, loud negative
  * key, -1 padding).
  */
class TopKLargeSpec extends SparkSpec {
  import spark.implicits._

  /** Groups of distinct keys (payload = key * 7 + 1, so payload alignment
    * is checkable) spread over several partitions to force the partial /
    * merge / serialize path.
    */
  private def data(groups: Int, rowsPerGroup: Int, seed: Long): DataFrame = {
    val rng = new scala.util.Random(seed)
    val rows = for {
      g <- 0 until groups
      key <- rng.shuffle((0 until rowsPerGroup).toList)
        .map(i => g * 1000000L + i * 13L + rng.nextInt(12))
        .distinct
    } yield (s"g$g", key, key * 7L + 1L)
    rows.toDF("g", "k", "p").repartition(8)
  }

  private def reference(df: DataFrame, k: Int): Map[String, Seq[(Long, Long)]] =
    df.collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        val top = rs.map(r => (r.getLong(1), r.getLong(2)))
          .sortBy(-_._1).take(k).toSeq
        g -> (top ++ Seq.fill(k - top.size)((-1L, 0L)))
      }

  private def collectTop(df: DataFrame): Map[String, Seq[(Long, Long)]] =
    df.collect().map { r =>
      r.getString(0) -> r.getSeq[Row](1)
        .map(s => (s.getLong(0), s.getLong(1))).toSeq
    }.toMap

  test("heap form at k=64 and k=256: correct, ObjectHashAggregate, bounded plan time") {
    SqlFunctions.registerAll(spark)
    val df = data(groups = 20, rowsPerGroup = 400, seed = 42L)
    df.createOrReplaceTempView("topk_large_in")
    for (k <- Seq(64, 256)) {
      val t0 = System.nanoTime()
      val out = spark.sql(
        s"SELECT g, top_k_packed(k, p, $k) AS top FROM topk_large_in GROUP BY g")
      // the plan must be the imperative form (constant plan size), with
      // map-side partials — not the declarative codegen slots, whose merge
      // tree at this k would never finish planning
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
      assert(plan.contains("partial_top_k_packed"), plan.take(2000))
      val got = collectTop(out)
      val secs = (System.nanoTime() - t0) / 1e9
      // generous CI bound; the declarative form at k=12 already takes
      // minutes just to walk its tree once, so this catches any re-route
      assert(secs < 60.0, s"k=$k took ${secs}s — planner blow-up?")
      assert(got == reference(df, k), s"k=$k mismatch")
    }
  }

  test("routing boundary: declarative and heap agree exactly at k=4") {
    val df = data(groups = 8, rowsPerGroup = 30, seed = 7L)
    def run(heap: Boolean) = collectTop(
      df.groupBy(col("g")).agg(ColumnBridge.column {
        val ke = ColumnBridge.expression(col("k"))
        val pe = ColumnBridge.expression(col("p"))
        (if (heap) TopKPackedHeapAgg(ke, pe, 4).toAggregateExpression()
         else graft.functions.TopKPackedAgg(ke, pe, 4).toAggregateExpression())
      }.as("top")))
    val d = run(heap = false)
    val h = run(heap = true)
    assert(d == h)
    assert(d == reference(df, 4))
    // the routed builder picks declarative at the boundary, heap above it
    val one = ColumnBridge.expression(lit(1L))
    assert(TopKPackedAgg.expr(one, one, TopKPackedAgg.declarativeMaxK)
      .isInstanceOf[graft.functions.TopKPackedAgg])
    assert(TopKPackedAgg.expr(one, one, TopKPackedAgg.declarativeMaxK + 1)
      .isInstanceOf[TopKPackedHeapAgg])
  }

  test("heap form contract: null-skip, short-group padding, loud negative key") {
    SqlFunctions.registerAll(spark)
    // k=64 routes to the heap; 2 live rows + nulls in a single group
    val got = spark.sql(
      """SELECT top_k_packed(k, p, 64) AS top
        |FROM VALUES (5L, 36L), (CAST(NULL AS BIGINT), 99L),
        |            (9L, 64L), (7L, CAST(NULL AS BIGINT)) AS t(k, p)"""
        .stripMargin).collect()(0).getSeq[Row](0)
      .map(s => (s.getLong(0), s.getLong(1)))
    assert(got.take(2) == Seq((9L, 64L), (5L, 36L)))
    assert(got.drop(2) == Seq.fill(62)((-1L, 0L)))
    val e = intercept[Exception] {
      spark.sql(
        "SELECT top_k_packed(k, p, 64) FROM VALUES (-5L, 1L) AS t(k, p)")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-negative")), e.toString)
  }
}
