package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftshim.FunctionBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL surface for the engine's scalar functions (SURVEY §7 step 7): after
  * `SqlFunctions.registerAll(spark)`, SQL text can call
  *
  *  - `pearson_aligned(tsA, retA, tsB, retB)` — the codegen timestamp-aligned
  *    Pearson kernel (`struct<r, n>`), registered straight into the session
  *    function registry as a Catalyst expression builder;
  *  - `top_k_packed(key, payload, k)` — the bounded per-group top-k
  *    aggregate (k largest packed longs + payloads, map-side k-slot
  *    partials, no sort; see [[TopKPackedAgg]]),
  *  - `cosine_sim(a, b)` — fold-left cosine over `array<double>`,
  *  - `md5_long(s)` — the engine-portable 60-bit md5 hash the dedup/text
  *    operators build on,
  *
  * the latter two as Spark 4 SQL UDFs (`CREATE TEMPORARY FUNCTION … RETURN`)
  * whose bodies are the exact SQL forms of the Column-API definitions —
  * analyzer-resolved and fully codegen'd, unlike black-box Scala UDFs.
  */
object SqlFunctions {

  /** Expression builder for `top_k_packed(key BIGINT, payload BIGINT, k)`:
    * the bounded per-group top-k aggregate ([[TopKPackedAgg]]); `k` must
    * be an integer literal (it sizes the aggregation buffer at plan time).
    * The analyzer wraps the returned AggregateFunction itself.
    */
  private[graft] val topKPackedBuilder: Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 3) throw new IllegalArgumentException(
        s"top_k_packed(key BIGINT, payload BIGINT, k INT) takes 3 arguments, got ${exprs.length}")
      val k = exprs(2) match {
        case Literal(v: Int, IntegerType) => v
        // exact, not truncating: a Long literal beyond Int silently
        // becoming a small k would return wrong answers without erroring
        case Literal(v: Long, LongType) => Math.toIntExact(v)
        case other => throw new IllegalArgumentException(
          s"top_k_packed: k must be an integer literal (it sizes the agg buffer), got $other")
      }
      if (k < 1 || k > TopKPackedAgg.maxK) throw new IllegalArgumentException(
        s"top_k_packed: k must be in [1, ${TopKPackedAgg.maxK}], got $k")
      // routed: codegen declarative slots for small k, constant-plan-size
      // imperative buffer above declarativeMaxK (the declarative merge
      // tree grows ~4.4^k — a planner DoS past k≈8)
      TopKPackedAgg.expr(exprs(0), exprs(1), k)
    }

  def registerAll(spark: SparkSession): Unit = {
    FunctionBridge.registerTemp(spark, "pearson_aligned", exprs => {
      if (exprs.length != 4) throw new IllegalArgumentException(
        "pearson_aligned(tsA ARRAY<TIMESTAMP>, retA ARRAY<DOUBLE>, " +
          s"tsB ARRAY<TIMESTAMP>, retB ARRAY<DOUBLE>) takes 4 arguments, got ${exprs.length}")
      PearsonAligned(exprs(0), exprs(1), exprs(2), exprs(3))
    })

    FunctionBridge.registerTemp(spark, "top_k_packed", topKPackedBuilder)

    // body == Similarity.cosine (fold-left, deterministic accumulation order)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(
        |    a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        |RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (s, x) -> s + x)
        |  / (sqrt(aggregate(a, 0.0d, (s, x) -> s + x * x))
        |     * sqrt(aggregate(b, 0.0d, (s, x) -> s + x * x)))""".stripMargin)

    // body == TextAnalysis.md5Long (60-bit md5 hex prefix)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION md5_long(s STRING) RETURNS BIGINT
        |RETURN CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)""".stripMargin)
  }
}
