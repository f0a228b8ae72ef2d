package graft

import org.apache.spark.sql.functions._

import graft.functions.SqlFunctions
import graft.operators.Similarity

/** The registered SQL functions must agree with their Column-API twins. */
class SqlFunctionsSpec extends SparkSpec {

  test("pearson_aligned / cosine_sim / md5_long callable from SQL") {
    SqlFunctions.registerAll(spark)

    val r = spark.sql(
      """SELECT pearson_aligned(
        |         array(1L, 2L, 3L, 4L), array(1.0d, 2.0d, 3.0d, 4.0d),
        |         array(2L, 3L, 4L, 5L), array(6.0d, 4.0d, 2.0d, 0.0d)) AS pr
        |""".stripMargin).select(col("pr.r"), col("pr.n")).collect()(0)
    assert(math.abs(r.getDouble(0) - (-1.0)) < 1e-12) // aligned ts 2,3,4: opposing
    assert(r.getLong(1) == 3)

    val c = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.6d, 0.8d)) AS c").collect()(0)
    assert(math.abs(c.getDouble(0) - 0.6) < 1e-12)

    // top_k_packed: per-group k largest keys with payload, -1-padded
    val t = spark.sql(
      """SELECT g, top_k_packed(k, p, 2) AS top
        |FROM VALUES ('a', 5L, 50L), ('a', 9L, 90L), ('a', 7L, 70L),
        |            ('b', 3L, 30L) AS t(g, k, p)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val ta = t(0).getSeq[org.apache.spark.sql.Row](1)
    assert(ta.map(r => (r.getLong(0), r.getLong(1))) == Seq((9L, 90L), (7L, 70L)))
    val tb = t(1).getSeq[org.apache.spark.sql.Row](1)
    assert(tb.map(r => (r.getLong(0), r.getLong(1))) == Seq((3L, 30L), (-1L, 0L)))
    // null keys/payloads are SKIPPED, never ranked or poisoning the buffer
    val tn = spark.sql(
      """SELECT top_k_packed(k, p, 2) AS top
        |FROM VALUES (5L, 50L), (CAST(NULL AS BIGINT), 99L),
        |            (9L, CAST(NULL AS BIGINT)) AS t(k, p)""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tn.map(r => (r.getLong(0), r.getLong(1))) == Seq((5L, 50L), (-1L, 0L)))
    // k must be a literal — it sizes the aggregation buffer
    val e = intercept[Exception] {
      spark.sql("SELECT top_k_packed(k, p, k) FROM VALUES (1L, 1L) AS t(k, p) GROUP BY 1=1").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("integer literal"), e.getMessage)
    // ... and bounded (it sizes the per-group slot buffer)
    val eb = intercept[Exception] {
      spark.sql("SELECT top_k_packed(k, p, 9999999999) FROM VALUES (1L, 1L) AS t(k, p)").collect()
    }
    assert(Option(eb.getMessage).getOrElse("").contains("[1, 256]") ||
      Option(eb.getMessage).getOrElse("").contains("overflow"), eb.getMessage)
    // negative keys collide with the -1 sentinel — loud error, not a
    // silent drop (SQL users pass raw signed values; pack first)
    val en = intercept[Exception] {
      spark.sql("SELECT top_k_packed(k, p, 2) FROM VALUES (-5L, 1L) AS t(k, p)").collect()
    }
    assert(Option(en.getMessage).getOrElse("")
      .contains("non-negative") || en.getCause != null, en.getMessage)

    // SQL md5_long == Column-API md5Long on the same input
    import spark.implicits._
    val df = Seq("alpha", "beta", "").toDF("s")
    df.createOrReplaceTempView("t_md5")
    val viaSql = spark.sql("SELECT md5_long(s) AS h FROM t_md5").collect().map(_.getLong(0))
    val viaCol = df.select(graft.operators.TextAnalysis.md5Long(col("s")))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq == viaCol.toSeq)

    // and the SQL cosine agrees with the operator used by ANN
    val both = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0))).toDF("a", "b")
    val s1 = both.select(Similarity.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    both.createOrReplaceTempView("t_cos")
    val s2 = spark.sql("SELECT cosine_sim(a, b) FROM t_cos").collect()(0).getDouble(0)
    assert(s1 == s2)

    // wrong arity surfaces as a named signature error, not an index crash
    val err = intercept[Exception] {
      spark.sql("SELECT pearson_aligned(array(1L), array(1.0d))").collect()
    }
    assert(err.getMessage.contains("takes 4 arguments")
      || Option(err.getCause).exists(_.getMessage.contains("takes 4 arguments")),
      s"unexpected error: ${err.getMessage}")
  }
}
