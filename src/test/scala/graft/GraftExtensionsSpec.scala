package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions entry point must give a fresh session the
  * engine's SQL functions with no graft code on the call path.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injection registers pearson_aligned in a new session") {
    // The config path (spark.sql.extensions=graft.GraftExtensions) is static
    // conf applied at SparkContext creation, so the shared-context test JVM
    // exercises the same injection through the public withExtensions builder.
    val orig = spark // force the shared session (and its context) to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions())
      .getOrCreate() // new session over the same context, extensions applied
    try {
      assert(s2 ne orig)
      val r = s2.sql(
        """SELECT pearson_aligned(
          |  array(1L, 2L, 3L), array(1.0d, 2.0d, 3.0d),
          |  array(1L, 2L, 3L), array(2.0d, 4.0d, 6.0d)) AS p""".stripMargin)
        .selectExpr("p.r", "p.n").collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getLong(1) == 3)

      val err = intercept[Exception] {
        s2.sql("SELECT pearson_aligned(array(1L))").collect()
      }
      assert(err.getMessage.contains("takes 4 arguments")
        || Option(err.getCause).exists(_.getMessage.contains("takes 4 arguments")))
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
