package graft

import org.apache.spark.sql.SparkSession

/** ABBA for the r12 verdict's one unexplained regression (embed_project
  * 0.72→1.14 s) and for the dim-parameter fix: alternates the
  * [[operators.Similarity.randomProjection]] gate body with the embedding
  * width PASSED (no probe job) vs PROBED (the r12 form's per-call
  * `limit(1).collect()`), same JVM, interleaved, noop-written.
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.EmbedProbe
  */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def gate(dim: Int): Unit =
      operators.Similarity.randomProjection(
          sources.Tables(spark, sfDir, "embeddings"), outDim = 16, dim = dim)
        .write.format("noop").mode("overwrite").save()
    gate(64) // warm
    for (i <- 1 to 5) {
      time(s"[$i] embed_project dim PASSED") { gate(64) }
      time(s"[$i] embed_project dim PROBED") { gate(0) }
    }
    spark.stop()
  }
}
