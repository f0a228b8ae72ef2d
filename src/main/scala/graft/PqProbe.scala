package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for ann_pq at an sf dir: training vs encode vs
  * query-scan cost, so optimization effort lands on the real bottleneck.
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.PqProbe
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = sources.Tables(spark, sfDir, "embeddings")
    println(s"rows: ${emb.count()}")
    // warm the scan
    emb.write.format("noop").mode("overwrite").save()
    // full gate
    time("full pqTopK") {
      operators.Similarity.pqTopK(emb, emb.filter(col("vec_id") % 50 === 0), 5)
        .write.format("noop").mode("overwrite").save()
    }
    // run again to split JIT from steady-state
    time("full pqTopK (2nd)") {
      operators.Similarity.pqTopK(emb, emb.filter(col("vec_id") % 50 === 0), 5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
