package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times PLAN CONSTRUCTION (analysis → physical plan, no job) for the most
  * plan-heavy fanned operators — the ABBA harness for the
  * [[operators.Scans.fanToParallelism]] partition probe: the r12 form
  * called `df.rdd`, which appends a row→object deserializer and runs a
  * second full analyze/optimize/plan cycle per fanned call site, discarded
  * immediately; the r13 form reads `queryExecution.toRdd` off the
  * relation's own cached QueryExecution. corpus_curation builds several
  * fanned relations per query, so its build time is the sensitive probe.
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.PlanTimeProbe
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = sources.Tables(spark, sfDir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .withColumnRenamed("doc_id", "bench_id")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm: classloading + first parquet footer
    operators.Curation.curate(docs, bench).queryExecution.executedPlan
    operators.Dedup.minHashLsh(docs).queryExecution.executedPlan
    for (i <- 1 to 5) {
      time(s"[$i] curate PLAN") {
        operators.Curation.curate(docs, bench).queryExecution.executedPlan
      }
      time(s"[$i] minhash PLAN") {
        operators.Dedup.minHashLsh(docs).queryExecution.executedPlan
      }
      time(s"[$i] tfIdf PLAN") {
        operators.TextAnalysis.tfIdf(docs).queryExecution.executedPlan
      }
    }
    spark.stop()
  }
}
