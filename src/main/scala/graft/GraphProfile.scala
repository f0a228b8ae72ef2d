package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Caches, Graphs, Similarity}
import graft.sources.Tables

/** Stage decomposition for the kNN-graph gate family (ann_graph,
  * ann_pagerank, graph_triangles, ann_graph_search): times nnDescent at
  * increasing depth, then each consumer over a PRE-BUILT (checkpointed)
  * graph so the consumer's own cost is isolated from the build it re-runs
  * by gate independence. Measurement tooling, not a gate.
  */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    def t(name: String)(body: => Unit): Unit = {
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        body
        println(f"[graph-profile] $name%-28s rep$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        Caches.release(spark); spark.catalog.clearCache()
      }
    }
    val emb = Tables(spark, sfDir, "embeddings")
    // warm-up: one full gate shape at the small sf
    noop(Similarity.nnDescent(Tables(spark, "/root/testdata/sf0.001",
      "embeddings"), k = 5, iters = 2, seedBuckets = 100))
    Caches.release(spark); spark.catalog.clearCache()

    t("nnDescent iters=0 (seed)") {
      noop(Similarity.nnDescent(emb, k = 5, iters = 0, seedBuckets = 100))
    }
    t("nnDescent iters=1") {
      noop(Similarity.nnDescent(emb, k = 5, iters = 1, seedBuckets = 100))
    }
    t("nnDescent iters=2 (=gate)") {
      noop(Similarity.nnDescent(emb, k = 5, iters = 2, seedBuckets = 100))
    }
    // consumers over a prebuilt graph (localCheckpoint cuts the build out)
    val g = Similarity.nnDescent(emb, k = 5, iters = 2, seedBuckets = 100)
      .localCheckpoint()
    g.count()
    Caches.release(spark)
    t("pageRank on prebuilt") {
      noop(Graphs.pageRank(
        g.select(col("vec_id").as("src"), col("neighbor").as("dst")), iters = 3))
    }
    t("triangles on prebuilt") {
      noop(Graphs.triangles(
        g.select(col("vec_id").as("src"), col("neighbor").as("dst"))))
    }
    t("graphSearch on prebuilt") {
      noop(Similarity.graphSearch(emb, emb.filter(col("vec_id") % 50 === 0),
        g, k = 5, beam = 10, hops = 3))
    }
    spark.stop()
  }
}
