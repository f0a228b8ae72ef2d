package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Measurement harness for ANN quality-vs-scale (VERDICT r7 task 8): runs
  * the ann_recall gate's exact/IVF/LSH/quantized quartet on
  * SPARK_GRAFT_SF_DIR's embeddings table, printing per-method wall time and
  * the recall@k table, with an optional IVF nprobe sweep — the number the
  * sf0.1 recall gate can't show is whether the nprobe default survives a
  * 10× corpus (10× inverted lists at fixed centroidEvery ⇒ the probed
  * fraction SHRINKS 10×). Absolute times are single in-process runs (warm
  * codegen, no surrounding sweep) — compare ratios within one invocation,
  * not against recorded sweeps.
  *
  * Env: SPARK_GRAFT_SF_DIR (default driver sf0.1), SPARK_GRAFT_CPUS
  * (default 32), GRAFT_NPROBES (comma list, default "2" — the gate
  * default), GRAFT_ANN_K (default 5, the gate's k).
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nprobes = sys.env.getOrElse("GRAFT_NPROBES", "2").split(",").map(_.trim.toInt)
    // centroid stride(s) for the IVF rows: 40 = the gate default (linear
    // centroid growth), 0 = auto ncentroids ~ sqrt(n)
    val strides = sys.env.getOrElse("GRAFT_CENTROID_EVERY", "40")
      .split(",").map(_.trim.toInt)
    val k = sys.env.getOrElse("GRAFT_ANN_K", "5").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Caches, Similarity}
    import graft.sources.Tables

    // warm-up on the small driver SF: JIT + codegen priced out of the runs
    {
      val e0 = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      val q0 = e0.filter(col("vec_id") % 50 === 0)
      Similarity.recallAtK(Similarity.bruteForceTopK(e0, q0, k),
          Seq("ivf" -> Similarity.ivfTopK(e0, q0, k)))
        .write.format("noop").mode("overwrite").save()
      Caches.release(spark); spark.catalog.clearCache()
    }

    val emb = Tables(spark, sfDir, "embeddings")
    val qs = emb.filter(col("vec_id") % 50 === 0)
    // untimed IVF pass over the TARGET corpus: the first IVF execution in a
    // probe otherwise absorbs the ObjectHashAggregate/codegen JIT for the
    // assignment path (measured ~4× on its row) and misreads as a slope
    Similarity.ivfTopK(emb, qs, k)
      .write.format("noop").mode("overwrite").save()
    Caches.release(spark); spark.catalog.clearCache()
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // exact side once, pinned — the recall denominator for every method
    val (exact, tEx) = timed {
      val e = Caches.pin(Similarity.bruteForceTopK(emb, qs, k))
      e.count(); e
    }
    println(f"exact          ${tEx}%7.2f s   recall 1.000000 (definition)")
    val methods: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
      Seq("lsh" -> (() => Similarity.lshTopK(emb, qs, k)),
        "quantized" -> (() => Similarity.quantizedTopK(emb, qs, k)),
        // graph build covers EVERY vector; recall reads the query rows out
        // of the full kNN graph (the honest cost: a whole-corpus build)
        "graph(i=2)" -> (() =>
          Similarity.nnDescent(emb, k, iters = 2, seedBuckets = 0)
            .filter(col("vec_id") % 50 === 0)
            .withColumnRenamed("vec_id", "q_id")),
        "graph(i=3)" -> (() =>
          Similarity.nnDescent(emb, k, iters = 3, seedBuckets = 0)
            .filter(col("vec_id") % 50 === 0)
            .withColumnRenamed("vec_id", "q_id"))) ++
        (for (s <- strides.toSeq; p <- nprobes.toSeq) yield
          s"ivf(s=$s,np=$p)" -> (() =>
            Similarity.ivfTopK(emb, qs, k, centroidEvery = s, nprobe = p)))
    methods.foreach { case (name, mk) =>
      val (row, t) = timed {
        Similarity.recallAtK(exact, Seq(name -> mk())).collect().head
      }
      println(f"$name%-14s ${t}%7.2f s   recall ${row.getAs[Double]("recall")}%.6f" +
        f"   (${row.getAs[Long]("hits")}/${row.getAs[Long]("total")})")
    }
    Caches.release(spark)
    spark.stop()
  }
}
