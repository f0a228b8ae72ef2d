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
    // single-query run isolates training+encode from the |q|×n pair scan
    time("pqTopK 1 query") {
      operators.Similarity.pqTopK(emb, emb.filter(col("vec_id") === 0), 5)
        .write.format("noop").mode("overwrite").save()
    }
    // join-mechanics A/B with the exact pair-stage shape (16-int codes ×
    // broadcast 16×16-double tables + window top-5): BroadcastNestedLoopJoin
    // (crossJoin) vs constant-key BroadcastHashJoin — BNLJ does not
    // participate in whole-stage codegen, so every pair materializes a
    // JoinedRow carrying the ~2 KB table payload before the projection
    import org.apache.spark.sql.functions.{expr, row_number, broadcast, lit, element_at, round => fround}
    val codes = emb.select(col("vec_id"),
      expr("transform(sequence(0,15), i -> cast(pmod(vec_id*(i+7), 16) as int))")
        .as("codes"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"),
        expr("transform(sequence(0,15), i -> transform(sequence(0,15), " +
          "c -> cast(pmod(q_id*(i+3)+c, 97) as double)))").as("dt"))
    val adist = (0 until 16).map(i =>
      element_at(element_at(col("dt"), i + 1),
        element_at(col("codes"), i + 1) + 1)).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adist"), col("vec_id"))
    def rank(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adist", fround(adist, 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id"), col("adist"), col("rk"))
    for (_ <- 1 to 2) {
      time("pair stage via crossJoin (BNLJ)") {
        rank(codes.crossJoin(broadcast(q)))
          .write.format("noop").mode("overwrite").save()
      }
      time("pair stage via const-key BHJ") {
        rank(codes.withColumn("jk", lit(1))
            .join(broadcast(q.withColumn("jk", lit(1))), "jk"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // REAL pipeline stage split (same expressions pqTopK builds)
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val books = time("lloydJoint training") {
      operators.Similarity.lloydJoint(e, 16, 4, 16, 3)
    }
    val realCodes = e.select(col("vec_id"),
      graft.functions.PqCodes(col("v"), books).as("codes"))
    val realQ = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"),
        graft.functions.PqTables(col("v"), books).as("dt"))
    time("real codes scan") {
      realCodes.write.format("noop").mode("overwrite").save()
    }
    time("real q tables") {
      realQ.write.format("noop").mode("overwrite").save()
    }
    for (_ <- 1 to 2) {
      time("real pair stage (BNLJ)") {
        rank(realCodes.crossJoin(broadcast(realQ)))
          .write.format("noop").mode("overwrite").save()
      }
    }
    val plan = rank(realCodes.crossJoin(broadcast(realQ)))
      .queryExecution.executedPlan.toString
    println("pq_codes occurrences in executed plan: " +
      "pq_codes".r.findAllIn(plan).length)
    println("pq_tables occurrences in executed plan: " +
      "pq_tables".r.findAllIn(plan).length)
    // pair stage from MATERIALIZED inputs: if this is fast, the cost above
    // lives in how the expression outputs flow into the join, not the data
    val mc = realCodes.localCheckpoint()
    val mq = realQ.localCheckpoint()
    println(s"materialized: ${mc.count()} codes, ${mq.count()} tables")
    println(s"stream-side partitions: ${realCodes.rdd.getNumPartitions}")
    println("codes stats bytes: " +
      realCodes.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("emb stats bytes: " +
      e.queryExecution.optimizedPlan.stats.sizeInBytes)
    for (_ <- 1 to 2) {
      time("materialized pair stage (BNLJ)") {
        rank(mc.crossJoin(broadcast(mq)))
          .write.format("noop").mode("overwrite").save()
      }
      time("repartitioned pair stage (BNLJ)") {
        rank(realCodes.repartition(32).crossJoin(broadcast(realQ)))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
