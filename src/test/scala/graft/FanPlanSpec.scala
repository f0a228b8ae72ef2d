package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Scans, Similarity}
import graft.sources.Tables

/** Regression pins for the r12 partition-starvation fix: the fanned sites
  * rely on `repartition(defaultParallelism)` STAYING that wide. AQE's
  * partition coalescing (or a future Spark changing REPARTITION_BY_NUM
  * semantics) could silently shrink the fan back to the starved shape on
  * small advisory sizes — these tests fail loudly if it ever does.
  */
class FanPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def parallelism = spark.sparkContext.defaultParallelism

  /** Run `body` with AQE coalescing at its most aggressive: tiny relations
    * would collapse to one partition if the fan's exchange were eligible.
    */
  private def withHostileAqe[T](body: => T): T = {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** EXECUTED partition spread of `df` — the ground truth the plan pins
    * approximate: how many distinct tasks actually carried rows.
    */
  private def executedSpread(df: DataFrame): Long =
    df.select(spark_partition_id().as("pid")).distinct().count()

  test("fanToParallelism survives aggressive AQE coalescing at execution") {
    withHostileAqe {
      // 1-partition input, KBs of data — far below the 64m advisory, so if
      // the fan's exchange were coalescible AQE would merge it back to 1
      val narrow = spark.range(0, 100000).toDF("id").coalesce(1)
      val fanned = Scans.fanToParallelism(narrow)
      assert(executedSpread(fanned) == parallelism,
        "fan collapsed under AQE coalescing")
    }
  }

  test("fanToParallelism only widens, passes streaming through, honors the byte guard") {
    // already at/above session parallelism: returned as-is (no exchange)
    val wide = spark.range(0, 1000, 1, parallelism * 2).toDF("id")
    assert(Scans.fanToParallelism(wide) eq wide)
    // below the byte guard: returned as-is
    val tiny = spark.range(0, 10).toDF("id").coalesce(1)
    assert(Scans.fanToParallelism(tiny, minBytes = 1L << 20) eq tiny)
    // streaming: pass-through, no AnalysisException from the partition probe
    val stream = spark.readStream.format("rate").load()
    assert(Scans.fanToParallelism(stream) eq stream)
  }

  // One representative gate per fanned family: the REPARTITION_BY_NUM
  // exchange must sit in the physical plan at session parallelism. The
  // starved testdata scans (one row group) make the fan mandatory here.
  private def fanExchanges(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.toString().linesIterator
      .filter(l => l.contains("RoundRobinPartitioning") &&
        l.contains("REPARTITION_BY_NUM"))
      .toSeq

  test("shingle-explode family plans the fan at session parallelism") {
    val ex = fanExchanges(Dedup.minHashLsh(Tables(spark, dir, "documents")))
    assert(ex.nonEmpty, "minHashLsh lost its scan fan")
    assert(ex.forall(_.contains(s"RoundRobinPartitioning($parallelism)")),
      s"fan not at session parallelism:\n${ex.mkString("\n")}")
  }

  test("pair-join family plans the fan at session parallelism") {
    withHostileAqe {
      // synthetic corpus big enough to clear fanOut's 2 MiB stats guard —
      // note the guard reads the PLAN-STATS estimate, which prices the
      // array column at its 8-byte default, so the row count must carry it
      val corpus = spark.range(0, 200000)
        .select(col("id").as("vec_id"),
          expr("transform(sequence(0, 63), j -> cast(pmod(id * (j + 3), 97) " +
            "as double))").as("embedding"))
        .coalesce(1)
      val queries = corpus.filter(col("vec_id") % 1000 === 0)
      val ex = fanExchanges(Similarity.bruteForceTopK(corpus, queries, 3))
      assert(ex.nonEmpty, "bruteForceTopK lost its pair-stage fan")
      assert(ex.forall(_.contains(s"RoundRobinPartitioning($parallelism)")),
        s"fan not at session parallelism:\n${ex.mkString("\n")}")
    }
  }

  test("codec-seam family plans the fan at session parallelism") {
    val ex = fanExchanges(Multimodal.extractFeatures(
      Multimodal.wavMediaTable(Tables(spark, dir, "documents"), "doc_id"))
      .toDF())
    assert(ex.nonEmpty, "wavMediaTable lost its codec-seam fan")
    assert(ex.forall(_.contains(s"RoundRobinPartitioning($parallelism)")),
      s"fan not at session parallelism:\n${ex.mkString("\n")}")
  }
}
