package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.{TopKPackedAgg, TopKPackedHeapAgg}

/** Measurement main behind [[graft.functions.TopKPackedAgg.declarativeMaxK]]:
  * times plan+execute of both `top_k_packed` forms across k on a tiny input,
  * so the numbers isolate PLANNING + codegen cost (the declarative failure
  * mode), not data volume.
  *
  * Recorded run (this container, local[4], 2026-08-15):
  * {{{
  *   k=3 decl 1.52s  heap 0.42s      k=6 decl  4.41s  heap 0.15s
  *   k=4 decl 0.87s  heap 0.28s      k=7 decl 15.91s  heap 0.24s
  *   k=5 decl 1.62s  heap 0.24s      k=8 decl 69.61s  heap 0.16s
  * }}}
  * plus 4 Janino "Code grows beyond 64 KB" codegen fallbacks from the
  * declarative updates at k ≥ 5. Hence the ~4.4×/k planning growth, the
  * k=4 routing boundary (largest k with bounded planning AND live
  * whole-stage codegen), and the heap form's flat ~0.2 s at any k.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (0 until 20).flatMap(g => (0 until 200)
        .map(i => (s"g$g", g * 100000L + i * 7L, i.toLong)))
      .toDF("g", "k", "p").repartition(8)
    df.count()
    for (k <- Seq(3, 4, 5, 6, 7, 8); form <- Seq("decl", "heap")) {
      val t0 = System.nanoTime()
      val ke = ColumnBridge.expression(col("k"))
      val pe = ColumnBridge.expression(col("p"))
      val agg =
        if (form == "decl") TopKPackedAgg(ke, pe, k).toAggregateExpression()
        else TopKPackedHeapAgg(ke, pe, k).toAggregateExpression()
      // the declarative form above declarativeMaxK is now REJECTED by its
      // own type check (the original measurements predate the bound);
      // report the rejection instead of timing it
      try {
        val n = df.groupBy(col("g"))
          .agg(ColumnBridge.column(agg).as("top")).collect().length
        println(f"k=$k%3d $form%s: ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
      } catch {
        case e: Exception =>
          println(f"k=$k%3d $form%s: rejected (${e.getMessage.linesIterator.next().take(100)}%s)")
      }
    }
    spark.stop()
  }
}
