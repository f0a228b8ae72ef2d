package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet test tables (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  * rejects; we read it as raw nanos (`spark.sql.legacy.parquet.nanosAsLong`)
  * and truncate to microseconds — the same truncation DuckDB applies, so
  * oracle comparisons line up.
  */
object Tables {

  val Names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** The `events` table shaped as ticks (key/ts/prices/isLive) so candle and
    * correlation operators can run against driver data at any scale factor.
    */
  def eventsAsTicks(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events").select(
      concat(lit("U"), col("user_id")).as("key"),
      col("ts"),
      col("value").as("bidPrice"),
      col("value").as("askPrice"),
      lit(true).as("isLive"))
}
