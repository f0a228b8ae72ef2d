package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet test tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two physical layouts across driver
  * generations: parquet TIMESTAMP(NANOS) — which lands as a raw nanos
  * BIGINT under `spark.sql.legacy.parquet.nanosAsLong` — and plain
  * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ. Both are
  * normalized to the session-UTC `TimestampType` every downstream operator
  * and oracle was built against (sessions run `spark.sql.session.timeZone
  * = UTC`, so the NTZ→TZ cast is value-preserving — the same wall-clock
  * instants DuckDB sees in its naive TIMESTAMP).
  */
object Tables {

  val Names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos → µs truncation
          timestamp_micros(expr("ts div 1000"))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          col("ts").cast("timestamp") // UTC session ⇒ value-preserving
        case _ => col("ts")
      }
      raw.withColumn("ts", ts)
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
