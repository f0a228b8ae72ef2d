package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pluggable LIVE tick-ingest seam.
  *
  * The reference positions Pub/Sub as its production ingest
  * (`README.MD:23`) but ships only an in-memory sample source
  * (`GenerateSampleData.java:81-159`). On Spark the production equivalent
  * is a broker-backed Structured Streaming source; everything downstream
  * (candles, correlations, dedup) consumes a plain unbounded DataFrame in
  * the tick schema, so the broker choice is exactly one implementation of
  * this trait.
  *
  * Contract: [[ticks]] returns an UNBOUNDED stream with schema
  * `(key string, ts timestamp, bidPrice double, askPrice double,
  * isLive boolean)` — the same shape the batch fixtures use. Event time is
  * `ts`; callers add their own watermark (policy belongs to the query, not
  * the source).
  */
trait TickSource {
  def ticks(spark: SparkSession): DataFrame
}

object TickSource {

  /** The tick payload schema every implementation must land on. */
  val schema: StructType = StructType.fromDDL(
    "key STRING, ts TIMESTAMP, bidPrice DOUBLE, askPrice DOUBLE, " +
      "isLive BOOLEAN")

  /** Self-contained live feed on the in-core `rate` source — deterministic
    * per-key sinusoid prices, no external broker. The in-repo default; see
    * [[IO.readStreamRateTicks]] for the price construction.
    */
  final case class Rate(rowsPerSecond: Int = 100, nKeys: Int = 5,
      numPartitions: Int = 1) extends TickSource {
    def ticks(spark: SparkSession): DataFrame =
      IO.readStreamRateTicks(spark, rowsPerSecond, nKeys, numPartitions)
  }

  /** Kafka-backed tick feed: JSON tick payloads on a topic. The Spark
    * equivalent of the reference's Pub/Sub ingest.
    *
    * The `kafka` format is resolved BY NAME at stream construction, so
    * this adapter compiles and ships without the connector jars
    * (`spark-sql-kafka-0-10` + `kafka-clients`, not bundled in
    * `spark/jars` and absent from this offline build); on a cluster with
    * the connector on the classpath it works as-is. Without the jars,
    * [[ticks]] fails fast with Spark's `DATA_SOURCE_NOT_FOUND` /
    * "Failed to find the data source: kafka" error — the smoke test pins
    * that failure mode so the gap stays visible instead of latent.
    *
    * Malformed payloads decode to null fields (`from_json` semantics) and
    * are dropped by the `key IS NOT NULL` guard rather than killing the
    * query; `isLive` defaults true for present rows (a live feed's rows
    * are live by definition — synthetic gap-fill rows are born downstream,
    * `operators.Candles`).
    */
  final case class Kafka(bootstrapServers: String, topic: String,
      startingOffsets: String = "latest") extends TickSource {
    def ticks(spark: SparkSession): DataFrame =
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load()
        .select(from_json(col("value").cast("string"), schema).as("t"))
        .select(col("t.key"), col("t.ts"), col("t.bidPrice"),
          col("t.askPrice"), coalesce(col("t.isLive"), lit(true)).as("isLive"))
        .filter(col("key").isNotNull && col("ts").isNotNull)
  }

  /** File-landing tick feed (a directory another job appends parquet to) —
    * the batch→streaming bridge as a [[TickSource]].
    */
  final case class Files(path: String) extends TickSource {
    def ticks(spark: SparkSession): DataFrame =
      IO.readStreamParquet(spark, path, schema)
  }
}
