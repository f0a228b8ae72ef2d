package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed metadata,
  * processed by partition-wise "decoders".
  *
  * The Spark-side architecture is the real deliverable here — schema,
  * partition-batched decode via `mapPartitions` on a typed Dataset, stable
  * feature schema out — while the actual media codec is STUBBED with a
  * deterministic fake (this container has no image/audio libraries): the
  * stub derives pseudo-dimensions from the payload's md5. Swapping in a real
  * decoder changes only [[decodeStub]].
  *
  * At 100 TB: payloads stay in their parquet row groups until the decode
  * stage; `mapPartitions` amortizes per-batch codec setup (the reason
  * real pipelines use Arrow-batched UDFs); decode output is narrow
  * (features only), so the wide binary column is pruned immediately after.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Shape any table with an id and a string column into a media table:
    * payload := utf-8 bytes (stand-in for real image/audio bytes), kind
    * derived from the id for variety.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      col(payloadCol).cast("binary").as("payload"))

  /** STUB decoder — deterministic fake of an image/audio/video codec:
    * "dimensions" are carved from the payload's md5 so they're stable,
    * engine-reproducible, and exercise the full feature schema. A real
    * implementation would decode `payload` here (e.g. via javax.imageio),
    * one codec instance per partition.
    */
  private def decodeStub(md: MessageDigest, r: MediaRow): MediaFeatures = {
    val digest = md.digest(r.payload)
    val hex = digest.map("%02x".format(_)).mkString
    val w = 16 + (java.lang.Long.parseLong(hex.substring(0, 4), 16) % 4080).toInt
    val h = 16 + (java.lang.Long.parseLong(hex.substring(4, 8), 16) % 2144).toInt
    val frames = r.kind match {
      case "video/mp4" => 1 + (java.lang.Long.parseLong(hex.substring(8, 12), 16) % 600).toInt
      case _           => 1
    }
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, hex, w, h, frames)
  }

  /** Partition-batched feature extraction: one "codec" (here: MessageDigest)
    * per partition, streamed over the rows — the mapInPandas/Arrow-batch
    * shape expressed in Scala. This is the seam where a REAL codec plugs in;
    * while the decode is still the md5 stub, prefer
    * [[extractFeaturesExpr]], which computes the identical features without
    * leaving whole-stage codegen.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.selectExpr("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5") // per-partition codec setup
        rows.map(r => decodeStub(md, r))
      }
  }

  /** Expression fast path for the STUB decode: the same features as
    * [[extractFeatures]] (asserted equal by MultimodalSpec), computed with
    * built-in codegen'd expressions — no row deserialization, no codegen
    * break, payload pruned right at the scan. Use until a real codec
    * replaces [[decodeStub]]; the schema is identical so callers swap
    * freely. `explode(array(md5))` is a Generate barrier pinning the digest
    * to one evaluation across the four features derived from it.
    */
  def extractFeaturesExpr(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        explode(array(md5(col("payload")))).as("checksum"))
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        (conv(substring(col("checksum"), 1, 4), 16, 10).cast("long") % 4080L + 16L)
          .cast("int").as("width"),
        (conv(substring(col("checksum"), 5, 4), 16, 10).cast("long") % 2144L + 16L)
          .cast("int").as("height"),
        when(col("kind") === "video/mp4",
            (conv(substring(col("checksum"), 9, 4), 16, 10).cast("long") % 600L + 1L)
              .cast("int"))
          .otherwise(lit(1)).as("n_frames"))

  /** Resize plan for image/video rows: fit each media's (width, height)
    * into a `box`×`box` bounding box preserving aspect ratio (integer
    * floor, never upscale) — the sizing arithmetic of a thumbnail/vision-
    * preprocessing stage, computed as exact integer expressions so the plan
    * is engine-reproducible. The payload re-encode itself is the same stub
    * seam as [[decodeStub]]: a real pipeline would map the payload through
    * a codec here; the PLAN (which rows, what target dims) is the
    * Spark-side deliverable.
    */
  def resizePlan(features: DataFrame, box: Int): DataFrame = {
    require(box >= 1, s"bounding box must be >= 1, got $box")
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val longest = greatest(w, h)
    val needs = longest > box
    features
      .filter(col("kind").isin("image/png", "video/mp4"))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        when(needs, (w * box / longest).cast("int")).otherwise(col("width"))
          .as("target_w"),
        when(needs, (h * box / longest).cast("int")).otherwise(col("height"))
          .as("target_h"),
        needs.as("resized"))
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index as a
    * (media_id, frame_no) row — the explode-side of a decode-then-sample
    * pipeline, kept narrow so the payload never re-shuffles.
    */
  def sampleFrames(features: Dataset[_], stride: Int): DataFrame =
    features.toDF()
      .filter(col("kind") === "video/mp4")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(stride))).as("frame_no"))
}
