package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: stable feature schema from the partition-batched
  * decode, and frame-sampling plans consistent with the decoded metadata.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.asMediaTable(
    Tables(spark, "/root/testdata/sf0.001", "documents"), "doc_id", "text")

  test("decode is deterministic and preserves every row") {
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == media.count())
    // re-running the decode yields identical features (stub is a pure fn)
    val again = Multimodal.extractFeatures(media)
    assert(feats.toDF().except(again.toDF()).count() == 0)
    val r = feats.toDF().agg(
      min(col("width")), max(col("width")),
      min(col("height")), max(col("height")),
      min(col("n_frames"))).collect()(0)
    assert(r.getInt(0) >= 16 && r.getInt(1) < 16 + 4080)
    assert(r.getInt(2) >= 16 && r.getInt(3) < 16 + 2144)
    assert(r.getInt(4) >= 1)
    // only video rows may have multiple frames
    assert(feats.filter(col("n_frames") > 1 && col("kind") =!= "video/mp4").isEmpty)
  }

  test("expression fast path == mapPartitions codec seam, and stays codegen") {
    val seam = Multimodal.extractFeatures(media).toDF()
    val fast = Multimodal.extractFeaturesExpr(media)
    assert(fast.schema.fieldNames.toSeq == seam.schema.fieldNames.toSeq)
    assert(fast.except(seam).count() == 0 && seam.except(fast).count() == 0)
    // the fast path must not break whole-stage codegen with a typed map
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), s"codegen break:\n$plan")
  }

  test("sampleFrames emits ceil(n_frames/stride) plan rows per video") {
    val feats = Multimodal.extractFeatures(media)
    val stride = 7
    val plan = Multimodal.sampleFrames(feats, stride)
    val counts = plan.groupBy("media_id").count()
      .join(feats.toDF().filter(col("kind") === "video/mp4")
        .select(col("media_id"), col("n_frames")), "media_id")
      .collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      val expected = (r.getAs[Int]("n_frames") + stride - 1) / stride
      assert(r.getAs[Long]("count") == expected, s"bad plan count: $r")
    }
    // frame indexes stay in range
    val bad = plan.join(feats.toDF().select(col("media_id"), col("n_frames")), "media_id")
      .filter(col("frame_no") >= col("n_frames") || col("frame_no") < 0)
    assert(bad.isEmpty)
  }

  test("resize plan fits the box, never upscales, keeps aspect ratio") {
    val feats = Multimodal.extractFeaturesExpr(media)
    val plan = Multimodal.resizePlan(feats, box = 512).cache()
    assert(plan.filter(col("kind") === "audio/wav").isEmpty, "audio never resizes")
    assert(plan.filter(col("target_w") > 512 || col("target_h") > 512).isEmpty)
    assert(plan.filter(!col("resized") &&
      (col("target_w") =!= col("width") || col("target_h") =!= col("height"))).isEmpty,
      "small media pass through untouched")
    assert(plan.filter(col("resized") &&
      col("target_w") =!= 512 && col("target_h") =!= 512).isEmpty,
      "the longest side lands exactly on the box")
    // each side is the floor of its exact scaled value (aspect preserved
    // within integer-floor tolerance)
    val longest = greatest(col("width"), col("height")).cast("double")
    val drift = plan.filter(col("resized"))
      .withColumn("exact_w", col("width") * lit(512.0) / longest)
      .withColumn("exact_h", col("height") * lit(512.0) / longest)
      .filter(col("target_w") > col("exact_w") ||
        col("target_w") < col("exact_w") - 1 ||
        col("target_h") > col("exact_h") ||
        col("target_h") < col("exact_h") - 1)
    assert(drift.isEmpty, "side not the floor of its exact scaled value")
  }
}
