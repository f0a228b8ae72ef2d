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
}
