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

  test("image/png payloads with the PNG signature get a REAL ImageIO decode") {
    import spark.implicits._
    val dims = Seq((1L, 23, 37), (2L, 640, 480), (3L, 16, 16), (4L, 1, 1))
    val df = dims.map { case (id, w, h) =>
      (id, "image/png", Multimodal.synthesizePng(w, h))
    }.toDF("media_id", "kind", "payload")
    val got = Multimodal.extractFeatures(df).collect()
      .map(f => f.media_id -> ((f.width, f.height, f.n_frames))).toMap
    dims.foreach { case (id, w, h) =>
      assert(got(id) == ((w, h, 1)), s"decode of ${w}x$h PNG: ${got(id)}")
    }
  }

  test("malformed / mislabeled image payloads fall back to the stub, no throw") {
    import spark.implicits._
    val magic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val df = Seq(
      // PNG magic but truncated garbage after it: decode fails → stub
      (1L, "image/png", magic ++ "truncated nonsense".getBytes("UTF-8")),
      // labeled png but no magic: straight to the stub
      (2L, "image/png", "just text bytes".getBytes("UTF-8")),
      // audio stays on the stub regardless of payload
      (3L, "audio/wav", magic ++ "wav-ish".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val seam = Multimodal.extractFeatures(df).toDF()
    // rows 2 and 3 must agree with the pure-expression stub; row 1 must
    // exist (fallback, not a task failure) with stub-range dimensions
    val fast = Multimodal.extractFeaturesExpr(df)
    assert(seam.filter(col("media_id").isin(2L, 3L))
      .except(fast.filter(col("media_id").isin(2L, 3L))).count() == 0)
    val r1 = seam.filter(col("media_id") === 1L).collect()
    assert(r1.length == 1)
    assert(r1(0).getAs[Int]("width") >= 16 && r1(0).getAs[Int]("height") >= 16)
  }

  test("pngMediaTable round-trips its id-derived dimensions through the decoder") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val feats = Multimodal.extractFeatures(
      Multimodal.pngMediaTable(ids, "doc_id")).toDF()
    val bad = feats.filter(
      col("width") =!= (lit(16L) + col("media_id") % 64L).cast("int") ||
        col("height") =!= (lit(16L) + (col("media_id") * 7L) % 48L).cast("int") ||
        col("n_frames") =!= 1)
    assert(feats.count() == 40 && bad.isEmpty,
      s"round-trip mismatch: ${bad.collect().mkString(", ")}")
  }

  test("every JDK image container decodes for real: png/jpeg/gif/bmp") {
    import spark.implicits._
    val dims = Seq((23, 37), (640, 480), (16, 16), (1, 1))
    val rows = for {
      ((w, h), i) <- dims.zipWithIndex
      (fmt, j) <- Seq("png", "jpeg", "gif", "bmp").zipWithIndex
    } yield (i * 4L + j, s"image/$fmt",
      Multimodal.synthesizeImage(w, h, fmt), w, h)
    val df = rows.map { case (id, k, p, _, _) => (id, k, p) }
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.extractFeatures(df).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    rows.foreach { case (id, k, _, w, h) =>
      assert(got(id) == ((w, h)), s"decode of ${w}x$h $k: ${got(id)}")
    }
    // sniffing trusts bytes, not kind: a JPEG payload under a png label
    // still decodes via the JPEG reader
    val cross = Seq((0L, "image/png", Multimodal.synthesizeImage(33, 21, "jpeg")))
      .toDF("media_id", "kind", "payload")
    val c = Multimodal.extractFeatures(cross).collect()(0)
    assert((c.width, c.height) == ((33, 21)), s"cross-labeled: $c")
  }

  test("imageMediaTable round-trips dims and formats through the decoder") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val feats = Multimodal.extractFeatures(
      Multimodal.imageMediaTable(ids, "doc_id")).toDF()
    val bad = feats.filter(
      col("width") =!= (lit(16L) + col("media_id") % 64L).cast("int") ||
        col("height") =!= (lit(16L) + (col("media_id") * 7L) % 48L).cast("int"))
    assert(feats.count() == 40 && bad.isEmpty,
      s"round-trip mismatch: ${bad.collect().mkString(", ")}")
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

  test("wav decode: real RIFF header round-trip; non-wav rows drop") {
    import spark.implicits._
    val media = Seq(
      (1L, "audio/wav", Multimodal.synthesizeWav(11025, 2, 777)),
      (2L, "audio/wav", "not audio at all".getBytes("UTF-8")), // poisoned
      (3L, "image/png", Multimodal.synthesizePng(20, 20)))     // wrong modality
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.extractAudioFeatures(media).collect()
    assert(out.length == 1, "only the genuine WAV decodes")
    val f = out.head
    assert(f.media_id == 1L && f.sample_rate == 11025L &&
      f.channels == 2L && f.n_frames == 777L)
  }

  test("animated GIF: real frame count round-trips through getNumImages") {
    import spark.implicits._
    val media = Multimodal.gifMediaTable(
      spark.range(0, 40).toDF("doc_id"), "doc_id")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 40)
    feats.foreach { f =>
      val id = f.media_id
      assert(f.width == 16 + (id % 32) && f.height == 16 + (id * 5) % 24,
        s"dims wrong for $id: ${f.width}x${f.height}")
      assert(f.n_frames == 1 + (id % 7).toInt,
        s"frame count wrong for $id: ${f.n_frames}")
      assert(f.kind == "image/gif")
    }
    // the frame-sampling plan rides the REAL decoded counts when told to
    // include gif containers
    val sampled = Multimodal.sampleFrames(
      Multimodal.extractFeatures(media), stride = 2, kinds = Seq("image/gif"))
    val n = sampled.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 40L).forall(id =>
      n(id) == (1 + id % 7 + 1) / 2), "ceil(frames/2) rows per media")
    // default kinds still excludes images entirely
    assert(Multimodal.sampleFrames(
      Multimodal.extractFeatures(media), stride = 2).count() == 0)
  }

  test("hand-rolled WAV writer is byte-identical to the javax encode") {
    // the lock-free writer replaced AudioSystem.write (which serializes on
    // the provider registry under concurrency); for 16-bit LE PCM the two
    // must produce the SAME RIFF container, not just equivalent headers
    for ((rate, ch, frames) <- Seq((8000, 1, 0), (8000, 1, 500),
        (11025, 2, 777), (48000, 2, 2499), (15000, 1, 1))) {
      val mine = Multimodal.synthesizeWav(rate, ch, frames)
      val javax = Multimodal.synthesizeWavJavax(rate, ch, frames)
      assert(java.util.Arrays.equals(mine, javax),
        s"encode diverged at rate=$rate ch=$ch frames=$frames " +
          s"(${mine.length} vs ${javax.length} bytes)")
    }
  }

  test("hand-rolled RIFF parse == javax decode on both encoders' output") {
    // cross-validated both ways: my parse must read javax containers and
    // javax must read mine — the decode replacement cannot drift silently
    for ((rate, ch, frames) <- Seq((8000, 1, 500), (11025, 2, 777),
        (44100, 1, 2048), (9000, 2, 0))) {
      val mine = Multimodal.synthesizeWav(rate, ch, frames)
      val expected = Some((rate.toLong, ch.toLong, frames.toLong))
      assert(Multimodal.parseWavHeader(mine) == expected)
      assert(Multimodal.decodeWavJavax(mine) == expected)
      val javax = Multimodal.synthesizeWavJavax(rate, ch, frames)
      assert(Multimodal.parseWavHeader(javax) == expected)
    }
  }

  test("RIFF parse survives hostile containers: truncated, huge declared sizes") {
    val good = Multimodal.synthesizeWav(8000, 1, 100)
    // truncated data section: frames capped at the bytes actually present
    assert(Multimodal.parseWavHeader(good.take(44 + 50)) ==
      Some((8000L, 1L, 25L)))
    // header only — zero frames, not a crash
    assert(Multimodal.parseWavHeader(good.take(44)) == Some((8000L, 1L, 0L)))
    // declared data size 0xFFFFFFFF (streaming sentinel): capped, no overflow
    val sentinel = good.clone()
    sentinel(40) = -1; sentinel(41) = -1; sentinel(42) = -1; sentinel(43) = -1
    assert(Multimodal.parseWavHeader(sentinel) == Some((8000L, 1L, 100L)))
    // chunk size pointing past the buffer: parse stops cleanly (the
    // contract is "no throw"; the result is whatever the walk salvaged)
    val overrun = good.clone()
    overrun(16) = 0x7F // fmt chunk claims a huge size
    Multimodal.parseWavHeader(overrun)
    // not RIFF at all
    assert(Multimodal.parseWavHeader("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseWavHeader(Array.emptyByteArray).isEmpty)
    // fmt declaring fewer than the 16 PCM header bytes: the parse must
    // REJECT it (None), never read the next chunk's bytes as format fields
    val shortFmt = good.clone()
    shortFmt(16) = 8; shortFmt(17) = 0 // declared fmt size 8
    assert(Multimodal.parseWavHeader(shortFmt).isEmpty,
      "a short fmt chunk must not yield fabricated features")
    // a SECOND fmt chunk must not overwrite the first (javax honors #1):
    // build RIFF [fmt A] [fmt B] [data] and expect A's rate/channels
    val a = Multimodal.synthesizeWav(8000, 1, 10)
    val fmtB = a.slice(12, 36).clone()
    fmtB(12) = 0x22; fmtB(13) = 0x56 // rate 22050 inside the duplicate
    val doubled = a.slice(0, 36) ++ fmtB ++ a.slice(36, a.length)
    val riffSize = doubled.length - 8
    doubled(4) = (riffSize & 0xFF).toByte
    doubled(5) = ((riffSize >> 8) & 0xFF).toByte
    assert(Multimodal.parseWavHeader(doubled) == Some((8000L, 1L, 10L)),
      "the first fmt chunk wins")
    // a MALFORMED first fmt rejects the file outright (javax would refuse
    // it) — a later well-formed fmt must NOT be honored instead
    val badThenGood = a.slice(0, 36) ++ a.slice(12, 36) ++ a.slice(36, a.length)
    badThenGood(16) = 8; badThenGood(17) = 0 // first fmt declares size 8
    assert(Multimodal.parseWavHeader(badThenGood).isEmpty,
      "a malformed first fmt must reject the file, not defer to a later one")
  }

  test("MJPEG-in-AVI: container walk + per-frame JPEG decode round-trip") {
    val avi = Multimodal.synthesizeAvi(32, 24, 5)
    val Some((w, h, chunks)) = Multimodal.parseAvi(avi)
    assert((w, h) == (32, 24), s"avih dims: $w x $h")
    assert(chunks.size == 5, s"movi frame chunks: ${chunks.size}")
    // every sampled frame really decodes, and its own JPEG header carries
    // the container dims
    val spark0 = spark
    import spark0.implicits._
    val media = Seq((7L, "video/avi", avi)).toDF("media_id", "kind", "payload")
    val frames = Multimodal.extractVideoFrames(media, stride = 2).collect()
    assert(frames.map(_.frame_no).toSeq == Seq(0L, 2L, 4L), frames.toSeq)
    assert(frames.forall(f => f.frame_w == 32L && f.frame_h == 24L &&
      f.n_frames == 5L), frames.toSeq)

    // hostile containers: truncated movi (frame list shrinks, no crash),
    // wrong fourcc, not RIFF at all — all flow through as drops
    val cut = avi.take(avi.length - (chunks.last._2 / 2))
    val salvaged = Multimodal.parseAvi(cut)
    assert(salvaged.forall(_._3.size <= 5), "truncation must not inflate frames")
    val notAvi = avi.clone(); notAvi(8) = 'W'
    assert(Multimodal.parseAvi(notAvi).isEmpty)
    assert(Multimodal.parseAvi(Array.emptyByteArray).isEmpty)
    val mixed = Seq((1L, "video/avi", avi),
        (2L, "video/avi", "RIFFxxxxAVI garbage".getBytes("US-ASCII")),
        (3L, "video/avi", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.extractVideoFrames(mixed, stride = 2)
      .collect().forall(_.media_id == 1L), "poisoned rows must drop, not throw")
  }

  test("aviMediaTable round-trips id-derived facts through the video decoder") {
    val spark0 = spark
    import spark0.implicits._
    val ids = (0L until 12L).toDF("doc_id")
    val got = Multimodal.extractVideoFrames(
        Multimodal.aviMediaTable(ids, "doc_id"), stride = 2)
      .collect().groupBy(_.media_id)
    assert(got.size == 12)
    got.foreach { case (id, fs) =>
      val (w, h, n) = (16 + id % 48, 16 + (id * 3) % 32, 1 + id % 6)
      assert(fs.forall(f => f.width == w && f.height == h && f.n_frames == n
        && f.frame_w == w && f.frame_h == h), s"id $id: ${fs.toSeq}")
      assert(fs.map(_.frame_no).sorted.toSeq == (0L until n by 2L).toSeq,
        s"id $id frame sampling")
    }
  }

  test("dHash round-trips the designed fingerprint through a real pixel decode") {
    val spark0 = spark
    import spark0.implicits._
    val ids = (0L until 24L).toDF("doc_id")
    val got = Multimodal.dHash(Multimodal.dhashMediaTable(ids, "doc_id"))
      .collect().map(h => h.media_id -> h.dhash).toMap
    assert(got.size == 24)
    (0L until 24L).foreach { id =>
      val want = Multimodal.designedDHash(id)
      assert(got(id) == want,
        s"id $id: decoded dhash ${got(id).toBinaryString} != designed ${want.toBinaryString}")
      assert(want >= 0L && (want >> 60) == 0L, s"designed hash must stay 60-bit: $id")
    }
    // the designed member distances that make the pair oracle a-priori:
    // (0,1) inside Hamming<=3, everything else outside
    (0L until 24L by 4L).map(_ / 4).foreach { g =>
      def d(a: Long, b: Long) = java.lang.Long.bitCount(
        Multimodal.designedDHash(4 * g + a) ^ Multimodal.designedDHash(4 * g + b))
      assert(d(0, 1) == 2, s"g=$g d01=${d(0, 1)}")
      assert(d(0, 2) == 6 && d(1, 2) >= 4, s"g=$g d02=${d(0, 2)} d12=${d(1, 2)}")
      assert(d(0, 3) >= 24 && d(1, 3) >= 24 && d(2, 3) >= 24, s"g=$g member 3 must be far")
    }
  }

  test("hand-rolled radix-2 FFT == direct DFT on random signals") {
    val rng = new scala.util.Random(424242L)
    for (n <- Seq(8, 64, 128); _ <- 1 to 5) {
      val re = Array.fill(n)(rng.nextDouble() * 2 - 1)
      val im = Array.fill(n)(rng.nextDouble() * 2 - 1)
      // direct O(n²) DFT reference, textbook definition
      val (dr, di) = (new Array[Double](n), new Array[Double](n))
      for (k <- 0 until n; t <- 0 until n) {
        val a = -2.0 * math.Pi * k * t / n
        dr(k) += re(t) * math.cos(a) - im(t) * math.sin(a)
        di(k) += re(t) * math.sin(a) + im(t) * math.cos(a)
      }
      Multimodal.fft(re, im)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - dr(k)) < 1e-9 * n && math.abs(im(k) - di(k)) < 1e-9 * n,
          s"n=$n bin $k: fft (${re(k)}, ${im(k)}) vs dft (${dr(k)}, ${di(k)})")
      }
    }
  }

  test("audioFingerprint round-trips the designed spectrum through decode + FFT") {
    val spark0 = spark
    import spark0.implicits._
    val ids = (0L until 24L).toDF("doc_id")
    val got = Multimodal.audioFingerprint(
        Multimodal.fingerprintWavMediaTable(ids, "doc_id"))
      .collect().map(f => f.media_id -> f.fp).toMap
    assert(got.size == 24)
    (0L until 24L).foreach { id =>
      val want = Multimodal.designedDHash(id)
      assert(got(id) == want,
        s"id $id: fp ${got(id).toBinaryString} != designed ${want.toBinaryString}")
    }
    // drop semantics: non-wav, short, and 8-bit payloads yield nothing
    val junk = Seq(
      (1L, "audio/wav", Multimodal.synthesizeWav(8000, 1, 64)),  // < 128 frames
      (2L, "audio/wav", Array[Byte](1, 2, 3)),
      (3L, "text/plain", "hello".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.audioFingerprint(junk).collect().isEmpty)
  }

  test("videoFingerprint round-trips the designed pattern through the lossy codec") {
    val spark0 = spark
    import spark0.implicits._
    val ids = (0L until 24L).toDF("doc_id")
    val got = Multimodal.videoFingerprint(
        Multimodal.dhashAviMediaTable(ids, "doc_id"))
      .collect().map(f => f.media_id -> (f.fp, f.n_sampled)).toMap
    assert(got.size == 24)
    (0L until 24L).foreach { id =>
      val want = Multimodal.designedDHash(id)
      assert(got(id)._1 == want,
        s"id $id: fp ${got(id)._1.toBinaryString} != designed ${want.toBinaryString}")
      assert(got(id)._2 == 1 + id % 3, s"id $id sampled ${got(id)._2}")
    }
  }

  test("videoFingerprint majority survives a corrupted frame; no-frame clips drop") {
    val spark0 = spark
    import spark0.implicits._
    // 3 frames: two designed + one noise — strict majority keeps the
    // designed bits (a corrupted or intro frame can't flip a stable clip)
    val designedImg = {
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(
        new java.awt.image.BufferedImage(18, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB), "jpeg", bo)
      bo.toByteArray // all-black frame: every comparison equal -> fp 0
    }
    val noise = {
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 18)
        img.setRGB(x, y, (x * 131 + y * 197) * 2654435761L.toInt)
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bo)
      bo.toByteArray
    }
    val twoVsOne = Multimodal.aviFromJpegs(18, 16,
      Seq(designedImg, noise, designedImg))
    val noFrames = Multimodal.aviFromJpegs(18, 16, Seq(Array[Byte](9, 9, 9)))
    val rows = Seq(
      (1L, "video/avi", twoVsOne),
      (2L, "video/avi", noFrames),
      (3L, "video/avi", "nope".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.videoFingerprint(rows).collect()
      .map(f => f.media_id -> (f.fp, f.n_sampled)).toMap
    // clip 1: majority of {0, noiseHash, 0} is 0 for every bit where the
    // two black frames agree — i.e. ALL bits
    assert(got.keySet == Set(1L), s"got $got")
    assert(got(1L) == ((0L, 3L)), s"majority fingerprint: ${got(1L)}")
  }

  test("dHash drops undecodable and sub-grid payloads instead of failing") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, "image/png", Multimodal.synthesizePng(20, 16)),       // decodes
      (2L, "image/png", Array[Byte](1, 2, 3)),                   // garbage
      (3L, "image/png", Multimodal.synthesizePng(4, 4)),         // < 9x8 grid
      (4L, "text/plain", "hello".getBytes("UTF-8")))             // not an image
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.dHash(rows).collect()
    assert(got.map(_.media_id).toSeq == Seq(1L), got.toSeq)
  }
}
