package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Table profiling: exact facts against hand-computed truth (nulls
  * included), HLL mode within its documented error, non-numeric columns
  * carry null ranges.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, String, java.lang.Double)](
    (1L, "a", 1.5), (2L, "b", -2.0), (3L, null, 1.5),
    (null, "a", null), (5L, "c", 9.0), (5L, null, null))
    .toDF("id", "cat", "v")

  test("exact profile: completeness, cardinality, ranges, long shape") {
    val p = Profiling.tableProfile(df, Seq("id", "cat", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    assert(p.keySet == Set("id", "cat", "v"))
    assert(p("id") == ((6L, 1L, 4L, Some(1.0), Some(5.0))))
    // non-numeric: ranges are null by contract
    assert(p("cat") == ((6L, 2L, 3L, None, None)))
    assert(p("v") == ((6L, 2L, 3L, Some(-2.0), Some(9.0))))
  }

  test("approx profile: HLL cardinality within 5% on a wide-cardinality column") {
    val wide = (1L to 20000L).map(i => (i, i % 37)).toDF("id", "grp")
    val p = Profiling.tableProfile(wide, Seq("id", "grp"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(p("id") - 20000L) <= 1000, s"HLL id estimate ${p("id")}")
    assert(math.abs(p("grp") - 37L) <= 2, s"HLL grp estimate ${p("grp")}")
  }

  test("constraints: counts match hand truth; nulls only violate not_null") {
    val got = Profiling.checkConstraints(df, Seq(
        Profiling.NotNull("id"), Profiling.NotNull("cat"),
        Profiling.Unique("id"),
        Profiling.InRange("v", 0.0, 2.0),
        Profiling.InSet("cat", Seq("a", "b"))))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got(("not_null", "id")) == ((1L, false)))
    assert(got(("not_null", "cat")) == ((2L, false)))
    // id 5 appears twice: 5 non-null values, 4 distinct -> 1 violation
    assert(got(("unique", "id")) == ((1L, false)))
    // v: -2.0 and 9.0 out of [0,2]; the two nulls do NOT count
    assert(got(("in_range", "v")) == ((2L, false)))
    // cat: one 'c'; the two nulls do NOT count
    assert(got(("in_set", "cat")) == ((1L, false)))
    // a passing suite on the same data
    val pass = Profiling.checkConstraints(df,
        Seq(Profiling.InRange("v", -10.0, 10.0)))
      .collect()(0)
    assert(pass.getLong(2) == 0L && pass.getBoolean(3))
  }

  test("constraints on empty input: all pass with zero violations") {
    val empty = Seq.empty[(java.lang.Long, String)].toDF("id", "cat")
    val got = Profiling.checkConstraints(empty, Seq(
        Profiling.NotNull("id"), Profiling.Unique("id"),
        Profiling.InRange("id", 0.0, 1.0), Profiling.InSet("cat", Seq("a"))))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got.values.forall(_ == ((0L, true))), got)
  }

  test("suggestConstraints: rules fire exactly where the profile supports them") {
    // ref slice: id unique & non-null, cat has a null, v numeric w/ dupes
    val ref = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.0), (2L, null, 2.0), (3L, "b", 1.0))
      .toDF("id", "cat", "v")
    val suite = Profiling.suggestConstraints(
      Profiling.tableProfile(ref, Seq("id", "cat", "v")))
    assert(suite == Seq(
      // col_name asc. cat: has a null (no not_null), non-numeric (no
      // in_range), 2 distinct of 2 non-null -> unique fires alone
      Profiling.Unique("cat"),
      Profiling.NotNull("id"), Profiling.Unique("id"),
      Profiling.InRange("id", 1.0, 3.0),
      Profiling.NotNull("v"), Profiling.InRange("v", 1.0, 2.0)), suite)
    // enforcing the learned suite on a drifted batch counts real breaches
    val cur = Seq[(java.lang.Long, String, java.lang.Double)](
      (3L, "x", 1.5), (3L, null, 9.0), (null, "y", 0.0))
      .toDF("id", "cat", "v")
    val got = Profiling.checkConstraints(cur, suite).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("not_null", "id")) == 1L)   // the null id
    assert(got(("unique", "id")) == 1L)     // 3 twice
    assert(got(("in_range", "id")) == 0L)   // 3 within [1,3]
    assert(got(("unique", "cat")) == 0L)    // x,y distinct; null skipped
    assert(got(("not_null", "v")) == 0L)
    assert(got(("in_range", "v")) == 2L)    // 9.0 above, 0.0 below [1,2]
  }

  test("partial/merge profile: slicing-invariant, estimate matches one-shot sketch") {
    val data = (1L to 5000L)
      .map(i => (i, if (i % 11 == 0) null else s"u${i % 997}", (i % 53).toDouble))
      .toDF("id", "user", "v")
      .withColumn("ts", timestamp_micros(col("id")))
    val cols = Seq("id", "user", "v")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
    // one-shot partial == merged 3-way-sliced partials == merged 7-way —
    // counts/ranges are exact, and the HLL registers max-merge to the SAME
    // state whatever the slicing, so even the estimate is identical
    val oneShot = key(Profiling.mergeProfiles(
      Profiling.partialProfile(data, cols), cols))
    def sliced(n: Int) = key(Profiling.mergeProfiles(
      (0 until n).map(r => Profiling.partialProfile(
        data.filter(col("id") % n === r), cols))
        .reduce(_ unionByName _), cols))
    assert(sliced(3) == oneShot)
    assert(sliced(7) == oneShot)
    // the streaming twin replays event-time slices through foreachBatch
    // partials and merges — identical to the one-shot profile, estimate
    // included
    val streamed = key(graft.streaming.StreamingProfile.replayBatch(
      data, "ts", cols, batches = 3))
    assert(streamed == oneShot)
    // HLL estimate lands within 5% of exact truth
    val nd = oneShot("user")._3
    assert(math.abs(nd - 996L) <= 50, s"estimate $nd vs exact 996")
  }

  test("psiDrift: zero on identical slices, detects a shift, hand-checked bins") {
    val ref = (1L to 1000L).map(i => (i, (i % 10).toDouble)).toDF("id", "v")
    // identical distribution -> every contrib 0 -> PSI 0
    val same = Profiling.psiDrift(ref, ref, "v", 0.0, 10.0, bins = 5)
      .agg(sum(col("contrib"))).head.getDouble(0)
    assert(same == 0.0)
    // shift all mass up by 4: PSI must clear the 0.25 "drifted" bar
    val cur = ref.select(col("id"), (col("v") + 4.0).as("v"))
    val out = Profiling.psiDrift(ref, cur, "v", 0.0, 10.0, bins = 5)
      .orderBy("bin").collect()
    assert(out.length == 5)
    val psi = out.map(_.getDouble(5)).sum
    assert(psi > 0.25, s"PSI $psi should flag the shift")
    // hand bin check: ref mass on v in [0,10) over 5 bins of width 2 is
    // uniform 0.2; cur bin 0 ([0,2)) holds nothing -> p=0.2 vs q=eps
    val b0 = out(0)
    assert(b0.getLong(1) == 200L && b0.getLong(2) == 0L)
    assert(b0.getDouble(3) == 0.2 && b0.getDouble(4) == 1e-6)
    // top bin [8,10) holds its own mass {8,9} PLUS the out-of-range
    // clamp {10,11,12,13} -> 6 of the 10 values
    val top = out(4)
    assert(top.getLong(2) == 600L, top.toString)
  }

  test("replayDrift: streamed per-epoch bin counts reproduce batch PSI exactly") {
    val ref = (1L to 900L).map(i => (i, (i % 9).toDouble)).toDF("id", "v")
    val cur = (1L to 600L).map(i => (i, ((i % 9) + 1.5).toDouble)).toDF("id", "v")
      .withColumn("ts", timestamp_micros(col("id")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bin").collect().map(_.toSeq).toSeq
    val batch = rows(Profiling.psiDrift(ref, cur.drop("ts"), "v", 0.0, 9.0, bins = 6))
    val streamed = rows(graft.streaming.StreamingProfile.replayDrift(
      ref, cur, "ts", "v", 0.0, 9.0, bins = 6, batches = 3))
    assert(streamed == batch)
  }

  test("replayDrift: kill + checkpoint-restart mid-stream still equals batch PSI") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    import graft.streaming.FileReplay
    // The restart-safety claim behind stream_drift: per-epoch bin counts
    // are epoch-keyed overwrite writes (retry-idempotent) and merge by an
    // associative per-bin sum, so a query killed mid-stream and resumed
    // from its checkpoint yields the IDENTICAL PSI — same harness pattern
    // as the candle restart test in StreamingSpec.
    val ref = (1L to 900L).map(i => (i, (i % 9).toDouble)).toDF("id", "v")
    val cur = (1L to 600L).map(i => (i, ((i % 9) + 1.5).toDouble)).toDF("id", "v")
      .withColumn("ts", timestamp_micros(col("id")))
    val batch = Profiling.psiDrift(ref, cur.drop("ts"), "v", 0.0, 9.0, bins = 6)
      .orderBy("bin").collect().map(_.toSeq).toSeq

    // stage a 4-slice replay, hold back the last 2 files so run 1 stops
    // mid-stream ("crash"), then release and restart on the same checkpoint
    val (chunk, _, _) = FileReplay.timeChunks(cur, "ts", 4)
    val root = FileReplay.stage(cur, chunk, Seq.empty)
    val srcDir = root.resolve("src")
    val holdDir = Files.createDirectories(root.resolve("held"))
    def ls(d: Path) = {
      val s = Files.list(d)
      try s.iterator().asScala.toList.sortBy(_.getFileName.toString)
      finally s.close()
    }
    val held = ls(srcDir).takeRight(2)
    val mtimes = held.map(f => f.getFileName.toString -> f.toFile.lastModified).toMap
    held.foreach(f => Files.move(f, holdDir.resolve(f.getFileName)))

    val outDir = Files.createDirectories(root.resolve("bins"))
    val ckpt = root.resolve("ckpt").toString
    def runOnce(): Unit = {
      val q = FileReplay.source(spark, root, cur.schema)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, epoch: Long) =>
          Profiling.binCounts(b, "v", 0.0, 9.0, 6, "n_cur")
            .write.mode("overwrite")
            .parquet(outDir.resolve(f"epoch_$epoch%09d").toString)
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val epochsBeforeRestart = ls(outDir).size
    assert(epochsBeforeRestart > 0, "run 1 must commit at least one epoch")

    ls(holdDir).foreach { f =>
      val dest = srcDir.resolve(f.getFileName)
      Files.move(f, dest)
      dest.toFile.setLastModified(mtimes(f.getFileName.toString))
    }
    runOnce() // resume from checkpoint: only the released slices process
    assert(ls(outDir).size > epochsBeforeRestart,
      "restart must append new epochs, not reprocess from zero into the same dirs")

    val curCounts = spark.read.parquet(ls(outDir).map(_.toString): _*)
      .groupBy("bin").agg(sum(col("n_cur")).cast("long").as("n_cur"))
    val streamed = Profiling.psiFromCounts(
        Profiling.binCounts(ref, "v", 0.0, 9.0, 6, "n_ref"), curCounts, 6, 1e-6)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    assert(streamed == batch, "restarted drift diverged from batch PSI")
  }

  test("psiDriftByGroup: per-segment PSI isolates the shifted group") {
    // group A identical across sides; group B shifts; group C only in cur
    val ref = ((1L to 300L).map(i => ("A", (i % 6).toDouble)) ++
      (1L to 300L).map(i => ("B", (i % 6).toDouble))).toDF("grp", "v")
    val cur = ((1L to 300L).map(i => ("A", (i % 6).toDouble)) ++
      (1L to 300L).map(i => ("B", (i % 6) + 3.0)) ++
      (1L to 60L).map(i => ("C", (i % 6).toDouble))).toDF("grp", "v")
    val out = Profiling.psiDriftByGroup(ref, cur, "grp", "v", 0.0, 6.0, bins = 6)
      .collect().map(r => (r.getString(0), r.getDouble(6)))
    val psi = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(psi("A") == 0.0, s"identical segment must read 0, got ${psi("A")}")
    assert(psi("B") > 0.25, s"shifted segment must alarm, got ${psi("B")}")
    // appearing segment: ref side is all-eps -> maximal drift alarm
    assert(psi("C") > 1.0, s"appearing segment must alarm hard, got ${psi("C")}")
    assert(out.count(_._1 == "C") == 6, "every bin row present for C")
  }

  test("psiDriftCategorical: stable mix reads 0, vanished/new classes alarm") {
    val ref = (Seq.fill(80)("en") ++ Seq.fill(15)("de") ++ Seq.fill(5)("fr"))
      .zipWithIndex.map(_.swap).toDF("id", "lang")
    // same mix -> every contrib 0
    val same = Profiling.psiDriftCategorical(ref, ref, "lang")
      .agg(sum(col("contrib"))).head.getDouble(0)
    assert(same == 0.0)
    // fr vanished, pt appeared
    val cur = (Seq.fill(80)("en") ++ Seq.fill(15)("de") ++ Seq.fill(5)("pt"))
      .zipWithIndex.map(_.swap).toDF("id", "lang")
    val out = Profiling.psiDriftCategorical(ref, cur, "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(out.keySet == Set("en", "de", "fr", "pt"))
    assert(out("en")._3 == 0.0 && out("de")._3 == 0.0)
    assert(out("fr") == ((5L, 0L, out("fr")._3)) && out("fr")._3 > 0.25)
    assert(out("pt") == ((0L, 5L, out("pt")._3)) && out("pt")._3 > 0.25)
  }

  test("psiDrift: an empty side degrades to eps mass, never throws") {
    val ref = (1L to 100L).map(i => (i, (i % 5).toDouble)).toDF("id", "v")
    val empty = ref.filter(col("id") < 0)
    val out = Profiling.psiDrift(ref, empty, "v", 0.0, 5.0, bins = 5)
      .orderBy("bin").collect()
    assert(out.length == 5)
    assert(out.forall(_.getDouble(4) == 1e-6)) // p_cur clamps to eps
    assert(out.forall(_.getDouble(5) > 0.0))  // every bucket drifted
  }

  test("ksDrift: hand-checked sup, identical sides read 0, empty side reads null") {
    // ref = {1,2,3,4}, cur = {3,4,5,6}: CDFs diverge most at v=2
    // (F_ref=0.5, F_cur=0) and v=4 (1.0 vs 0.5) — ties at 0.5, argmax
    // breaks to the SMALLEST value, so at_value = 2
    val ref = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map(_.swap).toDF("id", "x")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).zipWithIndex.map(_.swap).toDF("id", "x")
    val r = Profiling.ksDrift(ref, cur, "x").head()
    assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 2.0)
    assert(r.getLong(2) == 4L && r.getLong(3) == 4L)

    val same = Profiling.ksDrift(ref, ref, "x").head()
    assert(same.getDouble(0) == 0.0, "identical samples must read KS = 0")

    val empty = ref.filter(col("id") < 0)
    val e = Profiling.ksDrift(ref, empty, "x").head()
    assert(e.isNullAt(0) && e.getLong(3) == 0L,
      "an empty side yields null KS, never a division error")
  }

  test("ksDrift: partitioning-invariant (two-level prefix sum == single-task reference)") {
    // skewed repeats force multi-row distinct-value groups across chunks
    val ref = (1L to 500L).map(i => (i, (i % 23).toDouble)).toDF("id", "x")
    val cur = (1L to 400L).map(i => (i, ((i % 23) + (i % 3)).toDouble)).toDF("id", "x")
    def row(parts: Int) = Profiling.ksDrift(
      ref.repartition(parts), cur.repartition(parts), "x").head().toSeq
    val expected = row(1)
    assert(expected.head != null && expected.head.asInstanceOf[Double] > 0.0)
    assert(row(7) == expected && row(32) == expected,
      "KS must not depend on physical partitioning")
  }

  test("chiSquare: hand contingency, zero cells present, independence reads 0") {
    // 2×2 with a missing cell: a1 only ever pairs with b1
    val df = (Seq.fill(6)(("a1", "b1")) ++ Seq.fill(2)(("a2", "b1"))
      ++ Seq.fill(2)(("a2", "b2"))).zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
    val out = Profiling.chiSquare(df, "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet.size == 4, "full grid incl. the zero cell")
    assert(out(("a1", "b2"))._1 == 0L, "unobserved cell must appear with o=0")
    // margins: na1=6, na2=4, nb1=8, nb2=2, n=10 → e(a1,b2)=6*2/10=1.2
    assert(out(("a1", "b2"))._2 == 1.2)
    assert(out(("a1", "b1")) == ((6L, 4.8, 0.3)))
    val chi2 = out.values.map(_._3).sum
    assert(math.abs(chi2 - 3.75) < 1e-9, s"chi2 $chi2 != 3.75 hand value")

    // perfectly independent layout: every contrib exactly 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
    assert(Profiling.chiSquare(ind, "a", "b").collect()
      .forall(_.getDouble(4) == 0.0))
  }

  test("equiDepthBins: value-based cuts, ties share a bin, nulls drop") {
    val df = ((1 to 10).map(i => (i.toLong, java.lang.Double.valueOf(i))) :+
      (99L, null.asInstanceOf[java.lang.Double])).toDF("id", "v")
    val out = Profiling.equiDepthBins(df, "id", "v", k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // median of 1..10 = 5.5; bin 0 = values <= 5.5, bin 1 = the rest
    assert(out == (1 to 5).map(_.toLong -> 0L).toMap ++
      (6 to 10).map(_.toLong -> 1L).toMap, out)
    // all-equal values: one bin, regardless of k
    val flat = (1 to 8).map(i => (i.toLong, 7.0)).toDF("id", "v")
    val fb = Profiling.equiDepthBins(flat, "id", "v", k = 4).collect()
    assert(fb.forall(_.getLong(2) == 0L))
    // partitioning must not change the assignment (the ntile failure mode)
    val a = Profiling.equiDepthBins(df, "id", "v", k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Profiling.equiDepthBins(df.repartition(7), "id", "v", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("embeddingDrift: identical slices read cos 1 / L2 0; a shift registers") {
    val same = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 2.0f)), (3L, Seq(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r0 = Profiling.embeddingDrift(same, pmod(col("vec_id"), lit(2)))
      .collect().head
    assert(r0.getAs[Double]("cos_sim") == 1.0 &&
      r0.getAs[Double]("l2_delta") == 0.0 && r0.getAs[Long]("dims") == 2L)
    val shifted = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r1 = Profiling.embeddingDrift(shifted, pmod(col("vec_id"), lit(2)))
      .collect().head
    assert(r1.getAs[Double]("cos_sim") == 0.0)
    assert(r1.getAs[Double]("l2_delta") > 1.0)
    assert(r1.getAs[Double]("max_abs_delta") == 1.0)
  }

  test("profile on empty input: zero rows, zero facts, no throw") {
    val empty = Seq.empty[(java.lang.Long, String)].toDF("id", "cat")
    val p = Profiling.tableProfile(empty, Seq("id", "cat"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p == Map("id" -> ((0L, 0L, 0L)), "cat" -> ((0L, 0L, 0L))))
  }

  test("targetEncode: shrinks toward the global mean by m pseudo-counts") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", Some(10.0)),
      ("c", None)).toDF("cat", "y")
    // global mean over non-null = (1+3+10)/3
    val g = 14.0 / 3
    val got = Profiling.targetEncode(df, "cat", "y", smoothing = 2.0)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("a") == ((2L, math.round((4.0 + 2 * g) / 4 * 1e6) / 1e6)))
    assert(got("b") == ((1L, math.round((10.0 + 2 * g) / 3 * 1e6) / 1e6)))
    assert(!got.contains("c")) // all-null target → no encodable rows
  }

  test("referentialAudit: orphans and null keys counted separately") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profiling.referentialAudit(
      Seq(("f->d", fact, "fk", dim, "pk"))).head()
    assert(r.getAs[String]("relation") == "f->d")
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("n_null_key") == 1L)
    assert(r.getAs[Long]("n_orphan") == 1L) // only 9 dangles; null is not an orphan
  }
}
