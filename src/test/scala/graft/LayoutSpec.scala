package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Morton-curve layout: interleave arithmetic and clustering shape. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: col 0 even lanes, col 1 odd lanes") {
    // qu = 0b101, qv = 0b011 → z bits: 0:qu₀=1, 1:qv₀=1, 2:qu₁=0,
    // 3:qv₁=1, 4:qu₂=1, 5:qv₂=0 → 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("qu", "qv")
      .select(Layout.zValue(Seq(col("qu"), col("qv")), 3).as("z"))
      .head().getLong(0)
    assert(z == 27L)
    // single column degenerates to identity over `bits` bits
    val id = Seq(Tuple1(11L)).toDF("q")
      .select(Layout.zValue(Seq(col("q")), 4).as("z")).head().getLong(0)
    assert(id == 11L)
  }

  test("quantize: endpoints clamp, degenerate range collapses to 0") {
    val df = Seq(0L, 50L, 100L).toDF("c")
    val q = df.select(Layout.quantize(col("c"), 0L, 100L, 8).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(q.head == 0L && q.last == 255L)
    assert(q(1) == 127L) // floor(50 * 255 / 100)
    val z = df.select(Layout.quantize(col("c"), 7L, 7L, 8).as("q"))
      .head().getLong(0)
    assert(z == 0L)
  }

  test("zOrder clusters: locally sorted, range-partitioned, rows preserved") {
    val df = (0L until 1000L).map(i => (i, i % 37, (i * 31) % 101))
      .toDF("id", "x", "y")
    val out = Layout.zOrder(df, Seq("x", "y"), bits = 5, partitions = 4)
    assert(out.count() == 1000)
    // physically range-exchanged, not hash
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(400))
    // within every partition the curve position is non-decreasing
    val violations = out.select(col("zval"))
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        Iterator.single(zs.zip(zs.drop(1)).count { case (a, b) => a > b })
      }.collect().sum
    assert(violations == 0)
  }

  test("zoneMap + pruneFlag: tight boxes on z-order, prune sound and selective") {
    val df = (0L until 4000L).map(i => (i, i % 64, (i * 31) % 64))
      .toDF("id", "x", "y")
    val z = Layout.zOrder(df, Seq("x", "y"), bits = 6, partitions = 4)
      .withColumn("block", shiftright(col("zval"), 6))
    val zm = Layout.pruneFlag(
      Layout.zoneMap(z, col("block"), Seq("x", "y")),
      Seq(("x", 10L, 12L), ("y", 20L, 25L)))
    val rows = zm.collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 4000)
    // soundness: every row matching the predicate lives in a scanned block
    val matchBlocks = z.filter(col("x").between(10, 12) &&
        col("y").between(20, 25))
      .select(col("block")).distinct().collect().map(_.getLong(0)).toSet
    val scanned = rows.filter(_.getAs[Boolean]("scanned"))
      .map(_.getAs[Long]("block")).toSet
    assert(matchBlocks.subsetOf(scanned), s"unsound prune: " +
      s"matching blocks $matchBlocks vs scanned $scanned")
    // selectivity: the z-layout must let the 2-D predicate skip most blocks
    assert(scanned.size * 2 < rows.length,
      s"no pruning win: ${scanned.size} of ${rows.length} blocks scanned")
  }

  test("compactionPlan: next-fit groups by prefix bytes, per partition") {
    val inv = Seq(
      ("p1", 1L, 10L), ("p1", 2L, 20L), ("p1", 3L, 30L), ("p1", 4L, 40L),
      // second partition packs independently, ids interleave on purpose
      ("p2", 1L, 60L), ("p2", 2L, 5L))
      .toDF("part", "file_id", "size_bytes")
    val out = Layout.compactionPlan(inv, "part", "file_id", "size_bytes",
        targetBytes = 50L).collect()
      .map(r => ((r.getAs[String]("part"), r.getAs[Long]("file_id")),
        r.getAs[Long]("grp"))).toMap
    // p1 prefix-before: 0, 10, 30, 60 -> groups 0, 0, 0, 1
    assert(out(("p1", 1L)) == 0L && out(("p1", 2L)) == 0L &&
      out(("p1", 3L)) == 0L && out(("p1", 4L)) == 1L)
    // p2 restarts at zero: 0, 60 -> groups 0, 1 (the 60-byte straddler
    // belongs to group 0; the next file starts group 1)
    assert(out(("p2", 1L)) == 0L && out(("p2", 2L)) == 1L)
  }

  test("partitionedPrepare: a day filter reads only that day's directories") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ppart").toString
    val df = (0 until 10)
      .map(d => (d.toLong, f"2024-01-${d + 1}%02d", d.toDouble))
      .toDF("id", "day", "v").withColumn("day", to_date(col("day")))
    val part = Layout.partitionedPrepare(df, tmp, "day")
    val filtered = part.filter(
      col("day") >= lit("2024-01-03") && col("day") < lit("2024-01-06"))
    assert(filtered.count() == 3)
    // runtime proof of pruning: the executed scan touched only the three
    // selected day directories, not the relation's full file set
    val files = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(files.forall(f => Seq("day=2024-01-03", "day=2024-01-04",
      "day=2024-01-05").exists(f.contains)), files)
    val allFiles = part.select(input_file_name()).distinct().count()
    assert(files.size < allFiles,
      s"no pruning: ${files.size} of $allFiles files")
  }

  test("zoneMapMerge(parts) == zoneMap(whole) for any split") {
    import spark.implicits._
    val rows = (0L until 90L).map(i => (i % 4, i, i * 3 % 17))
      .toDF("block", "a", "b")
    val whole = Layout.zoneMap(rows, col("block"), Seq("a", "b"))
      .orderBy("block").collect().map(_.toSeq).toSeq
    for (cut <- Seq(1L, 45L, 89L)) {
      val merged = Layout.zoneMapMerge(
          Seq(rows.filter(col("a") < cut), rows.filter(col("a") >= cut))
            .map(d => Layout.zoneMap(d, col("block"), Seq("a", "b"))),
          Seq("a", "b"))
        .orderBy("block").collect().map(_.toSeq).toSeq
      assert(merged == whole, s"cut=$cut")
    }
  }

  test("bloom index: no false negatives at any size; tiny m saturates") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => (i % 8, i * 37 % 1000))
      .toDF("block", "key")
    for (m <- Seq(64, 4096)) {
      val ledger = Layout.bloomLedger(rows, col("block"), col("key"),
        mBits = m, k = 4)
      val probes = Seq(0L, 37L, 74L, 999L, 123456L).toDF("key")
      val cand = Layout.bloomProbe(ledger, probes, "key", mBits = m, k = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val truth = rows.join(probes.withColumnRenamed("key", "pk"),
          col("key") === col("pk"))
        .groupBy("pk").agg(countDistinct(col("block")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      truth.foreach { case (k, n) =>
        assert(cand.getOrElse(k, 0L) >= n,
          s"false negative at m=$m key=$k: cand=${cand.get(k)} true=$n")
      }
      // an absent key may bloom-hit (false positive) but never exceeds |blocks|
      assert(cand.values.forall(_ <= 8), s"m=$m: $cand")
    }
  }

  test("time travel: v1 stays exactly v1 after v2 commits; v2 sees both") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tt_spec").toString
    Layout.commitVersion(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, 1)
    Layout.commitVersion(Seq((3L, "c")).toDF("id", "v"), dir, 2)
    val v1 = Layout.readVersion(spark, dir, 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val v2 = Layout.readVersion(spark, dir, 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1 == Set((1L, "a"), (2L, "b")), s"v1=$v1")
    assert(v2 == Set((1L, "a"), (2L, "b"), (3L, "c")), s"v2=$v2")
    // commits are append-only: re-committing an existing version refuses
    intercept[Exception] {
      Layout.commitVersion(Seq((9L, "x")).toDF("id", "v"), dir, 2)
    }
    // OPTIMIZE rewrite: v3 re-lays v2 into one file; same rows, fewer
    // files, and v1/v2 manifests still read their own (untouched) files
    Layout.commitRewrite(Layout.readVersion(spark, dir, 2).coalesce(1),
      dir, 3)
    val v3 = Layout.readVersion(spark, dir, 3)
    assert(v3.collect().map(r => (r.getLong(0), r.getString(1))).toSet == v2)
    assert(v3.select(input_file_name()).distinct().count() == 1L)
    assert(Layout.readVersion(spark, dir, 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == v1)
  }
}
