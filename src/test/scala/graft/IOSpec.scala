package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.fixtures.SampleData
import graft.sources.IO

/** IO round-trips + the two scale levers: partition pruning on partitioned
  * parquet and exchange-free joins on bucketed tables.
  */
class IOSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv and jsonl round-trip the tick schema") {
    val ticks = SampleData.dataset(spark).toDF()
    val csvDir = tmp("graft_csv_")
    IO.writeCsv(ticks, csvDir)
    val backCsv = IO.readCsv(spark, csvDir, ticks.schema)
    assert(backCsv.count() == 42)
    assert(backCsv.orderBy("key", "ts").collect().toSeq ==
      ticks.orderBy("key", "ts").collect().toSeq)

    val jsonDir = tmp("graft_json_")
    ticks.write.mode("overwrite").json(jsonDir)
    val backJson = IO.readJsonl(spark, jsonDir, ticks.schema)
    assert(backJson.count() == 42)
  }

  test("csv/jsonl round-trip adversarial text: quotes, commas, newlines, unicode") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain words"),
      (2L, "comma, separated, text"),
      (3L, "says \"quoted\" things"),
      (4L, "tab\tand\ttabs"),
      (5L, "line\nbreak inside"),
      (6L, "unicode: café 日本語 😀"),
      (7L, ""),
      (8L, "  leading and trailing  "))
      .toDF("id", "text")
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // JSONL preserves EVERYTHING, including embedded newlines
    val jd = tmp("graft_nasty_json_")
    nasty.write.mode("overwrite").json(jd)
    assert(sortedRows(IO.readJsonl(spark, jd, nasty.schema)) == sortedRows(nasty))
    // CSV with default quoting: multiLine read restores the newline row;
    // empty string comes back null (the documented CSV ambiguity) — assert
    // the exact contract rather than pretending it's lossless
    val cd = tmp("graft_nasty_csv_")
    IO.writeCsv(nasty, cd)
    val backCsv = spark.read.schema(nasty.schema)
      .option("header", "true").option("multiLine", "true").csv(cd)
      .orderBy("id").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    val want = sortedRows(nasty).map { case (i, t) =>
      (i, if (t.isEmpty) None else Some(t)) }
    assert(backCsv == want)
  }

  test("partitioned parquet write enables partition pruning") {
    val ticks = SampleData.dataset(spark).toDF()
    val dir = tmp("graft_part_")
    IO.writeParquet(ticks, dir, partitionBy = Seq("key"))
    val pruned = IO.readParquet(spark, dir).filter(col("key") === "TS-1")
    assert(pruned.count() == 10)
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("TS-1"),
      s"expected key partition filter in scan:\n$scan")
  }

  test("bucketed tables join without any exchange") {
    val ticks = SampleData.dataset(spark).toDF()
    val agg = ticks.groupBy("key").agg(avg("askPrice").as("avgAsk"))
    IO.writeBucketed(ticks, "t_ticks_b", Seq("key"), 4, sortCols = Seq("key"))
    IO.writeBucketed(agg, "t_agg_b", Seq("key"), 4, sortCols = Seq("key"))
    // fixture tables are broadcast-small; force the shuffle path the test is
    // about (at scale both sides are far beyond the broadcast threshold)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("t_ticks_b").join(spark.table("t_agg_b"), "key")
      assert(joined.count() == 42)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_ticks_b")
      spark.sql("DROP TABLE IF EXISTS t_agg_b")
    }
  }

  test("rate-source live tick feed drives the streaming candle pipeline") {
    val src = IO.readStreamRateTicks(spark, rowsPerSecond = 200, nKeys = 3)
    assert(src.isStreaming)
    // the live feed must be shape-compatible with the engine's tick model
    val tickSchema = SampleData.dataset(spark).toDF().schema
    assert(src.schema.map(f => (f.name, f.dataType)) ==
      tickSchema.map(f => (f.name, f.dataType)),
      s"rate ticks must match the tick schema: ${src.schema} vs $tickSchema")

    // run the real stateful candle op on the live feed for a moment
    val q = graft.streaming.StreamingCandles.candles(src, "1 second")
      .toDF()
      .writeStream.format("memory").queryName("rate_candles")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        q.processAllAvailable()
        n = spark.table("rate_candles").count()
      }
      assert(n > 0, "no candles emitted from the live rate feed within 30 s")
      val row = spark.table("rate_candles")
        .select(col("key"), col("close.askPrice")).head()
      assert(row.getString(0).startsWith("R"))
    } finally q.stop()
  }

  // kafka resolves to the test-classpath double here (schema branch); on a
  // bare offline classpath it must instead fail fast (resolution branch)
  test("TickSource seam: rate/files share the contract schema; kafka resolves or fails fast") {
    import graft.sources.TickSource
    // every implementation lands on the same tick contract
    val rate = TickSource.Rate(rowsPerSecond = 10, nKeys = 2).ticks(spark)
    assert(rate.isStreaming)
    assert(rate.schema.map(f => (f.name, f.dataType)) ==
      TickSource.schema.map(f => (f.name, f.dataType)), rate.schema)
    val files = TickSource.Files(tmp("graft_tsrc_")).ticks(spark)
    assert(files.isStreaming)
    assert(files.schema.map(f => (f.name, f.dataType)) ==
      TickSource.schema.map(f => (f.name, f.dataType)), files.schema)
    // classpath-gated: WITH the connector jars (`spark-sql-kafka-0-10` +
    // `kafka-clients`, e.g. on a real cluster's CI) the adapter must
    // construct a genuine unbounded frame in the contract schema — the
    // whole source-side seam short of a live broker. WITHOUT them (this
    // offline sandbox: no jars, zero egress to vendor any) it must fail
    // FAST at stream construction with Spark's data-source-resolution
    // error (not at runtime inside a query), so the gap is visible the
    // moment someone wires it without the connector.
    scala.util.Try(TickSource.Kafka("broker:9092", "ticks").ticks(spark)) match {
      case scala.util.Success(kafka) =>
        assert(kafka.isStreaming)
        assert(kafka.schema.map(f => (f.name, f.dataType)) ==
          TickSource.schema.map(f => (f.name, f.dataType)), kafka.schema)
      case scala.util.Failure(e) =>
        val msg = Option(e.getMessage).getOrElse("")
        assert(msg.contains("kafka") || msg.contains("KAFKA"),
          s"expected a kafka data-source resolution error, got: $msg")
    }
  }

  test("Kafka adapter parse path: one micro-batch through the format double") {
    import graft.sources.TickSource
    // graft.testkit.KafkaSourceDouble is ServiceLoader-registered under
    // format name `kafka` on the TEST classpath, serving one micro-batch in
    // the real connector's wire schema — so the adapter's payload→Tick
    // parse (from_json, isLive coalesce, malformed/tombstone drop) actually
    // EXECUTES here rather than staying behind the offline fail-fast.
    val q = TickSource.Kafka("broker:9092", "ticks").ticks(spark)
      .writeStream.format("memory").queryName("kafka_double_ticks")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("kafka_double_ticks")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq
    // U4 (malformed json) and U5 (tombstone null value) must be dropped;
    // U3 omits isLive and must coalesce to true
    assert(got == Seq(
      ("U1", 1451606405000L, 1.25, 1.26, true),
      ("U2", 1451606407000L, 2.5, 2.6, false),
      ("U3", 1451606471000L, 3.75, 3.8, true)), got)
  }

  test("streaming parquet source → parquet sink end-to-end") {
    val ticks = SampleData.dataset(spark).toDF()
    val in = tmp("graft_sin_")
    val out = tmp("graft_sout_")
    val ck = tmp("graft_sck_")
    IO.writeParquet(ticks, in)
    val q = IO.writeStreamParquet(
      IO.readStreamParquet(spark, in, ticks.schema)
        .filter(col("isLive")), out, ck)
    try q.processAllAvailable() finally q.stop()
    assert(IO.readParquet(spark, out).count() == 42)
  }

  test("orc round-trip preserves rows, types and text payloads") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = Seq(
      (1L, "plain text", 3.5),
      (2L, "  padded  and, comma", -0.25),
      (3L, "", 0.0)
    ).toDF("id", "txt", "v")
    graft.sources.IO.writeOrc(df, tmp)
    val back = graft.sources.IO.readOrc(spark, tmp)
    // read-back relaxes nullability (file formats don't persist it) —
    // names and types are the fidelity contract
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("readParquetMerged: union schema, old files null-backfill new column") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_evo_spec").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.parquet(tmp + "/gen1")
    Seq((3L, 30.0, "x")).toDF("id", "v", "tag")
      .write.parquet(tmp + "/gen2")
    val merged = IO.readParquetMerged(spark, Seq(tmp + "/gen1", tmp + "/gen2"))
    assert(merged.columns.toSet == Set("id", "v", "tag"))
    val rows = merged.collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        if (r.isNullAt(r.fieldIndex("tag"))) null
        else r.getString(r.fieldIndex("tag")))).toSet
    assert(rows == Set((1L, null), (2L, null), (3L, "x")), rows.toString)
  }
}
