package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** END-STATE reads through the public `statestore` data source for the
  * keyed-state twins that previously claimed bounded state analytically
  * only (the candle processor's eviction proof lives in StreamingSpec).
  * The 100 TB guarantee under test: after an arbitrarily long replay, the
  * store holds the CONTRACTED per-key remainder — a set bounded by the
  * catalog, one open version, one last-arrival pair — never event volume.
  */
class StateBoundsSpec extends graft.SparkSpec {

  /** transformWithState needs a multi-column-family store (RocksDB) —
    * scoped to the query exactly as the replay harness scopes it.
    */
  private def withRocksDb[T](body: => T): T =
    FileReplay.withStreamConfs(spark, Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true"))(body)

  test("cooccurrence state: one row per user, set bounded by catalog, deletes none") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("graft_co_state").toString
    withRocksDb {
    val q = StreamingCooccurrence.emitted(
        ms.toDF().select(col("_1").as("user_id"), col("_2").as("event_type")),
        "user_id", "event_type")
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ckpt).start()
    try {
      // 3 users × 300 events over a 3-item catalog: volume is 100× the
      // catalog, so retained-history bugs show up as >3 items per user
      for (batch <- 0 until 10) {
        ms.addData((0 until 30).map(i =>
          ((i % 3).toLong, s"item${(batch + i) % 3}")): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    }
    val st = spark.read.format("statestore")
      .option("stateVarName", "seen").load(ckpt)
    assert(st.count() == 3, s"expected one state row per user: ${st.count()}")
    val maxItems = st.select(max(size(col("value.items")))).head().getInt(0)
    assert(maxItems <= 3,
      s"item SET must be catalog-bounded, found $maxItems entries")
  }

  test("scd2 state: one open version per live key, cleared on delete") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamingScd2.VersionRow]
    val ckpt = Files.createTempDirectory("graft_scd2_state").toString
    withRocksDb {
    val q = ms.toDS()
      .groupByKey(_.key)
      .transformWithState(new StreamingScd2.Scd2Processor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ckpt).start()
    try {
      // keys 1..5, three versions each across epochs; key 3 ends deleted
      for (v <- 0 until 3) {
        ms.addData((1L to 5L).map(k => StreamingScd2.VersionRow(
          k, 1000L * (v + 1), k * 10 + v, del = false,
          s"t$v", v.toDouble, Long.MinValue)): _*)
        q.processAllAvailable()
      }
      ms.addData(StreamingScd2.VersionRow(
        3L, 9000L, 99L, del = true, "del", 0.0, Long.MinValue))
      q.processAllAvailable()
    } finally q.stop()
    }
    val st = spark.read.format("statestore")
      .option("stateVarName", "scd2").load(ckpt)
    assert(st.count() == 4,
      s"expected 4 open versions (key 3 deleted): ${st.count()}")
    // the retained remainder is the LATEST version, not the history
    val froms = st.select(collect_set(col("value.validFrom"))).head()
      .getSeq[Long](0)
    assert(froms == Seq(3000L),
      s"state must hold only the last version (validFrom 3000): $froms")
  }

  test("interarrival state: one last-arrival pair per (type, day) key") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamingInterarrival.Ev]
    val ckpt = Files.createTempDirectory("graft_gap_state").toString
    val day = 86400000000L
    withRocksDb {
    val q = ms.toDS()
      .groupByKey(e => (e.etype, e.day))
      .transformWithState(new StreamingInterarrival.GapProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ckpt).start()
    try {
      // 2 types × 2 days × 200 events — state must stay at 4 keys
      for (batch <- 0 until 4) {
        ms.addData((0 until 100).map { i =>
          val d = ((i / 2) % 2).toLong
          StreamingInterarrival.Ev(s"t${i % 2}", d,
            d * day + batch * 1000000L + i, batch * 100L + i)
        }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    }
    val st = spark.read.format("statestore")
      .option("stateVarName", "last").load(ckpt)
    assert(st.count() == 4,
      s"expected one last-arrival row per (type, day): ${st.count()}")
  }
}
