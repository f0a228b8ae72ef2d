package graft

import java.sql.Timestamp

import graft.operators.RangeJoin

/** Pins the binned range join's containment semantics at the boundaries
  * the bucketing could plausibly break: inclusive start, exclusive end,
  * intervals spanning many buckets, matches in a bucket other than the
  * interval's first, and degenerate (empty) intervals.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("containment is [start, end) across bucket boundaries") {
    val points = Seq(
      (1L, ts(0)),    // == start of A → in
      (1L, ts(119)),  // last µs-minute before end of A (bucket 1) → in
      (1L, ts(120)),  // == end of A → out; == start of B → in B
      (1L, ts(500)),  // in no interval
      (2L, ts(60))    // key mismatch with A (key 1) → only in C (key 2)
    ).toDF("k", "ts")
    val intervals = Seq(
      (1L, ts(0), ts(120), "A"),   // spans buckets 0-1 at 1h bucket
      (1L, ts(120), ts(180), "B"),
      (2L, ts(0), ts(120), "C"),
      (1L, ts(300), ts(300), "E")  // empty interval: matches nothing
    ).toDF("k", "start", "end", "name")
    val got = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "ts", "start", "end")
      .select("k", "ts", "name").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
        r.getString(2))).toSet
    assert(got == Set((1L, 0L, "A"), (1L, 119L, "A"), (1L, 120L, "B"),
      (2L, 60L, "C")), s"got=$got")
  }

  test("interval overlap join: each overlapping pair exactly once") {
    // Overlap cases across bucket boundaries at the 1 h default bucket:
    // long×long sharing many buckets (must dedup to ONE row), touching
    // intervals (half-open → no overlap), containment, key mismatch.
    val left = Seq(
      (1L, ts(0), ts(240), "L1"),    // 4 buckets
      (1L, ts(300), ts(360), "L2"),
      (2L, ts(0), ts(60), "L3")
    ).toDF("k", "s1", "e1", "ln")
    val right = Seq(
      (1L, ts(60), ts(420), "R1"),   // overlaps L1 (many shared buckets) + L2
      (1L, ts(240), ts(300), "R2"),  // touches L1 end and L2 start → neither
      (2L, ts(30), ts(90), "R3"),    // overlaps L3
      (1L, ts(0), ts(30), "R4")      // overlaps L1 only
    ).toDF("k", "s2", "e2", "rn")
    val got = RangeJoin.intervalOverlap(left, right, Seq("k"),
        "s1", "e1", "s2", "e2")
      .select("ln", "rn").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.length == got.distinct.length, s"duplicate pairs: ${got.toSeq}")
    assert(got.toSet == Set(("L1", "R1"), ("L1", "R4"), ("L2", "R1"),
      ("L3", "R3")), s"got=${got.toSet}")
  }

  test("interval overlap matches the brute-force theta join on random data") {
    val rnd = new scala.util.Random(7)
    val mk = (n: Int, key: String) => (1 to n).map { i =>
      val s = rnd.nextInt(600); val e = s + 1 + rnd.nextInt(180)
      (rnd.nextInt(3).toLong, ts(s.toLong), ts(e.toLong), s"$key$i")
    }
    val l = mk(40, "L").toDF("k", "s1", "e1", "ln")
    val r = mk(40, "R").toDF("k", "s2", "e2", "rn")
    val got = RangeJoin.intervalOverlap(l, r, Seq("k"), "s1", "e1", "s2", "e2",
        bucket = "1 hour")
      .select("ln", "rn").collect().map(x => (x.getString(0), x.getString(1)))
    val want = l.join(r, l("k") === r("k") &&
        l("s1") < r("e2") && r("s2") < l("e1"))
      .select("ln", "rn").collect().map(x => (x.getString(0), x.getString(1)))
    assert(got.sorted.toSeq == want.sorted.toSeq,
      s"got=${got.length} want=${want.length}")
  }
}
