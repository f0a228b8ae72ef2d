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
}
