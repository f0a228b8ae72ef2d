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

  test("profile on empty input: zero rows, zero facts, no throw") {
    val empty = Seq.empty[(java.lang.Long, String)].toDF("id", "cat")
    val p = Profiling.tableProfile(empty, Seq("id", "cat"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p == Map("id" -> ((0L, 0L, 0L)), "cat" -> ((0L, 0L, 0L))))
  }
}
