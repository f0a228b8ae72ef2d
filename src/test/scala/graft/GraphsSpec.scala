package graft

import graft.operators.Graphs

/** Hand-computed PageRank rounds pin the recurrence, the sink behavior
  * (no out-edges → drained mass) and the source behavior (no in-edges →
  * rank settles at 1 − d).
  */
class GraphsSpec extends SparkSpec {

  import spark.implicits._

  test("pageRank reproduces hand-computed rounds on a 3-node graph") {
    // 1→2, 3→2, 2→1 (node 3 is a source, nothing is a sink)
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    // r0 = 1; r1 = (1: .15+.85·1 = 1, 2: .15+.85·2 = 1.85, 3: .15)
    // r2 = (1: .15+.85·1.85 = 1.7225, 2: .15+.85·(1+.15) = 1.1275, 3: .15)
    val r = Graphs.pageRank(edges, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 1.7225, 2L -> 1.1275, 3L -> 0.15), s"$r")
  }

  test("pageRank mean stays 1 on a regular graph (ring)") {
    val n = 10L
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val r = Graphs.pageRank(edges, iters = 5)
      .collect().map(_.getDouble(1))
    assert(r.forall(v => math.abs(v - 1.0) < 1e-9),
      s"ring must converge to all-1: ${r.toSeq}")
  }

  test("triangles: hand-counted graph; direction, duplicates and self-loops ignored") {
    // K4 on {1,2,3,4} minus edge (3,4), plus pendant 5, a self-loop, and
    // reversed/duplicated edges that must canonicalize away:
    // triangles = {1,2,3} and {1,2,4} → 1:2, 2:2, 3:1, 4:1; 5 in none
    val edges = Seq(
      (1L, 2L), (2L, 1L),           // duplicate in both directions
      (1L, 3L), (2L, 3L),
      (1L, 4L), (4L, 2L),
      (4L, 5L), (3L, 3L)            // pendant edge + self-loop
    ).toDF("src", "dst")
    val got = Graphs.triangles(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), s"$got")
  }

  test("triangles: triangle-free graph emits nothing; K5 counts C(4,2) per node") {
    val ring = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    assert(Graphs.triangles(ring).count() == 0, "even ring has no triangles")
    val k5 = (for { i <- 0L until 5L; j <- 0L until 5L if i < j }
      yield (i, j)).toDF("src", "dst")
    val got = Graphs.triangles(k5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each node of K5 sits in C(4,2) = 6 triangles
    assert(got == (0L until 5L).map(_ -> 6L).toMap, s"$got")
  }
}
