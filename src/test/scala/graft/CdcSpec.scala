package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Changelog-compaction semantics: latest-wins with delete markers, tie
  * determinism, and SCD-2 validity intervals (deletes close the prior
  * version without emitting a row).
  */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  // (key, seq, tie, op, payload) — op "D" deletes
  private def log = Seq(
    ("a", 1L, 1L, "U", "a1"),
    ("a", 3L, 2L, "U", "a3"),
    ("a", 2L, 3L, "U", "a2"),   // out-of-order arrival; seq wins, not order
    ("b", 1L, 4L, "U", "b1"),
    ("b", 2L, 5L, "D", ""),     // b deleted last → no snapshot row
    ("c", 5L, 6L, "U", "cA"),
    ("c", 5L, 7L, "U", "cB"),   // same seq: tie column decides (7 > 6)
    ("d", 1L, 8L, "D", ""),
    ("d", 2L, 9L, "U", "d2")    // delete then re-insert → d2 current
  ).toDF("k", "seq", "tie", "op", "v")

  test("latestSnapshot: latest-wins, deletes drop keys, ties deterministic") {
    val got = Cdc.latestSnapshot(log, Seq("k"), col("seq"), col("tie"),
        col("op") === "D", Seq("v" -> col("v")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "a3"), ("c", "cB"), ("d", "d2")), s"got=$got")
  }

  test("scd2: validity chains, deletes close intervals, current flagged") {
    val got = Cdc.scd2(log, Seq("k"), col("seq"), col("tie"),
        col("op") === "D", Seq("v" -> col("v")))
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(got == Set(
      ("a", "a1", 1L, 2L, false),
      ("a", "a2", 2L, 3L, false),
      ("a", "a3", 3L, -1L, true),
      ("b", "b1", 1L, 2L, false),  // closed by the delete, no open row
      ("c", "cA", 5L, 5L, false),  // tie: cA precedes cB
      ("c", "cB", 5L, -1L, true),
      ("d", "d2", 2L, -1L, true)   // the delete emitted nothing
    ), s"got=$got")
  }

  test("pointInTime: interval cover, tombstone gaps unmatched, pre-history null") {
    val dim = Cdc.scd2(log, Seq("k"), col("seq"), col("tie"),
      col("op") === "D", Seq("v" -> col("v")))
    val facts = Seq(
      (1L, "a", 2L),  // inside a2's [2,3)
      (2L, "a", 0L),  // pre-history → null
      (3L, "b", 1L),  // b1's [1,2)
      (4L, "b", 3L),  // tombstoned at 2 → null (as-of would say b1)
      (5L, "c", 5L),  // zero-width cA skipped, cB matches
      (6L, "d", 1L),  // delete-at-1 gap → null
      (7L, "d", 2L)   // reinserted d2
    ).toDF("fid", "k", "ft")
    val got = Cdc.pointInTime(facts, dim, Seq("k"), col("ft"))
      .select("fid", "v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map(1L -> "a2", 2L -> null, 3L -> "b1", 4L -> null,
      5L -> "cB", 6L -> null, 7L -> "d2"), s"got=$got")
    assert(Cdc.pointInTime(facts, dim, Seq("k"), col("ft")).count() ==
      facts.count(), "each fact matches at most one version")
  }

  test("applyChanges(snapshot(A), B) == snapshot(A ∪ B) for adversarial B") {
    val rnd = new scala.util.Random(11)
    // random changelog with hot keys, deletes, equal-seq ties, and a B
    // slice containing records OLDER than A's winners (incl. older than a
    // winning delete — the tombstone-resurrection trap)
    val all = (1 to 300).map { i =>
      (s"k${rnd.nextInt(12)}", rnd.nextInt(20).toLong, i.toLong,
        if (rnd.nextInt(5) == 0) "D" else "U", s"v$i")
    }
    val (a, b) = all.splitAt(200) // split by arrival, NOT by seq — B is late
    def args = (Seq("k"), col("seq"), col("tie"), col("op") === "D",
      Seq("v" -> col("v")))
    def snap(rows: Seq[(String, Long, Long, String, String)]) = {
      val df = rows.toDF("k", "seq", "tie", "op", "v")
      Cdc.latestSnapshotVersioned(df, args._1, args._2, args._3, args._4, args._5)
    }
    val incremental = Cdc.applyChanges(snap(a),
        b.toDF("k", "seq", "tie", "op", "v"),
        args._1, args._2, args._3, args._4, args._5)
      .collect().map(_.toSeq).toSet
    val full = snap(all).collect().map(_.toSeq).toSet
    assert(incremental == full,
      s"diff: ${(incremental -- full) ++ (full -- incremental)}")
    // and the serving view matches the one-shot snapshot operator
    val view = Cdc.currentView(snap(all))
      .collect().map(_.toSeq).toSet
    val oneShot = Cdc.latestSnapshot(all.toDF("k", "seq", "tie", "op", "v"),
        args._1, args._2, args._3, args._4, args._5)
      .collect().map(_.toSeq).toSet
    assert(view == oneShot)
  }

  test("snapshot equals the current rows of scd2") {
    val snap = Cdc.latestSnapshot(log, Seq("k"), col("seq"), col("tie"),
        col("op") === "D", Seq("v" -> col("v")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val cur = Cdc.scd2(log, Seq("k"), col("seq"), col("tie"),
        col("op") === "D", Seq("v" -> col("v")))
      .filter(col("is_current")).select("k", "v")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(snap == cur, s"snap=$snap cur=$cur")
  }

  test("snapshotDiff: added/deleted/changed only, null-safe compare") {
    val old = Seq(("a", "1", "x"), ("b", "2", "y"), ("c", "3", null),
      ("e", "5", "same")).toDF("k", "v1", "v2")
    val neu = Seq(("a", "1", "x2"), ("c", "3", null), ("d", "4", "new"),
      ("e", "5", "same")).toDF("k", "v1", "v2")
    val got = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("v1", "v2"))
      .select("k", "change")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // e unchanged → dropped; c's null v2 equals null v2 (null-safe) → dropped
    assert(got == Set(("a", "changed"), ("b", "deleted"), ("d", "added")),
      s"got=$got")
    val a = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("v1", "v2"))
      .filter(col("k") === "a").head()
    assert(a.getAs[String]("old_v2") == "x" &&
      a.getAs[String]("new_v2") == "x2")
  }
}
