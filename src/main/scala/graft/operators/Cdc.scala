package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog (CDC) compaction — the incremental-maintenance story of a
  * 100 TB corpus: upstream ships an append-only stream of keyed change
  * records (upserts and deletes, each with a monotone sequence column) and
  * the engine must produce (a) the LATEST-WINS SNAPSHOT — the current state
  * per key — and (b) the SCD-2 HISTORY — every version with its validity
  * interval. The reference engine has no changelog surface; this extends
  * the library to the lakehouse-standard semantics (Delta/Hudi/Iceberg
  * `MERGE` compaction) a production corpus pipeline needs the day its
  * documents start receiving corrections.
  *
  * Scale design:
  *  - [[latestSnapshot]] is a single `max_by(row, seq)` aggregation — ONE
  *    shuffle with MAP-SIDE PARTIAL aggregation (the struct buffer plans
  *    it as a SortAggregate, whose sorts are per-partition on the grouping
  *    key — cheap and spillable; PlanSpec pins the shape). A window
  *    `row_number() = 1` formulation would shuffle every version of a hot
  *    key to one task and sort it there; max_by combines pairwise, so a
  *    key with 10^9 versions costs each map task only its local maxima.
  *    Deletes participate in the max (a delete NEWER than every upsert
  *    must win) and are dropped after the aggregate.
  *  - [[scd2]] genuinely needs per-key ordering (each version's `valid_to`
  *    is the NEXT version's `valid_from`) — a `lead()` window over
  *    (key, seq) is the honest minimum: one shuffle, in-group sort bounded
  *    by versions-per-key (corrections per document — shallow in practice,
  *    and unlike the snapshot this output is itself per-version, so the
  *    sort is proportional to the output).
  *
  * Ties on `seq` are broken by `tieCol` (a unique record id) so both
  * operators are deterministic on any engine, any partitioning.
  */
object Cdc {

  /** Latest-wins snapshot of a changelog: one row per key carrying the
    * payload of the highest-(seq, tie) record, with keys whose final
    * record is a delete removed. `isDelete` marks delete records.
    * Output: `keyCols` ++ `payload` column names.
    */
  def latestSnapshot(changelog: DataFrame, keyCols: Seq[String],
      seqCol: Column, tieCol: Column, isDelete: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    require(keyCols.nonEmpty && payload.nonEmpty)
    val state = struct(
      (payload.map { case (n, c) => c.as(n) } :+ isDelete.as("__del")): _*)
    changelog
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(state, struct(seqCol, tieCol)).as("__s"))
      .filter(!col("__s.__del"))
      .select(keyCols.map(col) ++
        payload.map { case (n, _) => col(s"__s.$n").as(n) }: _*)
  }

  /** INCREMENTAL merge — apply a new changelog batch onto an existing
    * VERSIONED snapshot without re-compacting history: the stored rows
    * re-enter the same max_by as synthetic records (their `__seq`/`__tie`/
    * `__del` restored), so by max-associativity
    * `applyChanges(latestSnapshotVersioned(A), B) ==
    * latestSnapshotVersioned(A ∪ B)` EXACTLY, for ANY `B` — late/stale
    * records lose the max, newer deletes win it, and because the
    * versioned form retains TOMBSTONES (deleted keys stay as `__del`
    * rows), a late record older than a winning delete cannot resurrect
    * the key. This is the lakehouse MERGE INTO loop: each ingest batch
    * hashes |snapshot ∪ batch| once, never |full history|. Project the
    * serving view with [[currentView]].
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: Column, tieCol: Column, isDelete: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    val asLog = snapshot.select(keyCols.map(col) ++
      Seq(col("__seq").as("__s0"), col("__tie").as("__t0"),
        col("__del").as("__d0")) ++
      payload.map { case (n, _) => col(n) }: _*)
    val newLog = changes.select(keyCols.map(col) ++
      Seq(seqCol.as("__s0"), tieCol.as("__t0"), isDelete.as("__d0")) ++
      payload.map { case (n, c) => c.as(n) }: _*)
    latestSnapshotVersioned(asLog.unionByName(newLog), keyCols,
      col("__s0"), col("__t0"), col("__d0"),
      payload.map { case (n, _) => n -> col(n) })
  }

  /** [[latestSnapshot]]'s mergeable form: per key the winning record WITH
    * its `__seq`/`__tie` version columns and `__del` tombstone flag —
    * deleted keys are retained so a later [[applyChanges]] can reject
    * stale resurrections. [[currentView]] drops tombstones and version
    * columns for serving.
    */
  def latestSnapshotVersioned(changelog: DataFrame, keyCols: Seq[String],
      seqCol: Column, tieCol: Column, isDelete: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    require(keyCols.nonEmpty && payload.nonEmpty)
    val state = struct(
      (payload.map { case (n, c) => c.as(n) } :+ isDelete.as("__del") :+
        seqCol.as("__seq") :+ tieCol.as("__tie")): _*)
    changelog
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(state, struct(seqCol, tieCol)).as("__s"))
      .select(keyCols.map(col) ++
        payload.map { case (n, _) => col(s"__s.$n").as(n) } ++
        Seq(col("__s.__del").as("__del"), col("__s.__seq").as("__seq"),
          col("__s.__tie").as("__tie")): _*)
  }

  /** The serving projection of a versioned snapshot: tombstones and
    * version columns dropped — equals [[latestSnapshot]] of the same log.
    */
  def currentView(versioned: DataFrame): DataFrame =
    versioned.filter(!col("__del")).drop("__del", "__seq", "__tie")

  /** SCD-2 version history: every non-delete record becomes a row with
    * `valid_from` = its own seq value and `valid_to` = the NEXT record's
    * (null while current — the open interval). A delete closes the
    * preceding version's interval but emits no row of its own, so a key
    * whose latest record is a delete has no open interval — consistent
    * with [[latestSnapshot]] dropping it. `is_current` marks open rows.
    */
  def scd2(changelog: DataFrame, keyCols: Seq[String],
      seqCol: Column, tieCol: Column, isDelete: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    require(keyCols.nonEmpty && payload.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"), col("__tie"))
    changelog
      .select(keyCols.map(col) ++ Seq(seqCol.as("valid_from"),
        tieCol.as("__tie"), isDelete.as("__del")) ++
        payload.map { case (n, c) => c.as(n) }: _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .filter(!col("__del"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__del", "__tie")
  }

  /** Point-in-time (time-travel) enrichment against an [[scd2]] dimension:
    * each fact row joins the dimension version whose `[valid_from,
    * valid_to)` interval covers the fact timestamp. Facts landing in a
    * DELETED interval (tombstone version excised by [[scd2]]) get no
    * match — the semantics that distinguish this from an as-of join on the
    * raw changelog, which would resurrect the pre-delete row.
    *
    * Scale shape: ONE equi-join shuffle on the dimension key with the
    * interval test as a post-join predicate; each fact matches at most one
    * version (intervals partition the timeline per key), so output =
    * |facts|. Hot keys are AQE's skew-join case, not a plan change.
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, keyCols: Seq[String],
      factTs: Column): DataFrame = {
    require(keyCols.nonEmpty)
    val d = keyCols.foldLeft(dim)((df, k) =>
      df.withColumnRenamed(k, s"__d_$k"))
    val cond = keyCols.map(k => col(k) === col(s"__d_$k")).reduce(_ && _) &&
      col("valid_from") <= factTs &&
      (col("valid_to").isNull || factTs < col("valid_to"))
    facts.join(d, cond, "left_outer")
      .drop(keyCols.map(k => s"__d_$k"): _*)
  }

  /** Snapshot DIFF: classify every key across two snapshot versions as
    * `added` (new only), `deleted` (old only) or `changed` (both, any
    * compared column differs). Unchanged keys are DROPPED — the output is
    * proportional to the churn, not the table, which is what makes a diff
    * of two 100 TB snapshots writable: a full-outer join on the snapshot
    * key (one shuffle each side, co-partitioned) emitting only the
    * disagreeing rows. Comparison is null-safe (`<=>`), so a column going
    * null counts as a change.
    * Output: keyCols ++ change ∈ {added, deleted, changed} ++
    * old_/new_-prefixed compared columns.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val o = compareCols.foldLeft(
      keyCols.foldLeft(oldSnap)((df, k) =>
        df.withColumnRenamed(k, s"__o_$k")))((df, c) =>
      df.withColumnRenamed(c, s"old_$c"))
    val n = compareCols.foldLeft(newSnap)((df, c) =>
      df.withColumnRenamed(c, s"new_$c"))
    val cond = keyCols.map(k => col(k) === col(s"__o_$k")).reduce(_ && _)
    val differs = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    val oldKey = col(s"__o_${keyCols.head}")
    val newKey = col(keyCols.head)
    o.join(n, cond, "full_outer")
      .withColumn("change",
        when(oldKey.isNull, lit("added"))
          .when(newKey.isNull, lit("deleted"))
          .when(differs, lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(k => coalesce(col(k), col(s"__o_$k")).as(k)) ++
        Seq(col("change")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
