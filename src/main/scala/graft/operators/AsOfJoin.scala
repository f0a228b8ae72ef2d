package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: each left row picks the latest right row of the
  * same key with `right.ts <= left.ts` — the standard way to align trades to
  * quotes, events to reference data, or any two keyed time-series.
  *
  * The reference has no as-of join (its correlation alignment is exact-
  * timestamp equality after gap-fill, `ComputeCorrelationsDoFn.java:161-164`)
  * but a time-series engine needs one; Spark has no built-in either, so this
  * composes it from primitives rather than a custom physical operator:
  *
  *  1. tag both sides and union them (schema-aligned, payloads as nullable
  *     structs);
  *  2. one `Window.partitionBy(key).orderBy(ts, side, payload)` with
  *     `last(rightPayload, ignoreNulls)` over the unbounded-preceding frame
  *     carries the latest right payload to every row; right sorts before
  *     left on timestamp ties, so `<=` (at-or-before) holds;
  *  3. keep only left rows, unpack the carried payload.
  *
  * Tie rule (deterministic): when several right rows share the same
  * (key, ts), the GREATEST payload struct wins — the payload participates
  * in the window sort, so the pick is a total order over the data, not an
  * artifact of partition iteration order. Oracles must mirror it by
  * pre-deduplicating the right side per (key, ts) with max-of-payload.
  *
  * Scale notes (100 TB): exactly ONE hash exchange (on key) and one in-
  * partition sort — the same cost class as any window function, independent
  * of time-range overlap. The naive alternative — a theta-join on
  * `l.ts >= r.ts` + max-per-left — explodes to |left|×|right| rows per key
  * before aggregating; this formulation never materializes a pair. Skewed
  * keys can use the usual salting on the union input. An optional tolerance
  * bounds how stale a match may be (filter, applied after the carry).
  */
object AsOfJoin {

  /** `left` as-of-backward `right` on `key`: latest right at-or-before each
    * left row's `ts`, null-extended when no right row precedes (left join).
    * Right columns (minus key/ts) are emitted under `rightPrefix`; the
    * matched right timestamp as `<rightPrefix>ts`.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String = "key",
      ts: String = "ts",
      rightPrefix: String = "right_",
      tolerance: Option[String] = None): DataFrame = {

    val rightPayloadCols = right.columns.filter(c => c != key && c != ts)
    val payload = struct(col(ts) +: rightPayloadCols.map(col): _*)

    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        right.select(payload).schema.fields.head.dataType))
    val r = right
      .select(col(key), col(ts), lit(0).as("__side"), payload.as("__r"))

    val unioned = l.select(
        (Seq(col(key), col(ts), col("__side"), col("__r")) ++
          left.columns.filter(c => c != key && c != ts).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)

    // __r ascending = among equal-ts right rows the greatest payload is
    // carried (left rows order by __side after every right tie regardless)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))

    val within = tolerance match {
      case Some(t) =>
        when(col("__m").isNotNull &&
          col(ts) <= col("__m").getField(ts) + expr(s"INTERVAL $t"), col("__m"))
      case None => col("__m")
    }

    carried
      .filter(col("__side") === 1)
      .withColumn("__m", within)
      .select(
        (left.columns.map(col) ++
          Seq(col("__m").getField(ts).as(s"$rightPrefix$ts")) ++
          rightPayloadCols.map(c => col("__m").getField(c).as(s"$rightPrefix$c"))): _*)
  }

  /** Nearest variant: the right row minimizing |right.ts − left.ts|, the
    * backward match winning exact-distance ties. One union, ONE hash
    * exchange on the key, two in-partition sorts (the backward and forward
    * carries share the partitioning — Catalyst plans a single Exchange) —
    * still no pair materialization. Same greatest-payload rule on equal-ts
    * right duplicates as [[backward]]/[[forward]]; `tolerance` bounds the
    * match distance on BOTH sides before the nearer one is picked.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      key: String = "key",
      ts: String = "ts",
      rightPrefix: String = "right_",
      tolerance: Option[String] = None): DataFrame = {

    val rightPayloadCols = right.columns.filter(c => c != key && c != ts)
    val payload = struct(col(ts) +: rightPayloadCols.map(col): _*)

    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        right.select(payload).schema.fields.head.dataType))
    val r = right
      .select(col(key), col(ts), lit(0).as("__side"), payload.as("__r"))

    val unioned = l.select(
        (Seq(col(key), col(ts), col("__side"), col("__r")) ++
          left.columns.filter(c => c != key && c != ts).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)

    // right (__side = 0) sorts before left at equal ts under BOTH scans, so
    // at-or-before / at-or-after both hold; __r asc keeps the greatest
    // payload last (= carried) among equal-ts right duplicates
    def carryWindow(tsOrd: Column) = Window.partitionBy(key)
      .orderBy(tsOrd, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(carryWindow(col(ts).asc)))
      .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(carryWindow(col(ts).desc)))

    def bounded(m: Column, dist: Column) = tolerance match {
      case Some(t) => when(m.isNotNull && dist <= expr(s"INTERVAL $t"), m)
      case None => m
    }
    val mb = bounded(col("__mb"), col(ts) - col("__mb").getField(ts))
    val mf = bounded(col("__mf"), col("__mf").getField(ts) - col(ts))

    val distB = unix_micros(col(ts)) - unix_micros(col("__mb").getField(ts))
    val distF = unix_micros(col("__mf").getField(ts)) - unix_micros(col(ts))
    val pick = when(mb.isNull, mf).when(mf.isNull, mb)
      .when(distB <= distF, mb).otherwise(mf)

    carried
      .filter(col("__side") === 1)
      .withColumn("__m", pick)
      .select(
        (left.columns.map(col) ++
          Seq(col("__m").getField(ts).as(s"$rightPrefix$ts")) ++
          rightPayloadCols.map(c => col("__m").getField(c).as(s"$rightPrefix$c"))): _*)
  }

  /** Forward variant: earliest right at-or-after each left row. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String = "key",
      ts: String = "ts",
      rightPrefix: String = "right_",
      tolerance: Option[String] = None): DataFrame = {

    val rightPayloadCols = right.columns.filter(c => c != key && c != ts)
    val payload = struct(col(ts) +: rightPayloadCols.map(col): _*)

    val l = left
      .withColumn("__side", lit(0))
      .withColumn("__r", lit(null).cast(
        right.select(payload).schema.fields.head.dataType))
    val r = right
      .select(col(key), col(ts), lit(1).as("__side"), payload.as("__r"))

    val unioned = l.select(
        (Seq(col(key), col(ts), col("__side"), col("__r")) ++
          left.columns.filter(c => c != key && c != ts).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)

    // mirror of backward: scan from the future — first right at-or-after;
    // __r ascending keeps the same greatest-payload tie rule
    val w = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("__side").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))

    val within = tolerance match {
      case Some(t) =>
        when(col("__m").isNotNull &&
          col("__m").getField(ts) <= col(ts) + expr(s"INTERVAL $t"), col("__m"))
      case None => col("__m")
    }

    carried
      .filter(col("__side") === 0)
      .withColumn("__m", within)
      .select(
        (left.columns.map(col) ++
          Seq(col("__m").getField(ts).as(s"$rightPrefix$ts")) ++
          rightPayloadCols.map(c => col("__m").getField(c).as(s"$rightPrefix$c"))): _*)
  }
}
