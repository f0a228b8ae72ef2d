package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL RANKING — dense 0-based ranks under a total order,
  * without the single-partition `row_number() OVER (ORDER BY …)` that
  * serializes a corpus-sized sort onto one task (the same bottleneck
  * [[Packing.packSequences]]' two-level prefix sum avoids for token
  * offsets; this is the row-count analog):
  *
  *  1. range-repartition + in-partition sort on the order columns — the
  *     distributed sort Spark already does for any ORDER BY;
  *  2. one tiny per-partition row-count aggregation; cumulative offsets
  *     via a window over |partitions| rows (the only serial step —
  *     bounded by the partition count, not the data);
  *  3. rank = partition offset + in-partition `row_number` (a window
  *     PARTITIONED by the range partition — parallel again).
  *
  * The order MUST be total (append a unique id as the last column):
  * range partitioning may split equal keys across partition boundaries,
  * and only a total order makes the rank independent of where the
  * split fell. With a total order the result is deterministic for ANY
  * partition count — pinned by RankingSpec.
  *
  * The classic consumer is curriculum ordering: rank docs by a score,
  * then feed the dense rank to [[Packing.packSequences]] as the packing
  * id — gated end-to-end as `pack_curriculum`.
  */
object Ranking {

  /** DICTIONARY ENCODE: the distinct values of `keyCol` as a (key, id)
    * relation with ids dense, 0-based, in the key's own sort order — the
    * standard trick for packing/ranking on STRING keys (what
    * [[Correlations.topPartnersPacked]]'s dense-non-negative-id contract
    * asks callers to supply). Because ids are the keys' ranks, numeric id
    * order IS lexicographic key order, so packed tiebreaks decode back to
    * string-ascending tiebreaks.
    *
    * One distinct shuffle over the rows, then [[withGlobalRank]]'s
    * two-level machinery over the VOCABULARY-sized distinct relation —
    * the serial step stays |partitions| rows regardless of corpus size,
    * and a real universe (10k instruments, millions of vocab entries)
    * sits far under the packing's 2^40 id budget.
    */
  def dictionaryIds(df: DataFrame, keyCol: String, parts: Int = 0): DataFrame =
    withGlobalRank(
        df.select(col(keyCol).cast("string").as("key")).distinct(),
        Seq(col("key")), parts)
      .select(col("key"), col("rank").as("id"))

  /** `df` plus a dense 0-based `rank` column under `order` (total order
    * required). `parts = 0` uses the session's shuffle parallelism.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
      parts: Int = 0): DataFrame = {
    require(order.nonEmpty, "rank needs at least one order column")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint pins the partitioning: the offsets aggregate and the
    // rank projection must see the SAME partition ids
    val sorted = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy("__pid").agg(count(lit(1)).as("__n"))
    // serial step: |partitions| rows, not |rows|
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wIn = Window.partitionBy("__pid").orderBy(order: _*)
    sorted.join(broadcast(offsets), "__pid")
      .withColumn("rank", col("__off") + row_number().over(wIn) - 1)
      .drop("__pid", "__off")
  }

  /** `df` plus an EXCLUSIVE global prefix sum of `value` under `order`
    * (total order required), named `as` — [[withGlobalRank]]'s machinery
    * summing an arbitrary column instead of counting rows: range
    * partition + in-partition sort, one |partitions|-row serial offset
    * pass, then a parallel in-partition running sum.
    */
  def withGlobalPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      as: String, parts: Int = 0): DataFrame = {
    require(order.nonEmpty, "prefix sum needs at least one order column")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.withColumn("__v", value)
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy("__pid").agg(sum(col("__v")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wIn = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted.join(broadcast(offsets), "__pid")
      .withColumn(as,
        col("__off") + coalesce(sum(col("__v")).over(wIn), lit(0L)))
      .drop("__pid", "__off", "__v")
  }

  /** Grouped form of [[withGlobalPrefixSum]]: an exclusive prefix sum of
    * `value` under `order` WITHIN each `segCol` group — one range
    * partition over (segment, order) so a segment spans contiguous
    * partitions, per-(partition, segment) totals, offsets via a window
    * over the |partitions|·|touched segments| relation (each segment's
    * serial chain is its own partition span, never the data), then the
    * parallel in-partition running sum. The offsets relation broadcasts;
    * segment cardinality beyond broadcast size would swap that join to a
    * plain hash join with no other change.
    */
  def withGroupedPrefixSum(df: DataFrame, segCol: String,
      order: Seq[Column], value: Column, as: String, parts: Int = 0)
      : DataFrame = {
    require(order.nonEmpty, "prefix sum needs at least one order column")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val fullOrder = col(segCol) +: order
    val sorted = df.withColumn("__v", value)
      .repartitionByRange(p, fullOrder: _*)
      .sortWithinPartitions(fullOrder: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wOff = Window.partitionBy(segCol).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("__pid"), col(segCol))
      .agg(sum(col("__v")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__pid"), col(segCol), col("__off"))
    val wIn = Window.partitionBy(col("__pid"), col(segCol))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted.join(broadcast(offsets), Seq("__pid", segCol))
      .withColumn(as,
        col("__off") + coalesce(sum(col("__v")).over(wIn), lit(0L)))
      .drop("__pid", "__off", "__v")
  }

  /** Per-segment [[binaryAuc]] — the sliced-evaluation view (AUC per
    * cohort / per slice is how eval regressions localize). Same design,
    * grouped: distinct (segment, score) collapse, grouped prefix sum,
    * one |segments|-row aggregate. Segments with one class get null auc.
    */
  def groupedAuc(df: DataFrame, segCol: String, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val byScore = df
      .select(col(segCol), scoreCol.as("score"),
        labelCol.cast("boolean").cast("int").as("__y"))
      .filter(col("score").isNotNull && col("__y").isNotNull)
      .groupBy(col(segCol), col("score"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    withGroupedPrefixSum(byScore, segCol, Seq(col("score")), col("n"),
        "rank_before")
      .groupBy(col(segCol))
      .agg(
        sum(col("n_pos") * (col("rank_before") + (col("n") + 1) / 2.0))
          .as("__rpos"),
        sum(col("n_pos")).as("n_pos"),
        sum(col("n") - col("n_pos")).as("n_neg"))
      .select(col(segCol),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__rpos") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos") * col("n_neg")), 6)).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Binary-classifier AUC — exact, by the tie-corrected Mann–Whitney
    * rank sum: `AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻)` with tied scores
    * taking their average rank. The 100 TB design: scores collapse FIRST
    * to one row per DISTINCT score (`n`, `n_pos` — a hash aggregate with
    * map-side partials; ties collapse for free), the global rank base
    * comes from [[withGlobalPrefixSum]] over that deduplicated relation,
    * and the statistic folds in one scalar aggregate. Nothing ever sorts
    * on a single task and the fact is scanned once.
    * Output (1 row): auc (6 dp), n_pos, n_neg.
    */
  def binaryAuc(df: DataFrame, scoreCol: Column, labelCol: Column)
      : DataFrame = {
    val byScore = df
      .select(scoreCol.as("score"),
        labelCol.cast("boolean").cast("int").as("__y"))
      .filter(col("score").isNotNull && col("__y").isNotNull)
      .groupBy("score")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    withGlobalPrefixSum(byScore, Seq(col("score")), col("n"), "rank_before")
      .agg(
        sum(col("n_pos") * (col("rank_before") + (col("n") + 1) / 2.0))
          .as("__rpos"),
        sum(col("n_pos")).as("n_pos"),
        sum(col("n") - col("n_pos")).as("n_neg"))
      .select(
        // degenerate label sets (no positives or no negatives) have no
        // defined AUC — null, not a NaN/Infinity from the 0 denominator
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__rpos") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos") * col("n_neg")), 6)).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Confusion-matrix THRESHOLD SWEEP: tp/fp/fn/tn and derived
    * precision/recall at each cut `score > edges(i)`. One pass bins every
    * row to its threshold interval (row-local `size(filter(edges))`, the
    * feature_bins pattern), one hash aggregate to |edges|+1 rows, and the
    * per-threshold totals come from a window over that tiny relation —
    * the fact never re-shuffles per threshold.
    */
  def confusionSweep(df: DataFrame, scoreCol: Column, labelCol: Column,
      edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      "edges must be non-empty, ascending, distinct")
    val e = typedLit(edges)
    val binned = df
      .select(scoreCol.as("__s"),
        labelCol.cast("boolean").cast("int").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .select(size(filter(e, x => col("__s") > x)).as("__bin"), col("__y"))
      .groupBy("__bin")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
    // a threshold interval can be EMPTY — left-join a full bin spine so
    // its threshold row still comes out (with zero counts)
    val spine = df.sparkSession.range(0, edges.size + 1)
      .select(col("id").cast("int").as("__bin"))
    val binnedFull = spine.join(binned, Seq("__bin"), "left")
      .na.fill(0L, Seq("__n", "__np"))
    // bin b = number of edges strictly below the score ⇒ rows with
    // __bin > i sit ABOVE edges(i): suffix sums over |edges|+1 rows.
    val wAbove = Window.orderBy(col("__bin"))
      .rowsBetween(1, Window.unboundedFollowing)
    val totals = binnedFull
      .withColumn("__above_n", coalesce(sum(col("__n")).over(wAbove), lit(0L)))
      .withColumn("__above_p", coalesce(sum(col("__np")).over(wAbove), lit(0L)))
      .withColumn("__tot_n", sum(col("__n")).over(Window.orderBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__tot_p", sum(col("__np")).over(Window.orderBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // threshold i reads the row __bin = i (rows above it = predicted pos)
    totals.filter(col("__bin") < edges.size)
      .select(
        element_at(e, col("__bin") + 1).as("threshold"),
        col("__above_p").as("tp"),
        (col("__above_n") - col("__above_p")).as("fp"),
        (col("__tot_p") - col("__above_p")).as("fn"),
        (col("__tot_n") - col("__above_n") - col("__tot_p") +
          col("__above_p")).as("tn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          round(col("tp") / (col("tp") + col("fp")), 6)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          round(col("tp") / (col("tp") + col("fn")), 6)))
  }
}
