package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-scan table profiling — the data-validation stage a training
  * pipeline runs before admitting a new table or crawl drop: per-column
  * completeness (null counts), cardinality, and numeric ranges, the facts
  * a constraint suite ("user_id is never null", "value stays in [0, 100]",
  * "event_type has ≤ 10 distinct values") checks against.
  *
  * Output is LONG format — one row per profiled column:
  * `(col_name, n_rows, n_nulls, n_distinct, min_num, max_num)`, with
  * min/max null for non-numeric columns (completeness and cardinality are
  * type-agnostic; ranges only mean something numeric).
  *
  * Scale shape: ALL columns profile in ONE aggregation over ONE scan — a
  * single wide agg row, then a `stack` unpivot of that 1-row relation
  * (driver-sized, |cols| output rows). With `exact = true` the distinct
  * counts are exact, which Spark plans via Expand (the input replicates
  * ×|cols| before the partial agg — fine at audit time, wasteful as a
  * standing job); `exact = false` swaps in HyperLogLog++ sketches
  * (`approx_count_distinct`, ~2% error) and the whole profile stays one
  * codegen pass with O(|cols|) fixed state per partition — the 100 TB
  * default, same trade documented in [[Sketches]].
  */
object Profiling {

  def tableProfile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      val numeric = schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        (if (numeric) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__min_$c"),
        (if (numeric) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n - __cnt_$c, __nd_$c, __min_$c, __max_$c"
    }.mkString(", ")
    row.select(
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_num, max_num)"),
      col("__n").as("n_rows"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"))
  }

  /** MERGEABLE partial profile — the shape a 100 TB profile actually runs
    * as: each slice (partition batch, ingest epoch, day of crawl) reduces
    * to ONE wide row of counts, numeric ranges and a DataSketches HLL
    * sketch per column; partials then combine losslessly downstream
    * ([[mergeProfiles]]): counts add, ranges min/max, HLL registers
    * max-merge. Because every component is associative and commutative,
    * the merged profile is IDENTICAL however the input was sliced — the
    * property the streaming twin's parity gate hash-checks. Columns whose
    * type DataSketches HLL cannot ingest directly (double, timestamp…)
    * sketch their canonical string form — an injective mapping, so
    * distinct counts are unchanged.
    */
  def partialProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      val numeric = schema(c).dataType.isInstanceOf[NumericType]
      val sketchable = schema(c).dataType.typeName match {
        case "integer" | "long" | "string" | "binary" => col(c)
        case _ => col(c).cast("string")
      }
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        hll_sketch_agg(sketchable).as(s"__hll_$c"),
        (if (numeric) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__min_$c"),
        (if (numeric) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__max_$c"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
  }

  /** Combine [[partialProfile]] rows into the final profile (long format,
    * same exact facts as [[tableProfile]]; `n_distinct_est` is the HLL
    * estimate). One aggregation over a |slices|-row relation — the merge
    * costs nothing at any corpus size.
    */
  def mergeProfiles(partials: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(s"__cnt_$c")).cast("long").as(s"__cnt_$c"),
        hll_union_agg(col(s"__hll_$c")).as(s"__hll_$c"),
        min(col(s"__min_$c")).as(s"__min_$c"),
        max(col(s"__max_$c")).as(s"__max_$c"))
    }
    val row = partials.agg(
      coalesce(sum(col("__n")), lit(0L)).cast("long").as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n - coalesce(__cnt_$c, 0), " +
        s"CASE WHEN __hll_$c IS NULL THEN 0 ELSE hll_sketch_estimate(__hll_$c) END, " +
        s"__min_$c, __max_$c"
    }.mkString(", ")
    row.select(
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct_est, min_num, max_num)"),
      col("__n").as("n_rows"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct_est"), col("min_num"), col("max_num"))
  }

  /** Clamp-binned value counts — the MERGEABLE half of [[psiDrift]]: one
    * row per occupied bin. Counts from disjoint slices merge by a plain
    * per-bin sum, so a monitoring stream can accumulate per-epoch bin
    * counts and finish with [[psiFromCounts]] at any time (the streaming
    * drift twin does exactly that).
    */
  private[graft] def binCounts(df: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int, as: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull)
      .withColumn("bin", least(greatest(
        floor((v - lit(lo)) / lit(hi - lo) * bins).cast("long"),
        lit(0L)), lit(bins - 1L)))
      .groupBy("bin").agg(count(lit(1)).as(as))
  }

  /** Finish a PSI comparison from two bin-count relations (`bin`,`n_ref`)
    * / (`bin`,`n_cur`) — see [[psiDrift]] for the semantics and the
    * output shape.
    */
  def psiFromCounts(r: DataFrame, c: DataFrame, bins: Int,
      eps: Double = 1e-6): DataFrame = {
    val spine = r.sparkSession.range(bins).select(col("id").as("bin"))
    // side totals as whole-relation window sums over the |bins|-row
    // spine: clamping guarantees every counted row lands in some bin, so
    // the bin sums ARE the totals — no 1-row cross join in the plan (the
    // window runs one task over `bins` rows)
    val whole = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val joined = spine
      .join(r, Seq("bin"), "left").join(c, Seq("bin"), "left")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("__tr", sum(col("n_ref")).over(whole))
      .withColumn("__tc", sum(col("n_cur")).over(whole))
    // empty sides: coalesce(n/nullif(total,0), 0) keeps ANSI division
    // happy and degrades the side to all-eps mass in both engines
    val p = greatest(coalesce(
      col("n_ref").cast("double") / nullif(col("__tr"), lit(0L)).cast("double"),
      lit(0.0)), lit(eps))
    val q = greatest(coalesce(
      col("n_cur").cast("double") / nullif(col("__tc"), lit(0L)).cast("double"),
      lit(0.0)), lit(eps))
    joined
      .withColumn("p_ref", round(p, 6))
      .withColumn("p_cur", round(q, 6))
      .withColumn("contrib", round((p - q) * log(p / q), 6))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("contrib"))
  }

  /** DISTRIBUTION DRIFT between a reference and a current slice of a
    * numeric column — the Population Stability Index, the check an ML
    * pipeline runs before retraining ("did the feature move?"). Values
    * bin into `bins` equal-width buckets over [lo, hi] (out-of-range
    * values clamp into the edge buckets, nulls drop — completeness is
    * [[NotNull]]'s job); each side's bucket mass becomes a fraction, and
    * each bucket contributes `(p_ref − p_cur) · ln(p_ref / p_cur)` with
    * zero masses clamped to `eps` (the standard PSI guard). The scalar
    * PSI is the sum of `contrib` (rule of thumb: < 0.1 stable, > 0.25
    * drifted); the per-bucket rows say WHERE the mass moved.
    *
    * Scale shape: one scan per side collapsing straight to a |bins|-row
    * hash agg (map-side partials — the shuffle carries bins, not rows),
    * then a spine join with side totals as whole-relation window sums
    * over the |bins|-row spine. Nothing data-sized leaves the aggs at
    * any corpus size.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int, eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    psiFromCounts(binCounts(ref, valueCol, lo, hi, bins, "n_ref"),
      binCounts(cur, valueCol, lo, hi, bins, "n_cur"), bins, eps)
  }

  /** PER-GROUP drift — [[psiDrift]] segmented by `groupCol` (source,
    * language, event type…): one PSI bucket table per group, so a shift
    * hidden inside one segment is not averaged away by the aggregate
    * distribution (Simpson's-paradox monitoring). The group×bin spine is
    * built by exploding the distinct-group relation (no cross join in the
    * plan); per-group totals are window sums partitioned by group. A
    * group present in only one side still appears — its other side is
    * all-eps mass, i.e. maximal drift, which is the correct alarm for an
    * appearing/vanishing segment.
    *
    * Scale: two scans collapsing to |groups|·|bins|-row aggs; everything
    * downstream is sized by segments × buckets, not rows.
    */
  def psiDriftByGroup(ref: DataFrame, cur: DataFrame, groupCol: String,
      valueCol: String, lo: Double, hi: Double, bins: Int,
      eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    def binned(df: DataFrame, as: String) = {
      val v = col(valueCol).cast("double")
      df.filter(v.isNotNull)
        .withColumn("bin", least(greatest(
          floor((v - lit(lo)) / lit(hi - lo) * bins).cast("long"),
          lit(0L)), lit(bins - 1L)))
        .groupBy(col(groupCol).as("grp"), col("bin"))
        .agg(count(lit(1)).as(as))
    }
    val spine = ref.select(col(groupCol).as("grp"))
      .unionByName(cur.select(col(groupCol).as("grp"))).distinct()
      .withColumn("bin", explode(sequence(lit(0L), lit(bins - 1L))))
    val byGrp = Window.partitionBy("grp")
    val joined = spine
      .join(binned(ref, "n_ref"), Seq("grp", "bin"), "left")
      .join(binned(cur, "n_cur"), Seq("grp", "bin"), "left")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("__tr", sum(col("n_ref")).over(byGrp))
      .withColumn("__tc", sum(col("n_cur")).over(byGrp))
    val p = greatest(coalesce(
      col("n_ref").cast("double") / nullif(col("__tr"), lit(0L)).cast("double"),
      lit(0.0)), lit(eps))
    val q = greatest(coalesce(
      col("n_cur").cast("double") / nullif(col("__tc"), lit(0L)).cast("double"),
      lit(0.0)), lit(eps))
    joined
      .withColumn("p_ref", round(p, 6))
      .withColumn("p_cur", round(q, 6))
      .withColumn("contrib", round((p - q) * log(p / q), 6))
      .select(col("grp").as(groupCol), col("bin"), col("n_ref"),
        col("n_cur"), col("p_ref"), col("p_cur"), col("contrib"))
  }

  /** CATEGORICAL drift — PSI over category frequencies (language mix,
    * source mix, label balance): the category itself is the bucket, so
    * there is no binning and no [lo, hi]. The category spine is the
    * union of values seen on either side — a category present in only
    * one side reads as drift against `eps` mass, the correct alarm for a
    * vanishing or newly-appearing class. Nulls drop (completeness is
    * [[NotNull]]'s job). Same output shape as [[psiDrift]] with the
    * category replacing `bin`.
    *
    * Scale: two scans collapsing to |categories|-row aggs; totals are
    * whole-relation window sums over that small spine.
    */
  def psiDriftCategorical(ref: DataFrame, cur: DataFrame,
      catCol: String, eps: Double = 1e-6): DataFrame = {
    def counted(df: DataFrame, as: String) =
      df.filter(col(catCol).isNotNull)
        .groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(as))
    val r = counted(ref, "n_ref")
    val c = counted(cur, "n_cur")
    val whole = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val joined = r.join(c, Seq("category"), "full_outer")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("__tr", sum(col("n_ref")).over(whole))
      .withColumn("__tc", sum(col("n_cur")).over(whole))
    val p = greatest(coalesce(
      col("n_ref").cast("double") / nullif(col("__tr"), lit(0L)).cast("double"),
      lit(0.0)), lit(eps))
    val q = greatest(coalesce(
      col("n_cur").cast("double") / nullif(col("__tc"), lit(0L)).cast("double"),
      lit(0.0)), lit(eps))
    joined
      .withColumn("p_ref", round(p, 6))
      .withColumn("p_cur", round(q, 6))
      .withColumn("contrib", round((p - q) * log(p / q), 6))
      .select(col("category"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("contrib"))
  }

  /** A declarative data-quality constraint over one column. Each carries
    * its violation COUNTER as an aggregate expression, so a whole suite
    * evaluates in the same single scan [[tableProfile]] uses. Null
    * handling is deliberate: only [[NotNull]] counts nulls — a null never
    * violates a range/set/uniqueness constraint (ANSI three-valued
    * comparisons make the `when` guard fall through to 0), so constraints
    * compose without double-counting the same defect.
    */
  sealed trait Constraint {
    def kind: String
    def column: String
    private[Profiling] def violations: Column
  }

  /** `column` must never be null. */
  final case class NotNull(column: String) extends Constraint {
    val kind = "not_null"
    private[Profiling] def violations = count(lit(1)) - count(col(column))
  }

  /** Every non-null value of `column` appears exactly once. Violations =
    * rows carrying a duplicated value beyond its first occurrence.
    */
  final case class Unique(column: String) extends Constraint {
    val kind = "unique"
    private[Profiling] def violations =
      count(col(column)) - count_distinct(col(column))
  }

  /** Non-null values of `column` stay within [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    val kind = "in_range"
    private[Profiling] def violations = coalesce(
      sum(when(col(column) < lo || col(column) > hi, 1L).otherwise(0L)),
      lit(0L))
  }

  /** Non-null values of `column` come from a fixed vocabulary. */
  final case class InSet(column: String, values: Seq[String])
      extends Constraint {
    val kind = "in_set"
    private[Profiling] def violations = coalesce(
      sum(when(col(column).isNotNull &&
        !col(column).isin(values.map(v => v: Any): _*), 1L).otherwise(0L)),
      lit(0L))
  }

  /** SUGGEST a constraint suite from an OBSERVED profile ([[tableProfile]]
    * output): `not_null` where the profiled slice had zero nulls, `unique`
    * where every non-null value was distinct, `in_range` over the observed
    * numeric [min, max]. This closes the validation loop — "learn the
    * contract on the reference slice, enforce it on the next batch" — the
    * suggested suite feeds [[checkConstraints]] directly. Emission order
    * is deterministic (col_name asc, then not_null/unique/in_range).
    *
    * The profile relation is |cols| rows BY CONSTRUCTION, so the collect
    * here is driver-sized at any corpus scale — this is a plan-building
    * step, not a data path.
    */
  def suggestConstraints(profile: DataFrame): Seq[Constraint] =
    profile.orderBy("col_name").collect().toSeq.flatMap { r =>
      val c = r.getString(r.fieldIndex("col_name"))
      val nNulls = r.getLong(r.fieldIndex("n_nulls"))
      val nonNull = r.getLong(r.fieldIndex("n_rows")) - nNulls
      val nd = r.getLong(r.fieldIndex("n_distinct"))
      val mn = Option(r.get(r.fieldIndex("min_num"))).map(_.asInstanceOf[Double])
      val mx = Option(r.get(r.fieldIndex("max_num"))).map(_.asInstanceOf[Double])
      Seq(
        if (nNulls == 0L) Some(NotNull(c)) else None,
        if (nonNull > 0L && nd == nonNull) Some(Unique(c)) else None,
        (mn, mx) match {
          case (Some(a), Some(b)) => Some(InRange(c, a, b))
          case _ => None
        }).flatten
    }

  /** Evaluate a constraint suite in ONE aggregation over ONE scan: each
    * constraint contributes a counting aggregate, the 1-row result
    * unpivots to `(kind, col_name, n_violations, passed)` — the
    * admission-gate verdict relation ("reject the drop if any row has
    * passed = false"). Adding constraints never adds passes over the
    * data; at 100 TB the suite costs exactly one table scan.
    */
  def checkConstraints(df: DataFrame, suite: Seq[Constraint]): DataFrame = {
    require(suite.nonEmpty, "check at least one constraint")
    val aggs = suite.zipWithIndex.map { case (c, i) =>
      c.violations.cast("long").as(s"__v_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = suite.zipWithIndex.map { case (c, i) =>
      s"'${c.kind}', '${c.column}', __v_$i"
    }.mkString(", ")
    row.select(expr(s"stack(${suite.size}, $stackArgs) AS " +
        "(kind, col_name, n_violations)"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** EXACT two-sample Kolmogorov–Smirnov drift: sup |F_ref − F_cur| over
    * the empirical CDFs of a numeric column — the binless complement to
    * [[psiDrift]] (PSI needs a bin grid and saturates on tail shifts; KS
    * is threshold-free and localizes WHERE the CDFs diverge most). Output
    * is one row: `(ks, at_value, n_ref, n_cur)` with `at_value` the
    * smallest value attaining the supremum.
    *
    * Scale shape: both sides collapse to per-distinct-value counts first
    * (one hash aggregation — heavy repeats partial-aggregate before the
    * shuffle), then the CDFs come from the SAME two-level prefix sum as
    * [[Packing.packSequences]]/[[Ranking.withGlobalRank]]: range-partition
    * the |distinct| counts by value, per-partition subtotals (|partitions|
    * rows) take the one serial running sum, broadcast back, in-partition
    * window completes the cumulative counts — a naive
    * `Window.orderBy(value)` would sort every distinct value through ONE
    * task, the classic scale-killer for continuous columns where
    * |distinct| ≈ |rows|. Cumulative counts are exact longs; the single
    * division per row happens after, so both engines compute bit-identical
    * doubles and the supremum's argmax is engine-stable (ties break to the
    * smallest value).
    */
  def ksDrift(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val spark = ref.sparkSession
    def side(df: DataFrame, r: Int, c: Int) =
      df.select(col(valueCol).cast("double").as("v"))
        .filter(col("v").isNotNull)
        .select(col("v"), lit(r.toLong).as("__r"), lit(c.toLong).as("__c"))
    val counts = side(ref, 1, 0).unionByName(side(cur, 0, 1))
      .groupBy("v").agg(sum("__r").as("nr"), sum("__c").as("nc"))
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // pin the partitioning: subtotals and the in-partition window must see
    // the same partition ids (same discipline as Ranking.withGlobalRank)
    val sorted = counts.repartitionByRange(p, col("v"))
      .sortWithinPartitions("v")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offs = sorted.groupBy("__pid")
      .agg(sum("nr").as("__pr"), sum("nc").as("__pc"))
      .withColumn("__or", coalesce(sum("__pr").over(wOff), lit(0L)))
      .withColumn("__oc", coalesce(sum("__pc").over(wOff), lit(0L)))
      .select(col("__pid"), col("__or"), col("__oc"))
    val wIn = Window.partitionBy("__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = counts.agg(sum("nr").as("n_ref"), sum("nc").as("n_cur"))
    sorted.join(broadcast(offs), "__pid")
      .select(col("v"),
        (col("__or") + sum("nr").over(wIn)).as("cr"),
        (col("__oc") + sum("nc").over(wIn)).as("cc"))
      .crossJoin(broadcast(tot))
      .withColumn("d", when(col("n_ref") > 0 && col("n_cur") > 0,
        abs(col("cr") / col("n_ref") - col("cc") / col("n_cur"))))
      .agg(max(col("d")).as("__ks"),
        max_by(col("v"), struct(col("d"), negate(col("v")))).as("__at"),
        min(col("n_ref")).as("n_ref"), min(col("n_cur")).as("n_cur"))
      .select(round(col("__ks"), 6).as("ks"),
        round(col("__at"), 6).as("at_value"),
        col("n_ref"), col("n_cur"))
  }

  /** Categorical association audit between two columns: the FULL
    * contingency grid (zero cells included — omitting them understates the
    * statistic) with expected counts under independence and per-cell
    * chi-square contributions. The per-cell relation is the useful
    * artifact (which (a, b) combinations are over/under-represented — the
    * "source × language mix shifted" question [[psiDriftCategorical]]
    * asks one-dimensionally); `Σ contrib` is the chi-square statistic with
    * `(|a|−1)(|b|−1)` degrees of freedom.
    *
    * Scale shape: one scan feeds three hash aggregations (cells, two
    * margins); the grid is a cross join of the two margin relations —
    * |categories|² rows by definition of "categorical", broadcast-sized —
    * and the observed cells left-join onto it. Nothing row-scale shuffles
    * twice, and no window anywhere.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .localCheckpoint() // three consumers, one scan
    val obs = base.groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ma = base.groupBy("a").agg(count(lit(1)).as("na"))
    val mb = base.groupBy("b").agg(count(lit(1)).as("nb"))
    val tot = base.agg(count(lit(1)).as("n"))
    ma.crossJoin(broadcast(mb))
      .join(obs, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("e", col("na").cast("double") * col("nb") / col("n"))
      .withColumn("contrib",
        (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
      .select(col("a"), col("b"), col("o"),
        round(col("e"), 6).as("e"), round(col("contrib"), 6).as("contrib"))
  }

  /** EMBEDDING-distribution drift between two corpus slices: the centroid
    * (per-dimension mean) of each slice, compared by cosine similarity,
    * L2 distance and worst single-dimension shift — the cheap first-line
    * detector for "did the embedding model or the upstream corpus change"
    * before any expensive ANN-index rebuild. Aggregation shape: posexplode
    * to (slice, dim, value) with map-side partial means — the only shuffle
    * carries 2·|dims| aggregate rows; the final comparison is a |dims|-row
    * join. Dimensions are 1-based to match SQL `generate_subscripts`.
    */
  def embeddingDrift(emb: DataFrame, sliceCol: Column,
      vecCol: String = "embedding"): DataFrame = {
    val x = emb.select(sliceCol.as("slice"),
        posexplode(col(vecCol)).as(Seq("dim0", "v")))
      .groupBy(col("slice"), (col("dim0") + 1).as("dim"))
      .agg(avg(col("v").cast("double")).as("m"))
    val a = x.filter(col("slice") === 0).select(col("dim"), col("m").as("ma"))
    val b = x.filter(col("slice") === 1).select(col("dim"), col("m").as("mb"))
    a.join(b, "dim")
      .agg(
        round(sum(col("ma") * col("mb")) /
          (sqrt(sum(col("ma") * col("ma"))) *
           sqrt(sum(col("mb") * col("mb")))), 6).as("cos_sim"),
        round(sqrt(sum((col("ma") - col("mb")) * (col("ma") - col("mb")))), 6)
          .as("l2_delta"),
        round(max(abs(col("ma") - col("mb"))), 6).as("max_abs_delta"),
        count(lit(1)).as("dims"))
  }

  /** Equi-depth QUANTILE BINNING — the feature-discretization prep stage:
    * cut a numeric column into `k` bins holding ≈ equal row counts, by the
    * exact (linear-interpolation) 1/k … (k−1)/k quantiles. NOT `ntile`:
    * ntile splits equal values across bins by physical row position, which
    * no second engine (or re-run under different partitioning) reproduces;
    * quantile-edge binning assigns every row by VALUE, so the cut is
    * deterministic, engine-portable, and stable under repartitioning —
    * equal values always share a bin (their bin can hold more than n/k
    * rows; that is the correct behavior for a value-based cut).
    *
    * Scale shape: one exact-percentile aggregation produces the (k−1)-edge
    * array (Spark's `percentile` runs as a single-pass partial aggregate);
    * the 1-row edge relation broadcasts and assignment is a row-local
    * array scan — the corpus never shuffles. Edges are rounded to 6 dp
    * before BOTH the comparison and the output so the bin boundary is
    * engine-exact (raw interpolated edges differ across engines in the
    * last ulp). Bin `b` spans (edge_{b−1}, edge_b]; bin 0 is everything up
    * to edge_0; nulls are excluded.
    */
  def equiDepthBins(df: DataFrame, idCol: String, valueCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 2, s"need >= 2 bins, got $k")
    val qs = (1 until k).map(_.toDouble / k)
    val edges = df.filter(col(valueCol).isNotNull)
      .agg(transform(
        percentile(col(valueCol), lit(qs.toArray)).as("e"),
        e => round(e, 6)).as("edges"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(edges))
      .select(col(idCol), col(valueCol).as("value"),
        size(filter(col("edges"), e => col(valueCol) > e))
          .cast("long").as("bin"))
  }

  /** Smoothed target (mean) encoding of a categorical column — the
    * feature-engineering step that replaces a high-cardinality category
    * with the shrunken mean of a numeric target:
    * `enc = (sum(y) + m·ȳ) / (n + m)` (additive smoothing toward the
    * global mean, weight `m` pseudo-observations).
    *
    * Scale: ONE hash aggregate over the fact (map-side partials) to the
    * |categories|-row relation, plus a 1-row global aggregate broadcast
    * back — the fact never shuffles twice and nothing sorts. The output
    * is dimension-sized, ready to broadcast-join back onto a 100 TB fact
    * as the encoded feature.
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      smoothing: Double = 10.0): DataFrame = {
    val perCat = df.filter(col(targetCol).isNotNull)
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(col(targetCol)).as("__sum"))
    val global = df.filter(col(targetCol).isNotNull)
      .agg(avg(col(targetCol)).as("__gmean"))
    perCat.crossJoin(broadcast(global))
      .select(col(catCol), col("n"),
        round((col("__sum") + lit(smoothing) * col("__gmean")) /
          (col("n") + lit(smoothing)), 6).as("encoded"))
  }

  /** Group-mean NULL IMPUTATION — the fill stage of a feature pipeline:
    * nulls take their group's mean over the observed values, falling back
    * to the global mean when an entire group is null, with a `was_null`
    * indicator column (the missingness signal models usually want kept).
    *
    * Scale: one hash aggregate to the |groups| means (map-side partials),
    * joined back on the group key (broadcast when dimension-sized) plus a
    * 1-row global mean — the fact is scanned once and never re-shuffled
    * beyond the one group join.
    */
  def imputeMean(df: DataFrame, groupCols: Seq[String], valueCol: String)
      : DataFrame = {
    require(groupCols.nonEmpty)
    val means = df.groupBy(groupCols.map(col): _*)
      .agg(avg(col(valueCol)).as("__gmean"))
    val global = df.agg(avg(col(valueCol)).as("__global"))
    df.join(means, groupCols)
      .crossJoin(broadcast(global))
      .withColumn("was_null", col(valueCol).isNull)
      .withColumn(valueCol,
        coalesce(col(valueCol), col("__gmean"), col("__global")))
      .drop("__gmean", "__global")
  }

  /** Referential-integrity audit: for each named relation
    * `(name, fact, factKey, dim, dimKey)`, count the fact rows whose key
    * has no match in the dimension (orphans) next to the total. The
    * lakehouse FK-constraint check — Spark enforces nothing at write
    * time, so integrity is an audit query.
    *
    * Scale: one LEFT join per relation (the dim side is keys-only and
    * deduplicated, so it broadcasts when dimension-sized) folded straight
    * into a single-row conditional aggregate — the fact is scanned once
    * per relation and never widened or re-shuffled. Null fact keys are
    * counted separately (a null FK is a different defect than a dangling
    * one).
    */
  def referentialAudit(
      relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty)
    relations.map { case (name, fact, factKey, dim, dimKey) =>
      val keys = dim.select(col(dimKey).as("__dk")).distinct()
      fact.select(col(factKey).as("__fk"))
        .join(broadcast(keys), col("__fk") === col("__dk"), "left")
        .agg(
          count(lit(1)).as("n_rows"),
          count(when(col("__fk").isNull, 1)).as("n_null_key"),
          count(when(col("__fk").isNotNull && col("__dk").isNull, 1))
            .as("n_orphan"))
        .select(lit(name).as("relation"), col("n_rows"),
          col("n_null_key"), col("n_orphan"))
    }.reduce(_.unionAll(_))
  }
}
