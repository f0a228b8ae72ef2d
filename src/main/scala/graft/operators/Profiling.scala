package graft.operators

import org.apache.spark.sql.DataFrame
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
}
