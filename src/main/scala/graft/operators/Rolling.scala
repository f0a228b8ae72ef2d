package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window (rolling) statistics over an ordered per-key series — the
  * moving-average / rolling-volatility layer a timeseries engine exposes on
  * top of candles (the reference stops at per-window OHLC; rolling indicators
  * are the natural next derivation and a standard feature-engineering step).
  *
  * One window sort per key — a single shuffle on `keyCol`, then a sequential
  * frame scan inside each partition (whole-stage codegen window exec). At
  * 100 TB the cost is the sort within each key partition; there is no
  * cross-key state, so keys parallelize freely.
  */
object Rolling {

  /** Rolling count/avg/min/max/sample-stddev of `valueCol` over the trailing
    * `n` rows (current row inclusive) per `keyCol`, ordered by `orderCol`.
    * `roll_std` is null while the frame holds a single row (sample stddev
    * needs two points) — same convention in Spark and DuckDB.
    */
  def stats(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column, n: Int): DataFrame = {
    require(n >= 1, s"rolling frame must be >= 1 row, got $n")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(n - 1L), Window.currentRow)
    df.select(
      col(keyCol), col(orderCol),
      count(valueCol).over(w).as("roll_n"),
      avg(valueCol).over(w).as("roll_avg"),
      min(valueCol).over(w).as("roll_min"),
      max(valueCol).over(w).as("roll_max"),
      stddev_samp(valueCol).over(w).as("roll_std"))
  }

  /** Drawdown: each value relative to the running maximum so far per key —
    * `value / max_so_far - 1`, ≤ 0 by construction, the standard peak-to-
    * trough risk series. One growing-frame running max (incremental O(n)).
    * Null values pass through as null drawdowns without disturbing the
    * running max.
    */
  def drawdown(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = max(valueCol).over(w)
    df.select(col(keyCol), col(orderCol),
      when(valueCol.isNotNull && peak =!= 0.0, valueCol / peak - 1.0)
        .as("drawdown"))
  }

  /** Exponentially-weighted moving average over the trailing `n` rows per
    * key: weight `alpha^age` (age 0 = current row), normalized by the
    * closed-form weight sum — the adjusted EWMA every stats library
    * computes for a finite history. The frame's values are gathered with a
    * windowed `collect_list` (frame order, deterministic) and folded with
    * codegen'd array expressions; same single-shuffle shape as [[stats]].
    *
    * NULL CONTRACT: `collect_list` SKIPS null values, so a null inside the
    * frame silently compacts the history (ages shift) — filter or coalesce
    * nulls upstream if that matters. A frame of only nulls yields a null
    * ewma (guarded — not a division by zero).
    */
  def ewma(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: Column, n: Int, alpha: Double): DataFrame = {
    require(n >= 1, s"ewma frame must be >= 1 row, got $n")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(n - 1L), Window.currentRow)
    val xs = collect_list(valueCol).over(w) // oldest → newest in frame order
    val len = size(xs)
    // sum_i x_i * alpha^(len-1-i), i 1-based via sequence(1, len)
    val num = aggregate(
      zip_with(xs, sequence(lit(1), len),
        (x, i) => x * pow(lit(alpha), (len - i).cast("double"))),
      lit(0.0), (s, x) => s + x)
    val den = (lit(1.0) - pow(lit(alpha), len.cast("double"))) / (1.0 - alpha)
    df.select(col(keyCol), col(orderCol),
      when(len > 0, num / den).as("ewma"))
  }
}
