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
}
