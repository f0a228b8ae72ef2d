package graft.fixtures

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Tick

/** Deterministic port of the reference's 42-tick FX fixture
  * (`GenerateSampleData.java:81-159`): 5 series over 10 minutes, 1 tick/min.
  *
  *  - TS-1, TS-2: values 1,2,3,4,5,5,4,3,2,1 (full 10 ticks each)
  *  - TS-3, TS-4: values 10,9,8,7,6,6,7,8,9,10 with minutes 2,3,7,8 removed
  *    (the `remove(2) remove(2) remove(5) remove(5)` dance,
  *    `GenerateSampleData.java:101-118`) → present at minutes 0,1,4,5,6,9
  *    with values 10,9,6,6,7,10
  *  - TS-5: random control series — reference uses `Math.random()`
  *    (`GenerateSampleData.java:127`); we pin a seed for determinism.
  *
  * Base epoch is frozen at 1451577600000 ms, the instant the reference's
  * default-TZ parse of "01/01/2016 00:00:00" produced when its goldens were
  * recorded (FIXTURES.md §1-2); golden timestamps derive from it.
  */
object SampleData {

  val BaseMillis: Long = 1451577600000L
  val MinuteMillis: Long = 60000L

  val Keys: Seq[String] = Seq("TS-1", "TS-2", "TS-3", "TS-4", "TS-5")

  /** Values emitted by `generateSequentialList(start, change)`:
    * 5 steps of `+change` then 5 of `-change` (peak repeated).
    */
  private def sequential(start: Double, change: Double): Seq[Double] = {
    val up = (0 until 5).map(i => start + i * change)
    val down = (0 until 5).map(i => up.last - i * change)
    up ++ down
  }

  private def series(key: String, minuteValues: Seq[(Int, Double)]): Seq[Tick] =
    minuteValues.map { case (m, v) =>
      Tick(key, new Timestamp(BaseMillis + m * MinuteMillis), Some(v), Some(v), isLive = true)
    }

  /** The 42 ticks. */
  def ticks: Seq[Tick] = {
    val full = sequential(1d, 1d).zipWithIndex.map { case (v, m) => (m, v) }
    val gappyMinutes = Seq(0, 1, 4, 5, 6, 9)
    val gappy = {
      val vals = sequential(10d, -1d)
      gappyMinutes.map(m => (m, vals(m)))
    }
    val rnd = new scala.util.Random(42)
    val ts5 = (0 until 10).map { m =>
      Tick("TS-5", new Timestamp(BaseMillis + m * MinuteMillis),
        Some(rnd.nextDouble()), Some(rnd.nextDouble()), isLive = true)
    }
    series("TS-1", full) ++ series("TS-2", full) ++
      series("TS-3", gappy) ++ series("TS-4", gappy) ++ ts5
  }

  def dataset(spark: SparkSession): Dataset[Tick] = {
    import spark.implicits._
    spark.createDataset(ticks)
  }
}
