package graft

import org.apache.spark.sql.functions._

import graft.operators.{Caches, Correlations, Dedup}

/** The cache owner registry: operator pins are tracked per session,
  * release() drops exactly the graft-owned relations and leaves caller
  * caches alone.
  */
class CachesSpec extends SparkSpec {

  import spark.implicits._

  private def ticks = fixtures.SampleData.dataset(spark).toDF()

  test("operator pins register with Caches and release() unpersists them") {
    Caches.release(spark, blocking = true) // isolate from other suites
    // Suites before this one may leave RETURNED localCheckpoint relations
    // pinned (released only by the ContextCleaner on GC) — assert relative
    // to that baseline, not an absolutely-empty store.
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val returns = Correlations.logReturns(
      operators.Candles.aggregate(ticks, "120 seconds",
        Some(fixtures.SampleData.Keys)))
    val corr = Correlations.correlate(returns, minCorr = 0.0)
    corr.write.format("noop").mode("overwrite").save()
    assert(Caches.pinnedCount(spark) > 0, "correlate should pin its packets")

    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely different text about spark aggregation plans"))
      .toDF("doc_id", "text")
    Dedup.ngramJaccard(docs, minJaccard = 0.5)
      .write.format("noop").mode("overwrite").save()
    assert(Caches.pinnedCount(spark) > 1, "ngramJaccard should pin too")

    Caches.release(spark, blocking = true)
    assert(Caches.pinnedCount(spark) == 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(leaked.isEmpty,
      s"release must leave no pinned RDDs behind beyond the baseline: $leaked")
  }

  test("release leaves caller-owned caches untouched") {
    val mine = spark.range(100).toDF("n").cache()
    mine.count() // materialize the cache
    Caches.release(spark, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "caller cache must survive a graft release")
    mine.unpersist(blocking = true)
  }
}
