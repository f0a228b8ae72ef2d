package graft

import org.apache.spark.sql.Row

import graft.operators.Skew

/** saltedJoin must be observationally identical to the plain join. */
class SkewSpec extends SparkSpec {

  test("salted inner/left joins match plain joins on hot-key data") {
    import spark.implicits._
    // one hot key carrying 90% of rows + keys with no match on either side
    val left = ((1 to 900).map(i => ("hot", i)) ++
      (1 to 50).map(i => (s"k$i", i)) :+ (("lonely", 0))).toDF("key", "lv")
    val right = (Seq(("hot", 1.0), ("hot", 2.0)) ++
      (1 to 30).map(i => (s"k$i", i * 1.5)) :+ (("unseen", 9.9))).toDF("key", "rv")

    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
      df.select("key", "lv", "rv").collect().toSeq
        .sortBy(r => (r.getString(0), r.getInt(1), Option(r.get(2)).fold(0.0)(_.asInstanceOf[Double])))

    for (jt <- Seq("inner", "left_outer")) {
      val plain = sortedRows(left.join(right, Seq("key"), jt))
      val salted = sortedRows(Skew.saltedJoin(left, right, Seq("key"), 8, jt))
      assert(salted == plain, s"$jt mismatch")
    }

    val semiPlain = left.join(right, Seq("key"), "left_semi").count()
    val semiSalt = Skew.saltedJoin(left, right, Seq("key"), 8, "left_semi").count()
    assert(semiSalt == semiPlain)

    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, Seq("key"), 8, "full_outer")
    }
  }

  test("shuffle_hash-hinted salted join shuffles on (key, salt), not key alone") {
    import spark.implicits._
    val left = (1 to 500).map(i => ("hot", i)).toDF("key", "lv")
    val right = Seq(("hot", 1.0)).toDF("key", "rv")
    val plan = Skew.saltedJoin(left, right.hint("shuffle_hash"), Seq("key"), 8)
      .queryExecution.executedPlan.toString
    // the hint defeats the broadcast that would skip the left shuffle, and
    // the exchange keys must include the salt — that IS the skew spreading
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$plan")
    assert(plan.contains("__graft_salt"), s"expected salt in the plan:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"broadcast defeats salting:\n$plan")
  }

  test("salt is content-free: unhashable map columns and pure duplicates work") {
    import spark.implicits._
    // 400 fully identical rows of one hot key (a row-content hash would give
    // them all the same salt), plus a map-typed column (unhashable)
    val left = (1 to 400).map(_ => ("hot", Map("a" -> 1))).toDF("key", "props")
    val right = Seq(("hot", 1.0)).toDF("key", "rv")
    val out = Skew.saltedJoin(left, right, Seq("key"), 8)
    assert(out.count() == 400)
    // the identical duplicates actually spread over several salt values
    val salts = left.withColumn("s", Skew.salt(8)).select("s").distinct().count()
    assert(salts > 1, s"expected duplicates spread over salts, got $salts")
  }
}
