package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Pins the BPE trainer's two subtle contracts: the deterministic
  * (count desc, left, right) argmax order, and greedy left-to-right
  * NON-OVERLAPPING merge application within a word.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("train learns the classic low/lower merge sequence with tie-breaks") {
    // words: low×2, lower×1. Round 1: (l,o)=3 ties (o,w)=3 → 'l' < 'o'
    // wins. Round 2: (lo,w)=3. Round 3: (low,e)=1 ties (e,r)=1 → 'e' wins.
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val m = Bpe.train(docs, steps = 3, minCount = 1L)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1L, "l", "o", 3L), (2L, "lo", "w", 3L),
      (3L, "e", "r", 1L)), s"merges=${m.toSeq}")
  }

  test("merge application is greedy left-to-right, never overlapping") {
    // 'aaaa': pair (a,a) occurs at 3 adjacent positions but merges to
    // exactly [aa, aa]; round 2 then merges (aa,aa).
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = Bpe.train(docs, steps = 2, minCount = 1L)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1L, "a", "a", 6L), (2L, "aa", "aa", 2L)),
      s"merges=${m.toSeq}")
  }

  test("training stops when no pair reaches minCount") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text") // every pair count 1
    assert(Bpe.train(docs, steps = 4, minCount = 2L).count() == 0)
  }

  test("encode applies the learned merges and counts pieces") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val model = Bpe.train(docs, steps = 3, minCount = 1L)
    val pieces = Bpe.encode(docs, model).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // low → [low]×2; lower → [low, er]
    assert(pieces == Map("low" -> 3L, "er" -> 1L), s"pieces=$pieces")
  }
}
