package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last deterministic stage between a curated
  * document set ([[Curation.curate]]) and a training run: concatenate
  * documents in stable `doc_id` order and chop the token stream into
  * fixed-`budget` training sequences, emitting where each document lands.
  *
  * Semantics are the standard causal-LM "concat and chop": the token
  * stream never pads and never reorders, so a document may STRADDLE a
  * sequence boundary (`spans` > 1) and an oversized document
  * (`n_tokens` > budget) simply spans ⌈n/budget⌉-ish sequences. This is
  * the packing GPT-style pipelines ship (padding-free, deterministic,
  * restart-stable); bin-packing variants that reorder documents trade
  * determinism for padding and are deliberately not the default.
  *
  * Output per document: `tok_start` (exclusive prefix sum of tokens),
  * `seq_id` = tok_start div budget, `seq_offset` = tok_start mod budget,
  * `spans` = number of sequences the document touches (a zero-token
  * document counts as touching its start slot). All integer arithmetic —
  * bit-stable across engines.
  *
  * Scale design: a naive `Window.orderBy(doc_id)` running sum is a
  * single-partition sequential bottleneck — the classic accidental
  * scale-killer. This runs the textbook two-level distributed prefix sum
  * instead: contiguous `doc_id` ranges (`bucketWidth` wide) are summed
  * with one hash aggregation (map-side partial), the per-bucket bases are
  * a |buckets|-row running sum (tiny — the only serial step, over
  * thousands of rows at 100 TB), broadcast back, and the within-bucket
  * prefix sum is a partitioned window — fully parallel, one shuffle. A
  * production deployment sizes `bucketWidth` from table stats so buckets
  * are a few hundred MB; contiguity of the ranges is what makes bucket
  * bases well-defined.
  */
object Packing {

  /** Pack `docs` into `budget`-token sequences (see object doc for
    * semantics and the two-level prefix-sum design).
    *
    * DENSE-ID ASSUMPTION: `bucketWidth` buckets by `doc_id` VALUE range
    * (`doc_id div bucketWidth`), so it presumes ids are reasonably dense —
    * ~bucketWidth docs actually land in each bucket. A sparse/hashed id
    * space (e.g. 60-bit random ids) puts ~1 doc per bucket: the bases
    * relation becomes corpus-sized and its broadcast + single-partition
    * running sum reintroduce exactly the bottleneck this operator exists
    * to avoid. For such id spaces pass `bucketWidth = 0` to derive the
    * width from the OBSERVED id range (one cheap min/max/count aggregate;
    * targets ~`denseTarget` docs per bucket), or densify ids upstream.
    */
  def packSequences(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", tokCol: String = "n_tokens",
      bucketWidth: Long = 8192, denseTarget: Long = 8192): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(bucketWidth >= 0, s"bucketWidth must be >= 0 (0 = auto), got $bucketWidth")
    val d0 = docs.select(col(idCol).cast("long").as("doc_id"),
      col(tokCol).cast("long").as("n_tokens"))
    // auto width: size buckets off the OBSERVED id range so sparse/hashed
    // id spaces still get ~denseTarget docs per bucket (|buckets| ≈
    // |docs|/denseTarget regardless of id density). One scalar aggregate.
    val width =
      if (bucketWidth > 0) bucketWidth
      else {
        val r = d0.agg(min("doc_id"), max("doc_id"), count(lit(1))).head
        if (r.isNullAt(0) || r.getLong(2) == 0L) 1L
        else math.max(1L,
          (r.getLong(1) - r.getLong(0) + 1L) / math.max(1L, r.getLong(2) / denseTarget + 1L))
      }
    packFrom(d0, budget, width, baseTokens = 0L, minIdExclusive = None)
  }

  /** Carried packing state: tokens packed so far and the largest packed id
    * — everything an incremental epoch needs (two scalars; the manifest
    * history itself is never re-read).
    */
  case class PackState(totalTokens: Long, maxId: Long)

  /** Recover [[PackState]] from an existing manifest (one scalar aggregate).
    * An empty manifest yields the initial state.
    */
  def packState(manifest: DataFrame): PackState = {
    val r = manifest.agg(sum("n_tokens"), max("doc_id")).head
    if (r.isNullAt(1)) PackState(0L, Long.MinValue)
    else PackState(r.getLong(0), r.getLong(1))
  }

  /** INCREMENTAL packing: extend a manifest with a new document batch
    * without repacking history. Because the token stream is doc_id-ordered
    * and append-only, the entire history collapses into [[PackState]]'s two
    * scalars: the new batch's prefix sums start at `state.totalTokens`, so
    * `packSequences(A) ++ packIncrement(B, state(A))` ≡ `packSequences(A∪B)`
    * exactly (pinned by EdgeCaseSpec) — the restart-stability the object
    * doc promises, made operational for a growing corpus.
    *
    * PRECONDITION (enforced in-plan, no extra job): every new id must
    * exceed `state.maxId` — an id at or below it would belong INSIDE the
    * already-packed prefix, which append-only packing cannot express. The
    * check rides the tok_start expression (ANSI `assert_true`), so a
    * violating row fails the job rather than silently corrupting offsets.
    */
  def packIncrement(newDocs: DataFrame, budget: Long, state: PackState,
      idCol: String = "doc_id", tokCol: String = "n_tokens",
      bucketWidth: Long = 8192): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val d0 = newDocs.select(col(idCol).cast("long").as("doc_id"),
      col(tokCol).cast("long").as("n_tokens"))
    packFrom(d0, budget, bucketWidth, state.totalTokens, Some(state.maxId))
  }

  /** The shared two-level prefix-sum core (see object doc): bucket totals →
    * tiny serial running sum over bucket bases → broadcast back → parallel
    * within-bucket window. `baseTokens` shifts the whole stream (the
    * incremental path's carried offset); `minIdExclusive` is the in-plan
    * append-only guard.
    */
  private def packFrom(d0: DataFrame, budget: Long, width: Long,
      baseTokens: Long, minIdExclusive: Option[Long]): DataFrame = {
    val d = d0.withColumn("__bkt", expr(s"doc_id div $width"))
    // per-bucket token totals: |buckets| rows, then the one serial step —
    // a running sum over that tiny relation — broadcast back
    val bases = d.groupBy("__bkt").agg(sum("n_tokens").as("__btot"))
      .withColumn("__base",
        coalesce(sum("__btot").over(Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__base"))
    val inBucket = Window.partitionBy("__bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the append-only guard folds into tok_start (assert_true → null → +0)
    // so it cannot be pruned away and costs no separate pass
    val guard = minIdExclusive match {
      case Some(m) => coalesce(assert_true(col("doc_id") > lit(m),
        concat(lit(s"packIncrement: doc_id "), col("doc_id").cast("string"),
          lit(s" <= packed maxId $m — append-only packing violated")))
        .cast("long"), lit(0L))
      case None => lit(0L)
    }
    d.join(broadcast(bases), "__bkt")
      .withColumn("tok_start",
        lit(baseTokens) + col("__base")
          + coalesce(sum("n_tokens").over(inBucket), lit(0L)) + guard)
      .withColumn("seq_id", expr(s"tok_start div $budget"))
      .withColumn("seq_offset", col("tok_start") % budget)
      .withColumn("spans",
        expr(s"(tok_start + greatest(n_tokens, 1L) - 1L) div $budget")
          - col("seq_id") + 1L)
      .select(col("doc_id"), col("n_tokens"), col("tok_start"),
        col("seq_id"), col("seq_offset"), col("spans"))
  }
}
