package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, CreateArray, CreateNamedStruct, Expression, GreaterThan, If, IsNull, LessThan, Literal, Or, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded top-k aggregate over a packed sort key — the no-sort per-group
  * top-k for pair-volume inputs.
  *
  * `top_k_packed(key, payload, k)` keeps, per group, the k LARGEST
  * non-negative `key` longs (with their payload long), as k fixed slot
  * pairs in the aggregation buffer. The buffer is all-primitive
  * (2k longs), so the aggregate plans as whole-stage-codegen
  * HashAggregate with MAP-SIDE PARTIALS: each task reduces its share of
  * the input to k slots per group before the exchange, and the shuffle
  * carries O(groups × k) regardless of input volume. This is the shape a
  * rank-then-filter cannot reach — `row_number() <= k` prunes map-side
  * too (WindowGroupLimit), but only after a full LOCAL SORT of the input;
  * at a few billion pair rows the sort IS the query (measured 2× the
  * whole correlation kernel at the g1 tier).
  *
  * Contract: `key` must be non-negative (the empty-slot sentinel is -1);
  * callers pack (value, tiebreak) so that ONE long comparison is the
  * total order — see [[graft.operators.Correlations.topPartnersPacked]].
  * Null key/payload rows are skipped. Result: `array<struct<pk,pl>>` of
  * length k, descending, with -1 keys padding short groups.
  *
  * Everything (update, merge, eval) is composed Catalyst expressions —
  * insertion into the descending slot list is a nested-CASE insert-sort,
  * O(k) comparisons per row — so there is no interpreted per-row path at
  * all, unlike a TypedImperativeAggregate heap (ObjectHashAggregate).
  */
case class TopKPackedAgg(key: Expression, payload: Expression, k: Int)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pk", LongType, nullable = false),
    StructField("pl", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && payload.dataType == LongType &&
        k >= 1 && k <= TopKPackedAgg.maxK)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_packed requires (bigint, bigint) and 1 <= k <= " +
        s"${TopKPackedAgg.maxK}; got " +
        s"(${key.dataType.catalogString}, ${payload.dataType.catalogString}), k=$k")

  private lazy val slotK: Seq[AttributeReference] =
    (1 to k).map(i => AttributeReference(s"tk$i", LongType, nullable = false)())
  private lazy val slotP: Seq[AttributeReference] =
    (1 to k).map(i => AttributeReference(s"tp$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    slotK ++ slotP

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(-1L)) ++ Seq.fill(k)(Literal(0L))

  /** Insert (v, p) into the descending slot lists: position j is the first
    * slot with v > k_j; slots above j keep, slot j takes (v, p), slots
    * below shift down by one. Expressed per-slot so the whole insert is a
    * flat projection.
    */
  private def insert(ks: Seq[Expression], ps: Seq[Expression],
      v: Expression, p: Expression): (Seq[Expression], Seq[Expression]) = {
    val nk = ks.indices.map { i =>
      if (i == 0) If(GreaterThan(v, ks(0)), v, ks(0))
      else If(GreaterThan(v, ks(i)),
        If(GreaterThan(v, ks(i - 1)), ks(i - 1), v), ks(i))
    }
    val np = ps.indices.map { i =>
      if (i == 0) If(GreaterThan(v, ks(0)), p, ps(0))
      else If(GreaterThan(v, ks(i)),
        If(GreaterThan(v, ks(i - 1)), ps(i - 1), p), ps(i))
    }
    (nk, np)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // a negative key would be indistinguishable from the -1 empty-slot
    // sentinel (and silently lose to it) — fail loudly instead of
    // dropping rows; callers pack signed values into the non-negative
    // order-preserving form first (see topPartnersPacked)
    val guardedKey: Expression = If(LessThan(key, Literal(0L)),
      Cast(RaiseError(Literal(
        "top_k_packed: key must be non-negative (-1 is the empty-slot " +
          "sentinel); pack signed values into a non-negative order first")),
        LongType),
      key)
    val (nk, np) = insert(slotK, slotP, guardedKey, payload)
    // null inputs keep the buffer unchanged
    val skip = Or(IsNull(key), IsNull(payload))
    (slotK ++ slotP).zip(nk ++ np).map { case (old, nw) => If(skip, old, nw) }
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // insert the right buffer's k slots into the left, best-first; the -1
    // sentinels of short right buffers never displace a real slot
    var ks: Seq[Expression] = slotK.map(_.left)
    var ps: Seq[Expression] = slotP.map(_.left)
    (0 until k).foreach { i =>
      val (nk, np) = insert(ks, ps, slotK(i).right, slotP(i).right)
      ks = nk; ps = np
    }
    ks ++ ps
  }

  override lazy val evaluateExpression: Expression =
    CreateArray((0 until k).map(i => CreateNamedStruct(Seq(
      Literal("pk"), slotK(i), Literal("pl"), slotP(i)))))

  override def prettyName: String = "top_k_packed"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), payload = newChildren(1))
}

object TopKPackedAgg {

  /** Upper bound on k: the insert-sort update/merge trees hold O(k²)
    * expression nodes, so an unbounded k is a planner DoS, and a top-k
    * beyond this size wants a sort anyway.
    */
  val maxK: Int = 256

  def apply(key: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(TopKPackedAgg(ColumnBridge.expression(key),
      ColumnBridge.expression(payload), k).toAggregateExpression())
}
