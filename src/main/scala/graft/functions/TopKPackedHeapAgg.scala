package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Large-k form of `top_k_packed` — a bounded sorted-array aggregate as a
  * [[TypedImperativeAggregate]] (ObjectHashAggregate), used by the routed
  * builder ([[TopKPackedAgg.expr]]) above [[TopKPackedAgg.declarativeMaxK]].
  *
  * Same contract and result shape as the declarative [[TopKPackedAgg]]:
  * keep the k LARGEST non-negative packed keys (with payload) per group,
  * result `array<struct<pk,pl>>` descending, -1 keys padding short groups;
  * null key/payload rows are skipped, a negative key fails loudly.
  *
  * Why a second form exists: the declarative insert-sort composes k merge
  * layers whose expression trees multiply references to the previous
  * layer — node count grows ~4.4^k, so k beyond ~8 is a planner DoS (the
  * measured wall is minutes/OOM at k=12). Here update/merge are plain
  * imperative O(log k + shift) / O(k) over a primitive long array, so plan
  * size is CONSTANT in k and only the buffer (2k longs) scales. The price:
  * ObjectHashAggregate instead of whole-stage-codegen HashAggregate, and a
  * serialize step at the partial exchange — still map-side partials, still
  * an O(groups × k) shuffle, just not codegen'd. For the small k the gates
  * run (≤ [[TopKPackedAgg.declarativeMaxK]]), the declarative form stays
  * the default: measured ~1.3× faster end-to-end on the fx_corr_topk
  * shape (primitive buffer, no serialization, fused into the codegen
  * pipeline).
  *
  * Buffer layout: `Array[Long]` of 1+2k — [0]=filled count n, [1..k]=keys
  * descending, [k+1..2k]=payloads aligned to keys. Serialization writes
  * only the n filled slots, so short groups ship small.
  */
case class TopKPackedHeapAgg(key: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

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

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1 + 2 * k)

  /** First index in keys[1..n] (descending) whose key is < v — i.e. insert
    * AFTER equal keys, matching the declarative form's strict-greater
    * insert. Returns a 1-based buffer index in [1, n+1].
    */
  private def insertPos(buf: Array[Long], n: Int, v: Long): Int = {
    var lo = 1; var hi = n + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) >= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv == null || pv == null) return buf
    val v = kv.asInstanceOf[Long]
    if (v < 0L) throw new IllegalArgumentException(
      "top_k_packed: key must be non-negative (-1 is the empty-slot " +
        "sentinel); pack signed values into a non-negative order first")
    val n = buf(0).toInt
    if (n == k && v <= buf(k)) return buf // below the kept floor: O(1) skip
    val pos = insertPos(buf, n, v)
    val last = if (n == k) k - 1 else n // slots shifting down (drop overflow)
    if (last >= pos) {
      System.arraycopy(buf, pos, buf, pos + 1, last - pos + 1)
      System.arraycopy(buf, k + pos, buf, k + pos + 1, last - pos + 1)
    }
    buf(pos) = v
    buf(k + pos) = pv.asInstanceOf[Long]
    if (n < k) buf(0) = n + 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val na = a(0).toInt; val nb = b(0).toInt
    if (nb == 0) return a
    val out = new Array[Long](1 + 2 * k)
    var i = 1; var j = 1; var o = 1
    // two-pointer merge of the descending runs; ties keep the left
    // (existing) buffer's slot first, like the declarative strict-greater
    // insert
    while (o <= k && (i <= na || j <= nb)) {
      val takeA = j > nb || (i <= na && a(i) >= b(j))
      if (takeA) { out(o) = a(i); out(k + o) = a(k + i); i += 1 }
      else { out(o) = b(j); out(k + o) = b(k + j); j += 1 }
      o += 1
    }
    out(0) = o - 1
    out
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(0).toInt
    val rows = new Array[Any](k)
    var i = 0
    while (i < k) {
      rows(i) = new GenericInternalRow(Array[Any](
        if (i < n) buf(1 + i) else -1L,
        if (i < n) buf(1 + k + i) else 0L))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val n = buf(0).toInt
    val bb = ByteBuffer.allocate(8 * (1 + 2 * n))
    bb.putLong(n.toLong)
    var i = 1
    while (i <= n) { bb.putLong(buf(i)); i += 1 }
    i = 1
    while (i <= n) { bb.putLong(buf(k + i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong().toInt
    val buf = new Array[Long](1 + 2 * k)
    buf(0) = n.toLong
    var i = 1
    while (i <= n) { buf(i) = bb.getLong(); i += 1 }
    i = 1
    while (i <= n) { buf(k + i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPackedHeapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPackedHeapAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "top_k_packed"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), payload = newChildren(1))
}
