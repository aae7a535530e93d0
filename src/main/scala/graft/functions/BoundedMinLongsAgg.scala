package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Max-heap of at most `k` values keeping the k SMALLEST longs seen
  * (multiset — duplicates preserved, matching `row_number`-cap
  * semantics). O(k) memory regardless of input size; insert O(log k). */
final class BoundedMinHeap(val k: Int) {
  // heap(0) is the LARGEST of the kept values — the eviction candidate
  private[graft] var heap = new Array[Long](math.min(k, 16))
  private[graft] var size = 0

  def insert(v: Long): Unit = {
    if (size < k) {
      if (size == heap.length)
        heap = java.util.Arrays.copyOf(heap, math.min(k, heap.length * 2))
      heap(size) = v
      var i = size
      size += 1
      while (i > 0 && heap((i - 1) / 2) < heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (v < heap(0)) {
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && heap(l) > heap(m)) m = l
        if (r < size && heap(r) > heap(m)) m = r
        if (m == i) done = true
        else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
      }
    }
  }

  /** Kept values in ascending order. */
  def sorted: Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, size)
    java.util.Arrays.sort(out)
    out
  }
}

/** Aggregate keeping the `k` smallest values of a long column per group —
  * the skew-proof replacement for the `row_number`-window bucket cap in
  * LSH candidate generation (ops/Dedup.scala).
  *
  * Why not the window: `Window.partitionBy(bucket).orderBy(id)` bounds
  * aggregation MEMORY but not shuffle SKEW — a degenerate bucket (10^8
  * copies of a boilerplate page at web scale) still ships every member
  * row to one reducer before `row_number` can drop any, and WindowExec
  * is outside whole-stage codegen. This aggregate is partial-aggregable:
  * map-side combine caps each partition's contribution to a bucket at
  * `k` rows, so the shuffle carries at most partitions×k rows for even
  * the most degenerate bucket, and the hot reducer disappears. Buffer
  * memory is O(k) per in-flight group by construction.
  *
  * Result is the ascending-sorted array of kept values — bit-identical
  * to `sort_array(collect_list(id))` capped to the k smallest (the
  * window form's output), duplicates preserved. */
case class BoundedMinLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedMinHeap] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bounded_min_longs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): BoundedMinHeap = new BoundedMinHeap(k)

  override def update(b: BoundedMinHeap, input: InternalRow): BoundedMinHeap = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BoundedMinHeap, o: BoundedMinHeap): BoundedMinHeap = {
    var i = 0
    while (i < o.size) { b.insert(o.heap(i)); i += 1 }
    b
  }

  override def eval(b: BoundedMinHeap): Any =
    UnsafeArrayData.fromPrimitiveArray(b.sorted)

  override def serialize(b: BoundedMinHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new BoundedMinHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedMinLongs =
    copy(child = newChildren.head)
}
