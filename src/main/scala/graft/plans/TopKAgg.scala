package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Grouped top-k as a ONE-PASS bounded-heap aggregate.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY v
  * DESC)` then `rank <= k`) shuffles and sorts EVERY row of every group.
  * This aggregate keeps only the k best (value, id) pairs per group in a
  * bounded binary min-heap, so partial aggregation compacts each map task's
  * contribution to ≤ k rows before the exchange — at 100 TB the shuffle
  * carries `groups × k` entries instead of the whole fact table, and
  * nothing is globally sorted.
  *
  * Ordering: larger value wins; ties broken toward the smaller id
  * (deterministic, matching `ORDER BY v DESC, id ASC`). Output:
  * `array<struct<v, id>>` in rank order (best first).
  */
case class TopKAgg(value: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def inputTypes: Seq[GraftColumnBridge.ADT] = Seq(LongType, LongType)
  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) buf.offer(v.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKAgg.Heap, b2: TopKAgg.Heap): TopKAgg.Heap = {
    b2.foreach((v, i) => b1.offer(v, i))
    b1
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val sorted = buf.toSortedDesc
    new GenericArrayData(sorted.map { case (v, i) =>
      InternalRow(v, i): Any
    })
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach((v, i) => { bb.putLong(v); bb.putLong(i) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKAgg.Heap(k)
    var j = 0
    while (j < n) { h.offer(bb.getLong, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(value = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Bounded binary min-heap over (v, id): the ROOT is the WORST kept entry
    * (smallest v; among equal v, largest id), so a better candidate
    * replaces it in O(log k). Flat long arrays, no boxing. */
  final class Heap(k: Int) {
    private val vs = new Array[Long](k)
    private val ids = new Array[Long](k)
    var size: Int = 0

    // entry a is worse than entry b (kept-set ordering: v DESC, id ASC)
    private def worse(va: Long, ia: Long, vb: Long, ib: Long): Boolean =
      va < vb || (va == vb && ia > ib)

    def offer(v: Long, id: Long): Unit = {
      if (size < k) {
        vs(size) = v; ids(size) = id; size += 1
        // heap property: parent is WORSE than its children (root = worst
        // kept entry) — bubble the new entry up while it is worse than its
        // parent
        var c = size - 1
        while (c > 0 && worse(vs(c), ids(c), vs((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(vs(0), ids(0), v, id)) {
        vs(0) = v; ids(0) = id
        siftDown()
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val tv = vs(a); vs(a) = vs(b); vs(b) = tv
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(): Unit = {
      var p = 0
      var done = false
      while (!done) {
        val l = 2 * p + 1; val r = l + 1
        var worst = p
        if (l < size && worse(vs(l), ids(l), vs(worst), ids(worst))) worst = l
        if (r < size && worse(vs(r), ids(r), vs(worst), ids(worst))) worst = r
        if (worst == p) done = true
        else { swap(p, worst); p = worst }
      }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var j = 0
      while (j < size) { f(vs(j), ids(j)); j += 1 }
    }

    /** Kept entries, best first (v DESC, id ASC). */
    def toSortedDesc: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](size)
      var j = 0
      while (j < size) { out(j) = (vs(j), ids(j)); j += 1 }
      out.sortBy { case (v, i) => (-v, i) }
    }
  }

  /** Column form: `array<struct<v,id>>` of the k best rows per group. */
  def topK(value: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(GraftColumnBridge.expression(value),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
