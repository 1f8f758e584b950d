package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary over a string column: at most `k`
  * (term, counter) pairs, one pass, O(k) memory.
  *
  * The candidate-set sibling of the Count-Min path (`plans.CmsAgg`): CMS
  * answers "how often is THIS term?" (you must know whom to ask); MG
  * answers "WHICH terms are frequent?" — any term occurring more than N/(k+1)
  * times is guaranteed to survive in the summary. Per occurrence: bump the
  * term's counter if tracked, claim a free slot if one exists, else
  * decrement ALL counters (dropping zeros) — the classic one-pass summary.
  * Two summaries merge by adding common counters and re-trimming to the
  * top k by subtracting the (k+1)-th count (Agarwal et al.'s mergeable-MG),
  * which preserves the undercount bound.
  *
  * Guarantees (what the spec pins): `est(t) ≤ true(t)` and
  * `true(t) − est(t) ≤ Σdecrements ≤ N/(k+1)` per merged summary — so with
  * P merged partials the total undercount is ≤ P·N_p-bounded and every
  * `> N/(k+1)`-frequent term is present. The SET of survivors below that
  * frequency line — unlike the CMS counters — depends on merge order, so
  * this query is registered rows-only; the guarantee specs are the gate.
  *
  * Output: `array<struct<term, cnt>>` sorted (cnt DESC, term).
  */
case class MgAgg(term: Expression, k: Int,
                 mutableAggBufferOffset: Int = 0,
                 inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with ImplicitCastInputTypes {

  require(k >= 1, "k must be positive")

  override def inputTypes: Seq[GraftColumnBridge.ADT] = Seq(StringType)
  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def offer(buf: java.util.HashMap[String, Long], s: String, c: Long): Unit = {
    val cur = buf.get(s)
    if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + c)
    else if (buf.size < k) buf.put(s, c)
    else {
      // decrement the whole summary by the newcomer's weight (bounded by
      // the smallest tracked counter so nothing goes negative); survivors
      // keep the remainder, zeros vacate their slots
      var minC = Long.MaxValue
      val it0 = buf.values().iterator()
      while (it0.hasNext) minC = math.min(minC, it0.next())
      val dec = math.min(c, minC)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == dec) it.remove() else e.setValue(e.getValue - dec)
      }
      if (c > dec) offer(buf, s, c - dec) // newcomer's leftover weight claims a slot
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val t = term.eval(input)
    if (t != null) offer(buf, t.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(b1: java.util.HashMap[String, Long],
                     b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, cur + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count and keep the positive remainder
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val it2 = b1.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (e.getValue <= cut) it2.remove() else e.setValue(e.getValue - cut)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var size = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      size += 4 + it0.next().getKey.getBytes(StandardCharsets.UTF_8).length + 8
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(b.length); bb.put(b); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgAgg =
    copy(term = newChildren(0))
}

object MgAgg {
  /** Column form: the ≤ k-entry (term, cnt) summary for a group of terms. */
  def summary(term: Column, k: Int): Column =
    GraftColumnBridge.column(
      MgAgg(GraftColumnBridge.expression(term), k).toAggregateExpression())
}
