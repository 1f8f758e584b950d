package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass SimHash aggregate over (token-hash, weight) rows (`bits`-wide
  * fingerprint, default 32).
  *
  * Replaces the relational formulation (explode 32 bit-positions → per-bit
  * integer vote → re-group) with a `TypedImperativeAggregate` holding the 32
  * vote counters in a mutable buffer: one shuffle of one buffer per group
  * instead of a 32× row blowup. Semantics are identical — votes are exact
  * integer sums (order-independent), bit b of the result is set iff its
  * vote is > 0 — so the DuckDB oracle (which keeps the relational form)
  * still matches bit-for-bit.
  */
case class SimHashAgg(hash: Expression, weight: Expression,
                      bits: Int = 32,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 63,
    s"SimHash width $bits outside [1, 63]: eval's 1L << b and update's " +
      "hv >> b wrap at 64 and would emit corrupt fingerprints")

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.ADT] = Seq(LongType, LongType)

  override def children: Seq[Expression] = Seq(hash, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    val w = weight.eval(input)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      val wv = w.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += wv * (((hv >> b) & 1L) * 2L - 1L)
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { b1(b) += b2(b); b += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sim = 0L
    var b = 0
    while (b < bits) { if (buf(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(hash = newChildren(0), weight = newChildren(1))
}

object SimHashAgg {
  /** Column form: `simhashAgg(tokenHash, weight)` inside a groupBy.agg.
    * `bits` is the fingerprint width: 32 (default, byte bands) or up to
    * 63 — [[graft.operators.Dedup.simhashTable60]] uses 60 over the
    * dual-fold token hash, the 100 TB blocking width. */
  def simhashAgg(hash: Column, weight: Column, bits: Int = 32): Column =
    GraftColumnBridge.column(
      SimHashAgg(GraftColumnBridge.expression(hash),
        GraftColumnBridge.expression(weight), bits).toAggregateExpression())
}
