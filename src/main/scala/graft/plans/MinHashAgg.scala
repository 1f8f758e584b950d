package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass k-permutation MinHash signature over shingle hashes.
  *
  * Replaces the explode-k-permutations → per-(doc, i) min formulation with a
  * `TypedImperativeAggregate` holding the k running minima in a mutable
  * buffer: one shuffle of one k-long buffer per group instead of a k× row
  * blowup. Permutation i of hash h is
  * `((1000003·(i+1))·h + 12345 + 7919·i) mod 1e9+7` — identical to
  * `TextFunctions.minhashPerm`, so the relational DuckDB oracle matches
  * exactly (min is order-independent).
  */
case class MinHashAgg(hash: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.ADT] = Seq(LongType)

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val ph = ((1000003L * (i + 1)) * hv + 12345L + 7919L * i) % 1000000007L
        if (ph < buf(i)) buf(i) = ph
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(hash = newChildren(0))
}

object MinHashAgg {
  /** Column form: the k-long signature array for a group of shingle hashes. */
  def minhashSignature(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(hash), k).toAggregateExpression())
}
