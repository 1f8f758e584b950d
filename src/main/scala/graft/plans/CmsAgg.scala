package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch over a string column: `d` hash rows × `w` counters,
  * flattened to one `array<long>` of length d·w.
  *
  * The frequency sibling of the HLL-distinct (`a9`) and KLL-percentile
  * (`a15b`) sketch paths — corpus-wide term counting in O(d·w) memory
  * instead of a vocabulary-sized hash aggregate: each occurrence bumps one
  * counter per row, the shuffle moves one fixed-size buffer per partition,
  * and `estimate(t) = min_i counters[i][h_i(t)]` is an upper bound that
  * overcounts only by hash collisions (≤ N/w per row in expectation).
  *
  * Unlike Misra-Gries/SpaceSaving summaries, counter arrays merge by
  * elementwise ADDITION — the sketch is merge-order- and
  * partitioning-independent, so estimates are deterministic and the DuckDB
  * oracle can reproduce them exactly (group token occurrences by
  * `(i, h_i(term))` relationally and probe the same buckets). Row hash `i`
  * of term `t` is `charPolyHash("cms" || i || ":" || t) mod w` — the
  * portable polynomial, salted per row.
  */
case class CmsAgg(term: Expression, d: Int, w: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(d >= 1 && w >= 1, "sketch shape must be positive")

  override def inputTypes: Seq[GraftColumnBridge.ADT] = Seq(StringType)
  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = term.eval(input)
    if (t != null) {
      val s = t.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < d) {
        buf(i * w + CmsAgg.bucket(i, s, w)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(d * w)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(term = newChildren(0))
}

object CmsAgg {
  /** Row-i bucket of term `s`: portable poly hash of "cms<i>:<s>" mod w —
    * mirrored verbatim by the oracle SQL. */
  def bucket(i: Int, s: String, w: Int): Int = {
    val salted = "cms" + i + ":" + s
    var h = 0L
    var j = 0
    while (j < salted.length) {
      val cp = salted.codePointAt(j)
      h = (h * 31L + cp) % 1000000007L
      j += Character.charCount(cp)
    }
    (h % w).toInt
  }

  /** Column form: the flattened d×w counter array for a group of terms. */
  def sketch(term: Column, d: Int, w: Int): Column =
    GraftColumnBridge.column(
      CmsAgg(GraftColumnBridge.expression(term), d, w).toAggregateExpression())
}
