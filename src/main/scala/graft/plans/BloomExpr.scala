package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.ADT
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a long key column — the
  * runtime-filter pattern (semi-join reduction) made explicit: a filter
  * built from the SMALL side of a membership join rides to every task and
  * prunes the BIG side's scan before any shuffle. No false negatives (a
  * true member always passes), bounded false positives (`fpp`), so it is
  * only ever a PREFILTER — an exact join downstream culls the false
  * positives and keeps results bit-identical to the unfiltered plan.
  *
  * The filter bytes ship once per task via `ctx.addReferenceObj` (the
  * [[MultiPlaneBucketsExpr]] pattern), deserialized lazily once per
  * executor; the generated code makes one virtual call per row.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[ADT] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from generated code. */
  def contains(h: Long): Boolean = bloom.mightContainLong(h)

  override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpr {
  import org.apache.spark.sql.GraftColumnBridge._

  /** `might_contain(bloom, h)` as a Column. The filter is serialized into
    * the expression (compact: ~1.2 bytes/key/ln(1/fpp) — 10⁶ keys at 1%
    * ≈ 1.2 MiB), so the plan stays a pure expression tree. */
  def mightContain(h: Column, bloom: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    column(BloomMightContainExpr(expression(h), bos.toByteArray))
  }
}
