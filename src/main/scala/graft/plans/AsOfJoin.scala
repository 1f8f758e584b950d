package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, BoundReference, Expression, JoinedRow, SortOrder, UnsafeProjection, Ascending, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN — the whole-operator custom-Catalyst tier (SURVEY §4 option c:
  * LogicalPlan + Strategy + SparkPlan), for the one relational shape Spark
  * has no built-in operator for: "for each left row, the latest right row
  * with the same key and time ≤ the left time".
  *
  * Physical execution is a per-partition sort-merge: both sides are
  * hash-clustered on the key and sorted by (key, time) — requirements the
  * planner satisfies with exactly the exchanges/sorts a sort-merge join
  * would use — then a single forward scan per partition emits each left row
  * joined to the last right row seen for its key (left outer semantics:
  * nulls when no right row precedes). O(n log n) in the shuffle, O(n) in
  * the merge, no buffering beyond one held right row per key.
  *
  * The equivalent composed-operator form (union + last_value window) is
  * what the DuckDB oracle runs; `AsOfJoinSpec` asserts both agree.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // requiredNumPartitions pins both exchanges to the same partition count:
  // AQE's shuffle coalescing does not know this custom node needs
  // co-partitioned children (it special-cases joins), so an advisory
  // distribution could be coalesced asymmetrically and break zipPartitions
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(n)) ::
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(n)) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // generated projections/orderings, built once per partition — the
      // merge loop runs per row, and interpreted Expression.eval +
      // InterpretedOrdering here cost ~3× end-to-end (measured at sf0.1)
      val lKeyProj = UnsafeProjection.create(Seq(lk))
      val lTimeProj = UnsafeProjection.create(Seq(lt))
      val rKeyProj = UnsafeProjection.create(Seq(rk))
      val rTimeProj = UnsafeProjection.create(Seq(rt))
      val keyOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(0, keyType, nullable = true), Ascending)))
      val timeOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(0, timeType, nullable = true), Ascending)))
      val proj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      var rHead: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var heldRow: InternalRow = null
      lIter.map { lRow =>
        val lKeyRow = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        val lTimeNull = lTimeRow.isNullAt(0)
        // advance the right side while its (key, time) is ≤ (lKey, lTime).
        // SQL comparison semantics for NULL times: `rt <= lt` is UNKNOWN, so
        // a NULL-time right row is consumed but never held, and a NULL-time
        // left row holds nothing (it sorts first in its key group under the
        // nulls-first child ordering, so not advancing on it is safe)
        var advancing = true
        while (advancing && rHead != null) {
          val kc = keyOrd.compare(rKeyProj(rHead), lKeyRow)
          if (kc < 0) {
            rHead = if (rIter.hasNext) rIter.next().copy() else null
          } else if (kc == 0) {
            val rTimeRow = rTimeProj(rHead)
            if (rTimeRow.isNullAt(0)) {
              rHead = if (rIter.hasNext) rIter.next().copy() else null
            } else if (!lTimeNull && timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
              heldRow = rHead
              rHead = if (rIter.hasNext) rIter.next().copy() else null
            } else advancing = false
          } else advancing = false
        }
        // re-project the held row's key (its projection buffer was reused
        // while advancing); SQL equi-join semantics: null keys never match
        val matched = heldRow != null && !lKeyRow.isNullAt(0) && {
          val hk = rKeyProj(heldRow)
          !hk.isNullAt(0) && keyOrd.compare(hk, lKeyRow) == 0
        }
        proj(joined(lRow, if (matched) heldRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** `left ASOF JOIN right ON left.key = right.key AND right.time ≤
    * left.time` (latest such right row; left outer). Column name overlap is
    * the caller's responsibility (alias beforehand). Right rows tied on
    * (key, time) are resolved by scan order — for deterministic tie-breaks
    * precompute a composite time column (e.g. `struct(ts, id)`) and pass
    * that as the time column on both sides. */
  def asofJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
               leftKeyCol: String, rightKeyCol: String,
               leftTimeCol: String, rightTimeCol: String): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = GraftColumnBridge.analyzed(left)
    val rp = GraftColumnBridge.analyzed(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(",")}"))
    GraftColumnBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp, attr(lp, leftKeyCol), attr(rp, rightKeyCol),
        attr(lp, leftTimeCol), attr(rp, rightTimeCol)))
  }
}
