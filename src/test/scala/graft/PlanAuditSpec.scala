package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural regression net over EVERY registered query: builds each
  * physical plan at sf0.001 and rejects join shapes that do not survive
  * scale. A cartesian or nested-loop join sneaking into a previously
  * equi-joined query is exactly the class of regression that stays green on
  * correctness and detonates at 100 TB. */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  // deliberately quadratic / tiny-side product queries, with the reason
  private val allowedProducts: Map[String, String] = Map(
    "dedup_embedding" -> "all-pairs regime by design (allowQuadratic opt-in)",
    "ann_topk" -> "brute-force baseline: broadcast query side x corpus",
    "ann_ivf" -> "query x centroid table product (10 x nCells rows)",
    "ann_ivf_det" -> "query x centroid table product (10 x nCells rows)",
    "ta_keywords" -> "corpus-size one-row aggregate rides along broadcast")

  test("no unplanned cartesian or nested-loop join in any registered query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hasProduct =
          plan.contains("CartesianProduct") || plan.contains("NestedLoopJoin")
        if (hasProduct && !allowedProducts.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unplanned product join in: ${offenders.mkString(", ")}")
  }
}
