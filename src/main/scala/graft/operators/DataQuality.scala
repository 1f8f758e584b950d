package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint/expectations layer
  * (Deequ-style) a production lake runs before anything downstream trusts a
  * table: row-level predicates, key uniqueness, and referential integrity,
  * each reported as (table, constraint, violations, total, pass).
  *
  * Scale posture: ALL row rules and ALL uniqueness rules for a table
  * compile into ONE aggregation pass over it — a row rule is one
  * `sum(when(...))` conditional aggregate (map-side combinable), a
  * uniqueness rule one `count_distinct(struct(keys))` riding the same agg;
  * adding a rule never adds a scan. Referential rules are each one
  * LEFT ANTI join against the DISTINCT reference keys (broadcast when the
  * key side is dim-sized — the usual case for FK targets). The audit
  * result is rules-bounded (one row per rule), never data-sized.
  */
object DataQuality {

  sealed trait Rule { def name: String }

  /** Row-level predicate; a NULL predicate counts as a violation (the
    * conservative reading — an unverifiable row is not a verified one). */
  final case class RowRule(name: String, pred: Column) extends Rule

  /** Key uniqueness over `cols`; violations = rows beyond the first per
    * distinct key (total − distinct). */
  final case class UniqueRule(name: String, cols: Seq[String]) extends Rule

  /** Referential integrity: every non-null `col` value must exist in
    * `ref(refCol)`; violations = rows whose value has no match. */
  final case class RefRule(name: String, col: String, ref: DataFrame,
                           refCol: String) extends Rule

  /** Audit one table. Output: (table, constraint, violations, total, pass),
    * one row per rule, ordered by constraint name. */
  def audit(table: String, df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowRules = rules.collect { case r: RowRule => r }
    val uniqRules = rules.collect { case r: UniqueRule => r }
    val refRules = rules.collect { case r: RefRule => r }
    // one scan: total + every row rule + every uniqueness distinct-count.
    // Row-rule sums wrap in coalesce: over an EMPTY table sum() is NULL,
    // which would leak through violations into a NULL pass verdict —
    // an empty table violates nothing, so it must read 0 / pass=true.
    val aggs = count(lit(1)).cast("long").as("__total") +:
      (rowRules.map(r =>
        coalesce(sum(when(coalesce(r.pred, lit(false)), 0L).otherwise(1L)),
          lit(0L)).as(s"__rr_${r.name}")) ++
        uniqRules.map(r =>
          countDistinct(struct(r.cols.map(col): _*)).as(s"__uq_${r.name}")))
    // the one-row agg is consumed once per rule — materialize it once
    val base = df.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    val rowOut = (rowRules.map(r =>
      base.select(lit(r.name).as("check_name"),
        col(s"__rr_${r.name}").as("violations"), col("__total").as("total"))) ++
      uniqRules.map(r =>
        base.select(lit(r.name).as("check_name"),
          (col("__total") - col(s"__uq_${r.name}")).as("violations"),
          col("__total").as("total"))) ++
      refRules.map { r =>
        df.select(col(r.col).as("__v")).where(col("__v").isNotNull)
          .join(broadcast(r.ref.select(col(r.refCol).as("__v")).distinct()),
            Seq("__v"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .crossJoin(broadcast(base.select(col("__total").as("total"))))
          .select(lit(r.name).as("check_name"), col("violations"),
            col("total"))
      })
    rowOut.reduce(_ unionByName _)
      .select(lit(table).as("table_name"), col("check_name"),
        col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
  }

  /** Audit several tables and stack the reports. */
  def auditAll(audits: Seq[DataFrame]): DataFrame =
    audits.reduce(_ unionByName _)
      .orderBy(col("table_name"), col("check_name"))

  /** Column PROFILE — the audit's exploratory sibling (what a rule author
    * reads before writing rules): per column, null count and exact
    * distinct cardinality, in ONE aggregation pass over the table (every
    * per-column pair rides the same agg — Catalyst plans the distincts as
    * one expand). Output: (table_name, column_name, n_nulls, n_distinct,
    * n_rows), one row per profiled column. */
  def profile(table: String, df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = count(lit(1)).cast("long").as("__total") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c")))
    val base = df.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    cols.map(c =>
      base.select(lit(table).as("table_name"), lit(c).as("column_name"),
        col(s"__nn_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"),
        col("__total").as("n_rows")))
      .reduce(_ unionByName _)
      .orderBy(col("table_name"), col("column_name"))
  }
}
