package graft.dq

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.config.DqRuleConfig

/** Data-quality engine: the reference's five validators (not_null,
  * regex, expression, referential_integrity, uniqueness — the last
  * fixed, it is broken+unreachable upstream, SURVEY.md §2.6) × three
  * actions (filter / tag / reject).
  *
  * Design delta from the reference (SURVEY.md §4.3): every rule becomes
  * one boolean flag COLUMN in a single projection, metrics for all rules
  * come from ONE aggregation pass, and actions are applied to the
  * flagged plan — the reference instead ran 2 + 2·rules full
  * recomputations of the source per table. Sequential-filter semantics
  * are preserved: a rule's metrics count only rows that survived the
  * filter-action rules before it.
  *
  * Scale notes: referential-integrity joins broadcast the deduped
  * reference keys; uniqueness ranks inside a hash-partitioned window on
  * the rule columns; nothing collects to the driver (the reference
  * shipped 100 invalid sample rows per rule through collect()).
  */
object DqEngine {

  final case class RuleMetrics(rule: String, ruleType: String, action: String,
      validCount: Long, invalidCount: Long) {
    def isValid: Boolean = invalidCount == 0L
  }

  final case class DqResult(data: DataFrame, metrics: Seq[RuleMetrics],
      private[dq] val cached: Option[DataFrame] = None) {
    def rejected: Seq[RuleMetrics] =
      metrics.filter(m => m.action == "reject" && !m.isValid)
    /** Release the flagged plan's cache once `data` has been consumed
      * (the metrics pass materialized it so the write is a cache read,
      * not a second full recomputation).
      */
    def cleanup(): Unit = cached.foreach(_.unpersist())
  }

  class DqRejectException(val failed: Seq[RuleMetrics]) extends RuntimeException(
    s"DQ reject: ${failed.map(m => s"${m.rule}(${m.invalidCount} invalid)").mkString(", ")}")

  private def flagCol(name: String): String = s"__dq_${name}_valid"

  /** The rule's validity predicate as a Column (pure rules only —
    * referential integrity needs a join, handled in [[withFlags]]).
    */
  def predicate(rule: DqRuleConfig): Column = rule.ruleType match {
    case "not_null" =>
      rule.columns.map(col(_).isNotNull).reduce(_ && _)
    case "regex" => // every configured column must match
      rule.columns.map(c =>
        col(c).isNotNull && col(c).rlike(rule.pattern.getOrElse(".*")))
        .reduce(_ && _)
    case "expression" =>
      coalesce(expr(rule.expression.getOrElse("true")), lit(false))
    case other =>
      throw new IllegalArgumentException(s"unknown pure rule type: $other")
  }

  /** Add one boolean `__dq_<rule>_valid` column per rule. Join-based and
    * window-based rules extend the plan; pure rules are a projection.
    *
    * Sequential semantics: a uniqueness rule ranks only rows that
    * survive every preceding filter-action rule — otherwise a filtered
    * rank-1 row would silently doom its whole duplicate group (the
    * survivors would all rank ≥ 2). Implemented as a running count of
    * surviving rows over the same deterministic total order, so the
    * first SURVIVOR of each group is the keeper. Row-local rules
    * (not_null/regex/expression/ referential_integrity) don't depend on
    * other rows, so earlier filters cannot change their verdict — they
    * need no such conditioning.
    */
  def withFlags(spark: SparkSession, df: DataFrame,
      rules: Seq[DqRuleConfig]): DataFrame = {
    var survival: Column = lit(true)
    rules.foldLeft(df) { (acc, rule) =>
      val flagged = rule.ruleType match {
        case "referential_integrity" =>
          require(rule.columns.size == 1,
            s"referential_integrity rule '${rule.ruleName}' needs exactly one column")
          val c = rule.columns.head
          val refCol = rule.refColumn.getOrElse(c)
          val marker = s"__ref_${rule.ruleName}"
          val ref = spark.table(rule.refTable.get)
            .select(col(refCol).as(marker)).distinct()
          acc.join(broadcast(ref), acc(c) === col(marker), "left")
            .withColumn(flagCol(rule.ruleName), col(marker).isNotNull)
            .drop(marker)
        case "uniqueness" =>
          // keep-first-survivor semantics; ordering by all ORDERABLE
          // columns makes the surviving duplicate deterministic (the
          // key columns alone tie within the partition by construction;
          // map-typed columns cannot appear in ORDER BY)
          val parts = rule.columns.map(col)
          val orderable = acc.schema.fields.filter(f =>
            org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(f.dataType)).map(f => col(f.name)).toSeq
          val w = Window.partitionBy(parts: _*).orderBy(orderable: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          acc.withColumn(flagCol(rule.ruleName),
            sum(when(survival, 1L).otherwise(0L)).over(w) === 1 && survival)
        case _ =>
          acc.withColumn(flagCol(rule.ruleName), predicate(rule))
      }
      if (rule.actionOnFailure == "filter")
        survival = survival && col(flagCol(rule.ruleName))
      flagged
    }
  }

  /** Apply rules: flag columns → one metrics aggregation → actions.
    *
    * filter: drop rows failing the rule; later rules' metrics are
    *   conditioned on earlier filters (reference sequential semantics).
    * tag: keep rows, add `dq_<rule>_flag` = VALID/INVALID.
    * reject: throw if any row fails (after earlier filters).
    */
  def apply(spark: SparkSession, df: DataFrame,
      rules: Seq[DqRuleConfig]): DqResult = {
    if (rules.isEmpty) return DqResult(df, Nil)
    // persisted: the metrics aggregation below materializes the flagged
    // plan (incl. any ref-integrity joins), so the caller's write reads
    // the cache instead of recomputing the transform end-to-end;
    // released via DqResult.cleanup()
    val flagged = withFlags(spark, df, rules).persist()

    // one aggregation pass: per rule, counts conditioned on surviving
    // every prior filter-action rule; coalesce because sum() over an
    // EMPTY input is null, not 0
    var survival: Column = lit(true)
    val aggCols = rules.flatMap { r =>
      val f = col(flagCol(r.ruleName))
      val valid = coalesce(sum(when(survival && f, 1L).otherwise(0L)), lit(0L))
        .as(s"v_${r.ruleName}")
      val invalid = coalesce(sum(when(survival && !f, 1L).otherwise(0L)), lit(0L))
        .as(s"i_${r.ruleName}")
      if (r.actionOnFailure == "filter") survival = survival && f
      Seq(valid, invalid)
    }
    val row =
      try flagged.agg(aggCols.head, aggCols.tail: _*).head()
      catch { case e: Throwable => flagged.unpersist(); throw e }
    val metrics = rules.zipWithIndex.map { case (r, i) =>
      RuleMetrics(r.ruleName, r.ruleType, r.actionOnFailure,
        row.getLong(2 * i), row.getLong(2 * i + 1))
    }

    val rejected = metrics.filter(m => m.action == "reject" && !m.isValid)
    if (rejected.nonEmpty) {
      flagged.unpersist()
      throw new DqRejectException(rejected)
    }

    val out = rules.foldLeft(flagged) { (acc, r) =>
      r.actionOnFailure match {
        case "filter" => acc.filter(col(flagCol(r.ruleName)))
        case "tag" => acc.withColumn(s"dq_${r.ruleName}_flag",
          when(col(flagCol(r.ruleName)), "VALID").otherwise("INVALID"))
        case _ => acc
      }
    }
    DqResult(out.drop(rules.map(r => flagCol(r.ruleName)): _*), metrics,
      Some(flagged))
  }
}
