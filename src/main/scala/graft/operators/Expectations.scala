package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract suite: a set of named expectations
  * evaluated against a table in as few passes as the rule classes
  * allow, producing the one-row-per-rule report a quality gate acts
  * on. Scale shape: every [[Expectations.RowRule]] in the suite is
  * folded into ONE aggregate scan (a single map-side-combined pass no
  * matter how many rules); each [[Expectations.UniqueRule]] is one
  * key-shuffle; each [[Expectations.FkRule]] is one anti-join that
  * broadcasts when the parent's key projection is small. Nothing is
  * ever collected; the report is |rules| rows.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Per-row predicate expectation: `violation` marks a BAD row
    * (null-safe — a null predicate counts as a violation, the
    * conservative contract reading). */
  case class RowRule(name: String, violation: Column) extends Rule

  /** Key-uniqueness expectation: violations = rows beyond the first
    * per key (the count a dedup pass would remove). */
  case class UniqueRule(name: String, keyCols: Seq[String]) extends Rule

  /** Referential expectation: violations = child rows whose key has
    * no match in `parent` (orphans). */
  case class FkRule(name: String, childCols: Seq[String],
                    parent: DataFrame, parentCols: Seq[String]) extends Rule

  /** Evaluate the suite. Output: (rule, n_checked, n_violations,
    * pass) — one row per rule, in no guaranteed order. */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names")
    val rowRules = rules.collect { case r: RowRule => r }
    val rowReport =
      if (rowRules.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +: rowRules.map(r =>
          sum(when(coalesce(r.violation, lit(true)), 1L).otherwise(0L))
            .as(s"__v_${r.name}"))
        // one row; materialized once so the per-rule projections
        // below don't re-run the scan
        val one = df.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
        Some(rowRules.map(r => one.select(lit(r.name).as("rule"),
            col("__n").as("n_checked"),
            col(s"__v_${r.name}").as("n_violations")))
          .reduce(_ unionByName _))
      }
    val others = rules.collect {
      case UniqueRule(name, keys) =>
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c")), lit(0L)).as("n_checked"),
            coalesce(sum(col("__c") - 1), lit(0L)).as("n_violations"))
          .select(lit(name).as("rule"), col("n_checked"),
            col("n_violations"))
      case FkRule(name, childCols, parent, parentCols) =>
        val p = parent.select(parentCols.map(col): _*).distinct()
          .toDF(childCols: _*)
        val orphans = df.select(childCols.map(col): _*)
          .join(p, childCols, "left_anti")
        df.agg(count(lit(1)).as("n_checked"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
          .select(lit(name).as("rule"), col("n_checked"),
            col("n_violations"))
    }
    (rowReport.toSeq ++ others).reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }
}
