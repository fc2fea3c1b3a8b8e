package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the dbt-test / Deequ-style validation
  * report a warehouse runs before publishing a batch (the reference
  * relies on MySQL constraints for this; a parquet lake has none, so
  * the checks become queries). Every check returns the same shape —
  * (rule, violations, checked, pass) — so reports compose by union.
  *
  * Scale shape: all row-level rules for one table share ONE scan (a
  * single aggregate with conditional sums — adding a rule adds a
  * column, not a pass); uniqueness is a count-vs-distinct aggregate
  * (map-side combining); referential integrity is one anti-join on the
  * key (broadcastable while the parent's key set fits, sort-merge
  * beyond — Catalyst's call). Nothing ever materializes the violating
  * rows themselves; drill-down is a follow-up filter with the same
  * predicate.
  */
object DataQuality {

  private def row(rule: Column, violations: Column, checked: Column) =
    Seq(rule.as("rule"), violations.as("violations"), checked.as("checked"))

  /** Row-level expectations over one table in ONE scan: `rules` maps
    * rule name → VIOLATION predicate (true = row violates). */
  def rowExpectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val aggs = count(lit(1)).as("__checked") +:
      rules.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(s"__v_$n") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (n, _) =>
      s"'${n.replace("'", "''")}', `__v_$n`" }.mkString(", ")
    one
      .select(expr(s"stack(${rules.length}, $stackArgs) AS (rule, violations)"),
        col("__checked"))
      .select(col("rule"), col("violations"), col("__checked").as("checked"),
        (col("violations") === 0L).as("pass"))
  }

  /** Key uniqueness (composite keys welcome): violations = rows beyond
    * the first of each key group. */
  def uniqueKey(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("__n"),
        countDistinct(struct(keyCols.map(col): _*)).as("__d"))
      .select(row(lit(name), col("__n") - col("__d"), col("__n")): _*)
      .withColumn("pass", col("violations") === 0L)

  /** Referential integrity: child rows whose key has no parent match
    * (NULL child keys are orphans too — they reference nothing). */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
    orphans.agg(count(lit(1)).as("__o"))
      .crossJoin(broadcast(child.agg(count(lit(1)).as("__n"))))
      .select(row(lit(name), col("__o"), col("__n")): _*)
      .withColumn("pass", col("violations") === 0L)
  }

  /** Union of checks into one report, sorted by rule name. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_.unionByName(_)).orderBy("rule")
}
