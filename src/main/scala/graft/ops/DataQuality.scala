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
    // internal aliases are INDEX-based so rule names never become
    // identifiers (a backtick or newline in a name can't break the
    // stack() text); names appear only as escaped string literals
    val aggs = count(lit(1)).as("__checked") +:
      rules.zipWithIndex.map { case ((_, c), i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__v_$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case ((n, _), i) =>
      s"'${n.replace("\\", "\\\\").replace("'", "\\'")}', __v_$i" }.mkString(", ")
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

  /** Column profile (the Deequ/Glue-crawler shape — the audit that
    * precedes any migration): per column, row/null/distinct counts plus
    * typed extremes — numeric min/max/mean (mean decimal-exact) or
    * lexicographic min/max for strings and dates. ONE aggregate pass
    * over the table computes every column's statistics (a new column
    * adds aggregate expressions, not a scan); the long-format report is
    * a |columns|-row projection of that single row.
    *
    * Output: column, n_rows, n_nulls, n_distinct, min_num, max_num,
    * mean (numeric columns; NULL otherwise), min_str, max_str
    * (string/date columns; NULL otherwise). */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "no columns given")
    val all = numericCols ++ stringCols
    // a column listed twice (or in both lists) would mint duplicate
    // __nn_/__nd_ aggregate aliases and fail downstream with an
    // ambiguous-column error — reject it with the real cause instead
    require(all.distinct.size == all.size,
      s"profile: numericCols and stringCols must be disjoint and " +
        s"duplicate-free, got duplicates: ${all.diff(all.distinct).distinct.mkString(", ")}")
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val aggs = Seq(count(lit(1)).as("__n")) ++ all.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    } ++ numericCols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"),
        (sum(col(c).cast(dec)).cast("double") / count(col(c))).as(s"__mean_$c"))
    } ++ stringCols.flatMap { c =>
      Seq(min(col(c).cast("string")).as(s"__smn_$c"),
        max(col(c).cast("string")).as(s"__smx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = numericCols.map { c =>
      one.select(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        col(s"__mean_$c").as("mean"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    } ++ stringCols.map { c =>
      one.select(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        lit(null).cast("double").as("mean"),
        col(s"__smn_$c").as("min_str"), col(s"__smx_$c").as("max_str"))
    }
    rows.reduce(_.unionByName(_)).orderBy("column")
  }
}
