package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-level replacements for the reference's per-row dimension-conformance
  * loops (/root/reference/warehouse.py:76-170).
  *
  * The reference pattern — for each row: `SELECT id FROM dim WHERE id=%s`,
  * skip if found, else INSERT (warehouse.py:78-92 and five clones) — is a
  * left-anti join expressed one row at a time with 2-4 network round trips
  * per row. Everything here is whole-DataFrame, shuffle-aware, and
  * collect-free, so it holds at 100 TB: the "existing" side of a dim
  * anti-join is broadcast when small, and nothing ever iterates rows on the
  * driver.
  */
object DimOps {

  /** J3/E1 — insert-if-absent as a left-anti join: the rows of `incoming`
    * whose key is NOT already present in `existing` (first-wins semantics,
    * warehouse.py:78-81). Within-batch duplicates are also collapsed
    * (warehouse.py:81 skips them via the same existence check), keeping the
    * lowest-sorting row per key so the result is deterministic — plain
    * `dropDuplicates` lets Spark pick an arbitrary row.
    */
  def newRows(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val deduped = firstWins(incoming, keys)
    deduped.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
  }

  /** A1 — deterministic first-wins dedup by key: keeps, per key, the row
    * that sorts lowest on the remaining columns. The reference's "first"
    * is MySQL insertion order (warehouse.py:81); ours is a total order so
    * re-runs and the DuckDB oracle agree.
    *
    * Implemented as `min(struct(rest))` rather than a row_number window:
    * struct comparison is lexicographic with nulls-first (the same total
    * order as `orderBy(rest.asc_nulls_first)`), and an aggregate gets
    * map-side partial combining — the shuffle moves one candidate row
    * per (key, mapper) instead of every input row, which is the
    * difference that matters when deduping 100 TB with a high dup ratio.
    *
    * `preShuffle` flips that trade for LOW-dup inputs (a handful of rows
    * per key): there the map-side map holds most of its slice for little
    * reduction, and at sf10 under 16-thread/20 GiB executors that map's
    * spill-merge is an OOM risk (the q9 lesson, SCALE.md r13).
    * Repartitioning by the keys first moves raw rows — roughly what the
    * near-no-op partial agg would have shuffled anyway — and bounds
    * aggregation state by (corpus / shuffle partitions). The dup ratio
    * is the CALLER's knowledge: keep the default for true dedup
    * (fact→dim extraction, crawl dedup), set it for near-unique keys.
    * Both forms are value-identical (min(struct) is order-independent).
    * Decision rule — below ~8 rows/key, pre-shuffle — with the why,
    * the q9/a1 worked examples, and a cheap rows-per-key estimate, in
    * SCALE.md §"Round-14: the partial-aggregation decision rule".
    */
  def firstWins(df: DataFrame, keys: Seq[String],
                preShuffle: Boolean = false): DataFrame = {
    val rest = df.columns.filterNot(keys.contains)
    val base = if (preShuffle) df.repartition(keys.map(col): _*) else df
    if (rest.isEmpty) base.distinct()
    else
      base.groupBy(keys.map(col): _*)
        .agg(min(struct(rest.map(col): _*)).as("__first"))
        .select(df.columns.toSeq.map(c =>
          if (keys.contains(c)) col(c) else col("__first").getField(c).as(c)): _*)
  }

  /** Idempotent upsert: existing ∪ (incoming ∖ existing). Running it twice
    * equals running it once — the reference's core invariant
    * (warehouse.py:78-94). */
  def antiUpsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(newRows(existing, incoming, keys))

  /** SCD-1 merge (MERGE INTO … WHEN MATCHED THEN UPDATE, WHEN NOT
    * MATCHED THEN INSERT): matched keys take the incoming row's values,
    * unmatched existing rows pass through, new keys insert. One
    * full-outer join + per-column coalesce — set-level, no per-row
    * logic, one shuffle on the key (or none if both sides are already
    * co-partitioned). Incoming must be key-unique (enforce upstream
    * with [[firstWins]]); schemas must match by name. */
  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    require(existing.columns.sorted.sameElements(incoming.columns.sorted),
      s"merge requires matching schemas; existing=${existing.columns.mkString(",")} " +
        s"incoming=${incoming.columns.mkString(",")}")
    require(!existing.columns.exists(_.startsWith("__")),
      "merge reserves the __ column-name prefix for its internal markers")
    val rest = existing.columns.filterNot(keys.contains).toSeq
    val e = rest.foldLeft(existing)((d, c) => d.withColumnRenamed(c, s"__e_$c"))
    // a row-presence marker, not per-column coalesce: the incoming row
    // wins WHOLESALE on a key match, so an incoming NULL value updates
    // to NULL instead of silently keeping the old value
    val i = rest.foldLeft(incoming)((d, c) => d.withColumnRenamed(c, s"__i_$c"))
      .withColumn("__i_present", lit(true))
    e.join(i, keys, "full_outer")
      .select(keys.map(col) ++
        rest.map(c => when(col("__i_present"), col(s"__i_$c"))
          .otherwise(col(s"__e_$c")).as(c)): _*)
      .select(existing.columns.toSeq.map(col): _*)
  }

  /** §7.3 — deterministic surrogate keys replacing MySQL AUTO_INCREMENT
    * (warehouse.py:109-110, 150-151): `offset + dense_rank() OVER (ORDER BY
    * naturalKey)`. Gap-free, order-independent, reproducible by the DuckDB
    * oracle. The un-partitioned window funnels through one task — fine for
    * dimension tables (≪ fact); fact-scale keys use a composite encode
    * instead (see FactLoad.factId), never a global sort.
    */
  def withSurrogateKey(df: DataFrame, naturalKey: Seq[String],
                       keyName: String = "id", offset: Long = 0L): DataFrame = {
    val w = Window.orderBy(naturalKey.map(col(_).asc): _*)
    df.withColumn(keyName, (dense_rank().over(w).cast("long") + lit(offset)))
      .select((keyName +: df.columns.toSeq).map(col): _*)
  }

  /** A2 — one row per distinct natural key (warehouse.py:104-110 for
    * subcategory, 145-151 for year, 158-162 for (day,month,year)). */
  def distinctByNaturalKey(df: DataFrame, naturalKey: Seq[String]): DataFrame =
    df.select(naturalKey.map(col): _*).distinct()

  /** P5 — CASE/decode mapping (warehouse.py:83-91). The reference has no
    * else-branch: an unmatched name raises UnboundLocalError or silently
    * reuses the previous row's value (SURVEY.md Appendix Q1). We normalize
    * to `otherwise(null)` — the evident intent. */
  /** O5 — SCD-2 history from an event log: per `keyCol`, events ordered
    * by (`dateCol`, `tieCol`) collapse to their attribute TRANSITIONS
    * (null-safe change detection, so a null attribute is a value, not a
    * wildcard), and validity intervals come from lead over the
    * surviving changes — [valid_from, valid_to) rows with `is_current`,
    * the classic type-2 dimension. Both windows shuffle once on the
    * key. `tieCol` must totally order same-date events per key or the
    * surviving transition row is partitioning-dependent.
    *
    * Output: every event-log column of a transition row +
    * (valid_from DATE, valid_to DATE — `endOfTime` for the open
    * interval, is_current BOOLEAN). Random-history semantics proven vs
    * a sequential fold reference in DifferentialSpec. */
  def scd2History(events: DataFrame, keyCol: String, dateCol: String,
                  tieCol: String, attrCol: String,
                  endOfTime: String = "9999-12-31"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(dateCol), col(tieCol))
    // row_number (not prev-is-null) marks the first event, so a leading
    // NULL attribute still opens its interval; both exprs share one
    // window, so this costs no extra shuffle
    val changes = events
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    changes
      .withColumn("__next_from", lead(col(dateCol), 1).over(w))
      .withColumn("valid_from", to_date(col(dateCol)))
      .withColumn("valid_to",
        coalesce(to_date(col("__next_from")), to_date(lit(endOfTime))))
      .withColumn("is_current", col("__next_from").isNull)
      .drop("__prev", "__rn", "__next_from")
  }

  def decode(c: Column, mapping: Seq[(String, String)]): Column = {
    val first = when(c === mapping.head._1, lit(mapping.head._2))
    mapping.tail.foldLeft(first) { case (acc, (k, v)) =>
      acc.when(c === k, lit(v))
    }.otherwise(lit(null).cast("string"))
  }
}
