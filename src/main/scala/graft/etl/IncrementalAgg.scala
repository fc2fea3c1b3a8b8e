package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of an additive aggregate under a
  * [[ChangeFeed]] — the materialized-view half of the CDC story: given
  * last batch's group-by state and the row-level delta that turned the
  * base table into this batch, produce this batch's state WITHOUT
  * rescanning the base. At 100 TB this is the difference between a
  * full-table aggregate per batch and work proportional to the batch's
  * true delta (the feed is sized by changed rows only).
  *
  * Soundness rests on two properties:
  *
  *   1. ADDITIVITY — counts and sums form a commutative group: an
  *      `insert`/`update_postimage` row contributes (+1, +x); a
  *      `delete`/`update_preimage` row contributes (−1, −x). A row
  *      whose GROUP migrated between versions decrements its old group
  *      via the preimage and increments the new one via the postimage —
  *      no special case. (Non-additive aggregates — min/max, distinct
  *      counts — cannot be maintained this way and are out of scope;
  *      they need the base scan or a sketch.)
  *   2. EXACT ARITHMETIC — sums are carried as DECIMAL(38,6) (the
  *      engine-wide [[graft.queries.Det]] discipline), so
  *      maintained state is BIT-IDENTICAL to a from-scratch recompute,
  *      not merely close: the o11 gate hashes the maintained aggregate
  *      against an oracle that only ever sees the full recompute.
  *      Double-typed sums would drift (float addition is not
  *      associative) and the identity would be approximate.
  *
  * State schema: `groupCols ++ ("n": count) ++ sum columns` (decimal).
  * Groups whose maintained count reaches zero leave the state; a
  * NEGATIVE count survives deliberately — it means the feed does not
  * correspond to the state it was applied to (wrong version pair,
  * state applied twice), and surfacing the impossible row beats
  * silently absorbing the corruption.
  *
  * Scale: the delta aggregation shuffles only the FEED (map-side
  * partial agg first), and the merge is one full-outer join on the
  * group key against the |groups|-sized state — never the base table.
  * Group keys join null-safely (`<=>`), so a NULL group maintains like
  * any other.
  */
object IncrementalAgg {

  private val D = DecimalType(38, 6)

  /** Build the initial additive state of `rows`: one count column `n`
    * plus one exact decimal sum per `(outName, sourceCol)`.
    *
    * Sums are `coalesce(sum(x), 0)` — a DELIBERATE deviation from SQL's
    * NULL-on-all-NULL-input: the state's sums live in the additive
    * group (Decimal, +), and that group's identity element is 0, not
    * NULL. Under SQL semantics a group whose every source value is NULL
    * would carry `sum = NULL`, but [[maintain]]'s merge must treat an
    * absent group and a contributes-nothing group identically (both add
    * the identity), so the state normalizes both to 0. With NULL sums
    * the two paths would diverge after one maintenance cycle (state 0
    * vs recompute NULL) and the bit-identity contract would break;
    * IncrementalAggSpec's all-NULL-sum case pins the agreement. NULL
    * source values inside a mixed group are still skipped, as in SQL. */
  def aggregate(rows: DataFrame, groupCols: Seq[String],
                sumCols: Seq[(String, String)]): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map { case (out, src) =>
          coalesce(sum(col(src).cast(D)), lit(0).cast(D)).cast(D).as(out) }: _*)

  /** Apply a [[ChangeFeed.diff]] to `prev` (a state produced by
    * [[aggregate]] with the same `groupCols`/`sumCols`), yielding the
    * state [[aggregate]] would produce on the feed's `to` side. */
  def maintain(prev: DataFrame, feed: DataFrame, groupCols: Seq[String],
               sumCols: Seq[(String, String)]): DataFrame = {
    val expected = groupCols ++ ("n" +: sumCols.map(_._1))
    require(prev.columns.toSeq == expected,
      s"prev is not an aggregate state: have ${prev.columns.mkString(",")}, " +
        s"expected ${expected.mkString(",")}")
    require(feed.columns.contains("_change_type"),
      "feed must be a ChangeFeed.diff output (missing _change_type)")
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = feed.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("n"),
        sumCols.map { case (out, src) =>
          sum((col(src).cast(D)) * sign).cast(D).as(out) }: _*)
    val p = prev.as("p")
    val d = delta.as("d")
    val joinCond = groupCols.map(g => col(s"p.$g") <=> col(s"d.$g"))
      .reduce(_ && _)
    val zero = lit(0).cast(D)
    p.join(d, joinCond, "full_outer")
      .select(
        groupCols.map(g => coalesce(col(s"p.$g"), col(s"d.$g")).as(g)) ++
          Seq((coalesce(col("p.n"), lit(0L)) +
            coalesce(col("d.n"), lit(0L))).as("n")) ++
          sumCols.map { case (out, _) =>
            (coalesce(col(s"p.$out"), zero) +
              coalesce(col(s"d.$out"), zero)).cast(D).as(out) }: _*)
      // a consistently-emptied group has n = 0 AND every sum exactly 0
      // (decimal arithmetic) and leaves the state; n = 0 with a nonzero
      // residual sum is the zero-count face of feed corruption and
      // SURFACES like the negative count does
      .filter(sumCols.map(s => col(s._1) =!= zero)
        .foldLeft(col("n") =!= 0L)(_ || _))
  }

  /** Table names of a published maintained aggregate (see [[applyOnce]]). */
  val StateT = "state"
  val AppliedT = "applied"

  /** EXACTLY-ONCE application of one CDC batch to a maintained
    * aggregate living in an [[AtomicPublish]] store — the consumer side
    * of a change-feed stream (a foreachBatch body at minute cadence).
    * The store holds two tables per version: [[StateT]] (the aggregate)
    * and [[AppliedT]] (one `batch_id` row per batch ever applied — the
    * ledger). Because both commit in ONE atomic publish, the ledger can
    * never disagree with the state it describes: a checkpoint-replayed
    * batch finds its own id and returns false without touching
    * anything, and a crash between maintain and commit leaves the
    * previous version serving — there is no partial application to
    * observe. `expectedBase` pins the snapshot the maintenance read, so
    * a concurrent publisher surfaces as a publish conflict rather than
    * a lost update. Returns true iff the batch was applied.
    *
    * The ledger costs one long per batch EVER applied (a year of
    * minute-cadence ingest ≈ 0.5M rows — noise next to any real
    * state); re-seeding via [[publishInitial]] from a fresh base
    * rebase resets it, the same device as the ANN store's rebuild.
    *
    * Call [[publishInitial]] once to seed the store. */
  def applyOnce(spark: SparkSession, root: String, feed: DataFrame,
                batchId: Long, groupCols: Seq[String],
                sumCols: Seq[(String, String)]): Boolean = {
    import spark.implicits._
    // one pointer resolution: the snapshot read IS the expectedBase pin
    // (reading the pointer twice would let a publish land in between and
    // surface as a spurious conflict)
    val snap = AtomicPublish.snapshot(spark, root)
    val applied = snap.table(spark, AppliedT)
    if (!applied.filter(col("batch_id") === batchId).isEmpty) false
    else {
      AtomicPublish.publish(spark, root, Seq(
        StateT -> maintain(snap.table(spark, StateT), feed, groupCols, sumCols),
        AppliedT -> applied.unionByName(Seq(batchId).toDF("batch_id"))),
        expectedBase = Some(Some(snap.version)))
      true
    }
  }

  /** Seed a maintained-aggregate store with the base table's state and
    * an empty ledger; returns the committed version. */
  def publishInitial(spark: SparkSession, root: String, rows: DataFrame,
                     groupCols: Seq[String],
                     sumCols: Seq[(String, String)]): Long = {
    import spark.implicits._
    AtomicPublish.publish(spark, root, Seq(
      StateT -> aggregate(rows, groupCols, sumCols),
      AppliedT -> Seq.empty[Long].toDF("batch_id")))
  }
}
