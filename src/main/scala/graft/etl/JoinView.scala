package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an equi-JOIN view — the classical IVM
  * rung beyond aggregates (additive), extrema/top-k (invalidation),
  * and distinct counts (composition): a materialized `A ⋈ B` kept
  * current under BOTH tables' change feeds without ever re-joining the
  * bases.
  *
  * The algebra (inner equi-join, per-side unique keys — [[ChangeFeed]]'s
  * standing contract). Split each side into the batch's images:
  * `A_pre = A_keep ∪ ΔA⁻`, `A_post = A_keep ∪ ΔA⁺`, where `A_keep` is
  * the rows the batch never touched (pre = delete ∪ update_preimage,
  * post = insert ∪ update_postimage). Distributing the join:
  *
  *   removals  = ΔA⁻ ⋈ B_keep  ∪  A_keep ⋈ ΔB⁻  ∪  ΔA⁻ ⋈ ΔB⁻
  *   additions = ΔA⁺ ⋈ B_keep  ∪  A_keep ⋈ ΔB⁺  ∪  ΔA⁺ ⋈ ΔB⁺
  *
  * — disjoint by construction (every pair is classified by which side
  * touched it), so the view's change feed is exactly these six
  * delta-bounded joins, emitted as delete/insert rows keyed by the
  * PAIR key `aKey ++ bKey`. An updated pair appears as delete+insert
  * of the same pair key, which [[ChangeFeed.applyTo]] replays exactly.
  *
  * SCALE — why this is delta-proportional and not "Δ times a base
  * scan": the `A_keep ⋈ ΔB` terms join a delta against the OTHER
  * side's full pre-state, which is where textbook IVM quietly costs a
  * base scan per batch. Here the pre-states are maintained-store
  * replicas BUCKETED ON THEIR JOIN COLUMNS ([[IncrementalAgg.ReplicaSpec.bucketOn]]),
  * so [[IncrementalAgg.readViewPrunedBy]] opens only the buckets the
  * opposite delta's join keys hash into: each of the six joins is
  * Δ × (the matching buckets), independent of |A| and |B|. A replica
  * bucketed any other way falls back to the full read — correct,
  * just unpruned.
  *
  * The view itself is a [[IncrementalAgg.ReplicaSpec]] keyed
  * `aKey ++ bKey` in its own store, advanced by this feed with the
  * same exactly-once ledger as any replica; cross-store consistency
  * (A, B, and the view observed at one batch) is a
  * [[Coordinator]] cut over the three roots.
  */
object JoinView {

  /** One side's maintained pre-state: a replica `view` under an
    * [[IncrementalAgg]] store root, read at `version` (resolve it from
    * the [[Coordinator]] cut so both sides and the view advance
    * consistently). `joinCols` are this side's join columns, in join
    * order. */
  final case class Side(root: String, replica: String,
                        joinCols: Seq[String], version: Long)

  private def images(feed: DataFrame, pre: Boolean): DataFrame = {
    val types = if (pre) Seq("delete", "update_preimage")
                else Seq("insert", "update_postimage")
    feed.filter(col("_change_type").isin(types: _*)).drop("_change_type")
  }

  /** The view's change feed for one batch, from both sides' table
    * feeds and PRE-batch states. `aPre`/`bPre` may be any frames with
    * the tables' schemas — pass bucket-pruned store reads
    * ([[joinDeltaFromStores]]) for the delta-proportional form.
    * Column names of the two sides must be disjoint (the view carries
    * both sides' columns verbatim, join columns included — they are
    * distinct columns that happen to be equal on every view row).
    * Either feed may be empty (a one-sided batch). */
  def joinDelta(spark: SparkSession, aPre: DataFrame, bPre: DataFrame,
                aFeed: DataFrame, bFeed: DataFrame,
                joinOn: Seq[(String, String)]): DataFrame = {
    require(joinOn.nonEmpty, "joinOn must name at least one column pair")
    Seq(aFeed, bFeed).foreach(f => require(f.columns.contains("_change_type"),
      "joinDelta feeds must be ChangeFeed.diff outputs (missing _change_type)"))
    val aCols = aPre.columns.toSeq
    val bCols = bPre.columns.toSeq
    val clash = aCols.intersect(bCols)
    require(clash.isEmpty,
      s"side column names must be disjoint, both sides have: ${clash.mkString(",")}")
    def cond(l: String, r: String): Column =
      joinOn.map { case (ac, bc) => col(s"$l.$ac") === col(s"$r.$bc") }
        .reduce(_ && _)
    val out = (aCols ++ bCols).map(col)
    // untouched rows: pre-state minus the batch's PREIMAGE rows. A
    // deleted/updated row's preimage IS its pre-state row (diff's
    // contract), so a whole-row null-safe anti join removes exactly the
    // touched rows without needing the side's key in scope; inserts
    // have no preimage and remove nothing.
    def keep(preState: DataFrame, feed: DataFrame, cols: Seq[String],
             side: String): DataFrame =
      preState.as(side).join(images(feed, pre = true).as(s"${side}_d"),
        cols.map(c => col(s"$side.$c") <=> col(s"${side}_d.$c")).reduce(_ && _),
        "left_anti")
    val aKeep = keep(aPre, aFeed, aCols, "ak")
    val bKeep = keep(bPre, bFeed, bCols, "bk")
    val aDel = images(aFeed, pre = true)
    val aIns = images(aFeed, pre = false)
    val bDel = images(bFeed, pre = true)
    val bIns = images(bFeed, pre = false)
    def j(l: DataFrame, r: DataFrame): DataFrame =
      l.as("l").join(r.as("r"), cond("l", "r"), "inner")
        .select(out: _*)
    val removals = j(aDel, bKeep).unionByName(j(aKeep, bDel))
      .unionByName(j(aDel, bDel))
      .withColumn("_change_type", lit("delete"))
    val additions = j(aIns, bKeep).unionByName(j(aKeep, bIns))
      .unionByName(j(aIns, bIns))
      .withColumn("_change_type", lit("insert"))
    removals.unionByName(additions)
  }

  /** [[joinDelta]] with each side's pre-state read from its maintained
    * store, BUCKET-PRUNED by the opposite feed's join keys (rename the
    * opposite columns to this side's names so the hash is computed over
    * this side's layout). This is the production form: each term's
    * base read is ∝ the delta's matching buckets. Note BOTH deltas'
    * keys prune each side — a side's pre-state meets the other side's
    * deletes AND inserts. */
  def joinDeltaFromStores(spark: SparkSession, a: Side, b: Side,
                          aFeed: DataFrame, bFeed: DataFrame): DataFrame = {
    require(a.joinCols.size == b.joinCols.size,
      "joinCols of the two sides must pair up")
    val joinOn = a.joinCols.zip(b.joinCols)
    def pruneKeys(oppFeed: DataFrame, from: Seq[String],
                  to: Seq[String]): DataFrame =
      oppFeed.select(from.zip(to).map { case (f, t) => col(f).as(t) }: _*)
    val aPre = IncrementalAgg.readViewPrunedBy(spark, a.root, a.replica,
      a.joinCols, pruneKeys(bFeed, b.joinCols, a.joinCols), Some(a.version))
    val bPre = IncrementalAgg.readViewPrunedBy(spark, b.root, b.replica,
      b.joinCols, pruneKeys(aFeed, a.joinCols, b.joinCols), Some(b.version))
    joinDelta(spark, aPre, bPre, aFeed, bFeed, joinOn)
  }
}
