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

  /** LEFT-OUTER join maintenance — the fiddly IVM case: beyond the
    * inner pairs, the view holds a NULL-EXTENDED row for every A row
    * with no match, and those rows appear/disappear on FIRST-MATCH
    * TRANSITIONS (an A row gains its first match → its null-extension
    * row dies; loses its last → one is born) that no inner term sees.
    *
    * The outer feed = [[joinDelta]]'s inner feed ∪ corrections, and
    * every correction is decidable from per-join-key MATCH COUNTS:
    *
    *   - ΔA⁻ row whose key had NO pre-batch matches (or a NULL join
    *     key, which never matches): delete its null-extension row;
    *   - ΔA⁺ row whose key has NO post-batch matches (or NULL key):
    *     insert one;
    *   - an UNTOUCHED A row whose key transitioned >0 → 0: insert one
    *     (the inner feed already deleted its pairs);
    *   - transitioned 0 → >0: delete one (the inner feed adds pairs).
    *
    * Pre-batch counts come from a co-maintained ADDITIVE count view of
    * B grouped by its join columns (`bCountView` — the ir5 `df` view's
    * pattern; maintain it in B's store so it can never disagree with
    * the replica), read BUCKET-PRUNED by the keys that matter; the
    * post-batch count is pre + the feed's ±1 fold per key, computed
    * feed-side. Transition keys exist only inside ΔB, untouched-A
    * lookups prune by exactly those keys, so every correction term is
    * delta-bounded like the inner six. The null-extension row's pair
    * key is (aKey, NULL bKey) — [[ChangeFeed.applyTo]] matches keys
    * null-safely, so the replica replays it exactly. */
  def leftOuterDelta(spark: SparkSession, a: Side, b: Side,
                     bCountView: String, aFeed: DataFrame,
                     bFeed: DataFrame): DataFrame = {
    require(a.joinCols.size == b.joinCols.size,
      "joinCols of the two sides must pair up")
    val inner = joinDeltaFromStores(spark, a, b, aFeed, bFeed)
    // b-side columns = the inner feed's columns minus the a-feed's
    val aTable = aFeed.columns.toSeq.filterNot(_ == "_change_type")
    val bTable = inner.columns.toSeq
      .filterNot(c => aTable.contains(c) || c == "_change_type")
    val aJoin = a.joinCols
    val nullKeyed = aJoin.map(col(_).isNull).reduce(_ || _)
    // per-key count delta from ΔB, and the pre-batch count view pruned
    // to the keys in play (ΔA's and ΔB's) — renamed to a-side names so
    // one frame serves every lookup
    val isPost = col("_change_type").isin("insert", "update_postimage")
    val keyAs = b.joinCols.zip(aJoin).map { case (bc, ac) => col(bc).as(ac) }
    val dCnt = bFeed
      .select(keyAs :+ when(isPost, lit(1L)).otherwise(lit(-1L)).as("_d"): _*)
      .filter(!nullKeyed) // NULL-keyed B rows never match anything
      .groupBy(aJoin.map(col): _*).agg(sum(col("_d")).as("_d"))
    val keysInPlay = aFeed.select(aJoin.map(col): _*)
      .unionByName(dCnt.select(aJoin.map(col): _*))
    val preCnt = IncrementalAgg.readViewPrunedBy(spark, b.root, bCountView,
      b.joinCols, keysInPlay.select(aJoin.zip(b.joinCols).map {
        case (ac, bc) => col(ac).as(bc) }: _*), Some(b.version))
      .select(b.joinCols.zip(aJoin).map { case (bc, ac) => col(bc).as(ac) } :+
        col("n").as("_pre"): _*)
    val counts = preCnt.as("p").join(dCnt.as("d"),
        aJoin.map(k => col(s"p.$k") <=> col(s"d.$k")).reduce(_ && _),
        "full_outer")
      .select(aJoin.map(k => coalesce(col(s"p.$k"), col(s"d.$k")).as(k)) :+
        coalesce(col("p._pre"), lit(0L)).as("_pre") :+
        (coalesce(col("p._pre"), lit(0L)) + coalesce(col("d._d"), lit(0L)))
          .as("_post"): _*)
    def nullExt(aRows: DataFrame, changeType: String): DataFrame =
      aRows.select(aTable.map(col) ++
        bTable.map(c => lit(null).cast(inner.schema(c).dataType).as(c)) :+
        lit(changeType).as("_change_type"): _*)
    def lookup(aRows: DataFrame, pred: Column): DataFrame = {
      val r = aRows.as("r")
      val c = counts.as("c")
      val cond = aJoin.map(k => col(s"r.$k") <=> col(s"c.$k")).reduce(_ && _)
      r.join(c, cond, "left")
        .filter(pred || aJoin.map(k => col(s"r.$k").isNull).reduce(_ || _))
        .select(aTable.map(c0 => col(s"r.$c0")): _*)
    }
    val noPre = coalesce(col("c._pre"), lit(0L)) === 0L
    val noPost = coalesce(col("c._post"), lit(0L)) === 0L
    val aDel = aFeed.filter(col("_change_type")
      .isin("delete", "update_preimage")).drop("_change_type")
    val aIns = aFeed.filter(isPost).drop("_change_type")
    // untouched A rows for TRANSITION keys only: pruned read of A minus
    // the batch's preimages (joinDelta's keep logic)
    val transitions = counts.filter(
      (col("_pre") === 0L) =!= (col("_post") === 0L))
    val aPreForTrans = IncrementalAgg.readViewPrunedBy(spark, a.root,
      a.replica, aJoin, transitions.select(aJoin.map(col): _*),
      Some(a.version))
    val aKeepT = aPreForTrans.as("ak").join(
        aFeed.filter(col("_change_type").isin("delete", "update_preimage"))
          .drop("_change_type").as("ad"),
        aTable.map(c => col(s"ak.$c") <=> col(s"ad.$c")).reduce(_ && _),
        "left_anti")
      .as("kt").join(transitions.as("t"),
        aJoin.map(k => col(s"kt.$k") <=> col(s"t.$k")).reduce(_ && _),
        "inner")
    val lostAll = aKeepT.filter(col("t._pre") > 0L && col("t._post") === 0L)
      .select(aTable.map(c => col(s"kt.$c")): _*)
    val gainedFirst = aKeepT.filter(col("t._pre") === 0L && col("t._post") > 0L)
      .select(aTable.map(c => col(s"kt.$c")): _*)
    inner
      .unionByName(nullExt(lookup(aDel, noPre), "delete"))
      .unionByName(nullExt(lookup(aIns, noPost), "insert"))
      .unionByName(nullExt(lostAll, "insert"))
      .unionByName(nullExt(gainedFirst, "delete"))
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
