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
  *
  * The full join-type algebra on the same substrate: [[leftOuterDelta]]
  * (inner + A-side null extensions), [[rightOuterDelta]] (the same
  * call with the sides swapped), [[fullOuterDelta]] (extensions on
  * both sides),
  * [[semiDelta]] / [[antiDelta]] (A ⋉ B and its complement — pure
  * functions of the per-key match count, no inner terms at all). All
  * outer/semi/anti decisions come from per-join-key MATCH-COUNT views
  * co-maintained in the base stores, so a count can never disagree with
  * the replica it summarizes.
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
                     bFeed: DataFrame): DataFrame =
    leftOuterFrom(joinDeltaFromStores(spark, a, b, aFeed, bFeed),
      new Corrections(spark, a, b, bCountView, aFeed, bFeed))

  /** RIGHT-OUTER join view maintenance: [[leftOuterDelta]] with the
    * sides swapped — every B row kept, unmatched B rows null-extended
    * on the A side, decided from `aCountView` (a count of A rows per
    * join key co-maintained in A's store). The emitted feed carries
    * B's columns FIRST, then A's (it is the left-outer feed of
    * B ⟕ A); the view replica's key is `bKey ++ aKey` accordingly. */
  def rightOuterDelta(spark: SparkSession, a: Side, b: Side,
                      aCountView: String, aFeed: DataFrame,
                      bFeed: DataFrame): DataFrame =
    leftOuterDelta(spark, b, a, aCountView, bFeed, aFeed)

  /** [[leftOuterDelta]]'s composition from prebuilt parts — the shared
    * form [[fullOuterDelta]] and [[familyDeltas]] build on so one
    * `Corrections` (and its probe jobs) serves every consumer of the
    * same side. */
  private def leftOuterFrom(inner: DataFrame, cx: Corrections): DataFrame = {
    // b-side columns = the inner feed's columns minus the a-feed's
    val bTable = inner.columns.toSeq
      .filterNot(c => cx.aTable.contains(c) || c == "_change_type")
    def nullExt(aRows: DataFrame, changeType: String): DataFrame =
      aRows.select(cx.aTable.map(col) ++
        bTable.map(c => lit(null).cast(inner.schema(c).dataType).as(c)) :+
        lit(changeType).as("_change_type"): _*)
    inner
      .unionByName(nullExt(cx.lookup(cx.aDel, cx.noPre, nullKeyedIn = true),
        "delete"))
      .unionByName(nullExt(cx.lookup(cx.aIns, cx.noPost, nullKeyedIn = true),
        "insert"))
      .unionByName(nullExt(cx.lostAll, "insert"))
      .unionByName(nullExt(cx.gainedFirst, "delete"))
  }

  /** The four correction classes every outer/semi/anti form decides
    * from per-join-key MATCH COUNTS (see [[leftOuterDelta]]'s Scaladoc
    * for the algebra): the batch's own A deletes/inserts judged against
    * pre/post counts, and the UNTOUCHED A rows whose key's match count
    * crossed zero either way. All lookups are bucket-pruned to the keys
    * in play. NOT free to construct: the two pruned store reads
    * ([[IncrementalAgg.readViewPrunedBy]] for the count view and the
    * transition rows) each run one small driver-blocking probe job at
    * construction — build it once per batch and derive every needed
    * feed from the same instance ([[semiAntiDeltas]] does exactly
    * that for the complement pair). */
  private final class Corrections(spark: SparkSession, a: Side, b: Side,
                                  bCountView: String, aFeed: DataFrame,
                                  bFeed: DataFrame,
                                  managed: Boolean = false) {
    require(a.joinCols.size == b.joinCols.size,
      "joinCols of the two sides must pair up")
    Seq(aFeed, bFeed).foreach(f => require(f.columns.contains("_change_type"),
      "correction feeds must be ChangeFeed.diff outputs (missing _change_type)"))
    val aTable: Seq[String] = aFeed.columns.toSeq.filterNot(_ == "_change_type")
    private val aJoin = a.joinCols
    private val nullKeyed = aJoin.map(col(_).isNull).reduce(_ || _)
    // per-key ±1 contributions from ΔB, and the pre-batch count view
    // pruned to the keys in play (ΔA's and ΔB's) — renamed to a-side
    // names so one frame serves every lookup
    private val isPost = col("_change_type").isin("insert", "update_postimage")
    private val keyAs = b.joinCols.zip(aJoin).map { case (bc, ac) => col(bc).as(ac) }
    private val dRows = bFeed
      .select(keyAs :+ when(isPost, lit(1L)).otherwise(lit(-1L)).as("_d"): _*)
      .filter(!nullKeyed) // NULL-keyed B rows never match anything
    private val keysInPlay = aFeed.select(aJoin.map(col): _*)
      .unionByName(dRows.select(aJoin.map(col): _*))
    private val preCnt = IncrementalAgg.readViewPrunedBy(spark, b.root,
      bCountView, b.joinCols, keysInPlay.select(aJoin.zip(b.joinCols).map {
        case (ac, bc) => col(ac).as(bc) }: _*), Some(b.version))
      .select(b.joinCols.zip(aJoin).map { case (bc, ac) => col(bc).as(ac) } :+
        col("n").as("_pre"): _*)
    private val counts = {
      // ONE union + ONE aggregation (r20, guide §2.3/§2.4): the
      // previous form aggregated ΔB's ±1s per key (two exchanges with
      // the partial/final split) and full-outer sort-merge-joined the
      // fold back to the pruned pre-counts (one exchange per side plus
      // two sorts). Folding the pre-count rows in as ready-made
      // partials shuffles each input once and sorts nothing; long
      // addition is exact, so `pre + Σd` regrouped as `Σ(pre ∪ d)` is
      // value-identical, and GROUP BY groups NULL keys together
      // exactly as the old null-safe join condition matched them.
      // Keys only in ΔB sum _pre = 0 (the old coalesce); pruning
      // cohabitants (preCnt is a bucket SUPERSET) carry _d = 0 so
      // _post = _pre, never a transition — as before.
      val c = preCnt.select(aJoin.map(col) :+ col("_pre") :+
          lit(0L).as("_d"): _*)
        .unionByName(dRows.select(aJoin.map(col) :+ lit(0L).as("_pre") :+
          col("_d"): _*))
        .groupBy(aJoin.map(col): _*)
        .agg(sum(col("_pre")).as("_pre"), sum(col("_d")).as("_d"))
        .select(aJoin.map(col) :+ col("_pre") :+
          (col("_pre") + col("_d")).as("_post"): _*)
      // MANAGED mode (r20): this subtree appears once per lookup/
      // transition term — up to 4× inside one outer feed's plan and
      // across all six family feeds — and Spark performs no common-
      // subexpression elimination across join branches, so without a
      // cache every term re-runs the pruned count read + feed fold.
      // persist() is lazy (no job here); [[release]] ends the lifetime.
      if (managed) c.persist() else c
    }
    val noPre: Column = coalesce(col("c._pre"), lit(0L)) === 0L
    val noPost: Column = coalesce(col("c._post"), lit(0L)) === 0L
    val aDel: DataFrame = aFeed.filter(col("_change_type")
      .isin("delete", "update_preimage")).drop("_change_type")
    val aIns: DataFrame = aFeed.filter(isPost).drop("_change_type")

    /** `aRows` whose count row (joined null-safely as alias `c`)
      * satisfies `pred`. NULL-keyed rows never match anything, but a
      * NULL join key <=>-matches a NULL-keyed count group (a count view
      * built over NULL-keyed B rows carries one), so they are decided
      * EXPLICITLY: included iff `nullKeyedIn` — true for the outer/anti
      * forms (an unmatchable row is unmatched), false for semi. */
    def lookup(aRows: DataFrame, pred: Column, nullKeyedIn: Boolean): DataFrame = {
      val r = aRows.as("r")
      val c = counts.as("c")
      val cond = aJoin.map(k => col(s"r.$k") <=> col(s"c.$k")).reduce(_ && _)
      val rNull = aJoin.map(k => col(s"r.$k").isNull).reduce(_ || _)
      r.join(c, cond, "left")
        .filter(if (nullKeyedIn) (pred && !rNull) || rNull else pred && !rNull)
        .select(aTable.map(c0 => col(s"r.$c0")): _*)
    }

    // untouched A rows for TRANSITION keys only: pruned read of A minus
    // the batch's preimages (joinDelta's keep logic)
    private val aKeepT = {
      val transitions = counts.filter(
        (col("_pre") === 0L) =!= (col("_post") === 0L))
      val aPreForTrans = IncrementalAgg.readViewPrunedBy(spark, a.root,
        a.replica, aJoin, transitions.select(aJoin.map(col): _*),
        Some(a.version))
      val kt = aPreForTrans.as("ak").join(
          aFeed.filter(col("_change_type").isin("delete", "update_preimage"))
            .drop("_change_type").as("ad"),
          aTable.map(c => col(s"ak.$c") <=> col(s"ad.$c")).reduce(_ && _),
          "left_anti")
        .as("kt").join(transitions.as("t"),
          aJoin.map(k => col(s"kt.$k") <=> col(s"t.$k")).reduce(_ && _),
          "inner")
      // managed for the same reason as counts: lostAll and gainedFirst
      // both filter this frame, in every consumer of the same side
      if (managed) kt.persist() else kt
    }

    /** End the managed frames' cache lifetime (no-op when unmanaged). */
    def release(): Unit = if (managed) {
      counts.unpersist()
      aKeepT.unpersist()
      ()
    }
    /** Untouched A rows whose key lost its LAST match this batch. */
    val lostAll: DataFrame =
      aKeepT.filter(col("t._pre") > 0L && col("t._post") === 0L)
        .select(aTable.map(c => col(s"kt.$c")): _*)
    /** Untouched A rows whose key gained its FIRST match this batch. */
    val gainedFirst: DataFrame =
      aKeepT.filter(col("t._pre") === 0L && col("t._post") > 0L)
        .select(aTable.map(c => col(s"kt.$c")): _*)
  }

  private def tag(rows: DataFrame, t: String): DataFrame =
    rows.withColumn("_change_type", lit(t))

  private def semiFeed(cx: Corrections): DataFrame =
    tag(cx.lookup(cx.aDel, !cx.noPre, nullKeyedIn = false), "delete")
      .unionByName(tag(cx.lookup(cx.aIns, !cx.noPost, nullKeyedIn = false),
        "insert"))
      .unionByName(tag(cx.gainedFirst, "insert"))
      .unionByName(tag(cx.lostAll, "delete"))

  private def antiFeed(cx: Corrections): DataFrame =
    tag(cx.lookup(cx.aDel, cx.noPre, nullKeyedIn = true), "delete")
      .unionByName(tag(cx.lookup(cx.aIns, cx.noPost, nullKeyedIn = true),
        "insert"))
      .unionByName(tag(cx.lostAll, "insert"))
      .unionByName(tag(cx.gainedFirst, "delete"))

  /** SEMI-join view maintenance (`A ⋉ B` — the A rows with ≥1 match,
    * A's columns only, keyed by A's key): membership is a pure function
    * of the per-key match count, so the feed is exactly the four
    * correction classes of [[leftOuterDelta]] — no inner terms at all,
    * B's row VALUES never matter, only its count view. A's own
    * deletes/inserts enter when their key has matches (pre for the
    * delete, post for the insert — an updated row replays as
    * delete+insert so value changes land); an untouched A row enters on
    * its key's first match and leaves on its last. NULL-keyed A rows
    * never match, so they never appear. Every term is delta-bounded:
    * counts come from the co-maintained `bCountView` pruned to the keys
    * in play, the untouched-row lookup reads only the transition keys'
    * buckets. */
  def semiDelta(spark: SparkSession, a: Side, b: Side, bCountView: String,
                aFeed: DataFrame, bFeed: DataFrame): DataFrame =
    semiFeed(new Corrections(spark, a, b, bCountView, aFeed, bFeed))

  /** ANTI-join view maintenance (the A rows with NO match — the exact
    * complement of [[semiDelta]], and row-for-row the A-column
    * projection of [[leftOuterDelta]]'s null-extension set): same four
    * correction classes with inverted polarity — a delete of an
    * unmatched row leaves the view, an insert of an unmatched row (or a
    * NULL-keyed one, which can never match) enters it, an untouched row
    * enters when its key loses its last match and leaves on its first.
    * Same delta bounds as [[semiDelta]]. */
  def antiDelta(spark: SparkSession, a: Side, b: Side, bCountView: String,
                aFeed: DataFrame, bFeed: DataFrame): DataFrame =
    antiFeed(new Corrections(spark, a, b, bCountView, aFeed, bFeed))

  /** Both complement feeds from ONE [[Corrections]] — a consumer
    * maintaining the semi AND anti views of the same pair (they
    * partition A, so serving both is natural) pays the count/transition
    * machinery and its probe jobs once instead of twice. */
  def semiAntiDeltas(spark: SparkSession, a: Side, b: Side,
                     bCountView: String, aFeed: DataFrame,
                     bFeed: DataFrame): (DataFrame, DataFrame) = {
    val cx = new Corrections(spark, a, b, bCountView, aFeed, bFeed)
    (semiFeed(cx), antiFeed(cx))
  }

  /** MANAGED single-form entry points (r20): identical feeds to the
    * unmanaged forms, with the corrections' count/transition frames
    * cached until the returned release thunk runs — a correction frame
    * appears in ~4 terms of one outer/semi/anti feed's plan (8 across
    * the semi+anti pair), and Spark re-evaluates each term's copy
    * without the cache. Call release after the feed is consumed (it is
    * safe beside the feed's own unpersist — a materialized feed keeps
    * its rows). The unmanaged forms stay for callers without a
    * consumption point. */
  def leftOuterDeltaManaged(spark: SparkSession, a: Side, b: Side,
                            bCountView: String, aFeed: DataFrame,
                            bFeed: DataFrame): (DataFrame, () => Unit) = {
    val cx = new Corrections(spark, a, b, bCountView, aFeed, bFeed,
      managed = true)
    (leftOuterFrom(joinDeltaFromStores(spark, a, b, aFeed, bFeed), cx),
      () => cx.release())
  }

  /** [[rightOuterDelta]], managed — see [[leftOuterDeltaManaged]]. */
  def rightOuterDeltaManaged(spark: SparkSession, a: Side, b: Side,
                             aCountView: String, aFeed: DataFrame,
                             bFeed: DataFrame): (DataFrame, () => Unit) =
    leftOuterDeltaManaged(spark, b, a, aCountView, bFeed, aFeed)

  /** [[semiAntiDeltas]], managed — see [[leftOuterDeltaManaged]]. */
  def semiAntiDeltasManaged(spark: SparkSession, a: Side, b: Side,
                            bCountView: String, aFeed: DataFrame,
                            bFeed: DataFrame)
      : (DataFrame, DataFrame, () => Unit) = {
    val cx = new Corrections(spark, a, b, bCountView, aFeed, bFeed,
      managed = true)
    (semiFeed(cx), antiFeed(cx), () => cx.release())
  }

  /** FULL-OUTER join view maintenance: [[leftOuterDelta]]'s feed (inner
    * pairs + A-side null extensions) plus the SYMMETRIC corrections —
    * B rows whose A-match count crossed zero get `(NULL a-cols, b-row)`
    * extension rows, decided from `aCountView`, a count of A rows per
    * join key co-maintained in A's STORE (so it can never disagree with
    * A's replica — the same invariant `bCountView` gives the left side).
    * The B-side corrections are [[Corrections]] verbatim with the roles
    * swapped; both extension classes key null-safely under the view's
    * `aKey ++ bKey` replica key ((aKey, NULL) and (NULL, bKey) rows
    * never collide with inner pairs). Cost: the inner six terms + two
    * delta-bounded correction sets. */
  def fullOuterDelta(spark: SparkSession, a: Side, b: Side,
                     aCountView: String, bCountView: String,
                     aFeed: DataFrame, bFeed: DataFrame): DataFrame = {
    val inner = joinDeltaFromStores(spark, a, b, aFeed, bFeed)
    val cxA = new Corrections(spark, a, b, bCountView, aFeed, bFeed)
    val cxB = new Corrections(spark, b, a, aCountView, bFeed, aFeed)
    val lo = leftOuterFrom(inner, cxA)
    lo.unionByName(bSideExtensions(lo, cxA.aTable, cxB))
  }

  /** The B-side null-extension corrections of a full-outer feed —
    * `cxB` is a [[Corrections]] with the roles swapped (B is its "A").
    * `lo` supplies the a-column types to null out. */
  private def bSideExtensions(lo: DataFrame, aTable: Seq[String],
                              cxB: Corrections): DataFrame = {
    def nullExtB(bRows: DataFrame, changeType: String): DataFrame =
      bRows.select(aTable.map(c => lit(null).cast(lo.schema(c).dataType).as(c))
        ++ cxB.aTable.map(col) :+ lit(changeType).as("_change_type"): _*)
    nullExtB(cxB.lookup(cxB.aDel, cxB.noPre, nullKeyedIn = true), "delete")
      .unionByName(nullExtB(cxB.lookup(cxB.aIns, cxB.noPost,
        nullKeyedIn = true), "insert"))
      .unionByName(nullExtB(cxB.lostAll, "insert"))
      .unionByName(nullExtB(cxB.gainedFirst, "delete"))
  }

  /** Every feed of the join family built from ONE shared substrate.
    * The six feeds target six DIFFERENT views (inner/leftOuter/
    * rightOuter/fullOuter keyed by the pair key; semi/anti keyed
    * `aKey`, A-columns only), so a consumer serving several forms of
    * the same pair maintains one store per form — but the expensive
    * inputs are identical across forms and this constructor builds
    * each exactly once: the two bucket-pruned inner reads, the A-side
    * [[Corrections]] (shared by leftOuter, fullOuter, semi, anti) and
    * the B-side one (shared by rightOuter and fullOuter — rightOuter
    * is inner ∪ the B-side extension set fullOuter already needs, so
    * it costs ZERO additional probe work here, unlike the standalone
    * [[rightOuterDelta]] which re-runs the machinery swapped; its
    * columns keep the inner feed's A-first order — same content,
    * name-matched by [[ChangeFeed.applyTo]] either way). Calling the
    * per-form entry points separately would run the count/transition
    * probe jobs once PER FORM — up to 5× the per-batch fixed latency
    * this shares. */
  final class FamilyFeeds(val inner: DataFrame, val leftOuter: DataFrame,
                          val rightOuter: DataFrame, val fullOuter: DataFrame,
                          val semi: DataFrame, val anti: DataFrame,
                          releaser: () => Unit = () => ()) {
    /** Unpersist the substrate's MANAGED intermediates (the two
      * `Corrections`' count/transition frames, the inner/leftOuter/
      * extension pieces, and the fused tagged union the six feeds
      * filter — r20). Call after the batch's feeds are consumed
      * (beside the feeds' own unpersist); feeds already materialized
      * keep their rows, so releasing early only costs recomputation,
      * never correctness. */
    def release(): Unit = releaser()
  }

  /** Build [[FamilyFeeds]] for one batch: one inner read, one
    * `Corrections` per side, every form derived from those. The
    * corrections' count/transition frames are MANAGED (cached until
    * [[FamilyFeeds.release]]): each appears in up to four terms of
    * four of the six feeds, and Spark re-evaluates repeated subtrees —
    * per r20 profiling the uncached substrate re-ran the pruned count
    * reads ~12× per batch across the family's materializations. */
  def familyDeltas(spark: SparkSession, a: Side, b: Side,
                   aCountView: String, bCountView: String,
                   aFeed: DataFrame, bFeed: DataFrame): FamilyFeeds = {
    // The three substrate pieces each run eager, driver-blocking probe
    // jobs at construction (two bucket-pruning aggregates apiece);
    // they are independent, so build them CONCURRENTLY (r20) — the
    // serial form paid ~6 probe-job latencies back-to-back per batch.
    // Pool threads pin the caller's active session (SparkPlan captures
    // the thread-local session at plan construction).
    val callerSession = org.apache.spark.sql.SparkSession.getActiveSession
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = substrateEc
    def pinned[T](t: => T): Future[T] = Future {
      callerSession.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      t
    }
    val fInner = pinned(joinDeltaFromStores(spark, a, b, aFeed, bFeed))
    val fCxA = pinned(new Corrections(spark, a, b, bCountView, aFeed, bFeed,
      managed = true))
    val fCxB = pinned(new Corrections(spark, b, a, aCountView, bFeed, aFeed,
      managed = true))
    val inner = Await.result(fInner, Duration.Inf).persist()
    val cxA = Await.result(fCxA, Duration.Inf)
    val cxB = Await.result(fCxB, Duration.Inf)
    val lo = leftOuterFrom(inner, cxA).persist()
    // bExt feeds BOTH rightOuter and fullOuter: persist it for the
    // batch like the corrections frames, or each consumer re-runs its
    // four lookup joins
    val bExt = bSideExtensions(lo, cxA.aTable, cxB).persist()
    // ONE MATERIALIZATION PASS for the whole family (r20 pass 2): even
    // with every shared frame cached, serving the six feeds as six
    // separate DataFrames meant six separate queries at the consumer's
    // materializing actions — and broadcast builds are rebuilt and AQE
    // stages re-scheduled PER QUERY (exchange reuse never spans
    // queries); profiled at 9–20 stage jobs per feed, the dominant
    // per-batch block after the substrate caches. The family is
    // instead exposed as filters over ONE cached tagged union: the
    // first consumer action materializes every form in a single query
    // (broadcasts built once, identical subplans deduped by exchange
    // reuse), and the other five read the cache. Row multisets are
    // unchanged — each branch is the original feed's plan plus a
    // literal tag (semi/anti pad B's columns with NULLs and project
    // them back off), and feeds are unordered multisets, so filtering
    // the union by tag returns exactly the branch's rows.
    val aT = cxA.aTable
    val bT = inner.columns.toSeq
      .filterNot(c => aT.contains(c) || c == "_change_type")
    val pairCols = (aT ++ bT :+ "_change_type").map(col)
    val padB = bT.map(c => lit(null).cast(inner.schema(c).dataType).as(c))
    def tagged(rows: DataFrame, form: String, aOnly: Boolean): DataFrame = {
      val projected =
        if (aOnly) rows.select(aT.map(col) ++ padB :+ col("_change_type"): _*)
        else rows.select(pairCols: _*)
      projected.withColumn("_form", lit(form))
    }
    val fused = tagged(inner, "inner", aOnly = false)
      .unionByName(tagged(lo, "left", aOnly = false))
      .unionByName(tagged(inner.unionByName(bExt), "right", aOnly = false))
      .unionByName(tagged(lo.unionByName(bExt), "full", aOnly = false))
      .unionByName(tagged(semiFeed(cxA), "semi", aOnly = true))
      .unionByName(tagged(antiFeed(cxA), "anti", aOnly = true))
      .persist()
    def pick(form: String): DataFrame =
      fused.filter(col("_form") === form).select(pairCols: _*)
    def pickA(form: String): DataFrame =
      fused.filter(col("_form") === form)
        .select(aT.map(col) :+ col("_change_type"): _*)
    new FamilyFeeds(pick("inner"), pick("left"), pick("right"),
      pick("full"), pickA("semi"), pickA("anti"),
      () => { cxA.release(); cxB.release(); bExt.unpersist()
        lo.unpersist(); inner.unpersist(); fused.unpersist(); () })
  }

  /** Shared daemon pool for [[familyDeltas]]' concurrent substrate
    * construction — cached threads, reaped when idle. */
  private lazy val substrateEc: scala.concurrent.ExecutionContextExecutor =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-family-substrate-${n.getAndIncrement()}")
            t.setDaemon(true)
            t
          }
        }))

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
