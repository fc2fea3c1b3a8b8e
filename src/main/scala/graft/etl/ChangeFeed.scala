package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-hoc CHANGE FEED between two committed versions of a published
  * table — "what did batch N change?", answered from the immutable
  * snapshots themselves, with no CDC bookkeeping at write time.
  *
  * The reference's MySQL warehouse answers this with binlog/CDC tooling;
  * lakehouse formats answer it with a change-data-feed the WRITER must
  * emit (Delta CDF's `_change_type` columns, Iceberg's changelog scans).
  * On [[AtomicPublish]]'s versioned layout neither is needed: version
  * directories are immutable once committed and vacuum is the only
  * deleter, so the exact row-level delta between ANY two retained
  * versions is computable after the fact — one full-outer join on the
  * table's key, classified into the standard four change types:
  *
  *   - `insert`            — key present only in the newer version
  *   - `delete`            — key present only in the older version
  *   - `update_preimage`   — key in both, any non-key column differs
  *                           (null-safely): the OLD row
  *   - `update_postimage`  — ditto: the NEW row
  *
  * Unchanged rows produce nothing, so the feed is sized by the true
  * delta, not the table.
  *
  * Contract: `key` must uniquely identify a row WITHIN each version (the
  * table's primary key — the same precondition every CDC format carries).
  * Rows whose key columns contain NULL never match across sides (SQL
  * join semantics) and therefore surface as a delete+insert pair rather
  * than an update — same as Delta CDF, documented rather than hidden.
  *
  * Scale: one shuffle on `key` per side (the information-theoretic floor
  * for a keyed diff — every row's fate depends on its key's presence on
  * the other side), then a streaming merge-join; nothing is collected,
  * nothing is all-pairs. A table bucketed or range-laid-out on its key
  * diffs exchange-free — plan-pinned, not just asserted:
  * PlanShapeSpec's "bucketed change-feed diff is exchange-free" gate
  * diffs two key-bucketed snapshots and fails on any Exchange over the
  * key. The change-type classification and the null-safe
  * column comparison are codegen'd expressions (struct `<=>`). A keyless
  * multiset diff, when a table has no primary key, is the existing
  * composition `to.exceptAll(from)` / `from.exceptAll(to)` (E1's
  * operator) and deliberately not duplicated here.
  */
object ChangeFeed {

  /** Row-level changes turning `from` into `to`, classified per the
    * table above. Output schema: `key ++ nonKey` columns in `to`'s
    * order, plus `_change_type` last. Both inputs must share one
    * schema; `key` must be a per-side unique key.
    *
    * A VIOLATED uniqueness precondition row-multiplies the outer join
    * (a key with n `from` rows and m `to` rows emits up to n×m change
    * pairs) — the same corruption every CDC format exhibits on a false
    * primary key. Callers diffing tables whose key is enforced
    * upstream pay nothing; callers that cannot trust the key pass
    * `requireUniqueKey = true` to fail loudly instead (one extra
    * aggregate per side — a key-shuffle-sized check, worth it exactly
    * when the key is unverified). */
  def diff(from: DataFrame, to: DataFrame, key: Seq[String],
           requireUniqueKey: Boolean = false): DataFrame = {
    if (requireUniqueKey) {
      Seq("from" -> from, "to" -> to).foreach { case (side, df) =>
        val dup = df.groupBy(key.map(col): _*)
          .agg(count(lit(1)).as("_cf_n")).filter(col("_cf_n") > 1)
          .limit(1).collect()
        require(dup.isEmpty,
          s"change-feed key (${key.mkString(",")}) is not unique on the " +
            s"$side side: e.g. ${dup.head.toSeq.init.mkString(",")} appears " +
            s"${dup.head.getAs[Long]("_cf_n")} times")
      }
    }
    diffUnchecked(from, to, key)
  }

  private def diffUnchecked(from: DataFrame, to: DataFrame,
                            key: Seq[String]): DataFrame = {
    require(key.nonEmpty, "change-feed key must name at least one column")
    require(from.columns.sorted.sameElements(to.columns.sorted),
      s"schema mismatch: from=${from.columns.sorted.mkString(",")} " +
        s"to=${to.columns.sorted.mkString(",")}")
    val missing = key.filterNot(to.columns.contains)
    require(missing.isEmpty, s"key columns absent from table: ${missing.mkString(",")}")
    val reserved = Seq("_cf_present", "_change_type").filter(to.columns.contains)
    require(reserved.isEmpty,
      s"table uses reserved change-feed column name(s): ${reserved.mkString(",")}")
    val cols = to.columns.toSeq
    val nonKey = cols.filterNot(key.contains)
    // Presence flags survive the outer join even when every data column
    // of a side is NULL (a key column could legitimately be NULL-free
    // only by convention; the flag makes absence unambiguous).
    val f = from.withColumn("_cf_present", lit(true)).as("f")
    val t = to.withColumn("_cf_present", lit(true)).as("t")
    val joinCond = key.map(k => col(s"f.$k") === col(s"t.$k")).reduce(_ && _)
    val fPresent = col("f._cf_present").isNotNull
    val tPresent = col("t._cf_present").isNotNull
    def row(side: String, changeType: String): Column =
      struct(cols.map(c => col(s"$side.$c").as(c)) :+
        lit(changeType).as("_change_type"): _*)
    // Null-safe "any non-key column differs": struct <=> struct compares
    // field-wise with NULL == NULL, exactly the update predicate. When
    // the key IS the whole row (presence-only diff) a key present on
    // both sides is unchanged by definition — inserts and deletes only.
    val sameValues =
      if (nonKey.isEmpty) lit(true)
      else struct(nonKey.map(c => col(s"f.$c")): _*) <=>
        struct(nonKey.map(c => col(s"t.$c")): _*)
    f.join(t, joinCond, "full_outer")
      // both-present-and-identical rows leave the feed BEFORE the
      // explode, so every surviving row emits 1 or 2 change rows
      .filter(!fPresent || !tPresent || !sameValues)
      .select(explode(
        when(!fPresent, array(row("t", "insert")))
          .when(!tPresent, array(row("f", "delete")))
          .otherwise(array(row("f", "update_preimage"),
            row("t", "update_postimage")))).as("_r"))
      .select(col("_r.*"))
  }

  /** COMPOSE two consecutive feeds: the net row-level changes A→C from
    * the feeds of A→B and B→C, without touching either snapshot — the
    * algebra behind CDC topic/ledger compaction (Kafka log compaction,
    * Debezium event folding): a consumer that fell N batches behind
    * applies ONE composed feed instead of N, and the composed feed is
    * sized by the NET delta (a row inserted then deleted vanishes; a
    * row changed then reverted vanishes; a chain of updates collapses
    * to one preimage/postimage pair).
    *
    * Identity (differential-tested on random version chains):
    * `compose(diff(a,b), diff(b,c), k)` is row-for-row `diff(a,c, k)`.
    * Since [[IncrementalAgg.maintain]] consumes exactly this shape,
    * maintenance over the composed feed equals maintenance over the
    * chain — N batches of MV work collapse with it.
    *
    * Preconditions: both inputs are [[diff]] outputs over the same
    * schema and key, and CONSECUTIVE (`ab`'s `to` side is `bc`'s
    * `from` side). By default violations surface as impossible rows
    * downstream (the same contract as maintain's corrupted-feed
    * surfacing); callers that cannot trust the chain pass
    * `strict = true` to fail loudly instead: for every key present in
    * both folds, `ab`'s post-state must null-safely equal `bc`'s
    * pre-state, and the NULL-keyed passthrough (below) must cancel
    * exactly — one extra feed-sized filter per input, the family's
    * opt-in-verification posture ([[diff]]'s `requireUniqueKey`,
    * [[applyTo]]'s `strict`).
    *
    * Rows with NULL key columns never match across [[diff]]'s join, so
    * a feed carries each of them as its own delete/insert row; the
    * keyed fold below would collapse them all into ONE pair (SQL GROUP
    * BY treats NULL as one group), so they route AROUND it: the net
    * A→C feed's NULL-keyed portion is exactly `ab`'s deletes (A's
    * NULL-keyed rows) plus `bc`'s inserts (C's NULL-keyed rows), while
    * `ab`'s inserts and `bc`'s deletes — both multisets of B's
    * NULL-keyed rows — cancel. This keeps the row-for-row
    * `diff(a, c)` identity on NULL-keyed rows too.
    *
    * CAVEAT — the lenient-mode surfacing contract has a NULL-keyed
    * exception: on a MISPAIRED (non-consecutive) chain, keyed
    * violations surface as impossible rows downstream, but the
    * NULL-keyed cancellation above drops `ab`'s NULL-keyed inserts and
    * `bc`'s NULL-keyed deletes UNCONDITIONALLY — an unmatched residue
    * between them (possible only on a broken chain) vanishes silently
    * rather than surfacing. Chains whose tables carry NULL-keyed rows
    * and whose pairing is untrusted should pass `strict = true`, which
    * verifies exactly this multiset match.
    *
    * Scale: one key-shuffle per feed (each folded to at most one
    * (preimage, postimage) pair per key — map-side partial agg), then
    * one keyed full-outer merge; work ∝ the feeds, never a snapshot. */
  def compose(ab: DataFrame, bc: DataFrame, key: Seq[String],
              strict: Boolean = false): DataFrame = {
    Seq(ab, bc).foreach(f => require(f.columns.contains("_change_type"),
      "compose inputs must be ChangeFeed.diff outputs (missing _change_type)"))
    require(ab.columns.sorted.sameElements(bc.columns.sorted),
      s"schema mismatch: ab=${ab.columns.sorted.mkString(",")} " +
        s"bc=${bc.columns.sorted.mkString(",")}")
    val cols = bc.columns.toSeq.filterNot(_ == "_change_type")
    val missing = key.filterNot(cols.contains)
    require(missing.isEmpty, s"key columns absent from feed: ${missing.mkString(",")}")
    // NULL-keyed rows bypass the keyed fold entirely (Scaladoc above):
    // ab's deletes and bc's inserts pass through verbatim; ab's inserts
    // and bc's deletes (both = B's NULL-keyed rows) cancel by dropping.
    // The passthrough references each input feed a second time (the
    // one plan shape that can't be expressed single-pass: cancellation
    // is a multiset match between ab's inserts and bc's deletes), so
    // it is built ONLY when some key column is schema-nullable —
    // provably NULL-free keys keep the single-reference plan
    // (PlanShapeSpec's snapshot guard watches the join count).
    val keysNullable = key.exists(k =>
      ab.schema(ab.schema.fieldIndex(k)).nullable ||
        bc.schema(bc.schema.fieldIndex(k)).nullable)
    val nullKeyed = key.map(col(_).isNull).reduce(_ || _)
    if (strict && keysNullable) {
      // the NULL-keyed cancellation is exact only on a consecutive
      // chain: ab's inserted NULL-keyed rows must BE bc's deleted ones
      // (same multiset). Feed-sized: NULL-keyed rows only.
      val abIns = ab.filter(nullKeyed &&
        col("_change_type").isin("insert", "update_postimage")).drop("_change_type")
      val bcDel = bc.filter(nullKeyed &&
        col("_change_type").isin("delete", "update_preimage")).drop("_change_type")
      val odd = abIns.exceptAll(bcDel).limit(1).collect() ++
        bcDel.exceptAll(abIns).limit(1).collect()
      require(odd.isEmpty,
        s"feeds are not consecutive: NULL-keyed row " +
          s"(${odd.head.toSeq.mkString(",")}) appears in only one feed's " +
          "B-side — ab's to-side is not bc's from-side")
    }
    // fold each feed to one (from-image, to-image) pair per key: the
    // preimage/delete row is the key's state BEFORE the feed, the
    // postimage/insert row its state AFTER; max() picks the single
    // non-null struct (a valid feed has at most one of each per key)
    def fold(feed: DataFrame): DataFrame =
      (if (keysNullable) feed.filter(!nullKeyed) else feed)
        .groupBy(key.map(col): _*).agg(
        max(when(col("_change_type").isin("delete", "update_preimage"),
          struct(cols.map(col): _*))).as("from_img"),
        max(when(col("_change_type").isin("insert", "update_postimage"),
          struct(cols.map(col): _*))).as("to_img"))
        .withColumn("_cf_present", lit(true))
    val a = fold(ab).as("a")
    val c = fold(bc).as("c")
    val joinCond = key.map(k => col(s"a.$k") <=> col(s"c.$k")).reduce(_ && _)
    if (strict) {
      // consecutiveness on keyed rows: for every key in BOTH folds,
      // ab's post-state must null-safely equal bc's pre-state (a key
      // in only one fold asserts nothing about the other feed's B
      // side). One extra fold-sized inner join, opt-in only.
      val mis = a.join(c, joinCond, "inner")
        .filter(!(col("a.to_img") <=> col("c.from_img")))
        .select(key.map(k => col(s"a.$k")): _*).limit(1).collect()
      require(mis.isEmpty,
        s"feeds are not consecutive: key " +
          s"(${mis.headOption.map(_.toSeq.mkString(",")).getOrElse("")}) " +
          "leaves ab in a state bc does not start from")
    }
    val aPresent = col("a._cf_present").isNotNull
    val cPresent = col("c._cf_present").isNotNull
    // net from-image: the key's state before A→B if the key appears
    // there (NULL = born in A→B), else its state before B→C; net
    // to-image symmetrically from the later feed first
    val fromNet = when(aPresent, col("a.from_img")).otherwise(col("c.from_img"))
    val toNet = when(cPresent, col("c.to_img")).otherwise(col("a.to_img"))
    def row(img: Column, changeType: String): Column =
      struct(cols.map(n => img.getField(n).as(n)) :+
        lit(changeType).as("_change_type"): _*)
    val keyed = a.join(c, joinCond, "full_outer")
      .select(fromNet.as("f"), toNet.as("t"))
      // born-then-died (both null) and changed-then-reverted (equal)
      // produce NO net change — exactly diff(a, c)'s verdict
      .filter(!(col("f") <=> col("t")))
      .select(explode(
        when(col("f").isNull, array(row(col("t"), "insert")))
          .when(col("t").isNull, array(row(col("f"), "delete")))
          .otherwise(array(row(col("f"), "update_preimage"),
            row(col("t"), "update_postimage")))).as("_r"))
      .select(col("_r.*"))
    if (!keysNullable) keyed
    // the NULL-keyed passthrough (see Scaladoc): A's NULL-keyed rows
    // stay deletes, C's stay inserts, B's cancel
    else keyed
      .unionByName(ab.filter(nullKeyed &&
        col("_change_type").isin("delete", "update_preimage")))
      .unionByName(bc.filter(nullKeyed &&
        col("_change_type").isin("insert", "update_postimage")))
  }

  /** Fold a CHAIN of consecutive feeds into the net feed — [[compose]]
    * applied as a LOG-DEPTH TREE rather than a left-nested reduce. A
    * left fold of N feeds builds an N-deep plan (each compose is two
    * keyed folds + a full-outer merge), and Catalyst's analysis time
    * and driver memory grow superlinearly with plan depth — a consumer
    * catching up after thousands of batches would compile a
    * multi-thousand-stage lineage before running anything. The tree
    * keeps depth at ⌈log₂ N⌉, and every `checkpointEvery` levels each
    * intermediate is materialized via `localCheckpoint` (lineage
    * truncated to a block-manager scan), so the ANALYZED plan between
    * materializations stays ≤ 2^checkpointEvery leaves regardless of N.
    *
    * `strict` forwards to every pairwise [[compose]]: each tree seam is
    * verified where verification is possible — a key is checked at a
    * seam iff it carries net changes on BOTH sides (a key silent on
    * either side asserts nothing about that side's B-state; this
    * partial coverage is inherent to any feed-only check, left fold or
    * tree alike). A violated seam fails loudly at the level that joins
    * it.
    *
    * `materialize` is the lineage-truncation primitive. The default,
    * `localCheckpoint(true)`, stores blocks in EXECUTOR memory/disk
    * with NO recompute path — right for a single-JVM or
    * static-allocation run, but on a cluster with executor loss or
    * dynamic deallocation a lost block permanently fails the catch-up
    * mid-tree (the r16 ADVICE hazard). Cluster runs should pass a
    * RELIABLE materializer instead — `_.checkpoint(true)` with a
    * checkpoint dir set, or a write-then-read through the job's
    * scratch storage; any identity-preserving function works. */
  def composeAll(feeds: Seq[DataFrame], key: Seq[String],
                 strict: Boolean = false,
                 checkpointEvery: Int = 4,
                 materialize: DataFrame => DataFrame =
                   _.localCheckpoint(true)): DataFrame = {
    require(feeds.nonEmpty, "no feeds")
    require(checkpointEvery > 0, s"checkpointEvery must be positive: $checkpointEvery")
    var level = feeds.toVector
    var depth = 0
    while (level.size > 1) {
      level = level.grouped(2).map {
        case Vector(x, y) => compose(x, y, key, strict)
        case Vector(x) => x
        case _ => throw new IllegalStateException("grouped(2) invariant")
      }.toVector
      depth += 1
      // truncate lineage while more levels remain; the LAST level is
      // left lazy so the caller controls its materialization (persist,
      // write, further composition)
      if (depth % checkpointEvery == 0 && level.size > 1)
        level = level.map(materialize)
    }
    level.head
  }

  /** APPLY a feed: replay the row-level changes onto the snapshot they
    * were diffed FROM, reconstructing the snapshot they lead TO — the
    * inverse leg of the CDC algebra ([[diff]] produces a feed,
    * [[compose]] folds feeds, [[IncrementalAgg.maintain]] consumes one
    * into an aggregate; `applyTo` consumes one into the TABLE itself).
    * Identity (differential-tested on random version chains):
    * `applyTo(a, diff(a, b, k), k)` is row-for-row `b`, and composing
    * before applying changes nothing:
    * `applyTo(a, compose(f1, f2, k), k) ≡ applyTo(applyTo(a, f1, k), f2, k)`.
    *
    * This is the primitive behind feed-based table REPLICATION: a
    * replica site holding version N needs only the (delta-sized) feed
    * to reach N+1, never the snapshot — see
    * [[IncrementalAgg.ReplicaSpec]] for the published, exactly-once,
    * bucketed-write form. It is also point-in-time RECONSTRUCTION: an
    * old snapshot plus its retained feeds replays any later version,
    * so a retention policy may vacuum intermediate snapshots and keep
    * the (much smaller) feeds.
    *
    * Deletes and update preimages remove their key; inserts and update
    * postimages add their row. Keys match null-safely (`<=>`), so the
    * delete+insert pair [[diff]] emits for a NULL-keyed row replays
    * correctly. Under diff's unique-key contract the anti join removes
    * exactly the feed's preimage rows.
    *
    * A feed applied to a base it was NOT diffed from silently merges
    * (a delete for an absent key no-ops — SQL anti-join semantics);
    * callers that cannot trust the pairing pass `strict = true` to
    * fail loudly on the first preimage key absent from the base (one
    * extra feed-vs-base anti join, the same opt-in-verification
    * posture as [[diff]]'s `requireUniqueKey`).
    *
    * Scale: the feed side of the anti join is delta-sized — under AQE
    * it broadcasts and the BASE NEVER SHUFFLES; the postimage union is
    * map-side. Work ∝ base scan + delta, the replication floor.
    * Plan-PINNED, not just asserted: PlanShapeSpec's "applyTo
    * broadcasts the feed side" gate fails on any SMJ or key Exchange
    * in a representative parquet-base apply. */
  def applyTo(base: DataFrame, feed: DataFrame, key: Seq[String],
              strict: Boolean = false): DataFrame = {
    require(feed.columns.contains("_change_type"),
      "applyTo feed must be a ChangeFeed.diff output (missing _change_type)")
    val cols = feed.columns.toSeq.filterNot(_ == "_change_type")
    require(base.columns.sorted.sameElements(cols.sorted),
      s"schema mismatch: base=${base.columns.sorted.mkString(",")} " +
        s"feed=${cols.sorted.mkString(",")}")
    val missing = key.filterNot(cols.contains)
    require(missing.isEmpty, s"key columns absent from feed: ${missing.mkString(",")}")
    val removes = feed
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select(key.map(col): _*)
    val b = base.as("b")
    val r = removes.as("r")
    val joinCond = key.map(k => col(s"b.$k") <=> col(s"r.$k")).reduce(_ && _)
    if (strict) {
      val orphan = r.join(b, joinCond, "left_anti").limit(1).collect()
      require(orphan.isEmpty,
        s"feed does not correspond to this base: preimage key " +
          s"(${orphan.headOption.map(_.toSeq.mkString(",")).getOrElse("")}) " +
          "is absent from the base")
    }
    val adds = feed
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(base.columns.toSeq.map(col): _*)
    b.join(r, joinCond, "left_anti").unionByName(adds)
  }

  /** [[diff]] between two RETAINED versions of a published table, read
    * through [[AtomicPublish.snapshotAt]] — throws if either version was
    * vacuumed or never committed. `fromVersion` is the older side. */
  def between(spark: SparkSession, root: String, table: String,
              fromVersion: Long, toVersion: Long, key: Seq[String]): DataFrame =
    diff(
      AtomicPublish.snapshotAt(spark, root, fromVersion).table(spark, table),
      AtomicPublish.snapshotAt(spark, root, toVersion).table(spark, table),
      key)
}
