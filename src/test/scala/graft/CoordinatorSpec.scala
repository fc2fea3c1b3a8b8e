package graft

import org.apache.spark.sql.functions._
import graft.etl.{AtomicPublish, ChangeFeed, Coordinator, IncrementalAgg}

/** [[graft.etl.Coordinator]] — cross-store consistent cuts. Two member
  * stores (an aggregate view and a replica — the primitive is
  * store-shape-agnostic; any AtomicPublish root qualifies, including
  * the ANN index) advance through their own exactly-once commits; the
  * coordinator's committed cut is what readers resolve, so a batch
  * that died between member commits is invisible rather than mixed,
  * and recovery is self-healing through the members' ledgers. */
class CoordinatorSpec extends SparkSuite {
  import spark.implicits._

  test("a reader through the cut never observes stores at different " +
    "batches: a half-committed batch stays invisible, recovery heals it, " +
    "cut time travel pairs historical versions, racing cuts conflict") {
    val base = "/root/repo/target/test-sink/coord"
    Seq("wh", "idx", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val whRoot = s"$base/wh"; val idxRoot = s"$base/idx"; val cutRoot = s"$base/cut"
    def df(rows: Seq[(Int, String, Double)]) = rows.toDF("id", "g", "x")
    val v0 = (0 until 32).map(i => (i, s"g${i % 4}", i * 1.0))
    val v1 = v0.map { case (i, g, x) => if (i == 5) (i, g, 500.0) else (i, g, x) }
      .filterNot(_._1 == 9)
    val grp = Seq("g"); val sums = Seq("total" -> "x")
    val idxTargets = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("id"),
      numBuckets = 4))
    // seed both members, then commit the seed cut
    IncrementalAgg.publishInitial(spark, whRoot, df(v0), grp, sums, numBuckets = 4)
    IncrementalAgg.publishInitialMulti(spark, idxRoot, df(v0), idxTargets)
    val cutV0 = Coordinator.commitCut(spark, cutRoot,
      Map("wh" -> 0L, "idx" -> 0L))
    assert(cutV0 === 0L)

    def readThroughCut(): (Set[Seq[Any]], Set[Seq[Any]]) = {
      // resolve the cut ONCE, pin every member read to it — the
      // production read discipline this primitive exists for
      val cut = Coordinator.currentCut(spark, cutRoot)
      (IncrementalAgg.readState(spark, whRoot, Some(cut("wh")))
        .collect().map(_.toSeq).toSet,
        IncrementalAgg.readView(spark, idxRoot, "replica", Some(cut("idx")))
          .collect().map(_.toSeq).toSet)
    }
    def agg(rows: Seq[(Int, String, Double)]) =
      IncrementalAgg.aggregate(df(rows), grp, sums).collect().map(_.toSeq).toSet
    def tbl(rows: Seq[(Int, String, Double)]) =
      df(rows).collect().map(_.toSeq).toSet

    // BATCH 1 CRASHES HALFWAY: the warehouse advances, the index and
    // the cut do not. An independent reader of whRoot would now see
    // wh@1 beside idx@0 — the mixed read the coordinator forbids.
    val feed = ChangeFeed.diff(df(v0), df(v1), Seq("id"))
    assert(IncrementalAgg.applyOnce(spark, whRoot, feed, 1L, grp, sums))
    val (whSeen, idxSeen) = readThroughCut()
    assert(whSeen === agg(v0) && idxSeen === tbl(v0),
      "a half-committed batch must be INVISIBLE through the cut, not mixed")

    // RECOVERY: re-run the whole batch. The warehouse replay no-ops
    // through its own ledger, the index advances, and the cut lands —
    // the member-level exactly-once is what makes coordinator recovery
    // a plain re-run.
    assert(!IncrementalAgg.applyOnce(spark, whRoot, feed, 1L, grp, sums))
    assert(IncrementalAgg.applyOnceMulti(spark, idxRoot, feed, 1L, idxTargets))
    val cutV1 = Coordinator.commitCut(spark, cutRoot,
      Map("wh" -> 1L, "idx" -> 1L))
    assert(cutV1 === 1L)
    val (whNow, idxNow) = readThroughCut()
    assert(whNow === agg(v1) && idxNow === tbl(v1),
      "after recovery the cut serves BOTH members at the new batch")

    // cut time travel: the retained coordinator version pairs the
    // HISTORICAL member versions — one consistent cross-store as-of
    val cut0 = Coordinator.cutAt(spark, cutRoot, 0L)
    assert(cut0 === Map("wh" -> 0L, "idx" -> 0L))
    assert(IncrementalAgg.readState(spark, whRoot, Some(cut0("wh")))
      .collect().map(_.toSeq).toSet === agg(v0))

    // racing coordinators: a cut staged against the superseded base
    // surfaces as a publish conflict, never a silently lost cut
    intercept[java.util.ConcurrentModificationException] {
      Coordinator.commitCut(spark, cutRoot, Map("wh" -> 1L, "idx" -> 1L),
        expectedBase = Some(Some(0L)))
    }
    assert(Coordinator.currentCut(spark, cutRoot)
      === Map("wh" -> 1L, "idx" -> 1L))
    // hygiene
    assertThrows[IllegalArgumentException](
      Coordinator.commitCut(spark, cutRoot, Map.empty))
  }

  test("a REAL ANN index store rides the cut beside the warehouse: one " +
    "doc feed deletes from both, and a reader through the cut can never " +
    "see the warehouse post-delete beside the index pre-delete") {
    import graft.ops.{AnnIndexStore, VectorSearch}
    val base = "/root/repo/target/test-sink/coord_ann"
    Seq("wh", "ann", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val whRoot = s"$base/wh"; val annRoot = s"$base/ann"; val cutRoot = s"$base/cut"
    val emb = Tables.embeddings(spark, sf)
    val docs = emb.select(col("vec_id"), col("label"))
    // warehouse: a replica of the doc metadata; ANN: the served index
    val whT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("vec_id"),
      numBuckets = 4))
    IncrementalAgg.publishInitialMulti(spark, whRoot, docs, whT)
    val ivf = VectorSearch.ivfTrain(spark, emb, "vec_id", "embedding", 8, 2)
    val model = VectorSearch.ivfPqTrain(spark, ivf,
      emb.filter(col("vec_id") >= 40 && col("vec_id") < 72),
      "vec_id", "embedding", nSub = 16)
    AnnIndexStore.publish(spark, annRoot, model,
      VectorSearch.ivfPqEncode(model, emb, "vec_id", "embedding"))
    Coordinator.commitCut(spark, cutRoot, Map(
      "wh" -> AtomicPublish.currentVersion(spark, whRoot).get,
      "ann" -> AtomicPublish.currentVersion(spark, annRoot).get))
    val deadRule = col("vec_id") % 7 === 3
    def servedIds(version: Long): Set[Long] = {
      val (m, index) = AnnIndexStore.load(spark, annRoot, Some(version))
      VectorSearch.ivfPqServe(m, index, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, nprobe = 3)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    // THE BATCH: one doc feed (deletions) reaches warehouse AND index
    val feed = graft.etl.ChangeFeed.diff(docs, docs.filter(!deadRule),
      Seq("vec_id"))
    assert(IncrementalAgg.applyOnceMulti(spark, whRoot, feed, 0L, whT))
    // crash window: warehouse advanced, index/cut did not — a cut
    // reader still serves the PRE-delete pair (deleted ids visible in
    // BOTH the metadata replica and the index — consistent)
    val cutPre = Coordinator.currentCut(spark, cutRoot)
    assert(IncrementalAgg.readView(spark, whRoot, "replica",
      Some(cutPre("wh"))).filter(deadRule).count() > 0,
      "the cut must still serve the pre-delete warehouse")
    assert(servedIds(cutPre("ann")).exists(_ % 7 == 3),
      "the cut must still serve the pre-delete index")
    // recovery completes the batch: tombstone the index, land the cut
    AnnIndexStore.applyDeletes(spark, annRoot,
      feed.filter(col("_change_type") === "delete").select("vec_id"),
      "vec_id", tombstoneId = Some("ts-cut-0"))
    Coordinator.commitCut(spark, cutRoot, Map(
      "wh" -> AtomicPublish.currentVersion(spark, whRoot).get,
      "ann" -> AtomicPublish.currentVersion(spark, annRoot).get))
    val cut = Coordinator.currentCut(spark, cutRoot)
    assert(IncrementalAgg.readView(spark, whRoot, "replica",
      Some(cut("wh"))).filter(deadRule).count() === 0L)
    assert(!servedIds(cut("ann")).exists(_ % 7 == 3),
      "post-cut, the index must hide exactly what the warehouse dropped")
    // the cut-aware vacuum is store-shape-agnostic: the ANN store is a
    // plain AtomicPublish root, so vacuumMember protects its versions
    // exactly as it does a warehouse's — both cuts retained, keep=1
    // deletes nothing, and the PRE-delete index version still SERVES
    assert(Coordinator.vacuumMember(spark, cutRoot, "ann", annRoot,
      keep = 1) === Nil,
      "both retained cuts reference an ann version — nothing may go")
    val cut0 = Coordinator.cutAt(spark, cutRoot, 0L)
    assert(servedIds(cut0("ann")).exists(_ % 7 == 3),
      "the retained pre-delete cut must still serve through the index")
    // prune the coordinator to the newest cut; now the old index
    // version is unreferenced and goes, while the serving one survives
    AtomicPublish.vacuum(spark, cutRoot, keep = 1)
    assert(Coordinator.vacuumMember(spark, cutRoot, "ann", annRoot,
      keep = 1) === Seq(cut0("ann")))
    assert(!servedIds(cut("ann")).exists(_ % 7 == 3),
      "the current cut's index version must survive the member vacuum")
  }

  test("cut-aware member vacuum: versions any RETAINED cut references " +
    "survive keep=1, pruning the coordinator first shrinks the " +
    "protected set, and the raw-vacuum hazard the helper closes is " +
    "pinned") {
    val base = "/root/repo/target/test-sink/coord_vac"
    Seq("wh", "wh2", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val whRoot = s"$base/wh"; val wh2Root = s"$base/wh2"
    val cutRoot = s"$base/cut"
    def df(rows: Seq[(Int, String, Double)]) = rows.toDF("id", "g", "x")
    val grp = Seq("g"); val sums = Seq("total" -> "x")
    var cur = (0 until 24).map(i => (i, s"g${i % 3}", i * 1.0))
    IncrementalAgg.publishInitial(spark, whRoot, df(cur), grp, sums,
      numBuckets = 4)
    IncrementalAgg.publishInitial(spark, wh2Root, df(cur), grp, sums,
      numBuckets = 4)
    Coordinator.commitCut(spark, cutRoot, Map("wh" -> 0L, "wh2" -> 0L))
    (1 to 3).foreach { b =>
      val next = cur.filterNot(_._1 == b).map { case (i, g, x) =>
        if (i % 5 == b % 5) (i, g, x + 10.0) else (i, g, x) }
      val feed = ChangeFeed.diff(df(cur), df(next), Seq("id"))
      assert(IncrementalAgg.applyOnce(spark, whRoot, feed, b.toLong, grp, sums))
      assert(IncrementalAgg.applyOnce(spark, wh2Root, feed, b.toLong, grp, sums))
      Coordinator.commitCut(spark, cutRoot,
        Map("wh" -> b.toLong, "wh2" -> b.toLong))
      cur = next
    }
    // all four coordinator versions retained → every member version is
    // referenced, so a keep=1 member vacuum may delete NOTHING
    assert(AtomicPublish.liveVersions(spark, cutRoot) === Seq(0L, 1L, 2L, 3L))
    assert(Coordinator.referencedVersions(spark, cutRoot, "wh")
      === Set(0L, 1L, 2L, 3L))
    assert(Coordinator.vacuumMember(spark, cutRoot, "wh", whRoot,
      keep = 1) === Nil)
    (0L to 3L).foreach { v =>
      val c = Coordinator.cutAt(spark, cutRoot, v)
      assert(IncrementalAgg.readState(spark, whRoot, Some(c("wh")))
        .count() > 0, s"cut $v must stay resolvable end-to-end")
    }
    // THE HAZARD the helper closes: a raw member vacuum ignores the
    // cuts — it deletes wh2@0..1 although retained cuts name them, and
    // the reader through cut 0 then fails loudly AFTER the data is gone
    assert(AtomicPublish.vacuum(spark, wh2Root, keep = 1) === Seq(0L, 1L, 2L))
    val c0 = Coordinator.cutAt(spark, cutRoot, 0L)
    intercept[Exception] {
      IncrementalAgg.readState(spark, wh2Root, Some(c0("wh2"))).count()
    }
    // prune the COORDINATOR first (its own vacuum), then the member:
    // the protected set shrinks to what the retained cuts still name
    assert(AtomicPublish.vacuum(spark, cutRoot, keep = 2) === Seq(0L, 1L))
    assert(Coordinator.referencedVersions(spark, cutRoot, "wh")
      === Set(2L, 3L))
    assert(Coordinator.vacuumMember(spark, cutRoot, "wh", whRoot,
      keep = 1) === Seq(0L, 1L))
    // every still-retained cut resolves end-to-end; the pruned version
    // is genuinely gone
    (2L to 3L).foreach { v =>
      val c = Coordinator.cutAt(spark, cutRoot, v)
      assert(IncrementalAgg.readState(spark, whRoot, Some(c("wh")))
        .count() > 0)
    }
    assertThrows[IllegalArgumentException](
      AtomicPublish.snapshotAt(spark, whRoot, 0L))
  }

  test("advanceMembers: independent member stores commit CONCURRENTLY " +
    "with the serial protocol's semantics — same results, duplicate " +
    "roots rejected, a failing member leaves the others committed but " +
    "the cut untaken, and a plain re-run heals") {
    val base = "/root/repo/target/test-sink/coord_par"
    Seq("m1", "m2", "m3", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val m1 = s"$base/m1"; val m2 = s"$base/m2"; val m3 = s"$base/m3"
    val cutRoot = s"$base/cut"
    def df(rows: Seq[(Int, String, Double)]) = rows.toDF("id", "g", "x")
    val v0 = (0 until 40).map(i => (i, s"g${i % 5}", i * 1.0))
    val v1 = v0.filterNot(_._1 % 9 == 2).map { case (i, g, x) =>
      if (i % 4 == 1) (i, g, x * 2) else (i, g, x) }
    val aggT = Seq(IncrementalAgg.ViewSpec("agg", Seq("g"),
      Seq("total" -> "x"), numBuckets = 4))
    val repT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("id"),
      numBuckets = 4))
    Seq(m1, m2, m3).foreach(r =>
      IncrementalAgg.publishInitialMulti(spark, r,
        df(v0), if (r == m1) aggT else repT))
    Coordinator.commitCut(spark, cutRoot,
      Map("m1" -> 0L, "m2" -> 0L, "m3" -> 0L))
    val feed = ChangeFeed.diff(df(v0), df(v1), Seq("id")).persist()
    // duplicate roots are a caller bug, not a race to discover later
    assertThrows[IllegalArgumentException](
      Coordinator.advanceMembers(spark, 1L, Seq(
        Coordinator.MemberAdvance(m1, feed, aggT),
        Coordinator.MemberAdvance(m1, feed, aggT))))
    // a failing member (its feed lacks the replica's columns) throws
    // AFTER all members settle; the good members committed, the cut
    // was never taken — readers stay on the consistent old cut
    intercept[Exception] {
      Coordinator.advanceMembers(spark, 1L, Seq(
        Coordinator.MemberAdvance(m1, feed, aggT),
        Coordinator.MemberAdvance(m2, feed, repT),
        Coordinator.MemberAdvance(m3,
          feed.select("id", "_change_type"), repT)))
    }
    assert(Coordinator.currentCut(spark, cutRoot)
      === Map("m1" -> 0L, "m2" -> 0L, "m3" -> 0L),
      "the cut must stay at the pre-batch snapshot after a member failure")
    // recovery IS a re-run: committed members no-op via their ledgers
    // (false), the failed one applies (true), the cut lands
    val healed = Coordinator.advanceMembers(spark, 1L, Seq(
      Coordinator.MemberAdvance(m1, feed, aggT),
      Coordinator.MemberAdvance(m2, feed, repT),
      Coordinator.MemberAdvance(m3, feed, repT)))
    assert(healed === Seq(false, false, true),
      s"re-run must heal exactly the failed member, got $healed")
    feed.unpersist()
    Coordinator.commitCut(spark, cutRoot,
      Map("m1" -> 1L, "m2" -> 1L, "m3" -> 1L))
    val cut = Coordinator.currentCut(spark, cutRoot)
    assert(IncrementalAgg.readView(spark, m1, "agg", Some(cut("m1")))
      .collect().map(_.toSeq).toSet ===
      IncrementalAgg.aggregate(df(v1), Seq("g"), Seq("total" -> "x"))
        .collect().map(_.toSeq).toSet,
      "the concurrently-advanced aggregate must equal the direct recompute")
    Seq("m2" -> m2, "m3" -> m3).foreach { case (n, r) =>
      assert(IncrementalAgg.readView(spark, r, "replica", Some(cut(n)))
        .collect().map(_.toSeq).toSet === df(v1).collect().map(_.toSeq).toSet,
        s"replica $n diverged under the concurrent advance")
    }
  }
}
