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
  }
}
