package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.{AtomicPublish, ChangeFeed, Coordinator, IncrementalAgg, JoinView}

/** [[graft.etl.JoinView]] — incremental equi-join maintenance. The
  * six-term delta algebra is pinned on constructed edges (every term
  * populated, including the both-sides-changed cell), then end-to-end
  * across three coordinated stores with bucket-pruned base reads, then
  * differentially on random chains. */
class JoinMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def dfA(rows: Seq[(Int, Option[Int], String)]): DataFrame =
    rows.toDF("aid", "cust", "av")
  private def dfB(rows: Seq[(Int, String)]): DataFrame =
    rows.toDF("bid", "bval")
  private def direct(a: Seq[(Int, Option[Int], String)],
                     b: Seq[(Int, String)]): Set[Seq[Any]] =
    dfA(a).join(dfB(b), col("cust") === col("bid"), "inner")
      .collect().map(_.toSeq).toSet

  test("joinDelta: every term of the six-term algebra lands once — " +
    "applying the view feed to the pre-view reconstructs the post join") {
    val a0 = Seq((1, Some(10), "x"), (2, Some(10), "y"), (3, Some(20), "z"),
      (4, Some(30), "w"), (5, None, "n"))
    val b0 = Seq((10, "ten"), (20, "twenty"), (40, "forty"))
    // ΔA: delete a3 (pairs with deleted b20 — the ΔA⁻⋈ΔB⁻ cell),
    // update a1 (pairs with updated b10 — ΔA±⋈ΔB±), insert a6→b40
    // (ΔA⁺⋈B_keep), insert a7→b50 (ΔA⁺⋈ΔB⁺)
    val a1 = Seq((1, Some(10), "X!"), (2, Some(10), "y"),
      (4, Some(30), "w"), (5, None, "n"), (6, Some(40), "q"),
      (7, Some(50), "r"))
    // ΔB: update b10 (a2's pair rides A_keep⋈ΔB±), delete b20,
    // insert b50
    val b1 = Seq((10, "TEN!"), (40, "forty"), (50, "fifty"))
    val feedA = ChangeFeed.diff(dfA(a0), dfA(a1), Seq("aid"))
    val feedB = ChangeFeed.diff(dfB(b0), dfB(b1), Seq("bid"))
    val viewFeed = JoinView.joinDelta(spark, dfA(a0), dfB(b0),
      feedA, feedB, Seq("cust" -> "bid"))
    // disjointness: no (pair, change_type) lands twice
    val dup = viewFeed.groupBy("aid", "bid", "_change_type")
      .count().filter(col("count") > 1).collect()
    assert(dup.isEmpty, s"a pair landed in two terms: ${dup.mkString(",")}")
    val viewPre = dfA(a0).join(dfB(b0), col("cust") === col("bid"), "inner")
    val replayed = ChangeFeed.applyTo(viewPre, viewFeed, Seq("aid", "bid"),
      strict = true)
      .collect().map(_.toSeq).toSet
    assert(replayed === direct(a1, b1),
      "view feed applied to the pre-view must equal the post join")
    // empty one side: a B-only batch still maintains
    val b2 = Seq((10, "TEN!"), (40, "FORTY!"), (50, "fifty"))
    val emptyA = ChangeFeed.diff(dfA(a1), dfA(a1), Seq("aid"))
    val f2 = JoinView.joinDelta(spark, dfA(a1), dfB(b1),
      emptyA, ChangeFeed.diff(dfB(b1), dfB(b2), Seq("bid")),
      Seq("cust" -> "bid"))
    assert(ChangeFeed.applyTo(
      dfA(a1).join(dfB(b1), col("cust") === col("bid"), "inner"),
      f2, Seq("aid", "bid"), strict = true)
      .collect().map(_.toSeq).toSet === direct(a1, b2))
    // hygiene: clashing side columns, non-feed input
    assertThrows[IllegalArgumentException](JoinView.joinDelta(spark,
      dfA(a0), dfA(a1), feedA, feedA, Seq("cust" -> "cust")))
    assertThrows[IllegalArgumentException](JoinView.joinDelta(spark,
      dfA(a0), dfB(b0), dfA(a0), feedB, Seq("cust" -> "bid")))
  }

  test("maintained join view across three coordinated stores: " +
    "bucket-pruned base reads, exactly-once per store, one cut per " +
    "batch, random chains equal the direct join") {
    val base = "/root/repo/target/test-sink/joinview"
    Seq("a", "b", "v", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"
    val vRoot = s"$base/v"; val cutRoot = s"$base/cut"
    // A bucketed on its JOIN column (not its key) — the round's
    // subset-bucketing is what makes the A_keep ⋈ ΔB read pruned;
    // B's key IS its join column, so its default layout already prunes
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 8, bucketOn = Seq("cust")))
    val bT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("bid"),
      numBuckets = 8))
    val vT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid"),
      numBuckets = 8))
    val rnd = new scala.util.Random(23)
    var aCur = (0 until 80).map(i => (i,
      if (i % 11 == 3) None: Option[Int] else Some(rnd.nextInt(12)),
      s"a$i"))
    var bCur = (0 until 12).map(j => (j, s"b$j"))
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, vRoot,
      dfA(aCur).join(dfB(bCur), col("cust") === col("bid"), "inner"), vT)
    Coordinator.commitCut(spark, cutRoot,
      Map("a" -> 0L, "b" -> 0L, "v" -> 0L))
    (0 until 3).foreach { batch =>
      val aNext = aCur.filterNot(_._1 % 9 == batch % 9)
        .map { case (i, c, v) =>
          if (i % 6 == batch % 6) (i, c.map(x => (x + 1) % 12), v + "!")
          else (i, c, v) } ++
        Seq((200 + batch, Some(rnd.nextInt(14)), s"new$batch"))
      val bNext = bCur.filterNot(_._1 == 11 - batch)
        .map { case (j, v) => if (j % 4 == batch % 4) (j, v + "!") else (j, v) } ++
        Seq((12 + batch, s"bnew$batch"))
      val feedA = ChangeFeed.diff(dfA(aCur), dfA(aNext), Seq("aid"))
      val feedB = ChangeFeed.diff(dfB(bCur), dfB(bNext), Seq("bid"))
      val cut = Coordinator.currentCut(spark, cutRoot)
      // the view feed reads BOTH pre-states pinned to the cut, so
      // store-advance order can't race it
      val viewFeed = JoinView.joinDeltaFromStores(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"), cut("a")),
        JoinView.Side(bRoot, "replica", Seq("bid"), cut("b")),
        feedA, feedB).persist()
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, batch, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, vRoot, viewFeed, batch, vT))
      viewFeed.unpersist()
      Coordinator.commitCut(spark, cutRoot, Map(
        "a" -> AtomicPublish.currentVersion(spark, aRoot).get,
        "b" -> AtomicPublish.currentVersion(spark, bRoot).get,
        "v" -> AtomicPublish.currentVersion(spark, vRoot).get))
      val nowCut = Coordinator.currentCut(spark, cutRoot)
      assert(IncrementalAgg.readView(spark, vRoot, "view", Some(nowCut("v")))
        .collect().map(_.toSeq).toSet === direct(aNext, bNext),
        s"maintained join view diverged after batch $batch")
      aCur = aNext; bCur = bNext
    }
    // the pruned base read really prunes: ΔB touches a few join keys,
    // A's replica is cust-bucketed — fewer buckets open than the view
    val someKeys = Seq(3, 7).toDF("cust")
      .select(col("cust").cast("int").as("cust"))
    val pruned = IncrementalAgg.readViewPrunedBy(spark, aRoot, "replica",
      Seq("cust"), someKeys)
    def buckets(d: DataFrame): Set[String] =
      d.inputFiles.flatMap(_.split('/')
        .find(_.startsWith(s"${IncrementalAgg.BucketCol}="))).toSet
    assert(buckets(pruned).size <= 2)
    assert(buckets(IncrementalAgg.readView(spark, aRoot, "replica")).size > 2,
      "the unpruned replica spans more buckets than the pruned read")
    // a mistyped prune key fails loudly instead of pruning wrong
    assertThrows[IllegalArgumentException](
      IncrementalAgg.readViewPrunedBy(spark, aRoot, "replica", Seq("cust"),
        Seq(3L, 7L).toDF("cust")))
  }

  test("left-outer join maintenance: null-extension rows are born and " +
    "die on first-match transitions — constructed edges plus random " +
    "chains against a direct LEFT JOIN recompute") {
    val base = "/root/repo/target/test-sink/joinlo"
    Seq("a", "b", "v").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"; val vRoot = s"$base/v"
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 8, bucketOn = Seq("cust")))
    // B's store co-maintains the per-join-key match COUNT view the
    // outer corrections read — the ir5 df-view pattern, so count and
    // replica can never disagree
    val bT = Seq(
      IncrementalAgg.ReplicaSpec("replica", Seq("bid"), numBuckets = 8),
      IncrementalAgg.ViewSpec("bcnt", Seq("bid"), Nil, numBuckets = 8))
    val vT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid"),
      numBuckets = 8))
    def directLO(a: Seq[(Int, Option[Int], String)],
                 b: Seq[(Int, String)]): Set[Seq[Any]] =
      dfA(a).join(dfB(b), col("cust") === col("bid"), "left_outer")
        .collect().map(_.toSeq).toSet
    // constructed chain: a2 has no match (bid 99 absent — extension
    // row from birth); a5 has a NULL key (extension forever); batch 0
    // deletes b20 while a3 is UNTOUCHED (last-match loss → extension
    // born) and inserts b99 (a2's FIRST match → extension dies);
    // batch 1 re-deletes b99 (a2's extension returns), updates a3's
    // value while it is extended, inserts a6 with no match
    val a0 = Seq((1, Some(10), "x"), (2, Some(99), "nomatch"),
      (3, Some(20), "z"), (5, None, "nullkey"))
    val b0 = Seq((10, "ten"), (20, "twenty"))
    val chains = Seq(
      (a0, b0),
      (a0, Seq((10, "ten"), (99, "ninetynine"))),
      (Seq((1, Some(10), "x"), (2, Some(99), "nomatch"),
        (3, Some(20), "z!"), (5, None, "nullkey"), (6, Some(77), "new")),
        Seq((10, "ten"))))
    var (aCur, bCur) = chains.head
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, vRoot,
      dfA(aCur).join(dfB(bCur), col("cust") === col("bid"), "left_outer"), vT)
    chains.sliding(2).zipWithIndex.foreach { case (Seq((a1, b1), (a2, b2)), i) =>
      val feedA = ChangeFeed.diff(dfA(a1), dfA(a2), Seq("aid"))
      val feedB = ChangeFeed.diff(dfB(b1), dfB(b2), Seq("bid"))
      val outer = JoinView.leftOuterDelta(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"),
          AtomicPublish.currentVersion(spark, aRoot).get),
        JoinView.Side(bRoot, "replica", Seq("bid"),
          AtomicPublish.currentVersion(spark, bRoot).get),
        "bcnt", feedA, feedB).persist()
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, i.toLong, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, i.toLong, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, vRoot, outer, i.toLong, vT))
      outer.unpersist()
      assert(IncrementalAgg.readView(spark, vRoot, "view")
        .collect().map(_.toSeq).toSet === directLO(a2, b2),
        s"left-outer view diverged after constructed batch $i")
      aCur = a2; bCur = b2
    }
    // random chains: keys land on few join values so first/last-match
    // transitions happen constantly; every batch's maintained view must
    // equal the direct LEFT JOIN
    val rnd = new scala.util.Random(41)
    var aR = (0 until 50).map(i => (i,
      if (i % 9 == 4) None: Option[Int] else Some(rnd.nextInt(8)), s"a$i"))
    var bR = (0 until 5).map(j => (j, s"b$j")) // keys 5..7 unmatched
    Seq("a2", "b2", "v2").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot2 = s"$base/a2"; val bRoot2 = s"$base/b2"; val vRoot2 = s"$base/v2"
    IncrementalAgg.publishInitialMulti(spark, aRoot2, dfA(aR), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot2, dfB(bR), bT)
    IncrementalAgg.publishInitialMulti(spark, vRoot2,
      dfA(aR).join(dfB(bR), col("cust") === col("bid"), "left_outer"), vT)
    (0 until 4).foreach { batch =>
      val aNext = aR.filterNot(_._1 % 11 == batch)
        .map { case (i, c, v) =>
          if (i % 6 == batch % 6) (i, c.map(x => (x + 3) % 8), v + "!")
          else (i, c, v) } ++
        Seq((300 + batch, Some(rnd.nextInt(8)), s"n$batch"))
      // B churns its whole key space: inserts/deletes cross the 0-count
      // boundary both ways
      val bNext = bR.filterNot(_._1 == batch % 8)
        .map { case (j, v) => if (j % 3 == batch % 3) (j, v + "!") else (j, v) } ++
        Seq((5 + (batch % 3), s"born$batch"))
      val bn = bNext.groupBy(_._1).map(_._2.head).toIndexedSeq // keys unique
      val feedA = ChangeFeed.diff(dfA(aR), dfA(aNext), Seq("aid"))
      val feedB = ChangeFeed.diff(dfB(bR), dfB(bn), Seq("bid"))
      val outer = JoinView.leftOuterDelta(spark,
        JoinView.Side(aRoot2, "replica", Seq("cust"),
          AtomicPublish.currentVersion(spark, aRoot2).get),
        JoinView.Side(bRoot2, "replica", Seq("bid"),
          AtomicPublish.currentVersion(spark, bRoot2).get),
        "bcnt", feedA, feedB).persist()
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot2, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot2, feedB, batch, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, vRoot2, outer, batch, vT))
      outer.unpersist()
      assert(IncrementalAgg.readView(spark, vRoot2, "view")
        .collect().map(_.toSeq).toSet === directLO(aNext, bn),
        s"left-outer view diverged after random batch $batch")
      aR = aNext; bR = bn
    }
  }

  test("left-outer maintenance with MANY matches per key: counts cross " +
    "2→1→0 and back — only the zero boundary births/kills extensions") {
    // B's join column is NOT its key: several b rows share a join
    // value, so match counts exceed 1 and most B churn must produce NO
    // correction (2→1 keeps the pairs' group matched) — the regime
    // where a naive per-row correction would over-fire
    def dfB3(rows: Seq[(Int, Int, String)]) = rows.toDF("bid", "bjoin", "bval")
    def directLO(a: Seq[(Int, Option[Int], String)],
                 b: Seq[(Int, Int, String)]): Set[Seq[Any]] =
      dfA(a).join(dfB3(b), col("cust") === col("bjoin"), "left_outer")
        .collect().map(_.toSeq).toSet
    val base = "/root/repo/target/test-sink/joinlo_mm"
    Seq("a", "b", "v").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"; val vRoot = s"$base/v"
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 4, bucketOn = Seq("cust")))
    val bT = Seq(
      IncrementalAgg.ReplicaSpec("replica", Seq("bid"), numBuckets = 4,
        bucketOn = Seq("bjoin")),
      IncrementalAgg.ViewSpec("bcnt", Seq("bjoin"), Nil, numBuckets = 4))
    val vT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid"),
      numBuckets = 4))
    val rnd = new scala.util.Random(53)
    var aCur = (0 until 30).map(i => (i,
      if (i % 7 == 2) None: Option[Int] else Some(rnd.nextInt(5)), s"a$i"))
    // join values 0..4, each initially matched by 0-3 b rows
    var bCur = (0 until 8).map(j => (j, j % 5, s"b$j"))
      .filterNot(_._2 == 3) // join value 3 starts UNMATCHED
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB3(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, vRoot,
      dfA(aCur).join(dfB3(bCur), col("cust") === col("bjoin"), "left_outer"),
      vT)
    (0 until 4).foreach { batch =>
      // churn B hard: delete one b row per batch (sometimes the LAST of
      // its join value, sometimes not), move another's join value, and
      // insert one (sometimes into an unmatched value — a first match)
      val bNext = bCur.filterNot(_._1 == batch * 2 % 8)
        .map { case (j, g, v) =>
          if (j == (batch * 3 + 1) % 8) (j, (g + 2) % 5, v) else (j, g, v) } ++
        Seq((20 + batch, (batch + 3) % 5, s"nb$batch"))
      val bn = bNext.groupBy(_._1).map(_._2.head).toIndexedSeq
      val aNext = aCur.map { case (i, c, v) =>
        if (i % 8 == batch) (i, c.map(x => (x + 1) % 5), v) else (i, c, v) }
      val feedA = ChangeFeed.diff(dfA(aCur), dfA(aNext), Seq("aid"))
      val feedB = ChangeFeed.diff(dfB3(bCur), dfB3(bn), Seq("bid"))
      val outer = JoinView.leftOuterDelta(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"),
          AtomicPublish.currentVersion(spark, aRoot).get),
        JoinView.Side(bRoot, "replica", Seq("bjoin"),
          AtomicPublish.currentVersion(spark, bRoot).get),
        "bcnt", feedA, feedB).persist()
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, batch, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, vRoot, outer, batch, vT))
      outer.unpersist()
      assert(IncrementalAgg.readView(spark, vRoot, "view")
        .collect().map(_.toSeq).toSet === directLO(aNext, bn),
        s"many-match outer view diverged after batch $batch")
      aCur = aNext; bCur = bn
    }
  }

  test("semi/anti join maintenance: complementary membership under " +
    "match-count transitions — random chains against direct " +
    "left_semi / left_anti recomputes, plus the partition invariant") {
    // many matches per key (B's join column is not its key), so counts
    // cross 2→1→0 and back — membership must flip ONLY at the zero
    // boundary; NULL-keyed A rows are permanent anti members
    def dfB3(rows: Seq[(Int, Int, String)]) = rows.toDF("bid", "bjoin", "bval")
    def directSemi(a: Seq[(Int, Option[Int], String)],
                   b: Seq[(Int, Int, String)]): Set[Seq[Any]] =
      dfA(a).join(dfB3(b), col("cust") === col("bjoin"), "left_semi")
        .collect().map(_.toSeq).toSet
    def directAnti(a: Seq[(Int, Option[Int], String)],
                   b: Seq[(Int, Int, String)]): Set[Seq[Any]] =
      dfA(a).join(dfB3(b), col("cust") === col("bjoin"), "left_anti")
        .collect().map(_.toSeq).toSet
    val base = "/root/repo/target/test-sink/joinsemi"
    Seq("a", "b", "s", "n").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"
    val sRoot = s"$base/s"; val nRoot = s"$base/n"
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 4, bucketOn = Seq("cust")))
    val bT = Seq(
      IncrementalAgg.ReplicaSpec("replica", Seq("bid"), numBuckets = 4,
        bucketOn = Seq("bjoin")),
      IncrementalAgg.ViewSpec("bcnt", Seq("bjoin"), Nil, numBuckets = 4))
    // both views are A-keyed replicas of A rows — B's VALUES never
    // appear, only its count view decides membership
    val sT = Seq(IncrementalAgg.ReplicaSpec("semi", Seq("aid"),
      numBuckets = 4))
    val nT = Seq(IncrementalAgg.ReplicaSpec("anti", Seq("aid"),
      numBuckets = 4))
    val rnd = new scala.util.Random(67)
    var aCur = (0 until 40).map(i => (i,
      if (i % 9 == 4) None: Option[Int] else Some(rnd.nextInt(5)), s"a$i"))
    var bCur = (0 until 8).map(j => (j, j % 5, s"b$j"))
      .filterNot(_._2 == 3) // join value 3 starts unmatched
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB3(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, sRoot,
      dfA(aCur).join(dfB3(bCur), col("cust") === col("bjoin"), "left_semi"), sT)
    IncrementalAgg.publishInitialMulti(spark, nRoot,
      dfA(aCur).join(dfB3(bCur), col("cust") === col("bjoin"), "left_anti"), nT)
    (0 until 4).foreach { batch =>
      val bNext0 = bCur.filterNot(_._1 == batch * 2 % 8)
        .map { case (j, g, v) =>
          if (j == (batch * 3 + 1) % 8) (j, (g + 2) % 5, v) else (j, g, v) } ++
        Seq((20 + batch, (batch + 3) % 5, s"nb$batch"))
      val bn = bNext0.groupBy(_._1).map(_._2.head).toIndexedSeq
      val aNext = aCur.filterNot(_._1 % 13 == batch)
        .map { case (i, c, v) =>
          if (i % 8 == batch) (i, c.map(x => (x + 1) % 5), v + "!")
          else (i, c, v) } ++
        Seq((100 + batch, if (batch == 2) None else Some(rnd.nextInt(6)),
          s"new$batch"))
      val feedA = ChangeFeed.diff(dfA(aCur), dfA(aNext), Seq("aid"))
      val feedB = ChangeFeed.diff(dfB3(bCur), dfB3(bn), Seq("bid"))
      val aSide = JoinView.Side(aRoot, "replica", Seq("cust"),
        AtomicPublish.currentVersion(spark, aRoot).get)
      val bSide = JoinView.Side(bRoot, "replica", Seq("bjoin"),
        AtomicPublish.currentVersion(spark, bRoot).get)
      // batch 0 exercises the single-form entry points; later batches
      // the shared-Corrections pair (one probe, both complements)
      val (semi0, anti0) =
        if (batch == 0)
          (JoinView.semiDelta(spark, aSide, bSide, "bcnt", feedA, feedB),
            JoinView.antiDelta(spark, aSide, bSide, "bcnt", feedA, feedB))
        else JoinView.semiAntiDeltas(spark, aSide, bSide, "bcnt", feedA, feedB)
      val semi = semi0.persist()
      val anti = anti0.persist()
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, batch, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, sRoot, semi, batch, sT))
      assert(IncrementalAgg.applyOnceMulti(spark, nRoot, anti, batch, nT))
      semi.unpersist(); anti.unpersist()
      val semiNow = IncrementalAgg.readView(spark, sRoot, "semi")
        .collect().map(_.toSeq).toSet
      val antiNow = IncrementalAgg.readView(spark, nRoot, "anti")
        .collect().map(_.toSeq).toSet
      assert(semiNow === directSemi(aNext, bn),
        s"semi view diverged after batch $batch")
      assert(antiNow === directAnti(aNext, bn),
        s"anti view diverged after batch $batch")
      // the two views PARTITION the live A rows — complementary by
      // construction, so their union is A and their intersection empty
      assert((semiNow ++ antiNow) === dfA(aNext).collect().map(_.toSeq).toSet)
      assert(semiNow.intersect(antiNow).isEmpty)
      aCur = aNext; bCur = bn
    }
  }

  test("full-outer join maintenance: null extensions born and die on " +
    "BOTH sides' zero-count transitions — random chains against a " +
    "direct FULL JOIN recompute") {
    def dfB3(rows: Seq[(Int, Int, String)]) = rows.toDF("bid", "bjoin", "bval")
    def directFO(a: Seq[(Int, Option[Int], String)],
                 b: Seq[(Int, Int, String)]): Set[Seq[Any]] =
      dfA(a).join(dfB3(b), col("cust") === col("bjoin"), "full_outer")
        .collect().map(_.toSeq).toSet
    val base = "/root/repo/target/test-sink/joinfo"
    Seq("a", "b", "v").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"; val vRoot = s"$base/v"
    // EACH side co-maintains the count view the OTHER side's
    // extensions read: acnt (A rows per join key) decides B-side
    // extensions, bcnt decides A-side ones
    val aT = Seq(
      IncrementalAgg.ReplicaSpec("replica", Seq("aid"), numBuckets = 4,
        bucketOn = Seq("cust")),
      IncrementalAgg.ViewSpec("acnt", Seq("cust"), Nil, numBuckets = 4))
    val bT = Seq(
      IncrementalAgg.ReplicaSpec("replica", Seq("bid"), numBuckets = 4,
        bucketOn = Seq("bjoin")),
      IncrementalAgg.ViewSpec("bcnt", Seq("bjoin"), Nil, numBuckets = 4))
    val vT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid"),
      numBuckets = 4))
    val rnd = new scala.util.Random(79)
    var aCur = (0 until 30).map(i => (i,
      if (i % 7 == 2) None: Option[Int] else Some(rnd.nextInt(5)), s"a$i"))
    // join value 3 unmatched on the A side initially; B rows with
    // join values no A row holds are B-side extensions from birth
    var bCur = (0 until 9).map(j => (j, j % 6, s"b$j"))
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB3(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, vRoot,
      dfA(aCur).join(dfB3(bCur), col("cust") === col("bjoin"), "full_outer"),
      vT)
    (0 until 4).foreach { batch =>
      val bNext0 = bCur.filterNot(_._1 == batch * 2 % 9)
        .map { case (j, g, v) =>
          if (j == (batch * 3 + 1) % 9) (j, (g + 2) % 6, v) else (j, g, v) } ++
        Seq((20 + batch, (batch + 3) % 6, s"nb$batch"))
      val bn = bNext0.groupBy(_._1).map(_._2.head).toIndexedSeq
      val aNext = aCur.filterNot(_._1 % 11 == batch)
        .map { case (i, c, v) =>
          if (i % 6 == batch % 6) (i, c.map(x => (x + 1) % 5), v + "!")
          else (i, c, v) } ++
        Seq((100 + batch, Some(rnd.nextInt(7)), s"new$batch"))
      val feedA = ChangeFeed.diff(dfA(aCur), dfA(aNext), Seq("aid"))
      val feedB = ChangeFeed.diff(dfB3(bCur), dfB3(bn), Seq("bid"))
      val outer = JoinView.fullOuterDelta(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"),
          AtomicPublish.currentVersion(spark, aRoot).get),
        JoinView.Side(bRoot, "replica", Seq("bjoin"),
          AtomicPublish.currentVersion(spark, bRoot).get),
        "acnt", "bcnt", feedA, feedB).persist()
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, batch, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, vRoot, outer, batch, vT))
      outer.unpersist()
      assert(IncrementalAgg.readView(spark, vRoot, "view")
        .collect().map(_.toSeq).toSet === directFO(aNext, bn),
        s"full-outer view diverged after batch $batch")
      aCur = aNext; bCur = bn
    }
  }

  test("streaming join maintenance: a multiplexed CDC stream (one " +
    "topic, two tables, tagged rows) drives three stores and a " +
    "Coordinator cut per micro-batch — the maintained view tracks the " +
    "live join through the whole drain") {
    import graft.etl.Coordinator
    import graft.streaming.Streams
    val base = "/root/repo/target/test-sink/joinstream"
    Seq("a", "b", "v", "cut", "feeds").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"
    val vRoot = s"$base/v"; val cutRoot = s"$base/cut"
    val feedDir = s"$base/feeds"
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 4, bucketOn = Seq("cust")))
    val bT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("bid"),
      numBuckets = 4))
    val vT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid"),
      numBuckets = 4))
    // 5 versions of each table → 4 multiplexed feed files, each the
    // union of both tables' diffs under one super-schema with a _table
    // tag — the one-topic-many-tables CDC shape a single consumer
    // demultiplexes per micro-batch
    def aState(v: Int): Seq[(Int, Option[Int], String)] =
      (0 until 30).filterNot(_ % 7 == v % 7).map(i => (i,
        if (i % 9 == 4) None: Option[Int] else Some((i + v) % 6),
        s"a$i-${(i + v) % 3}"))
    def bState(v: Int): Seq[(Int, String)] =
      (0 until 6).filterNot(_ == (v * 2) % 7).map(j => (j, s"b$j-${(j * v) % 2}"))
    def mux(fa: DataFrame, fb: DataFrame): DataFrame =
      fa.select(col("aid"), col("cust"), col("av"),
          lit(null).cast("int").as("bid"), lit(null).cast("string").as("bval"),
          col("_change_type"), lit("a").as("_table"))
        .unionByName(fb.select(lit(null).cast("int").as("aid"),
          lit(null).cast("int").as("cust"), lit(null).cast("string").as("av"),
          col("bid"), col("bval"), col("_change_type"), lit("b").as("_table")))
    (0 until 4).foreach { i =>
      mux(ChangeFeed.diff(dfA(aState(i)), dfA(aState(i + 1)), Seq("aid")),
          ChangeFeed.diff(dfB(bState(i)), dfB(bState(i + 1)), Seq("bid")))
        .repartition(1).write.mode("overwrite").parquet(f"$feedDir/f$i%02d")
    }
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aState(0)), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB(bState(0)), bT)
    IncrementalAgg.publishInitialMulti(spark, vRoot,
      dfA(aState(0)).join(dfB(bState(0)), col("cust") === col("bid"), "inner"),
      vT)
    Coordinator.commitCut(spark, cutRoot,
      Map("a" -> 0L, "b" -> 0L, "v" -> 0L))
    val muxSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "aid INT, cust INT, av STRING, bid INT, bval STRING, " +
        "_change_type STRING, _table STRING")
    val stream = spark.readStream.schema(muxSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$feedDir/*")
    var batches = 0
    Streams.runIngest(spark, stream,
      s"${Streams.ephemeralChkRoot}/joinstream") { (batch, batchId) =>
      if (!batch.isEmpty) {
        val fA = batch.filter(col("_table") === "a")
          .select("aid", "cust", "av", "_change_type").persist()
        val fB = batch.filter(col("_table") === "b")
          .select("bid", "bval", "_change_type").persist()
        // the view feed's pre-state reads pin to the LAST cut, so the
        // store advances below cannot race them; a replayed batch
        // no-ops every applyOnceMulti and re-commits an identical cut
        val cut = Coordinator.currentCut(spark, cutRoot)
        val feed1 = JoinView.joinDeltaFromStores(spark,
          JoinView.Side(aRoot, "replica", Seq("cust"), cut("a")),
          JoinView.Side(bRoot, "replica", Seq("bid"), cut("b")),
          fA, fB).persist()
        IncrementalAgg.applyOnceMulti(spark, aRoot, fA, batchId, aT)
        IncrementalAgg.applyOnceMulti(spark, bRoot, fB, batchId, bT)
        IncrementalAgg.applyOnceMulti(spark, vRoot, feed1, batchId, vT)
        Coordinator.commitCut(spark, cutRoot, Map(
          "a" -> AtomicPublish.currentVersion(spark, aRoot).get,
          "b" -> AtomicPublish.currentVersion(spark, bRoot).get,
          "v" -> AtomicPublish.currentVersion(spark, vRoot).get))
        Seq(fA, fB, feed1).foreach(_.unpersist())
        batches += 1
      }
    }
    assert(batches === 4, s"expected 4 micro-batches, saw $batches")
    val cut = Coordinator.currentCut(spark, cutRoot)
    assert(IncrementalAgg.readView(spark, vRoot, "view", Some(cut("v")))
      .collect().map(_.toSeq).toSet === direct(aState(4), bState(4)),
      "streamed join view diverged from the direct join of the final state")
  }

  test("composed join views: a maintained join view is ITSELF a " +
    "maintainable base — two-layer 3-table chains equal the direct " +
    "3-way join, including middle-hop key migrations") {
    // A(aid, cust, av) ⋈ B(bid→nat) ⋈ N(nid, nname): B carries the
    // middle hop (joins A on bid, N on nat); V1 = A⋈B lives in its own
    // store bucketed on nat — the SECOND layer's join column — and its
    // feed (layer 1's six terms) is the aFeed of layer 2
    def dfB2(rows: Seq[(Int, Int, String)]) = rows.toDF("bid", "nat", "bv")
    def dfN(rows: Seq[(Int, String)]) = rows.toDF("nid", "nname")
    def direct3(a: Seq[(Int, Option[Int], String)], b: Seq[(Int, Int, String)],
                n: Seq[(Int, String)]): Set[Seq[Any]] =
      dfA(a).join(dfB2(b), col("cust") === col("bid"), "inner")
        .join(dfN(n), col("nat") === col("nid"), "inner")
        .collect().map(_.toSeq).toSet
    val base = "/root/repo/target/test-sink/join3way"
    Seq("a", "b", "n", "v1", "v2").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"; val nRoot = s"$base/n"
    val v1Root = s"$base/v1"; val v2Root = s"$base/v2"
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 4, bucketOn = Seq("cust")))
    val bT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("bid"),
      numBuckets = 4))
    val nT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("nid"),
      numBuckets = 4))
    val v1T = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid", "bid"),
      numBuckets = 4, bucketOn = Seq("nat")))
    val v2T = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid", "nid"),
      numBuckets = 4))
    val rnd = new scala.util.Random(89)
    var aCur = (0 until 40).map(i => (i,
      if (i % 9 == 4) None: Option[Int] else Some(rnd.nextInt(10)), s"a$i"))
    var bCur = (0 until 10).map(j => (j, j % 4, s"b$j"))
    var nCur = (0 until 4).map(k => (k, s"n$k"))
    def j1(a: Seq[(Int, Option[Int], String)], b: Seq[(Int, Int, String)]) =
      dfA(a).join(dfB2(b), col("cust") === col("bid"), "inner")
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB2(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, nRoot, dfN(nCur), nT)
    IncrementalAgg.publishInitialMulti(spark, v1Root, j1(aCur, bCur), v1T)
    IncrementalAgg.publishInitialMulti(spark, v2Root,
      j1(aCur, bCur).join(dfN(nCur), col("nat") === col("nid"), "inner"), v2T)
    (0 until 3).foreach { batch =>
      val aNext = aCur.filterNot(_._1 % 9 == batch % 9)
        .map { case (i, c, v) =>
          if (i % 6 == batch % 6) (i, c.map(x => (x + 1) % 10), v + "!")
          else (i, c, v) } ++
        Seq((200 + batch, Some(rnd.nextInt(11)), s"new$batch"))
      // the middle hop churns BOTH its keys: bid deletions cascade
      // pairs out of V1, nat moves migrate V1 rows across layer-2
      // buckets (the composed analogue of a customer changing nation)
      val bNext = bCur.filterNot(_._1 == 9 - batch)
        .map { case (j, g, v) =>
          if (j % 5 == batch % 5) (j, (g + 1) % 4, v) else (j, g, v) } ++
        Seq((10 + batch, (batch + 2) % 4, s"bn$batch"))
      val bn = bNext.groupBy(_._1).map(_._2.head).toIndexedSeq
      val nNext = nCur.map { case (k, v) =>
        if (k == batch) (k, v + "-R") else (k, v) }
      val feedA = ChangeFeed.diff(dfA(aCur), dfA(aNext), Seq("aid")).persist()
      val feedB = ChangeFeed.diff(dfB2(bCur), dfB2(bn), Seq("bid")).persist()
      val feedN = ChangeFeed.diff(dfN(nCur), dfN(nNext), Seq("nid")).persist()
      val feed1 = JoinView.joinDeltaFromStores(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"),
          AtomicPublish.currentVersion(spark, aRoot).get),
        JoinView.Side(bRoot, "replica", Seq("bid"),
          AtomicPublish.currentVersion(spark, bRoot).get),
        feedA, feedB).persist()
      val feed2 = JoinView.joinDeltaFromStores(spark,
        JoinView.Side(v1Root, "replica", Seq("nat"),
          AtomicPublish.currentVersion(spark, v1Root).get),
        JoinView.Side(nRoot, "replica", Seq("nid"),
          AtomicPublish.currentVersion(spark, nRoot).get),
        feed1, feedN)
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, batch, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, nRoot, feedN, batch, nT))
      assert(IncrementalAgg.applyOnceMulti(spark, v1Root, feed1, batch, v1T))
      assert(IncrementalAgg.applyOnceMulti(spark, v2Root, feed2, batch, v2T))
      Seq(feedA, feedB, feedN, feed1).foreach(_.unpersist())
      // BOTH layers must track their direct recomputes
      assert(IncrementalAgg.readView(spark, v1Root, "replica")
        .collect().map(_.toSeq).toSet
        === j1(aNext, bn).collect().map(_.toSeq).toSet,
        s"middle view diverged after batch $batch")
      assert(IncrementalAgg.readView(spark, v2Root, "view")
        .collect().map(_.toSeq).toSet === direct3(aNext, bn, nNext),
        s"composed 3-way view diverged after batch $batch")
      aCur = aNext; bCur = bn; nCur = nNext
    }
    // the novel claim of composition, pinned: the MIDDLE VIEW is a
    // prunable base — a ΔN touching one nation key opens only that
    // key's bucket of V1, not the whole |A⋈B| state
    def bucketsOf(d: DataFrame): Set[String] =
      d.inputFiles.flatMap(_.split('/')
        .find(_.startsWith(s"${IncrementalAgg.BucketCol}="))).toSet
    val oneNat = Seq(2).toDF("nat").select(col("nat").cast("int").as("nat"))
    val prunedV1 = IncrementalAgg.readViewPrunedBy(spark, v1Root, "replica",
      Seq("nat"), oneNat)
    assert(bucketsOf(prunedV1).size <= 1,
      "layer-2 read of the middle view must prune to the delta's buckets")
    assert(bucketsOf(IncrementalAgg.readView(spark, v1Root, "replica")).size > 1,
      "the unpruned middle view spans more buckets than the pruned read")
  }

  test("join-view catch-up: a consumer that fell behind replays " +
    "batch-by-batch against version-pinned base reads, or re-seeds " +
    "from the current replicas — both converge to the live join") {
    // join-family feeds cannot compose across batches (each batch's six
    // terms bind to THAT batch's pre-states), so the two catch-up paths
    // SCALE.md names are gated here: the bases advance 3 batches while
    // the view store sleeps, then (a) a replay loop recomputes each
    // batch's view feed from the RETAINED base versions and applies
    // them in order; (b) an independent stale view re-seeds from the
    // bases' current replicas in one join
    val base = "/root/repo/target/test-sink/joincatchup"
    Seq("a", "b", "v", "v2").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"
    val vRoot = s"$base/v"; val v2Root = s"$base/v2"
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 4, bucketOn = Seq("cust")))
    val bT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("bid"),
      numBuckets = 4))
    val vT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid"),
      numBuckets = 4))
    def aState(v: Int): Seq[(Int, Option[Int], String)] =
      (0 until 36).filterNot(_ % 8 == v % 8).map(i => (i,
        if (i % 9 == 4) None: Option[Int] else Some((i + v) % 7),
        s"a$i-${(i * v) % 3}"))
    def bState(v: Int): Seq[(Int, String)] =
      (0 until 7).filterNot(_ == (v * 3) % 8).map(j => (j, s"b$j-${(j + v) % 2}"))
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aState(0)), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB(bState(0)), bT)
    IncrementalAgg.publishInitialMulti(spark, vRoot,
      dfA(aState(0)).join(dfB(bState(0)), col("cust") === col("bid"), "inner"),
      vT)
    // record the base version BEFORE each batch — the replay loop's pin
    val pins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    (0 until 3).foreach { i =>
      pins += ((AtomicPublish.currentVersion(spark, aRoot).get,
        AtomicPublish.currentVersion(spark, bRoot).get))
      val fA = ChangeFeed.diff(dfA(aState(i)), dfA(aState(i + 1)), Seq("aid"))
      val fB = ChangeFeed.diff(dfB(bState(i)), dfB(bState(i + 1)), Seq("bid"))
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, fA, i.toLong, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, fB, i.toLong, bT))
      // the view store SLEEPS — it is now 3 batches behind
    }
    // (a) replay: each lag batch's view feed from the version-pinned
    // pre-states (the table feeds are re-derivable between retained
    // versions — ChangeFeed.between is the production source; the
    // states here are deterministic so diff regenerates them)
    (0 until 3).foreach { i =>
      val (vA, vB) = pins(i)
      val fA = ChangeFeed.diff(dfA(aState(i)), dfA(aState(i + 1)), Seq("aid"))
      val fB = ChangeFeed.diff(dfB(bState(i)), dfB(bState(i + 1)), Seq("bid"))
      val feed = JoinView.joinDeltaFromStores(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"), vA),
        JoinView.Side(bRoot, "replica", Seq("bid"), vB),
        fA, fB)
      assert(IncrementalAgg.applyOnceMulti(spark, vRoot, feed, i.toLong, vT))
    }
    assert(IncrementalAgg.readView(spark, vRoot, "view")
      .collect().map(_.toSeq).toSet === direct(aState(3), bState(3)),
      "replay catch-up diverged from the live join")
    // (b) re-seed: one join of the bases' CURRENT replicas — the same
    // cost as initial seeding, no history needed
    IncrementalAgg.publishInitialMulti(spark, v2Root,
      IncrementalAgg.readView(spark, aRoot, "replica")
        .join(IncrementalAgg.readView(spark, bRoot, "replica"),
          col("cust") === col("bid"), "inner"), vT)
    assert(IncrementalAgg.readView(spark, v2Root, "view")
      .collect().map(_.toSeq).toSet === direct(aState(3), bState(3)),
      "re-seed catch-up diverged from the live join")
  }

  test("aggregate-over-join WITHOUT materializing the join: the view " +
    "feed directly maintains an additive view grouped by the other " +
    "side's column") {
    // The join view's change feed is a ChangeFeed.diff-shaped stream
    // over the PAIR rows, so IncrementalAgg's additive maintenance
    // consumes it as-is: `SELECT bval, count(*), sum-ish FROM A⋈B
    // GROUP BY bval` stays current under both tables' feeds while the
    // join itself is never stored — the composition costs zero new
    // machinery, which is the point of one shared feed algebra.
    val base = "/root/repo/target/test-sink/joinagg"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 4, bucketOn = Seq("cust")))
    val bT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("bid"),
      numBuckets = 4))
    // the DOWNSTREAM store holds ONLY the aggregate — no join replica
    val aggT = Seq(IncrementalAgg.ViewSpec("by_bval", Seq("bval"),
      Seq("n_chars" -> "alen"), numBuckets = 4))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"; val gRoot = s"$base/g"
    var aCur = (0 until 40).map(i => (i, Some(i % 6): Option[Int], s"a$i"))
    var bCur = (0 until 6).map(j => (j, s"b${j % 3}"))
    def withLen(df: DataFrame): DataFrame =
      df.withColumn("alen", length(col("av")).cast("long"))
    def joined(a: Seq[(Int, Option[Int], String)], b: Seq[(Int, String)]) =
      withLen(dfA(a)).join(dfB(b), col("cust") === col("bid"), "inner")
    def expected(a: Seq[(Int, Option[Int], String)], b: Seq[(Int, String)]) =
      IncrementalAgg.aggregate(joined(a, b), Seq("bval"),
        Seq("n_chars" -> "alen")).collect().map(_.toSeq).toSet
    IncrementalAgg.publishInitialMulti(spark, aRoot, withLen(dfA(aCur)), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, gRoot, joined(aCur, bCur), aggT)
    (0 until 3).foreach { batch =>
      val aNext = aCur.filterNot(_._1 % 8 == batch)
        .map { case (i, c, v) =>
          if (i % 5 == batch) (i, c.map(x => (x + 2) % 6), v + "+") else (i, c, v) }
      val bNext = bCur.map { case (j, v) =>
        if (j == batch) (j, s"b${(j + 1) % 3}") else (j, v) }
      val feedA = ChangeFeed.diff(withLen(dfA(aCur)), withLen(dfA(aNext)),
        Seq("aid"))
      val feedB = ChangeFeed.diff(dfB(bCur), dfB(bNext), Seq("bid"))
      val viewFeed = JoinView.joinDeltaFromStores(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"),
          AtomicPublish.currentVersion(spark, aRoot).get),
        JoinView.Side(bRoot, "replica", Seq("bid"),
          AtomicPublish.currentVersion(spark, bRoot).get),
        feedA, feedB).persist()
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, batch, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, gRoot, viewFeed, batch, aggT))
      viewFeed.unpersist()
      assert(IncrementalAgg.readView(spark, gRoot, "by_bval")
        .collect().map(_.toSeq).toSet === expected(aNext, bNext),
        s"join-aggregate diverged after batch $batch")
      aCur = aNext; bCur = bNext
    }
  }

  test("right-outer join maintenance: the swapped leftOuterDelta call " +
    "EXECUTED against direct RIGHT JOIN recomputes — every B row kept, " +
    "A-side extensions born/die on A's count transitions") {
    def dfB3(rows: Seq[(Int, Int, String)]) = rows.toDF("bid", "bjoin", "bval")
    def directRO(a: Seq[(Int, Option[Int], String)],
                 b: Seq[(Int, Int, String)]): Set[Seq[Any]] =
      dfA(a).join(dfB3(b), col("cust") === col("bjoin"), "right_outer")
        .collect().map(_.toSeq).toSet
    val base = "/root/repo/target/test-sink/joinro"
    Seq("a", "b", "v").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"; val vRoot = s"$base/v"
    // A co-maintains acnt (A rows per join key) — the count view the
    // B-side extension decisions read under the swap
    val aT = Seq(
      IncrementalAgg.ReplicaSpec("replica", Seq("aid"), numBuckets = 4,
        bucketOn = Seq("cust")),
      IncrementalAgg.ViewSpec("acnt", Seq("cust"), Nil, numBuckets = 4))
    val bT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("bid"),
      numBuckets = 4, bucketOn = Seq("bjoin")))
    // the view is B ⟕ A under the swap: pair key leads with the kept
    // side, aid NULL on extension rows
    val vT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("bid", "aid"),
      numBuckets = 4))
    val rnd = new scala.util.Random(97)
    var aCur = (0 until 30).map(i => (i,
      if (i % 7 == 2) None: Option[Int] else Some(rnd.nextInt(5)), s"a$i"))
    // join values 0..5 on the B side; value 5 has no A row — a B-side
    // extension from birth — and NULL-keyed A rows never match
    var bCur = (0 until 9).map(j => (j, j % 6, s"b$j"))
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB3(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, vRoot,
      dfA(aCur).join(dfB3(bCur), col("cust") === col("bjoin"), "right_outer"),
      vT)
    (0 until 4).foreach { batch =>
      val bNext0 = bCur.filterNot(_._1 == batch * 2 % 9)
        .map { case (j, g, v) =>
          if (j == (batch * 3 + 1) % 9) (j, (g + 2) % 6, v) else (j, g, v) } ++
        Seq((20 + batch, (batch + 3) % 6, s"nb$batch"))
      val bn = bNext0.groupBy(_._1).map(_._2.head).toIndexedSeq
      // A churn crosses the zero boundary both ways: deletions kill the
      // last A row of some join values (extensions born for UNTOUCHED
      // B rows), inserts/moves give first matches (extensions die)
      val aNext = aCur.filterNot(_._1 % 11 == batch)
        .map { case (i, c, v) =>
          if (i % 6 == batch % 6) (i, c.map(x => (x + 1) % 5), v + "!")
          else (i, c, v) } ++
        Seq((100 + batch, Some(rnd.nextInt(7)), s"new$batch"))
      val feedA = ChangeFeed.diff(dfA(aCur), dfA(aNext), Seq("aid"))
      val feedB = ChangeFeed.diff(dfB3(bCur), dfB3(bn), Seq("bid"))
      val outer = JoinView.rightOuterDelta(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"),
          AtomicPublish.currentVersion(spark, aRoot).get),
        JoinView.Side(bRoot, "replica", Seq("bjoin"),
          AtomicPublish.currentVersion(spark, bRoot).get),
        "acnt", feedA, feedB).persist()
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, batch, bT))
      assert(IncrementalAgg.applyOnceMulti(spark, vRoot, outer, batch, vT))
      outer.unpersist()
      assert(IncrementalAgg.readView(spark, vRoot, "view")
        .collect().map(_.toSeq).toSet === directRO(aNext, bn),
        s"right-outer view diverged after batch $batch")
      aCur = aNext; bCur = bn
    }
  }

  test("familyDeltas: one shared substrate feeds ALL six join forms " +
    "(right-outer costs zero extra probes) — each maintained view " +
    "equals its direct recompute on every batch of a random chain") {
    def dfB3(rows: Seq[(Int, Int, String)]) = rows.toDF("bid", "bjoin", "bval")
    def direct(a: Seq[(Int, Option[Int], String)],
               b: Seq[(Int, Int, String)], how: String): Set[Seq[Any]] =
      dfA(a).join(dfB3(b), col("cust") === col("bjoin"), how)
        .collect().map(_.toSeq).toSet
    val base = "/root/repo/target/test-sink/joinfam"
    Seq("a", "b", "vi", "vl", "vr", "vf", "vs", "vn").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"
    // both count views co-maintained — the family needs acnt (B-side
    // extensions of fullOuter) AND bcnt (everything else)
    val aT = Seq(
      IncrementalAgg.ReplicaSpec("replica", Seq("aid"), numBuckets = 4,
        bucketOn = Seq("cust")),
      IncrementalAgg.ViewSpec("acnt", Seq("cust"), Nil, numBuckets = 4))
    val bT = Seq(
      IncrementalAgg.ReplicaSpec("replica", Seq("bid"), numBuckets = 4,
        bucketOn = Seq("bjoin")),
      IncrementalAgg.ViewSpec("bcnt", Seq("bjoin"), Nil, numBuckets = 4))
    val pairT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid"),
      numBuckets = 4))
    val aKeyT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid"),
      numBuckets = 4))
    val stores = Seq( // (root, targets, join type of the direct oracle)
      (s"$base/vi", pairT, "inner"),
      (s"$base/vl", pairT, "left_outer"),
      (s"$base/vr", pairT, "right_outer"),
      (s"$base/vf", pairT, "full_outer"),
      (s"$base/vs", aKeyT, "left_semi"),
      (s"$base/vn", aKeyT, "left_anti"))
    val rnd = new scala.util.Random(101)
    var aCur = (0 until 30).map(i => (i,
      if (i % 7 == 2) None: Option[Int] else Some(rnd.nextInt(5)), s"a$i"))
    var bCur = (0 until 9).map(j => (j, j % 6, s"b$j"))
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB3(bCur), bT)
    stores.foreach { case (root, t, how) =>
      IncrementalAgg.publishInitialMulti(spark, root,
        dfA(aCur).join(dfB3(bCur), col("cust") === col("bjoin"), how), t)
    }
    (0 until 3).foreach { batch =>
      val bNext0 = bCur.filterNot(_._1 == batch * 2 % 9)
        .map { case (j, g, v) =>
          if (j == (batch * 3 + 1) % 9) (j, (g + 2) % 6, v) else (j, g, v) } ++
        Seq((20 + batch, (batch + 3) % 6, s"nb$batch"))
      val bn = bNext0.groupBy(_._1).map(_._2.head).toIndexedSeq
      val aNext = aCur.filterNot(_._1 % 11 == batch)
        .map { case (i, c, v) =>
          if (i % 6 == batch % 6) (i, c.map(x => (x + 1) % 5), v + "!")
          else (i, c, v) } ++
        Seq((100 + batch, Some(rnd.nextInt(7)), s"new$batch"))
      val feedA = ChangeFeed.diff(dfA(aCur), dfA(aNext), Seq("aid")).persist()
      val feedB = ChangeFeed.diff(dfB3(bCur), dfB3(bn), Seq("bid")).persist()
      // ONE call builds every form's feed from one inner read and one
      // Corrections per side — the shared-probe contract under test
      val fam = JoinView.familyDeltas(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"),
          AtomicPublish.currentVersion(spark, aRoot).get),
        JoinView.Side(bRoot, "replica", Seq("bjoin"),
          AtomicPublish.currentVersion(spark, bRoot).get),
        "acnt", "bcnt", feedA, feedB)
      val feeds = Seq(fam.inner, fam.leftOuter, fam.rightOuter,
        fam.fullOuter, fam.semi, fam.anti).map(_.persist())
      assert(IncrementalAgg.applyOnceMulti(spark, aRoot, feedA, batch, aT))
      assert(IncrementalAgg.applyOnceMulti(spark, bRoot, feedB, batch, bT))
      stores.zip(feeds).foreach { case ((root, t, _), feed) =>
        assert(IncrementalAgg.applyOnceMulti(spark, root, feed, batch, t))
      }
      (feedA +: feedB +: feeds).foreach(_.unpersist())
      fam.release()
      stores.foreach { case (root, _, how) =>
        assert(IncrementalAgg.readView(spark, root, "view")
          .collect().map(_.toSeq).toSet === direct(aNext, bn, how),
          s"family form '$how' diverged after batch $batch")
      }
      aCur = aNext; bCur = bn
    }
  }

  test("GC under composition: the middle-view store is vacuumed " +
    "mid-stream (cut-aware versions + segments) while layer-2 reads " +
    "pin cut versions — every batch stays exact, every retained cut " +
    "stays resolvable, state stays bounded") {
    import graft.etl.Coordinator
    def dfB2(rows: Seq[(Int, Int, String)]) = rows.toDF("bid", "nat", "bv")
    def dfN(rows: Seq[(Int, String)]) = rows.toDF("nid", "nname")
    def direct3(a: Seq[(Int, Option[Int], String)], b: Seq[(Int, Int, String)],
                n: Seq[(Int, String)]): Set[Seq[Any]] =
      dfA(a).join(dfB2(b), col("cust") === col("bid"), "inner")
        .join(dfN(n), col("nat") === col("nid"), "inner")
        .collect().map(_.toSeq).toSet
    val base = "/root/repo/target/test-sink/join3gc"
    Seq("a", "b", "n", "v1", "g", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val aRoot = s"$base/a"; val bRoot = s"$base/b"; val nRoot = s"$base/n"
    val v1Root = s"$base/v1"; val gRoot = s"$base/g"; val cutRoot = s"$base/cut"
    val aT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid"),
      numBuckets = 4, bucketOn = Seq("cust")))
    val bT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("bid"),
      numBuckets = 4))
    val nT = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("nid"),
      numBuckets = 4))
    val v1T = Seq(IncrementalAgg.ReplicaSpec("replica", Seq("aid", "bid"),
      numBuckets = 4, bucketOn = Seq("nat")))
    val gT = Seq(IncrementalAgg.ReplicaSpec("view", Seq("aid", "bid", "nid"),
      numBuckets = 4))
    val rnd = new scala.util.Random(103)
    var aCur = (0 until 40).map(i => (i,
      if (i % 9 == 4) None: Option[Int] else Some(rnd.nextInt(10)), s"a$i"))
    var bCur = (0 until 10).map(j => (j, j % 4, s"b$j"))
    var nCur = (0 until 4).map(k => (k, s"n$k"))
    def j1(a: Seq[(Int, Option[Int], String)], b: Seq[(Int, Int, String)]) =
      dfA(a).join(dfB2(b), col("cust") === col("bid"), "inner")
    IncrementalAgg.publishInitialMulti(spark, aRoot, dfA(aCur), aT)
    IncrementalAgg.publishInitialMulti(spark, bRoot, dfB2(bCur), bT)
    IncrementalAgg.publishInitialMulti(spark, nRoot, dfN(nCur), nT)
    IncrementalAgg.publishInitialMulti(spark, v1Root, j1(aCur, bCur), v1T)
    IncrementalAgg.publishInitialMulti(spark, gRoot,
      j1(aCur, bCur).join(dfN(nCur), col("nat") === col("nid"), "inner"), gT)
    Coordinator.commitCut(spark, cutRoot, Map(
      "a" -> 0L, "b" -> 0L, "n" -> 0L, "v1" -> 0L, "g" -> 0L))
    def vacuumRound(): Unit = {
      // the retention ordering under test: coordinator first, then the
      // middle view's versions (cut-aware) and segments — racing
      // nothing, because the in-flight reads of THIS cadence always
      // pin versions the current cut references
      AtomicPublish.vacuum(spark, cutRoot, keep = 2)
      Coordinator.vacuumMember(spark, cutRoot, "v1", v1Root, keep = 1)
      IncrementalAgg.vacuumSegments(spark, v1Root, minAgeMs = 0)
    }
    (0 until 5).foreach { batch =>
      val aNext = aCur.filterNot(_._1 % 9 == batch % 9)
        .map { case (i, c, v) =>
          if (i % 6 == batch % 6) (i, c.map(x => (x + 1) % 10), v + "!")
          else (i, c, v) } ++
        Seq((200 + batch, Some(rnd.nextInt(11)), s"new$batch"))
      val bNext = bCur.filterNot(_._1 == 9 - batch)
        .map { case (j, g, v) =>
          if (j % 5 == batch % 5) (j, (g + 1) % 4, v) else (j, g, v) } ++
        Seq((10 + batch, (batch + 2) % 4, s"bn$batch"))
      val bn = bNext.groupBy(_._1).map(_._2.head).toIndexedSeq
      val nNext = nCur.map { case (k, v) =>
        if (k == batch % 4) (k, v + "-R") else (k, v) }
      val feedA = ChangeFeed.diff(dfA(aCur), dfA(aNext), Seq("aid")).persist()
      val feedB = ChangeFeed.diff(dfB2(bCur), dfB2(bn), Seq("bid")).persist()
      val feedN = ChangeFeed.diff(dfN(nCur), dfN(nNext), Seq("nid")).persist()
      // layer reads pin the LAST cut's versions — exactly the versions
      // the cut-aware vacuum must never delete
      val cut = Coordinator.currentCut(spark, cutRoot)
      val feed1 = JoinView.joinDeltaFromStores(spark,
        JoinView.Side(aRoot, "replica", Seq("cust"), cut("a")),
        JoinView.Side(bRoot, "replica", Seq("bid"), cut("b")),
        feedA, feedB).persist()
      val feed2 = JoinView.joinDeltaFromStores(spark,
        JoinView.Side(v1Root, "replica", Seq("nat"), cut("v1")),
        JoinView.Side(nRoot, "replica", Seq("nid"), cut("n")),
        feed1, feedN).persist()
      Coordinator.advanceMembers(spark, batch.toLong, Seq(
        Coordinator.MemberAdvance(aRoot, feedA, aT),
        Coordinator.MemberAdvance(bRoot, feedB, bT),
        Coordinator.MemberAdvance(nRoot, feedN, nT),
        Coordinator.MemberAdvance(v1Root, feed1, v1T),
        Coordinator.MemberAdvance(gRoot, feed2, gT)))
      Coordinator.commitCut(spark, cutRoot, Map(
        "a" -> AtomicPublish.currentVersion(spark, aRoot).get,
        "b" -> AtomicPublish.currentVersion(spark, bRoot).get,
        "n" -> AtomicPublish.currentVersion(spark, nRoot).get,
        "v1" -> AtomicPublish.currentVersion(spark, v1Root).get,
        "g" -> AtomicPublish.currentVersion(spark, gRoot).get))
      Seq(feedA, feedB, feedN, feed1, feed2).foreach(_.unpersist())
      if (batch % 2 == 1) vacuumRound()
      val nowCut = Coordinator.currentCut(spark, cutRoot)
      assert(IncrementalAgg.readView(spark, gRoot, "view", Some(nowCut("g")))
        .collect().map(_.toSeq).toSet === direct3(aNext, bn, nNext),
        s"composed view diverged after batch $batch (GC cadence)")
      aCur = aNext; bCur = bn; nCur = nNext
    }
    vacuumRound()
    // bounded state: the middle view retains at most keep + the
    // versions the two retained cuts reference
    val live = AtomicPublish.liveVersions(spark, v1Root)
    assert(live.size <= 3,
      s"middle-view versions unbounded under the GC cadence: $live")
    // EVERY retained cut still resolves end-to-end through the
    // middle view — the property the cut-aware vacuum exists for —
    // and the NEWEST one serves exactly the live A⋈B
    val retainedCuts = AtomicPublish.liveVersions(spark, cutRoot)
    retainedCuts.foreach { cv =>
      val c = Coordinator.cutAt(spark, cutRoot, cv)
      assert(IncrementalAgg.readView(spark, v1Root, "replica", Some(c("v1")))
        .count() > 0, s"retained cut $cv cannot open its middle-view version")
    }
    val newest = Coordinator.cutAt(spark, cutRoot, retainedCuts.max)
    assert(IncrementalAgg.readView(spark, v1Root, "replica",
      Some(newest("v1"))).collect().map(_.toSeq).toSet
      === j1(aCur, bCur).collect().map(_.toSeq).toSet,
      "the newest cut's middle view must equal the live A⋈B")
  }

  test("hot-key skew through joinDelta: a delta touching a join key with " +
    "10^4 matching pre-state rows is exact, and in the no-broadcast worst " +
    "case AQE's skew split engages on the hot partition") {
    // The r17/r18 SCALE.md story argued this in prose: a hot key's worst
    // case inside the six-term delta is OUTPUT-sized (A_keep ⋈ ΔB emits
    // one pair per matching A row — nothing quadratic), and when the
    // delta is too big to broadcast the skewed shuffle partition is
    // AQE's skew-split case. This battery CONSTRUCTS that batch: 10,000
    // A rows share join key 42; ΔB updates exactly that key (plus cold
    // churn), so the A_keep ⋈ ΔB± terms each carry the full hot fan-out
    // through one shuffle partition of the sort-merge join.
    // 10k hot rows vs ~1.2k cold rows per shuffle partition: the hot
    // partition must dominate the MEDIAN (AQE's skew test is
    // size > max(thresholdBytes, factor × median)), so the cold side
    // stays an order of magnitude below the hot fan-out
    val hotA = (1 to 10000).map(i => (i, Some(42), s"h$i"))
    val coldA = (10001 to 15000).map(i => (i, Some(100 + i % 59), s"c$i"))
    val a0 = hotA ++ coldA
    val b0 = (Seq(42) ++ (100 to 158)).map(k => (k, s"v$k"))
    // ΔA: delete a sliver (some hot rows land in the ΔA⁻ ⋈ ΔB± cell);
    // ΔB: rewrite the HOT key's row, delete one cold key, insert one
    val a1 = a0.filterNot { case (i, _, _) => i % 1000 == 7 }
    val b1 = b0.map { case (k, v) => if (k == 42) (k, "HOT!") else (k, v) }
      .filterNot(_._1 == 157) ++ Seq((200, "new"))
    val confs = Seq(
      // the worst case this battery prices: delta NOT broadcastable
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // spec-scale thresholds: the hot partition (~10^4 rows) must
      // cross them, the cold ones (~10^2 rows) must not
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4096",
      // the split target is floored at coalescePartitions.minPartitionSize
      // (default 1 MiB) — a spec-scale hot partition (~100 KiB) can never
      // split into >1 piece without lowering the floor too
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4096")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val feedA = ChangeFeed.diff(dfA(a0), dfA(a1), Seq("aid"))
      val feedB = ChangeFeed.diff(dfB(b0), dfB(b1), Seq("bid"))
      val viewFeed = JoinView.joinDelta(spark, dfA(a0), dfB(b0),
        feedA, feedB, Seq("cust" -> "bid"))
      // output-sized, not quadratic: the feed carries delete+insert for
      // every live hot pair + the cold churn — bound it before replay.
      // Materialize through the feed's OWN QueryExecution (a .count()
      // would plan a fresh one and the adaptive plan here would never
      // finalize), then read the FINAL adaptive plan for the markers.
      val qe = viewFeed.queryExecution
      val feedRows = qe.executedPlan.execute().count()
      assert(feedRows < 30000,
        s"hot-key delta blew past the output-size bound: $feedRows rows")
      // the executed (adaptive) plan of the materialized feed shows the
      // skew split engaged. Primary assertion is STRUCTURAL — an
      // AQEShuffleReadExec whose partitionSpecs carry a
      // PartialReducerPartitionSpec (the skew-split spec type) — so a
      // Spark plan-string or marker-text change can't flake the suite;
      // the "skew=true"/"skewed" string markers stay as a fallback for
      // a release that restructures the read node instead.
      val finalPlan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val skewSplits = finalPlan.collect {
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
          r.partitionSpecs.count(
            _.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec])
      }.sum
      val planStr = qe.executedPlan.toString
      assert(skewSplits > 0 ||
        planStr.contains("skew=true") || planStr.contains("skewed"),
        s"AQE skew split did not engage on the hot partition:\n$planStr")
      val viewPre = dfA(a0).join(dfB(b0), col("cust") === col("bid"), "inner")
      val replayed = ChangeFeed.applyTo(viewPre, viewFeed, Seq("aid", "bid"),
        strict = true).collect().map(_.toSeq).toSet
      assert(replayed === direct(a1, b1),
        "hot-key maintenance diverged from the direct join")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
