package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowUdf
import graft.ops.{Retrieval, TextDedup}

/** Winnowing fingerprints + keyword retrieval: the rolling hash must
  * equal the direct polynomial, containment must detect substring
  * inclusion that resemblance (Jaccard) misses, and the BM25 scorer —
  * which the DuckDB gate cannot hash-compare because of ln() — is pinned
  * here against a hand-computed value. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  /** Direct (non-rolling) winnow reference: O(len·k) polynomial per
    * position + O(m·w) window mins — the semantics WinnowUdf's rolling
    * update and deque must reproduce exactly. */
  private def winnowRef(s: String, k: Int, w: Int): Option[Set[Long]] = {
    val cps = s.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return None
    val hs = (0 until m).map { i =>
      (0 until k).map(j => (cps(i + j) * pow(k - 1 - j)) % WinnowUdf.P)
        .sum % WinnowUdf.P
    }
    Some(
      if (m < w) Set(hs.min)
      else (0 to m - w).map(x => hs.slice(x, x + w).min).toSet)
  }
  private def pow(e: Int): Long =
    (0 until e).foldLeft(1L)((v, _) => (v * WinnowUdf.B) % WinnowUdf.P)

  test("rolling hash + deque winnow == direct polynomial reference") {
    val rng = new scala.util.Random(42)
    val texts = Seq("abcdefghijklmnopqrstuvwxyz", "aaaaaaaaaaaaaaaa",
      "short", "exactly-k-chars-here-x") ++
      (1 to 20).map(_ => rng.alphanumeric.take(5 + rng.nextInt(200)).mkString)
    for (t <- texts; (k, w) <- Seq((8, 4), (5, 1), (12, 20))) {
      val row = spark.createDataset(Seq(t)).toDF("s")
        .select(WinnowUdf(k, w)(col("s")).as("fps"))
        .head()
      val got = if (row.isNullAt(0)) None else Some(row.getSeq[Long](0).toSet)
      assert(got === winnowRef(t, k, w), s"k=$k w=$w text=$t")
    }
  }

  test("containment detects substring inclusion that Jaccard misses") {
    // B is verbatim inside A but only ~28% of A: containment ≈ 1, while
    // the symmetric Jaccard of their fingerprint sets is far below it
    val inner = "the quick brown fox jumps over the lazy dog again and again"
    val a = ("padding words before the match start here " + inner +
      " and plenty of trailing filler so the host document is much larger " +
      "than the quoted span by a wide margin indeed").trim
    val docs = Seq((1L, a), (2L, inner), (3L, "completely unrelated content " +
      "sharing no thirty character run with either document at all"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.containmentPairs(docs, "doc_id", "text",
      k = 10, w = 4, threshold = 0.8).collect()
    assert(pairs.length === 1)
    assert((pairs(0).getLong(0), pairs(0).getLong(1)) === (1L, 2L))
    assert(pairs(0).getDouble(2) >= 0.9)
    // the winnowing guarantee: a shared run of >= k + w - 1 chars shares
    // at least one fingerprint — so the pair also exists at threshold 0+
    val loose = TextDedup.containmentPairs(docs, "doc_id", "text",
      k = 10, w = 4, threshold = 0.0001)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
    assert(loose.count() === 1)
  }

  test("keywordTopK ranks rare-term docs above common-term docs") {
    // idf_fp: N=4, df(rare)=1 → 40000; df(common)=3 → 13333
    val docs = Seq(
      (1L, "common words only common words only"),         // tf(common)=2, dl=6
      (2L, "rare appears here with common filler tokens"), // both terms, dl=7
      (3L, "common z z z z z z z z z z z z z z z z z z z"),// tf=1, dl=20
      (4L, "nothing matching at all")).toDF("doc_id", "text")
    val got = Retrieval.keywordTopK(docs, "doc_id", "text",
      Seq("rare", "common"), k = 10).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 1L, 3L))
    // doc 2: (1*40000 + 1*13333)/7 ; doc 1: 2*13333/6 ; doc 3: 13333/20
    assert(got(0).getLong(2) === 53333L)
    assert(got(0).getDouble(3) === 53333.0 / 7)
    assert(got(1).getLong(2) === 26666L)
  }

  test("bm25TopK matches the hand-computed Okapi formula") {
    val docs = Seq(
      (1L, "x x x y"), // tf(x)=3, dl=4
      (2L, "x z z z"), // tf(x)=1, dl=4
      (3L, "z z z z z z z z z z z z")).toDF("doc_id", "text") // dl=12
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 5)
      .collect()
    // N=3, df=2, avgdl=(4+4+12)/3; idf = ln((3-2+0.5)/(2+0.5)+1)
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    val avgdl = 20.0 / 3
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(math.abs(got(0).getDouble(2) - s(3, 4)) < 1e-12)
    assert(math.abs(got(1).getDouble(2) - s(1, 4)) < 1e-12)
  }

  test("maintained index: the postings feed is MINIMAL (an edit's " +
    "unchanged terms diff away), the three targets track a from-scratch " +
    "rebuild through deletes/edits/inserts, replay is exactly-once, and " +
    "the served BM25 ranking equals the per-query scorer") {
    import graft.etl.{AtomicPublish, ChangeFeed, IncrementalAgg}
    val root = "/root/repo/target/test-sink/ir_maintained_index"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val v0 = Seq(
      1L -> "alpha beta beta gamma",
      2L -> "beta delta",
      3L -> "alpha alpha epsilon",
      4L -> "zeta")
    // doc 2 deleted; doc 3 edited (one term swapped — alpha and the
    // second alpha stay; epsilon → beta); doc 5 inserted
    val v1 = Seq(
      1L -> "alpha beta beta gamma",
      3L -> "alpha alpha beta",
      4L -> "zeta",
      5L -> "epsilon beta")
    // doc 4 deleted: term 'zeta' dies entirely
    val v2 = Seq(
      1L -> "alpha beta beta gamma",
      3L -> "alpha alpha beta",
      5L -> "epsilon beta")
    val targets = graft.ops.Retrieval.indexTargets(numBuckets = 4)
    IncrementalAgg.publishInitialMulti(spark, root,
      graft.ops.Retrieval.indexPostings(df(v0), "doc_id", "text"), targets)
    // MINIMALITY: doc 3's edit keeps 'alpha' tf=2, so the postings
    // feed must carry only the epsilon delete, the beta insert, and
    // the dl-changing update pairs — never an (alpha, 3) row pair with
    // identical content... dl changes though: alpha's dl 3→3 stays, so
    // (alpha,3) truly diffs away
    val feed01 = graft.ops.Retrieval.postingsDelta(
      ChangeFeed.diff(df(v0), df(v1), Seq("doc_id")), "doc_id", "text")
    val f01 = feed01.as[(String, Long, Long, Long, String)].collect().toSet
    assert(!f01.exists(r => r._1 == "alpha" && r._2 == 3L),
      s"unchanged posting (alpha, doc 3) leaked into the feed: $f01")
    assert(f01.exists(r => r._1 == "epsilon" && r._2 == 3L && r._5 == "delete"))
    assert(f01.exists(r => r._1 == "beta" && r._2 == 3L && r._5 == "insert"))
    // advance two batches; after each, every target equals a rebuild
    def postingsOf(rows: Seq[(Long, String)]) =
      graft.ops.Retrieval.indexPostings(df(rows), "doc_id", "text")
        .as[(String, Long, Long, Long)].collect().toSet
    def viewRows(view: String) = IncrementalAgg.readView(spark, root, view)
      .collect().map(_.toSeq).toSet
    assert(IncrementalAgg.applyOnceMulti(spark, root, feed01, 0L, targets))
    assert(IncrementalAgg.readView(spark, root, "postings")
      .as[(String, Long, Long, Long)].collect().toSet === postingsOf(v1))
    val feed12 = graft.ops.Retrieval.postingsDelta(
      ChangeFeed.diff(df(v1), df(v2), Seq("doc_id")), "doc_id", "text")
    assert(IncrementalAgg.applyOnceMulti(spark, root, feed12, 1L, targets))
    assert(IncrementalAgg.readView(spark, root, "postings")
      .as[(String, Long, Long, Long)].collect().toSet === postingsOf(v2))
    // df view equals a recount; the died term 'zeta' LEFT the state
    val dfView = IncrementalAgg.readView(spark, root, "df")
      .select("term", "n").as[(String, Long)].collect().toMap
    assert(dfView === Map("alpha" -> 2L, "beta" -> 3L, "gamma" -> 1L,
      "epsilon" -> 1L))
    // bydoc equals token lengths
    assert(IncrementalAgg.readView(spark, root, "bydoc")
      .select(col("doc_id"), col("dl").cast("long"))
      .as[(Long, Long)].collect().toMap === Map(1L -> 4L, 3L -> 3L, 5L -> 2L))
    // exactly-once: both batches refuse replay, one version per batch
    assert(!IncrementalAgg.applyOnceMulti(spark, root, feed01, 0L, targets))
    assert(AtomicPublish.currentVersion(spark, root) === Some(2L))
    // the served ranking equals the per-query scorer over the same docs
    val terms = Seq("beta", "epsilon", "zeta")
    val served = graft.ops.Retrieval.bm25FromIndex(spark, root, terms, k = 10)
      .as[(Int, Long, Int)].collect().toSeq
    val direct = graft.ops.Retrieval.bm25RankedTopK(df(v2), "doc_id", "text",
      terms, k = 10).as[(Int, Long, Int)].collect().toSeq
    assert(served === direct,
      s"maintained-index BM25 diverged from the per-query scorer: " +
        s"$served vs $direct")
    // TIME TRAVEL: a retained version serves ITS corpus's ranking —
    // postings, df, and doc stats all resolve from one version (a
    // historical ranking can never mix epochs)
    val travel = graft.ops.Retrieval.bm25FromIndex(spark, root, terms,
      k = 10, version = Some(1L)).as[(Int, Long, Int)].collect().toSeq
    assert(travel === graft.ops.Retrieval.bm25RankedTopK(df(v1), "doc_id",
      "text", terms, k = 10).as[(Int, Long, Int)].collect().toSeq,
      "time-traveled ranking diverged from its version's corpus")
    // CATCH-UP COMPOSITION over the index (the algebra's interaction
    // case): a store seeded at v0 that missed BOTH batches applies the
    // composed postings feed as ONE exactly-once round and reaches the
    // same index — compose's keyed fold operates on (term, doc_id)
    // postings rows exactly as it does on table rows
    val root2 = "/root/repo/target/test-sink/ir_maintained_index_catchup"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root2))
    IncrementalAgg.publishInitialMulti(spark, root2,
      graft.ops.Retrieval.indexPostings(df(v0), "doc_id", "text"), targets)
    assert(IncrementalAgg.applyComposedMulti(spark, root2,
      Seq(0L -> feed01, 1L -> feed12), Seq("term", "doc_id"),
      targets, strict = true) === 2)
    assert(IncrementalAgg.readView(spark, root2, "postings")
      .as[(String, Long, Long, Long)].collect().toSet === postingsOf(v2))
    assert(graft.ops.Retrieval.bm25FromIndex(spark, root2, terms, k = 10)
      .as[(Int, Long, Int)].collect().toSeq === direct,
      "catch-up-composed index serves a different ranking")
  }

  test("maintained-index SERVE is bucket-pruned and stats-backed: a " +
    "query opens only its terms' postings buckets, and the 1-row stats " +
    "table equals a bydoc recompute at every version") {
    import graft.etl.{AtomicPublish, ChangeFeed, IncrementalAgg}
    val root = "/root/repo/target/test-sink/ir_pruned_serve"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    // a vocabulary wide enough that 2 query terms cannot cover the
    // bucket space: 64 terms over 16 buckets
    val vocab = (0 until 64).map(i => s"term$i")
    val v0 = (1L to 80L).map(d =>
      d -> (0 until 6).map(j => vocab(((d + j * 11) % 64).toInt)).mkString(" "))
    val v1 = v0.filterNot(_._1 % 10 == 3)
    val targets = graft.ops.Retrieval.indexTargets(numBuckets = 16)
    IncrementalAgg.publishInitialMulti(spark, root,
      graft.ops.Retrieval.indexPostings(df(v0), "doc_id", "text"), targets)
    assert(IncrementalAgg.applyOnceMulti(spark, root,
      graft.ops.Retrieval.postingsDelta(
        ChangeFeed.diff(df(v0), df(v1), Seq("doc_id")), "doc_id", "text"),
      0L, targets))
    val terms = Seq("term3", "term17")
    def opened(d: org.apache.spark.sql.DataFrame): Set[String] =
      d.inputFiles.flatMap(_.split('/')
        .find(_.startsWith(s"${IncrementalAgg.BucketCol}="))).toSet
    // the postings read inside the serve path (same call bm25FromIndex
    // makes): ≤ |terms| bucket dirs of the 16, never the index
    val prunedPostings = IncrementalAgg.readViewPruned(spark, root,
      "postings", Seq("term"), terms.map(t => Seq[Any](t)))
    assert(opened(prunedPostings).size <= terms.size,
      s"serve must open at most ${terms.size} postings buckets, " +
        s"opened ${opened(prunedPostings)}")
    assert(opened(IncrementalAgg.readView(spark, root, "postings")).size >= 10,
      "the corpus fills (nearly) all 16 buckets — pruning is what spares them")
    // df prunes identically (term IS its group key)
    assert(opened(IncrementalAgg.readViewPruned(spark, root, "df",
      Seq("term"), terms.map(t => Seq[Any](t)))).size <= terms.size)
    // and the pruned serve still ranks exactly like the per-query scorer
    val served = graft.ops.Retrieval.bm25FromIndex(spark, root, terms, k = 10)
      .as[(Int, Long, Int)].collect().toSeq
    assert(served === graft.ops.Retrieval.bm25RankedTopK(df(v1), "doc_id",
      "text", terms, k = 10).as[(Int, Long, Int)].collect().toSeq,
      "pruned serve diverged from the per-query scorer")
    // MAINTAINED CORPUS STATS: the 1-row table equals the |docs|-sized
    // aggregate it replaces, at every version (the per-query scan is
    // gone; the per-batch derivation must be exact)
    Seq(0L, 1L).foreach { v =>
      val recompute = IncrementalAgg.readView(spark, root, "bydoc", Some(v))
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        .collect().map(_.toSeq).toSeq
      assert(IncrementalAgg.readView(spark, root, "stats", Some(v))
        .collect().map(_.toSeq).toSeq === recompute,
        s"stats table diverged from the bydoc recompute at version $v")
    }
  }

  test("pre-r17 index compatibility: a 3-target store (no stats table, " +
    "key-bucketed postings) serves the identical ranking through the " +
    "documented fallbacks") {
    import graft.etl.IncrementalAgg
    import graft.etl.IncrementalAgg.{ReplicaSpec, ViewSpec}
    val root = "/root/repo/target/test-sink/ir_prestats_store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val docs = (1L to 30L).map(d =>
      d -> (0 until 4).map(j => s"w${(d + j * 5) % 12}").mkString(" "))
    // the r16 bundle: postings bucketed on its FULL key, no stats —
    // the shape every store seeded before this round has on disk
    val oldTargets = Seq(
      ReplicaSpec("postings", Seq("term", "doc_id"), 4),
      ViewSpec("df", Seq("term"), Nil, 4),
      ViewSpec("bydoc", Seq("doc_id"), Seq("dl" -> "tf"), 4))
    IncrementalAgg.publishInitialMulti(spark, root,
      graft.ops.Retrieval.indexPostings(df(docs), "doc_id", "text"), oldTargets)
    val terms = Seq("w3", "w7")
    // term-pruning cannot engage (the recorded layout is the full key)
    // and stats falls back to the per-query bydoc aggregate — results
    // must be indistinguishable from the new-layout serve
    assert(graft.ops.Retrieval.bm25FromIndex(spark, root, terms, k = 10)
      .as[(Int, Long, Int)].collect().toSeq ===
      graft.ops.Retrieval.bm25RankedTopK(df(docs), "doc_id", "text",
        terms, k = 10).as[(Int, Long, Int)].collect().toSeq,
      "fallback serve diverged on a pre-stats store")
  }

  test("centroidOutliers: planted outlier first, distances exact, ties by id") {
    import graft.ops.VectorSearch
    // 9 unit vectors + one far point → centroid = 2.0 per dim;
    // dist2(base) = 4·(1−2)² = 4, dist2(outlier) = 4·(11−2)² = 324
    val vecs = ((1 to 9).map(i => (i.toLong, Array.fill(4)(1.0f))) :+
      (10L, Array.fill(4)(11.0f))).toDF("pk", "v")
    val got = VectorSearch.centroidOutliers(vecs, "pk", "v", k = 3).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(10L, 1L, 2L))
    assert(got(0).getDouble(1) === 324.0)
    assert(got(1).getDouble(1) === 4.0)
  }

  test("fixture corpus: dd9 covers every exact-dup pair; scores stay in (0,1]") {
    // exact dups (containment 1 by construction) are a LOWER bound on
    // what winnowing must find at 0.5; the fixture also contains true
    // near-dups (docs sharing ≥ half their fingerprints without byte
    // equality), so equality with the exact closure would be the wrong
    // law. The raw fixture has ZERO exact dups, which would make the
    // subset check vacuous — so verbatim copies of three long docs are
    // PLANTED under fresh ids, and exact.nonEmpty is asserted as a
    // precondition. Scores are exact set-intersection ratios → (0, 1].
    val base = Tables.documents(spark, sf)
    val maxId = base.agg(max("doc_id")).head().getLong(0)
    val planted = base.filter(col("n_chars") >= 200).limit(3)
      .select((col("doc_id") + lit(maxId)).as("doc_id"), col("text"))
    val docs = base.select("doc_id", "text").unionByName(planted)
    val win = TextDedup.containmentPairs(docs, "doc_id", "text").collect()
    val winPairs = win.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(win.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
    assert(win.nonEmpty, "fixture should contain high-overlap pairs")
    val exact = TextDedup.exactDedup(docs, "doc_id", "text")
      .filter(col("is_dup")).select("canonical_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 3, s"planted dups missing: only $exact")
    assert(exact.subsetOf(winPairs), s"missing exact dups: ${exact -- winPairs}")
    // the planted copies are byte-identical → identical fingerprint
    // sets → containment exactly 1.0
    val byPair = win.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    exact.foreach(p => assert(byPair(p) === 1.0, s"planted pair $p"))
  }

  test("ir2 rank stability: top-k score gaps dwarf libm ln() ulp noise") {
    // ir2_bm25_topk hash-compares (rank, doc_id, n_matched) against
    // DuckDB. The two engines' scores differ only through their libm
    // ln() (every other step is bit-identical by construction — see
    // bm25TopK's Scaladoc), i.e. by O(1 ulp) ≈ 1e-16 relative per
    // term. The rank hash is therefore stable iff adjacent DISTINCT
    // scores around the cut are separated by far more than that; docs
    // with bit-EQUAL scores (identical tf⃗/dl) are safe regardless —
    // the fixed-order sum makes them collide exactly in both engines
    // and the doc_id tiebreak orders them identically.
    val docs = Tables.documents(spark, sf)
    val scores = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("dup", "vector", "batch"), k = 25)
      .collect().map(_.getDouble(2))
    assert(scores.length > 20, "need rows past the k=20 cut")
    val gaps = scores.sliding(2).collect {
      case Array(a, b) if a != b => (a - b) / a
    }.toSeq
    assert(gaps.nonEmpty)
    assert(gaps.forall(_ > 1e-9),
      s"adjacent relative score gap too small for cross-engine rank " +
        s"stability: ${gaps.min}")
  }

  test("dd9 hot-fingerprint guard bounds the boilerplate clique") {
    // degenerate corpus (the dd2 maxBucketSize / dd4 maxShingleDf
    // scenario): 30 docs share one long boilerplate run → its
    // fingerprints have df=30, and every one of the 435 boilerplate
    // pairs scores ≥ 0.5 unguarded (f² join rows). One genuine pair
    // (200, 201) shares a long passage and NO boilerplate, so the
    // guard cannot touch its fingerprints.
    val rng = new scala.util.Random(7)
    def noise(n: Int): String = rng.alphanumeric.take(n).mkString
    val boiler = "this exact boilerplate footer sentence repeats on every " +
      "generated page of the crawl and dominates short documents entirely"
    val passage = "a genuinely shared long passage of real content that " +
      "only the two authentic near duplicate documents have in common"
    val docs = ((1 to 30).map(i => (i.toLong, boiler + " " + noise(40))) ++
      Seq((200L, passage + " " + noise(30)), (201L, noise(30) + " " + passage)))
      .toDF("doc_id", "text")
    def run(guard: Option[Int]) = TextDedup.containmentPairs(
      docs, "doc_id", "text", k = 10, w = 4, threshold = 0.5,
      maxFingerprintDf = guard).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val unguarded = run(None)
    val guarded = run(Some(10))
    // unguarded: the boilerplate clique is quadratic (all 435 pairs
    // present) — exactly the blowup the guard exists to bound
    assert((1 to 30).combinations(2).forall { case Seq(a, b) =>
      unguarded.contains((a.toLong, b.toLong)) })
    assert(unguarded.contains((200L, 201L)))
    // guarded: clique gone (its fingerprints all have df=30 > 10), the
    // genuine pair survives WITH ITS SCORE UNCHANGED (none of its
    // fingerprints are hot), and no new pairs appear
    assert(guarded.keySet === Set((200L, 201L)))
    assert(guarded((200L, 201L)) === unguarded((200L, 201L)))
    assert(guarded.keySet.subsetOf(unguarded.keySet))
  }

  test("rrfFuseTopK matches the hand-computed fused scores and tiebreaks") {
    // list A ranks 1,2,3; list B ranks 3,2,4 — doc 2 is the consensus
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (2L, 2), (4L, 3)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuseTopK(Seq(a, b), "doc_id", k = 10, c = 60)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    def s(ranks: Double*) = ranks.map(r => 1.0 / (60.0 + r)).sum
    val expect = Map( // doc -> (n_lists, score)
      1L -> (1, s(1)), 2L -> (2, s(2, 2)), 3L -> (2, s(3, 1)), 4L -> (1, s(3)))
    got.foreach { case (id, n, sc, _) =>
      assert((n, sc) === expect(id), s"doc $id") }
    // fused order: 2 and 3 tie exactly in floating point only if their
    // rank multisets match — here 3 (ranks 3,1) beats 2 (ranks 2,2)?
    // 1/63+1/61 vs 2/62: hand-check the actual ordering
    val order = got.sortBy(_._4).map(_._1).toSeq
    val byScore = expect.toSeq.sortBy { case (id, (_, sc)) => (-sc, id) }.map(_._1)
    assert(order === byScore)
    assert(got.map(_._4).sorted.toSeq === Seq(1, 2, 3, 4))
  }

  test("hybridTopK keeps consensus docs of its two pools on top") {
    val docs = Tables.documents(spark, sf)
    val terms = Seq("dup", "vector", "batch")
    val fused = Retrieval.hybridTopK(docs, "doc_id", "text", terms,
      k = 20, poolK = 50).collect()
    assert(fused.length === 20)
    // every fused doc came from at least one pool, and rank 1 is a doc
    // present in BOTH pools (RRF strictly favors consensus at the top
    // when pools overlap heavily, as these two lexical scorers do)
    assert(fused.head.getInt(1) === 2, "top fused doc should be in both pools")
    // fused scores are monotone non-increasing in rank
    val scores = fused.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("phraseSearch: exact adjacency, multi-occurrence, overlap, null text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),          // phrase at 1
      (2L, "x a b c a b c"),    // twice: 2 and 5
      (3L, "a c b"),            // words present, phrase absent
      (4L, "a b"),              // shorter than the phrase
      (5L, "a a b c"),          // phrase at 2 (prefix overlap before it)
      (6L, null.asInstanceOf[String]))
      .toDF("pk", "body")
    val out = graft.ops.Retrieval.phraseSearch(docs, "pk", "body", Seq("a", "b", "c"))
      .orderBy("pk").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out === Array((1L, 1, 1), (2L, 2, 2), (5L, 1, 2)))
  }
}
