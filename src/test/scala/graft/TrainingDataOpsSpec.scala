package graft

import org.apache.spark.sql.functions._
import graft.ops.{Packing, TextAnalysis, TextDedup}

/** Hand-computed oracles for the round-7 training-data ops: incremental
  * snapshot dedup (bloom prefilter + exact join), repetition signals,
  * and concat-then-chunk sequence packing. The driver's DuckDB gate
  * covers the fixture corpus; these pin the arithmetic and the edge
  * cases the fixtures don't contain (cross-split duplicates at test
  * scale, null text, pack-boundary straddling). */
class TrainingDataOpsSpec extends SparkSuite {

  test("incrementalDedup flags exactly the batch docs whose fingerprint is in the snapshot") {
    import spark.implicits._
    val snapshot = Seq(
      (1L, "shared doc one"), (2L, "snapshot only"), (3L, "Shared   DOC one"))
      .toDF("pk", "body") // 3 normalizes to 1's fingerprint
    val batch = Seq(
      (10L, "shared doc one"),     // exact dup of snapshot 1
      (11L, "SHARED  doc ONE  "),  // dup after normalization
      (12L, "genuinely new"),
      (13L, null.asInstanceOf[String])) // null text: never a dup
      .toDF("pk", "body")
    val out = TextDedup.incrementalDedup(batch, snapshot, "pk", "body")
      .orderBy("pk").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 11L, 12L, 13L))
    assert(out.map(_.getBoolean(2)).toSeq === Seq(true, true, false, false))
    // agreement with the plain (no-bloom) formulation on the fixture corpus
    val docs = Tables.documents(spark, sf)
    val half = docs.agg(expr("(max(doc_id) + 1) div 2")).head.getLong(0)
    val b = docs.filter(col("doc_id") >= half)
    val s = docs.filter(col("doc_id") < half)
    val viaBloom = TextDedup.incrementalDedup(b, s, "doc_id", "text")
    val plain = b.select(col("doc_id"), TextDedup.fingerprint(col("text")).as("fp"))
      .join(s.select(TextDedup.fingerprint(col("text")).as("fp")).distinct()
          .withColumn("hit", lit(true)),
        Seq("fp"), "left")
      .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("is_dup"))
    val lhs = viaBloom.select("doc_id", "is_dup_of_snapshot").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    val rhs = plain.collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(lhs === rhs)
  }

  test("incrementalMinhashLsh agrees with the symmetric LSH restricted to cross-split pairs") {
    // ground truth: dd2's full symmetric pair set, filtered to pairs that
    // straddle the split — the incremental form must produce exactly
    // those (same signatures, same banding, same verification)
    val docs = Tables.documents(spark, sf)
    val half = docs.agg(expr("(max(doc_id) + 1) div 2")).head.getLong(0)
    val inc = TextDedup.incrementalMinhashLsh(
        batch = docs.filter(col("doc_id") >= half),
        snapshot = docs.filter(col("doc_id") < half),
        idCol = "doc_id", textCol = "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = TextDedup.minhashLsh(docs, "doc_id", "text")
      .filter(col("doc_a") < half && col("doc_b") >= half)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full)
    assert(inc.nonEmpty, "fixture should contain cross-split near-dups")
  }

  test("maintained LSH index: a doc chain with inserts, deletes, and " +
    "text edits keeps the persisted stores exactly at the corpus — the " +
    "bucket-pruned probe equals incrementalMinhashLsh per batch, and " +
    "the probe really prunes") {
    import graft.etl.{AtomicPublish, ChangeFeed, Coordinator, IncrementalAgg}
    val base = "/root/repo/target/test-sink/lshidx"
    Seq("bands", "sigs", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val bandsRoot = s"$base/bands"; val sigsRoot = s"$base/sigs"
    val cutRoot = s"$base/cut"
    val bandsT = Seq(IncrementalAgg.ReplicaSpec("bands",
      Seq("doc_id", "band"), numBuckets = 8, bucketOn = Seq("bkey")))
    val sigsT = Seq(IncrementalAgg.ReplicaSpec("sigs", Seq("doc_id"),
      numBuckets = 8))
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val probe = docs.filter(col("doc_id") % 5 === 3)
    val rest = docs.filter(col("doc_id") % 5 =!= 3)
    val edit = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("text", when(col("doc_id") % 13 === 1,
        concat(col("text"), lit(" graft graft"))).otherwise(col("text")))
    // chain hits every index transition: inserts (slice back), deletes
    // (slice out), text edits (band rows MIGRATE buckets), and a
    // degenerate edit slice whose short docs have no signature at all
    val chain = Seq(
      rest.filter(col("doc_id") % 11 =!= 4),
      rest,
      edit(rest.filter(col("doc_id") % 7 =!= 2)))
    IncrementalAgg.publishInitialMulti(spark, bandsRoot,
      TextDedup.bandRows(chain.head, "doc_id", "text"), bandsT)
    IncrementalAgg.publishInitialMulti(spark, sigsRoot,
      TextDedup.signatureRows(chain.head, "doc_id", "text"), sigsT)
    Coordinator.commitCut(spark, cutRoot, Map("bands" -> 0L, "sigs" -> 0L))
    def probeNow(): Set[(Long, Long)] =
      TextDedup.probeAtCut(spark, cutRoot, bandsRoot, sigsRoot, probe,
        "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def directNow(corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      TextDedup.incrementalMinhashLsh(batch = probe, snapshot = corpus,
        idCol = "doc_id", textCol = "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probeNow() === directNow(chain.head),
      "seeded index probe diverged from the direct incremental LSH")
    chain.sliding(2).zipWithIndex.foreach { case (Seq(c0, c1), i) =>
      val docFeed = ChangeFeed.diff(c0, c1, Seq("doc_id")).persist()
      val (sigFeed, bandFeed) = TextDedup.indexFeeds(docFeed, "doc_id", "text")
      Coordinator.advanceMembers(spark, i.toLong, Seq(
        Coordinator.MemberAdvance(bandsRoot, bandFeed, bandsT),
        Coordinator.MemberAdvance(sigsRoot, sigFeed, sigsT)))
      docFeed.unpersist()
      Coordinator.commitCut(spark, cutRoot, Map(
        "bands" -> AtomicPublish.currentVersion(spark, bandsRoot).get,
        "sigs" -> AtomicPublish.currentVersion(spark, sigsRoot).get))
      assert(probeNow() === directNow(c1),
        s"maintained-index probe diverged after batch $i")
      // the maintained stores equal a from-scratch index of the corpus
      assert(IncrementalAgg.readView(spark, sigsRoot, "sigs")
        .collect().map(_.toSeq).toSet ===
        TextDedup.signatureRows(c1, "doc_id", "text")
          .collect().map(_.toSeq).toSet,
        s"signature store diverged after batch $i")
      // the band store too — row-for-row, which pins the text-edit
      // case where a row keeps its (doc_id, band) KEY but its bkey
      // changes, moving it across buckets via the delete+insert pair
      assert(IncrementalAgg.readView(spark, bandsRoot, "bands")
        .collect().map(_.toSeq).toSet ===
        TextDedup.bandRows(c1, "doc_id", "text")
          .collect().map(_.toSeq).toSet,
        s"band store diverged after batch $i")
    }
    assert(probeNow().nonEmpty,
      "fixture should contain probe-vs-corpus near-dups")
    // the probe really prunes: it opens a strict subset of the band
    // store's buckets whenever the probe's band keys do not cover the
    // whole bucket space
    val cut = Coordinator.currentCut(spark, cutRoot)
    val probeKeys = TextDedup.bandRows(probe.limit(2), "doc_id", "text")
      .select("bkey")
    val pruned = IncrementalAgg.readViewPrunedBy(spark, bandsRoot, "bands",
      Seq("bkey"), probeKeys, Some(cut("bands")))
    def buckets(d: org.apache.spark.sql.DataFrame): Set[String] =
      d.inputFiles.flatMap(_.split('/')
        .find(_.startsWith(s"${IncrementalAgg.BucketCol}="))).toSet
    assert(buckets(pruned).size <
      buckets(IncrementalAgg.readView(spark, bandsRoot, "bands",
        Some(cut("bands")))).size,
      "a 2-doc probe must open fewer band buckets than the full store")
  }

  test("cross-store time travel through the maintained-index probe: " +
    "after churn under a vacuum cadence, probing at a HISTORICAL cut " +
    "equals the recompute over that cut's corpus — vacuumMember's " +
    "protection exercised end-to-end on the dd13 pairing") {
    import graft.etl.{AtomicPublish, ChangeFeed, Coordinator, IncrementalAgg}
    val base = "/root/repo/target/test-sink/lshidx_tt"
    Seq("bands", "sigs", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val bandsRoot = s"$base/bands"; val sigsRoot = s"$base/sigs"
    val cutRoot = s"$base/cut"
    val bandsT = Seq(IncrementalAgg.ReplicaSpec("bands",
      Seq("doc_id", "band"), numBuckets = 8, bucketOn = Seq("bkey")))
    val sigsT = Seq(IncrementalAgg.ReplicaSpec("sigs", Seq("doc_id"),
      numBuckets = 8))
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val probe = docs.filter(col("doc_id") % 5 === 3)
    val rest = docs.filter(col("doc_id") % 5 =!= 3)
    val edit = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("text", when(col("doc_id") % 13 === 1,
        concat(col("text"), lit(" graft graft"))).otherwise(col("text")))
    // 4 corpus versions → 4 cuts; deletes, re-inserts, AND bucket-
    // migrating edits, so historical reads cross real version churn
    val chain = Seq(
      rest.filter(col("doc_id") % 11 =!= 4),
      rest,
      edit(rest.filter(col("doc_id") % 7 =!= 2)),
      edit(rest.filter(col("doc_id") % 7 =!= 2 && col("doc_id") % 9 =!= 5)))
    IncrementalAgg.publishInitialMulti(spark, bandsRoot,
      TextDedup.bandRows(chain.head, "doc_id", "text"), bandsT)
    IncrementalAgg.publishInitialMulti(spark, sigsRoot,
      TextDedup.signatureRows(chain.head, "doc_id", "text"), sigsT)
    // coordinator version -> the corpus that cut indexed
    var corpusAt = Map(
      Coordinator.commitCut(spark, cutRoot,
        Map("bands" -> 0L, "sigs" -> 0L)) -> chain.head)
    chain.sliding(2).zipWithIndex.foreach { case (Seq(c0, c1), i) =>
      val docFeed = ChangeFeed.diff(c0, c1, Seq("doc_id")).persist()
      val (sigFeed, bandFeed) = TextDedup.indexFeeds(docFeed, "doc_id", "text")
      Coordinator.advanceMembers(spark, i.toLong, Seq(
        Coordinator.MemberAdvance(bandsRoot, bandFeed, bandsT),
        Coordinator.MemberAdvance(sigsRoot, sigFeed, sigsT)))
      docFeed.unpersist()
      corpusAt += Coordinator.commitCut(spark, cutRoot, Map(
        "bands" -> AtomicPublish.currentVersion(spark, bandsRoot).get,
        "sigs" -> AtomicPublish.currentVersion(spark, sigsRoot).get)) -> c1
    }
    // the GC cadence, in the documented order: coordinator first (its
    // vacuum shrinks the protected set), then members with keep=1 —
    // WITHOUT cut protection that would strand every historical cut
    AtomicPublish.vacuum(spark, cutRoot, keep = 2, minAgeMs = 0)
    val deletedBands = Coordinator.vacuumMember(spark, cutRoot, "bands",
      bandsRoot, keep = 1, minAgeMs = 0)
    val deletedSigs = Coordinator.vacuumMember(spark, cutRoot, "sigs",
      sigsRoot, keep = 1, minAgeMs = 0)
    assert(deletedBands.nonEmpty && deletedSigs.nonEmpty,
      "the cadence must really reclaim member versions " +
        s"(bands: $deletedBands, sigs: $deletedSigs)")
    val retained = AtomicPublish.liveVersions(spark, cutRoot)
    assert(retained.size == 2, s"coordinator keep=2, got $retained")
    // the HISTORICAL retained cut names member versions BELOW the
    // members' own keep=1 floor — alive only because vacuumMember
    // protected them
    val histCut = Coordinator.cutAt(spark, cutRoot, retained.min)
    assert(histCut("bands") <
      AtomicPublish.currentVersion(spark, bandsRoot).get,
      "the historical cut must reference a non-current member version")
    // EVERY retained cut probes exactly as the recompute over ITS corpus
    retained.foreach { cv =>
      val got = TextDedup.probeAtCut(spark, cutRoot, bandsRoot, sigsRoot,
        probe, "doc_id", "text", cutVersion = Some(cv))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = TextDedup.incrementalMinhashLsh(batch = probe,
        snapshot = corpusAt(cv), idCol = "doc_id", textCol = "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"time-travel probe diverged at cut $cv")
      assert(got.nonEmpty, s"cut $cv should see probe-vs-corpus near-dups")
    }
    // a cut the coordinator vacuum dropped is gone — resolving it fails
    val droppedCut = corpusAt.keys.min
    assert(!retained.contains(droppedCut))
    intercept[Exception] {
      TextDedup.probeAtCut(spark, cutRoot, bandsRoot, sigsRoot, probe,
        "doc_id", "text", cutVersion = Some(droppedCut)).collect()
    }
  }

  test("maintained-index probe: a degenerate one-band batch fails the " +
    "candidate cap LOUDLY — named hot buckets, no driver-side blow-up — " +
    "and the same probe passes once the cap admits the set") {
    import graft.etl.{Coordinator, IncrementalAgg}
    val base = "/root/repo/target/test-sink/lshidx_cap"
    Seq("bands", "sigs", "cut").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$base/$d")))
    val bandsRoot = s"$base/bands"; val sigsRoot = s"$base/sigs"
    val cutRoot = s"$base/cut"
    val bandsT = Seq(IncrementalAgg.ReplicaSpec("bands",
      Seq("doc_id", "band"), numBuckets = 8, bucketOn = Seq("bkey")))
    val sigsT = Seq(IncrementalAgg.ReplicaSpec("sigs", Seq("doc_id"),
      numBuckets = 8))
    import spark.implicits._
    // the pathological shape the cap exists for: boilerplate spam —
    // EVERY corpus doc and EVERY batch doc is the same long text, so
    // every band bucket the batch probes contains the whole corpus and
    // the candidate set is |corpus| × |batch| with nothing to prune
    val spam = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (0L until 60L).map(i => (i, spam)).toDF("doc_id", "text")
    val batch = (1000L until 1005L).map(i => (i, spam)).toDF("doc_id", "text")
    IncrementalAgg.publishInitialMulti(spark, bandsRoot,
      TextDedup.bandRows(corpus, "doc_id", "text"), bandsT)
    IncrementalAgg.publishInitialMulti(spark, sigsRoot,
      TextDedup.signatureRows(corpus, "doc_id", "text"), sigsT)
    Coordinator.commitCut(spark, cutRoot, Map("bands" -> 0L, "sigs" -> 0L))
    spark.conf.set("graft.dedup.probe.maxCandidates", "100")
    try {
      val e = intercept[IllegalStateException] {
        TextDedup.probeAtCut(spark, cutRoot, bandsRoot, sigsRoot, batch,
          "doc_id", "text")
      }
      assert(e.getMessage.contains("maxCandidates=100"),
        s"cap value should be named: ${e.getMessage}")
      assert(e.getMessage.contains("hottest buckets") &&
        e.getMessage.contains("300 pairs"),
        s"diagnosis should name the hot buckets and their pair counts " +
          s"(60 corpus docs × 5 batch docs share every band): ${e.getMessage}")
      // raising the cap past the true candidate count (60×5=300 ids per
      // band, distinct-pair set 300) admits the same probe
      spark.conf.set("graft.dedup.probe.maxCandidates", "400")
      val pairs = TextDedup.probeAtCut(spark, cutRoot, bandsRoot, sigsRoot,
        batch, "doc_id", "text").collect()
      assert(pairs.length === 300,
        "every (corpus, batch) pair is an exact dup and must verify")
    } finally spark.conf.unset("graft.dedup.probe.maxCandidates")
  }

  test("repetitionScore arithmetic matches hand computation, null text gives null signals") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),  // 4 toks, 2 types, maxf 3; bigrams [a a, a a, a b] -> 3, distinct 2
      (2L, "x"),        // 1 tok: no bigrams -> dup_bigram 0.0; top ratio 1.0 -> repetitive
      (3L, "w1 w2 w3 w4 w5"), // all distinct
      (4L, null.asInstanceOf[String]))
      .toDF("pk", "body")
    val out = TextAnalysis.repetitionScore(docs, "pk", "body")
      .orderBy("pk").collect()
    val r1 = out(0)
    assert(r1.getInt(1) === 4)
    assert(r1.getDouble(2) === 1.0 - 2.0 / 4)     // dup_token_ratio
    assert(r1.getDouble(3) === 3.0 / 4)           // top_token_ratio
    assert(r1.getDouble(4) === 1.0 - 2.0 / 3)     // dup_bigram_ratio
    assert(r1.getBoolean(5))                      // top 0.75 > 0.3
    val r2 = out(1)
    assert(r2.getInt(1) === 1 && r2.getDouble(4) === 0.0 && r2.getBoolean(5))
    val r3 = out(2)
    assert(r3.getDouble(2) === 0.0 && r3.getDouble(4) === 0.0 && !r3.getBoolean(5))
    val r4 = out(3)
    assert((1 to 5).forall(r4.isNullAt))
  }

  test("spanCoverage: shared spans union-counted, short docs zero, nulls excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f u v w x"), // shares grams at pos 0 AND 1 with doc 2
      (2L, "a b c d e f q r s t"), // — overlapping spans must count once
      (3L, "a b c d e f u v w x"), // exact copy of 1: full coverage
      (4L, "p q r"),               // < n tokens: no grams, coverage 0
      (5L, null.asInstanceOf[String])) // excluded entirely
      .toDF("pk", "body")
    val out = TextDedup.spanCoverage(docs, "pk", "body", n = 5, threshold = 0.5)
      .orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    // doc 2 shares "a b c d e" (pos 0) and "b c d e f" (pos 1) with docs
    // 1/3: the union covers positions 0-5 = 6 tokens, NOT 5 + 5
    assert(out === Seq(
      (1L, 10, 10L, 1.0, true),  // every gram shared with its copy, doc 3
      (2L, 10, 6L, 0.6, true),
      (3L, 10, 10L, 1.0, true),
      (4L, 3, 0L, 0.0, false)))
  }

  test("spanCoverage counts inter-document sharing only — intra-doc repeats don't flag") {
    import spark.implicits._
    // "m n o p q" occurs twice WITHIN doc 1 but in no other doc: df by
    // distinct documents is 1, so nothing is covered (that repetition is
    // tx8/dupSpanProfile's signal, not dd12's)
    val docs = Seq(
      (1L, "m n o p q z z z m n o p q"),
      (2L, "entirely different tokens here now"))
      .toDF("pk", "body")
    val out = TextDedup.spanCoverage(docs, "pk", "body", n = 5)
      .orderBy("pk").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L))
  }

  test("dupSpanProfile: coverage arithmetic, lexicographic tie-break, null text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z x y z x y z"), // one phrase looping: both coverages 1.0
      (2L, "a b c d e f g h"),   // all grams unique: top count 1, tie → 'a b c'
      (3L, "b b a a b b"),       // tie among count-1 grams → 'a a b' at pos 2
      (4L, null.asInstanceOf[String]))
      .toDF("pk", "body")
    val out = TextAnalysis.dupSpanProfile(docs, "pk", "body")
      .orderBy("pk").collect()
    val r1 = out(0)
    // top 3-gram 'x y z' at 0,3,6 → covers all 9; dup 5-grams at
    // 0,1,3,4 → 5 + 1 + 2 + 1 = 9
    assert(r1.getInt(1) === 9)
    assert(r1.getInt(2) === 9 && r1.getDouble(3) === 1.0)
    assert(r1.getInt(4) === 9 && r1.getDouble(5) === 1.0)
    assert(r1.getBoolean(6))
    val r2 = out(1)
    assert(r2.getInt(2) === 3 && r2.getDouble(3) === 3.0 / 8)
    assert(r2.getInt(4) === 0 && r2.getDouble(5) === 0.0)
    val r3 = out(2)
    // grams 'b b a','b a a','a a b','a b b' all ×1; smallest is 'a a b'
    // (one occurrence, 3 tokens covered of 6)
    assert(r3.getInt(2) === 3 && r3.getDouble(3) === 0.5)
    val r4 = out(3)
    assert((1 to 6).forall(r4.isNullAt))
  }

  test("phashPairs finds planted re-encodes at hamming <= 3 and nothing else") {
    import spark.implicits._
    // the transform class pHash targets: same-length, small-amplitude,
    // position-local perturbation (a re-encode) — the fixture corpus
    // cannot exhibit it (text edits shift every downstream byte), so
    // ground truth is constructed here
    def payload(seed: Int, len: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(len)(rnd.nextInt(256).toByte)
    }
    def reencode(p: Array[Byte]): Array[Byte] =
      p.zipWithIndex.map { case (b, j) =>
        if (j % 13 == 0) (((b & 0xff) + 1) & 0xff).toByte else b
      }
    val bases = (0 until 6).map(i => (i.toLong, payload(seed = 100 + i, len = 600 + 37 * i)))
    val rows = bases ++ bases.map { case (id, p) => (id + 100L, reencode(p)) } :+
      (999L, Array.empty[Byte]) // empty payloads are excluded, not hashed
    val df = rows.toDF("media_id", "payload")
    val hashes = graft.ops.MediaDedup.blockMeanHash(df, "media_id", "payload")
    assert(hashes.count() === 12) // empty payload dropped
    val pairs = graft.ops.MediaDedup.phashPairs(df, "media_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = bases.map { case (id, _) => (id, id + 100L) }.toSet
    assert(pairs === planted,
      s"expected exactly the planted re-encode pairs, got $pairs")
    // and an identical payload hashes identically (hamming 0)
    val dup = Seq((1L, bases.head._2), (2L, bases.head._2)).toDF("media_id", "payload")
    val ph = graft.ops.MediaDedup.blockMeanHash(dup, "media_id", "payload")
      .select("phash").collect().map(_.getLong(0))
    assert(ph(0) === ph(1))
  }

  test("block_mean_hash48: kernel matches an independent spec replay; expression child evaluated once") {
    import spark.implicits._
    // independent replay of the oracle's integer spec (MultimodalOps
    // "mm5_perceptual_hash": 48 ranges, bit b = 1 iff s_b·L > total·n_b)
    def ref(bytes: Array[Byte]): Long = {
      val L = bytes.length.toLong
      val total = bytes.map(b => (b & 0xff).toLong).sum
      (0 until 48).map { b =>
        val lo = b * L / 48; val hi = (b + 1) * L / 48
        val s = (lo until hi).map(j => (bytes(j.toInt) & 0xff).toLong).sum
        if (hi > lo && s * L > total * (hi - lo)) 1L << b else 0L
      }.sum
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      Array.empty[Byte],                       // L = 0 (excluded upstream, kernel still total-0)
      Array[Byte](42),                         // L = 1 < 48: one block, bit 0 (s·L = total·n)
      Array.fill[Byte](47)(9),                 // all blocks ≤ 1 byte, all-equal → all bits 0
      Array.fill[Byte](480)(rnd.nextInt(256).toByte),
      Array.fill[Byte](481)(rnd.nextInt(256).toByte),  // non-divisible L
      Array.fill[Byte](9331)(rnd.nextInt(256).toByte)) // lognormal-tail size
    cases.foreach { p =>
      assert(graft.functions.BlockMeanHashKernel.hash(p) === ref(p))
    }
    // the DataFrame path over an EXPRESSION payload (encode of text) —
    // the shape that used to inline into per-byte substring lambdas and
    // go O(L²); values must match the kernel on the raw bytes
    val docs = Seq((1L, "a" * 47), (2L, rnd.nextString(5000)), (3L, "xyz"))
      .toDF("doc_id", "text")
    val viaDf = graft.ops.MediaDedup
      .blockMeanHash(docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("p")),
        "doc_id", "p")
      .orderBy("doc_id").collect()
    val texts = docs.orderBy("doc_id").select("text").as[String].collect()
    viaDf.zip(texts).foreach { case (row, text) =>
      val bytes = text.getBytes("UTF-8")
      assert(row.getLong(1) === bytes.length.toLong)
      assert(row.getLong(2) === ref(bytes))
    }
  }

  test("greedyPack: no-split boundaries, oversize isolation, pack-fill law") {
    import spark.implicits._
    // budget 10; shard A exercises fit/no-fit/exact-fit, B the oversize
    // paths (leading, between packs, trailing), C a null-text exclusion
    val docs = Seq(
      ("A", 1L, "t t t t"),            // 4 → pack 0 @ 0
      ("A", 2L, "t t t t t"),          // 5 → pack 0 @ 4 (fills to 9)
      ("A", 3L, "t t"),                // 2 > remaining 1 → pack 1 @ 0
      ("A", 4L, "t t t t t t t t"),    // 8 → pack 1 @ 2 (2+8 fills exactly)
      ("A", 5L, "t t"),                // 2 → pack 2 @ 0
      ("A", 6L, "t"),                  // 1 → pack 2 @ 2
      ("B", 1L, "o o o o o o o o o o o o"), // 12 oversize → pack 0, own
      ("B", 2L, "t t t"),              // 3 → pack 1 @ 0
      ("B", 3L, "o o o o o o o o o o o"),   // 11 oversize → closes pack 1 → pack 2
      ("B", 4L, "t"),                  // 1 → pack 3 @ 0
      ("C", 1L, null.asInstanceOf[String]),
      ("C", 2L, "t t t t t t t t t t")) // 10 = budget exactly: NOT oversize
      .toDF("src", "pk", "body")
    val out = graft.ops.Packing.greedyPack(docs, "pk", "body", "src", 10L)
      .orderBy("shard", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out === Array(
      ("A", 1L, 0L, 0L, false), ("A", 2L, 0L, 4L, false), ("A", 3L, 1L, 0L, false),
      ("A", 4L, 1L, 2L, false), ("A", 5L, 2L, 0L, false), ("A", 6L, 2L, 2L, false),
      ("B", 1L, 0L, 0L, true), ("B", 2L, 1L, 0L, false),
      ("B", 3L, 2L, 0L, true), ("B", 4L, 3L, 0L, false),
      ("C", 2L, 0L, 0L, false)))
    // invariant on the fixture corpus: within every (shard, pack),
    // docs are contiguous in id order, offsets telescope exactly, no
    // non-oversize pack exceeds the budget
    val fx = graft.ops.Packing.greedyPack(
      Tables.documents(spark, sf), "doc_id", "text", "source", 256L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    fx.groupBy(t => (t._1, t._4)).foreach { case ((_, _), members) =>
      val m = members.sortBy(_._2)
      assert(m.head._5 === 0L, "first doc of a pack starts at offset 0")
      m.sliding(2).foreach {
        case Array(a, b) => assert(a._5 + a._3 === b._5, "offsets telescope")
        case _ =>
      }
      val total = m.last._5 + m.last._3
      assert(m.exists(_._6) || total <= 256L, "no non-oversize pack overflows")
    }
  }

  test("packSequences: per-shard offsets, boundary straddling, shard independence") {
    import spark.implicits._
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      ("A", 1L, words(7, "a")),  // [0,7)   pack 0
      ("A", 2L, words(5, "b")),  // [7,12)  straddles packs 0-1 at budget 10
      ("A", 3L, words(3, "c")),  // [12,15) pack 1
      ("B", 1L, words(25, "d")), // [0,25)  packs 0-2
      ("B", 2L, words(1, "e")))  // [25,26) pack 2
      .toDF("src", "pk", "body")
    val out = Packing.packSequences(docs, "pk", "body", "src", 10L)
      .orderBy("shard", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out === Seq(
      ("A", 1L, 7L, 0L, 0L, 1L),
      ("A", 2L, 5L, 7L, 0L, 2L),
      ("A", 3L, 3L, 12L, 1L, 1L),
      ("B", 1L, 25L, 0L, 0L, 3L),
      ("B", 2L, 1L, 25L, 2L, 1L)))
  }

  test("topNgrams: df vs occurrences, minDf prune, deterministic tie order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"),   // 'a b' ×2, 'b a' ×1, 'b c' ×1
      (2L, "a b x"),       // 'a b' ×1, 'b x' ×1
      (3L, "b c b c"),     // 'b c' ×2, 'c b' ×1
      (4L, null.asInstanceOf[String]), // contributes nothing
      (5L, "single")       // one token → no bigram
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.topNgrams(docs, "doc_id", "text",
      n = 2, k = 10, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // df=2 both; 'a b' wins the occurrence tiebreak (3 vs 3)... both have
    // 3 occurrences, so the gram string breaks the tie: 'a b' < 'b c'
    assert(out === Seq(("a b", 2L, 3L), ("b c", 2L, 3L)))
    // without the df cutoff the singleton tail appears, k caps the rows
    val all = graft.ops.TextAnalysis.topNgrams(docs, "doc_id", "text",
      n = 2, k = 3, minDf = 1).collect()
    assert(all.length === 3)
    assert(all.head.getString(0) === "a b")
  }
}
