package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextHashUdfs

/** Public dedup API over arbitrary document DataFrames — the
  * parameterized form of the verified `dd*` queries (column names and
  * thresholds are caller-chosen; hash family and band layout are fixed
  * constants so results stay reproducible across runs and engines).
  *
  * All pipelines: shuffle-free signature map → banded candidate join →
  * exact verification on candidates. See SCALE.md for the 100 TB
  * analysis of each.
  */
object TextDedup {

  /** Normalized-content fingerprint (whitespace-collapsed lowercase md5). */
  def fingerprint(textCol: Column): Column =
    md5(regexp_replace(lower(trim(textCol)), "\\s+", " "))

  /** Canonical-representative selection: per content-fingerprint group,
    * keep the "best" document — highest `qualityCol`, ties to the lowest
    * id. One aggregate with map-side combine (min over an inverted-
    * quality struct), no window, so it holds at any group count.
    * Output: fingerprint, rep_id, rep_quality, n_docs. */
  def pickCanonical(docs: DataFrame, idCol: String, textCol: String,
                    qualityCol: String): DataFrame =
    docs.select(fingerprint(col(textCol)).as("fingerprint"),
        col(idCol).as("__id"), col(qualityCol).as("__q"))
      .groupBy("fingerprint")
      .agg(min(struct((-col("__q")).as("negq"), col("__id").as("id"))).as("__m"),
        count(lit(1)).as("n_docs"))
      .select(col("fingerprint"), col("__m.id").as("rep_id"),
        (-col("__m.negq")).as("rep_quality"), col("n_docs"))

  /** Exact dedup: every row keyed by content fingerprint; lowest id per
    * group is canonical. Output: idCol, fingerprint, canonical_id, is_dup. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))
      .withColumn("canonical_id", min(idCol).over(Window.partitionBy("fingerprint")))
      .withColumn("is_dup", col(idCol) =!= col("canonical_id"))

  /** Incremental dedup of a new document batch against an existing
    * corpus snapshot — the 100 TB ingestion shape: the snapshot is the
    * accumulated corpus (huge, append-only), the batch is one crawl/day
    * increment (small). A full batch⋈snapshot anti-join would shuffle
    * the entire snapshot on every increment, so the snapshot scan is
    * pre-filtered with a Bloom filter built over the BATCH fingerprints
    * (the small side — its sketch is MBs at millions of docs and
    * broadcastable; a filter over a billion-doc snapshot would not be):
    * only snapshot rows whose fingerprint might collide with the batch
    * reach the shuffle. Correct by construction — the filter has no
    * false negatives, so every true match survives to the exact join,
    * and false positives are discarded by the equi-join itself.
    *
    * The `mightContainString` probe is a scalar UDF over the broadcast
    * sketch: Spark's own `BloomFilterMightContain` expression (what the
    * runtime bloom-join rule injects) is not public API, and the probe
    * sits behind the pushed-down parquet scan either way.
    *
    * Output: idCol, fingerprint, is_dup_of_snapshot — every batch row,
    * flagged. Keep the `false` rows; a pipeline appends them to the
    * snapshot. */
  def incrementalDedup(batch: DataFrame, snapshot: DataFrame,
                       idCol: String, textCol: String,
                       fpp: Double = 0.01,
                       expectedBatchItems: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    val batchFps = batch.select(col(idCol),
      fingerprint(col(textCol)).as("fingerprint"))
    val snapFps = snapshot.select(fingerprint(col(textCol)).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
    // Sizing the filter exactly would cost a count() pass over the batch;
    // overprovisioning costs only sketch bytes (1M capacity @ 1% ≈ 1.2 MB
    // — broadcast-trivial, and each scan task carries one sketch into the
    // merge, so capacity × partitions is the real bound) and DRIVES fpp
    // DOWN when the batch is smaller, so the default skips the count.
    // Callers whose batch may exceed the default pass their own estimate:
    // an undersized filter stays correct (no false negatives ever) but
    // its fpp degrades and the prefilter passes more of the snapshot
    // through to the join.
    val bloom = batchFps.filter(col("fingerprint").isNotNull)
      .stat.bloomFilter("fingerprint",
        math.max(expectedBatchItems.getOrElse(1L << 20), 1L), fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((fp: String) => fp != null && bc.value.mightContainString(fp))
    val hits = snapFps.filter(mightContain(col("fingerprint")))
      .distinct()
      .withColumn("__in_snap", lit(true))
    batchFps.join(hits, Seq("fingerprint"), "left")
      .select(col(idCol), col("fingerprint"),
        coalesce(col("__in_snap"), lit(false)).as("is_dup_of_snapshot"))
  }

  /** MinHash-LSH near-dup pairs: 16-hash signatures over 3-token
    * shingles, 4×4 banding, signature-estimated Jaccard ≥ threshold.
    *
    * `maxBucketSize` is the hot-bucket guard for collapsed-vocabulary
    * corpora (boilerplate pages sharing one band value would otherwise
    * make that bucket's self-join quadratic): buckets with more than
    * `max` members are dropped before the join, bounding any bucket's
    * pair count by max². Guarded output ⊆ unguarded output; `None`
    * (default) changes nothing.
    * Output: doc_a, doc_b, est_jaccard. */
  /** (id, 16-long MinHash signature) rows — the shared signature pass
    * of [[minhashLsh]] and [[incrementalMinhashLsh]] (one definition so
    * the symmetric and incremental forms cannot drift; their
    * equivalence is pinned in TrainingDataOpsSpec). */
  private def minhashSigs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__id"), TextHashUdfs.minhashSig3(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)

  /** Banded view of [[minhashSigs]] output: (id, band, bkey) only — the
    * candidate join must not shuffle the signature arrays; they
    * re-attach after the id-pair dedup. */
  private def minhashBands(sigs: DataFrame): DataFrame =
    sigs.select(col("__id"),
      posexplode(expr(
        """array(concat_ws('_', slice(sig, 1, 4)), concat_ws('_', slice(sig, 5, 4)),
          |      concat_ws('_', slice(sig, 9, 4)), concat_ws('_', slice(sig, 13, 4)))""".stripMargin))
        .as(Seq("band", "bkey")))

  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.5,
                 maxBucketSize: Option[Int] = None): DataFrame = {
    val sigs = minhashSigs(docs, idCol, textCol)
    val bands0 = minhashBands(sigs)
    val bands = maxBucketSize match {
      case None => bands0
      case Some(max) =>
        val ok = bands0.groupBy("band", "bkey")
          .agg(count(lit(1)).as("__n")).filter(col("__n") <= max)
          .select("band", "bkey")
        bands0.join(ok, Seq("band", "bkey"), "left_semi")
    }
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.select(col("__id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("__id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))") / 16.0)
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** Incremental MinHash-LSH: near-dup pairs between a NEW batch and an
    * accumulated corpus snapshot — the fuzzy complement of
    * [[incrementalDedup]] (which only catches byte-identical content).
    * The asymmetry is the whole design: the snapshot is huge and
    * append-only, the batch is one increment, so
    *  - band keys of the BATCH broadcast (a 16-hash/4-band signature set
    *    over millions of batch docs is small); the snapshot's band rows
    *    probe them in a broadcast join — the snapshot side NEVER
    *    shuffles, and with the band-key predicate pushed nothing but
    *    matching rows leaves the scan stage;
    *  - only surviving candidate pairs shuffle (ids, not arrays); batch
    *    signatures re-attach by broadcast, snapshot signatures by an
    *    id-equi-join over candidates only.
    * Pairs verified at signature-estimated Jaccard ≥ threshold, exactly
    * dd2's semantics. Output: snap_id, batch_id, est_jaccard. */
  def incrementalMinhashLsh(batch: DataFrame, snapshot: DataFrame,
                            idCol: String, textCol: String,
                            threshold: Double = 0.5): DataFrame = {
    val bSigs = minhashSigs(batch, idCol, textCol)
    val sSigs = minhashSigs(snapshot, idCol, textCol)
    val cand = minhashBands(sSigs).join(
        broadcast(minhashBands(bSigs).withColumnRenamed("__id", "batch_id")),
        Seq("band", "bkey"))
      .select(col("__id").as("snap_id"), col("batch_id"))
      .distinct()
    // broadcast the candidate side BY CONSTRUCTION (it is bounded by
    // batch band matches, not by snapshot size): without the hint the
    // planner broadcasts it at fixture scale from statistics alone, but
    // at production scale a mis-estimate could flip this to a shuffle
    // join and drag the snapshot signature arrays through an Exchange —
    // the exact shape this operator exists to avoid
    broadcast(cand)
      .join(sSigs.select(col("__id").as("snap_id"), col("sig").as("sig_a")), "snap_id")
      .join(broadcast(bSigs.select(col("__id").as("batch_id"), col("sig").as("sig_b"))),
        "batch_id")
      .withColumn("est_jaccard",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))") / 16.0)
      .filter(col("est_jaccard") >= threshold)
      .select("snap_id", "batch_id", "est_jaccard")
  }

  // ── the LSH index as a MAINTAINED STORE ────────────────────────────
  // dd10's incremental probe recomputes the snapshot's signatures per
  // batch — fine when the snapshot is a parquet slice, wrong at 100 TB
  // where the signature pass over the corpus costs more than the probe.
  // The maintained form persists the index as two IncrementalAgg
  // replicas advanced by the DOCUMENT change feed: `sigs` keyed by the
  // doc id, and `bands` keyed (id, band) BUCKETED ON `bkey` so a probe
  // opens only the buckets its band keys hash into (the ir5 postings
  // pattern). Signature/band rows are pure row-wise functions of a doc
  // row, so the index feeds derive from the doc feed with no extra
  // reads, and the stores can never disagree with the corpus they
  // index when committed under one Coordinator cut.

  /** (idCol, sig) rows — the signature STORE's row shape (public form
    * of the shared signature pass). Docs under 3 tokens have no
    * signature and are absent, exactly as in every symmetric form. */
  def signatureRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    minhashSigs(docs, idCol, textCol).withColumnRenamed("__id", idCol)

  /** (idCol, band, bkey) rows — the band-posting STORE's row shape;
    * seed/bucket the replica on `bkey` so probes prune. */
  def bandRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    minhashBands(minhashSigs(docs, idCol, textCol))
      .withColumnRenamed("__id", idCol)

  /** The index stores' change feeds derived from the DOCUMENT feed
    * (a [[graft.etl.ChangeFeed.diff]] output): deletes/update-preimages
    * map to deletes of the doc's signature row and band rows,
    * inserts/update-postimages to inserts — reclassified to plain
    * delete+insert so a doc crossing the 3-token signature boundary in
    * either direction maps exactly (the side with no signature simply
    * contributes no rows; an update never needs its other half).
    * Returns (sigFeed, bandFeed). Cost: two signature passes over the
    * delta (one per polarity) — persist the doc feed, as every
    * maintenance caller already does. */
  def indexFeeds(docFeed: DataFrame, idCol: String,
                 textCol: String): (DataFrame, DataFrame) = {
    require(docFeed.columns.contains("_change_type"),
      "indexFeeds takes a ChangeFeed.diff output (missing _change_type)")
    def half(types: Seq[String], out: String): (DataFrame, DataFrame) = {
      val sigs = minhashSigs(
        docFeed.filter(col("_change_type").isin(types: _*)), idCol, textCol)
      (sigs.withColumnRenamed("__id", idCol)
        .withColumn("_change_type", lit(out)),
        minhashBands(sigs).withColumnRenamed("__id", idCol)
          .withColumn("_change_type", lit(out)))
    }
    val (sd, bd) = half(Seq("delete", "update_preimage"), "delete")
    val (si, bi) = half(Seq("insert", "update_postimage"), "insert")
    (sd.unionByName(si), bd.unionByName(bi))
  }

  /** Near-dup probe of a batch against the MAINTAINED index — dd10's
    * asymmetric semantics with the snapshot side never recomputed OR
    * fully read: the band store opens only the buckets the batch's
    * band keys hash into ([[graft.etl.IncrementalAgg.readViewPrunedBy]];
    * probe cost ∝ the batch's share of the band space, independent of
    * corpus size), candidates verify against the signature store read
    * pruned to exactly the candidate ids.
    * Output: (snap_id, batch_id, est_jaccard ≥ threshold) —
    * row-identical to [[incrementalMinhashLsh]] over the corpus the
    * stores maintain (the differential TrainingDataOpsSpec pins).
    * The candidate plan (pruned band read ⋈ broadcast batch bands) is
    * evaluated exactly ONCE: its result is materialized driver-side —
    * the identical rows `broadcast(cand)` would collect to the driver
    * at action time anyway, so the bound is the broadcast's own — and
    * both the sig read's bucket probe and the verification join run
    * over that local relation. EAGER by consequence: constructing the
    * probe runs the candidate Spark jobs at CALL time and captures the
    * candidate set then, not at first action — don't build probes
    * speculatively.
    *
    * PRIVATE since r20 (r19 verdict, missing #4): its independent
    * `bandsVersion`/`sigsVersion` knobs are exactly the mixed-version
    * hazard (bands@N against sigs@N−1) the coordinator exists to
    * prevent, so the only public entry is [[probeAtCut]], where both
    * pins come from ONE resolved cut and the hazard is
    * unrepresentable. */
  private def probeMaintainedIndex(spark: org.apache.spark.sql.SparkSession,
                           bandsRoot: String, sigsRoot: String,
                           batch: DataFrame, idCol: String, textCol: String,
                           threshold: Double,
                           bandsView: String,
                           sigsView: String,
                           bandsVersion: Option[Long],
                           sigsVersion: Option[Long]): DataFrame = {
    import graft.etl.IncrementalAgg
    import scala.jdk.CollectionConverters._
    val bSigs = minhashSigs(batch, idCol, textCol)
    val bBands = minhashBands(bSigs)
    val sBands = IncrementalAgg.readViewPrunedBy(spark, bandsRoot, bandsView,
      Seq("bkey"), bBands.select("bkey"), bandsVersion)
    val candPlan = sBands.join(
        broadcast(bBands.withColumnRenamed("__id", "batch_id")),
        Seq("band", "bkey"))
      .select(col(idCol).as("snap_id"), col("batch_id")).distinct()
    // HARD CAP on the driver-side materialization (r19 verdict): the
    // candidate set is delta-bounded for healthy batches, but a
    // degenerate one (every doc sharing one band — boilerplate spam,
    // an empty-text flood) makes it |batch|×|bucket| with no bound
    // before the collect. limit(cap+1) keeps the fetch itself bounded;
    // on overflow we pay one extra diagnostic job to name the hot
    // buckets instead of OOMing the driver. Tunable per session via
    // graft.dedup.probe.maxCandidates.
    val maxCand = spark.conf.getOption("graft.dedup.probe.maxCandidates")
      .map(_.toInt).getOrElse(4000000)
    val fetched = candPlan.limit(maxCand + 1).collect()
    if (fetched.length > maxCand) {
      val hot = sBands
        .join(broadcast(bBands.withColumnRenamed("__id", "batch_id")),
          Seq("band", "bkey"))
        .groupBy("band", "bkey").count()
        .orderBy(col("count").desc).limit(5).collect()
        .map(r => s"(band=${r.get(0)}, bkey=${r.get(1)}: ${r.getLong(2)} pairs)")
      throw new IllegalStateException(
        s"maintained-index probe: candidate set exceeds " +
        s"graft.dedup.probe.maxCandidates=$maxCand — the batch's band " +
        s"distribution is degenerate (hottest buckets: " +
        s"${hot.mkString(", ")}). Split the batch, drop the hot band " +
        s"keys, or raise the cap if the driver can hold it.")
    }
    val cand = spark.createDataFrame(fetched.toSeq.asJava, candPlan.schema)
    val sSigs = IncrementalAgg.readViewPrunedBy(spark, sigsRoot, sigsView,
      Seq(idCol), cand.select(col("snap_id").as(idCol)), sigsVersion)
    broadcast(cand)
      .join(sSigs.select(col(idCol).as("snap_id"), col("sig").as("sig_a")),
        "snap_id")
      .join(broadcast(bSigs.select(col("__id").as("batch_id"),
        col("sig").as("sig_b"))), "batch_id")
      .withColumn("est_jaccard",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))") / 16.0)
      .filter(col("est_jaccard") >= threshold)
      .select("snap_id", "batch_id", "est_jaccard")
  }

  /** The maintained-index probe with BOTH store versions pinned from
    * ONE [[graft.etl.Coordinator]] cut — since r20 the ONLY public
    * entry (the raw form's independent version options could probe
    * bands@N against sigs@N−1, exactly the mixed-version read the
    * coordinator exists to prevent; it is private now). The cut is
    * resolved once (`cutVersion` = None → the current cut; Some(v) →
    * time travel to the pairing as of coordinator version v) and a
    * missing member name fails loudly instead of silently falling
    * back to an unpinned read. `bandsMember`/`sigsMember` are the
    * member names the cut records (the dd13 gate commits them as
    * "bands"/"sigs"). EAGER: building the probe runs the candidate
    * jobs at call time (see the private form's Scaladoc). */
  def probeAtCut(spark: org.apache.spark.sql.SparkSession, cutRoot: String,
                 bandsRoot: String, sigsRoot: String, batch: DataFrame,
                 idCol: String, textCol: String, threshold: Double = 0.5,
                 bandsView: String = "bands", sigsView: String = "sigs",
                 bandsMember: String = "bands", sigsMember: String = "sigs",
                 cutVersion: Option[Long] = None): DataFrame = {
    import graft.etl.Coordinator
    val cut = cutVersion match {
      case Some(v) => Coordinator.cutAt(spark, cutRoot, v)
      case None    => Coordinator.currentCut(spark, cutRoot)
    }
    def pinned(member: String): Long = cut.getOrElse(member,
      throw new IllegalArgumentException(
        s"cut at $cutRoot names no member '$member' (has: ${cut.keys.toSeq.sorted.mkString(",")})"))
    probeMaintainedIndex(spark, bandsRoot, sigsRoot, batch, idCol, textCol,
      threshold, bandsView, sigsView,
      bandsVersion = Some(pinned(bandsMember)),
      sigsVersion = Some(pinned(sigsMember)))
  }

  /** SimHash near-dup pairs: 48-bit signatures, 4×12-bit chunk banding
    * (pigeonhole-complete for maxHamming ≤ 3), verified hamming.
    * Output: doc_a, doc_b, hamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only complete for hamming <= 3")
    val sims = docs.select(col(idCol).as("__id"),
      TextHashUdfs.simhash48(col(textCol)).as("simhash"))
    val chunks = sims.select(col("__id"), col("simhash"),
      posexplode(expr(
        """array(simhash & 4095, shiftright(simhash, 12) & 4095,
          |      shiftright(simhash, 24) & 4095, shiftright(simhash, 36) & 4095)""".stripMargin))
        .as(Seq("chunk_idx", "chunk")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      // filter BEFORE the distinct, explicitly: the dedup only has to
      // hash surviving near-dup pairs, not every bucket-candidate pair.
      // At the 500k-doc sf10 rung the 12-bit chunk buckets emit ~8.2e9
      // candidates — Catalyst would push this predicate below the
      // Aggregate anyway, but the contract is too load-bearing at scale
      // to leave to the optimizer.
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** n-gram Jaccard pairs via shared-shingle candidate join. Shingles
    * are joined by their 60-bit md5-derived hash (H), not the raw
    * string: the self-join shuffle then moves 8-byte longs instead of
    * ~30-char strings. Jaccard is computed over the hashed sets — exact
    * up to H collisions (≈2^-60 per shingle pair, and deterministic:
    * any engine replaying H sees the identical result).
    * Output: doc_a, doc_b, jaccard. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 5, threshold: Double = 0.5,
                   maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
        TextHashUdfs.shingleHashSet(n)(col(textCol)).as("shset"))
      .filter(col("shset").isNotNull)
    val sizes = sh.select(col("__id"), size(col("shset")).as("nsh"))
    val exploded0 = sh.select(col("__id"), explode(col("shset")).as("sh"))
    // stop-shingle removal: a shingle in f docs yields f² join rows, so
    // boilerplate shared by thousands of docs would dominate the shuffle;
    // dropping shingles with df > cutoff bounds that (None = exact).
    // NOTE: unlike the bucket guard above this changes jaccard values
    // (intersections lose the dropped shingles) — it is the standard
    // accuracy/cost trade, off by default.
    val exploded = maxShingleDf match {
      case None => exploded0
      case Some(cut) =>
        val ok = exploded0.groupBy("sh")
          .agg(count(lit(1)).as("__df")).filter(col("__df") <= cut)
          .select("sh")
        exploded0.join(ok, Seq("sh"), "left_semi")
    }
    val inter = exploded.as("a").join(exploded.as("b"),
        col("a.sh") === col("b.sh") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("__id").as("doc_b"), col("nsh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Winnowed rolling-hash fingerprint SET per document (the
    * MOSS/winnowing sketch — [[graft.functions.WinnowUdf]] has the
    * algorithm and guarantees): normalization is a codegen'd Catalyst
    * projection (the dd1 fingerprint normalization), hashing+selection
    * one O(len) UDF pass, no shuffle. Documents shorter than k
    * normalized characters have no k-gram and are dropped (matching the
    * oracle's length gate). Output: idCol, fps (array<long>, distinct). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 30, w: Int = 8): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    // gate on the CHEAP precondition (normalized length ≥ k ⟺ the UDF
    // yields a non-empty set) instead of filtering the UDF output:
    // a post-UDF isNotNull gets substituted through the projection by
    // predicate pushdown and re-evaluates the whole winnow pass inside
    // the scan filter — this length check pushes down as codegen'd
    // string arithmetic instead
    docs.filter(length(norm) >= k)
      .select(col(idCol), graft.functions.WinnowUdf(k, w)(norm).as("fps"))
  }

  /** Containment pairs via winnowed fingerprints: detects documents one
    * of which substantially CONTAINS the other's content (quotes,
    * boilerplate-wrapped copies, subset pages) — the asymmetric relation
    * resemblance-based dedup (dd2/dd4's Jaccard) under-scores, because a
    * small doc inside a big one has low Jaccard but containment ≈ 1.
    *
    * Shape: fingerprint map (no shuffle) → explode SETS (density ~2/(w+1)
    * of positions, not the full k-gram stream) → optional stop-fingerprint
    * cutoff (same f² join-row argument as [[ngramJaccard]]'s
    * maxShingleDf; off by default, trades recall for a bounded shuffle)
    * → shared-fingerprint equi-join on 8-byte longs → per-pair overlap
    * count → containment = |F_a ∩ F_b| / min(|F_a|, |F_b|), a single
    * exact IEEE division. Never an all-pairs join.
    * Output: doc_a, doc_b, containment. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 30, w: Int = 8, threshold: Double = 0.5,
                       maxFingerprintDf: Option[Int] = None): DataFrame = {
    // the fingerprint-set size rides along with every posting (4 bytes a
    // row) instead of a separate sizes table: the denominators then fall
    // out of the pair aggregation itself, so the corpus is scanned — and
    // the winnow UDF evaluated — exactly ONCE, with no join-back
    val exploded0 = winnowFingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), size(col("fps")).as("nf"),
        explode(col("fps")).as("f"))
    val exploded = maxFingerprintDf match {
      case None => exploded0
      case Some(cut) =>
        val ok = exploded0.groupBy("f")
          .agg(count(lit(1)).as("__df")).filter(col("__df") <= cut)
          .select("f")
        exploded0.join(ok, Seq("f"), "left_semi")
    }
    exploded.as("a").join(exploded.as("b"),
        col("a.f") === col("b.f") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .agg(count(lit(1)).as("shared"),
        first(col("a.nf")).as("na"), first(col("b.nf")).as("nb"))
      .withColumn("containment",
        col("shared").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "containment")
  }

  /** Duplicated-span coverage per document (the C4/RefinedWeb "repeated
    * span" signal): the fraction of each document's token positions
    * covered by a token n-gram that also occurs in at least `minDf - 1`
    * OTHER documents. Complements the pair detectors — dd2/dd4/dd9
    * answer "which documents duplicate each other", this answers "how
    * much of THIS document is corpus-boilerplate", the per-doc score a
    * curation pipeline thresholds to drop template-dominated pages
    * (intra-document repetition is [[TextAnalysis.dupSpanProfile]]'s
    * job; grams repeated only within one document do not count here).
    *
    * Shape — and why, unlike every pair detector in this file, it needs
    * NO hot-gram guard: a gram occurring in f documents contributes f
    * rows to the semi-join output (linear), not f² pair rows, so
    * boilerplate cannot blow up the shuffle. The pipeline is
    *  1. positioned gram hashes, one UDF pass, no shuffle
    *     ([[graft.functions.TextHashUdfs.hashedNgramSeq]]);
    *  2. gram document-frequency: distinct (doc, H) → count per H —
    *     both aggregates partial-combine, shuffle rows are 16-byte
    *     (id, long) postings, volume = corpus token count (the inherent
    *     cost of span-level dedup; compare tx7's census argument);
    *  3. left-semi join of postings against the surviving gram set on
    *     8-byte longs;
    *  4. interval union per document: matched starts sorted by a
    *     per-doc window, each start covers min(n, gap-to-previous-start)
    *     new positions — overlapping spans are never double-counted.
    *     The window partitions by document, so its state is one
    *     document's matches, never corpus-sized.
    * covered/n_tokens is a single IEEE division of exact integers —
    * hash-identical across engines.
    *
    * Output (every non-null-text doc): idCol, n_tokens, covered_tokens,
    * dup_span_frac, flagged (frac ≥ threshold). */
  def spanCoverage(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 5, minDf: Int = 2,
                   threshold: Double = 0.5): DataFrame = {
    require(n >= 1, s"span width must be >= 1, got $n")
    require(minDf >= 2, s"minDf < 2 would flag every gram, got $minDf")
    val withText = docs.filter(col(textCol).isNotNull)
    val posts = withText
      .select(col(idCol).as("__id"),
        posexplode(TextHashUdfs.hashedNgramSeq(n)(col(textCol)))
          .as(Seq("pos", "h")))
    val shared = posts.select("__id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select("h")
    val w = Window.partitionBy("__id").orderBy("pos")
    val gap = col("pos") - lag("pos", 1).over(w)
    val covered = posts.join(shared, Seq("h"), "left_semi")
      .select(col("__id"),
        when(gap.isNull, lit(n)).otherwise(least(lit(n), gap)).as("__c"))
      .groupBy("__id").agg(sum("__c").as("covered_tokens"))
    // the doc spine re-derives n_tokens from codegen'd split arithmetic
    // (not the gram UDF) so this side of the join never pays the
    // hashing pass
    val frac = when(col("n_tokens") > 0,
      col("covered_tokens").cast("double") / col("n_tokens")).otherwise(lit(0.0))
    withText
      .select(col(idCol), TextAnalysis.nTokensCol(col(textCol)).as("n_tokens"))
      .join(covered.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .withColumn("covered_tokens", coalesce(col("covered_tokens"), lit(0L)))
      .withColumn("dup_span_frac", frac)
      .withColumn("flagged", frac >= threshold)
  }
}
