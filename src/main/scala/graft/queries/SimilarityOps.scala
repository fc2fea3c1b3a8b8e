package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{DetHash, VectorExprs}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * [extension — north star]. Two paths:
  *
  *   sim1 — brute-force exact cosine top-k: the correctness baseline.
  *     Query side is a tiny fixed set broadcast against the corpus; the
  *     scan stays map-side (one pass over the corpus per batch of
  *     queries), then a per-query top-k window. Scale: O(|Q|·N) with no
  *     shuffle of the corpus — the right baseline even at 100 TB when
  *     |Q| is small.
  *
  *   sim2 — multi-probe LSH ANN: 8-bit random-hyperplane signatures
  *     (md5-derived planes, [[DetHash.planes]]); each query probes its
  *     own bucket plus every bucket within hamming distance 2, then
  *     exact-verifies only the candidates. Scale: candidates per query
  *     ≈ 37·N/2^8 — the corpus is joined on signature equality, never
  *     cross-joined; widen SIGBITS / shrink probe depth as the corpus
  *     grows to keep buckets small.
  *
  * Both are DuckDB-oracle-checked: decimal-cast dot products make the
  * cosine bit-identical across engines (see [[VectorExprs]]).
  */
object SimilarityOps {

  private val TOPK = 10
  private val NQUERIES = 10
  /** ANN bucket width: 8 bits → 256 buckets. */
  private val SIGBITS = 8
  /** sim6 stage-1 shortlist depth. */
  private val SHORTLIST = 50
  /** sim7 PQ: subspace count and codebook seed id range (32 codewords;
    * 16 subspaces of 4 dims — on this near-uniform synthetic corpus,
    * measured recall peaks at many narrow subspaces, see OpsApiSpec). */
  private val PQ_NSUB = 16
  private val PQ_SEED_LO = 40
  private val PQ_SEED_HI = 72
  /** sim11: 8 learned lists, 2 Lloyd iterations, 3 probes. */
  private val KM_K = 8
  private val KM_ITERS = 2
  private val KM_NPROBE = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim1_cosine_topk" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      graft.ops.VectorSearch.cosineTopK(s, corpus,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding", TOPK)
        .orderBy("query_id", "rank")
    }),

    "sim2_ann_lsh" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      graft.ops.VectorSearch.annTopK(s, corpus,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding", TOPK,
          sigBits = SIGBITS, probeHamming = 2,
          // the DuckDB oracle hardcodes duckPlaneLit(64); fail loudly if
          // the fixture ever carries a different embedding width
          oracleDim = 64)
        .orderBy("query_id", "rank")
    }),

    // IVF variant: inverted lists under 16 seed-vector centroids
    // (vec_id 20..35), nprobe=4 — each query exact-verifies ~1/4 of the
    // corpus instead of all of it.
    "sim3_ann_ivf" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      graft.ops.VectorSearch.ivfTopK(s, corpus,
          corpus.filter(col("vec_id") < NQUERIES),
          corpus.filter(col("vec_id") >= 20 && col("vec_id") < 36),
          "vec_id", "embedding", TOPK, nprobe = 4)
        .orderBy("query_id", "rank")
    }),

    // int8 scalar quantization: 4× smaller corpus, integer scoring — the
    // bandwidth/memory scale path (see VectorSearch.scalarQuantTopK).
    "sim4_scalar_quant" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      graft.ops.VectorSearch.scalarQuantTopK(s, corpus,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding", TOPK)
        .orderBy("query_id", "rank")
    }),

    // sim5 — embedding outlier scoring [extension]: squared distance to
    // the decimal-exact corpus centroid, 20 most distant vectors — the
    // embedding-quality gate (off-distribution items) a training
    // pipeline runs beside near-dup removal. Centroid = dim-row
    // aggregate broadcast back; scoring is a map; top-k is
    // TakeOrderedAndProject.
    "sim5_centroid_outliers" -> ((s, dir) =>
      graft.ops.VectorSearch.centroidOutliers(
        Tables.embeddings(s, dir), "vec_id", "embedding", k = 20)),

    // sim6 — two-stage re-rank [extension]: the int8 quantized scan
    // keeps a 50-deep shortlist per query (4× less bandwidth), then
    // only those ids re-score at exact float cosine — the production
    // serving shape (cheap wide recall → precise re-rank); stage-2 cost
    // is corpus-size-independent (VectorSearch.rerankTopK Scaladoc).
    "sim6_two_stage_rerank" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      graft.ops.VectorSearch.rerankTopK(s, corpus,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding",
          k = TOPK, shortlist = SHORTLIST)
        .orderBy("query_id", "rank")
    }),

    // sim7 — product-quantization ANN [extension]: 16 subspaces × 32
    // codewords over int8-quantized vectors → 16 five-bit codes ≈ 10
    // packed bytes (25× vs float32 — the compression tier past sim4's
    // 4× that keeps a 100 TB embedding corpus scan-resident); ADC
    // scoring = 16 integer LUT lookups per candidate, exact BIGINTs
    // end-to-end so the ranking hash-matches the oracle
    // (VectorSearch.pqTopK Scaladoc). Codebook seeds are corpus rows
    // 40..71 (k-means output at production scale, like sim3's centroid
    // seeds).
    "sim7_pq_ann" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      graft.ops.VectorSearch.pqTopK(s, corpus,
          corpus.filter(col("vec_id") < NQUERIES),
          corpus.filter(col("vec_id") >= PQ_SEED_LO && col("vec_id") < PQ_SEED_HI),
          "vec_id", "embedding", TOPK, nSub = PQ_NSUB)
        .orderBy("query_id", "rank")
    }),

    // sim8 — ANN recall evaluation [extension]: the tuning loop every
    // ANN deployment runs — recall@k of each compressed ranking against
    // the EXACT baseline of its own metric (sim4's quantized-cosine vs
    // exact cosine; sim7's L2-ADC vs exact L2 — the PQ paper's
    // protocol). All four rankings are deterministic, so even this
    // measurement query is hash-gated end-to-end. Eval cost is
    // k·|Q|-row joins — corpus-size-independent once the rankings are
    // priced (VectorSearch.recallVsExact).
    "sim8_recall_eval" -> ((s, dir) => {
      val V = graft.ops.VectorSearch
      val corpus = Tables.embeddings(s, dir)
      val qs = corpus.filter(col("vec_id") < NQUERIES)
      val seeds = corpus.filter(col("vec_id") >= PQ_SEED_LO && col("vec_id") < PQ_SEED_HI)
      // The four input rankings materialize once per session (k·|Q| rows
      // each — tiny): the battery already prices the corpus scans behind
      // them in sim1/sim4/sim7, so the eval query prices the MEASUREMENT
      // (the k·|Q| joins) — the Shared.lshPairs contract. Results are
      // bit-identical to inline recomputation (persist is semantics-free;
      // the oracle hash is unchanged).
      val exactCos = Shared.frame(s, dir, "rank_exact_cos")(
        V.cosineTopK(s, corpus, qs, "vec_id", "embedding", TOPK))
      val sq = Shared.frame(s, dir, "rank_scalar_quant")(
        V.scalarQuantTopK(s, corpus, qs, "vec_id", "embedding", TOPK))
      val exactL2 = Shared.frame(s, dir, "rank_exact_l2")(
        V.l2TopK(s, corpus, qs, "vec_id", "embedding", TOPK))
      val pq = Shared.frame(s, dir, "rank_pq")(
        V.pqTopK(s, corpus, qs, seeds, "vec_id", "embedding", TOPK, nSub = PQ_NSUB))
      V.recallVsExact(exactCos, sq, "scalar_quant_vs_cosine")
        .unionAll(V.recallVsExact(exactL2, pq, "pq_vs_l2"))
        .orderBy("method")
    }),

    // sim9 — MMR diversified selection [extension]: maximal marginal
    // relevance (Carbonell & Goldstein 1998) over each query's exact
    // top-20 pool — greedy picks trade relevance against redundancy so
    // retrieved context (or sampled training examples) stays DIVERSE
    // instead of five near-copies of the best hit. The greedy unrolls
    // into 5 relational steps (no driver loop over rows); cosines and
    // the fixed λ-arithmetic are bit-exact, so the entire greedy
    // TRAJECTORY is hash-gated against a 5-chained-CTE oracle generated
    // from the same constants (VectorSearch.mmrDiversify).
    // sim10 — random-projection ANN [extension]: the THIRD compression
    // tier (sim4 quantizes values, sim7 quantizes codewords, this
    // reduces DIMENSIONS): 64→16 deterministic JL projection onto the
    // md5-derived hyperplanes (the un-thresholded form of sim2's
    // signatures), cosine ranked entirely in the projected space — 4×
    // less read per vector; fixed-order double folds make even this
    // approximate ranking oracle-replayable from the same plane
    // literal. Recall vs exact pinned in OpsApiSpec.
    "sim10_random_projection" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      graft.ops.VectorSearch.rpTopK(s, corpus,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding",
          TOPK, dims = 16, oracleDim = 64)
        .orderBy("query_id", "rank")
    }),

    "sim9_mmr_diversify" -> ((s, dir) => {
      val V = graft.ops.VectorSearch
      val corpus = Tables.embeddings(s, dir)
      val qs = corpus.filter(col("vec_id") < NQUERIES)
      // pool + pairwise sims materialize once per session (poolK·|Q| and
      // poolK²·|Q| rows — tiny): repeated diversifications price the
      // greedy, not the corpus scans behind its inputs. Shared.materialized
      // keeps the r8 eager-materialization fix and picks the form by
      // deployment: localCheckpoint in this single-JVM harness, durable
      // write-and-read-back tables when `graft.materialize.dir` points
      // at cluster-visible storage (executor loss then costs nothing —
      // MaterializeSpec pins the two forms row-identical). Oracle hash
      // unchanged.
      val pool = Shared.materialized(s, dir, "mmr_pool")(
        V.mmrPool(s, corpus, qs, "vec_id", "embedding", poolK = 20))
      val sims = Shared.materialized(s, dir, "mmr_sims")(
        V.mmrSims(s, corpus, pool, "vec_id", "embedding"))
      V.mmrDiversifyPrebuilt(pool, sims, k = 5, lambdaRel = 0.7)
        .orderBy("query_id", "pick_order")
    }),

    // sim11 — LEARNED-centroid IVF [extension]: closes sim3's "at
    // production scale, k-means output" loop under the oracle gate.
    // Lloyd runs in integer space over int8-quantized vectors with
    // SUM-centroids (cosine is scale-invariant, so the mean's division
    // — the one step ordinary float k-means cannot reproduce across
    // partitionings — never happens; cluster sums are exact BIGINTs
    // under any aggregation order). The oracle replays both Lloyd
    // iterations as unrolled CTEs; candidates exact-verify at float
    // cosine, so the output schema matches sim3's.
    // Train/serve split (r9 verdict ask #6): the coarse quantizer is
    // trained ONCE per session (Shared.obj) and the assigned-corpus
    // serving index persisted once (Shared.frame) — the gated query
    // prices SERVING, the production contract; whichever of sim11/sim12
    // runs first pays the training. Results are bit-identical to the
    // one-shot learnedIvfTopK (SharedCacheSpec pins this).
    "sim11_ivf_learned" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val model = sharedIvfModel(s, dir)
      val index = Shared.frame(s, dir, "ivf_index")(
        graft.ops.VectorSearch.learnedIvfAssign(s, model, corpus, "vec_id", "embedding"))
      graft.ops.VectorSearch.learnedIvfServe(s, model, index,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding",
          TOPK, nprobe = KM_NPROBE)
        .orderBy("query_id", "rank")
    }),

    // sim12 — composite IVF-PQ (IVFADC) [extension]: the production ANN
    // deployment shape — sim11's learned coarse quantizer bounds WHICH
    // vectors are scanned (nprobe/kLists of the corpus), sim7's product
    // codes bound the BYTES per scanned vector (~10 B at this config).
    // Both components are exact-integer, so even the full composite is
    // hash-gated: the oracle chains sim11's unrolled Lloyd CTEs into
    // sim7's encode/LUT/ADC CTEs.
    "sim12_ivf_pq" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val model = sharedPqModel(s, dir)
      val index = Shared.frame(s, dir, "ivfpq_index")(
        graft.ops.VectorSearch.ivfPqEncode(model, corpus, "vec_id", "embedding"))
      graft.ops.VectorSearch.ivfPqServe(model, index,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding",
          TOPK, nprobe = KM_NPROBE)
        .orderBy("query_id", "rank")
    }),

    // sim13 — TABLE-persisted IVF-PQ serving [extension]: sim12's
    // ranking served from the DEPLOYED shape instead of the session
    // cache. The trained model (centroids + codebook + amax) and the
    // coded corpus publish ONCE per (session, fixture) as a single
    // AtomicPublish version ([[graft.ops.AnnIndexStore]] — a serving
    // job can never see a new index against an old codebook); the
    // gated query then LOADS the snapshot back from parquet and serves
    // the query batch against the read-back. Everything stored is
    // exact-integer (plus the exact amax double), so the served
    // ranking — and therefore the oracle — is bit-identical to
    // sim12's: the hash gate proves the round-trip loses nothing.
    // Publish-once uses setupOnce (the bkt convention: the layout is
    // written once and served many times in production, so re-writing
    // per run would price the setup, not the serve).
    "sim13_persisted_serve" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val model = sharedPqModel(s, dir)
      val index = Shared.frame(s, dir, "ivfpq_index")(
        graft.ops.VectorSearch.ivfPqEncode(model, corpus, "vec_id", "embedding"))
      val root = s"/root/repo/target/sink/sim13_ann_${Tables.dirSlug(dir)}"
      Shared.setupOnce(s, dir, "ann_store")(
        graft.ops.AnnIndexStore.publish(s, root, model, index): Unit)
      graft.ops.AnnIndexStore.serve(s, root,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding",
          k = TOPK, nprobe = KM_NPROBE)
        .orderBy("query_id", "rank")
    }),

    // sim14 — CDC-shaped DELETION reaching the SERVING index
    // [extension; Lucene deletes-on-merge / Delta deletion vectors on
    // plain parquet]: the corpus a training pipeline serves ANN from
    // is also a corpus it DELETES from (takedowns, licence
    // withdrawals, dedup verdicts), and the change feed that maintains
    // the warehouse's views must reach the index without a corpus
    // re-encode. A fresh sim13-shaped store is published, every
    // vec_id ≡ 3 (mod 7) is tombstoned (one delta-sized parquet write
    // + a manifest commit), then ONE deleted doc (vec_id 10) is
    // RE-ADDED by appending after the tombstone — the manifest's
    // timeline semantics must serve it again (a tombstone hides only
    // segments that precede it). The oracle is sim12's full exact-ADC
    // replay with the deleted ids filtered from the candidate side —
    // tombstones, the timeline, and the re-add never appear in it.
    "sim14_tombstone_serve" -> ((s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val model = sharedPqModel(s, dir)
      val index = Shared.frame(s, dir, "ivfpq_index")(
        graft.ops.VectorSearch.ivfPqEncode(model, corpus, "vec_id", "embedding"))
      val root = s"/root/repo/target/sink/sim14_ann_${Tables.dirSlug(dir)}"
      // a fresh store per run: the deletion state IS the subject
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        s.sparkContext.hadoopConfiguration)
      val rp = new org.apache.hadoop.fs.Path(root)
      if (fc.util.exists(rp)) fc.delete(rp, true)
      graft.ops.AnnIndexStore.publish(s, root, model, index)
      graft.ops.AnnIndexStore.applyDeletes(s, root,
        corpus.filter(col("vec_id") % 7 === 3).select("vec_id"),
        "vec_id", tombstoneId = Some("ts-takedown-1"))
      graft.ops.AnnIndexStore.appendEncode(s, root,
        corpus.filter(col("vec_id") === 10), "vec_id", "embedding",
        segmentId = Some("seg-readd-10"))
      graft.ops.AnnIndexStore.serve(s, root,
          corpus.filter(col("vec_id") < NQUERIES), "vec_id", "embedding",
          k = TOPK, nprobe = KM_NPROBE)
        .orderBy("query_id", "rank")
    }))

  /** The session-shared trained coarse quantizer behind sim11 AND sim12
    * (one integer-Lloyd training per (session, fixture) — the two
    * queries share corpus, kLists and iters by construction). */
  private def sharedIvfModel(s: SparkSession, dir: String): graft.ops.VectorSearch.IvfModel =
    Shared.obj(s, dir, "ivf_model")(
      graft.ops.VectorSearch.ivfTrain(s, Tables.embeddings(s, dir),
        "vec_id", "embedding", KM_K, KM_ITERS))

  /** The session-shared trained IVF-PQ model (sim12/sim13's exact
    * configuration), exposed to the streaming twin st13 so the ingest
    * query prices INGEST, not retraining — and so its served ranking is
    * oracle-comparable to sim12's. */
  private[queries] def sharedPqModel(s: SparkSession, dir: String): graft.ops.VectorSearch.IvfPqModel = {
    val ivf = sharedIvfModel(s, dir)
    Shared.obj(s, dir, "ivfpq_model")(
      graft.ops.VectorSearch.ivfPqTrain(s, ivf,
        Tables.embeddings(s, dir)
          .filter(col("vec_id") >= PQ_SEED_LO && col("vec_id") < PQ_SEED_HI),
        "vec_id", "embedding", nSub = PQ_NSUB))
  }

  /** st13 reuses sim12's serve constants and oracle. */
  private[queries] val servingConstants: (Int, Int, Int) = (NQUERIES, TOPK, KM_NPROBE)

  private val duckCos: String =
    s"""CAST(${VectorExprs.duckPairDot} AS DOUBLE)
       |      / (sqrt(CAST(qnorm AS DOUBLE)) * sqrt(CAST(cnorm AS DOUBLE)))""".stripMargin

  private val baseOracles: Map[String, String] = Map(
    "sim1_cosine_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${VectorExprs.duckNorm2} AS norm2
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS ea, norm2 AS qnorm
         |      FROM e WHERE vec_id < $NQUERIES),
         |pairs AS (
         |  SELECT q.query_id, c.vec_id, q.ea, c.embedding AS eb,
         |         q.qnorm, c.norm2 AS cnorm
         |  FROM e c, q WHERE q.query_id <> c.vec_id),
         |scored AS (
         |  SELECT query_id, vec_id, $duckCos AS cos_sim
         |  FROM pairs),
         |ranked AS (
         |  SELECT query_id, vec_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, cos_sim, rank FROM ranked
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin,

    "sim2_ann_lsh" ->
      s"""WITH p AS (SELECT ${VectorExprs.duckPlaneLit(64)} AS pl),
         |e AS (
         |  SELECT vec_id, embedding,
         |    ${VectorExprs.duckSig(SIGBITS)} AS sig,
         |    ${VectorExprs.duckNorm2} AS norm2
         |  FROM embeddings, p),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS ea, norm2 AS qnorm,
         |         xor(sig, m) AS probe
         |  FROM e, UNNEST([${graft.ops.VectorSearch.probeMasks(SIGBITS, 2).mkString(", ")}]) u(m)
         |  WHERE vec_id < $NQUERIES),
         |cand AS (
         |  SELECT DISTINCT q.query_id, c.vec_id, q.ea, c.embedding AS eb,
         |         q.qnorm, c.norm2 AS cnorm
         |  FROM e c JOIN q ON c.sig = q.probe AND q.query_id <> c.vec_id),
         |scored AS (
         |  SELECT query_id, vec_id, $duckCos AS cos_sim
         |  FROM cand),
         |ranked AS (
         |  SELECT query_id, vec_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, cos_sim, rank FROM ranked
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin,

    "sim3_ann_ivf" -> {
      val dotVC = VectorExprs.duckDot("v.embedding", "c.centv")
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${VectorExprs.duckNorm2} AS norm2
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS centv, norm2 AS centn
         |  FROM e WHERE vec_id >= 20 AND vec_id < 36),
         |assign AS (
         |  SELECT vec_id, embedding, norm2, cid FROM (
         |    SELECT v.vec_id, v.embedding, v.norm2, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        ($dotVC / (sqrt(v.norm2) * sqrt(c.centn))) DESC, c.cid ASC) AS rk
         |    FROM e v, cent c) WHERE rk = 1),
         |qprobe AS (
         |  SELECT query_id, qv, qn, cid FROM (
         |    SELECT v.vec_id AS query_id, v.embedding AS qv, v.norm2 AS qn, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        ($dotVC / (sqrt(v.norm2) * sqrt(c.centn))) DESC, c.cid ASC) AS rk
         |    FROM e v, cent c WHERE v.vec_id < $NQUERIES) WHERE rk <= 4),
         |cand AS (
         |  SELECT DISTINCT q.query_id, a.vec_id, q.qv AS ea, a.embedding AS eb,
         |         q.qn AS qnorm, a.norm2 AS cnorm
         |  FROM assign a JOIN qprobe q USING (cid)
         |  WHERE q.query_id <> a.vec_id),
         |scored AS (
         |  SELECT query_id, vec_id, $duckCos AS cos_sim
         |  FROM cand),
         |ranked AS (
         |  SELECT query_id, vec_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, cos_sim, rank FROM ranked
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin
    },

    // Mirrors scalarQuantTopK step for step: same amax fold, same
    // tie-free floor(x·(127/amax)+0.5) quantizer, integer dots — every
    // arithmetic step exact or IEEE-identical, so the hash compare holds
    // even though the operator is "approximate".
    "sim4_scalar_quant" ->
      s"""WITH $duckQuantRankedCtes
         |SELECT query_id, vec_id, qcos, rank FROM ranked
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin,

    "sim5_centroid_outliers" ->
      graft.ops.VectorSearch.duckCentroidOutliers(k = 20, dim = 64),

    // Stage 1 is sim4's chain verbatim (shared CTEs); stage 2 re-scores
    // the shortlist with the exact float cosine (sim1's arithmetic).
    "sim6_two_stage_rerank" ->
      s"""WITH $duckQuantRankedCtes,
         |short AS (SELECT query_id, vec_id, rank AS stage1_rank
         |          FROM ranked WHERE rank <= $SHORTLIST),
         |raw AS (SELECT vec_id, embedding, ${VectorExprs.duckNorm2} AS norm2
         |        FROM embeddings),
         |cand AS (
         |  SELECT s.query_id, s.vec_id, s.stage1_rank,
         |         qr.embedding AS ea, cr.embedding AS eb,
         |         qr.norm2 AS qnorm, cr.norm2 AS cnorm
         |  FROM short s JOIN raw qr ON s.query_id = qr.vec_id
         |               JOIN raw cr ON s.vec_id = cr.vec_id),
         |sc2 AS (
         |  SELECT query_id, vec_id, stage1_rank, $duckCos AS cos_sim
         |  FROM cand),
         |r2 AS (
         |  SELECT query_id, vec_id, stage1_rank, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
         |  FROM sc2)
         |SELECT query_id, vec_id, stage1_rank, cos_sim, rank FROM r2
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin,

    // Replays pqTopK from the same constants: sim4's quantizer, codebook
    // = quantized seed rows (codeword index = seed-id rank), encode =
    // argmin integer sqL2 per subspace (tie → lowest codeword, matching
    // Spark's first-min array_position), ADC = sum of the query's own
    // per-codeword distances at the encoded codes. All-BIGINT.
    "sim7_pq_ann" -> {
      val sd = 64 / PQ_NSUB
      s"""WITH am AS (
         |  SELECT max(list_max(list_transform(embedding, x ->
         |    abs(CAST(x AS DOUBLE))))) AS amax FROM embeddings),
         |e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x ->
         |      CAST(floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings, am),
         |cbr AS (
         |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS BIGINT) AS cidx
         |  FROM e WHERE vec_id >= $PQ_SEED_LO AND vec_id < $PQ_SEED_HI),
         |dists AS (
         |  SELECT c.vec_id, mm.m, b.cidx,
         |    CAST(list_sum(list_transform(generate_series(1, $sd), j ->
         |      (c.qv[mm.m * $sd + j] - b.qv[mm.m * $sd + j])
         |      * (c.qv[mm.m * $sd + j] - b.qv[mm.m * $sd + j]))) AS BIGINT) AS d
         |  FROM e c, UNNEST(generate_series(0, ${PQ_NSUB - 1})) mm(m), cbr b),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT vec_id, m, cidx AS code,
         |      row_number() OVER (PARTITION BY vec_id, m
         |        ORDER BY d ASC, cidx ASC) AS rk
         |    FROM dists) WHERE rk = 1),
         |lut AS (SELECT vec_id AS query_id, m, cidx, d FROM dists
         |        WHERE vec_id < $NQUERIES),
         |sc AS (
         |  SELECT l.query_id, en.vec_id, CAST(sum(l.d) AS BIGINT) AS pq_dist
         |  FROM enc en JOIN lut l ON l.m = en.m AND l.cidx = en.code
         |  WHERE l.query_id <> en.vec_id
         |  GROUP BY l.query_id, en.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, pq_dist,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY pq_dist ASC, vec_id ASC) AS INT) AS rank
         |  FROM sc)
         |SELECT query_id, vec_id, pq_dist, rank FROM ranked
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin
    },

    // Four prefixed ranking chains (exact cosine, quantized cosine,
    // exact L2, PQ-ADC — each the same text as its standalone oracle,
    // CTE names disambiguated), then recall = |approx ∩ exact| / k·|Q|.
    "sim8_recall_eval" -> {
      val sd = 64 / PQ_NSUB
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${VectorExprs.duckNorm2} AS norm2
         |  FROM embeddings),
         |xcq AS (SELECT vec_id AS query_id, embedding AS ea, norm2 AS qnorm
         |        FROM e WHERE vec_id < $NQUERIES),
         |xcp AS (SELECT q.query_id, c.vec_id, q.ea, c.embedding AS eb,
         |               q.qnorm, c.norm2 AS cnorm
         |        FROM e c, xcq q WHERE q.query_id <> c.vec_id),
         |xcs AS (SELECT query_id, vec_id, $duckCos AS cos_sim FROM xcp),
         |xcr AS (SELECT query_id, vec_id FROM (
         |          SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos_sim DESC, vec_id ASC) AS rk FROM xcs)
         |        WHERE rk <= $TOPK),
         |am AS (
         |  SELECT max(list_max(list_transform(embedding, x ->
         |    abs(CAST(x AS DOUBLE))))) AS amax FROM embeddings),
         |qe AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x ->
         |      CAST(floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings, am),
         |sqe AS (SELECT vec_id, qv,
         |          CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
         |        FROM qe),
         |sqq AS (SELECT vec_id AS query_id, qv AS qa, n2 AS qn
         |        FROM sqe WHERE vec_id < $NQUERIES),
         |sqs AS (SELECT q.query_id, c.vec_id,
         |          CAST(CAST(list_sum(list_transform(generate_series(1, 64), j ->
         |              q.qa[j] * c.qv[j])) AS BIGINT) AS DOUBLE)
         |            / (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS qcos
         |        FROM sqe c, sqq q WHERE q.query_id <> c.vec_id),
         |sqr AS (SELECT query_id, vec_id FROM (
         |          SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |            ORDER BY qcos DESC, vec_id ASC) AS rk FROM sqs)
         |        WHERE rk <= $TOPK),
         |xlp AS (SELECT q.vec_id AS query_id, c.vec_id,
         |          list_sum(list_transform(generate_series(1, 64), j ->
         |            (CAST(q.embedding[j] AS DOUBLE) - CAST(c.embedding[j] AS DOUBLE))
         |            * (CAST(q.embedding[j] AS DOUBLE) - CAST(c.embedding[j] AS DOUBLE)))) AS dist2
         |        FROM embeddings c, embeddings q
         |        WHERE q.vec_id < $NQUERIES AND q.vec_id <> c.vec_id),
         |xlr AS (SELECT query_id, vec_id FROM (
         |          SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |            ORDER BY dist2 ASC, vec_id ASC) AS rk FROM xlp)
         |        WHERE rk <= $TOPK),
         |cbr AS (
         |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS BIGINT) AS cidx
         |  FROM qe WHERE vec_id >= $PQ_SEED_LO AND vec_id < $PQ_SEED_HI),
         |pqd AS (
         |  SELECT c.vec_id, mm.m, b.cidx,
         |    CAST(list_sum(list_transform(generate_series(1, $sd), j ->
         |      (c.qv[mm.m * $sd + j] - b.qv[mm.m * $sd + j])
         |      * (c.qv[mm.m * $sd + j] - b.qv[mm.m * $sd + j]))) AS BIGINT) AS d
         |  FROM qe c, UNNEST(generate_series(0, ${PQ_NSUB - 1})) mm(m), cbr b),
         |pqe AS (SELECT vec_id, m, code FROM (
         |          SELECT vec_id, m, cidx AS code,
         |            row_number() OVER (PARTITION BY vec_id, m
         |              ORDER BY d ASC, cidx ASC) AS rk FROM pqd) WHERE rk = 1),
         |pql AS (SELECT vec_id AS query_id, m, cidx, d FROM pqd
         |        WHERE vec_id < $NQUERIES),
         |pqs AS (SELECT l.query_id, en.vec_id, CAST(sum(l.d) AS BIGINT) AS pq_dist
         |        FROM pqe en JOIN pql l ON l.m = en.m AND l.cidx = en.code
         |        WHERE l.query_id <> en.vec_id GROUP BY 1, 2),
         |pqr AS (SELECT query_id, vec_id FROM (
         |          SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |            ORDER BY pq_dist ASC, vec_id ASC) AS rk FROM pqs)
         |        WHERE rk <= $TOPK)
         |SELECT method, hits, possible,
         |  CAST(hits AS DOUBLE) / possible AS recall FROM (
         |  SELECT 'pq_vs_l2' AS method,
         |    (SELECT count(*) FROM pqr a JOIN xlr b USING (query_id, vec_id)) AS hits,
         |    (SELECT count(*) FROM xlr) AS possible
         |  UNION ALL
         |  SELECT 'scalar_quant_vs_cosine' AS method,
         |    (SELECT count(*) FROM sqr a JOIN xcr b USING (query_id, vec_id)) AS hits,
         |    (SELECT count(*) FROM xcr) AS possible) t
         |ORDER BY method""".stripMargin
    },

    "sim9_mmr_diversify" ->
      graft.ops.VectorSearch.duckMmrDiversify(NQUERIES, poolK = 20, k = 5,
        lambdaRel = 0.7),

    // Projection replayed from the same 16×64 plane literal (duckSig's
    // dot text, un-thresholded), then sim1's cosine chain in 16-d.
    "sim10_random_projection" ->
      s"""WITH plm AS (SELECT ${VectorExprs.duckPlaneLit(64)} AS pl),
         |e AS (
         |  SELECT vec_id,
         |    list_transform(generate_series(1, 16), i ->
         |      list_sum(list_transform(generate_series(1, 64), j ->
         |        pl[i][j] * CAST(embedding[j] AS DOUBLE)))) AS p
         |  FROM embeddings, plm),
         |en AS (SELECT vec_id, p,
         |         list_sum(list_transform(p, x -> x * x)) AS n2 FROM e),
         |q AS (SELECT vec_id AS query_id, p AS qp, n2 AS qn
         |      FROM en WHERE vec_id < $NQUERIES),
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |    list_sum(list_transform(generate_series(1, 16), i ->
         |      q.qp[i] * c.p[i])) / (sqrt(q.qn) * sqrt(c.n2)) AS rp_cos
         |  FROM en c, q WHERE q.query_id <> c.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, rp_cos,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY rp_cos DESC, vec_id ASC) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, rp_cos, rank FROM ranked
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin,

    // Replays learnedIvfTopK from the same constants: sim4's quantizer,
    // init = the KM_K lowest-id quantized vectors, then KM_ITERS Lloyd
    // iterations UNROLLED as CTE triples (assign / per-dim BIGINT sums /
    // coalesce-empty centroid). Cosine to a cluster MEAN equals cosine
    // to its SUM, so centroids stay exact integer sum vectors and the
    // assignment score — BIGINT dot over one IEEE divide/sqrt — is
    // bit-identical to the Spark closure. Final candidates re-score at
    // exact float cosine (sim3's scored/ranked tail).
    "sim11_ivf_learned" ->
      s"""WITH $duckLloydCtes,
         |e AS (SELECT vec_id, embedding, ${VectorExprs.duckNorm2} AS norm2
         |      FROM embeddings),
         |cand AS (
         |  SELECT q.query_id, a.vec_id, qr.embedding AS ea, cr.embedding AS eb,
         |         qr.norm2 AS qnorm, cr.norm2 AS cnorm
         |  FROM assign a JOIN qprobe q USING (cid)
         |  JOIN e qr ON q.query_id = qr.vec_id
         |  JOIN e cr ON a.vec_id = cr.vec_id
         |  WHERE q.query_id <> a.vec_id),
         |scored AS (
         |  SELECT query_id, vec_id, $duckCos AS cos_sim
         |  FROM cand),
         |ranked AS (
         |  SELECT query_id, vec_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, cos_sim, rank FROM ranked
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin,

    // Chains the Lloyd CTEs into sim7's encode/LUT/ADC, with the ADC
    // join restricted to (assign, qprobe) list matches — the IVFADC
    // composite, replayed end-to-end.
    "sim12_ivf_pq" -> {
      val sd = 64 / PQ_NSUB
      s"""WITH $duckLloydCtes,
         |cbr AS (
         |  SELECT qv, CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS BIGINT) AS cidx
         |  FROM qe WHERE vec_id >= $PQ_SEED_LO AND vec_id < $PQ_SEED_HI),
         |dists AS (
         |  SELECT c.vec_id, mm.m, b.cidx,
         |    CAST(list_sum(list_transform(generate_series(1, $sd), j ->
         |      (c.qv[mm.m * $sd + j] - b.qv[mm.m * $sd + j])
         |      * (c.qv[mm.m * $sd + j] - b.qv[mm.m * $sd + j]))) AS BIGINT) AS d
         |  FROM qe c, UNNEST(generate_series(0, ${PQ_NSUB - 1})) mm(m), cbr b),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT vec_id, m, cidx AS code,
         |      row_number() OVER (PARTITION BY vec_id, m
         |        ORDER BY d ASC, cidx ASC) AS rk
         |    FROM dists) WHERE rk = 1),
         |lut AS (SELECT vec_id AS query_id, m, cidx, d FROM dists
         |        WHERE vec_id < $NQUERIES),
         |sc AS (
         |  SELECT l.query_id, en.vec_id, CAST(sum(l.d) AS BIGINT) AS pq_dist
         |  FROM enc en
         |  JOIN assign a ON en.vec_id = a.vec_id
         |  JOIN qprobe qp ON a.cid = qp.cid
         |  JOIN lut l ON l.query_id = qp.query_id
         |            AND l.m = en.m AND l.cidx = en.code
         |  WHERE l.query_id <> en.vec_id
         |  GROUP BY l.query_id, en.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, pq_dist,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY pq_dist ASC, vec_id ASC) AS INT) AS rank
         |  FROM sc)
         |SELECT query_id, vec_id, pq_dist, rank FROM ranked
         |WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin
    })

  /** sim13 serves sim12's ranking through the published-table
    * round-trip; the stored state is exact (integers + the exact amax
    * double), so its oracle IS sim12's — hash-matching both proves the
    * persisted path loses nothing vs the in-session model. sim14's
    * oracle is the same replay with the tombstoned ids removed from
    * the CANDIDATE side only (the re-added vec_id 10 stays): the
    * timeline, the anti joins, and the store never appear in it. */
  val oracles: Map[String, String] = {
    val sim12 = baseOracles("sim12_ivf_pq")
    val anchor = "WHERE l.query_id <> en.vec_id"
    require(sim12.contains(anchor),
      "sim12 oracle shape changed; update sim14's candidate filter")
    baseOracles +
      ("sim13_persisted_serve" -> sim12) +
      ("sim14_tombstone_serve" -> sim12.replace(anchor,
        anchor + "\n    AND (en.vec_id % 7 <> 3 OR en.vec_id = 10)"))
  }

  /** sim11's learned-centroid chain as a CTE list: quantize (sim4's
    * text), k-lowest-id init, KM_ITERS unrolled Lloyd iterations
    * (assign / per-dim BIGINT sums / coalesce-empty), ending in
    * `assign(vec_id, cid)` and `qprobe(query_id, cid)` against the
    * final centroids. Cosine to a cluster MEAN equals cosine to its
    * SUM, so centroids stay exact integer sum vectors and the score —
    * BIGINT dot over one IEEE divide/sqrt — is bit-identical to the
    * Spark closure (VectorSearch.lloydSumCentroids). */
  private lazy val duckLloydCtes: String = {
    def idot(a: String, b: String) =
      s"""CAST(list_sum(list_transform(generate_series(1, 64), j ->
         |          $a[j] * $b[j])) AS BIGINT)""".stripMargin
    def score(v: String) =
      s"""(CASE WHEN c.b > 0 THEN CAST(${idot(v, "c.s")} AS DOUBLE)
         |          / sqrt(CAST(c.b AS DOUBLE)) ELSE -1e300 END)""".stripMargin
    // one Lloyd iteration: assign to `prev`, per-dimension sums,
    // empty clusters keep their previous centroid
    def iter(n: Int, prev: String) =
      s"""a$n AS (SELECT vec_id, qv, cid FROM (
         |  SELECT v.vec_id, v.qv, c.cid,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |      ${score("v.qv")} DESC, c.cid ASC) AS rk
         |  FROM qe v, $prev c) WHERE rk = 1),
         |s$n AS (SELECT cid, j, CAST(sum(qv[j]) AS BIGINT) AS sj
         |  FROM a$n, UNNEST(generate_series(1, 64)) t(j) GROUP BY cid, j),
         |n$n AS (SELECT cid, list(sj ORDER BY j) AS s FROM s$n GROUP BY cid),
         |c$n AS (SELECT p.cid, coalesce(n$n.s, p.s) AS s,
         |    CAST(list_sum(list_transform(coalesce(n$n.s, p.s), x -> x * x))
         |      AS BIGINT) AS b
         |  FROM $prev p LEFT JOIN n$n ON p.cid = n$n.cid)""".stripMargin
    val iters = (1 to KM_ITERS).map(n => iter(n, s"c${n - 1}")).mkString(",\n")
    s"""am AS (
       |  SELECT max(list_max(list_transform(embedding, x ->
       |    abs(CAST(x AS DOUBLE))))) AS amax FROM embeddings),
       |qe AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x ->
       |      CAST(floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings, am),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) AS BIGINT) AS cid,
       |         qv AS s,
       |         CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS b
       |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id ASC LIMIT $KM_K)),
       |$iters,
       |assign AS (SELECT vec_id, cid FROM (
       |  SELECT v.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      ${score("v.qv")} DESC, c.cid ASC) AS rk
       |  FROM qe v, c$KM_ITERS c) WHERE rk = 1),
       |qprobe AS (SELECT query_id, cid FROM (
       |  SELECT v.vec_id AS query_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      ${score("v.qv")} DESC, c.cid ASC) AS rk
       |  FROM qe v, c$KM_ITERS c WHERE v.vec_id < $NQUERIES) WHERE rk <= $KM_NPROBE)""".stripMargin
  }

  /** sim4's quantize → integer-dot → rank chain as a CTE list ending in
    * `ranked(query_id, vec_id, qcos, rank)` — stage 1 of sim6 verbatim. */
  private lazy val duckQuantRankedCtes: String =
    s"""am AS (
       |  SELECT max(list_max(list_transform(embedding, x ->
       |    abs(CAST(x AS DOUBLE))))) AS amax FROM embeddings),
       |e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x ->
       |      CAST(floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings, am),
       |en AS (
       |  SELECT vec_id, qv,
       |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
       |  FROM e),
       |q AS (SELECT vec_id AS query_id, qv AS qa, n2 AS qn
       |      FROM en WHERE vec_id < $NQUERIES),
       |scored AS (
       |  SELECT q.query_id, c.vec_id,
       |    CAST(CAST(list_sum(list_transform(generate_series(1, 64), j ->
       |        q.qa[j] * c.qv[j])) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS qcos
       |  FROM en c, q WHERE q.query_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, qcos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY qcos DESC, vec_id ASC) AS INT) AS rank
       |  FROM scored)""".stripMargin
}
