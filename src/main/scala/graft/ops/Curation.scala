package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{DetHash, TextHashUdfs, TopKAggregator}

/** Corpus-curation operators for LLM training-data pipelines [extension —
  * north star; absent in the reference, which stops at warehouse loads]:
  * benchmark decontamination, PII redaction, per-domain caps,
  * deterministic stratified sampling, and domain-mixture weights — the
  * steps that turn a deduped corpus into a training mix.
  *
  * Scale posture (details per method): decontamination is a broadcast
  * semi-structure join against the benchmark shingle set (benchmarks are
  * MBs; the corpus is never shuffled raw), redaction and sampling are
  * pure shuffle-free maps, the per-domain cap replaces the full-corpus
  * window with a bounded O(k) aggregate plus a threshold filter, and
  * mixture weighting aggregates to one row per stratum. All arithmetic
  * and hashing is the engine-portable [[DetHash]] family, so every
  * operator is DuckDB-oracle-checked end to end.
  */
object Curation {

  // ── decontamination ────────────────────────────────────────────────

  /** Flag candidate documents that share any `n`-token shingle with a
    * benchmark/eval set — the standard "did the eval leak into the
    * training mix" gate (the GPT-3 appendix-C / Dolma decontamination
    * shape: n-gram overlap, not exact match, so paraphrased-but-copied
    * passages still trip it).
    *
    * Plan shape: the benchmark's distinct shingle hashes are built once
    * and BROADCAST — eval suites are thousands of documents (MBs of
    * 8-byte hashes) even when the corpus is 100 TB, so the corpus-side
    * scan joins map-side and never shuffles text. The only exchange
    * carries (id, partial overlap count) pairs for matched shingles —
    * sparse by construction (most corpus shingles miss). Shingles are
    * compared by their 60-bit md5-derived hash ([[DetHash.h]]): 8-byte
    * join keys, deterministic across engines, collision odds ≈2⁻⁶⁰.
    *
    * Output: idCol, n_shingles (0 for docs shorter than n tokens),
    * n_overlap, contaminated. Rows = `docs` rows, exactly.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 4): DataFrame = {
    val shingles = TextHashUdfs.shingleHashSet(n)
    val bench = benchmark
      .select(explode(shingles(col(textCol))).as("__sh"))
      .distinct()
    val cand = docs.select(col(idCol), shingles(col(textCol)).as("__s"))
    val overlap = cand
      .select(col(idCol), explode(col("__s")).as("__sh"))
      .join(broadcast(bench), "__sh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlap"))
    cand
      .select(col(idCol), coalesce(size(col("__s")), lit(0)).as("n_shingles"))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  // ── PII redaction ──────────────────────────────────────────────────

  /** Redaction patterns, shared with the DuckDB oracle. Restricted to
    * syntax Java regex and RE2 interpret identically (char classes,
    * bounded repetition, `\b`): no backrefs, no lookaround. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val LongNumPat = "\\b[0-9]{9,}\\b"

  /** Scrub email addresses, IPv4 addresses, and long digit runs (ids,
    * phone-ish numbers) from a text column — the minimum-viable PII pass
    * every web-scale corpus gets before training. Pure map: three
    * codegen'd regexp_replace + three regexp_count per row, zero
    * shuffles, linear in corpus size. Replacement order is fixed
    * (email → ip → number) so counts are taken on the ORIGINAL text and
    * each pattern sees text untouched by its own placeholder.
    *
    * Output: idCol, clean (redacted text), n_emails, n_ips, n_longnums.
    * Idempotent: redacting `clean` again is the identity (placeholders
    * match none of the patterns).
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val clean =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPat, "<EMAIL>"),
          Ipv4Pat, "<IP>"),
        LongNumPat, "<NUM>")
    docs.select(col(idCol),
      clean.as("clean"),
      regexp_count(t, lit(EmailPat)).as("n_emails"),
      regexp_count(t, lit(Ipv4Pat)).as("n_ips"),
      regexp_count(t, lit(LongNumPat)).as("n_longnums"))
  }

  // ── per-domain cap ─────────────────────────────────────────────────

  /** Keep at most `k` documents per group, best-first by (valueCol DESC,
    * idCol ASC) — the per-domain cap that stops one crawl host from
    * dominating the mix.
    *
    * The naive form is row_number over a per-group window: it shuffles
    * the WHOLE corpus on the group key and sorts every group on one
    * task — the hottest domain becomes the straggler. Here phase 1
    * computes each group's exact k-th (value, id) cutoff with the O(k)
    * map-side [[TopKAggregator]] (shuffle carries ≤ k pairs per group
    * per mapper), the cutoff broadcast-joins back, and the filter keeps
    * a row iff its (value, id) sorts at-or-before the cutoff. Because
    * the sort key is total (ties broken by id), the filter IS row_number
    * ≤ k — bit-identical to the window form, proven by CurationSpec.
    * The rank then recomputes over survivors only (≤ k·groups rows).
    *
    * Output: groupCol, idCol, valueCol, rk — `rk` the 1-based rank.
    */
  def capPerGroup(docs: DataFrame, groupCol: String, valueCol: String,
                  idCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    val cutoff = docs.groupBy(groupCol)
      .agg(topk(col(valueCol).cast("double"), col(idCol).cast("long")).as("top"))
      // groups with < k rows keep everything: sentinel cutoff sorts last
      .select(col(groupCol),
        when(size(col("top")) >= k, element_at(col("top"), k).getField("_1"))
          .otherwise(lit(Double.NegativeInfinity)).as("__kv"),
        when(size(col("top")) >= k, element_at(col("top"), k).getField("_2"))
          .otherwise(lit(Long.MaxValue)).as("__ki"))
    docs.join(broadcast(cutoff), groupCol)
      .filter(col(valueCol).cast("double") > col("__kv") ||
        (col(valueCol).cast("double") === col("__kv") &&
          col(idCol).cast("long") <= col("__ki")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(groupCol)
          .orderBy(col(valueCol).desc, col(idCol).asc)))
      .select(groupCol, idCol, valueCol, "rk")
  }

  // ── stratified sampling ────────────────────────────────────────────

  /** Deterministic per-stratum downsampling: a row survives iff
    * H(salt ‖ id) mod 10⁶ < rate(stratum)·10⁶, with [[DetHash.h]] as H.
    * This is how a 100 TB pipeline samples: hash-gated, so the decision
    * is a pure shuffle-free map (no RNG state, no seed-per-partition
    * coupling), reproducible run to run, and stable under repartition —
    * the same document survives no matter how the scan is split. The
    * salt gives independent draws for independent sampling stages.
    *
    * `rates` maps stratum value → keep-rate in [0, 1]; unlisted strata
    * get `defaultRate`. Output: the surviving rows, original schema.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "sample"): DataFrame = {
    val M = 1000000L
    val draw = DetHash.h(concat(lit(salt + "_"), col(idCol).cast("string"))) % M
    val cut = rates.foldLeft(lit((defaultRate * M).toLong)) {
      case (acc, (s, r)) => when(col(stratumCol) === s, lit((r * M).toLong)).otherwise(acc)
    }
    docs.filter(draw < cut)
  }

  /** DuckDB replay of [[stratifiedSample]]'s survival predicate (the
    * CASE over `rates` is up to the caller). */
  def duckDraw(idExpr: String, salt: String = "sample"): String =
    s"${DetHash.hSql(s"'${salt}_' || $idExpr")} % 1000000"

  // ── domain-mixture weights ─────────────────────────────────────────

  /** Per-stratum mixture weights: given a target token share per
    * stratum, compute each stratum's actual token share and the
    * sampling/repeat weight (target / actual) that reshapes the corpus
    * into the target mix — the "domain mixing" step (Pile/Dolma-style)
    * that follows curation. Two tiny aggregates: one row per stratum,
    * then the grand total attaches by broadcast; token counts sum as
    * exact BIGINT so both engines agree bit-for-bit, and the shares are
    * single IEEE divisions.
    *
    * Output: stratumCol, n_docs, total_tokens, actual_share,
    * target_share, weight — one row per stratum present in `docs`.
    */
  def mixtureWeights(docs: DataFrame, stratumCol: String, tokensCol: Column,
                     targets: Map[String, Double],
                     defaultTarget: Double = 0.0): DataFrame = {
    val per = docs
      .select(col(stratumCol), tokensCol.cast("long").as("__tok"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), sum("__tok").as("total_tokens"))
    val grand = per.agg(sum("total_tokens").as("__grand"))
    val target = targets.foldLeft(lit(defaultTarget)) {
      case (acc, (s, t)) => when(col(stratumCol) === s, lit(t)).otherwise(acc)
    }
    per.crossJoin(broadcast(grand))
      .select(col(stratumCol), col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("__grand").cast("double"))
          .as("actual_share"),
        target.as("target_share"),
        (target / (col("total_tokens").cast("double") / col("__grand").cast("double")))
          .as("weight"))
  }

  // ── token-budget selection ─────────────────────────────────────────

  /** Greedy token-budget fill per stratum: take documents in quality
    * order (best first, ties to lowest id) while the budget has room —
    * the "give me N tokens of the best data per domain" selection step
    * that follows scoring. A document is selected iff the tokens
    * accumulated BEFORE it are still under the budget, so the fill may
    * overshoot by at most one document (the standard greedy convention;
    * an exact cut would split a document — that is pk1's packing job,
    * not selection).
    *
    * One shuffle on the stratum key; the cumulative sum is a per-stratum
    * window — the same per-shard-parallel argument as sequence packing
    * (a GLOBAL quality order would funnel one task at corpus scale and
    * buys nothing: budgets are per-domain by construction).
    * Output: stratumCol, idCol, n_tokens, cum_before, selected. */
  def tokenBudget(docs: DataFrame, idCol: String, stratumCol: String,
                  tokensCol: Column, qualityCol: Column,
                  budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val w = Window.partitionBy(stratumCol)
      .orderBy(col("__q").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(stratumCol), col(idCol), tokensCol.cast("long").as("n_tokens"),
        qualityCol.as("__q"))
      .withColumn("cum_before",
        sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("selected", col("cum_before") < budget)
      .select(stratumCol, idCol, "n_tokens", "cum_before", "selected")
  }

  // ── quantile trim ──────────────────────────────────────────────────

  /** Adaptive per-stratum outlier trim: keep documents whose metric lies
    * inside the stratum's [loQ, hiQ] interpolated quantile band — the
    * "clip the length/score distribution to p05–p95" curation step,
    * ADAPTIVE where the cascade's absolute thresholds are fixed (a code
    * domain and a chat domain have very different healthy lengths; one
    * constant can't serve both).
    *
    * One aggregate to |strata| rows of bounds (exact interpolated
    * percentile — the same mergeable sketch-free aggregate as g9, fine
    * at any row count because state is per-stratum), broadcast back,
    * then a pure map — the corpus never shuffles.
    * Output: stratumCol, idCol, value, lo, hi, kept. */
  def quantileTrim(docs: DataFrame, idCol: String, stratumCol: String,
                   valueCol: Column, loQ: Double = 0.05,
                   hiQ: Double = 0.95): DataFrame = {
    require(0 <= loQ && loQ <= hiQ && hiQ <= 1, s"need 0 ≤ loQ ≤ hiQ ≤ 1, got $loQ, $hiQ")
    val vals = docs.select(col(stratumCol), col(idCol),
      valueCol.cast("double").as("value"))
    val bounds = vals.groupBy(stratumCol)
      .agg(expr(s"percentile(value, array($loQ, $hiQ))").as("__q"))
      .select(col(stratumCol),
        element_at(col("__q"), 1).as("lo"), element_at(col("__q"), 2).as("hi"))
    vals.join(broadcast(bounds), Seq(stratumCol))
      .select(col(stratumCol), col(idCol), col("value"), col("lo"), col("hi"),
        (col("value") >= col("lo") && col("value") <= col("hi")).as("kept"))
  }

  // ── filter cascade with reason codes ───────────────────────────────

  /** Per-document filter cascade: every doc annotated with keep/drop and
    * the FIRST failing rule's reason code — the drop-accounting shape a
    * production curation pipeline reports per shard (knowing *that* 40%
    * dropped is useless without knowing *why*; rule order makes the
    * reasons mutually exclusive so they sum to the drop count).
    *
    * Rules, in order: null_text → too_short → too_long → language →
    * low_stopword → repetitive → duplicate. Language ID runs BEFORE the
    * stopword gate on purpose — the stopword ratio is an
    * ENGLISH-specific quality heuristic, so a German document must be
    * attributed to 'language', not to a gate that was never meaningful
    * for it. Thresholds and semantics are exactly tx2's quality gate,
    * tx4's language ID, tx6's repetition gate, and dd1's exact dedup
    * (dup = not the min-id of the content-fingerprint group, judged
    * against the WHOLE corpus, not just gate-survivors — so the reason
    * a dup is dropped never depends on its twin's quality).
    *
    * One corpus scan computes the token profile, repetition profile, and
    * content fingerprint side by side (the px1 fusion argument); the
    * only shuffle is the per-fingerprint dedup window. Output: idCol,
    * n_tokens, drop_reason (null when kept), keep.
    */
  def filterCascade(docs: DataFrame, idCol: String, textCol: String,
                    lang: String = "en",
                    minTokens: Int = 20, maxTokens: Int = 1000,
                    minStopRatio: Double = 0.01,
                    maxDupTokenRatio: Double = 0.6,
                    maxTopTokenRatio: Double = 0.3,
                    maxDupBigramRatio: Double = 0.5): DataFrame = {
    import graft.ops.TextAnalysis
    val words = TextAnalysis.defaultWords
    val prof = TextAnalysis.profileCol(col(textCol), words)
    val rep = graft.functions.RepetitionProfileUdf.instance(col(textCol))
    val scanned = docs.select(col(idCol),
      col(textCol).isNull.as("__null"),
      prof.as("__p"), rep.as("__r"),
      TextDedup.fingerprint(col(textCol)).as("__fp"))
    val nTok = col("__p").getField("n_tokens")
    val stopRatio = TextAnalysis.defaultStopwords
      .map(TextAnalysis.countOf(col("__p"), words, _)).reduce(_ + _)
      .cast("double") / nTok
    val predLang = TextAnalysis.predLangFromProfile(col("__p"), words)
    val dupTok = lit(1.0) - col("__r").getField("n_types").cast("double") / nTok
    val topTok = col("__r").getField("max_tok_freq").cast("double") / nTok
    val dupBg = when(col("__r").getField("n_bigrams") > 0,
      lit(1.0) - col("__r").getField("n_distinct_bigrams").cast("double")
        / col("__r").getField("n_bigrams")).otherwise(0.0)
    val isDup = col(idCol) =!=
      min(idCol).over(Window.partitionBy("__fp"))
    val reason = when(col("__null"), "null_text")
      .when(nTok < minTokens, "too_short")
      .when(nTok > maxTokens, "too_long")
      .when(predLang =!= lang, "language")
      .when(stopRatio <= minStopRatio, "low_stopword")
      .when(dupTok > maxDupTokenRatio || topTok > maxTopTokenRatio ||
        dupBg > maxDupBigramRatio, "repetitive")
      .when(isDup, "duplicate")
      .otherwise(lit(null).cast("string"))
    scanned
      .select(col(idCol), nTok.as("n_tokens"), reason.as("drop_reason"))
      .withColumn("keep", col("drop_reason").isNull)
  }

  // ── leakage-safe split assignment ──────────────────────────────────

  /** Deterministic train/val/test assignment keyed on the CONTENT
    * fingerprint, not the row id — byte-identical duplicates hash to the
    * same draw and therefore always land in the same split, so exact
    * dups can never straddle the train/eval boundary (an id- or RNG-
    * keyed split scatters copies across splits, and the eval loss then
    * scores memorization). For fuzzy leak-proofing, pre-canonicalize
    * with [[TextDedup.pickCanonical]] / the dd7 cluster labels and call
    * this on the representative's text.
    *
    * Scale shape: pure map — fingerprint (md5), one [[DetHash.h]] draw,
    * two comparisons; zero shuffles at any corpus size, and re-running
    * on a grown corpus never reassigns an existing document (the draw
    * depends only on content + salt). Buckets partition [0, 1e6):
    * train gets the first (100-valPct-testPct)%, then val, then test.
    * NULL text draws 0 → train (deterministic; flag upstream with px3's
    * null_text reason). Output: idCol, fingerprint, draw, split — rows
    * = `docs` rows exactly. */
  def groupSplit(docs: DataFrame, idCol: String, textCol: String,
                 valPct: Int = 5, testPct: Int = 5,
                 salt: String = "split"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"val/test percentages must be non-negative and sum below 100: $valPct/$testPct")
    val M = 1000000L
    val trainCut = (100L - valPct - testPct) * (M / 100)
    val valCut = trainCut + valPct * (M / 100)
    val fp = TextDedup.fingerprint(col(textCol))
    val draw = coalesce(DetHash.h(concat(lit(salt + "_"), fp)) % M, lit(0L))
    docs.select(col(idCol), fp.as("fingerprint"), draw.as("draw"),
      when(draw < trainCut, "train").when(draw < valCut, "val")
        .otherwise("test").as("split"))
  }

  /** α-temperature source mixture (the exponent-smoothed multinomial of
    * GPT-3 / multilingual-BERT, α = 1/2): sample `budget` documents with
    * per-stratum target counts ∝ n_s^α — flattening the source
    * distribution so head domains stop drowning the tail without
    * letting tiny domains dominate. Complements [[mixtureWeights]]
    * (explicit target shares) by DERIVING the shares from corpus counts.
    *
    * Determinism, end to end: weights are sqrt(n) — correctly rounded
    * under IEEE-754 in every engine, unlike pow(n, α) for general α —
    * quantized to integers (floor(·1e6+0.5)); targets are exact BIGINT
    * products `budget·w_s div ΣW` (headroom: budget·w must fit a long —
    * at 100 TB scale move the product to DECIMAL(38,0), same plan);
    * the draw is the hash-gate of [[stratifiedSample]], so selection is
    * reproducible and repartition-stable. Σ targets ≤ budget (floor
    * rounding forfeits < |strata| docs).
    *
    * One shuffle (the per-stratum rank window); targets broadcast back.
    * Output: stratumCol, idCol, srank (1-based hash rank within the
    * stratum) — ≈ budget rows. */
  def temperatureMixture(docs: DataFrame, idCol: String, stratumCol: String,
                         budget: Long, salt: String = "tmix"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val per = docs.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w", expr(
        "CAST(floor(sqrt(CAST(__n AS DOUBLE)) * 1000000D + 0.5D) AS BIGINT)"))
    // the weight total is one scalar over a ≤|strata|-row frame —
    // collected driver-side and baked into the plan (the same
    // documented small-side collect as pqTopK's codebook; a crossJoin
    // of per with an aggregate of itself trips self-join ambiguity).
    // An EMPTY corpus sums to SQL NULL — the selection is then empty,
    // not a crash (and never a division by zero)
    val wRow = per.agg(sum("__w"), max("__w")).head
    val bigW = Option(wRow.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val maxW = Option(wRow.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    if (bigW == 0L)
      return docs.select(col(stratumCol), col(idCol), lit(1).as("srank")).limit(0)
    // enforce the scaladoc's headroom limit at runtime: budget·w is a
    // BIGINT product and Spark's non-ANSI mode wraps silently, which
    // would turn an oversized budget into negative targets and an empty
    // selection. The max per-stratum weight bounds every product.
    require(budget <= Long.MaxValue / maxW,
      s"temperatureMixture: budget $budget overflows BIGINT targets " +
        s"(max stratum weight $maxW); cap budget at ${Long.MaxValue / maxW}")
    val tgt = per.select(col(stratumCol),
      expr(s"($budget * __w) div ${bigW}L").as("__target"))
    val draw = DetHash.h(concat(lit(salt + "_"), col(idCol).cast("string")))
    docs
      .withColumn("__draw", draw)
      .withColumn("srank", row_number().over(
        Window.partitionBy(stratumCol).orderBy(col("__draw"), col(idCol))))
      .join(broadcast(tgt), Seq(stratumCol))
      .filter(col("srank") <= col("__target"))
      .select(stratumCol, idCol, "srank")
  }

  /** DuckDB replay of [[temperatureMixture]] from the same constants. */
  def duckTemperatureMixture(budget: Long, salt: String = "tmix",
                             idCol: String = "doc_id", table: String = "documents",
                             stratumCol: String = "source"): String =
    s"""WITH per AS (
       |  SELECT $stratumCol, CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS w
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM per),
       |tgt AS (SELECT $stratumCol, ($budget * w) // tw AS target FROM per, tot),
       |ranked AS (
       |  SELECT $stratumCol, $idCol,
       |    CAST(row_number() OVER (PARTITION BY $stratumCol
       |      ORDER BY ${DetHash.hSql(s"'${salt}_' || CAST($idCol AS VARCHAR)")} ASC,
       |               $idCol ASC) AS INT) AS srank
       |  FROM $table)
       |SELECT r.$stratumCol, r.$idCol, r.srank
       |FROM ranked r JOIN tgt USING ($stratumCol)
       |WHERE r.srank <= target
       |ORDER BY r.$stratumCol, r.$idCol""".stripMargin

  /** DuckDB replay of [[groupSplit]] — generated from the same salt and
    * cut constants so the engines cannot drift. */
  def duckGroupSplit(valPct: Int = 5, testPct: Int = 5,
                     salt: String = "split",
                     idCol: String = "doc_id", table: String = "documents",
                     textCol: String = "text"): String = {
    val M = 1000000L
    val trainCut = (100L - valPct - testPct) * (M / 100)
    val valCut = trainCut + valPct * (M / 100)
    val fpSql = s"md5(regexp_replace(lower(trim($textCol)), '\\s+', ' ', 'g'))"
    val drawSql =
      s"COALESCE(${DetHash.hSql(s"'${salt}_' || $fpSql")} % $M, 0)"
    s"""SELECT $idCol, $fpSql AS fingerprint, $drawSql AS draw,
       |  CASE WHEN $drawSql < $trainCut THEN 'train'
       |       WHEN $drawSql < $valCut THEN 'val'
       |       ELSE 'test' END AS split
       |FROM $table ORDER BY $idCol""".stripMargin
  }

  // ── fuzzy decontamination ──────────────────────────────────────────

  // ── corpus snapshot diff ───────────────────────────────────────────

  /** Content-level diff of two corpus snapshots — the bookkeeping step
    * of every incremental pipeline run ("what actually changed since
    * the last training mix"): full outer join on the document id,
    * statuses decided by the normalized-content fingerprint. A doc in
    * `newDocs` only is `added`; in `oldDocs` only, `removed`; in both
    * with differing fingerprints, `changed`; else `unchanged` (two NULL
    * texts compare unchanged — the fingerprint comparison is
    * null-safe). Feeds dd8/dd10 with exactly the added+changed slice so
    * the incremental dedup never re-scans the stable corpus.
    *
    * Scale shape: each side collapses to (id, 16-byte fingerprint)
    * before the join — raw text never crosses an exchange — and the
    * join is one id-keyed shuffle per side at any snapshot size
    * (co-bucketing both snapshots on the id removes even that; layout
    * decision, not code change). Output: idCol, old_fingerprint,
    * new_fingerprint, status — one row per id in either snapshot. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val fp = TextDedup.fingerprint(col(textCol))
    val o = oldDocs.select(col(idCol), fp.as("old_fingerprint"),
      lit(true).as("__in_old"))
    val n = newDocs.select(col(idCol), fp.as("new_fingerprint"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol), col("old_fingerprint"), col("new_fingerprint"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("old_fingerprint") <=> col("new_fingerprint"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Near-duplicate decontamination: flag corpus documents whose content
    * is a NEAR-dup of any benchmark/eval document — the fuzzy upgrade of
    * [[decontaminate]] (n-gram overlap misses paraphrases that keep few
    * exact shingles; a lightly reworded eval answer still trips the
    * MinHash estimate). Matching is [[TextDedup.incrementalMinhashLsh]]
    * with the BENCHMARK as the batch side, so the scale asymmetry is
    * exactly right: the benchmark's band keys broadcast (eval suites are
    * MBs), the corpus side probes them map-side and NEVER shuffles, and
    * only surviving candidate ids cross an exchange.
    *
    * Output: idCol, n_matches (benchmark docs estimated ≥ threshold),
    * max_est_jaccard (0.0 when clean), contaminated — rows = `docs`
    * rows exactly. */
  def fuzzyDecontaminate(docs: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         threshold: Double = 0.5): DataFrame = {
    val hits = TextDedup.incrementalMinhashLsh(
        batch = benchmark, snapshot = docs, idCol, textCol, threshold)
      .groupBy(col("snap_id").as(idCol))
      .agg(count(lit(1)).as("n_matches"), max("est_jaccard").as("__max"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("__max"), lit(0.0)).as("max_est_jaccard"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("contaminated"))
  }
}
