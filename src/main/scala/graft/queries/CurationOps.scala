package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Curation

/** Curation-stage queries for the training-data pipeline [extension —
  * north star]: decontamination, PII redaction, per-domain caps,
  * stratified sampling, and mixture weighting over the `documents`
  * table. Every query is DuckDB-oracle-checked; the fuzzy pieces reuse
  * the [[graft.functions.DetHash]] portable hash family so both engines
  * replay the identical bits.
  */
object CurationOps {

  // ── shared DuckDB snippets (same family as DedupOps) ───────────────
  private val duckToks = "str_split_regex(trim(text), '\\s+')"
  private def duckShingles(n: Int): String = {
    val parts = (0 until n).map(k => s"t[i + $k]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, len(t) - ${n - 1}), i -> $parts)"
  }
  private val duckH = "(('0x' || substr(md5(x), 1, 15))::UBIGINT)::BIGINT"

  /** The pii1 fixture text: the corpus carries no PII, so the query
    * plants a deterministic, doc_id-keyed tail — identically in both
    * engines — and redacts it. Variation by doc_id (email only on
    * id%3≠0, ip only on id%2=0) keeps the counts non-constant. */
  private def plantedText = {
    val id = col("doc_id")
    concat(col("text"),
      when(id % 3 =!= 0,
        concat(lit(" contact user"), id.cast("string"), lit("@mail.example.com")))
        .otherwise(lit("")),
      when(id % 2 === 0,
        concat(lit(" from 10."), (id % 200).cast("string"), lit(".0."),
          (id % 250).cast("string"))).otherwise(lit("")),
      lit(" ref 9"), lpad(id.cast("string"), 8, "0"))
  }
  private val duckPlanted =
    """text ||
      |  CASE WHEN doc_id % 3 <> 0
      |       THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 2 = 0
      |       THEN ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
      |       ELSE '' END ||
      |  ' ref 9' || lpad(doc_id::VARCHAR, 8, '0')""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ct1 — benchmark decontamination [extension]: every 10th document
    // plays the eval set; the rest are candidates, flagged when they
    // share any 4-token shingle with the benchmark. Broadcast benchmark
    // shingle hashes; the corpus side never shuffles text (Curation
    // Scaladoc has the 100 TB argument).
    "ct1_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Curation.decontaminate(
        docs = docs.filter(col("doc_id") % 10 =!= 0),
        benchmark = docs.filter(col("doc_id") % 10 === 0),
        idCol = "doc_id", textCol = "text", n = 4)
        .orderBy("doc_id")
    }),

    // pii1 — PII redaction [extension]: plant a deterministic email /
    // IPv4 / long-number tail per doc (the fixture corpus has none),
    // then scrub it. Counts are taken on the pre-redaction text; the
    // clean text itself is part of the oracle compare.
    "pii1_redaction" -> ((s, dir) =>
      Curation.redactPii(
        Tables.documents(s, dir).withColumn("text", plantedText),
        "doc_id", "text")
        .orderBy("doc_id")),

    // cr1 — per-domain cap [extension]: keep the 5 longest docs per
    // source (ties to lowest id) WITHOUT a full-corpus window — bounded
    // TopK aggregate → exact (value, id) cutoff → filter; rank runs
    // over survivors only.
    "cr1_domain_cap" -> ((s, dir) =>
      Curation.capPerGroup(
        Tables.documents(s, dir).select("source", "doc_id", "n_chars"),
        groupCol = "source", valueCol = "n_chars", idCol = "doc_id", k = 5)
        .orderBy("source", "rk")),

    // cr2 — deterministic stratified sampling [extension]: hash-gated
    // per-language keep rates (en .5 / de .3 / zh .2 / rest .1) — a
    // pure map, reproducible and partition-stable, the only sampling
    // shape that audits at 100 TB.
    "cr2_stratified_sample" -> ((s, dir) =>
      Curation.stratifiedSample(
        Tables.documents(s, dir).select("doc_id", "lang", "source"),
        idCol = "doc_id", stratumCol = "lang",
        rates = Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2),
        defaultRate = 0.1)
        .orderBy("doc_id")),

    // cr4 — token-budget selection [extension]: greedily fill a
    // 2000-token budget per source with the longest (highest-quality
    // stand-in: n_chars) documents first — the "N tokens of the best
    // data per domain" step after scoring. Per-stratum window, one
    // shuffle on source; overshoot ≤ 1 doc by the greedy convention.
    "cr4_token_budget" -> ((s, dir) =>
      Curation.tokenBudget(
        Tables.documents(s, dir), idCol = "doc_id", stratumCol = "source",
        tokensCol = graft.ops.TextAnalysis.nTokensCol(col("text")),
        qualityCol = col("n_chars"), budget = 2000L)
        .orderBy("source", "doc_id")),

    // cr5 — adaptive quantile trim [extension]: clip each source's
    // token-length distribution to its own p05–p95 band (per-domain
    // healthy lengths differ; absolute thresholds can't serve all).
    // Bounds = one |strata|-row aggregate broadcast back; the corpus
    // never shuffles.
    "cr5_quantile_trim" -> ((s, dir) =>
      Curation.quantileTrim(
        Tables.documents(s, dir), idCol = "doc_id", stratumCol = "source",
        valueCol = graft.ops.TextAnalysis.nTokensCol(col("text")))
        .orderBy("source", "doc_id")),

    // px3 — filter cascade with reason codes [extension]: every doc
    // annotated keep/drop with the FIRST failing rule (null_text →
    // too_short → too_long → language → low_stopword → repetitive →
    // duplicate); reasons are mutually exclusive so per-shard drop
    // accounting sums exactly. One corpus scan + one fingerprint-window
    // shuffle (Curation.filterCascade Scaladoc).
    "px3_filter_cascade" -> ((s, dir) =>
      Curation.filterCascade(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // cr3 — domain-mixture weights [extension]: actual vs target token
    // share per language and the resampling weight that achieves the
    // target mix (uniform 20% here). Exact BIGINT token sums, one row
    // per language.
    "cr3_domain_mixture" -> ((s, dir) =>
      Curation.mixtureWeights(
        Tables.documents(s, dir), "lang",
        tokensCol = graft.ops.TextAnalysis.nTokensCol(col("text")),
        targets = Map("en" -> 0.2, "de" -> 0.2, "es" -> 0.2,
          "fr" -> 0.2, "zh" -> 0.2))
        .orderBy("lang")),

    // cr6 — leakage-safe split assignment [extension]: train/val/test
    // drawn from the CONTENT fingerprint, so byte-identical duplicates
    // always share a split and can never leak eval content into
    // training. Pure map, zero shuffles, stable under corpus growth
    // (Curation.groupSplit Scaladoc).
    "cr6_group_split" -> ((s, dir) =>
      Curation.groupSplit(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // ct2 — fuzzy decontamination [extension]: ct1's exact-shingle probe
    // upgraded to MinHash near-dup matching — a paraphrased eval answer
    // that keeps few exact 4-grams still trips the signature estimate.
    // Benchmark bands broadcast; the corpus never shuffles
    // (TextDedup.incrementalMinhashLsh asymmetry, reused verbatim).
    "ct2_fuzzy_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Curation.fuzzyDecontaminate(
        docs = docs.filter(col("doc_id") % 10 =!= 0),
        benchmark = docs.filter(col("doc_id") % 10 === 0),
        idCol = "doc_id", textCol = "text")
        .orderBy("doc_id")
    }),

    // cr7 — corpus snapshot diff [extension]: content-fingerprint diff
    // of two snapshot versions (added/removed/changed/unchanged) — the
    // bookkeeping pass of an incremental run, feeding dd8/dd10 only the
    // added+changed slice. Old = ids not divisible by 10; new = ids not
    // divisible by 13 with every 7th doc's text amended, so all four
    // statuses occur (and the null-safe fingerprint compare is
    // exercised by NULL-text rows). Raw text collapses to 16-byte
    // fingerprints before the only shuffle (Curation.corpusDiff).
    "cr7_corpus_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Curation.corpusDiff(
        oldDocs = docs.filter(col("doc_id") % 10 =!= 0),
        newDocs = docs.filter(col("doc_id") % 13 =!= 0)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))),
        idCol = "doc_id", textCol = "text")
        .orderBy("doc_id")
    }),

    // cr8 — α-temperature source mixture [extension]: GPT-3-style
    // exponent-smoothed sampling (α = 1/2) — per-source targets ∝
    // sqrt(n_s), DERIVED from corpus counts where cr3 takes explicit
    // shares; integer-quantized weights + exact BIGINT targets + the
    // hash-gated draw make the whole selection hash-verified
    // (Curation.temperatureMixture Scaladoc).
    "cr8_temperature_mixture" -> ((s, dir) =>
      Curation.temperatureMixture(Tables.documents(s, dir),
        "doc_id", "source", budget = 300L)
        .orderBy("source", "doc_id")))

  val oracles: Map[String, String] = Map(

    "cr8_temperature_mixture" ->
      Curation.duckTemperatureMixture(budget = 300L),

    "cr4_token_budget" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens, n_chars
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT source, doc_id, n_tokens, cum_before,
         |  cum_before < 2000 AS selected
         |FROM c ORDER BY source, doc_id""".stripMargin,

    "cr5_quantile_trim" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, CAST(len($duckToks) AS DOUBLE) AS value
         |  FROM documents),
         |b AS (
         |  SELECT source, quantile_cont(value, 0.05) AS lo,
         |         quantile_cont(value, 0.95) AS hi
         |  FROM t GROUP BY source)
         |SELECT source, doc_id, value, lo, hi,
         |  value >= lo AND value <= hi AS kept
         |FROM t JOIN b USING (source)
         |ORDER BY source, doc_id""".stripMargin,

    "px3_filter_cascade" -> {
      def wc(w: String) = s"len(list_filter(t, x -> x = '$w'))"
      val en = s"${wc("the")} + ${wc("a")} + ${wc("is")}"
      val de = s"${wc("der")} + ${wc("die")} + ${wc("und")}"
      val es = s"${wc("el")} + ${wc("la")} + ${wc("y")}"
      val fr = s"${wc("le")} + ${wc("les")} + ${wc("et")}"
      s"""WITH b AS (
         |  SELECT doc_id, text, $duckToks AS t,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, text IS NULL AS nulltext, len(t) AS n,
         |    len(list_distinct(t)) AS ntypes,
         |    list_max(list_transform(list_distinct(t),
         |      w -> len(list_filter(t, x -> x = w)))) AS maxf,
         |    CASE WHEN t IS NULL THEN NULL
         |         WHEN len(t) > 1 THEN list_transform(
         |           generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
         |         ELSE [] END AS bg,
         |    ${wc("the")} + ${wc("a")} AS st,
         |    CASE
         |      WHEN ($en) >= ($de) AND ($en) >= ($es) AND ($en) >= ($fr) AND ($en) > 0 THEN 'en'
         |      WHEN ($de) >= ($es) AND ($de) >= ($fr) AND ($de) > 0 THEN 'de'
         |      WHEN ($es) >= ($fr) AND ($es) > 0 THEN 'es'
         |      WHEN ($fr) > 0 THEN 'fr'
         |      ELSE 'und'
         |    END AS pred_lang,
         |    doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
         |  FROM b),
         |f AS (
         |  SELECT doc_id, n,
         |    CASE WHEN nulltext THEN 'null_text'
         |         WHEN n < 20 THEN 'too_short'
         |         WHEN n > 1000 THEN 'too_long'
         |         WHEN pred_lang <> 'en' THEN 'language'
         |         WHEN CAST(st AS DOUBLE) / n <= 0.01 THEN 'low_stopword'
         |         WHEN 1.0 - CAST(ntypes AS DOUBLE) / n > 0.6
         |           OR CAST(maxf AS DOUBLE) / n > 0.3
         |           OR (CASE WHEN len(bg) > 0
         |                 THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
         |                 ELSE 0.0 END) > 0.5 THEN 'repetitive'
         |         WHEN is_dup THEN 'duplicate'
         |         ELSE NULL END AS drop_reason
         |  FROM m)
         |SELECT doc_id, CAST(n AS INT) AS n_tokens, drop_reason,
         |  drop_reason IS NULL AS keep
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "ct1_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
         |sh AS (SELECT doc_id,
         |         list_distinct(list_transform(${duckShingles(4)}, x -> $duckH)) AS s
         |       FROM toks WHERE len(t) >= 4),
         |bs AS (SELECT DISTINCT unnest(s) AS h FROM sh WHERE doc_id % 10 = 0),
         |cs AS (SELECT doc_id, unnest(s) AS h FROM sh WHERE doc_id % 10 <> 0),
         |ov AS (SELECT doc_id, COUNT(*) AS n_overlap
         |       FROM cs JOIN bs USING (h) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(COALESCE(len(sh.s), 0) AS INT) AS n_shingles,
         |  CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  COALESCE(ov.n_overlap, 0) > 0 AS contaminated
         |FROM documents d
         |LEFT JOIN sh ON d.doc_id = sh.doc_id
         |LEFT JOIN ov ON d.doc_id = ov.doc_id
         |WHERE d.doc_id % 10 <> 0 ORDER BY d.doc_id""".stripMargin,

    "pii1_redaction" -> {
      // DuckDB regular strings pass backslashes through verbatim, so the
      // runtime pattern (e.g. \b...) embeds directly — RE2 sees the same
      // bytes Java's regex engine does.
      val email = Curation.EmailPat
      val ip = Curation.Ipv4Pat
      val num = Curation.LongNumPat
      s"""WITH p AS (SELECT doc_id, $duckPlanted AS t FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<EMAIL>', 'g'),
         |    '$ip', '<IP>', 'g'),
         |    '$num', '<NUM>', 'g') AS clean,
         |  CAST(len(regexp_extract_all(t, '$email')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$ip')) AS INT) AS n_ips,
         |  CAST(len(regexp_extract_all(t, '$num')) AS INT) AS n_longnums
         |FROM p ORDER BY doc_id""".stripMargin
    },

    "cr1_domain_cap" ->
      """WITH r AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT source, doc_id, n_chars, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    "cr2_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${Curation.duckDraw("doc_id")} <
         |  CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 300000
         |            WHEN 'zh' THEN 200000 ELSE 100000 END
         |ORDER BY doc_id""".stripMargin,

    "cr3_domain_mixture" ->
      s"""WITH per AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(len($duckToks)) AS BIGINT) AS total_tokens
         |  FROM documents GROUP BY lang),
         |g AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS grand FROM per)
         |SELECT lang, n_docs, total_tokens,
         |  CAST(total_tokens AS DOUBLE) / CAST(grand AS DOUBLE) AS actual_share,
         |  CAST(0.2 AS DOUBLE) AS target_share,
         |  CAST(0.2 AS DOUBLE)
         |    / (CAST(total_tokens AS DOUBLE) / CAST(grand AS DOUBLE)) AS weight
         |FROM per, g ORDER BY lang""".stripMargin,

    "cr6_group_split" -> Curation.duckGroupSplit(),

    "ct2_fuzzy_decontaminate" ->
      s"""WITH ${DedupOps.duckSigCtes},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS snap_id, b.doc_id AS batch_id
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0),
         |inc AS (
         |  SELECT snap_id, ${DedupOps.duckEstJaccard} AS ej
         |  FROM cand JOIN sigs sa ON cand.snap_id = sa.doc_id
         |            JOIN sigs sb ON cand.batch_id = sb.doc_id
         |  WHERE ${DedupOps.duckEstJaccard} >= 0.5),
         |ag AS (SELECT snap_id, COUNT(*) AS n_matches, MAX(ej) AS mx
         |       FROM inc GROUP BY snap_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(ag.n_matches, 0) AS BIGINT) AS n_matches,
         |  COALESCE(ag.mx, 0.0) AS max_est_jaccard,
         |  COALESCE(ag.n_matches, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN ag ON d.doc_id = ag.snap_id
         |WHERE d.doc_id % 10 <> 0 ORDER BY d.doc_id""".stripMargin,

    "cr7_corpus_diff" -> {
      val fp = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
      val fpV2 = "md5(regexp_replace(lower(trim(CASE WHEN doc_id % 7 = 0 " +
        "THEN text || ' v2' ELSE text END)), '\\s+', ' ', 'g'))"
      s"""WITH old AS (
         |  SELECT doc_id, $fp AS old_fingerprint
         |  FROM documents WHERE doc_id % 10 <> 0),
         |new AS (
         |  SELECT doc_id, $fpV2 AS new_fingerprint
         |  FROM documents WHERE doc_id % 13 <> 0)
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |  o.old_fingerprint, n.new_fingerprint,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.old_fingerprint IS NOT DISTINCT FROM n.new_fingerprint
         |         THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
         |ORDER BY doc_id""".stripMargin
    })
}
