package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TokenProfileUdf

/** Public text-analysis API — parameterized form of the verified `tx*`
  * queries. Pure map over the corpus (no shuffles), so throughput scales
  * with input partitions. Word-count-driven signals (quality gate,
  * language ID) ride on [[TokenProfileUdf]] — one tokenization pass per
  * row counting every marker word, instead of one interpreted
  * `filter(split(...))` chain per word; structural signals (type/token
  * ratio, BPE-ish counts) stay on codegen'd split/regexp built-ins. */
object TextAnalysis {

  private def toks(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** size() that yields NULL for a null array regardless of
    * spark.sql.legacy.sizeOfNull / ANSI mode — a NULL document must
    * produce NULL stats (matching SQL semantics), never -1-derived
    * nonsense. */
  private def sz(arr: Column): Column =
    when(arr.isNull, lit(null).cast("int")).otherwise(size(arr))

  // ── defaults shared by quality gate / language ID / fused pipelines ──
  val defaultStopwords: Seq[String] = Seq("the", "a")
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "y"),
    "fr" -> Seq("le", "les", "et"))

  /** The union marker list covering the default stopwords and language
    * profiles — pass to [[profileCol]] when one profile should feed every
    * downstream signal (see px1/px2 in TextOps). */
  val defaultWords: Seq[String] =
    (defaultStopwords ++ defaultProfiles.flatMap(_._2)).distinct

  // ── Column-level building blocks ────────────────────────────────────
  // The DataFrame APIs below wrap these; expose them so several analyses
  // can be computed as columns of ONE corpus scan (joining the
  // DataFrame-level outputs on the id would re-scan and re-shuffle the
  // corpus once per analysis — the wrong shape at 100 TB; see
  // px1_curation_pipeline).

  /** One-pass token profile (n_tokens, counts per `words` entry). Calls
    * with the same word list produce canonically equal expressions, so
    * codegen subexpression elimination evaluates the pass once per row
    * however many signals read it. */
  def profileCol(textCol: Column, words: Seq[String]): Column =
    TokenProfileUdf(words)(textCol)

  /** Occurrence count of marker `w` read from a [[profileCol]] built over
    * `words` — public so composed pipelines (px3's filter cascade) can
    * attribute individual rules without re-tokenizing. */
  def countOf(profile: Column, words: Seq[String], w: String): Column = {
    val i = words.indexOf(w)
    require(i >= 0, s"word '$w' missing from the profile word list $words")
    profile.getField("counts").getItem(i)
  }

  /** Whitespace token count of a text column (NULL text → NULL). */
  def nTokensCol(textCol: Column): Column = sz(toks(textCol))

  /** Token count read from an existing [[profileCol]] — use in fused
    * scans so the tokenization isn't repeated. */
  def nTokensFromProfile(profile: Column): Column = profile.getField("n_tokens")

  /** The quality-gate keep flag derived from an existing [[profileCol]]
    * built over `words` ⊇ `stopwords`. */
  def keepFromProfile(profile: Column, words: Seq[String],
                      stopwords: Seq[String] = defaultStopwords,
                      minTokens: Int = 20, maxTokens: Int = 1000,
                      minStopRatio: Double = 0.01): Column = {
    val nTok = nTokensFromProfile(profile)
    val stop = stopwords.map(countOf(profile, words, _)).reduce(_ + _).cast("double")
    nTok >= minTokens && nTok <= maxTokens && (stop / nTok) > lit(minStopRatio)
  }

  /** The quality-gate keep flag of [[qualityScore]], as a column. */
  def keepCol(textCol: Column,
              stopwords: Seq[String] = defaultStopwords,
              minTokens: Int = 20, maxTokens: Int = 1000,
              minStopRatio: Double = 0.01): Column =
    keepFromProfile(profileCol(textCol, stopwords), stopwords, stopwords,
      minTokens, maxTokens, minStopRatio)

  /** Language prediction derived from an existing [[profileCol]] built
    * over `words` ⊇ every profile marker: argmax of marker-count scores,
    * declaration order breaking ties, 'und' when nothing fires. */
  def predLangFromProfile(profile: Column, words: Seq[String],
                          profiles: Seq[(String, Seq[String])] = defaultProfiles): Column = {
    val scores = profiles.map { case (lang, markers) =>
      lang -> markers.map(countOf(profile, words, _)).reduce(_ + _)
    }
    scores.zipWithIndex.foldLeft(when(lit(false), "")) {
      case (acc, ((lang, s), i)) =>
        val beatsLater = scores.drop(i + 1).map(_._2).foldLeft(lit(true)) {
          (c, other) => c && s >= other
        }
        acc.when(beatsLater && s > 0, lang)
    }.otherwise("und")
  }

  /** The predicted language of [[langId]], as a column. */
  def predLangCol(textCol: Column,
                  profiles: Seq[(String, Seq[String])] = defaultProfiles): Column = {
    val words = profiles.flatMap(_._2).distinct
    predLangFromProfile(profileCol(textCol, words), words, profiles)
  }

  /** Whitespace/type/BPE-ish token counts + mean token length. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    docs.select(col(idCol),
      sz(t).as("n_tokens"),
      sz(array_distinct(t)).as("n_types"),
      regexp_count(col(textCol), lit("[a-z]+|[0-9]+")).cast("int").as("n_bpe_ish"),
      (length(regexp_replace(col(textCol), "\\s", "")).cast("double") / sz(t))
        .as("avg_token_len"))
  }

  /** Length/stopword/type-token quality signals + keep flag. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = defaultStopwords,
                   minTokens: Int = 20, maxTokens: Int = 1000,
                   minStopRatio: Double = 0.01): DataFrame = {
    val t = toks(col(textCol))
    val profile = profileCol(col(textCol), stopwords)
    val nTok = nTokensFromProfile(profile)
    val stop = stopwords.map(countOf(profile, stopwords, _)).reduce(_ + _).cast("double")
    docs.select(col(idCol),
      length(col(textCol)).cast("long").as("len_chars"),
      nTok.as("n_tokens"),
      (stop / nTok).as("stopword_ratio"),
      (sz(array_distinct(t)).cast("double") / nTok).as("type_token_ratio"),
      keepFromProfile(profile, stopwords, stopwords, minTokens, maxTokens,
        minStopRatio).as("keep"))
  }

  /** Repetition signals for boilerplate/degenerate-text filtering (the
    * Gopher/C4-style repetition gate), one
    * [[graft.functions.RepetitionProfileUdf]] pass per row:
    * duplicate-token fraction, most-frequent-token share, and duplicate
    * adjacent-bigram fraction, plus the `repetitive` flag at the given
    * thresholds. Pure map — no shuffle. NULL text → NULL signals. */
  def repetitionScore(docs: DataFrame, idCol: String, textCol: String,
                      maxDupTokenRatio: Double = 0.6,
                      maxTopTokenRatio: Double = 0.3,
                      maxDupBigramRatio: Double = 0.5): DataFrame = {
    val p = graft.functions.RepetitionProfileUdf.instance(col(textCol))
    val nTok = p.getField("n_tokens")
    val dupTok = lit(1.0) - p.getField("n_types").cast("double") / nTok
    val topTok = p.getField("max_tok_freq").cast("double") / nTok
    val dupBg = when(p.isNull, lit(null).cast("double"))
      .when(p.getField("n_bigrams") > 0,
        lit(1.0) - p.getField("n_distinct_bigrams").cast("double")
          / p.getField("n_bigrams"))
      .otherwise(0.0)
    docs.select(col(idCol),
      nTok.as("n_tokens"),
      dupTok.as("dup_token_ratio"),
      topTok.as("top_token_ratio"),
      dupBg.as("dup_bigram_ratio"),
      (dupTok > maxDupTokenRatio || topTok > maxTopTokenRatio ||
        dupBg > maxDupBigramRatio).as("repetitive"))
  }

  /** Positional repetition signals — the second half of the Gopher
    * repetition-removal gate, complementing [[repetitionScore]]'s
    * distinctness ratios with POSITION COVERAGE (how much of the
    * document the repeats actually span; [[graft.functions.DupSpanUdf]]
    * has the tx6-vs-tx8 distinction and the determinism ledger):
    * top_gram_frac = union-coverage fraction of the most frequent
    * topN-gram, dup_span_frac = union-coverage fraction of all
    * dupN-grams occurring twice or more within the document. Default
    * thresholds follow Gopher's published gates (top-3-gram 0.18,
    * duplicate-5-gram 0.15; Rae et al. 2021, table A1) in token units.
    * Pure map — no shuffle. NULL text → NULL signals. */
  def dupSpanProfile(docs: DataFrame, idCol: String, textCol: String,
                     topN: Int = 3, dupN: Int = 5,
                     maxTopFrac: Double = 0.18,
                     maxDupFrac: Double = 0.15): DataFrame = {
    val p = graft.functions.DupSpanUdf(topN, dupN)(col(textCol))
    val nTok = p.getField("n_tokens")
    val topFrac = p.getField("top_covered").cast("double") / nTok
    val dupFrac = p.getField("dup_covered").cast("double") / nTok
    docs.select(col(idCol),
      nTok.as("n_tokens"),
      p.getField("top_covered").as("top_gram_covered"),
      topFrac.as("top_gram_frac"),
      p.getField("dup_covered").as("dup_span_covered"),
      dupFrac.as("dup_span_frac"),
      (topFrac > maxTopFrac || dupFrac > maxDupFrac).as("repetitive_spans"))
  }

  /** Normalized-content md5 fingerprint + 3-gram shingle count. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    docs.select(col(idCol),
      TextDedup.fingerprint(col(textCol)).as("fingerprint"),
      when(col(textCol).isNull, lit(null).cast("int"))
        .otherwise(greatest(sz(t) - 2, lit(0))).as("n_shingles3"))
  }

  /** Fixed-width histogram over a numeric column (corpus length/token
    * profiling): one hash aggregation, bucket_lo = floor(v/width)*width.
    * Output: bucket_lo, n_docs. */
  def histogram(docs: DataFrame, valueCol: String, width: Long): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1, got $width")
    docs.select((floor(col(valueCol) / width).cast("long") * width).as("bucket_lo"))
      .groupBy("bucket_lo").agg(count(lit(1)).as("n_docs"))
  }

  /** Corpus-wide frequent token n-grams — the boilerplate census of a
    * training pipeline: the grams with the highest DOCUMENT frequency
    * are exactly the shared headers/footers/templates that blow up the
    * pair joins of dd2/dd4/dd9, so this is how their `maxBucketSize` /
    * `maxShingleDf` / `maxFingerprintDf` guards get sized in practice.
    *
    * Shape: per-doc grams are one [[graft.functions.TextHashUdfs]] pass
    * (the HOF transform chain is CodegenFallback and interprets a
    * lambda per position — the same trade the shingle pipeline
    * documents); the first aggregate keys (ngram, doc) with map-side
    * combine, the second folds to one row per surviving gram — shuffle
    * volume collapses to vocabulary size, never corpus size. `minDf`
    * prunes the singleton tail BEFORE the top-k; the final top-k is a
    * TakeOrderedAndProject with a total order (df desc, occurrences
    * desc, gram asc). At 100 TB the exact census stays feasible because
    * both aggregates partial-combine; if even the vocabulary is too
    * wide, raise `minDf` (lossy-counting cutoff) rather than sampling.
    * Output: ngram, n_docs, n_occurrences — k rows. */
  def topNgrams(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 2, k: Int = 20, minDf: Long = 1): DataFrame = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    require(k >= 1, s"top-k must be >= 1, got $k")
    // one-pass gram UDF: the HOF transform+slice form is CodegenFallback
    // and interprets a lambda (plus an array copy) per position —
    // measured 3-5× slower (the TokenProfileUdf argument, again)
    val grams = graft.functions.TextHashUdfs.wordNgrams(n)(col(textCol))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"), explode(grams).as("ngram"))
      // SQL-split parity gives whitespace-only docs one EMPTY token,
      // which at n=1 would surface as a phantom '' gram; drop it (the
      // oracle applies the same guard)
      .filter(col("ngram") =!= "")
      .groupBy("ngram", "__doc").agg(count(lit(1)).as("__tf"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_docs"), sum("__tf").as("n_occurrences"))
      .filter(col("n_docs") >= minDf)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Keyword-profile language ID: marker-word scores per language,
    * argmax with the profile's declaration order as tie-break, 'und'
    * when nothing fires. `carry` columns pass through untouched. */
  def langId(docs: DataFrame, idCol: String, textCol: String,
             profiles: Seq[(String, Seq[String])] = defaultProfiles,
             carry: Seq[String] = Nil): DataFrame = {
    val words = profiles.flatMap(_._2).distinct
    val profile = profileCol(col(textCol), words)
    val scores = profiles.map { case (lang, markers) =>
      lang -> markers.map(countOf(profile, words, _)).reduce(_ + _)
    }
    docs.select((col(idCol) +: carry.map(col)) ++
      scores.map { case (l, s) => s.as(s"s_$l") } :+
      predLangFromProfile(profile, words, profiles).as("pred_lang"): _*)
  }
}
