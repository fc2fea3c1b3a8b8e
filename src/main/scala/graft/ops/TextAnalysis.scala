package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public text-analysis API — parameterized form of the verified `tx*`
  * queries. Pure map over the corpus (no shuffles, no UDFs: split/
  * filter/regexp built-ins only), so throughput scales with input
  * partitions. */
object TextAnalysis {

  private def toks(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** size() that yields NULL for a null array regardless of
    * spark.sql.legacy.sizeOfNull / ANSI mode — a NULL document must
    * produce NULL stats (matching SQL semantics), never -1-derived
    * nonsense. */
  private def sz(arr: Column): Column =
    when(arr.isNull, lit(null).cast("int")).otherwise(size(arr))

  /** Occurrences of `w` among the tokens — built from Column operations
    * (not interpolated SQL text), so words with quotes and column names
    * needing backticks are safe. */
  private def wordCount(textCol: String, w: String): Column =
    wordCountCol(col(textCol), w)
  private def wordCountCol(textCol: Column, w: String): Column =
    sz(filter(toks(textCol), _ === lit(w)))

  // ── Column-level building blocks ────────────────────────────────────
  // The DataFrame APIs below wrap these; expose them so several analyses
  // can be computed as columns of ONE corpus scan (joining the
  // DataFrame-level outputs on the id would re-scan and re-shuffle the
  // corpus once per analysis — the wrong shape at 100 TB; see
  // px1_curation_pipeline).

  /** Whitespace token count of a text column (NULL text → NULL). */
  def nTokensCol(textCol: Column): Column = sz(toks(textCol))

  /** The quality-gate keep flag of [[qualityScore]], as a column. */
  def keepCol(textCol: Column,
              stopwords: Seq[String] = Seq("the", "a"),
              minTokens: Int = 20, maxTokens: Int = 1000,
              minStopRatio: Double = 0.01): Column = {
    val nTok = nTokensCol(textCol)
    val stop = stopwords.map(wordCountCol(textCol, _)).reduce(_ + _).cast("double")
    nTok >= minTokens && nTok <= maxTokens && (stop / nTok) > lit(minStopRatio)
  }

  /** The predicted language of [[langId]], as a column. */
  def predLangCol(textCol: Column,
                  profiles: Seq[(String, Seq[String])] = Seq(
                    "en" -> Seq("the", "a", "is"),
                    "de" -> Seq("der", "die", "und"),
                    "es" -> Seq("el", "la", "y"),
                    "fr" -> Seq("le", "les", "et"))): Column = {
    val scores = profiles.map { case (lang, words) =>
      lang -> words.map(wordCountCol(textCol, _)).reduce(_ + _)
    }
    scores.zipWithIndex.foldLeft(when(lit(false), "")) {
      case (acc, ((lang, s), i)) =>
        val beatsLater = scores.drop(i + 1).map(_._2).foldLeft(lit(true)) {
          (c, other) => c && s >= other
        }
        acc.when(beatsLater && s > 0, lang)
    }.otherwise("und")
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
                   stopwords: Seq[String] = Seq("the", "a"),
                   minTokens: Int = 20, maxTokens: Int = 1000,
                   minStopRatio: Double = 0.01): DataFrame = {
    val t = toks(col(textCol))
    val nTok = sz(t)
    val stop = stopwords.map(wordCount(textCol, _)).reduce(_ + _).cast("double")
    docs.select(col(idCol),
      length(col(textCol)).cast("long").as("len_chars"),
      nTok.as("n_tokens"),
      (stop / nTok).as("stopword_ratio"),
      (sz(array_distinct(t)).cast("double") / nTok).as("type_token_ratio"),
      keepCol(col(textCol), stopwords, minTokens, maxTokens, minStopRatio)
        .as("keep"))
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

  /** Keyword-profile language ID: marker-word scores per language,
    * argmax with the profile's declaration order as tie-break, 'und'
    * when nothing fires. `carry` columns pass through untouched. */
  def langId(docs: DataFrame, idCol: String, textCol: String,
             profiles: Seq[(String, Seq[String])] = Seq(
               "en" -> Seq("the", "a", "is"),
               "de" -> Seq("der", "die", "und"),
               "es" -> Seq("el", "la", "y"),
               "fr" -> Seq("le", "les", "et")),
             carry: Seq[String] = Nil): DataFrame = {
    val scores = profiles.map { case (lang, words) =>
      lang -> words.map(wordCount(textCol, _)).reduce(_ + _)
    }
    docs.select((col(idCol) +: carry.map(col)) ++
      scores.map { case (l, s) => s.as(s"s_$l") } :+
      predLangCol(col(textCol), profiles).as("pred_lang"): _*)
  }
}
