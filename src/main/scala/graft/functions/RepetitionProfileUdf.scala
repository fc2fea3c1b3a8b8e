package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** One-pass repetition profile of a document: token/type counts, the
  * highest single-token occurrence count, and adjacent-bigram totals. */
case class RepetitionProfile(
    n_tokens: Int, n_types: Int, max_tok_freq: Int,
    n_bigrams: Int, n_distinct_bigrams: Int)

/** Single-pass repetition signals for boilerplate/degenerate-text
  * filtering (the Gopher/C4-style "repetition removal" gate): duplicate
  * token fraction, most-frequent-token share, duplicate adjacent-bigram
  * fraction. The Catalyst formulation needs `array_distinct` twice plus
  * a `transform` over a `sequence` for the bigrams — three interpreted
  * CodegenFallback passes over every token array — so this deterministic
  * UDF (the SURVEY.md §7.4 escape hatch, same rationale as
  * [[TokenProfileUdf]]) computes all five counts in one O(tokens) pass
  * with two hash structures.
  *
  * Tokenization is [[TokenProfileUdf.tokenize]] — bit-identical to the
  * `split(trim(text), '\s+')` the DuckDB oracle replays. Bigram identity
  * uses the space-joined form the oracle uses (`t[i] || ' ' || t[i+1]`);
  * tokens cannot contain whitespace, so the join is injective on pairs.
  */
object RepetitionProfileUdf {

  /** UDF `text → RepetitionProfile` (null text → null). */
  val instance: UserDefinedFunction = udf { (text: String) =>
    if (text == null) null
    else {
      val toks = TokenProfileUdf.tokenize(text)
      val freq = new java.util.HashMap[String, Int](toks.length * 2)
      val bigrams = new java.util.HashSet[String](toks.length * 2)
      var maxFreq = 0
      var i = 0
      while (i < toks.length) {
        val c = freq.merge(toks(i), 1, Integer.sum)
        if (c > maxFreq) maxFreq = c
        if (i > 0) bigrams.add(toks(i - 1) + " " + toks(i)): Unit
        i += 1
      }
      RepetitionProfile(
        n_tokens = toks.length,
        n_types = freq.size,
        max_tok_freq = maxFreq,
        n_bigrams = math.max(toks.length - 1, 0),
        n_distinct_bigrams = bigrams.size)
    }
  }
}
