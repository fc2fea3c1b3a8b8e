package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** One-pass intra-document duplicated-span profile: token count plus the
  * union-coverage of (a) the single most frequent topN-gram and (b) all
  * dupN-grams occurring at least twice WITHIN the document. */
case class DupSpanProfile(n_tokens: Int, top_covered: Int, dup_covered: Int)

/** The Gopher repetition-removal signals tx6 does not cover: tx6's
  * ratios are DISTINCTNESS counts (how many gram types repeat), these
  * are POSITION COVERAGE (how much of the document the repeats span) —
  * Gopher's "fraction of characters contained in the most frequent
  * n-gram" and "fraction of characters in duplicated n-grams", in token
  * units, with overlapping occurrences counted once via interval union.
  * A doc of one phrase looping scores ~1.0 here while its distinctness
  * ratios saturate long before.
  *
  * Intra-document signals need no shuffle at all, so this is a pure-map
  * UDF (the SURVEY.md §7.4 escape hatch; same rationale as
  * [[RepetitionProfileUdf]]) — strictly better at scale than the
  * explode+window formulation, which would shuffle a corpus-sized gram
  * posting list to compute a per-row quantity. The inter-document
  * complement ([[graft.ops.TextDedup.spanCoverage]]) genuinely needs the
  * corpus-wide df and pays that shuffle.
  *
  * Determinism ledger for the DuckDB replay: tokenization is
  * [[TokenProfileUdf.tokenize]] (split-trim parity); grams are
  * space-joined (injective — tokens cannot contain whitespace); the
  * most-frequent-gram tie-break is the lexicographically SMALLEST gram
  * string, identical in both engines for the ASCII token alphabet
  * (Scala compares UTF-16 units, DuckDB UTF-8 bytes — these orders
  * agree on ASCII; supplementary-plane corpora would need a byte-wise
  * comparator here). Coverage is exact integer arithmetic.
  */
object DupSpanUdf {

  /** Union coverage of sorted ascending start positions, each spanning
    * n tokens: first start covers n, each next start covers
    * min(n, gap-to-previous-start) new positions. */
  private def coverage(starts: Array[Int], len: Int, n: Int): Int = {
    var cov = 0
    var i = 0
    while (i < len) {
      cov += (if (i == 0) n else math.min(n, starts(i) - starts(i - 1)))
      i += 1
    }
    cov
  }

  /** UDF `text → DupSpanProfile` (null text → null). */
  def apply(topN: Int = 3, dupN: Int = 5): UserDefinedFunction = udf { (text: String) =>
    if (text == null) null
    else {
      val toks = TokenProfileUdf.tokenize(text)

      def grams(n: Int): Array[String] = TextHashUdfs.shingleStrings(toks, n)

      // most frequent topN-gram (ties → smallest gram), then the union
      // coverage of its occurrence positions (ascending by scan order)
      val g1 = grams(topN)
      var topCov = 0
      if (g1.nonEmpty) {
        val freq = new java.util.HashMap[String, Int](g1.length * 2)
        var i = 0
        while (i < g1.length) { freq.merge(g1(i), 1, Integer.sum); i += 1 }
        var best: String = null
        var bestC = 0
        val it = freq.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestC ||
              (e.getValue == bestC && e.getKey.compareTo(best) < 0)) {
            best = e.getKey; bestC = e.getValue
          }
        }
        val starts = new Array[Int](bestC)
        var j = 0
        i = 0
        while (i < g1.length) {
          if (g1(i) == best) { starts(j) = i; j += 1 }
          i += 1
        }
        topCov = coverage(starts, j, topN)
      }

      // union coverage of every dupN-gram occurring >= 2 times; merged
      // position stream stays ascending because we re-scan in position
      // order against the counted set
      val g2 = grams(dupN)
      var dupCov = 0
      if (g2.nonEmpty) {
        val freq = new java.util.HashMap[String, Int](g2.length * 2)
        var i = 0
        while (i < g2.length) { freq.merge(g2(i), 1, Integer.sum); i += 1 }
        val starts = new Array[Int](g2.length)
        var j = 0
        i = 0
        while (i < g2.length) {
          if (freq.get(g2(i)) >= 2) { starts(j) = i; j += 1 }
          i += 1
        }
        dupCov = coverage(starts, j, dupN)
      }

      DupSpanProfile(toks.length, topCov, dupCov)
    }
  }
}
