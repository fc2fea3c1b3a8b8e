package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** One-pass token profile of a document: whitespace token count plus the
  * occurrence count of each word in a fixed marker list. */
case class TokenProfile(n_tokens: Int, counts: Seq[Int])

/** Single-pass replacement for per-word `size(filter(split(...), ...))`
  * chains: quality gating + language ID over W marker words evaluated as
  * separate higher-order Catalyst expressions costs W+1 regex splits per
  * row and interprets one lambda per token (higher-order functions are
  * CodegenFallback). This deterministic UDF — the SURVEY.md §7.4 escape
  * hatch, same rationale as [[TextHashUdfs]] — tokenizes ONCE and counts
  * every marker word in the same pass: O(len + tokens) per row
  * regardless of marker count.
  *
  * Tokenization replicates the Catalyst `split(trim(text), '\s+')` the
  * DuckDB oracle replays, exactly: trim strips ASCII spaces only (Spark
  * `trim`, not Java `String.trim`), and the split keeps trailing empty
  * strings (Spark uses limit -1), so e.g. `"a\t"` still yields
  * `["a", ""]` in both formulations.
  *
  * Instances are cached per word list, so two calls with the same list
  * share one function object — the resulting ScalaUDF expressions are
  * canonically equal and whole-stage codegen's subexpression elimination
  * evaluates the profile once per row even when keep/language/token
  * columns all reference it.
  */
object TokenProfileUdf {

  private val WS = java.util.regex.Pattern.compile("\\s+")

  private def spaceTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** The exact `split(trim(text), '\s+')` tokenization every oracle
    * replays — shared so sibling single-pass UDFs (e.g.
    * [[RepetitionProfileUdf]]) cannot drift from it. */
  private[functions] def tokenize(text: String): Array[String] =
    WS.split(spaceTrim(text), -1)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], UserDefinedFunction]()

  /** UDF `text → TokenProfile` counting `words` (null text → null). */
  def apply(words: Seq[String]): UserDefinedFunction =
    cache.computeIfAbsent(words, { ws =>
      val n = ws.length
      val idx = new java.util.HashMap[String, Integer](n * 2)
      ws.zipWithIndex.foreach { case (w, i) => idx.put(w, i) }
      udf { (text: String) =>
        if (text == null) null
        else {
          val toks = tokenize(text)
          val counts = new Array[Int](n)
          var i = 0
          while (i < toks.length) {
            val j = idx.get(toks(i))
            if (j != null) counts(j.intValue) += 1
            i += 1
          }
          TokenProfile(toks.length,
            scala.collection.immutable.ArraySeq.unsafeWrapArray(counts))
        }
      }
    })
}
