package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * over a Rabin-Karp rolling hash — the fingerprinting scheme behind MOSS
  * and large-corpus containment detection: every character k-gram gets a
  * polynomial rolling hash (O(1) per position after the first window),
  * and from each window of `w` consecutive k-gram hashes the minimum is
  * selected. Guarantees: any substring match of at least k + w - 1
  * characters shares at least one selected fingerprint, and the selected
  * density is ~2/(w+1) of positions — so a document's fingerprint SET is
  * a small sketch that still catches partial overlap (quotes, boilerplate
  * wrappers, subset pages) that whole-document hashing (dd1) and
  * whole-document MinHash (dd2, resemblance not containment) both miss.
  *
  * Hash family: H_i = Σ_j code(s[i+j]) · B^(k-1-j) mod P with B = 131 and
  * P = 2^31 - 1, over Unicode code points. Every intermediate fits a
  * 64-bit long (code < 2^21, B^j mod P < 2^31 → products < 2^52), so the
  * DuckDB oracle can evaluate the SAME polynomial directly per position
  * ([[duckHashes]] generates that SQL from these constants — the two
  * engines cannot drift) while this UDF computes it with the O(1) rolling
  * update. The UDF is deterministic and pure — the SURVEY.md §7.4 escape
  * hatch, same rationale as [[TextHashUdfs]]: the equivalent higher-order
  * expression chain is CodegenFallback and O(len·k) interpreted lambdas.
  *
  * The input is expected PRE-normalized (lowercase, whitespace collapsed
  * to single spaces — the dd1 fingerprint normalization); callers apply
  * `regexp_replace(lower(trim(text)), "\\s+", " ")` as a codegen'd
  * Catalyst projection so the UDF only hashes.
  */
object WinnowUdf {

  /** Modulus: the Mersenne prime 2^31 - 1. */
  val P: Long = 2147483647L
  /** Polynomial base. */
  val B: Long = 131L

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), UserDefinedFunction]()

  /** UDF `normalizedText → Array[Long]` of DISTINCT winnowed fingerprints
    * (k-gram length `k` characters, winnow window `w` hashes). Texts
    * shorter than k characters (no k-gram) → null. Texts with fewer than
    * `w` k-grams → the single global minimum hash. */
  def apply(k: Int, w: Int): UserDefinedFunction =
    cache.computeIfAbsent((k, w), { case (kk, ww) =>
      require(kk >= 2 && ww >= 1, s"need k >= 2, w >= 1; got k=$kk w=$ww")
      val bk = { // B^(k-1) mod P, the rolled-out coefficient
        var v = 1L; var i = 0
        while (i < kk - 1) { v = (v * B) % P; i += 1 }
        v
      }
      udf { (s: String) =>
        if (s == null) null else winnow(s, kk, ww, bk)
      }
    })

  private def winnow(s: String, k: Int, w: Int, bk: Long): Array[Long] = {
    // code points, DuckDB-character-indexed semantics
    val cps = s.codePoints().toArray
    val m = cps.length - k + 1 // number of k-grams
    if (m <= 0) return null
    val hs = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + cps(j)) % P; j += 1 }
    hs(0) = h
    var i = 1
    while (i < m) {
      // rolling update: drop cps(i-1), append cps(i+k-1); stays in [0, P)
      h = (((h - (cps(i - 1) * bk) % P + P) % P) * B + cps(i + k - 1)) % P
      hs(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (m < w) {
      var mn = Long.MaxValue
      var t = 0
      while (t < m) { if (hs(t) < mn) mn = hs(t); t += 1 }
      seen.add(mn)
    } else {
      // min of each length-w window via a monotonic index deque: O(m)
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // [head, tail) holds indices with increasing hash
      var p = 0
      while (p < m) {
        while (tail > head && hs(deque(tail - 1)) >= hs(p)) tail -= 1
        deque(tail) = p; tail += 1
        if (deque(head) <= p - w) head += 1
        if (p >= w - 1) seen.add(hs(deque(head)))
        p += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  /** DuckDB SQL for the per-position k-gram hash list of column `s` —
    * the direct polynomial evaluation of the SAME (B, P) family the UDF
    * rolls, generated from the same constants so the oracle cannot
    * drift. Yields a list expression over positions 1..len(s)-k+1. */
  def duckHashes(k: Int, sCol: String = "s"): String = {
    val pows = Array.iterate(1L, k)(v => (v * B) % P).reverse // B^(k-1-j)
    val terms = (0 until k)
      .map(j => s"(unicode($sCol[i+$j]) * ${pows(j)}::BIGINT) % $P")
      .mkString(" + ")
    s"list_transform(generate_series(1, length($sCol) - ${k - 1}), i -> ($terms) % $P)"
  }

  /** DuckDB SQL for the distinct winnowed fingerprint list given a hash
    * list column `h` (the [[duckHashes]] output): min of each length-w
    * window, global min when fewer than w hashes. */
  def duckWinnow(w: Int, hCol: String = "h"): String =
    s"""list_distinct(CASE WHEN len($hCol) >= $w
       |  THEN list_transform(generate_series(1, len($hCol) - ${w - 1}),
       |         x -> list_min($hCol[x:x+${w - 1}]))
       |  ELSE [list_min($hCol)] END)""".stripMargin
}
