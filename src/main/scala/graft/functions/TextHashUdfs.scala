package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Native (single-pass, primitive-typed) implementations of the text-hash
  * pipelines, used where the equivalent higher-order Catalyst expressions
  * are CodegenFallback and interpret one lambda per element (48 bit-votes
  * × 300 tokens × N docs adds up). Each function is a deterministic pure
  * UDF — the sanctioned escape hatch of SURVEY.md §7.4 — and computes
  * EXACTLY the md5-derived [[DetHash]] family the DuckDB oracle replays,
  * so the correctness gate is unchanged.
  *
  * Tokenization matches `split(trim(text), '\s+')`; shingles join n
  * consecutive tokens with single spaces; H(s) is the first 15 hex chars
  * of md5 parsed base-16 (60 bits).
  */
object TextHashUdfs {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  /** H(s): first 15 hex chars of md5(s) as a 60-bit long. */
  def h(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // 15 hex chars = 7.5 bytes: bytes 0..6 fully, high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  private def tokenize(text: String): Array[String] =
    if (text == null) Array.empty else text.trim.split("\\s+")

  /** Space-joined token n-grams — the determinism-critical gram text
    * shared with every DuckDB oracle (the separator is part of the
    * cross-engine hash contract); package-visible so [[DupSpanUdf]]
    * folds over the same construction instead of a copy. */
  private[functions] def shingleStrings(toks: Array[String], n: Int): Array[String] = {
    if (toks.length < n) return Array.empty
    val out = new Array[String](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Word n-grams as plain strings — the one-pass form of the HOF
    * transform+slice chain, which is CodegenFallback and interprets a
    * lambda (plus an array copy) per gram position. Tokenization and
    * gram joining are identical to the shingle pipeline above, so the
    * DuckDB replay is unchanged — including the SQL split convention
    * that an empty/whitespace-only doc tokenizes to one EMPTY token
    * (str_split_regex parity), which at n=1 surfaces as an empty gram;
    * consumers that don't want it filter `ngram != ''` on both engines
    * (topNgrams does). Null/short docs → empty array. */
  def wordNgrams(n: Int): UserDefinedFunction = udf { (text: String) =>
    shingleStrings(tokenize(text), n)
  }

  /** 16-component MinHash signature over 3-token shingles; null when the
    * doc has no shingles (matches the `len(t) >= 3` oracle filter). */
  val minhashSig3: UserDefinedFunction = udf { (text: String) =>
    val sh = shingleStrings(tokenize(text), 3)
    if (sh.isEmpty) null
    else {
      val k = DetHash.K
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < sh.length) {
        val x = h(sh(i)) % DetHash.P
        var j = 0
        while (j < k) {
          val v = (DetHash.A(j) * x + DetHash.B(j)) % DetHash.P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      sig
    }
  }

  /** 48-bit SimHash over token hash bit-votes (ties → bit 0, matching the
    * `> 0` vote test in the oracle). */
  val simhash48: UserDefinedFunction = udf { (text: String) =>
    val toks = tokenize(text)
    val votes = new Array[Int](48)
    var i = 0
    while (i < toks.length) {
      val x = h(toks(i))
      var b = 0
      while (b < 48) {
        if (((x >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 48) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Distinct n-token shingle set (first-occurrence order is irrelevant —
    * consumers explode it). Null when the doc is too short. */
  def shingleSet(n: Int): UserDefinedFunction = udf { (text: String) =>
    val sh = shingleStrings(tokenize(text), n)
    if (sh.isEmpty) null
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < sh.length) { seen.add(sh(i)); i += 1 }
      seen.toArray(new Array[String](seen.size))
    }
  }

  /** Distinct HASHED n-token shingle set: H(shingle) per element. Joining
    * candidates on an 8-byte long instead of a ~30-char shingle string
    * shrinks the self-join shuffle several-fold; the oracle applies the
    * same H to its shingles, so even a (≈2^-60 per pair) collision yields
    * identical results in both engines. */
  def shingleHashSet(n: Int): UserDefinedFunction = udf { (text: String) =>
    val sh = shingleStrings(tokenize(text), n)
    if (sh.isEmpty) null
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < sh.length) { seen.add(h(sh(i))); i += 1 }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** POSITIONED hashed n-gram sequence: H(gram) per gram start, array
    * index = 0-based token position (unlike [[shingleHashSet]] this
    * keeps duplicates and order — span-coverage consumers need the
    * positions, not the set). Null text → null; fewer than n tokens →
    * empty array. */
  def hashedNgramSeq(n: Int): UserDefinedFunction = udf { (text: String) =>
    if (text == null) null
    else {
      val sh = shingleStrings(tokenize(text), n)
      val out = new Array[Long](sh.length)
      var i = 0
      while (i < sh.length) { out(i) = h(sh(i)); i += 1 }
      out
    }
  }
}
