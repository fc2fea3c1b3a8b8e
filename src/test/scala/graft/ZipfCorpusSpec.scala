package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Realistic-corpus validation (round-9 verdict ask): the driver
  * fixtures have a 31-word uniform vocabulary and uniform 10-100-token
  * docs, so the text heuristics had never been exercised against the
  * distribution real corpora actually have — Zipf-skewed vocabulary,
  * heavy-tailed document lengths, language-specific function words, and
  * boilerplate/template cliques. This suite builds that corpus
  * deterministically in-memory (seeded, no fixture files) and validates:
  *
  *  - tx4 language-ID: marker argmax stays accurate when markers compete
  *    with a 20k-type Zipf vocabulary, and languages WITHOUT a profile
  *    resolve to 'und' rather than a false positive;
  *  - px3 filter cascade: reason attribution at realistic stopword
  *    ratios (language fires before low_stopword; marker-bearing but
  *    stopword-free docs hit low_stopword; accounting is exhaustive);
  *  - dd2 hot-bucket guard: a 20% template clique makes unguarded LSH
  *    quadratic in the clique, the `maxBucketSize` guard bounds it, and
  *    planted non-template near-dups survive the guard.
  */
class ZipfCorpusSpec extends SparkSuite {
  import spark.implicits._

  private val N = 2500
  private val VOCAB = 20000
  /** Zipf(s=1.07) sampler over ranks 1..VOCAB via inverse-CDF on a
    * precomputed cumulative weight table — rank r has weight 1/r^1.07. */
  private def zipfSampler(rnd: scala.util.Random): () => String = {
    val w = Array.tabulate(VOCAB)(r => 1.0 / math.pow(r + 1.0, 1.07))
    val cum = w.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    () => {
      val x = rnd.nextDouble() * total
      val i = java.util.Arrays.binarySearch(cum, x)
      val r = if (i >= 0) i else -i - 1
      s"w$r"
    }
  }

  private val langFuncs = Map(
    "en" -> Seq("the", "a", "is"), "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "y"), "fr" -> Seq("le", "les", "et"),
    "zh" -> Seq("de0", "le0", "shi")) // no profile for zh → expect 'und'

  /** (doc_id, text, lang, kind) — kind ∈ content | template | nostop |
    * neardup. Lognormal lengths (median ≈ 150 tokens, tail to 3000). */
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(42)
    val zipf = zipfSampler(rnd)
    val langs = Vector("en", "de", "es", "fr", "zh")
    val langP = Vector(0.41, 0.15, 0.15, 0.15, 0.14)
    def drawLang(): String = {
      val x = rnd.nextDouble(); var acc = 0.0; var i = 0
      while (i < langs.size - 1 && { acc += langP(i); x >= acc }) i += 1
      langs(i)
    }
    // fixed 100-token en template (header/footer boilerplate), markers
    // included so template docs pass the language and stopword gates
    val template = {
      val trnd = new scala.util.Random(7)
      val tz = zipfSampler(trnd)
      (0 until 100).map(i =>
        if (i % 7 == 0) Seq("the", "a", "is")(trnd.nextInt(3)) else tz())
    }
    def genDoc(lang: String, nTok: Int, pFunc: Double, funcs: Seq[String]) =
      (0 until nTok).map { _ =>
        if (rnd.nextDouble() < pFunc) funcs(rnd.nextInt(funcs.size)) else zipf()
      }.mkString(" ")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String)]
    var id = 0L
    while (rows.size < N) {
      val u = rnd.nextDouble()
      if (u < 0.20) { // template page: boilerplate + 8 unique tokens
        val extra = (0 until 8).map(_ => zipf())
        rows += ((id, (template ++ extra).mkString(" "), "en", "template"))
      } else if (u < 0.24) { // en doc whose only function word is 'is':
        // predLang=en (marker hit) but stopword ratio 0 → low_stopword
        val n = math.max(25, math.min(3000, math.exp(5.0 + 0.8 * rnd.nextGaussian()).toInt))
        rows += ((id, genDoc("en", n, 0.15, Seq("is")), "en", "nostop"))
      } else {
        val lang = drawLang()
        val n = math.max(5, math.min(3000, math.exp(5.0 + 0.8 * rnd.nextGaussian()).toInt))
        rows += ((id, genDoc(lang, n, 0.30, langFuncs(lang)), lang, "content"))
      }
      id += 1
    }
    // 20 planted near-dup pairs among non-template en content docs:
    // copy + resample ~5% of tokens → 3-shingle Jaccard ≈ 0.85
    val enContent = rows.filter(r => r._3 == "en" && r._4 == "content").take(20)
    enContent.foreach { case (src, text, _, _) =>
      val toks = text.split(" ").toArray
      val m = math.max(1, toks.length / 20)
      (0 until m).foreach(_ => toks(rnd.nextInt(toks.length)) = zipf())
      rows += ((id, toks.mkString(" "), "en", s"neardup_of_$src"))
      id += 1
    }
    rows.toSeq.toDF("doc_id", "text", "true_lang", "kind").cache()
  }

  test("tx4 language-ID holds accuracy under a 20k-type Zipf vocabulary") {
    val pred = graft.ops.TextAnalysis.langId(corpus, "doc_id", "text")
      .join(corpus.select("doc_id", "true_lang", "kind"), "doc_id")
    val profiled = pred.filter(col("true_lang").isin("en", "de", "es", "fr"))
    val nProf = profiled.count()
    val correct = profiled.filter(col("pred_lang") === col("true_lang")).count()
    val acc = correct.toDouble / nProf
    // markers at realistic function-word rates beat 20k Zipf noise types
    assert(acc >= 0.99, s"language-ID accuracy collapsed under Zipf skew: $acc")
    // a language with no profile must resolve to 'und', never a false hit
    val zh = pred.filter(col("true_lang") === "zh")
    val zhUnd = zh.filter(col("pred_lang") === "und").count()
    assert(zhUnd === zh.count(),
      "profile-less language was claimed by a profiled language")
  }

  test("px3 cascade attributes drops correctly at realistic stopword ratios") {
    val cascade = graft.ops.Curation.filterCascade(corpus, "doc_id", "text")
      .join(corpus.select("doc_id", "true_lang", "kind"), "doc_id")
    // exhaustive accounting: every doc keeps or carries exactly one reason
    assert(cascade.filter(col("keep") && col("drop_reason").isNotNull).count() === 0)
    assert(cascade.filter(!col("keep") && col("drop_reason").isNull).count() === 0)
    // non-en docs are attributed to 'language', NOT to the en-specific
    // stopword gate (the rule-order argument in the Scaladoc)
    val nonEn = cascade.filter(col("true_lang") =!= "en" && !col("keep"))
    val nonEnReasons = nonEn.groupBy("drop_reason").count()
      .as[(String, Long)].collect().toMap
    assert(!nonEnReasons.contains("low_stopword"),
      s"en-specific gate blamed for non-en docs: $nonEnReasons")
    assert(nonEnReasons.getOrElse("language", 0L) > 0)
    // the 'is'-only docs: language passes (marker hit), stopword gate fires
    val nostop = cascade.filter(col("kind") === "nostop")
    val nostopLS = nostop.filter(col("drop_reason") === "low_stopword").count()
    assert(nostopLS.toDouble / nostop.count() >= 0.95,
      "stopword-free en docs not caught by the stopword gate")
    // ordinary en content at ~30% function-word rate passes both gates:
    // nothing is dropped for language or low_stopword
    val enContent = cascade.filter(col("true_lang") === "en" && col("kind") === "content")
    val enBad = enContent
      .filter(col("drop_reason").isin("language", "low_stopword")).count()
    assert(enBad === 0,
      s"realistic en docs dropped by language/stopword gates: $enBad")
  }

  test("dd2 hot-bucket guard bounds the template clique, keeps true near-dups") {
    val t0 = System.nanoTime()
    val unguarded = graft.ops.TextDedup.minhashLsh(corpus, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val guarded = graft.ops.TextDedup.minhashLsh(corpus, "doc_id", "text",
        maxBucketSize = Some(100))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    info(f"unguarded=${unguarded.size} guarded=${guarded.size} " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    // the 500-doc template clique is quadratic unguarded (~C(500,2));
    // the guard must collapse it by orders of magnitude
    assert(unguarded.size > 50000,
      s"template clique did not go quadratic (${unguarded.size}) — fixture drifted?")
    assert(guarded.size < unguarded.size / 20,
      s"hot-bucket guard did not bound the clique: ${guarded.size}")
    assert(guarded.subsetOf(unguarded), "guarded output must be a subset")
    // planted near-dup pairs live OUTSIDE the clique → the guard keeps them
    val planted = corpus.filter(col("kind").startsWith("neardup_of_"))
      .select(col("doc_id"),
        regexp_extract(col("kind"), "neardup_of_(\\d+)", 1).cast("long").as("src"))
      .as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val foundG = planted.count(guarded.contains)
    assert(foundG >= (planted.size * 0.7).toInt,
      s"guard lost planted near-dups: $foundG/${planted.size}")
  }

  test("dd9 winnowing df-guard bounds template postings at Zipf skew") {
    // template docs share most winnow fingerprints → those fingerprints
    // have df ≈ 500 and the postings self-join is quadratic in them;
    // the df-cut drops exactly the boilerplate fingerprints (content
    // fingerprints ride on a 20k-type Zipf vocabulary → low df)
    val unguarded = graft.ops.TextDedup.containmentPairs(
        corpus, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val guarded = graft.ops.TextDedup.containmentPairs(
        corpus, "doc_id", "text", maxFingerprintDf = Some(50))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    info(s"unguarded=${unguarded.size} guarded=${guarded.size}")
    assert(unguarded.size > 50000,
      s"template clique did not go quadratic (${unguarded.size})")
    assert(guarded.size < unguarded.size / 20,
      s"df-guard did not bound the clique: ${guarded.size}")
    assert(guarded.subsetOf(unguarded), "guarded output must be a subset")
    // planted near-dups (~95% containment, fingerprints are all low-df
    // Zipf content) survive the cut
    val planted = corpus.filter(col("kind").startsWith("neardup_of_"))
      .select(col("doc_id"),
        regexp_extract(col("kind"), "neardup_of_(\\d+)", 1).cast("long").as("src"))
      .as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val foundG = planted.count(guarded.contains)
    assert(foundG >= (planted.size * 0.7).toInt,
      s"df-guard lost planted near-dups: $foundG/${planted.size}")
  }
}
