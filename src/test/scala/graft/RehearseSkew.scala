package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 skew-realism rehearsal (VERDICT r8 ask #4).
  *
  * The driver fixtures carry a uniform 31-word vocabulary, so the
  * hot-key guards the SCALE.md story leans on (`maxBucketSize`,
  * `maxShingleDf`, `maxFingerprintDf`) had never been exercised on a
  * PARQUET corpus with a real crawl's shape. `tools/gen_fixture.py
  * --skew` generates that shape (Zipf vocabulary, lognormal lengths, a
  * 20% boilerplate template clique, a dominant domain, blank-payload
  * assets, recorded planted near-dup pairs); this main measures the
  * dedup/text battery on it at a given scale, guard-on vs guard-off,
  * and reports per-op wall seconds, output rows, and — for the pair
  * ops — recall against the generator's planted ground truth.
  *
  * Emits one JSON line per measurement:
  *   {"op":"dd2","guard":"on","secs":1.2,"rows":310,"recall":0.86}
  *
  * Guard-off forms are only run when `--guard-off` is passed: on the
  * 10x skew corpus the unguarded shapes are deliberately quadratic in
  * the 10,000-doc template clique — the point of the rehearsal is that
  * the guards make them survivable, so the off-forms are measured at
  * 1x (where they finish) to quantify the delta.
  */
object RehearseSkew {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseSkew FIXTURE_DIR [--guard-off]")
    val dir = args(0)
    val runOff = args.contains("--guard-off")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir).cache()
    val nDocs = docs.count()
    val planted = spark.read.parquet(s"$dir/planted_pairs.parquet").cache()
    val nPlanted = planted.count()
    println(s"""{"corpus":"$dir","docs":$nDocs,"planted_pairs":$nPlanted}""")

    /** Run `mk`, fully materializing the frame; min-of-2 passes for the
      * guarded (keeper) forms, single pass for the quadratic off-forms.
      * Pair frames also report recall vs the planted ground truth. */
    def measure(op: String, guard: String, passes: Int, pairCols: Boolean)
               (mk: => DataFrame): Unit = {
      var best = Double.MaxValue
      var rows = -1L
      var recall = -1.0
      for (_ <- 1 to passes) {
        val res = mk.cache()
        val t0 = System.nanoTime()
        rows = res.count()
        val secs = (System.nanoTime() - t0) / 1e9
        if (secs < best) best = secs
        if (pairCols && recall < 0) {
          val hit = planted.join(res.select(col("doc_a"), col("doc_b")),
            Seq("doc_a", "doc_b"), "left_semi").count()
          recall = if (nPlanted == 0) 1.0 else hit.toDouble / nPlanted
        }
        res.unpersist()
      }
      val rec = if (pairCols) s""","recall":${f"$recall%.3f"}""" else ""
      println(s"""{"op":"$op","guard":"$guard","secs":${f"$best%.2f"},"rows":$rows$rec}""")
    }

    import graft.ops.{TextDedup, MediaDedup, TextAnalysis, Curation}

    // dd2 — MinHash-LSH: the template clique collapses one band bucket.
    measure("dd2", "on", 2, pairCols = true)(
      TextDedup.minhashLsh(docs, "doc_id", "text", maxBucketSize = Some(100)))
    if (runOff) measure("dd2", "off", 1, pairCols = true)(
      TextDedup.minhashLsh(docs, "doc_id", "text"))

    // dd4 — n-gram Jaccard: template shingles have df ~ 0.2N.
    measure("dd4", "on", 2, pairCols = true)(
      TextDedup.ngramJaccard(docs, "doc_id", "text", maxShingleDf = Some(100)))
    if (runOff) measure("dd4", "off", 1, pairCols = true)(
      TextDedup.ngramJaccard(docs, "doc_id", "text"))

    // dd9 — winnowing containment: template fingerprints go quadratic
    // in the postings self-join without the df guard.
    measure("dd9", "on", 2, pairCols = true)(
      TextDedup.containmentPairs(docs, "doc_id", "text",
        maxFingerprintDf = Some(50)))
    if (runOff) measure("dd9", "off", 1, pairCols = true)(
      TextDedup.containmentPairs(docs, "doc_id", "text"))

    // dd12 — span coverage: linear in df by design, no guard needed;
    // the skew corpus is the empirical check of that claim.
    measure("dd12", "n/a", 2, pairCols = false)(
      TextDedup.spanCoverage(docs, "doc_id", "text"))

    // tx7 — top n-grams: vocabulary-sized aggregate under Zipf skew.
    measure("tx7", "n/a", 2, pairCols = false)(
      TextAnalysis.topNgrams(docs, "doc_id", "text", n = 2, k = 25, minDf = 2))

    // px3 — filter cascade: language gate + stopword gate + dup window
    // at realistic marker rates and a 20% near-identical clique.
    measure("px3", "n/a", 2, pairCols = false)(
      Curation.filterCascade(docs, "doc_id", "text"))

    // mm5 — block-mean pHash over the simulated binary payloads (the
    // mm-family ingest shape: text bytes stand in for media bytes).
    val payloads = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    measure("mm5_hash", "n/a", 2, pairCols = false)(
      MediaDedup.blockMeanHash(payloads, "doc_id", "payload"))
    // pair form: identical-payload groups (blank assets, the template
    // clique) make the OUTPUT itself quadratic in the clique — measured
    // at 1x only, like the other off-forms.
    if (runOff) measure("mm5_pairs", "off", 1, pairCols = false)(
      MediaDedup.phashPairs(payloads, "doc_id", "payload"))

    spark.stop()
  }
}
