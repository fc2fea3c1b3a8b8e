package graft

import org.apache.spark.sql.DataFrame

/** Guards the session-shared materializations (queries.Shared): a
  * persisted intermediate must be row-identical to a fresh, uncached
  * build of the same plan — the sharing is a performance decision and
  * can never be a semantic one. The cache is cleared between the two
  * reads, otherwise Spark's cache manager would substitute the cached
  * relation into the "fresh" plan and the comparison would be vacuous.
  */
class SharedCacheSpec extends SparkSuite {

  private def norm(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("session-shared cube and cluster labels are row-identical to fresh builds") {
    val sharedCube = norm(graft.queries.Shared.cube(spark, sf))
    val sharedCc   = norm(graft.queries.Shared.lshClusters(spark, sf))
    spark.catalog.clearCache()
    val freshCube = norm(graft.etl.StarSchema.build(spark, sf).cube)
    val freshCc = norm(graft.ops.Clusters.connectedComponents(
      graft.ops.TextDedup.minhashLsh(Tables.documents(spark, sf), "doc_id", "text"),
      "doc_a", "doc_b"))
    assert(sharedCube.size == freshCube.size && sharedCube == freshCube,
      "cached cube diverged from a fresh StarSchema build")
    assert(sharedCc == freshCc,
      "cached cluster labels diverged from a fresh LSH+CC run")
  }

  test("pre-trained IVF/IVF-PQ index reproduces the one-shot gated ranking") {
    // The r9-ask-#6 pin: sim11/sim12 now serve from a session-shared
    // trained model + persisted index; their gated output must stay
    // bit-identical to the one-shot train-in-query composition the
    // DuckDB oracle replays. Collect the battery (shared) path first,
    // then a fresh direct call with training inline.
    import graft.ops.VectorSearch
    import org.apache.spark.sql.functions.col
    val sharedIvf = norm(SparkEntry.queries("sim11_ivf_learned")(spark, sf))
    val sharedPq  = norm(SparkEntry.queries("sim12_ivf_pq")(spark, sf))
    spark.catalog.clearCache()
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter(col("vec_id") < 10)
    val freshIvf = norm(
      VectorSearch.learnedIvfTopK(spark, emb, qs, "vec_id", "embedding",
          k = 10, kLists = 8, iters = 2, nprobe = 3)
        .orderBy("query_id", "rank"))
    val freshPq = norm(
      VectorSearch.ivfPqTopK(spark, emb, qs,
          emb.filter(col("vec_id") >= 40 && col("vec_id") < 72),
          "vec_id", "embedding", k = 10, nSub = 16, kLists = 8, iters = 2,
          nprobe = 3)
        .orderBy("query_id", "rank"))
    assert(sharedIvf == freshIvf,
      "session-shared IVF index diverged from one-shot learnedIvfTopK")
    assert(sharedPq == freshPq,
      "session-shared IVF-PQ index diverged from one-shot ivfPqTopK")
  }

  test("session-shared span coverage is row-identical to a fresh build") {
    val shared = norm(graft.queries.Shared.spanCoverage(spark, sf))
    spark.catalog.clearCache()
    val fresh = norm(graft.ops.TextDedup.spanCoverage(
      Tables.documents(spark, sf), "doc_id", "text"))
    assert(shared == fresh,
      "cached span coverage diverged from a fresh spanCoverage run")
  }
}
