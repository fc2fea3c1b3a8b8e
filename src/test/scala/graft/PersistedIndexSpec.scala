package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ops.{AnnIndexStore, VectorSearch}

/** Round-11 ask #3: the ANN index served from a TABLE, not the session
  * cache. SCALE.md sells "persist the coded index, serve against the
  * read-back" as the 100 TB shape; this pins it — the served top-k
  * after a write→read round-trip is row-identical to sim12's
  * oracle-gated ranking, and stays so across an o8-style version swap
  * (new encode published, old version time-traveled).
  */
class PersistedIndexSpec extends SparkSuite {

  private def norm(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("ann_store_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // sim12's exact configuration (SimilarityOps constants)
  private val (kQ, topK, nSub, nprobe, kLists, iters) = (10, 10, 16, 3, 8, 2)

  private def trainAndEncode(): (VectorSearch.IvfPqModel, DataFrame, DataFrame) = {
    val emb = Tables.embeddings(spark, sf)
    val ivf = VectorSearch.ivfTrain(spark, emb, "vec_id", "embedding",
      kLists, iters)
    val model = VectorSearch.ivfPqTrain(spark, ivf,
      emb.filter(col("vec_id") >= 40 && col("vec_id") < 72),
      "vec_id", "embedding", nSub = nSub)
    (model, VectorSearch.ivfPqEncode(model, emb, "vec_id", "embedding"),
      emb.filter(col("vec_id") < kQ))
  }

  test("served top-k from the published table round-trip equals sim12's gated ranking") {
    val root = freshRoot()
    val (model, encoded, queries) = trainAndEncode()
    val v0 = AnnIndexStore.publish(spark, root, model, encoded)
    assert(v0 == 0L)
    // the oracle-gated ranking (session-shared battery path)
    val expected = norm(SparkEntry.queries("sim12_ivf_pq")(spark, sf)
      .select("query_id", "vec_id", "pq_dist", "rank"))
    // model + index reconstructed purely from the published tables
    val served = norm(AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe)
      .select("query_id", "vec_id", "pq_dist", "rank"))
    assert(served == expected,
      "table round-trip changed the served ranking vs sim12's gated output")
  }

  test("version swap serves the new corpus; time travel re-serves the old ranking") {
    val root = freshRoot()
    val (model, encoded, queries) = trainAndEncode()
    AnnIndexStore.publish(spark, root, model, encoded)
    val before = norm(AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe))

    // corpus refresh: drop the top half of the id space, re-encode with
    // the SAME model (scale + codebook are version-pinned alongside the
    // index, so partial refresh against a held model is legal), publish
    // as v1 via the same pointer commit
    val emb = Tables.embeddings(spark, sf)
    val nIds = emb.count()
    val shrunk = emb.filter(col("vec_id") < nIds / 2)
    val encoded1 = VectorSearch.ivfPqEncode(model, shrunk, "vec_id", "embedding")
    val v1 = AnnIndexStore.publish(spark, root, model, encoded1)
    assert(v1 == 1L)

    // current snapshot reflects the refresh: equals a fresh in-session
    // serve over the shrunk encode, and mentions no dropped id
    val after = AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe)
    val expectAfter = norm(VectorSearch.ivfPqServe(model, encoded1, queries,
      "vec_id", "embedding", topK, nprobe))
    assert(norm(after) == expectAfter,
      "post-swap serve diverged from in-session serve over the new encode")
    assert(after.filter(col("vec_id") >= nIds / 2).count() == 0,
      "post-swap serve returned vectors the v1 corpus no longer contains")

    // o8 time travel: pinning v0 reproduces the original ranking even
    // though _CURRENT moved on
    val travel = norm(AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe, version = Some(0L)))
    assert(travel == before,
      "time-traveled v0 serve diverged from the pre-swap ranking")
  }
}
