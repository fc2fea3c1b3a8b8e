package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ops.{AnnIndexStore, VectorSearch}

/** The segment-manifest growth path of [[graft.ops.AnnIndexStore]]:
  * appending a batch must cost one batch-sized encode + a pointer
  * commit — never a corpus rewrite — and the grown index must serve
  * EXACTLY what a one-shot full encode serves (codes are deterministic
  * per row under a frozen model, so segment layout cannot leak into
  * results). Segment immutability, time travel across appends, and
  * orphan-segment GC are pinned alongside. */
class IncrementalIndexSpec extends SparkSuite {

  private def norm(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("ann_inc_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def segListing(root: String): Map[String, Set[(String, Long)]] = {
    val segRoot = new java.io.File(s"$root/seg")
    Option(segRoot.listFiles()).getOrElse(Array.empty).map { d =>
      d.getName -> d.listFiles().map(f => (f.getName, f.length())).toSet
    }.toMap
  }

  private val (kQ, topK, nSub, nprobe, kLists, iters) = (10, 10, 16, 3, 8, 2)

  private def train() = {
    val emb = Tables.embeddings(spark, sf)
    val ivf = VectorSearch.ivfTrain(spark, emb, "vec_id", "embedding",
      kLists, iters)
    (emb,
      VectorSearch.ivfPqTrain(spark, ivf,
        emb.filter(col("vec_id") >= 40 && col("vec_id") < 72),
        "vec_id", "embedding", nSub = nSub),
      emb.filter(col("vec_id") < kQ))
  }

  test("appendEncode grows the index to exactly the full-encode serve, without touching prior segments") {
    val root = freshRoot()
    val (emb, model, queries) = train()
    val n = emb.count()
    val half = emb.filter(col("vec_id") < n / 2)
    val rest = emb.filter(col("vec_id") >= n / 2)

    val v0 = AnnIndexStore.publish(spark, root, model,
      VectorSearch.ivfPqEncode(model, half, "vec_id", "embedding"))
    assert(v0 == 0L)
    val before = norm(AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe))
    val segsBefore = segListing(root)
    assert(segsBefore.size == 1)

    val v1 = AnnIndexStore.appendEncode(spark, root, rest, "vec_id", "embedding")
    assert(v1 == 1L)

    // the first segment's files are byte-for-byte untouched
    val segsAfter = segListing(root)
    assert(segsAfter.size == 2, "append should add exactly one segment")
    val (firstId, firstFiles) = segsBefore.head
    assert(segsAfter(firstId) == firstFiles,
      "append rewrote the prior segment's files")

    // grown serve == one-shot full-encode serve (bit-identical)
    val grown = norm(AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe))
    val full = norm(VectorSearch.ivfPqServe(model,
      VectorSearch.ivfPqEncode(model, emb, "vec_id", "embedding"),
      queries, "vec_id", "embedding", topK, nprobe))
    assert(grown == full, "grown index serve diverged from one-shot full encode")

    // time travel: v0 still serves the half-corpus ranking
    val travel = norm(AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe, version = Some(0L)))
    assert(travel == before, "time-traveled v0 serve changed after the append")
  }

  test("streaming ingest converges to the batch index across REAL multiple micro-batches") {
    // st13's fixture replay is one AvailableNow batch; this forces a
    // genuine multi-batch split (one file per trigger) and pins that
    // the grown index serves exactly the one-shot batch encode.
    val root = freshRoot()
    val (emb, model, queries) = train()
    val feed = java.nio.file.Files.createTempDirectory("ann_feed_").toString
    emb.repartition(4).write.mode("overwrite").parquet(feed)

    graft.ops.AnnIndexStore.publish(spark, root, model,
      VectorSearch.ivfPqEncode(model, emb.limit(0), "vec_id", "embedding"))
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
    var batches = 0
    graft.streaming.Streams.runIngest(spark, stream, s"$root/chk") {
      (batch, batchId) =>
        if (!batch.isEmpty) {
          batches += 1
          graft.ops.AnnIndexStore.appendEncode(spark, root, batch,
            "vec_id", "embedding", Some(f"batch-$batchId%05d")): Unit
        }
    }
    assert(batches >= 2, s"expected a real multi-batch split, got $batches batch(es)")

    val streamed = norm(graft.ops.AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe))
    val oneShot = norm(VectorSearch.ivfPqServe(model,
      VectorSearch.ivfPqEncode(model, emb, "vec_id", "embedding"),
      queries, "vec_id", "embedding", topK, nprobe))
    assert(streamed == oneShot,
      "multi-batch streamed index serve diverged from the one-shot batch encode")
  }

  test("vacuumSegments reclaims only unreferenced segments; the current serve is unaffected") {
    val root = freshRoot()
    val (emb, model, queries) = train()
    val n = emb.count()
    AnnIndexStore.publish(spark, root, model,
      VectorSearch.ivfPqEncode(model, emb.filter(col("vec_id") < n / 2),
        "vec_id", "embedding"))
    AnnIndexStore.appendEncode(spark, root,
      emb.filter(col("vec_id") >= n / 2), "vec_id", "embedding")
    // full rebuild (fresh single segment) — v0/v1's segments become
    // garbage once those versions are vacuumed
    AnnIndexStore.publish(spark, root, model,
      VectorSearch.ivfPqEncode(model, emb, "vec_id", "embedding"))
    assert(segListing(root).size == 3)
    val current = norm(AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe))

    // nothing is orphaned while v0/v1 are retained
    assert(AnnIndexStore.vacuumSegments(spark, root).isEmpty)
    graft.etl.AtomicPublish.vacuum(spark, root, keep = 1)
    val deleted = AnnIndexStore.vacuumSegments(spark, root)
    assert(deleted.size == 2, s"expected the two pre-rebuild segments gone, got $deleted")
    assert(segListing(root).size == 1)
    val served = norm(AnnIndexStore.serve(spark, root, queries,
      "vec_id", "embedding", k = topK, nprobe = nprobe))
    assert(served == current, "segment GC changed the current serve")
  }
}
