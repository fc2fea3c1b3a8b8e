package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training [extension — north star]: map
  * every document to its position in the concat-then-chunk token stream
  * (all documents concatenated in a deterministic order, the stream cut
  * into fixed `budget`-token sequences; documents may straddle a cut —
  * the standard "packed" dataloader layout, cf. GPT-style pre-training
  * and HF `group_texts`).
  *
  * The stream is built PER SHARD (`shardCol`), not globally: a single
  * global running sum is one sort on one task at corpus scale, while a
  * per-shard window partitions by shard and packs every shard in
  * parallel — which is also the layout real pipelines want (a pack never
  * spans two shard files, so shards stay independently loadable).
  * Within a shard the order is `idCol` — deterministic and stable under
  * re-partitioning.
  *
  * Output per document: shard, id, n_tokens, start_off (exclusive
  * running sum — the document's first token's offset in its shard
  * stream), first_pack / n_packs (which budget-sized sequences the
  * document lands in). Downstream, `first_pack` is the pack file a
  * reader opens first and `n_packs > 1` marks boundary-straddling
  * documents (the ones a loader reads across two sequences).
  */
object Packing {

  /** Whitespace token count, NULL text → NULL (SQL semantics). */
  private def nTokens(textCol: Column): Column =
    when(textCol.isNull, lit(null).cast("long"))
      .otherwise(size(split(trim(textCol), "\\s+")).cast("long"))

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val w = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol).as("shard"), col(idCol).as("id"),
        nTokens(col(textCol)).as("n_tokens"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      // integral `div`, not `/`: double division would round above 2^53,
      // exactly the regime a 100T-token shard stream lives in
      .withColumn("first_pack", expr(s"start_off div $budget"))
      .withColumn("n_packs",
        expr(s"(start_off + n_tokens - 1) div $budget") - col("first_pack") + 1)
  }

  /** NO-SPLIT greedy packing — the other canonical packing discipline
    * (cf. T5 / "packing without cross-contamination", Krell et al.
    * 2021): documents are never cut at a pack boundary; a document that
    * doesn't fit in the current pack's remaining budget opens a new
    * pack. Use it when attention must not span document boundaries and
    * the loader can pad pack tails; [[packSequences]] is the
    * zero-padding splitting layout.
    *
    * Semantics (per shard, documents in `idCol` order, exact greedy
    * first-fit-in-order): a doc with n_tokens > budget is OVERSIZE — it
    * gets a pack of its own (flagged for downstream truncation) and
    * never shares it. NULL-text docs are excluded (nothing to pack).
    *
    * Shape: the scan is inherently sequential WITHIN a shard (each
    * doc's pack depends on every predecessor's), so this is the one
    * honest `flatMapSortedGroups` in the repo — a per-group O(1)-state
    * machine, parallelism = shards, the same per-shard independence
    * argument as [[packSequences]] (and why the shard column exists at
    * all: a global greedy pack would be one task at corpus scale).
    * Group state never materializes the group — the iterator streams.
    *
    * Output per doc: shard, id, n_tokens, pack_id (0-based per shard),
    * pack_off (token offset within its pack), oversize. */
  def greedyPack(docs: DataFrame, idCol: String, textCol: String,
                 shardCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(textCol).isNotNull)
      .select(col(shardCol).cast("string").as("shard"), col(idCol).cast("long").as("id"),
        nTokens(col(textCol)).as("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"id") { (_: String, rows: Iterator[(String, Long, Long)]) =>
        var pack = 0L
        var fill = 0L
        rows.map { case (sh, id, t) =>
          if (t > budget) {
            val assigned = if (fill > 0) pack + 1 else pack
            pack = assigned + 1
            fill = 0
            (sh, id, t, assigned, 0L, true)
          } else {
            if (fill + t > budget) { pack += 1; fill = 0 }
            val out = (sh, id, t, pack, fill, false)
            fill += t
            out
          }
        }
      }
      .toDF("shard", "id", "n_tokens", "pack_id", "pack_off", "oversize")
  }
}
