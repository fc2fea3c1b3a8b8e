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
}
