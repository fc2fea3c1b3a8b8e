package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection over opaque BINARY payloads — the multimodal
  * member of the dedup family (dd2/dd4/dd9 are text-shingle detectors,
  * dd5/dd11 embedding detectors; this one needs neither text nor a
  * vector, only the media bytes).
  *
  * The signature is a block-mean perceptual hash (the classic pHash
  * "blockhash" scheme: Yang, Gu & Niu 2006): split the payload into
  * `bits` equal byte ranges, bit b = 1 iff block b's mean byte value
  * exceeds the whole-payload mean. Near-identical media (re-encodes,
  * small edits, appended footers) perturb few block means, so dup pairs
  * sit within a small hamming radius — while any single-byte change
  * flips an exact md5 fingerprint (dd1) entirely.
  *
  * On real images the mean is taken over decoded luma blocks; here the
  * payload is [[graft.queries.MultimodalOps]]'s stub codec's bytes, and
  * the arithmetic below IS the production arithmetic — swapping in a
  * real decoder changes only which bytes arrive.
  *
  * Determinism: block means are never materialized as floats — the
  * bit decision `sum_b/n_b > total/L` is evaluated as the exact integer
  * cross-product `sum_b · L > total · n_b`, so the hash (and therefore
  * the oracle compare) is bit-identical across engines. Empty blocks
  * (payload shorter than `bits` bytes) compare `0 > 0` → bit 0 in both.
  *
  * Scale shape (mirrors [[TextDedup.simhashPairs]]): hashing is one
  * map-side pass (the payload never shuffles — only the 8-byte hash
  * does); candidate pairs come from a 12-bit band join — complete for
  * hamming ≤ 3 by pigeonhole over 4 chunks — never an all-pairs
  * compare.
  */
object MediaDedup {

  private val BITS = graft.functions.BlockMeanHashKernel.Bits
  private val CHUNKS = 4
  private val CHUNK_BITS = BITS / CHUNKS

  /** (idCol, n_bytes, phash): 48-bit block-mean perceptual hash per row.
    * Rows with empty payloads are excluded (a hash of nothing is
    * meaningless, and every empty payload would pair with every other).
    *
    * The hash is the codegen'd [[graft.functions.BlockMeanHash48]]
    * kernel: the payload is evaluated once per row and scanned twice
    * (O(L)). An earlier SQL higher-order-function form of the same
    * integer spec was O(L²) per row whenever the payload column was an
    * expression — `CollapseProject` inlined it into the per-byte
    * `substring` lambda, re-encoding the document once per byte (see the
    * scaladoc on BlockMeanHash48 for the forensic detail; found when the
    * round-9 skew rehearsal's lognormal-tail documents pushed one task to
    * 20 CPU-minutes). */
  def blockMeanHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    graft.functions.NativeVectorExpressions.register(df.sparkSession)
    df.select(col(idCol), col(payloadCol).as("__payload"))
      .filter(octet_length(col("__payload")) > 0)
      .select(col(idCol),
        octet_length(col("__payload")).cast("long").as("n_bytes"),
        expr("block_mean_hash48(__payload)").as("phash"))
  }

  /** Near-dup payload pairs within `maxHamming` of each other:
    * (doc_a, doc_b, hamming), complete for maxHamming ≤ 3 via the
    * 4-chunk band join. */
  def phashPairs(df: DataFrame, idCol: String, payloadCol: String,
                 maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= CHUNKS - 1,
      s"$CHUNKS-chunk banding is only complete for hamming <= ${CHUNKS - 1}")
    val hashes = blockMeanHash(df, idCol, payloadCol)
      .select(col(idCol).as("__id"), col("phash"))
    val chunks = hashes.select(col("__id"), col("phash"),
      posexplode(expr(
        (0 until CHUNKS).map(j =>
          s"shiftright(phash, ${CHUNK_BITS * j}) & ${(1 << CHUNK_BITS) - 1}")
          .mkString("array(", ", ", ")")))
        .as(Seq("chunk_idx", "chunk")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"),
        expr("CAST(bit_count(a.phash ^ b.phash) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
