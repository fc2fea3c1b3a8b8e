package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing [extension — north star]: image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct,
  * processed batch-at-a-time per partition.
  *
  * The container has no codec libraries, so the decode step is a
  * DETERMINISTIC FAKE (clearly marked below): payload bytes are the UTF-8
  * text of `documents`, and "features" are stride-averaged byte values.
  * Everything around the stub is the real production shape: binary
  * payload column, metadata struct, a partition-batched decode
  * (`mapPartitions` — the Scala analogue of `mapInPandas`: one codec
  * instance per partition, amortized over its rows, never per-row
  * driver-side), and an explicit output schema. Swapping the fake for a
  * JPEG/ffmpeg codec changes only the function body.
  *
  * Because the fake decode is byte arithmetic, even these queries are
  * DuckDB-oracle-checked (ord() over the same bytes).
  */
object MultimodalOps {

  private val NFEATURES = 8
  private val FRAMESTEP = 16
  private val RESIZE_TO = 32

  /** The simulated ingest: documents → (doc_id, payload binary, meta). */
  private def binaryTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        col("source").as("origin"),
        octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** STUB DECODE (deterministic fake — no codec libs in the container):
    * feature k = mean of payload bytes at positions ≡ k (mod NFEATURES).
    * A real implementation would decode the image here and emit e.g.
    * channel statistics; the batch shape and signature would not change. */
  private def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val sums = new Array[Long](NFEATURES)
    val counts = new Array[Long](NFEATURES)
    var i = 0
    while (i < payload.length) {
      val k = i % NFEATURES
      sums(k) += payload(i) & 0xff
      counts(k) += 1
      i += 1
    }
    (0 until NFEATURES).map(k =>
      if (counts(k) == 0) 0.0 else sums(k).toDouble / counts(k)).toArray
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // mm1 — binary ingest: payload + typed metadata; outputs the typed
    // metadata projection (the payload itself stays opaque).
    "mm1_binary_meta" -> ((s, dir) =>
      binaryTable(s, dir).select(
        col("doc_id"),
        col("meta.mime").as("mime"),
        col("meta.origin").as("origin"),
        col("meta.n_bytes").as("n_bytes"),
        octet_length(col("payload")).cast("long").as("payload_bytes"))
        .orderBy("doc_id")),

    // mm2 — partition-batched decode + feature extraction through the
    // stubbed codec; one decode context per partition, rows streamed
    // through it (the 100 TB shape: decode parallelism == partitions).
    "mm2_decode_features" -> ((s, dir) => {
      import s.implicits._
      val out = binaryTable(s, dir)
        .select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          // per-partition "codec init" would go here (open decoder once)
          rows.map { case (id, payload) => (id, fakeDecodeFeatures(payload)) }
        }
        .toDF("doc_id", "features")
      out.select(
        col("doc_id"),
        round(element_at(col("features"), 1), 6).as("f0"),
        round(element_at(col("features"), 2), 6).as("f1"),
        round(element_at(col("features"), 8), 6).as("f7"))
        .orderBy("doc_id")
    }),

    // mm4 — resize: nearest-neighbor resample of the payload to a fixed
    // RESIZE_TO length (out[j] = in[floor(j·len/T)]) — the shape of an
    // image thumbnail/downsample step, minus the codec. Pure integer
    // index arithmetic (div), so the oracle replays it byte-for-byte.
    "mm4_resize" -> ((s, dir) =>
      binaryTable(s, dir)
        // a resize of an EMPTY payload is undefined — and the engines
        // disagree on the undefined case (Spark conv(hex('')) → NULL,
        // DuckDB '0x'||'' cast → hard error), so both sides exclude it
        // explicitly rather than relying on the fixture never being empty
        .filter(octet_length(col("payload")) > 0)
        .withColumn("resized", expr(
          s"""transform(sequence(0, ${RESIZE_TO - 1}), j ->
             |  cast(conv(hex(substring(payload,
             |    cast((j * octet_length(payload)) div $RESIZE_TO as int) + 1, 1)),
             |    16, 10) as bigint))""".stripMargin))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_in"),
          lit(RESIZE_TO).as("n_out"),
          expr("aggregate(resized, cast(0 as bigint), (acc, b) -> acc + b)")
            .as("checksum"),
          concat_ws("-",
            expr("transform(slice(resized, 1, 8), x -> cast(x as string))"))
            .as("head"))
        .orderBy("doc_id")),

    // mm5 — perceptual hash over the BINARY payload [extension]: the
    // multimodal member of the dedup family (dd2/dd4/dd9 need text,
    // dd5/dd11 need vectors; this needs only media bytes). 48-bit
    // block-mean pHash; bit decisions are exact integer cross-products,
    // so the hash itself is oracle-verified on every fixture row. Pair
    // detection (MediaDedup.phashPairs, dd3's band join at hamming ≤ 3)
    // targets the RE-ENCODE transform class — same-length local
    // perturbations — which this text-byte fixture cannot exhibit, so
    // the pairing law is pinned in TrainingDataOpsSpec on a constructed
    // re-encoded corpus with known ground truth instead.
    "mm5_perceptual_hash" -> ((s, dir) =>
      graft.ops.MediaDedup.blockMeanHash(binaryTable(s, dir), "doc_id", "payload")
        .orderBy("doc_id")),

    // mm3 — frame sampling: every FRAMESTEP-th byte is a "frame";
    // outputs frame count and a checksum over sampled frames (the shape
    // of video frame-subsampling, minus the codec).
    "mm3_frame_sample" -> ((s, dir) =>
      binaryTable(s, dir)
        // byte i of the binary payload as an int: hex(1-byte slice) → conv
        .withColumn("frames", expr(
          s"""transform(sequence(1, octet_length(payload), $FRAMESTEP), i ->
             |  cast(conv(hex(substring(payload, i, 1)), 16, 10) as bigint))""".stripMargin))
        .select(
          col("doc_id"),
          size(col("frames")).as("n_frames"),
          expr("aggregate(frames, cast(0 as bigint), (acc, b) -> acc + b)").as("checksum"),
          expr("cast(conv(hex(substring(payload, 1, 1)), 16, 10) as bigint)").as("first_byte"))
        .orderBy("doc_id")))

  val oracles: Map[String, String] = Map(
    "mm1_binary_meta" ->
      """SELECT doc_id,
        |  'application/octet-stream' AS mime,
        |  source AS origin,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mm2/mm3 oracles operate on the UTF-8 payload BYTES — byte i of
    // encode(text) is read as the i-th 2-hex-char slice of
    // hex(encode(text)) (DuckDB has no BLOB substring) — matching the
    // Spark side's octet semantics even if fixtures gain non-ASCII text.
    "mm2_decode_features" -> {
      def f(k: Int) =
        s"""round(CAST(list_sum(list_filter(list_transform(generate_series(1, octet_length(encode(text))), i ->
           |  CASE WHEN (i - 1) % $NFEATURES = $k THEN ('0x' || substr(hex(encode(text)), 2*i-1, 2))::INT END), v -> v IS NOT NULL)) AS DOUBLE)
           |  / len(list_filter(generate_series(1, octet_length(encode(text))), i -> (i - 1) % $NFEATURES = $k)), 6)""".stripMargin
      s"""SELECT doc_id,
         |  ${f(0)} AS f0,
         |  ${f(1)} AS f1,
         |  ${f(7)} AS f7
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "mm4_resize" -> {
      val byteAt =
        s"('0x' || substr(hex(encode(text)), 2*((j * octet_length(encode(text))) // $RESIZE_TO + 1) - 1, 2))::INT"
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_in,
         |  $RESIZE_TO AS n_out,
         |  CAST(list_sum(list_transform(generate_series(0, ${RESIZE_TO - 1}), j ->
         |    $byteAt)) AS BIGINT) AS checksum,
         |  array_to_string(list_transform(
         |    list_slice(list_transform(generate_series(0, ${RESIZE_TO - 1}), j -> $byteAt), 1, 8),
         |    x -> CAST(x AS VARCHAR)), '-') AS head
         |FROM documents WHERE octet_length(encode(text)) > 0
         |ORDER BY doc_id""".stripMargin
    },

    // Replays MediaDedup.blockMeanHash from the same constants (48
    // blocks, integer cross-product bit decisions). Byte i of the
    // payload via the hex(encode(text)) slice idiom (see mm2 note);
    // block boundaries are pure integer arithmetic.
    "mm5_perceptual_hash" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS L,
         |         hex(encode(text)) AS hx
         |  FROM documents WHERE octet_length(encode(text)) > 0),
         |bs AS (
         |  SELECT doc_id, L, bb.b,
         |    ((bb.b + 1) * L) // 48 - (bb.b * L) // 48 AS n,
         |    CASE WHEN ((bb.b + 1) * L) // 48 >= (bb.b * L) // 48 + 1 THEN
         |      CAST(list_sum(list_transform(
         |        generate_series(CAST((bb.b * L) // 48 AS INT) + 1,
         |                        CAST(((bb.b + 1) * L) // 48 AS INT)),
         |        i -> ('0x' || substr(hx, 2*i-1, 2))::INT)) AS BIGINT)
         |    ELSE 0 END AS s
         |  FROM d, UNNEST(generate_series(0, 47)) bb(b)),
         |tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS total, max(L) AS L
         |        FROM bs GROUP BY doc_id)
         |SELECT bs.doc_id, max(t.L) AS n_bytes,
         |  CAST(sum(CASE WHEN bs.s * t.L > t.total * bs.n
         |                THEN (1::BIGINT << bs.b) ELSE 0 END) AS BIGINT) AS phash
         |FROM bs JOIN tot t USING (doc_id) GROUP BY bs.doc_id
         |ORDER BY bs.doc_id""".stripMargin,

    "mm3_frame_sample" ->
      s"""SELECT doc_id,
         |  CAST(len(generate_series(1, octet_length(encode(text)), $FRAMESTEP)) AS INT) AS n_frames,
         |  CAST(list_sum(list_transform(generate_series(1, octet_length(encode(text)), $FRAMESTEP), i ->
         |    ('0x' || substr(hex(encode(text)), 2*i-1, 2))::INT)) AS BIGINT) AS checksum,
         |  CAST(('0x' || substr(hex(encode(text)), 1, 2))::INT AS BIGINT) AS first_byte
         |FROM documents ORDER BY doc_id""".stripMargin)
}
