package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.AtomicPublish
import graft.ops.VectorSearch.{IvfModel, IvfPqModel}

/** TABLE-persisted ANN serving state — the 100 TB deployment shape the
  * session cache only rehearses (SCALE.md): train on a sample, encode
  * the corpus ONCE (map-only, ~nSub bytes/vector), persist model +
  * coded index as plain parquet tables, and serve every later query
  * batch against the read-back. Restarting the serving job costs a
  * table read, not a corpus re-encode.
  *
  * The model (IVF centroids + PQ codebook seeds + the corpus amax
  * scale) and the coded index are published as ONE
  * [[graft.etl.AtomicPublish]] batch: a serving job can never observe a
  * new index against an old codebook — the exact cross-table-atomicity
  * hazard the reference's multi-statement transactions guard against
  * (/root/reference/warehouse.py:252-301), solved here by the same
  * pointer-commit that backs `o7_atomic_publish`. Readers pin a
  * snapshot (or time travel to a retained one — the o8 shape), so a
  * rebuild mid-serve is invisible.
  *
  * INCREMENTAL GROWTH (round 11): the coded index is stored as
  * immutable SEGMENTS (`root/seg/<id>/`, each an [[VectorSearch.ivfPqEncode]]
  * output) referenced by a tiny per-version manifest table — the
  * Iceberg/Delta data-file/manifest split reduced to plain parquet.
  * [[appendEncode]] therefore encodes ONLY the new batch and publishes
  * a new version whose manifest is (old segments :+ new segment): at
  * 100 TB, daily corpus growth costs one batch-sized encode + a
  * pointer commit, never a corpus rewrite. The MODEL is frozen across
  * appends by design — codes are only comparable under one codebook;
  * re-training is a full rebuild ([[publish]]), which readers again
  * only ever see atomically. Orphaned segments (from vacuumed or
  * never-committed versions) are reclaimed by [[vacuumSegments]].
  *
  * Everything stored is exact-integer or an exact double (the trained
  * amax literal), so a served ranking from the read-back is
  * bit-identical to one served from the in-session model — pinned by
  * PersistedIndexSpec against sim12's oracle-gated output, and the
  * append path by IncrementalIndexSpec against a one-shot full encode.
  */
object AnnIndexStore {

  /** Table names inside a version directory. */
  private val MetaT = "ivf_meta"
  private val CentsT = "ivf_centroids"
  private val SeedsT = "pq_seeds"
  private val SegsT = "ann_segments"

  private val centSchema = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("cent", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("cnt", LongType, nullable = false)))

  private val seedSchema = StructType(Seq(
    StructField("sid", IntegerType, nullable = false),
    StructField("qv", ArrayType(LongType, containsNull = false), nullable = false)))

  private val metaSchema = StructType(Seq(
    StructField("amax", DoubleType, nullable = false),
    StructField("n_sub", IntegerType, nullable = false)))

  private val segSchema = StructType(Seq(
    StructField("seq", IntegerType, nullable = false),
    StructField("seg", StringType, nullable = false)))

  /** Write one immutable coded segment; returns its id. Segment dirs
    * live OUTSIDE version dirs (like Iceberg data files) so appends
    * never copy them; only manifests reference them. Overwrite mode so
    * a CALLER-named segment (streaming batch replay) lands
    * idempotently; uuid-named segments never collide. */
  private def writeSegment(spark: SparkSession, root: String,
                           encoded: DataFrame,
                           segmentId: Option[String] = None): String = {
    val id = segmentId.getOrElse(s"seg-${java.util.UUID.randomUUID}")
    encoded.write.mode("overwrite").parquet(s"$root/seg/$id")
    id
  }

  private def segmentIds(spark: SparkSession,
                         snap: AtomicPublish.Snapshot): Seq[String] =
    snap.table(spark, SegsT).orderBy("seq").collect()
      .map(_.getAs[String]("seg")).toSeq

  /** Publish model tables + a segment manifest as one atomic version.
    * `expectedBase` (see [[graft.etl.AtomicPublish.stage]]) pins the
    * version the manifest was DERIVED from: appendEncode/compactSegments
    * build their new manifest from a snapshot taken BEFORE a potentially
    * long encode/merge, so a publish that commits inside that window
    * must fail this one (ConcurrentModificationException) rather than
    * let the stale manifest silently drop the other writer's segment. */
  private def publishVersion(spark: SparkSession, root: String,
                             model: IvfPqModel, segs: Seq[String],
                             expectedBase: Option[Option[Long]] = None): Long = {
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(model.ivf.cents.zipWithIndex.map {
        case ((cent, cnt), i) => Row(i, cent.toSeq, cnt)
      }: _*), centSchema)
    val seeds = spark.createDataFrame(
      java.util.Arrays.asList(model.seedRows.zipWithIndex.map {
        case (qv, i) => Row(i, qv.toSeq)
      }: _*), seedSchema)
    val meta = spark.createDataFrame(
      java.util.Arrays.asList(Row(model.ivf.amaxVal, model.nSub)), metaSchema)
    val manifest = spark.createDataFrame(
      java.util.Arrays.asList(segs.zipWithIndex.map {
        case (s, i) => Row(i, s)
      }: _*), segSchema)
    AtomicPublish.publish(spark, root, Seq(
      MetaT -> meta, CentsT -> cents, SeedsT -> seeds, SegsT -> manifest),
      expectedBase)
  }

  /** FULL build: publish trained model + coded corpus as one atomic
    * version (a single initial segment); returns the committed version.
    * `encoded` is [[VectorSearch.ivfPqEncode]]'s output — the only
    * corpus-sized write. */
  def publish(spark: SparkSession, root: String, model: IvfPqModel,
              encoded: DataFrame): Long = {
    val seg = writeSegment(spark, root, encoded)
    publishVersion(spark, root, model, Seq(seg))
  }

  /** INCREMENTAL growth: encode ONLY `batch` under the current
    * version's frozen model and commit a new version referencing
    * (old segments :+ the new one). Cost ∝ batch, never corpus; the
    * old segments' files are untouched (IncrementalIndexSpec pins
    * this). Rows in `batch` are the caller's responsibility to be new
    * ids — the index is append-only, like the corpus it mirrors.
    *
    * The commit is CONDITIONAL on the base snapshot: the new manifest
    * is (that snapshot's segments :+ the new one), so a version
    * published by anyone else during the encode window would be
    * silently dropped from it — instead the publish fails with
    * ConcurrentModificationException and the caller re-runs against
    * the fresh snapshot. `asOf` pins an explicit base version (a
    * caller that resolved a snapshot earlier for other reads); default
    * is the current version at entry. */
  def appendEncode(spark: SparkSession, root: String, batch: DataFrame,
                   idCol: String, vecCol: String,
                   segmentId: Option[String] = None,
                   asOf: Option[Long] = None): Long = {
    val snap = asOf.fold(AtomicPublish.snapshot(spark, root))(
      AtomicPublish.snapshotAt(spark, root, _))
    val prior = segmentIds(spark, snap)
    // a replayed caller-named segment (streaming batch retry) whose
    // publish ALREADY committed: short-circuit before touching its
    // files — rewriting a committed segment (even with identical
    // content) would transiently break pinned-snapshot readers mid-scan
    // and violate the "prior segments' files are untouched" guarantee
    if (segmentId.exists(prior.contains)) return snap.version
    val (model, _) = load(spark, root, Some(snap.version))
    val seg = writeSegment(spark, root,
      VectorSearch.ivfPqEncode(model, batch, idCol, vecCol), segmentId)
    publishVersion(spark, root, model, prior :+ seg,
      expectedBase = Some(Some(snap.version)))
  }

  /** Load the serving state back from a committed snapshot (the current
    * one, or a retained `version` for o8-style time travel). The model
    * tables collect to the driver (kLists + |seeds| rows — the same
    * driver-side footprint training produced); the index is the lazy
    * union of the manifest's segments for [[VectorSearch.ivfPqServe]]. */
  def load(spark: SparkSession, root: String,
           version: Option[Long] = None): (IvfPqModel, DataFrame) = {
    val snap = version.fold(AtomicPublish.snapshot(spark, root))(
      AtomicPublish.snapshotAt(spark, root, _))
    val metaRow = snap.table(spark, MetaT).collect()(0)
    val amax = metaRow.getAs[Double]("amax")
    val nSub = metaRow.getAs[Int]("n_sub")
    val cents = snap.table(spark, CentsT)
      .orderBy("cid").collect()
      .map(r => (r.getSeq[Long](r.fieldIndex("cent")).toArray,
        r.getAs[Long]("cnt")))
    val seeds = snap.table(spark, SeedsT)
      .orderBy("sid").collect()
      .map(r => r.getSeq[Long](r.fieldIndex("qv")).toArray)
    val paths = segmentIds(spark, snap).map(s => s"$root/seg/$s")
    (IvfPqModel(IvfModel(amax, cents), seeds, nSub),
      spark.read.parquet(paths: _*))
  }

  /** Convenience: load (optionally pinned) state and serve one query
    * batch — the whole production serve path in one call. */
  def serve(spark: SparkSession, root: String, queries: DataFrame,
            idCol: String, vecCol: String, k: Int = 10, nprobe: Int = 3,
            version: Option[Long] = None,
            excludeSelf: Boolean = true): DataFrame = {
    val (model, index) = load(spark, root, version)
    VectorSearch.ivfPqServe(model, index, queries, idCol, vecCol, k, nprobe,
      excludeSelf)
  }

  /** SEGMENT COMPACTION — the counterweight to [[appendEncode]]'s
    * accretion: at streaming cadence (st13's shape) the manifest gains
    * one small segment per micro-batch, and [[serve]]'s union must plan
    * ~1,440 parquet dirs/day — the classic small-files problem every
    * segment store (Lucene's tiered merge, Iceberg's rewrite-data-files)
    * solves by merging. This rewrites the SMALLEST segments whose
    * combined size fits `targetBytes` into one segment and publishes a
    * new version whose manifest swaps them; repeated calls converge to
    * ~ceil(corpus / targetBytes) segments (tiered-merge style).
    *
    * Codes are pure (model, row) functions and the merge is a narrow
    * byte-copy (`coalesce`, no shuffle, no re-encode), so the compacted
    * index serves BIT-IDENTICAL rankings (IncrementalIndexSpec pins
    * this, including mid-stream in the ingest chain). The doomed
    * segments' files are untouched — still referenced by every earlier
    * retained version (time travel unaffected) — until
    * [[AtomicPublish.vacuum]] drops those versions and
    * [[vacuumSegments]] reclaims the then-orphaned dirs.
    *
    * Trigger policy (SCALE.md): run at an ops cadence (e.g. hourly
    * against a minute-level ingest), with `targetBytes` at the table's
    * file sweet spot (default 128 MiB). Cost per call is one narrow
    * read+rewrite pass over at most `targetBytes` of the SMALLEST
    * segments — independent of corpus size. Returns the new version, or
    * the current one unchanged when fewer than `minSegments` segments
    * fit the merge budget (nothing worth merging). The publish is
    * conditional on the entry snapshot (same contract as
    * [[appendEncode]]): an ingest that commits mid-merge turns this
    * compaction into a loud ConcurrentModificationException — retry at
    * the next cadence tick — never a manifest that drops its segment. */
  def compactSegments(spark: SparkSession, root: String,
                      targetBytes: Long = 128L * 1024 * 1024,
                      minSegments: Int = 2): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(minSegments >= 2, s"minSegments must be >= 2, got $minSegments")
    val snap = AtomicPublish.snapshot(spark, root)
    val segs = segmentIds(spark, snap)
    val sizes = segs.map(s =>
      s -> Maintenance.dataFiles(spark, s"$root/seg/$s").map(_._2).sum)
    // smallest-first (id tiebreak for determinism); merge the longest
    // prefix whose cumulative size fits the target
    val bySize = sizes.sortBy { case (id, n) => (n, id) }
    val cum = bySize.map(_._2).scanLeft(0L)(_ + _).tail
    val doomed = bySize.zip(cum).takeWhile(_._2 <= targetBytes).map(_._1._1)
    if (doomed.size < minSegments) return snap.version
    val (model, _) = load(spark, root, Some(snap.version))
    val doomedSet = doomed.toSet
    val total = sizes.collect { case (id, n) if doomedSet(id) => n }.sum
    val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val merged = spark.read.parquet(doomed.map(s => s"$root/seg/$s"): _*)
      .coalesce(nOut)
    val newSeg = writeSegment(spark, root, merged)
    // manifest: the merged segment takes the earliest doomed slot;
    // survivors keep their relative order (segment order is cosmetic —
    // serving is order-independent — but determinism is free here)
    val firstDoomed = segs.indexWhere(doomedSet)
    val newSegs = segs.zipWithIndex.flatMap { case (s, i) =>
      if (i == firstDoomed) Some(newSeg)
      else if (doomedSet(s)) None
      else Some(s)
    }
    publishVersion(spark, root, model, newSegs,
      expectedBase = Some(Some(snap.version)))
  }

  /** Reclaim segment dirs referenced by NO retained version's manifest
    * (run after [[AtomicPublish.vacuum]]); returns the deleted ids.
    * Retained-version reads are unaffected — their manifests only
    * reference surviving segments by construction.
    *
    * Same in-flight hazard class as [[AtomicPublish.vacuum]]'s staging
    * dirs, one level down: a segment just written by an appendEncode /
    * compactSegments that has NOT yet committed its manifest is
    * unreferenced at this instant — deleting it would let that publish
    * commit a manifest pointing at a missing dir (serving then fails at
    * read time). Segment dirs younger than `minAgeMs` are therefore
    * SKIPPED; pass 0 only where no index writer can be in flight. */
  def vacuumSegments(spark: SparkSession, root: String,
                     minAgeMs: Long = AtomicPublish.DefaultVacuumMinAgeMs): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segRoot = new Path(root, "seg")
    if (!fs.exists(segRoot)) return Nil
    val rootPath = new Path(root)
    val retained = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption)
    val referenced = retained.flatMap { v =>
      segmentIds(spark, AtomicPublish.Snapshot(root, v))
    }.toSet
    val now = System.currentTimeMillis()
    val doomed = fs.listStatus(segRoot).toSeq
      .filter(s => now - s.getModificationTime >= minAgeMs)
      .map(_.getPath.getName)
      .filterNot(referenced)
    doomed.foreach(id => fs.delete(new Path(segRoot, id), true))
    doomed
  }
}
