package graft.ops

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
  * pointer-commit that backs `o7_atomic_publish`. Re-encoding against a
  * refreshed corpus is a new version; readers pin a snapshot (or time
  * travel to a retained one — the o8 shape), so a rebuild mid-serve is
  * invisible.
  *
  * Everything stored is exact-integer or an exact double (the trained
  * amax literal), so a served ranking from the read-back is
  * bit-identical to one served from the in-session model — pinned by
  * PersistedIndexSpec against sim12's oracle-gated output.
  */
object AnnIndexStore {

  /** Table names inside a version directory. */
  private val MetaT = "ivf_meta"
  private val CentsT = "ivf_centroids"
  private val SeedsT = "pq_seeds"
  private val IndexT = "ann_index"

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

  /** Publish trained model + coded index as one atomic version; returns
    * the committed version. `encoded` is [[VectorSearch.ivfPqEncode]]'s
    * output (the only corpus-sized write); the model tables are
    * kLists + |seeds| + 1 rows. */
  def publish(spark: SparkSession, root: String, model: IvfPqModel,
              encoded: DataFrame): Long = {
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
    AtomicPublish.publish(spark, root, Seq(
      MetaT -> meta, CentsT -> cents, SeedsT -> seeds, IndexT -> encoded))
  }

  /** Load the serving state back from a committed snapshot (the current
    * one, or a retained `version` for o8-style time travel). The model
    * tables collect to the driver (kLists + |seeds| rows — the same
    * driver-side footprint training produced); the index stays a lazy
    * DataFrame for [[VectorSearch.ivfPqServe]]. */
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
    (IvfPqModel(IvfModel(amax, cents), seeds, nSub),
      snap.table(spark, IndexT))
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
}
