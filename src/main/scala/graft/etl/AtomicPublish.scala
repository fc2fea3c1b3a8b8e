package graft.etl

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table transactional atomicity — the one reference behavior the
  * engine had documented as a non-goal (warehouse.py:50-70,252-301 wraps
  * each multi-table load and the cube rebuild in multi-statement MySQL
  * transactions, so a reader never sees table A from batch N next to
  * table B from batch N-1).
  *
  * On a file warehouse the equivalent primitive is SNAPSHOT PUBLICATION:
  * writers materialize EVERY output of a batch under a fresh versioned
  * directory (`root/v<N>/<table>/`), then commit the whole batch by
  * atomically replacing one version pointer (`root/_CURRENT`). Readers
  * resolve the pointer once per job ([[snapshot]]) and read all tables
  * from that same version — a consistent multi-table view by
  * construction. This is the single-pointer commit at the heart of
  * Iceberg/Delta (their metadata-file swap), reduced to plain parquet
  * plus one rename; no table data is ever mutated in place.
  *
  * Failure atomicity: all writes land under the NEW version directory
  * before the pointer moves, so a crash mid-batch leaves `_CURRENT`
  * untouched and readers keep the previous consistent snapshot; the
  * orphaned half-written `v<N+1>` is invisible and reclaimed by
  * [[vacuum]]. The pointer swap itself is `FileContext.rename(…,
  * Rename.OVERWRITE)` — atomic on POSIX filesystems and HDFS. (On an
  * object store the same contract needs a CAS primitive — an S3
  * conditional PUT or a DynamoDB/catalog pointer — the layout and
  * protocol are unchanged.)
  *
  * Concurrency: single writer, many readers — the reference's shape (one
  * ETL job owns the warehouse). Multi-writer would need the commit to be
  * a compare-and-swap on the expected version; noted, out of scope.
  */
object AtomicPublish {

  private val Pointer = "_CURRENT"

  private def fc(spark: SparkSession): FileContext =
    FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)

  /** The committed version, or None before the first publish. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val p = new Path(root, Pointer)
    val ctx = fc(spark)
    if (!ctx.util.exists(p)) None
    else {
      val in = ctx.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /** A resolved snapshot: table reads through it all see ONE version,
    * even if a publish commits concurrently mid-job. */
  final case class Snapshot(root: String, version: Long) {
    def table(spark: SparkSession, name: String): DataFrame =
      spark.read.parquet(s"$root/v$version/$name")
  }

  /** Resolve the current snapshot once; throws before the first publish. */
  def snapshot(spark: SparkSession, root: String): Snapshot =
    Snapshot(root, currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no published version under $root")))

  /** TIME TRAVEL: resolve a specific retained version — "read the
    * warehouse as of batch N", the as-of read Iceberg/Delta expose via
    * snapshot ids. Works because version directories are immutable once
    * committed and [[vacuum]] is the only deleter; throws if the asked
    * version was vacuumed or never committed. */
  def snapshotAt(spark: SparkSession, root: String, version: Long): Snapshot = {
    val p = new Path(root, s"v$version")
    require(fc(spark).util.exists(p),
      s"version $version not present under $root (vacuumed or never committed)")
    Snapshot(root, version)
  }

  /** Convenience single-table read through the current snapshot. Jobs
    * touching several tables should hold one [[snapshot]] instead, so
    * all their reads resolve to the same version. */
  def readTable(spark: SparkSession, root: String, name: String): DataFrame =
    snapshot(spark, root).table(spark, name)

  /** Publish `outputs` as one atomic batch; returns the new version.
    * Either every table of the batch becomes visible together, or (on
    * any failure before the pointer swap) none do. */
  def publish(spark: SparkSession, root: String,
              outputs: Seq[(String, DataFrame)]): Long = {
    require(outputs.nonEmpty, "empty publish batch")
    val next = currentVersion(spark, root).getOrElse(-1L) + 1
    // 1. materialize every output under the uncommitted version dir
    outputs.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$root/v$next/$name")
    }
    // 2. commit: write pointer to a temp name, atomically swap it in
    val ctx = fc(spark)
    val tmp = new Path(root, s"$Pointer.tmp-${java.util.UUID.randomUUID}")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    ctx.rename(tmp, new Path(root, Pointer), Options.Rename.OVERWRITE)
    next
  }

  /** Reclaim version directories older than the last `keep` committed
    * versions (plus any orphaned never-committed ones below them).
    * Readers of retained versions are unaffected — data dirs are
    * immutable once written. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    val cur = currentVersion(spark, root).getOrElse(return Nil)
    val ctx = fc(spark)
    val rootPath = new Path(root)
    if (!ctx.util.exists(rootPath)) return Nil
    val it = ctx.listStatus(rootPath)
    val versions = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case n if n.startsWith("v") => n.drop(1).toLongOption
        case _ => None
      })
      .toSeq
    val doomed = versions.filter(_ <= cur - keep).sorted
    doomed.foreach(v => ctx.delete(new Path(root, s"v$v"), true))
    doomed
  }
}
