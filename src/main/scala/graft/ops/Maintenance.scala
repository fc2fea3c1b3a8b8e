package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance operators [extension; the reference's maintenance
  * surface is MySQL TRUNCATE + re-INSERT (/root/reference/warehouse.py:
  * 252-301) — at lake scale the equivalent housekeeping problem is small
  * files, not stale rows].
  *
  * Streaming sinks, partitioned writes, and frequent incremental loads
  * all fragment a table into files far below the row-group sweet spot;
  * at 100 TB the resulting per-file open/footer/seek overhead dominates
  * scan time and the NameNode/object-store metadata load grows with file
  * count, not byte count. Compaction rewrites a directory into
  * ceil(bytes / targetBytes) files.
  */
object Maintenance {

  /** Parquet data files under `dir` (non-recursive; skips _SUCCESS etc). */
  def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Rewrite the parquet directory `inDir` as `ceil(totalBytes /
    * targetBytes)` files at `outDir` (callers overwrite `inDir` itself by
    * passing the same path through a temp dir + rename when atomicity
    * matters — see the s8 sink for the overwrite pattern).
    *
    * Uses `coalesce`, not `repartition`: compaction is narrow — each
    * output task reads a handful of input files with NO shuffle, so the
    * cost is one pass of decode+encode. The trade-off (a skewed input
    * could leave uneven outputs) is the right one for maintenance jobs;
    * content is bit-for-bit the same rows, so the op is oracle-checkable
    * through any aggregate. Returns the compacted frame's reader. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val total = dataFiles(spark, inDir).map(_._2).sum
    val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(nOut)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
