package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the fixture star schema (FIXTURES.md).
  *
  * Replaces the reference's `SELECT * FROM transportation.{t}` full-table
  * extraction (/root/reference/warehouse.py:31-38) with parquet scans that
  * Catalyst can column-prune and filter-push — the reference always
  * materializes every column of every row into client memory
  * (warehouse.py:37); here the scan only reads what downstream plans need.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Reads `table` from `dir` — a parquet fixture directory, or, when
    * `dir` is a JDBC URL (`jdbc:mysql://...`), a live warehouse via
    * [[readJdbc]] (the reference's real extraction surface,
    * warehouse.py:25-43). Every table helper below inherits the routing,
    * so the whole query battery can point at a database instead of
    * fixtures by swapping the dir string. */
  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    if (dir.startsWith("jdbc:")) readJdbc(spark, dir, table)
    else spark.read.parquet(s"$dir/$table.parquet")

  /** The option map [[readJdbc]] passes to the JDBC source — factored out
    * so the plumbing is unit-testable without a connection (the JDBC
    * source resolves schemas by connecting eagerly). When
    * `partitionColumn` is set the read is issued as `numPartitions`
    * parallel bounded range queries — the scale path; a plain JDBC read
    * is ONE connection pulling the whole table through the driver
    * (exactly the reference's bottleneck, warehouse.py:37). */
  def jdbcOptions(url: String, table: String,
                  options: Map[String, String] = Map.empty,
                  partitionColumn: Option[String] = None,
                  bounds: Option[(Long, Long)] = None,
                  numPartitions: Int = 8): Map[String, String] = {
    require(url.startsWith("jdbc:"), s"not a JDBC url: $url")
    val partitioned = partitionColumn match {
      case Some(c) =>
        val (lo, hi) = bounds.getOrElse(throw new IllegalArgumentException(
          "partitionColumn requires bounds=(lower, upper)"))
        Map("partitionColumn" -> c, "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString, "numPartitions" -> numPartitions.toString)
      case None => Map.empty[String, String]
    }
    Map("url" -> url, "dbtable" -> table,
      // push the whole projection+filter work to the database where the
      // source supports it; Catalyst handles column pruning automatically
      "pushDownPredicate" -> "true") ++ partitioned ++ options
  }

  /** JDBC extraction (warehouse.py:25-43 re-expressed as a Spark source:
    * `SELECT * FROM db.{t}` into client memory becomes a prunable,
    * filter-pushing scan; with `partitionColumn` it becomes parallel
    * bounded range scans). Exercised live against embedded Apache Derby
    * (JdbcSourceSpec): round trip, `jdbc:` routing, and the 4-way
    * parallel bounded-range read. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               options: Map[String, String] = Map.empty,
               partitionColumn: Option[String] = None,
               bounds: Option[(Long, Long)] = None,
               numPartitions: Int = 8): DataFrame =
    spark.read.format("jdbc")
      .options(jdbcOptions(url, table, options, partitionColumn, bounds,
        numPartitions))
      .load()

  /** Rebalance an under-parallel scan before a compute-heavy stage.
    *
    * Parquet map parallelism is bounded by row-group count — a
    * single-row-group file (like every fixture here, and like any
    * unsplittable input: gzip csv, one-connection JDBC) scans as ONE
    * task, so everything narrow-dependent downstream (broadcast join
    * chains, tokenization, vector math, parquet encode) runs on one
    * core no matter what `maxPartitionBytes` or the AQE advisory says.
    * Only an explicit exchange can widen it.
    *
    * Policy: shuffle the narrow base rows once, but ONLY when the scan
    * is actually under-parallel (fewer partitions than half the
    * cluster's cores). On a real multi-row-group 100 TB layout the scan
    * already yields thousands of splits and this is an exact no-op — no
    * conditional shuffle sneaks into the plan at scale. Callers apply it
    * where a compute-bound stage follows the scan; plain
    * scan→shuffle-agg paths don't need it (the agg's own exchange
    * already spreads the reduce side, and partial aggregation of narrow
    * rows is cheap).
    *
    * The spread is a HASH repartition over every column, not
    * round-robin: RoundRobinPartitioning pays Spark's
    * sortBeforeRepartition determinism rule — a FULL local sort of each
    * scan slice before the exchange, which at sf10 under 16-thread/
    * 20 GiB executors OOMed the map side outright (SCALE.md r13). A
    * full-row hash reaches the same uniform spread for near-unique
    * rows, is retry-deterministic by construction (same row → same
    * partition, stronger than sorted round-robin), and its map side is
    * a pure hash-and-write with no buffered state. Exact duplicate
    * rows co-locate — irrelevant for the spread, and a reminder that
    * this helper stays upstream of order-independent logic (joins,
    * aggregates, per-row projections) — never before
    * first-wins/limit-style operators (partition-internal row order is
    * still nondeterministic).
    *
    * PRECONDITION — rows must be near-unique across ALL columns: the
    * full-row hash derives its uniform spread from row distinctness, so
    * a duplicate-heavy or low-distinct-row input collapses onto few
    * partitions and silently loses the spread this helper promises.
    * That holds for every current caller (raw fact rows carry unique
    * keys); a future caller with duplicated rows should hash on an
    * explicit near-unique column subset (`repartition(n, cols…)`) or
    * accept round-robin's sort tax instead.
    */
  def fanOut(df: DataFrame, parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val target = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    if (scanSplitEstimate(df) < math.max(2, target / 2))
      df.repartition(target, df.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
    else df
  }

  /** Plan-side estimate of the scan parallelism feeding `df`, read from
    * the optimized logical plan so the gate never instantiates an RDD
    * lineage (`df.rdd.getNumPartitions` builds the physical RDD chain on
    * every call). File relations estimate Spark's own byte-range split
    * rule — ceil(totalBytes / maxPartitionBytes), the same quantity the
    * RDD partition count reflects (small files pack, large files split);
    * a non-file [[org.apache.spark.sql.sources.BaseRelation]] (e.g. a
    * single-connection JDBC read) is assumed serial (1); any other leaf
    * (local rows, cached data, shuffled input) is already parallelized by
    * Spark itself, so the gate treats it as wide and fanOut no-ops. */
  private def scanSplitEstimate(df: DataFrame): Long = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val maxSplit = math.max(1L,
      df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val ests = df.queryExecution.optimizedPlan.collectLeaves().map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          math.max(1L, (fs.location.sizeInBytes + maxSplit - 1) / maxSplit)
        case _ => 1L // non-file source: assume one connection until proven wider
      }
      case _: LocalRelation => Long.MaxValue // parallelized at defaultParallelism
      case _ => Long.MaxValue
    }
    if (ests.isEmpty || ests.contains(Long.MaxValue)) Long.MaxValue else ests.sum
  }

  /** Collision-free, identifier-safe tag for per-fixture sink paths and
    * table names: sanitized path tail + 8 hex chars of md5. (Replaces
    * math.abs(hashCode), which could collide across dirs and went
    * negative at Int.MinValue.) */
  def dirSlug(dir: String): String = {
    val tail = dir.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+|_+$", "").takeRight(24)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
    val hex = md5.take(4).map("%02x".format(_)).mkString
    s"${tail}_$hex"
  }

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright; read it as a long (legacy conf) and convert to a
    * microsecond timestamp. The generator's sub-microsecond components are
    * all zero, so the conversion is lossless vs the DuckDB oracle. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    // fixture generations differ: TIMESTAMP(NANOS) files surface as LONG
    // under the legacy conf (convert: nanos → micros); TIMESTAMP(MICROS)
    // files surface as a (session-TZ-less) timestamp directly — cast to
    // the session-zoned TimestampType every downstream window/cohort op
    // expects (identical wall times under the UTC session both the
    // driver and Verify/Bench pin).
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        requireNanosTs(spark, dir)
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** The INT64-`ts` guard shared by [[events]] and
    * [[graft.streaming.Streams.events]]: LongType there means EITHER
    * TIMESTAMP(NANOS) surfaced as a long under the legacy conf, OR a
    * plain unannotated INT64 — which the nanos→micros division would
    * silently mis-scale by 1000×. For filesystem fixtures, check the
    * parquet footer's logical-type annotation and fail loudly on
    * unannotated input. A `jdbc:`-routed dir has no parquet footer to
    * consult — there a BIGINT ts column IS the nanos contract (the
    * relational schema carries no sub-type annotation), matching the
    * pre-guard behavior. */
  private[graft] def requireNanosTs(spark: SparkSession, dir: String): Unit =
    if (!dir.startsWith("jdbc:"))
      require(tsLogicalUnitIsNanos(spark, s"$dir/events.parquet"),
        s"events.ts in $dir is INT64 without a TIMESTAMP(NANOS) logical " +
          "annotation; refusing to guess its time unit")

  /** Footer check backing [[requireNanosTs]]: true iff the `ts` column
    * carries a TIMESTAMP(NANOS) logical annotation. Reads one parquet
    * footer (no data scan). Handles a single-file fixture, a flat part
    * directory, and a hive-partitioned tree (first .parquet by
    * recursive descent wins: Spark would refuse a mixed-annotation
    * dataset at schema merge anyway). Memoized by (resolved file,
    * mtime, length) so a regenerated fixture at the same path is
    * re-checked instead of served a stale verdict. */
  // Keyed by resolved file path; the value carries the (mtime,length)
  // stamp it was computed at, so a regenerated fixture REPLACES its old
  // entry instead of accreting one stale key per generation (the map
  // stays bounded by the number of distinct fixture paths).
  private val tsUnitMemo = new java.util.concurrent.ConcurrentHashMap[String, (String, Boolean)]()
  private[graft] def tsLogicalUnitIsNanos(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def firstParquet(st: FileStatus): Option[FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).sortBy(_.getPath.getName)
          .iterator.flatMap(firstParquet).nextOption()
      else Some(st).filter(_.getPath.getName.endsWith(".parquet"))
    val st = firstParquet(fs.getFileStatus(p)).getOrElse(
      throw new IllegalArgumentException(s"no parquet files under $path"))
    val stamp = s"${st.getModificationTime}#${st.getLen}"
    tsUnitMemo.compute(st.getPath.toString, (_, prev) => {
      if (prev != null && prev._1 == stamp) prev
      else {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
        val isNanos = try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          val ts = schema.getType(schema.getFieldIndex("ts"))
          ts.asPrimitiveType().getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          }
        } finally reader.close()
        (stamp, isNanos)
      }
    })._2
  }

  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** S2 — routed scan: the reference reads `transportfact` from the
    * warehouse db instead of the source db (warehouse.py:31-34). Here the
    * router picks a directory per logical table; warehouse-owned tables may
    * live elsewhere (e.g. pipeline output dir).
    */
  def routedRead(spark: SparkSession, sourceDir: String, warehouseDir: String,
                 table: String): DataFrame = {
    val dir = if (table == "transportfact" || table.startsWith("dim") || table == "cube_table")
      warehouseDir else sourceDir
    read(spark, dir, table)
  }
}
