package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming building blocks [extension — SURVEY.md §2.10; the
  * reference is strictly batch, its only "incrementality" is idempotent
  * re-run via anti-joins].
  *
  * Streams read the same parquet fixtures through `readStream` (schema
  * pinned from a batch read), run with a watermark, and are driven to
  * completion with Trigger.AvailableNow + a memory sink so the driver's
  * batch harness can verify results. On a live cluster the same plans run
  * unchanged against a file/Kafka source with a real trigger; state stays
  * bounded by the watermark.
  */
object Streams {

  /** State partition count for the harness-driven streaming queries.
    * Each state partition costs a store instance + checkpoint commit per
    * micro-batch regardless of volume, so the session's batch setting
    * (32) is pure fixed overhead at fixture scale; on a real cluster the
    * right number tracks executor count. Captured in the checkpoint on
    * first run, so it is a per-query, recreate-to-change knob.
    * Env-overridable for perf experiments. */
  private val stateParts: String =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8")

  /** Fixture schema probe, memoized per directory: `readStream` needs a
    * user-supplied schema, and deriving it with a batch read costs a
    * footer-read job per call — eleven times per bench session across
    * the st* queries for the identical answer. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Session confs applied around every harness-driven stream and
    * restored afterwards:
    *  - state/shuffle partitions (see [[stateParts]]);
    *  - no-data micro-batches OFF: every st* query emits its full output
    *    in the data batch itself (complete-mode aggregations, the
    *    immediate-emit dedup, the inner stream-stream join, the
    *    NoTimeout sessionizer, stateless projections), so the trailing
    *    empty batch Spark schedules by default only advances the
    *    watermark to evict state the AvailableNow query is about to
    *    discard — at fixture scale that is a full state-store
    *    commit/offset-log cycle (measured 0.55 s on st2, 0.92 s on st6)
    *    for zero rows. A production query whose OUTPUT depends on
    *    watermark advancement (append-mode windowed agg, outer
    *    stream-stream join) must keep the default; none of the harness
    *    shapes do;
    *  - local session-window pre-merge: fold each partition's session
    *    fragments before the state-store shuffle, so the session agg
    *    shuffles and stores merged sessions, not per-event fragments —
    *    strictly fewer state rows at any scale. */
  private def withStreamConfs[T](spark: SparkSession)(body: => T): T = {
    val pairs = Seq(
      "spark.sql.shuffle.partitions" -> stateParts,
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
      "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition" -> "true")
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Streaming view of `events` with the nanos→micros ts normalization
    * (same as Tables.events, streaming flavor). */
  def events(spark: SparkSession, dir: String,
             readOptions: Map[String, String] = Map.empty): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = schemaMemo.computeIfAbsent(s"$dir/events.parquet",
      p => spark.read.parquet(p).schema)
    // the file source streams a directory; glob down to the events table
    val reader = readOptions.foldLeft(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val stream = reader.parquet(dir)
    // same either-generation ts normalization as Tables.events: NANOS
    // fixtures arrive as LONG under the legacy conf, MICROS fixtures as
    // a TZ-less timestamp
    stream.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // same footer guard as Tables.events: refuse an unannotated
        // INT64 instead of silently dividing a micros column by 1000
        graft.Tables.requireNanosTs(spark, dir)
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        stream.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** Streaming view of `documents` (Tables.documents, streaming flavor).
    * Fixture-dir specific; the st10 convergence spec builds its own
    * throttled multi-file stream directly. */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    val schema = schemaMemo.computeIfAbsent(s"$dir/documents.parquet",
      p => spark.read.parquet(p).schema)
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** Drive a stream to completion through a caller-supplied foreachBatch
    * body (an INGEST side effect keyed by batchId — the body must be
    * idempotent per batchId, e.g. an overwrite-by-batch-name publish, so
    * a replayed batch converges instead of duplicating). Checkpointed
    * next to the ingest like the other production-sink runners; the
    * caller clears its own output root for a deterministic fixture
    * run. */
  def runIngest(spark: SparkSession, streamed: DataFrame, chkDir: String)(
      body: (DataFrame, Long) => Unit): Unit = {
    val fs = new java.io.File(chkDir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    if (fs.exists) rm(fs)
    withStreamConfs(spark) {
      val q = streamed.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          body(batch, batchId)
        }
        .option("checkpointLocation", chkDir)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }

  /** Run a streaming DataFrame to completion into a checkpointed PARQUET
    * file sink — the production sink shape (exactly-once via the sink's
    * commit log; the checkpoint makes re-runs resume, so the sink dir is
    * cleared first for a deterministic fixture result). Returns the
    * read-back of the sink directory. */
  def runToParquet(spark: SparkSession, streamed: DataFrame,
                   outDir: String): DataFrame = {
    val fs = new java.io.File(outDir)
    def rm(f: java.io.File): Unit = {
      // listFiles() is null (not empty) on unreadable/raced entries
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    if (fs.exists) rm(fs)
    withStreamConfs(spark) {
      val q = streamed.writeStream
        .format("parquet")
        .option("path", s"$outDir/data")
        .option("checkpointLocation", s"$outDir/chk")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // A zero-row stream leaves no parquet files, so schema inference on
    // the sink dir would throw — read back with the plan's known schema.
    spark.read.schema(streamed.schema).parquet(s"$outDir/data")
  }

  /** Run a COMPLETE-mode streaming aggregation to completion into a
    * versioned parquet table and return the read-back of the final
    * version — the bounded result surface for complete-mode queries
    * whose output is corpus-shaped (st7's per-user sessions): a memory
    * sink collects the whole result to the DRIVER every batch, which at
    * sf10 is ~1.1 GiB and trips the default
    * `spark.driver.maxResultSize`; here each batch's full result is
    * written by the EXECUTORS and the driver never holds a row.
    * Versioning per batchId keeps read and write of a live serve in
    * different directories (same convention as [[runMergeToParquet]] —
    * the built-in file sink is append-only and cannot carry complete
    * mode, hence foreachBatch). */
  def runCompleteToParquet(spark: SparkSession, streamed: DataFrame,
                           outDir: String): DataFrame = {
    val root = new java.io.File(outDir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    if (root.exists) rm(root)
    @volatile var lastVersion = -1L
    withStreamConfs(spark) {
      val q = streamed.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$outDir/v$batchId")
          lastVersion = batchId
        }
        .option("checkpointLocation", s"$outDir/chk")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    if (lastVersion < 0)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), streamed.schema)
    else spark.read.parquet(s"$outDir/v$lastVersion")
  }

  /** Run a stream through a foreachBatch MERGE into a versioned parquet
    * state table — the streaming-upsert sink shape (Delta/Iceberg MERGE
    * INTO stand-in on plain parquet). Each micro-batch is reduced by
    * `aggFn`, merged with the previous state version by `mergeFn`
    * (which must be associative so multi-batch replays converge to the
    * batch answer), and written as `v<batchId>`; versioning keeps the
    * read and write of a round in different directories (a parquet dir
    * can't be overwritten while being read). Returns the final state.
    */
  def runMergeToParquet(spark: SparkSession, streamed: DataFrame, outDir: String)(
      aggFn: DataFrame => DataFrame)(
      mergeFn: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val root = new java.io.File(outDir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    if (root.exists) rm(root)
    @volatile var lastVersion = -1L
    withStreamConfs(spark) {
      val q = streamed.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val agg = aggFn(batch)
          val merged =
            if (lastVersion < 0) agg
            else mergeFn(spark.read.parquet(s"$outDir/v$lastVersion"), agg)
          merged.write.mode("overwrite").parquet(s"$outDir/v$batchId")
          lastVersion = batchId
        }
        .option("checkpointLocation", s"$outDir/chk")
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    if (lastVersion < 0)
      aggFn(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), streamed.schema))
    else spark.read.parquet(s"$outDir/v$lastVersion")
  }

  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** tmpfs root for checkpoints with NO recovery value — harness runs
    * that delete their checkpoint at entry anyway (the memory-sink
    * queries; st13's per-run ingest). State-store and offset/commit-log
    * fsyncs against a disk-backed /tmp are most of a fixture-scale
    * micro-batch's wall-clock; the checkpoint PROTOCOL (offset log,
    * commit log, replay idempotence) is exercised identically on tmpfs.
    * Durability is kept where it has recovery value: the
    * production-sink runners (runToParquet / runMergeToParquet) keep
    * checkpoints next to their data, and batch-replay idempotence is
    * pinned directly by IncrementalIndexSpec's applied-ledger tests. */
  private[graft] def ephemeralChkRoot: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-chk"
    else sys.props("java.io.tmpdir") + "/graft-chk"
  }

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the materialized result. AvailableNow processes the whole
    * fixture then stops — batch-equivalent semantics, streaming plan.
    * Results are partitioning-independent; the session's batch shuffle
    * setting is restored afterwards (see [[stateParts]]). */
  def runToTable(spark: SparkSession, streamed: DataFrame, name: String,
                 outputMode: String, rocksdb: Boolean = false): DataFrame = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    // RocksDB is the production state backend for large state (spillable,
    // incremental checkpoints); results are provider-independent, so one
    // query (st2, the most state-heavy) runs on it to keep the path live.
    if (rocksdb) {
      spark.conf.set(provKey, RocksDB)
      // incremental (changelog) commits instead of a full SST snapshot
      // upload per batch — the production setting for frequent triggers
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
    }
    // Ephemeral checkpoint for an ephemeral sink: these harness queries
    // verify operator semantics into a MEMORY sink, so their checkpoint
    // has no recovery value — put it on tmpfs (state-store commits fsync
    // once per partition per batch, which on a disk-backed /tmp is most
    // of the wall-clock at fixture scale) and delete it afterwards. The
    // production-sink shapes (runToParquet / runMergeToParquet) keep
    // durable checkpoints next to their data.
    val ck = new java.io.File(
      s"$ephemeralChkRoot/$name-${java.util.UUID.randomUUID}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    try withStreamConfs(spark) {
      val q = streamed.writeStream
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.getAbsolutePath)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        q.recentProgress.foreach(p => System.err.println(
          s"[stream-debug] $name batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}"))
    } finally {
      if (rocksdb) prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
      rm(ck)
    }
    spark.table(name)
  }
}
