package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,16,...] benches with REAL
    // executor JVMs (same contract as Verify) — pair it with
    // SPARK_GRAFT_JARS so the workers can load graft classes.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    var builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach { j =>
      builder = builder.config("spark.jars", j)
    }
    // SPARK_GRAFT_CONF="k=v;k=v" — extra session confs for rehearsal
    // benches (same contract as Verify). The driver leaves it unset.
    builder = SessionConf.applyEnv(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val benchStart = System.nanoTime()
    // Warm up the JVM/session (codegen, parquet reader, shuffle paths)
    // so the first timed query doesn't absorb one-time init cost.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    // Same policy for the streaming engine: the first stateful stream in
    // the battery otherwise absorbs the one-time class-load/JIT of the
    // micro-batch engine, state-store providers and memory sink (~1 s
    // measured at sf0.1) — session setup, not query work. One tiny
    // windowed agg warms the default (HDFS-backed) provider, one keyed
    // dedup over a filtered-down stream warms RocksDB (st2 runs on it).
    locally {
      import org.apache.spark.sql.functions._
      import graft.streaming.Streams
      val ev = Streams.events(spark, sfDir)
      Streams.runToTable(spark,
        ev.withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour")).count(),
        "bench_warm_agg", "complete").count()
      Streams.runToTable(spark,
        ev.filter(col("event_id") % 97 === 0)
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .select("event_id"),
        "bench_warm_dedup", "append", rocksdb = true).count()
    }
    // Contention calibration (round-10 verdict ask #2): a FIXED,
    // data-independent CPU+shuffle kernel (64M-row range → mod-key
    // aggregate over 32 partitions) timed immediately before and after
    // the battery, shipped in both JSON artifacts. On an idle host the
    // two readings sit in a tight band (the kernel touches no files, so
    // only scheduler/CPU pressure moves it); a contended run shows
    // inflated and/or divergent readings — making host contention
    // adjudicable from the round's own artifact instead of forensic
    // re-runs (r7 i1, r8 s7, r9 s8 all burned builder time on this).
    // One untimed pass first so the reading measures load, not JIT.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 64L * 1000 * 1000, 1, 32)
        .selectExpr("id % 9973 AS k", "id")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("id")).count()
      (System.nanoTime() - t0) / 1e9
    }
    calibOnce()
    val calibBefore = math.min(calibOnce(), calibOnce())
    // IO-side calibration (round-19 verdict ask #1): the CPU kernel is
    // provably blind to the dominant noise on this host — r19's run 4
    // read CLEAN (0.60→0.45) while the same jar walked to 1.23× the pin
    // under external IO load. This kernel touches the thing the battery
    // actually contends on: the fixture/sink VOLUME. 256 MiB sequential
    // write in 8 MiB chunks with an fsync every 64 MiB (four queue-depth
    // samples — fsync latency is where an external writer shows up),
    // then a full read-back, driver-side JVM IO so Spark scheduling
    // can't launder the reading. The file lands next to the battery's
    // own sinks (target/), i.e. the same device the stores commit to.
    // Same protocol as the CPU kernel: one untimed warm pass, then
    // min-of-two, before and after the battery, shipped in both JSON
    // artifacts. PIN RULE (SCALE.md): a run is pinnable only when BOTH
    // kernels read idle-band before AND after — CPU ≲ 0.9 s, IO within
    // ~1.5× its own quiet floor — otherwise re-run later.
    val ioProbePath = java.nio.file.Paths.get(
      sys.props("user.dir"), "target", "bench_io_probe.bin")
    def ioCalibOnce(): Double = {
      import java.nio.file.StandardOpenOption._
      val chunk = new Array[Byte](8 * 1024 * 1024)
      java.util.Arrays.fill(chunk, 0x5a.toByte)
      val t0 = System.nanoTime()
      val wch = java.nio.channels.FileChannel.open(
        ioProbePath, CREATE, WRITE, TRUNCATE_EXISTING)
      try {
        var i = 0
        while (i < 32) { // 32 × 8 MiB = 256 MiB
          val buf = java.nio.ByteBuffer.wrap(chunk)
          while (buf.hasRemaining) wch.write(buf)
          if ((i & 7) == 7) wch.force(false)
          i += 1
        }
      } finally wch.close()
      val rch = java.nio.channels.FileChannel.open(ioProbePath, READ)
      try {
        val buf = java.nio.ByteBuffer.allocate(8 * 1024 * 1024)
        while (rch.read(buf) > 0) buf.clear()
      } finally rch.close()
      (System.nanoTime() - t0) / 1e9
    }
    def ioCalib(): Double =
      try {
        val v = math.min(ioCalibOnce(), ioCalibOnce())
        java.nio.file.Files.deleteIfExists(ioProbePath)
        v
      } catch { case e: Throwable =>
        System.err.println(s"[bench] io calib failed: ${e.getMessage}"); -1.0
      }
    ioCalibOnce() // warm (file allocation, JIT)
    val ioCalibBefore = ioCalib()
    // Optional comma-separated query-name filter for local iteration
    // (e.g. SPARK_GRAFT_ONLY=px2_cluster_curation,dd7_cluster_dedup);
    // unset = the full inventory, which is what the driver runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // Deterministic run order (sorted by name): `queries` is a hash Map,
    // so iterating it directly runs the battery in an order that
    // RESHUFFLES whenever any query is added or renamed — round 6 proved
    // per-query times are strongly order-sensitive (write-heavy
    // neighbors bleed page-cache/IO into the next query: px2 measured
    // 17.7 s in the r6 hash order vs 3.3 s standalone, j7 7.0 vs 2.6,
    // with zero code change). Sorted order makes every round's timing
    // comparable to the last at the per-query level.
    // A failed query reports -1.0 (never its partial elapsed time), so a
    // crash can't masquerade as a fast success in the emitted JSON.
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    // SPARK_GRAFT_RETRY=<seconds>: on failure, pause and retry the query
    // ONCE. For memory-density rehearsals under local-cluster — an
    // executor OOM (exit 52) kills the whole worker JVM, and every query
    // submitted during the ~10 s replacement-registration window dies
    // with RejectedExecutionException, so one real OOM used to poison
    // the next ~10 entries of a sweep. A paused retry separates the
    // deterministic failures (still fail) from the collateral (pass on
    // the retry). Unset (the driver's mode) = fail immediately, so the
    // committed artifacts never hide a flap behind a retry.
    val retryPause = sys.env.get("SPARK_GRAFT_RETRY")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).filter(_ > 0)
    // One timed run = (total_s, seed_s, batch_s): PhaseClock is reset
    // per run and accumulates wall-clock inside the maintained-store
    // seed/commit primitives, so every LIFECYCLE query's price splits
    // into one-time seed + steady-state per-batch maintenance + serve
    // (= total − seed − batch) — the decomposition the 100 TB operator
    // prices (a gate rehearses seed + k batches + serve in ONE entry;
    // production pays the batch slice per commit and the seed never).
    // Non-lifecycle queries never enter the primitives and read 0/0.
    // `stores` = PhaseClock's per-root attribution of the seed+batch
    // time (labels record even when the global bracket suppresses a
    // nested/concurrent member, so concurrent members can sum past the
    // wall-clock split — that is the attribution, not a bug);
    // `suppressed` > the store count of a serial gate means two
    // top-level primitives overlapped and the split undercounts
    // (PhaseClock's per-JVM-sequential assumption, now observable).
    final case class Timing(total: Double, seed: Double, batch: Double,
                            stores: Map[String, Double] = Map.empty,
                            suppressed: Int = 0)
    val failed = Timing(-1.0, 0.0, 0.0)
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                pass: String): Timing = {
      def once(tag: String): Timing = {
        PhaseClock.reset()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed ($tag): ${e.getMessage}")
            false
        }
        val sec = (System.nanoTime() - t0) / 1e9
        if (debug) System.err.println(
          f"[bench-debug] +${(System.nanoTime() - benchStart) / 1e9}%.1fs [$tag] $name%-28s ${sec}%.2fs")
        if (ok) Timing(sec, PhaseClock.seedSeconds, PhaseClock.batchSeconds,
          PhaseClock.labeledSeconds, PhaseClock.suppressedBrackets)
        else failed
      }
      val first = once(pass)
      if (first.total >= 0 || retryPause.isEmpty) first
      else {
        Thread.sleep(retryPause.get * 1000L)
        once(s"$pass-retry")
      }
    }
    val ordered = selected.toSeq.sortBy(_._1)
    val firstPass = ordered.map { case (name, fn) =>
      name -> timeOne(name, fn, "first") }.toMap
    val results = firstPass.map { case (n, t) => n -> t.total }
    // Second WARM pass, same order: the headline `total` stays the
    // first-pass sum (comparable round-over-round, can't be gamed by
    // warming), but BENCH_FULL.json also carries min2 = min(first, warm)
    // per query so a driver-host contention spike (r7: i1 measured
    // 15.2 s under contention vs 0.29 s same-code committed) is
    // adjudicable from the round's own artifact instead of forensic
    // standalone re-runs. min2 is the plan-cost signal; first is the
    // comparability signal. Skipped under SPARK_GRAFT_ONE_PASS=1 for
    // quick local iteration and for already-failed queries.
    val onePass = sys.env.contains("SPARK_GRAFT_ONE_PASS")
    // best = the pass that produced min2 (its phase split is the one
    // reported: min2 is the plan-cost signal, so its decomposition is
    // the plan-cost decomposition)
    val best = ordered.map { case (name, fn) =>
      val first = firstPass(name)
      val warm = if (onePass || first.total < 0) failed
                 else timeOne(name, fn, "warm")
      name -> (if (first.total < 0) failed
               else if (warm.total < 0) first
               else if (warm.total < first.total) warm else first)
    }.toMap
    val min2 = best.map { case (n, t) => n -> t.total }
    val calibAfter = math.min(calibOnce(), calibOnce())
    val ioCalibAfter = ioCalib()
    def fmt(v: Double, d: Int): String =
      s"%.${d}f".formatLocal(java.util.Locale.ROOT, v)
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sfTag = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val calibJson = s""""calib_before_s":${fmt(calibBefore, 2)},"calib_after_s":${fmt(calibAfter, 2)},"io_calib_before_s":${fmt(ioCalibBefore, 2)},"io_calib_after_s":${fmt(ioCalibAfter, 2)}"""
    // The driver captures only the last 2000 chars of stdout (confirmed by
    // BENCH_r01..r04: tail length is exactly 2000 and every full-inventory
    // line overflowed it → "parsed": null). sbt appends its own
    // "[success] Total time: ..." line (~80 chars) after ours, so the JSON
    // line itself must stay ≤ ~1800 chars. Strategy: per-query times are
    // reported slowest-first and greedily packed into a fixed byte budget;
    // the complete map is written to BENCH_FULL.json for the judge.
    val totalMin2 = if (min2.nonEmpty) min2.values.sum else 0.0
    // seed/batch only where nonzero (lifecycle queries) — the split of
    // the min2 pass; "serve" is min2 − seed − batch, derivable
    // store labels are the full roots; strip the repo-local sink prefix
    // for the artifact (stable across rounds, keeps the map readable)
    def shortRoot(r: String): String = {
      val marker = "/target/sink/"
      val i = r.indexOf(marker)
      if (i >= 0) r.substring(i + marker.length) else r
    }
    val fullJson = results.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        val b = best(k)
        val phases = if (b.seed > 0 || b.batch > 0) {
          val stores = if (b.stores.isEmpty) ""
            else b.stores.toSeq.map { case (r, s) => shortRoot(r) -> s }
              .sortBy(-_._2)
              .map { case (r, s) => "\"" + r + "\":" + fmt(s, 2) }
              .mkString(",\"stores\":{", ",", "}")
          val sup = if (b.suppressed > 0) ",\"suppressed\":" + b.suppressed else ""
          ",\"seed\":" + fmt(b.seed, 2) + ",\"batch\":" + fmt(b.batch, 2) +
            stores + sup
        } else ""
        s"\"" + k + "\":{\"first\":" + fmt(v, 2) + ",\"min2\":" + fmt(min2(k), 2) + phases + "}" }
      .mkString(
        s"""{"metric":"total","value":${fmt(total, 2)},"total_min2":${fmt(totalMin2, 2)},$calibJson,"unit":"sec","sf":"$sfTag","nq":${results.size},"queries":{""",
        ",", "}}")
    // resolved against the launch directory (sbt runs from the repo root),
    // not a hardcoded checkout path; only the complete inventory is dumped
    // so a filtered local run can't clobber the judge-facing full map
    if (only.isEmpty) try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_FULL.json"),
        fullJson.getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] full dump failed: ${e.getMessage}") }
    val byTimeDesc = results.toSeq.sortBy { case (_, v) => -v }
    val qBudget = 1500 // bytes for the queries map body; ~88 entries at 1 decimal
    val sb = new StringBuilder
    var kept = 0
    byTimeDesc.foreach { case (k, v) =>
      val piece = "\"" + k + "\":" + fmt(v, 1)
      if (sb.length + piece.length + 1 <= qBudget) {
        if (kept > 0) sb.append(',')
        sb.append(piece); kept += 1
      }
    }
    println(s"""{"metric":"total","value":${fmt(total, 2)},$calibJson,"unit":"sec","queries":{$sb},"sf":"$sfTag","nq":${results.size},"reported":$kept}""")
    spark.stop()
  }
}
