package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.AtomicPublish
import graft.ops.{AnnIndexStore, VectorSearch}

/** Executor-loss probe for [[graft.ops.AnnIndexStore.compactSegments]]
  * under local-cluster — the one publish path without SIGKILL coverage
  * (st9/st13/sim9 have theirs). SIGKILL one executor JVM the moment the
  * compaction's first job goes active; the claim protocol must leave
  * EITHER the old manifest or the new one — never a half-swap — with
  * the served ranking bit-identical either way, and a crashed attempt's
  * orphans (segment dir, tx dir, unswapped claim) reclaimable by the
  * age-guarded vacuum + vacuumSegments, after which a retry converges.
  *
  * The corpus is synthesized distributed-side (an expression-generated
  * deterministic vector per id — no driver-side row building), sized so
  * the merge has a real multi-task window to kill into.
  *
  * Run:   sbt -batch package Test/package
  *        SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *        java <add-opens flags> -cp "<spark-jars-glob>:<app.jar>:<tests.jar>" \
  *          graft.CompactionKillProbe
  * (Transcript recorded in SCALE.md round-13 section.) */
object CompactionKillProbe {

  private val N = 400000L
  private val DIM = 64

  private def executorPids(): Seq[Int] = {
    val proc = new java.io.File("/proc")
    Option(proc.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => f.getName.toIntOption)
      .filter { pid =>
        val cl = new java.io.File(s"/proc/$pid/cmdline")
        cl.exists && {
          try new String(java.nio.file.Files.readAllBytes(cl.toPath))
            .contains("CoarseGrainedExecutorBackend")
          catch { case _: Exception => false }
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val jars = sys.env.getOrElse("SPARK_GRAFT_JARS",
      "/root/repo/target/scala-2.13/datawarehouse_codespark_2.13-0.1.0.jar," +
        "/root/repo/target/scala-2.13/datawarehouse_codespark_2.13-0.1.0-tests.jar")
    // SPARK_GRAFT_PROBE_MAXFAIL=1 biases toward the FAILURE branch
    // (fewer task retries before the job aborts) — though executor-lost
    // task failures may not count against the limit, so Spark can still
    // absorb the kill; both probe branches assert the invariant either
    // way, and the crash path is pinned deterministically in
    // AtomicPublishSpec's crashed-claim test.
    val maxFail = sys.env.getOrElse("SPARK_GRAFT_PROBE_MAXFAIL", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,4,4096]"))
      .config("spark.jars", jars)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.task.maxFailures", maxFail)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var waited = 0
    while (executorPids().size < 2 && waited < 600) {
      Thread.sleep(100); waited += 1
    }
    require(executorPids().size >= 2,
      s"expected 2 executor JVMs, saw ${executorPids()}")
    println(s"[probe] executors up: pids=${executorPids()}")

    // deterministic distributed corpus: vector j-th lane = f(id, j)
    val corpus = spark.range(0, N, 1, 16).select(col("id").as("vec_id"),
      expr(s"transform(sequence(1, $DIM), " +
        "j -> cast(sin(id * j * 0.003 + j * j * 0.37) as float))")
        .as("embedding"))
    val queries = corpus.filter(col("vec_id") < 10)
    val ivf = VectorSearch.ivfTrain(spark,
      corpus.filter(col("vec_id") < 4000), "vec_id", "embedding", 8, 2)
    val model = VectorSearch.ivfPqTrain(spark, ivf,
      corpus.filter(col("vec_id") >= 40 && col("vec_id") < 72),
      "vec_id", "embedding", nSub = 16)

    val root = s"/root/repo/target/probe/compact-kill-${java.util.UUID.randomUUID}"
    def slice(i: Long) = corpus
      .filter(col("vec_id") >= i * N / 3 && col("vec_id") < (i + 1) * N / 3)
    AnnIndexStore.publish(spark, root, model,
      VectorSearch.ivfPqEncode(model, slice(0), "vec_id", "embedding"))
    AnnIndexStore.appendEncode(spark, root, slice(1), "vec_id", "embedding")
    val vPre = AnnIndexStore.appendEncode(spark, root, slice(2),
      "vec_id", "embedding")
    def served(): Seq[String] =
      AnnIndexStore.serve(spark, root, queries, "vec_id", "embedding",
        k = 10, nprobe = 3).collect().map(_.toString).sorted.toSeq
    val before = served()
    println(s"[probe] index built: version=$vPre, " +
      s"segments=${new java.io.File(s"$root/seg").list().length}, " +
      s"served rows=${before.size}")

    @volatile var killed: Option[Int] = None
    val killer = new Thread(() => {
      val tracker = spark.sparkContext.statusTracker
      while (killed.isEmpty) {
        if (tracker.getActiveJobIds().nonEmpty) {
          executorPids().headOption.foreach { pid =>
            Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
            killed = Some(pid)
            println(s"[probe] SIGKILLed executor pid=$pid mid-compaction")
          }
        } else Thread.sleep(10)
      }
    })
    killer.setDaemon(true)
    killer.start()

    val outcome: Either[Throwable, Long] =
      try Right(AnnIndexStore.compactSegments(spark, root,
        targetBytes = 1L << 30))
      catch { case e: Throwable => Left(e) }
    killer.join(1000)
    require(killed.nonEmpty, "no executor was killed; probe is vacuous")

    val cur = AtomicPublish.currentVersion(spark, root).get
    outcome match {
      case Right(v) =>
        println(s"[probe] compaction SURVIVED the kill (task retry): " +
          s"returned v$v, pointer reads v$cur")
        require(v == vPre + 1 && cur == v,
          s"half-swap: returned $v, pointer $cur, pre $vPre")
      case Left(e) =>
        println(s"[probe] compaction FAILED on the kill " +
          s"(${e.getClass.getSimpleName}): pointer reads v$cur")
        require(cur == vPre,
          s"half-swap: compaction failed but pointer moved $vPre -> $cur")
    }
    val after = served()
    println(s"[probe] served ranking identical after kill: ${after == before}")
    require(after == before, "served ranking changed across the kill")

    // reclaim whatever the crash orphaned (loser tx dirs, an unswapped
    // claim, an unreferenced merged segment), then require convergence
    AtomicPublish.vacuum(spark, root, keep = 1000, minAgeMs = 0)
    val orphans = AnnIndexStore.vacuumSegments(spark, root, minAgeMs = 0)
    println(s"[probe] vacuum reclaimed ${orphans.size} orphan segment dir(s)")
    val vFinal =
      if (outcome.isLeft)
        AnnIndexStore.compactSegments(spark, root, targetBytes = 1L << 30)
      else cur
    val segsLeft = AtomicPublish.snapshotAt(spark, root, vFinal)
      .table(spark, "ann_manifest").filter(col("kind") === "seg").count()
    val end = served()
    println(s"[probe] retry/converged at v$vFinal with $segsLeft segment(s); " +
      s"served identical=${end == before}")
    require(end == before, "post-recovery serve diverged")
    spark.stop()
    println("[probe] PASS: compaction under executor SIGKILL left old-or-new " +
      "manifest (never a half-swap), orphans vacuumed, retry converged, " +
      "served ranking bit-identical throughout")
  }
}
