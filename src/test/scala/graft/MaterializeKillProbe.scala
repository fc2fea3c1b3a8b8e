package graft

import org.apache.spark.sql.SparkSession

/** A/B chaos probe for [[graft.queries.Shared.materialized]] under REAL
  * executor loss (local-cluster, SIGKILL of every executor JVM):
  *
  *   A — default localCheckpoint form: build sim9's memoized pool/sims,
  *       kill all executors, re-run sim9 in the same session. The
  *       checkpoint blocks died with their executors and the lineage is
  *       truncated, so this MUST fail — the documented cluster trap,
  *       reproduced for real rather than asserted in a comment.
  *   B — `graft.materialize.dir` form (the production shape): same
  *       sequence, but the memo is a written parquet table; the re-run
  *       after the kill must return rows identical to a fresh
  *       post-kill baseline.
  *
  * PASS = A throws on the post-kill re-run AND B's post-kill re-run is
  * row-identical to the baseline. Sessions are `newSession()` siblings
  * (Shared's memo keys by session, so each phase builds fresh).
  *
  * Run:   sbt -batch package Test/package
  *        SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *        java <add-opens flags> -cp "<spark-jars-glob>:<app.jar>:<tests.jar>" \
  *          graft.MaterializeKillProbe [sfDir]
  * (Transcript recorded in SCALE.md round-11 section.) */
object MaterializeKillProbe {

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

  private def waitForExecutors(n: Int): Seq[Int] = {
    var waited = 0
    while (executorPids().size < n && waited < 600) {
      Thread.sleep(100); waited += 1
    }
    val pids = executorPids()
    require(pids.size >= n, s"expected $n executor JVMs, saw $pids")
    pids
  }

  /** SIGKILL every live executor JVM; wait for the master to replace
    * them so the next phase runs on a healthy app. */
  private def killAllExecutors(expect: Int): Unit = {
    val victims = executorPids()
    victims.foreach(pid =>
      Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor())
    println(s"[probe] SIGKILLed ALL executors: $victims")
    var waited = 0
    while ((executorPids().toSet -- victims).size < expect && waited < 600) {
      Thread.sleep(100); waited += 1
    }
    println(s"[probe] replacements up: ${executorPids()}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val jars = sys.env.getOrElse("SPARK_GRAFT_JARS",
      "/root/repo/target/scala-2.13/datawarehouse_codespark_2.13-0.1.0.jar," +
        "/root/repo/target/scala-2.13/datawarehouse_codespark_2.13-0.1.0-tests.jar")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,4,4096]"))
      .config("spark.jars", jars)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    waitForExecutors(2)
    def sim9(s: SparkSession) =
      SparkEntry.queries("sim9_mmr_diversify")(s, sfDir)

    // ---- phase A: default localCheckpoint memo — must NOT survive ----
    val sA = spark.newSession()
    val preKill = sim9(sA).collect().map(_.toString).sorted.toSeq
    println(s"[probe] A: pre-kill sim9 rows=${preKill.size} (localCheckpoint memo built)")
    killAllExecutors(2)
    val aFailed =
      try { sim9(sA).collect(); false }
      catch { case e: Exception =>
        println(s"[probe] A: post-kill re-run FAILED as documented: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
        true
      }
    if (!aFailed)
      println("[probe] A: post-kill re-run unexpectedly succeeded " +
        "(blocks survived?) — trap not reproduced this run")

    // ---- phase B: graft.materialize.dir memo — must survive ----------
    val sB = spark.newSession()
    val mat = java.nio.file.Files.createTempDirectory("graft_mat_kill").toString
    sB.conf.set("graft.materialize.dir", mat)
    val preB = sim9(sB).collect().map(_.toString).sorted.toSeq
    println(s"[probe] B: pre-kill sim9 rows=${preB.size} (parquet memo at $mat)")
    killAllExecutors(2)
    val postB = sim9(sB).collect().map(_.toString).sorted.toSeq
    // fresh-session baseline on the healthy post-kill app
    val baseline = sim9(spark.newSession()).collect().map(_.toString).sorted.toSeq
    val same = postB == preB && postB == baseline
    println(s"[probe] B: post-kill rows=${postB.size} identical-to-pre=${postB == preB} " +
      s"identical-to-fresh-baseline=${postB == baseline}")

    spark.stop()
    if (aFailed && same)
      println("[probe] PASS: localCheckpoint trap reproduced under executor loss; " +
        "materialize.dir path served identical rows through it")
    else {
      println(s"[probe] FAIL: aFailed=$aFailed bIdentical=$same")
      sys.exit(1)
    }
  }
}
