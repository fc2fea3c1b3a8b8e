package graft

import org.apache.spark.sql.SparkSession

/** Executor-loss probe for st13's streaming index ingest under
  * local-cluster: SIGKILL one executor JVM the moment the ingest's
  * first job goes active, let the standalone master replace it and the
  * lost tasks retry, and require the final served ranking to equal a
  * clean same-session rerun row-for-row.
  *
  * What this exercises that ClusterKillProbe (st9) does not: the
  * ingest's work is a CHAIN of corpus writes — the v0 publish, each
  * micro-batch's segment parquet write, and each version's manifest
  * publish — so a task lost mid-segment-write must leave only
  * uncommitted attempt files (parquet job committer), and the pointer
  * commit must never expose a half-written version. Encode
  * determinism (codes are a pure function of (model, row)) then makes
  * the retried tasks byte-compatible with the lost ones.
  *
  * Run:   sbt -batch package Test/package
  *        SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *        java <add-opens flags> -cp "<spark-jars-glob>:<app.jar>:<tests.jar>" \
  *          graft.IngestKillProbe [sfDir]
  * (Transcript recorded in SCALE.md round-11 section.) */
object IngestKillProbe {

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
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
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

    var waited = 0
    while (executorPids().size < 2 && waited < 600) {
      Thread.sleep(100); waited += 1
    }
    val before = executorPids()
    println(s"[probe] executors up: pids=$before")
    require(before.size >= 2, s"expected 2 executor JVMs, saw $before")

    @volatile var killed: Option[Int] = None
    val killer = new Thread(() => {
      val tracker = spark.sparkContext.statusTracker
      while (killed.isEmpty) {
        if (tracker.getActiveJobIds().nonEmpty) {
          executorPids().headOption.foreach { pid =>
            Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
            killed = Some(pid)
            println(s"[probe] SIGKILLed executor pid=$pid mid-ingest")
          }
        } else Thread.sleep(20)
      }
    })
    killer.setDaemon(true)
    killer.start()

    val t0 = System.nanoTime()
    val killedRun = SparkEntry.queries("st13_stream_index_ingest")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val t1 = (System.nanoTime() - t0) / 1e9
    killer.join(1000)
    println(f"[probe] killed-run finished in $t1%.1fs; " +
      s"killed=${killed.getOrElse("NOTHING — probe vacuous, rerun")}")
    require(killed.nonEmpty, "no executor was killed; probe is vacuous")
    println(s"[probe] executors now: pids=${executorPids()} " +
      "(master replaced the dead one)")

    val clean = SparkEntry.queries("st13_stream_index_ingest")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val same = killedRun == clean
    println(s"[probe] rows killed-run=${killedRun.size} clean=${clean.size} " +
      s"identical=$same")
    if (!same) {
      killedRun.diff(clean).take(5).foreach(r => println(s"[probe]   only-killed: $r"))
      clean.diff(killedRun).take(5).foreach(r => println(s"[probe]   only-clean:  $r"))
    }
    spark.stop()
    if (!same) sys.exit(1)
    println("[probe] PASS: streamed index ingest survived executor loss; " +
      "served ranking identical to the clean run")
  }
}
