package graft

import org.apache.spark.sql.SparkSession

/** Round-11 stretch ask (#7): kill a REAL executor JVM mid-flight
  * during st9's foreachBatch merge under local-cluster, and prove the
  * versioned-state result survives task retry bit-identically.
  *
  * st9's exactly-once story rests on (a) the parquet job committer —
  * tasks that died with their executor leave only uncommitted attempt
  * files, the retried tasks commit once — and (b) the merge being a
  * deterministic function of (previous version, batch). This probe
  * exercises (a) for real: a watcher thread waits for the first active
  * Spark job of the streaming run, SIGKILLs one
  * CoarseGrainedExecutorBackend process, the standalone master
  * replaces it, the lost tasks re-run, and the final state version
  * must equal a clean same-session rerun row-for-row.
  *
  * Run:   sbt -batch package Test/package
  *        SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *        java <add-opens flags> -cp "<spark-jars-glob>:<app.jar>:<tests.jar>" \
  *          graft.ClusterKillProbe [sfDir]
  * (Transcript recorded in SCALE.md round-11 section.) */
object ClusterKillProbe {

  /** pids of live executor JVMs (children launched by the standalone
    * worker inside this local-cluster app). */
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
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    // wait for both executors before starting, so the kill leaves one
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
      // fire the moment the streaming run's first job has active stages
      while (killed.isEmpty) {
        if (tracker.getActiveJobIds().nonEmpty) {
          val victim = executorPids().headOption
          victim.foreach { pid =>
            Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
            killed = Some(pid)
            println(s"[probe] SIGKILLed executor pid=$pid mid-job")
          }
        } else Thread.sleep(20)
      }
    })
    killer.setDaemon(true)
    killer.start()

    val t0 = System.nanoTime()
    val killedRun = SparkEntry.queries("st9_stream_upsert")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val t1 = (System.nanoTime() - t0) / 1e9
    killer.join(1000)
    println(f"[probe] killed-run finished in $t1%.1fs; " +
      s"killed=${killed.getOrElse("NOTHING — probe vacuous, rerun")}")
    require(killed.nonEmpty, "no executor was killed; probe is vacuous")
    println(s"[probe] executors now: pids=${executorPids()} " +
      "(master replaced the dead one)")

    // clean rerun in the same session (state dir is cleared per run)
    val clean = SparkEntry.queries("st9_stream_upsert")(spark, sfDir)
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
    println("[probe] PASS: st9 versioned-state merge survived executor loss")
  }
}
