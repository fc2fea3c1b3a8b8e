package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,8,4096] runs the battery with
    // REAL executor JVMs (task closures serialized across process
    // boundaries — the thing local[*] never exercises). Requires
    // SPARK_HOME=/opt/spark in the env and the packaged app jar in
    // SPARK_GRAFT_JARS so the workers can load graft classes.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    var builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach { j =>
      builder = builder.config("spark.jars", j)
    }
    // SPARK_GRAFT_CONF="k=v;k=v" — extra session confs for rehearsals
    // (e.g. spark.sql.autoBroadcastJoinThreshold=-1 to force the SMJ
    // fallbacks the plan guard normally forbids, memory knobs for the
    // constrained-memory spill rehearsal). The driver leaves it unset.
    builder = SessionConf.applyEnv(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SPILL_REPORT=1 — sum task-level spill counters across
    // the whole battery and print one [spill] line at the end: the
    // constrained-memory rehearsal's evidence that spill paths actually
    // engaged (and results still hash-matched).
    val spillTotals =
      if (!sys.env.contains("SPARK_GRAFT_SPILL_REPORT")) None
      else {
        val mem = new java.util.concurrent.atomic.AtomicLong
        val disk = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              val m = t.taskMetrics
              if (m != null) {
                mem.addAndGet(m.memoryBytesSpilled)
                disk.addAndGet(m.diskBytesSpilled): Unit
              }
            }
          })
        Some((mem, disk))
      }
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=name1,name2 restricts the dump for local iteration
    // (tools/check.py passes the same names); the driver leaves it unset.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Manifest of the SELECTED query names, written BEFORE the battery:
    // the gate's "did every query produce output" check needs the
    // attempted set, not just the keys that happen to have oracles —
    // without it, a crashed rows-only query (no oracle entry, no output
    // dir) disappears silently. Written up front so even a hard-killed
    // run (OOM, driver timeout) leaves the attempted-set record behind.
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spillTotals.foreach { case (mem, disk) =>
      // "[verify]" prefix so tools/check.py's stderr filter surfaces it
      System.err.println(
        s"[verify] spill: memoryBytesSpilled=${mem.get} diskBytesSpilled=${disk.get}")
    }
    spark.stop()
  }
}
