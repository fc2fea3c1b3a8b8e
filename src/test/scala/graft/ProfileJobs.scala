package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLAdaptiveExecutionUpdate, SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

/** Job-level profiler for one declared query — measurement harness for
  * the r20 optimization round (guide §1: measure first). Attaches a
  * SparkListener, runs the named query once, and prints every Spark
  * job's wall duration with its callSite, so the fixed-latency tiny
  * jobs (manifest collects, ledger checks, probe aggregates, small
  * table writes) become countable instead of argued about.
  *
  * r20 second pass: jobs are ALSO attributed to their SQL EXECUTION
  * (the unit of one DataFrame action — a feed materialization, a
  * segment write, a probe aggregate), because most of a maintenance
  * batch's jobs are AQE stage jobs whose callSite is an anonymous
  * future: per-execution wall + summed job time + the execution's own
  * callsite make "which materialization costs what" readable.
  *
  * Run: java <add-opens> -cp "SPARK_JARS:APP:TESTS" graft.ProfileJobs \
  *        o18_join_maintain /root/testdata/sf0.1
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("o18_join_maintain")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("PROFILE_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session like Bench does, so JIT/codegen doesn't swamp
    // the profile
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Long)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    // execId -> (description/callsite, startNanos-ish wall bounds, job time sum, job count)
    final class Exec(val site: String) {
      val t0 = System.nanoTime()
      @volatile var t1: Long = -1L
      @volatile var plan: String = ""
      val jobMs = new java.util.concurrent.atomic.AtomicLong(0)
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    }
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, Exec]()
    val execOrder = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          .takeWhile(_ != '\n')
        val execId = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(_.toLongOption).getOrElse(-1L)
        starts.put(js.jobId, (System.nanoTime(), site, execId))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site, execId) =>
          val ms = (System.nanoTime() - t0) / 1e6
          Option(execs.get(execId)).foreach { e =>
            e.jobMs.addAndGet(ms.toLong); e.jobs.incrementAndGet() }
          lines.add((je.time, f"job ${je.jobId}%4d ${ms}%8.1f ms exec=$execId%-4d $site"))
        }
      }
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case s: SparkListenerSQLExecutionStart =>
          // description = the action's callsite ("collect at Foo.scala:12")
          val e = new Exec(s.description.takeWhile(_ != '\n'))
          e.plan = s.physicalPlanDescription
          execs.put(s.executionId, e)
          execOrder.add(s.executionId)
        case u: SparkListenerSQLAdaptiveExecutionUpdate =>
          // keep the LATEST adaptive plan — the final one is what ran
          Option(execs.get(u.executionId)).foreach(_.plan = u.physicalPlanDescription)
        case e: SparkListenerSQLExecutionEnd =>
          Option(execs.get(e.executionId)).foreach(_.t1 = System.nanoTime())
        case _ =>
      }
    })
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    import scala.jdk.CollectionConverters._
    val all = lines.asScala.toSeq.sortBy(_._1)
    all.foreach(l => println(l._2))
    val byMs = all.map(_._2)
    println(f"== $name rows=$n total=${total}%.2f s jobs=${byMs.size}")
    // histogram of job costs
    val durs = all.map(_._2.split("\\s+")(2).toDouble)
    def bucket(d: Double): String =
      if (d < 50) "<50ms" else if (d < 150) "50-150ms"
      else if (d < 400) "150-400ms" else if (d < 1000) "0.4-1s" else ">=1s"
    durs.groupBy(bucket).toSeq.sortBy(_._2.map(-_).sum).foreach { case (b, ds) =>
      println(f"   $b%10s  n=${ds.size}%4d  sum=${ds.sum / 1000}%.2f s")
    }
    // per-execution table: wall (start->end), summed job ms, job count
    println(s"== executions (${execOrder.size}) — wall / jobSum / jobs / callsite")
    execOrder.asScala.toSeq.foreach { id =>
      val e = execs.get(id)
      val wall = (if (e.t1 > 0) e.t1 - e.t0 else -1L) / 1e9
      println(f"exec $id%4d  wall=${wall}%7.2f s  jobSum=${e.jobMs.get / 1000.0}%7.2f s  jobs=${e.jobs.get}%3d  ${e.site}")
    }
    // PROFILE_DUMP_PLANS=dir: write each execution's final adaptive
    // plan to <dir>/exec<NNN>.txt for operator-level inspection
    sys.env.get("PROFILE_DUMP_PLANS").foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      execOrder.asScala.toSeq.foreach { id =>
        val e = execs.get(id)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(f"$dir/exec$id%03d.txt"),
          s"callsite: ${e.site}\njobs=${e.jobs.get} jobSumMs=${e.jobMs.get}\n\n${e.plan}")
      }
    }
    // and aggregated by callsite
    println("== executions aggregated by callsite")
    execOrder.asScala.toSeq.map(execs.get).groupBy(_.site).toSeq
      .map { case (site, es) =>
        val wall = es.map(e => (if (e.t1 > 0) e.t1 - e.t0 else 0L) / 1e9).sum
        (wall, es.map(_.jobMs.get).sum / 1000.0, es.size, site)
      }.sortBy(-_._1).foreach { case (wall, js, n0, site) =>
        println(f"  wallSum=${wall}%7.2f s jobSum=${js}%7.2f s n=$n0%3d  $site")
      }
    spark.stop()
  }
}
