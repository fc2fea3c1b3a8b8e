package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profiler for one declared query — measurement harness for
  * the r20 optimization round (guide §1: measure first). Attaches a
  * SparkListener, runs the named query once, and prints every Spark
  * job's wall duration with its callSite, so the fixed-latency tiny
  * jobs (manifest collects, ledger checks, probe aggregates, small
  * table writes) become countable instead of argued about.
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

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          .takeWhile(_ != '\n')
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add((je.time, f"job ${je.jobId}%4d ${ms}%8.1f ms  $site"))
        }
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
    spark.stop()
  }
}
