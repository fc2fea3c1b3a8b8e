package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-path adjudication probe (round-9 verdict asks #1/#5): the
  * generalization of the round-9 ProbeS7 into a decomposition of BOTH
  * partitioned-sink shapes, living in `src/test` so the production jar
  * and its LoC diagnostic carry only engine code.
  *
  * Why this exists: `Bench`'s min2 (min of first+warm pass) is blind
  * for WRITE queries — both passes pay the full parquet encode+commit,
  * so a host-contention spike on a sink query is indistinguishable
  * from a plan regression in the battery artifact alone. This probe
  * splits each sink into its phases and reports bytes/files, so a
  * regressed total can be attributed to a specific phase (or to the
  * host, when every phase inflates uniformly).
  *
  * Decompositions:
  *  - s8_full_refresh_sink: cube build (join chain, uncached) /
  *    cube materialize into the session cache (the Shared.cube state
  *    the battery runs with) / overwrite-write from cache ×3 /
  *    read-back aggregate; bytes+files of the output.
  *  - s7_partitioned_fact_sink: fact build / (year, salt) exchange +
  *    sort / partitionBy(year) write ×{salt 1,2,4} / pruned read-back;
  *    bytes+files+partition-dirs (the round-9 ProbeS7 sweep).
  *
  * Usage: sbt "Test/runMain graft.WriteProbe [s7|s8|all]"
  *        (SPARK_GRAFT_SF_DIR selects the fixture, default sf0.1) */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm like Bench does so phase 1 doesn't absorb session init
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()

    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-32s $s%.2fs"); s
    }
    def sizeOf(out: String): Unit = {
      def walk(f: java.io.File): Array[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).flatMap(walk)
        else Array(f)
      val all = walk(new java.io.File(out))
      val pq = all.filter(_.getName.endsWith(".parquet"))
      println(s"[probe] output: files=${pq.length} bytes=${pq.map(_.length).sum}")
    }

    if (which == "s8" || which == "all") {
      println(s"=== s8_full_refresh_sink decomposition ($sfDir) ===")
      val out = "/root/repo/target/sink/probe_s8"
      val cubeUncached = graft.etl.StarSchema.build(spark, sfDir).cube
      t("cube build+count (uncached)") { cubeUncached.count(): Unit }
      // the battery's actual input: the session-shared persisted cube
      val cube = graft.queries.Shared.cube(spark, sfDir)
      t("cube materialize (persist)") { cube.count(): Unit }
      for (round <- 1 to 3)
        t(s"overwrite write from cache #$round") {
          cube.write.mode("overwrite").parquet(out)
        }
      t("read-back groupBy aggregate") {
        spark.read.parquet(out).groupBy("category")
          .agg(count(lit(1)).as("n"), graft.queries.Det.dsum(col("price")).as("total_price"))
          .orderBy("category").count(): Unit
      }
      sizeOf(out)
    }

    if (which == "s7" || which == "all") {
      println(s"=== s7_partitioned_fact_sink decomposition ($sfDir) ===")
      val out = "/root/repo/target/sink/probe_s7"
      for (round <- 1 to 3; salt <- Seq(1, 2, 4)) {
        println(s"--- round $round salt $salt ---")
        val fact = graft.etl.StarSchema.fact(
          graft.etl.StarSchema.factInput(Tables.lineitem(spark, sfDir)),
          Tables.orders(spark, sfDir), Tables.customer(spark, sfDir))
        val shaped = fact
          .repartition(32, col("year"), pmod(col("id"), lit(salt)))
          .sortWithinPartitions("year", "id")
        t(s"write salt=$salt") {
          shaped.write.mode("overwrite").partitionBy("year").parquet(out)
        }
        t("read-back + orderBy") {
          val back = spark.read.parquet(out).filter(col("year") === 1997)
          back.select(col("id"), col("product_id"), col("client_id"), col("date_id"),
              col("country_id"), col("quantity"), col("price"),
              col("year").cast("long").as("year"))
            .orderBy("id", "product_id", "client_id", "date_id", "country_id",
              "quantity", "price").count(): Unit
        }
      }
      val parts = Option(new java.io.File(out).listFiles())
        .getOrElse(Array.empty).filter(_.isDirectory)
      val all = parts.flatMap(_.listFiles())
      println(s"[probe] partition dirs=${parts.length} " +
        s"files=${all.count(_.getName.endsWith(".parquet"))} bytes=${all.map(_.length).sum}")
    }
    spark.stop()
  }
}
