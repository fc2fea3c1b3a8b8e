package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the s7 write-regression adjudication (round-9
  * verdict ask #2): decomposes s7_partitioned_fact_sink into build /
  * exchange+sort / write / read-back and reports bytes+files written.
  * Not part of the battery; deleted or kept as a tools-style probe. */
object ProbeS7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm like Bench does
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
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
            "quantity", "price").count()
      }
    }
    val files = new java.io.File(out).listFiles()
    val parts = Option(files).getOrElse(Array.empty).filter(_.isDirectory)
    val all = parts.flatMap(_.listFiles())
    println(s"[probe] partition dirs=${parts.length} files=${all.count(_.getName.endsWith(".parquet"))} " +
      s"bytes=${all.map(_.length).sum}")
    spark.stop()
  }
}
