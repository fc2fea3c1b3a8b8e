package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the fixture star schema (FIXTURES.md).
  *
  * Replaces the reference's `SELECT * FROM transportation.{t}` full-table
  * extraction (/root/reference/warehouse.py:31-38) with parquet scans that
  * Catalyst can column-prune and filter-push — the reference always
  * materializes every column of every row into client memory
  * (warehouse.py:37); here the scan only reads what downstream plans need.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** Collision-free, identifier-safe tag for per-fixture sink paths and
    * table names: sanitized path tail + 8 hex chars of md5. (Replaces
    * math.abs(hashCode), which could collide across dirs and went
    * negative at Int.MinValue.) */
  def dirSlug(dir: String): String = {
    val tail = dir.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+|_+$", "").takeRight(24)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
    val hex = md5.take(4).map("%02x".format(_)).mkString
    s"${tail}_$hex"
  }

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright; read it as a long (legacy conf) and convert to a
    * microsecond timestamp. The generator's sub-microsecond components are
    * all zero, so the conversion is lossless vs the DuckDB oracle. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** S2 — routed scan: the reference reads `transportfact` from the
    * warehouse db instead of the source db (warehouse.py:31-34). Here the
    * router picks a directory per logical table; warehouse-owned tables may
    * live elsewhere (e.g. pipeline output dir).
    */
  def routedRead(spark: SparkSession, sourceDir: String, warehouseDir: String,
                 table: String): DataFrame = {
    val dir = if (table == "transportfact" || table.startsWith("dim") || table == "cube_table")
      warehouseDir else sourceDir
    read(spark, dir, table)
  }
}
