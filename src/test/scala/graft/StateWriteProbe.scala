package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.{ChangeFeed, IncrementalAgg}

/** Measurement probe behind SCALE.md's CDC write-amplification line:
  * seed a maintained aggregate over a HIGH-cardinality grouping
  * (one group per customer), apply deltas of two shapes — scattered
  * (~100 random groups) and clustered (3 groups) — and compare the
  * bytes the bucketed store wrote against the full-state rewrite the
  * pre-bucketed layout paid per batch. Demonstrates the cost model:
  * bytes written ≈ touchedBuckets × bucketSize, with touchedBuckets ≈
  * B·(1 − e^(−gΔ/B)) for gΔ scattered changed groups over B buckets.
  * Run: sbt "Test/runMain graft.StateWriteProbe [sfDir]". */
object StateWriteProbe {
  private def bytesUnder(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).toSeq.flatten.map(bytesUnder).sum

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSuite.session
    val grp = Seq("o_custkey")
    val sums = Seq("total_price" -> "o_totalprice")
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

    def scenario(name: String, v1: DataFrame, numBuckets: Int): Unit = {
      val root = s"/root/repo/target/test-sink/state_write_probe_$name"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val t0 = System.nanoTime()
      IncrementalAgg.publishInitial(spark, root, orders, grp, sums, numBuckets)
      val seedSecs = (System.nanoTime() - t0) / 1e9
      val segRoot = new java.io.File(s"$root/state_segments")
      val fullBytes = bytesUnder(segRoot)
      val feed = ChangeFeed.diff(orders, v1, Seq("o_orderkey"))
      val touchedGroups = feed.select("o_custkey").distinct().count()
      val touchedBuckets = feed
        .select(pmod(hash(col("o_custkey")), lit(numBuckets)).as("b"))
        .distinct().count()
      val t1 = System.nanoTime()
      require(IncrementalAgg.applyOnce(spark, root, feed, 0L, grp, sums))
      val applySecs = (System.nanoTime() - t1) / 1e9
      val deltaBytes = bytesUnder(segRoot) - fullBytes
      println(f"[$name] B=$numBuckets touchedGroups=$touchedGroups " +
        f"touchedBuckets=$touchedBuckets feedRows=${feed.count()}")
      println(f"[$name] seed $seedSecs%.2f s; full state $fullBytes%,d B " +
        f"(pre-bucketed per-batch write); applyOnce $applySecs%.2f s " +
        f"wrote $deltaBytes%,d B — ${fullBytes.toDouble / deltaBytes}%.1fx less")
    }

    // scattered: ~1/128 of customers re-priced (≈117 groups over 64 buckets
    // covers most buckets — the honest worst case for bucket granularity)
    scenario("scattered", orders.withColumn("o_totalprice",
      when(col("o_custkey") % 128 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice"))), 64)
    // clustered: 3 customers re-priced — the minute-cadence CDC shape
    scenario("clustered", orders.withColumn("o_totalprice",
      when(col("o_custkey").isin(7L, 4242L, 9001L), col("o_totalprice") * 2)
        .otherwise(col("o_totalprice"))), 64)
    // scattered again at B=512: touched buckets ≈ touched groups, so the
    // write approaches delta-proportional at the price of more files
    scenario("scattered_b512", orders.withColumn("o_totalprice",
      when(col("o_custkey") % 128 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice"))), 512)
    spark.stop()
  }
}
