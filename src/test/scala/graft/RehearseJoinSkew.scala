package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.{AtomicPublish, ChangeFeed, IncrementalAgg, JoinView}
import graft.etl.IncrementalAgg.ReplicaSpec

/** Round-19 join-view skew rehearsal (VERDICT r18 ask #2, carried from
  * r17's stretch): the SCALE.md claim that a hot join key's worst case
  * inside the six-term delta is OUTPUT-sized and AQE's skew split
  * applies had never been MEASURED through `joinDeltaFromStores` on a
  * real fixture. This main constructs the hot-key batch at the given
  * SF fixture (default shape: remap o_custkey so ~10^4 orders share
  * one key, then update exactly that customer in ΔB — the
  * A_keep ⋈ ΔB± terms each drag the full fan-out through one shuffle
  * partition of the sort-merge join), runs the maintenance round in
  * the no-broadcast worst case with AQE's skew split ON and OFF, and
  * reports wall seconds, feed rows, skew-marker counts from the
  * executed plan, and a differential check against the direct join.
  *
  * Emits one JSON line per measurement:
  *   {"mode":"skew_on","secs":3.2,"feed_rows":21000,"skew_marks":2,"exact":true}
  *
  * Usage: RehearseJoinSkew FIXTURE_DIR [HOT_MOD]
  *   HOT_MOD: every o_orderkey % HOT_MOD == 0 order is remapped to the
  *   hot key (sf1 orders ≈ 1.5M rows → HOT_MOD=150 ⇒ ~10^4 hot rows).
  */
object RehearseJoinSkew {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseJoinSkew FIXTURE_DIR [HOT_MOD]")
    val dir = args(0)
    val hotMod = if (args.length > 1) args(1).toInt else 150
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hotKey = 42L
    // A: orders with the constructed hot key; B: customers. The remap
    // keeps every o_custkey a real customer key, so the direct-join
    // differential is over exactly the maintained pair.
    val ordBase = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % hotMod === 0, lit(hotKey))
          .otherwise(col("o_custkey")).as("o_custkey"),
        col("o_totalprice"))
    val custBase = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val hotRows = ordBase.filter(col("o_custkey") === hotKey).count()
    println(s"""{"fixture":"$dir","hot_key_rows":$hotRows}""")

    // the batch: ΔA deletes a sliver (some hot rows in the ΔA⁻⋈ΔB cell);
    // ΔB rewrites the HOT customer + churns a cold slice, so the delta
    // is real-sized and the hot fan-out rides A_keep ⋈ ΔB±
    val a1 = ordBase.filter(col("o_orderkey") % 1000 =!= 7)
    val b1 = custBase
      .withColumn("c_mktsegment",
        when(col("c_custkey") === hotKey, lit("HOTSEG"))
          .when(col("c_custkey") % 97 === 3, lit("COLDCHURN"))
          .otherwise(col("c_mktsegment")))
      .filter(col("c_custkey") % 101 =!= 5)

    def runOnce(mode: String, skewOn: Boolean): Unit = {
      val base = s"/root/repo/target/sink/rehearse_join_skew_$mode"
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        spark.sparkContext.hadoopConfiguration)
      val bp = new org.apache.hadoop.fs.Path(base)
      if (fc.util.exists(bp)) fc.delete(bp, true)
      val aRoot = s"$base/a"; val bRoot = s"$base/b"
      val aT = Seq(ReplicaSpec("replica", Seq("o_orderkey"),
        numBuckets = 16, bucketOn = Seq("o_custkey")))
      val bT = Seq(ReplicaSpec("replica", Seq("c_custkey"), numBuckets = 16))
      IncrementalAgg.publishInitialMulti(spark, aRoot, ordBase, aT)
      IncrementalAgg.publishInitialMulti(spark, bRoot, custBase, bT)
      // worst case: the delta does NOT broadcast; skew split on/off per mode
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        (256 * 1024).toString)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (128 * 1024).toString)
      // the split target is floored at minPartitionSize (default 1 MiB)
      // — scaled down with the other knobs so the detector sees fixture
      // bytes the way production defaults see hundreds-of-MB partitions
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      try {
        val feedA = ChangeFeed.diff(ordBase, a1, Seq("o_orderkey")).persist()
        val feedB = ChangeFeed.diff(custBase, b1, Seq("c_custkey")).persist()
        feedA.count(); feedB.count() // feeds priced out of the round
        val t0 = System.nanoTime()
        val viewFeed = JoinView.joinDeltaFromStores(spark,
          JoinView.Side(aRoot, "replica", Seq("o_custkey"),
            AtomicPublish.currentVersion(spark, aRoot).get),
          JoinView.Side(bRoot, "replica", Seq("c_custkey"),
            AtomicPublish.currentVersion(spark, bRoot).get),
          feedA, feedB)
        // materialize through the feed's OWN QueryExecution so its
        // adaptive plan finalizes and the skew markers are readable
        val qe = viewFeed.queryExecution
        val feedRows = qe.executedPlan.execute().count()
        val secs = (System.nanoTime() - t0) / 1e9
        val planStr = qe.executedPlan.toString
        viewFeed.persist()
        val skewMarks = "skew=true".r.findAllIn(planStr).size
        // differential: apply the feed to the pre-join, compare with the
        // direct join of the post tables (checksum compare — the frames
        // are |join|-sized at sf1, too big for a driver-side set)
        // decimal-cast sum: a long sum of 5M xxhash64 values overflows
        // under ANSI mode
        def sig(df: org.apache.spark.sql.DataFrame): String =
          df.select(xxhash64(df.columns.map(col): _*)
              .cast("decimal(38,0)").as("h"))
            .agg(sum("h")).collect()(0).get(0).toString
        val viewPre = ordBase.join(custBase,
          col("o_custkey") === col("c_custkey"), "inner")
        val replayed = ChangeFeed.applyTo(viewPre, viewFeed,
          Seq("o_orderkey", "c_custkey"), strict = true)
        val direct = a1.join(b1, col("o_custkey") === col("c_custkey"),
          "inner")
        val exact = sig(replayed.select(direct.columns.map(col): _*)) ==
          sig(direct) && replayed.count() == direct.count()
        println(s"""{"mode":"$mode","secs":${"%.2f".formatLocal(
          java.util.Locale.ROOT, secs)},"feed_rows":$feedRows,""" +
          s""""skew_marks":$skewMarks,"exact":$exact}""")
        feedA.unpersist(); feedB.unpersist(); viewFeed.unpersist()
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      }
    }
    runOnce("skew_off", skewOn = false)
    runOnce("skew_on", skewOn = true)
    // second pass each, warm — min2's analogue for the rehearsal
    runOnce("skew_off_warm", skewOn = false)
    runOnce("skew_on_warm", skewOn = true)
    spark.stop()
  }
}
