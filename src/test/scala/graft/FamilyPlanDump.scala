package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Plan evidence for the r20 substrate optimization (OPTIMIZATION_r20
  * §2): dumps the full-outer family feed's `explain("formatted")`
  * built BOTH ways over the same seeded stores —
  *
  *   - `family_substrate_before.txt`: `JoinView.fullOuterDelta`, the
  *     retained UNMANAGED construction (pre-r20 o21 verbatim) — every
  *     correction term repeats the pruned count-read ⋈ feed-fold
  *     subtree inline;
  *   - `family_substrate_after.txt`: `JoinView.familyDeltas(...)
  *     .fullOuter`, the managed construction the gates now use — the
  *     repeated terms read `InMemoryRelation`/`InMemoryTableScan`.
  *
  * Run: java <add-opens> -cp "SPARK_JARS:APP:TESTS" graft.FamilyPlanDump
  */
object FamilyPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("plans/r20")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.maxMetadataStringLength", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.etl.{AtomicPublish, ChangeFeed, Coordinator, IncrementalAgg, JoinView}
    import graft.etl.IncrementalAgg.{ReplicaSpec, ViewSpec}
    val s = spark
    val ordBase = Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custBase = Tables.customer(s, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val a0 = ordBase
    val a1 = ordBase.filter(col("o_orderkey") % 10 =!= 3)
    val b0 = custBase.filter(col("c_custkey") % 3 =!= 1)
    val b1 = custBase.filter(col("c_custkey") % 3 =!= 1 &&
      col("c_custkey") % 5 =!= 2)
    val base = s"/root/repo/target/sink/planfam_${Tables.dirSlug(sfDir)}"
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      s.sparkContext.hadoopConfiguration)
    val bp = new org.apache.hadoop.fs.Path(base)
    if (fc.util.exists(bp)) fc.delete(bp, true)
    val aRoot = s"$base/a"; val bRoot = s"$base/b"
    val aT = Seq(
      ReplicaSpec("replica", Seq("o_orderkey"), numBuckets = 16,
        bucketOn = Seq("o_custkey")),
      ViewSpec("acnt", Seq("o_custkey"), Nil, numBuckets = 16))
    val bT = Seq(
      ReplicaSpec("replica", Seq("c_custkey"), numBuckets = 16),
      ViewSpec("bcnt", Seq("c_custkey"), Nil, numBuckets = 16))
    Coordinator.seedMembers(s, Seq(
      Coordinator.SeedRows(aRoot, a0, aT),
      Coordinator.SeedRows(bRoot, b0, bT)))
    val feedA = ChangeFeed.diff(a0, a1, Seq("o_orderkey")).persist()
    val feedB = ChangeFeed.diff(b0, b1, Seq("c_custkey")).persist()
    val aSide = JoinView.Side(aRoot, "replica", Seq("o_custkey"),
      AtomicPublish.currentVersion(s, aRoot).get)
    val bSide = JoinView.Side(bRoot, "replica", Seq("c_custkey"),
      AtomicPublish.currentVersion(s, bRoot).get)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val text = graft.plans.PlanSnapshot.formatted(df)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), text)
      println(s"[familyplandump] $name (${text.linesIterator.size} lines)")
    }
    // BEFORE: the unmanaged construction (pre-r20 o21 gate verbatim)
    dump("family_substrate_before",
      JoinView.fullOuterDelta(s, aSide, bSide, "acnt", "bcnt", feedA, feedB))
    // AFTER: the managed family substrate the gates now ride
    val fam = JoinView.familyDeltas(s, aSide, bSide, "acnt", "bcnt",
      feedA, feedB)
    dump("family_substrate_after", fam.fullOuter)
    fam.release()
    feedA.unpersist(); feedB.unpersist()
    spark.stop()
  }
}
