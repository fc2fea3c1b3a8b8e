package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Steady-state pricing of the join-family maintenance (r19 verdict,
  * missing #5 + #2's measurement): the bench's lifecycle split prices
  * `seed + 2 batches` inside one gate at sf0.1 — this main seeds ONCE
  * at a larger sf and prices k consecutive batches, per layout:
  *
  *   - mode `multi`:   o25's layout — 2 base roots + 6 view roots,
  *                     EIGHT ledgered commits per batch + the cut
  *   - mode `oneroot`: o26's layout — 2 base roots + ONE family root
  *                     (applyOnceFeeds), THREE commits + the cut
  *
  * Per batch it prints one JSON line with the wall seconds and
  * PhaseClock's per-store attribution, so two claims become artifacts:
  *   1. the per-batch floor is COMMIT-bound, not data-bound — batch
  *      time at sf1 sits near the sf0.1 gate's, because the cost is
  *      ledger+manifest+pointer rounds, not delta rows;
  *   2. the one-root layout removes most of that floor — same feeds,
  *      same familyDeltas substrate, 5 fewer commits per batch.
  * A final checksum cross-check pins that both layouts maintained the
  * SAME six views (the oracle equivalence o25/o26 already seal at
  * sf0.01 — re-asserted here at rehearsal scale for free).
  *
  * Run (after `sbt Test/package`; fixture via tools/gen_fixture.py):
  *   java <add-opens> -Xmx48g -cp "SPARK_JARS:APP_JAR:TESTS_JAR" \
  *     graft.RehearseSteadyState target/fixtures/gsf1 4
  */
object RehearseSteadyState {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/fixtures/gsf1")
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.etl.{AtomicPublish, ChangeFeed, Coordinator, IncrementalAgg, JoinView}
    import graft.etl.IncrementalAgg.{ReplicaSpec, TargetFeed, ViewSpec}

    val ordBase = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custBase = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    // k+1 versions, both sides churning each batch: version i drops a
    // fresh 1% slice of orders (and restores the previous one), bumps a
    // price stripe, and rotates a customer slice — bounded deltas per
    // batch, never a rebuild
    def aVer(i: Int): DataFrame = {
      val drop = i % 100
      val bumped = ordBase.withColumn("o_totalprice",
        when(col("o_orderkey") % 97 === (i % 97), col("o_totalprice") + i)
          .otherwise(col("o_totalprice")))
      bumped.filter(col("o_orderkey") % 100 =!= drop)
    }
    def bVer(i: Int): DataFrame = {
      val drop = i % 50
      val seg = custBase.withColumn("c_mktsegment",
        when(col("c_custkey") % 89 === (i % 89), lit(s"CHURN$i"))
          .otherwise(col("c_mktsegment")))
      seg.filter(col("c_custkey") % 50 =!= drop)
    }
    val forms = Seq("inner", "left", "right", "full", "semi", "anti")
    val joinType = Map("inner" -> "inner", "left" -> "left_outer",
      "right" -> "right_outer", "full" -> "full_outer",
      "semi" -> "left_semi", "anti" -> "left_anti")
    val aT = Seq(
      ReplicaSpec("replica", Seq("o_orderkey"), numBuckets = 16,
        bucketOn = Seq("o_custkey")),
      ViewSpec("acnt", Seq("o_custkey"), Nil, numBuckets = 16))
    val bT = Seq(
      ReplicaSpec("replica", Seq("c_custkey"), numBuckets = 16),
      ViewSpec("bcnt", Seq("c_custkey"), Nil, numBuckets = 16))
    def pairSpec(name: String, f: String): IncrementalAgg.TargetSpec = f match {
      case "right" => ReplicaSpec(name, Seq("c_custkey", "o_orderkey"),
        numBuckets = 16)
      case "semi" | "anti" => ReplicaSpec(name, Seq("o_orderkey"),
        numBuckets = 16)
      case _ => ReplicaSpec(name, Seq("o_orderkey", "c_custkey"),
        numBuckets = 16)
    }
    def fmt(v: Double): String =
      "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def storesJson(): String =
      PhaseClock.labeledSeconds.toSeq.sortBy(-_._2).map { case (r, s) =>
        val short = r.split('/').takeRight(2).mkString("/")
        s""""$short":${fmt(s)}"""
      }.mkString("{", ",", "}")

    // returns the six final view frames for the checksum cross-check
    def runMode(mode: String): Map[String, DataFrame] = {
      val base = s"/root/repo/target/sink/rehearse_steady_$mode"
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        spark.sparkContext.hadoopConfiguration)
      val bp = new org.apache.hadoop.fs.Path(base)
      if (fc.util.exists(bp)) fc.delete(bp, true)
      val aRoot = s"$base/a"; val bRoot = s"$base/b"
      val famRoot = s"$base/fam"
      val vRoots = forms.map(f => f -> s"$base/v_$f").toMap
      val vT = forms.map(f => f -> Seq(pairSpec("view", f))).toMap
      val famT = forms.map(f => f -> pairSpec(s"v_$f", f)).toMap

      PhaseClock.reset()
      val t0 = System.nanoTime()
      val a0 = aVer(0); val b0 = bVer(0)
      IncrementalAgg.publishInitialMulti(spark, aRoot, a0, aT)
      IncrementalAgg.publishInitialMulti(spark, bRoot, b0, bT)
      if (mode == "multi") forms.foreach { f =>
        IncrementalAgg.publishInitialMulti(spark, vRoots(f),
          a0.join(b0, col("o_custkey") === col("c_custkey"), joinType(f)),
          vT(f))
      } else IncrementalAgg.publishInitialSeeds(spark, famRoot,
        forms.map { f => TargetFeed(famT(f),
          a0.join(b0, col("o_custkey") === col("c_custkey"), joinType(f))) })
      val seedS = (System.nanoTime() - t0) / 1e9
      println(s"""{"mode":"$mode","phase":"seed","secs":${fmt(seedS)},""" +
        s""""seed_clock":${fmt(PhaseClock.seedSeconds)}}""")

      (0 until batches).foreach { i =>
        val (a1, b1) = (aVer(i + 1), bVer(i + 1))
        val feedA = ChangeFeed.diff(aVer(i), a1, Seq("o_orderkey")).persist()
        val feedB = ChangeFeed.diff(bVer(i), b1, Seq("c_custkey")).persist()
        val fam = JoinView.familyDeltas(spark,
          JoinView.Side(aRoot, "replica", Seq("o_custkey"),
            AtomicPublish.currentVersion(spark, aRoot).get),
          JoinView.Side(bRoot, "replica", Seq("c_custkey"),
            AtomicPublish.currentVersion(spark, bRoot).get),
          "acnt", "bcnt", feedA, feedB)
        val feeds = Map(
          "inner" -> fam.inner.persist(), "left" -> fam.leftOuter.persist(),
          "right" -> fam.rightOuter.persist(),
          "full" -> fam.fullOuter.persist(), "semi" -> fam.semi.persist(),
          "anti" -> fam.anti.persist())
        PhaseClock.reset()
        val tb = System.nanoTime()
        try {
          val members =
            if (mode == "multi")
              Coordinator.MemberAdvance(aRoot, feedA, aT) +:
              Coordinator.MemberAdvance(bRoot, feedB, bT) +:
              forms.map(f =>
                Coordinator.MemberAdvance(vRoots(f), feeds(f), vT(f)))
            else Seq(
              Coordinator.MemberAdvance(aRoot, feedA, aT),
              Coordinator.MemberAdvance(bRoot, feedB, bT),
              Coordinator.MemberAdvanceFeeds(famRoot,
                forms.map(f => TargetFeed(famT(f), feeds(f)))))
          Coordinator.advanceMembers(spark, i.toLong, members)
        } finally {
          feedA.unpersist(); feedB.unpersist()
          feeds.values.foreach(_.unpersist()); fam.release()
        }
        val batchS = (System.nanoTime() - tb) / 1e9
        println(s"""{"mode":"$mode","phase":"batch","i":$i,""" +
          s""""secs":${fmt(batchS)},"batch_clock":${fmt(
            PhaseClock.batchSeconds)},"stores":${storesJson()}}""")
      }
      forms.map { f =>
        f -> (if (mode == "multi")
          IncrementalAgg.readView(spark, vRoots(f), "view")
        else IncrementalAgg.readView(spark, famRoot, s"v_$f"))
      }.toMap
    }

    val multiViews = runMode("multi")
    val oneViews = runMode("oneroot")
    // cross-layout equivalence at rehearsal scale: same rows per form
    def sig(df: DataFrame): String =
      df.select(xxhash64(df.columns.sorted.map(col): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(sum("h"), count(lit(1))).collect()(0).toSeq.mkString("/")
    forms.foreach { f =>
      val (m, o) = (sig(multiViews(f)), sig(oneViews(f)))
      println(s"""{"form":"$f","equal":${m == o}}""")
      assert(m == o, s"layouts diverged on form $f: $m vs $o")
    }
    spark.stop()
  }
}
