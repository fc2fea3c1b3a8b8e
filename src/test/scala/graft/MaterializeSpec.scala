package graft

import graft.queries.{Shared, SimilarityOps}

/** Pins [[graft.queries.Shared.materialized]]'s contract: the durable
  * written-table form (`graft.materialize.dir` set — the real-cluster
  * deployment shape, fault-tolerant under executor loss) returns the
  * SAME rows as the default localCheckpoint form, both for the raw memo
  * and end-to-end through sim9's MMR chain. A separate `newSession()`
  * isolates the conf and the Shared memo (its key includes the session),
  * so both forms build fresh within one suite run. */
class MaterializeSpec extends SparkSuite {

  test("written-table materialization is row-identical to the localCheckpoint form, end-to-end through sim9") {
    val base = SimilarityOps.queries("sim9_mmr_diversify")(spark, sf).collect().toSeq

    val s2 = spark.newSession()
    val mat = java.nio.file.Files.createTempDirectory("graft_mat").toString
    s2.conf.set("graft.materialize.dir", mat)
    val alt = SimilarityOps.queries("sim9_mmr_diversify")(s2, sf).collect().toSeq

    assert(alt == base, "sim9 rows diverged between materialization forms")

    // the alternate path really went through parquet on the configured dir
    val poolDir = new java.io.File(s"$mat/mmr_pool_${Tables.dirSlug(sf)}")
    val simsDir = new java.io.File(s"$mat/mmr_sims_${Tables.dirSlug(sf)}")
    assert(poolDir.isDirectory && poolDir.listFiles().exists(_.getName.endsWith(".parquet")),
      s"expected a parquet materialization at $poolDir")
    assert(simsDir.isDirectory && simsDir.listFiles().exists(_.getName.endsWith(".parquet")),
      s"expected a parquet materialization at $simsDir")
  }

  test("written-table form of Shared.cached is row-identical to the persist form, through the cube") {
    // fact_id is not unique on this generator (duplicate (orderkey,
    // linenumber) pairs — see etl_fact_load's note), so the tie-safe
    // sort key is the full column list, same as etl_cube_build's gate.
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*)
        .collect().toSeq
    val base = sorted(Shared.cube(spark, sf))

    val s2 = spark.newSession()
    val mat = java.nio.file.Files.createTempDirectory("graft_mat_cube").toString
    s2.conf.set("graft.materialize.dir", mat)
    val alt = sorted(Shared.cube(s2, sf))

    assert(alt == base, "cube rows diverged between materialization forms")

    val cubeDir = new java.io.File(s"$mat/cube_${Tables.dirSlug(sf)}")
    assert(cubeDir.isDirectory && cubeDir.listFiles().exists(_.getName.endsWith(".parquet")),
      s"expected a parquet materialization at $cubeDir")
  }

  test("materialization writes honor the bounded row-group size") {
    // The write-side OOM defense (Shared.matWrite, SCALE.md r13): a
    // materialization's parquet row groups must flush at the configured
    // bound, not parquet's 128 MiB default — set the bound tiny, write
    // ~2.4 MB of longs into one file, and read the footers back.
    val s2 = spark.newSession()
    val mat = java.nio.file.Files.createTempDirectory("graft_mat_rg").toString
    s2.conf.set("graft.materialize.dir", mat)
    val bound = 64L * 1024
    s2.conf.set("graft.materialize.rowgroup.bytes", bound.toString)
    Shared.materialized(s2, sf, "rg_probe") {
      s2.range(300000).toDF("x").repartition(1)
    }.count()

    import scala.jdk.CollectionConverters._
    val dir = new java.io.File(s"$mat/rg_probe_${Tables.dirSlug(sf)}")
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty, s"expected parquet files at $dir")
    val groupSizes = files.toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        s2.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.map(_.getTotalByteSize).toSeq
      finally r.close()
    }
    assert(groupSizes.size > 1,
      s"expected multiple row groups under a ${bound}B bound, got ${groupSizes.size}")
    // parquet's flush check is periodic (every ~100 records early on),
    // so allow generous slack over the configured bound.
    val tooBig = groupSizes.filter(_ > bound * 4)
    assert(tooBig.isEmpty,
      s"row groups exceeded the bound beyond slack: $tooBig (bound $bound)")
  }

  test("materialized memoizes: the builder runs once per (session, dir, key)") {
    var builds = 0
    def build() = { builds += 1; spark.range(5).toDF("x") }
    val a = Shared.materialized(spark, sf, "mat_memo_probe")(build())
    val b = Shared.materialized(spark, sf, "mat_memo_probe")(build())
    assert(builds == 1, s"builder ran $builds times")
    assert(a.collect().toSeq == b.collect().toSeq)
  }
}
