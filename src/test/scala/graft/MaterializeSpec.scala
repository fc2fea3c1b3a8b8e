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

  test("materialized memoizes: the builder runs once per (session, dir, key)") {
    var builds = 0
    def build() = { builds += 1; spark.range(5).toDF("x") }
    val a = Shared.materialized(spark, sf, "mat_memo_probe")(build())
    val b = Shared.materialized(spark, sf, "mat_memo_probe")(build())
    assert(builds == 1, s"builder ran $builds times")
    assert(a.collect().toSeq == b.collect().toSeq)
  }
}
