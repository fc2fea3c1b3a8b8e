package graft

import graft.etl.Pipeline

/** Storage-level idempotence of the incremental pipeline (SURVEY.md §5.3):
  * a second run over the same source inserts nothing, and the warehouse
  * state is unchanged. */
class PipelineStorageSpec extends SparkSuite {

  test("pipeline run is idempotent through parquet state") {
    val wh = s"/root/repo/target/test_warehouse_${System.nanoTime()}"
    val first = Pipeline.run(spark, sf, wh)
    val second = Pipeline.run(spark, sf, wh)

    val f = first.map(r => r.table -> r).toMap
    assert(f("dimclient").inserted === 150)
    assert(f("transportfact").inserted === 6000)
    assert(f("cube_table").inserted === 6000)

    second.filterNot(_.table == "cube_table").foreach { r =>
      assert(r.inserted === 0, s"${r.table} re-inserted ${r.inserted} rows")
      assert(r.skipped > 0, s"${r.table} skipped nothing")
    }
    // cube is a full refresh — same cardinality after re-run
    assert(second.find(_.table == "cube_table").get.inserted === 6000)

    // fact partition layout: one directory per shipdate year
    val years = new java.io.File(s"$wh/transportfact").listFiles()
      .filter(_.getName.startsWith("year=")).map(_.getName).sorted
    assert(years.nonEmpty && years.head === "year=1995")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
  }

  test("a drifted warehouse table fails loudly instead of silently duplicating") {
    import org.apache.spark.sql.functions.col
    val wh = s"/root/repo/target/test_warehouse_${System.nanoTime()}"
    Pipeline.run(spark, sf, wh)
    // simulate schema drift: rewrite dimclient without company_type
    val drifted = spark.read.parquet(s"$wh/dimclient").select("id", "client_name")
    drifted.write.mode("overwrite").parquet(s"$wh/dimclient_tmp")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$wh/dimclient"))
    new java.io.File(s"$wh/dimclient_tmp").renameTo(new java.io.File(s"$wh/dimclient"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Pipeline.run(spark, sf, wh)
    }
    assert(e.getMessage.contains("company_type"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
  }
}
