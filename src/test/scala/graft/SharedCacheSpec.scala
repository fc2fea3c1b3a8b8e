package graft

import org.apache.spark.sql.DataFrame

/** Guards the session-shared materializations (queries.Shared): a
  * persisted intermediate must be row-identical to a fresh, uncached
  * build of the same plan — the sharing is a performance decision and
  * can never be a semantic one. The cache is cleared between the two
  * reads, otherwise Spark's cache manager would substitute the cached
  * relation into the "fresh" plan and the comparison would be vacuous.
  */
class SharedCacheSpec extends SparkSuite {

  private def norm(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("session-shared cube and cluster labels are row-identical to fresh builds") {
    val sharedCube = norm(graft.queries.Shared.cube(spark, sf))
    val sharedCc   = norm(graft.queries.Shared.lshClusters(spark, sf))
    spark.catalog.clearCache()
    val freshCube = norm(graft.etl.StarSchema.build(spark, sf).cube)
    val freshCc = norm(graft.ops.Clusters.connectedComponents(
      graft.ops.TextDedup.minhashLsh(Tables.documents(spark, sf), "doc_id", "text"),
      "doc_a", "doc_b"))
    assert(sharedCube.size == freshCube.size && sharedCube == freshCube,
      "cached cube diverged from a fresh StarSchema build")
    assert(sharedCc == freshCc,
      "cached cluster labels diverged from a fresh LSH+CC run")
  }

  test("session-shared span coverage is row-identical to a fresh build") {
    val shared = norm(graft.queries.Shared.spanCoverage(spark, sf))
    spark.catalog.clearCache()
    val fresh = norm(graft.ops.TextDedup.spanCoverage(
      Tables.documents(spark, sf), "doc_id", "text"))
    assert(shared == fresh,
      "cached span coverage diverged from a fresh spanCoverage run")
  }
}
