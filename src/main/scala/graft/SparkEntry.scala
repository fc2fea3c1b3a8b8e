package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{CurationOps, Det, DedupOps, Etl, EventOps, MultimodalOps, Relational, SimilarityOps, StreamingOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 (reference parity)
  * plus the LLM-pipeline extensions, each a pure
  * (SparkSession, fixtureDir) => DataFrame. `oracleSql` holds the DuckDB
  * replay for every SQL-expressible query; names and output column names
  * match exactly (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the minimum end-to-end slice of SURVEY.md §7.2 — the
    * denormalized cube (7-way broadcast star join over conformed dims,
    * warehouse.py:254-284 rebuilt) aggregated to revenue by region × year.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("r_name", "order_year")
  }

  def queryGroups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Etl.queries, Etl.oracles),
      (Relational.queries, Relational.oracles),
      (TextOps.queries, TextOps.oracles),
      (CurationOps.queries, CurationOps.oracles),
      (DedupOps.queries, DedupOps.oracles),
      (SimilarityOps.queries, SimilarityOps.oracles),
      (MultimodalOps.queries, MultimodalOps.oracles),
      (StreamingOps.queries, StreamingOps.oracles),
      (EventOps.queries, EventOps.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryGroups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    queryGroups.map(_._2).reduce(_ ++ _)
}
