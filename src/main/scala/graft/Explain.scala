package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: prints `explain("formatted")` for the
  * plan-shape-critical queries so regressions in broadcast/pushdown/
  * pruning are visible per round (the 100 TB posture check of
  * SURVEY.md §7.5). Usage: runMain graft.Explain [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("j1_star_join", "etl_cube_build", "s1_full_scan", "o2_topk",
        "p3_eq_predicate", "g1_groupby_agg", "tpch_q6_forecast",
        "tpch_q14_promo", "tpch_q18_large_orders", "w2_rank_dense",
        "sim2_ann_lsh", "g11_kmv_distinct", "tpch_q1_pricing",
        "tpch_q7_volume", "tpch_q9_profit", "tpch_q11_important_stock",
        "skew_salted_join", "ts2_resample_interpolate",
        "dd10_incremental_lsh", "ir1_keyword_topk", "sim5_centroid_outliers",
        "dd11_semantic_dedup", "sim6_two_stage_rerank", "ir3_rrf_fusion",
        "ct2_fuzzy_decontaminate", "tx7_top_ngrams", "cr7_corpus_diff")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
