package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.DimOps

/** SURVEY.md §2 relational operator inventory (S/P/J/A/G/W/O/U/F rows),
  * one verifiable query per operator, each with a DuckDB oracle. Query
  * names carry the §2 ids. All outputs are explicitly ordered and all
  * double aggregates go through Det.dsum/davg so both engines agree
  * bit-for-bit.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── S: scans / sources ────────────────────────────────────────────
    // S1 full table scan (reference: SELECT * per table, warehouse.py:34).
    "s1_full_scan" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("l_shipdate", to_date(col("l_shipdate")))
        // (orderkey, linenumber) non-unique (TESTDATA): full determinism
        // needs value-column tiebreaks, first colliding at sf1 volume
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")),

    // S2 routed scan (warehouse.py:31-34): table name decides the source.
    "s2_routed_scan" -> ((s, dir) =>
      Tables.routedRead(s, dir, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // S3 multi-table concat (warehouse.py:28-38): like-schema union.
    "s3_multi_concat" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_name").as("name"), lit("customer").as("src"))
      val su = Tables.supplier(s, dir).select(col("s_name").as("name"), lit("supplier").as("src"))
      val p = Tables.part(s, dir).select(col("p_name").as("name"), lit("part").as("src"))
      c.unionByName(su).unionByName(p).orderBy("src", "name")
    }),

    // S4 point lookup by key (warehouse.py:78 per-row SELECT ... WHERE id).
    "s4_point_lookup" -> ((s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderkey") === 42L)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")),

    // S5 lookup by natural key (warehouse.py:104): value → surrogate id.
    "s5_natural_key_lookup" -> ((s, dir) => {
      val subcat = graft.etl.StarSchema.dimProductSubcategory(Tables.part(s, dir))
      subcat.join(broadcast(subcat.agg(min("subcategory").as("mn"))),
        col("subcategory") === col("mn")).drop("mn")
    }),

    // S6 batch dim sink (warehouse.py:82 per-row INSERTs → one atomic
    // parquet write) + read-back.
    "s6_dim_sink" -> ((s, dir) => {
      val out = s"/root/repo/target/sink/s6_dim_${Tables.dirSlug(dir)}"
      graft.etl.StarSchema.dimClient(Tables.customer(s, dir))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).orderBy("id")
    }),

    // S7 partitioned fact sink (warehouse.py:188-200 RANGE partitions →
    // partitionBy(year) layout); the read-back filter prunes to one
    // partition directory.
    "s7_partitioned_fact_sink" -> ((s, dir) => {
      val out = s"/root/repo/target/sink/s7_fact_${Tables.dirSlug(dir)}"
      // Layout-shaped write: factInput widens the under-parallel scan so
      // the join chain runs on all cores (same treatment as s8), then an
      // explicit (year, salt) exchange clusters rows so every write task
      // owns ONE year directory — files-per-partition-dir is bounded by
      // the salt width instead of growing with task count, which is the
      // knob that matters at 100 TB. sortWithinPartitions then clusters
      // each year's files by fact id so parquet row-group stats also
      // prune id-ranged reads (SCALE.md). Explicit partition count keeps
      // AQE from coalescing the write stage to one task.
      //
      // Both widths DERIVE from spark.sql.shuffle.partitions rather than
      // being hardcoded: a fixed 32-wide exchange means per-task sort
      // volume grows linearly with data — at sf10 under 16-thread/20 GiB
      // executors the fixed width OOMed the write stage (SCALE.md r13).
      // At the default 32 the plan is bit-identical to the old shape;
      // scaling the conf scales the salt with it, so parallelism grows
      // while files-per-year stays bounded at width/8.
      val writeWidth = s.sessionState.conf.numShufflePartitions
      val salt = math.max(4, writeWidth / 8)
      graft.etl.StarSchema.fact(
          graft.etl.StarSchema.factInput(Tables.lineitem(s, dir)),
          Tables.orders(s, dir), Tables.customer(s, dir))
        .repartition(writeWidth, col("year"), pmod(col("id"), lit(salt)))
        .sortWithinPartitions("year", "id")
        .write.mode("overwrite").partitionBy("year").parquet(out)
      val back = s.read.parquet(out).filter(col("year") === 1997)
      back.select(col("id"), col("product_id"), col("client_id"), col("date_id"),
          col("country_id"), col("quantity"), col("price"),
          col("year").cast("long").as("year"))
        .orderBy("id", "product_id", "client_id", "date_id", "country_id",
          "quantity", "price")
    }),

    // S8 full-refresh sink (warehouse.py:254 TRUNCATE+INSERT...SELECT →
    // atomic overwrite of the cube) + aggregate read-back.
    "s8_full_refresh_sink" -> ((s, dir) => {
      val out = s"/root/repo/target/sink/s8_cube_${Tables.dirSlug(dir)}"
      // Direct write, no pre-write repartition: parallelism comes from
      // StarSchema.factInput's fanOut of the fact input (the fixture
      // scans are single-row-group → 1 task otherwise), which leaves the
      // whole join-chain + parquet-encode stage running on all cores. An
      // A/B showed a post-join repartition is strictly worse (it shuffles
      // the WIDE cube rows; fanOut shuffles the narrow base rows), and
      // repartitionByRange worse still — its range sampler executes the
      // child once just to pick boundaries. The cube itself comes from
      // the session's shared materialization (Shared.cube): the refresh
      // sink's job is the atomic overwrite, not a private re-join.
      Shared.cube(s, dir).write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy("category")
        .agg(count(lit(1)).as("n"), Det.dsum(col("price")).as("total_price"))
        .orderBy("category")
    }),

    // Source-format coverage [extension]: the engine reads/writes csv and
    // json alongside parquet (the reference's only "format" is a MySQL
    // wire protocol). Round-trip through each format and read back.
    "src_csv_roundtrip" -> ((s, dir) => {
      val out = s"/root/repo/target/sink/src_csv_${Tables.dirSlug(dir)}"
      Tables.nation(s, dir).write.mode("overwrite")
        .option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(out).orderBy("n_nationkey")
    }),

    "src_json_roundtrip" -> ((s, dir) => {
      val out = s"/root/repo/target/sink/src_json_${Tables.dirSlug(dir)}"
      Tables.supplier(s, dir).write.mode("overwrite").json(out)
      s.read
        .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
        .json(out).orderBy("s_suppkey")
    }),

    "src_orc_roundtrip" -> ((s, dir) => {
      val out = s"/root/repo/target/sink/src_orc_${Tables.dirSlug(dir)}"
      Tables.region(s, dir).write.mode("overwrite").orc(out)
      s.read.orc(out).orderBy("r_regionkey")
    }),

    // Z-order clustered layout [extension — multi-dimensional pruning for
    // 100 TB fact tables; see ops/Layout.scala]. Writes lineitem clustered
    // on (l_partkey, l_suppkey), reads it back through a 2-D box filter,
    // and aggregates per z-bucket — the bucket key re-derives the Morton
    // interleave on read, so the bit-twiddling itself is oracle-verified,
    // not just the layout-invisible row content. Footer-stats pruning is
    // pinned separately in OpsApiSpec.
    "zo1_zorder_layout" -> ((s, dir) => {
      val out = s"/root/repo/target/sink/zo1_${Tables.dirSlug(dir)}"
      graft.ops.Layout.zorderWrite(
        Tables.lineitem(s, dir)
          .select("l_partkey", "l_suppkey", "l_extendedprice"),
        "l_partkey", "l_suppkey", out, nFiles = 16)
      s.read.parquet(out)
        .filter(col("l_partkey").between(1, 2000) && col("l_suppkey").between(1, 200))
        .withColumn("zbucket",
          shiftright(graft.ops.Layout.zValue(col("l_partkey"), col("l_suppkey")), 16))
        .groupBy("zbucket")
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("zbucket")
    }),

    // Small-file compaction [extension — lake maintenance; see
    // ops/Maintenance.scala]. Fragments orders into 64 shards, compacts
    // to ~4 MiB targets (narrow coalesce, no shuffle), and aggregates the
    // compacted copy — identical content proves the rewrite lossless;
    // file-count mechanics are pinned in OpsApiSpec.
    "cp1_compaction" -> ((s, dir) => {
      val frag = s"/root/repo/target/sink/cp1_frag_${Tables.dirSlug(dir)}"
      val out = s"/root/repo/target/sink/cp1_out_${Tables.dirSlug(dir)}"
      Tables.orders(s, dir).repartition(64).write.mode("overwrite").parquet(frag)
      graft.ops.Maintenance.compact(s, frag, out, targetBytes = 4L * 1024 * 1024)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // ── P: projections / predicates ───────────────────────────────────
    // P1+P6 fact-shaped projection with NULL injection (warehouse.py:207-208).
    "p1_fact_projection" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey").as("purchase_id"),
        col("o_custkey").as("client_id"),
        to_date(col("o_orderdate")).as("date"),
        lit(null).cast("long").as("quantity"),
        lit(null).cast("double").as("price"),
        year(col("o_orderdate")).cast("long").as("year"))
        .orderBy("purchase_id")),

    // P2 aliasing projection (warehouse.py:258-274).
    "p2_alias_projection" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("client_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("total_price"),
        col("o_orderpriority").as("priority"))
        .orderBy("order_id")),

    // P3 equality predicate (warehouse.py:78,104,145).
    "p3_eq_predicate" -> ((s, dir) =>
      Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        // (orderkey, linenumber) is NOT unique in this generator
        // (TESTDATA caveat); ties only materialize at sf1 volume, so
        // every projected column joins the sort
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // P4 conjunctive predicate (warehouse.py:158).
    "p4_conj_predicate" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1997 &&
                month(col("o_orderdate")) === 3 &&
                col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // P5 CASE/decode mapping (warehouse.py:83-91; unmatched → null, Q1).
    "p5_decode" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey").as("id"),
          DimOps.decode(col("c_mktsegment"), Seq(
            "BUILDING"   -> "industry",
            "AUTOMOBILE" -> "mechanic_company",
            "MACHINERY"  -> "mechanic_company",
            "HOUSEHOLD"  -> "electric_company",
            "FURNITURE"  -> "industry")).as("company_type"))
        .orderBy("id")),

    // ── J: joins ──────────────────────────────────────────────────────
    // J1 star equi-join, dims broadcast (warehouse.py:275-283).
    "j1_star_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val n  = Tables.nation(s, dir)
      val r  = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy("r_name", "n_name")
    }),

    // J2 cube view (warehouse.py:214-246): temp view + SQL over it. The
    // view reads the session's one materialized cube (Shared.cube) — the
    // reference's own cube_table is a materialized table queried by
    // views, not a join re-run per query.
    "j2_cube_view" -> ((s, dir) => {
      Shared.cube(s, dir).createOrReplaceTempView("cube_view")
      s.sql("""SELECT category, year,
               |       CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
               |       COUNT(*) AS n
               |FROM cube_view GROUP BY category, year
               |ORDER BY category, year""".stripMargin)
    }),

    // J3 anti-join: insert-if-absent core (warehouse.py:78-81 et al).
    "j3_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J4 semi-join: lookup-reuse (warehouse.py:104-112).
    "j4_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // ── A: dedup / distinct ───────────────────────────────────────────
    // A1 first-wins dedup by key (warehouse.py:81).
    "a1_first_wins_dedup" -> ((s, dir) =>
      // preShuffle: l_orderkey is LOW-dup (≈4 rows/key), so map-side
      // partial combining would hold ~3/4 of each scan slice for a 25%
      // reduction — the near-unique-key OOM shape (SCALE.md r13).
      DimOps.firstWins(
        Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
        Seq("l_orderkey"), preShuffle = true)
        .orderBy("l_orderkey")),

    // A2 distinct on natural key (warehouse.py:145-151).
    "a2_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir).select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // ds1 — typed Dataset[T] pipeline (SURVEY.md §1.5): case-class
    // schema, lambda filter, groupByKey + count / reduceGroups — the
    // compile-time-safe form of the reference's positional row access
    // (warehouse.py:140 row[8]). Output values are order-independent
    // (count, max) so typed lambdas cost nothing in determinism.
    "ds1_typed_pipeline" -> ((s, dir) => {
      import s.implicits._
      val ds = Tables.lineitem(s, dir).as[graft.Schemas.LineItem]
      val filtered = ds.filter(_.l_quantity > 30.0)
      val counts = filtered.groupByKey(_.l_returnflag).count()
        .toDF("l_returnflag", "n")
      val maxq = filtered.groupByKey(_.l_returnflag)
        .reduceGroups((a, b) => if (a.l_quantity >= b.l_quantity) a else b)
        .map { case (k, r) => (k, r.l_quantity) }
        .toDF("l_returnflag", "max_qty")
      counts.join(maxq, "l_returnflag").orderBy("l_returnflag")
    }),

    // a3 — typed Aggregator[IN,BUF,OUT] (§2.9 UDAF surface): exact
    // top-3-per-group with an O(k) bounded buffer — map-side combine
    // ships k pairs per group per partition instead of every row. The
    // oracle replays it with the window row_number form.
    "a3_topk_aggregator" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAggregator(3),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong))
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"),
          posexplode(col("top")).as(Seq("rk0", "pair")))
        .select(col("o_orderpriority"),
          (col("rk0") + 1).cast("int").as("rk"),
          col("pair._1").as("o_totalprice"),
          col("pair._2").as("o_orderkey"))
        .orderBy("o_orderpriority", "rk")
    }),

    // ── G: aggregation [extension per §2.4] ───────────────────────────
    "g1_groupby_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base_price"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          Det.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "g2_rollup" -> ((s, dir) => {
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      val c = Tables.customer(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), Det.dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    "g3_cube_grouping" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "g4_having" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey")),

    "g5_count_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    // HLL sketch: approx values differ across engines → rows-only check.
    "g6_approx_count_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag")),

    // g9 — exact interpolated percentiles (sort-based; both engines use
    // linear interpolation over the ordered values).
    "g9_percentiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("q"))
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("p25"),
          element_at(col("q"), 2).as("p50"),
          element_at(col("q"), 3).as("p75"))
        .orderBy("l_returnflag")),

    // g10 — conditional/filtered aggregation.
    "g10_filtered_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"),
          Det.dsum(when(col("l_discount") > 0.05, col("l_extendedprice"))
            .otherwise(lit(0.0))).as("discounted_price"),
          count(when(col("l_quantity") >= 25, 1)).as("n_bulk"))
        .orderBy("l_returnflag")),

    // g11 — KMV (k-minimum-values) distinct-count sketch: the k smallest
    // distinct md5-derived hashes per group (O(k) buffer, map-side
    // combine) estimate the cardinality as (k-1)·2^60/h_k. Unlike HLL
    // (g6, rows-only by necessity), every step is engine-portable
    // arithmetic, so the ORACLE REPLAYS THE SKETCH EXACTLY — an
    // approx-distinct whose value is still hash-checked.
    "g11_kmv_distinct" -> ((s, dir) => {
      val K = 16
      val mink = udaf(new graft.functions.MinKAggregator(K),
        org.apache.spark.sql.Encoders.scalaLong)
      // (k-1)·2^60: both factors are powers-of-two-scaled small ints, so
      // the double constant is exact and division is one IEEE op that
      // any engine reproduces bit-for-bit
      val scale = lit((K - 1).toDouble * 1.152921504606846976e18)
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          col("l_partkey"),
          graft.functions.DetHash.h(col("l_partkey").cast("string")).as("h"))
        .groupBy("l_returnflag")
        .agg(mink(col("h")).as("mins"),
          countDistinct(col("l_partkey")).as("exact_distinct"))
        .select(col("l_returnflag"),
          when(size(col("mins")) < K, col("exact_distinct").cast("double"))
            .otherwise(scale / element_at(col("mins"), K).cast("double"))
            .as("est_distinct"),
          col("exact_distinct"))
        .orderBy("l_returnflag")
    }),

    // g14 — KMV sketch ALGEBRA [extension over g11]: estimate the
    // union and intersection cardinality of two key sets from their
    // mergeable k-min-value sketches alone — the 100 TB pattern for
    // "how much do these two corpora overlap?" without ever joining
    // them (each side collapses to K longs; the merge is k-smallest of
    // the concatenation, the classic KMV union; intersection via the
    // ρ/K rule, Beyer et al. 2007). Deterministic md5 hashes make even
    // the ESTIMATES hash-checked, and the exact values ride along so
    // the query self-reports its error — the sim8 pattern for sketches.
    "g14_sketch_algebra" -> ((s, dir) => {
      val K = 64
      val mink = udaf(new graft.functions.MinKAggregator(K),
        org.apache.spark.sql.Encoders.scalaLong)
      val scale = lit((K - 1).toDouble * 1.152921504606846976e18)
      val orders = Tables.orders(s, dir)
      def sketch(m: Int, tag: String) = orders
        .filter(col("o_orderkey") % m === 0)
        .select(col("o_custkey"),
          graft.functions.DetHash.h(col("o_custkey").cast("string")).as("h"))
        .agg(mink(col("h")).as(s"sk_$tag"),
          countDistinct(col("o_custkey")).as(s"exact_$tag"))
      val exacts = orders
        .groupBy("o_custkey")
        .agg(max(when(col("o_orderkey") % 2 === 0, 1).otherwise(0)).as("ina"),
          max(when(col("o_orderkey") % 3 === 0, 1).otherwise(0)).as("inb"))
        .agg(sum(when(col("ina") === 1 || col("inb") === 1, 1L).otherwise(0L))
            .as("exact_union"),
          sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L))
            .as("exact_inter"))
      sketch(2, "a").crossJoin(sketch(3, "b")).crossJoin(exacts)
        .withColumn("u", expr(s"slice(array_sort(array_union(sk_a, sk_b)), 1, $K)"))
        .withColumn("est_a",
          when(size(col("sk_a")) < K, col("exact_a").cast("double"))
            .otherwise(scale / element_at(col("sk_a"), K).cast("double")))
        .withColumn("est_b",
          when(size(col("sk_b")) < K, col("exact_b").cast("double"))
            .otherwise(scale / element_at(col("sk_b"), K).cast("double")))
        .withColumn("est_union",
          when(size(col("u")) < K, col("exact_union").cast("double"))
            .otherwise(scale / element_at(col("u"), K).cast("double")))
        .withColumn("rho",
          size(expr("array_intersect(array_intersect(u, sk_a), sk_b)")).cast("long"))
        // divisor = |union sketch|, not the constant K: Beyer et al.'s
        // rho/k assumes a SATURATED sketch; on a small union the sketch
        // holds every hash and rho/|u| is the exact containment ratio
        // (identical to /K when saturated, unbiased when not)
        .withColumn("est_inter",
          (col("rho").cast("double") / size(col("u")).cast("double"))
            * col("est_union"))
        .select("est_a", "exact_a", "est_b", "exact_b",
          "est_union", "exact_union", "rho", "est_inter", "exact_inter")
    }),

    // f7 — bitwise functions.
    "f7_bitwise" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(255)).as("lo_byte"),
        (col("l_orderkey").bitwiseOR(4096)).as("with_flag"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("xored"),
        expr("shiftleft(l_orderkey, 2)").as("shl"),
        expr("shiftright(l_orderkey, 3)").as("shr"),
        expr("bit_count(l_orderkey)").as("popcnt"))
        // xored carries l_partkey — the only output not functionally
        // dependent on the (non-unique at sf1) key pair
        .orderBy("l_orderkey", "l_linenumber", "xored")),

    // f8 — pivot: long → wide with fixed pivot values (oracle replays as
    // conditional aggregation).
    "f8_pivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .orderBy("l_returnflag")),

    // f9 — null-safe equality (<=>) over an injected-null column.
    "f9_null_safe_eq" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("d", when(col("l_discount") > 0.05, col("l_discount")))
        .select(col("l_orderkey"), col("l_linenumber"), col("d"),
          (col("d") <=> 0.1).as("is_point_1"),
          (col("d") <=> lit(null)).as("is_null"),
          col("d").isNull.as("isnull_fn"))
        // d is nullable, so the tiebreak pins null placement explicitly
        // (Spark asc defaults NULLS FIRST, DuckDB NULLS LAST)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("d").asc_nulls_first)),

    // ts1 — time-series gap filling: the full hourly spine (sequence +
    // explode) left-joined to observed counts, gaps zero-filled.
    "ts1_gapfill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val spine = ev.agg(
          date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      spine.join(hourly, Seq("h"), "left")
        .select(unix_micros(col("h")).as("hour_us"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("hour_us")
    }),

    // ts2 — resample + linear interpolation [extension]: hourly
    // per-type means with interior gaps filled by interpolating between
    // the nearest observed buckets (prev/next located by ignoreNulls
    // window folds — no self-join, one shuffle on event_type). Spine
    // endpoints are observed buckets by construction, so every
    // interpolated row has both neighbors. All arithmetic mirrors the
    // oracle expression-for-expression (IEEE doubles are
    // order-deterministic; the bucket mean is decimal-exact).
    "ts2_resample_interpolate" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val bucketed = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(Det.davg(col("value")).as("v"))
      val spine = bucketed.groupBy("event_type")
        .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      val j = spine.join(bucketed, Seq("event_type", "h"), "left")
        .withColumn("hour_us", unix_micros(col("h")))
      val back = Window.partitionBy("event_type").orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("event_type").orderBy("hour_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val filled = j
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
        .withColumn("ph", last(when(col("v").isNotNull, col("hour_us")),
          ignoreNulls = true).over(back))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
        .withColumn("nh", first(when(col("v").isNotNull, col("hour_us")),
          ignoreNulls = true).over(fwd))
      filled.select(col("event_type"), col("hour_us"),
          when(col("v").isNotNull, col("v"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("hour_us") - col("ph")).cast("double") /
                (col("nh") - col("ph")).cast("double"))).as("val"),
          col("v").isNull.as("is_interp"))
        .orderBy("event_type", "hour_us")
    }),

    // ── W: window functions [extension per §2.5] ──────────────────────
    "w1_row_number" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
        .select("l_orderkey", "l_linenumber", "rn")
        .orderBy("l_orderkey", "l_linenumber", "rn")),

    // w2 — top-10-by-rank per priority. Naive form is a 5-partition
    // window sorting every order row on 5 hot tasks; instead phase 1
    // finds each priority's 10th-highest price with the O(k) map-side
    // TopKAggregator, and the rank/dense_rank window runs only over rows
    // ≥ that threshold. A kept row's rank depends only on rows with
    // price ≥ its own, and every row ≥ the 10th price survives the
    // filter, so ranks are bit-identical to the full window's.
    "w2_rank_dense" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAggregator(10),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong))
      val orders = Tables.orders(s, dir)
      val thr = orders.groupBy("o_orderpriority")
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        // groups with < 10 rows keep everything (short buffer → -inf).
        // ANSI mode makes element_at throw on out-of-range indexes, so
        // the size() guard — not coalesce — carries the fallback.
        .select(col("o_orderpriority"),
          when(size(col("top")) >= 10,
            element_at(col("top"), 10).getField("_1"))
            .otherwise(lit(Double.NegativeInfinity)).as("__thr"))
      orders.join(broadcast(thr), "o_orderpriority")
        .filter(col("o_totalprice") >= col("__thr"))
        .withColumn("rnk", rank().over(
          Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc)))
        .withColumn("drnk", dense_rank().over(
          Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc)))
        .filter(col("rnk") <= 10)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk", "drnk")
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    }),

    "w3_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price", "next_price")
        .orderBy("o_custkey", "o_orderkey")
    }),

    "w4_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "o_totalprice", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // w5 — distribution analytics: ntile / percent_rank / cume_dist
    // (pure rank arithmetic — engine-identical).
    "w5_analytic_suite" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .select("o_orderpriority", "o_orderkey", "o_totalprice",
          "quartile", "pct_rank", "cume")
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    }),

    // g7 — explicit GROUPING SETS with grouping-flag disambiguation.
    "g7_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("li_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS INT) AS gid,
              |  COUNT(*) AS n
              |FROM li_gs
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    }),

    // g8 — exact second-moment statistics: variance/stddev/corr from
    // decimal-exact power sums (engine-native stddev/corr use different
    // accumulation orders across engines; the two-pass power-sum form is
    // deterministic and still one distributed aggregation).
    "g8_stats_powersums" -> ((s, dir) => {
      val D = org.apache.spark.sql.types.DecimalType(38, 6)
      val q = col("l_quantity").cast(D)
      val p = col("l_extendedprice").cast(D)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(q).cast("double").as("s_q"),
          sum((col("l_quantity") * col("l_quantity")).cast(D)).cast("double").as("s_qq"),
          sum(p).cast("double").as("s_p"),
          sum((col("l_quantity") * col("l_extendedprice")).cast(D)).cast("double").as("s_qp"))
        .select(
          col("l_returnflag"),
          col("n"),
          (col("s_q") / col("n")).as("mean_q"),
          ((col("s_qq") - col("s_q") * col("s_q") / col("n")) / (col("n") - 1)).as("var_q"),
          sqrt((col("s_qq") - col("s_q") * col("s_q") / col("n")) / (col("n") - 1)).as("stddev_q"),
          ((col("s_qp") - col("s_q") * col("s_p") / col("n")) / (col("n") - 1)).as("covar_qp"))
        .orderBy("l_returnflag")
    }),

    // f6 — array aggregation: per-group sorted distinct collection. The
    // collected array is emitted joined to a string because the driver's
    // comparator sorts result columns with pandas, which cannot hash raw
    // array cells (round-1 gate failure was exactly that, not a value
    // mismatch).
    "f6_array_collect" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
          countDistinct(col("l_linestatus")).as("n_statuses"))
        .orderBy("l_returnflag")),

    // j5 — as-of join [absent in reference — extension]: each order joins
    // the most recent quarter-start anchor ≤ its date, via the public
    // `Joins.asofJoin` API (the scalable union + last(ignoreNulls)
    // window form — partitioned by year, so anchors recur per partition
    // and no cross-partition carry is needed; a range-condition join
    // never appears). The oracle replays it with DuckDB's native ASOF
    // JOIN; random-input semantics proven vs a naive nested-loop
    // reference in DifferentialSpec.
    "j5_asof_join" -> ((s, dir) => {
      val orders = Tables.orders(s, dir).select(
        col("o_orderkey"), to_date(col("o_orderdate")).as("d"),
        year(col("o_orderdate")).as("yr"))
      val anchors = orders
        .select(col("yr"), to_date(date_trunc("quarter", col("d"))).as("d")).distinct()
        .withColumn("rate", (col("yr") * 100 + month(col("d"))).cast("long"))
      graft.ops.Joins.asofJoin(orders, anchors, keys = Seq("yr"),
          leftTime = "d", rightTime = "d",
          extraOrder = Seq(col("o_orderkey").asc_nulls_first))
        .select(col("o_orderkey"), col("d").as("o_date"),
          col("rate").as("asof_rate"))
        .orderBy("o_orderkey")
    }),

    // p7 — DYNAMIC partition pruning [scale path]: the fact is laid out
    // partitionBy(year); the joined dim's qualifying years are only
    // known at runtime (the filter is on a derived dim attribute, not
    // the partition column), so Catalyst injects a dynamicpruning
    // subquery into the fact scan — at 100 TB the fact reads only the
    // partitions the dim selects, discovered at run time (PlanShapeSpec
    // asserts the dynamicpruningexpression).
    "p7_dynamic_pruning" -> ((s, dir) => {
      val out = s"/root/repo/target/sink/p7_fact_${Tables.dirSlug(dir)}"
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("year"))
        .write.mode("overwrite").partitionBy("year").parquet(out)
      val fact = s.read.parquet(out)
      val dim = Tables.lineitem(s, dir)
        .select(year(col("l_shipdate")).as("year")).distinct()
        .withColumn("tag", col("year") % 2)
        .filter(col("tag") === 1)
      fact.join(broadcast(dim), Seq("year"))
        .groupBy("year")
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("total"))
        .select(col("year").cast("long").as("year"), col("n_orders"), col("total"))
        .orderBy("year")
    }),

    // j7 — RANGE (interval) join [absent in reference — extension]: each
    // lineitem joins the quarter interval containing its ship date.
    // Scalable form: a naive range join is a cross product + filter, so
    // instead each interval EXPLODES to the coarse month bins it covers
    // and each point maps to its bin — the join is then an equi-join on
    // the bin (3 rows per quarter interval), refined by the exact range
    // predicate. Candidate count is |points| (each point meets only its
    // own bin's intervals), not |points|·|intervals|. The oracle is
    // DuckDB's native inequality join.
    "j7_range_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as("d"),
          col("l_extendedprice"))
      // trunc (DATE-native) over date_trunc (which upcasts DATE →
      // TIMESTAMP and pays per-row timezone logic): the distinct-
      // quarters pass measured 2.7 → 1.0 s on the 60M-row sf10
      // fixture, identical values (SCALE.md round-11 ladder)
      val intervals = li
        .select(trunc(col("d"), "quarter").as("qstart")).distinct()
        .withColumn("qend", add_months(col("qstart"), 3))
      // bin = month: a quarter interval spans exactly 3 month bins
      graft.ops.Joins.pointInIntervalJoin(li, intervals,
          pointCol = "d", startCol = "qstart", endCol = "qend",
          binOf = d => trunc(d, "mon"),
          binsOf = (qs, _) => array((0 until 3).map(i => add_months(qs, i)): _*))
        .groupBy("qstart")
        .agg(count(lit(1)).as("n_lines"),
          Det.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("qstart")
    }),

    // j8 — interval×interval OVERLAP join [extension past j7]: both
    // sides span date ranges (j7's probe side is points), the shape of
    // "which promotion windows overlapped which outage windows". Both
    // interval sets explode to the month bins they touch, candidates
    // come from the bin equi-join (∝ temporal locality, never |A|×|B|),
    // pairs dedup on ids BEFORE the exact refine + overlap arithmetic.
    // Oracle = DuckDB's native inequality join (the naive formulation),
    // so the binned plan is proven against an independent algorithm.
    "j8_interval_overlap" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      def iv(priority: String, mod: Int, days: Int, tag: String) = orders
        .filter(col("o_orderpriority") === priority && col("o_orderkey") % mod === 0)
        .select(col("o_orderkey").as(s"${tag}_key"),
          to_date(col("o_orderdate")).as(s"${tag}_start"),
          date_add(to_date(col("o_orderdate")), days).as(s"${tag}_end"))
      graft.ops.Joins.intervalOverlapJoin(
          iv("1-URGENT", 97, 20, "a"), iv("2-HIGH", 89, 15, "b"),
          aStart = "a_start", aEnd = "a_end",
          bStart = "b_start", bEnd = "b_end",
          binsOf = (s0, e0) => sequence(date_trunc("month", s0),
            date_trunc("month", date_sub(e0, 1)), expr("interval 1 month")))
        .select(col("a_key"), col("b_key"),
          datediff(least(col("a_end"), col("b_end")),
            greatest(col("a_start"), col("b_start"))).as("overlap_days"))
        .orderBy("a_key", "b_key")
    }),

    // skew — two-phase salted aggregation: partial aggregate on
    // (key, salt) spreads a hot key over the cluster, final aggregate
    // re-combines. Decimal partials keep the result bit-equal to the
    // unsalted form (the oracle aggregates directly).
    "skew_salted_agg" -> ((s, dir) => {
      val D = org.apache.spark.sql.types.DecimalType(38, 6)
      Tables.orders(s, dir)
        .withColumn("salt", pmod(col("o_orderkey"), lit(8)))
        .groupBy("o_orderpriority", "salt")
        .agg(count(lit(1)).as("pn"), sum(col("o_totalprice").cast(D)).as("ps"))
        .groupBy("o_orderpriority")
        .agg(sum(col("pn")).as("n_orders"), sum(col("ps")).cast("double").as("total_price"))
        .orderBy("o_orderpriority")
    }),

    // skew_salted_join [scale path] — hot-key JOIN salting: the build
    // side replicates each dim row S times (one per salt), the probe
    // side computes a deterministic salt, and the join key becomes
    // (key, salt) — a hot fact key now lands on S reducers instead of
    // one. Row set provably equals the unsalted join (every fact row
    // still meets exactly one copy of its dim row), so the oracle joins
    // plain. AQE's skew-join split is the automatic form; this is the
    // layout-level form that also works under sort-merge bucketing.
    "skew_salted_join" -> ((s, dir) => {
      val S = 8
      val fact = Tables.lineitem(s, dir)
        .withColumn("salt", pmod(col("l_orderkey") + col("l_linenumber"), lit(S)))
      val dim = Tables.supplier(s, dir)
        .withColumn("salt", explode(lit((0 until S).toArray)))
      fact.join(dim,
          col("l_suppkey") === col("s_suppkey") && fact("salt") === dim("salt"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_lines"),
          Det.dsum(col("l_quantity")).as("total_qty"))
        .orderBy("s_name")
    }),

    // bkt — bucketed co-located join [scale path]: both sides written
    // bucketBy(orderkey) with matching bucket counts join with NO
    // exchange on either side (the layout decision that removes the
    // fact-load shuffle at 100 TB; SCALE.md "fact load" row).
    "bkt_bucketed_join" -> ((s, dir) => {
      val tag = Tables.dirSlug(dir)
      val (ot, lt) = (s"bkt_orders_$tag", s"bkt_lineitem_$tag")
      // Project to the join/agg columns before the bucketed write: the
      // layout decision being exercised is the bucket co-location, and a
      // real pipeline would bucket curated (pruned) tables, not every
      // source column. (Round 1 wrote all 9+16 columns — ~5× the I/O.)
      // The layout is written once per session (Shared.setupOnce): a
      // bucketed table is a persistent artifact queried many times —
      // the operator under test is the exchange-free JOIN over it.
      // repartition(8, key) uses the SAME HashPartitioning as bucketBy's
      // bucket id (murmur3 mod 8), so every write task holds exactly one
      // bucket: the write runs 8-way parallel (the source scans are
      // single-task) and each bucket stays one file — without this the
      // one scan task writes all 8 buckets serially.
      Shared.setupOnce(s, dir, "bkt_tables") {
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
          .repartition(8, col("o_orderkey"))
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"/root/repo/target/sink/$ot")
          .saveAsTable(ot)
        Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice")
          .repartition(8, col("l_orderkey"))
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"/root/repo/target/sink/$lt")
          .saveAsTable(lt)
      }
      // hint("merge") forces sort-merge so the co-located bucket layout
      // is what's exercised (at fixture scale Catalyst would broadcast);
      // matching bucketing on both sides elides the join exchanges.
      s.table(ot).hint("merge")
        .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          Det.dsum(col("l_extendedprice")).as("total_price"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H-shaped analytics battery over the star schema [extension]:
    // the throughput-representative shapes (selective star joins +
    // grouped aggregation + top-k).
    "tpch_q3_shipping" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(to_date(col("o_orderdate")) < lit("1998-01-01"))
      val l = Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")) > lit("1996-01-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_date"),
          col("o_orderpriority"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "tpch_q5_local_volume" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1996)
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    "tpch_q10_returns" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val n = Tables.nation(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // q6 shape — pure scan + selective filter + global aggregate: the
    // pushdown showcase (no join, no shuffle beyond the final combine).
    // The year predicate is written as a literal timestamp RANGE, not
    // year(l_shipdate)=1996: a function over the column defeats parquet
    // filter pushdown, a range on the raw column reaches the scan and
    // prunes row groups by min/max stats (PlanShapeSpec asserts it).
    "tpch_q6_forecast" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(Det.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))),

    // q12 shape — join + conditional aggregation: priority-class line
    // counts per linestatus (fixtures carry no l_shipmode, so linestatus
    // plays its role).
    "tpch_q12_priority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).filter(year(col("l_shipdate")) === 1996)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // q14 shape — join + conditional ratio: promo revenue share for one
    // shipdate month (literal range → pushed scan filter; part side
    // broadcasts).
    "tpch_q14_promo" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      val p = Tables.part(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          Det.dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0))).as("promo_rev"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("total_rev"))
        .select(
          (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"),
          col("promo_rev"), col("total_rev"))
    }),

    // q18 shape — large-volume orders: aggregate-then-having on the fact,
    // join survivors back to their order/customer rows, top-20.
    "tpch_q18_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 150.0)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // q2 shape — min-cost supplier per part: the correlated-scalar-min
    // subquery, decorrelated into one window min over the per-(part,
    // supplier) aggregate (fixtures carry no partsupp, so avg unit price
    // from lineitem plays ps_supplycost). The p_size filter is pushed
    // BELOW the aggregate as a broadcast left-semi: the per-part window
    // min never compares across parts, so dropping whole parts before
    // the (l_partkey, l_suppkey) aggregate is semantics-preserving and
    // shrinks the shuffle by the filter's selectivity. Both the
    // aggregate and the window shuffle on l_partkey — one exchange
    // feeds both.
    "tpch_q2_min_cost" -> ((s, dir) => {
      val smallPart = Tables.part(s, dir).filter(col("p_size") < 10)
      val unit = Tables.lineitem(s, dir)
        .join(broadcast(smallPart.select(col("p_partkey").as("pk_keep"))),
          col("l_partkey") === col("pk_keep"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(Det.davg(Det.q6(col("l_extendedprice") / col("l_quantity"))).as("avg_unit"))
      val best = unit
        .withColumn("min_unit",
          min(col("avg_unit")).over(Window.partitionBy("l_partkey")))
        .filter(col("avg_unit") === col("min_unit"))
      best.join(broadcast(smallPart),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("min_unit"))
        .orderBy("p_partkey", "s_suppkey")
    }),

    // q4 shape — EXISTS decorrelated to a left-semi join (fixtures carry
    // no commit/receipt dates, so "late" ≙ a returned line).
    "tpch_q4_priority_exists" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-10-01")))
      val ret = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      o.join(ret, o("o_orderkey") === ret("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // q13 shape — customer order-count distribution: LEFT OUTER join so
    // zero-order customers survive into the c_count=0 bucket, then a
    // second aggregate over the first.
    "tpch_q13_custdist" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      Tables.customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // q15 shape — top supplier by period revenue: the scalar MAX
    // subquery as a 1-row broadcast joined back on equality (ties all
    // surface, deterministically — revenue is decimal-exact).
    "tpch_q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.join(broadcast(mx), col("total_revenue") === col("max_revenue"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // q17 shape — correlated per-part AVG subquery, decorrelated: semi-
    // join the fact down to the brand's parts FIRST (so the threshold agg
    // reads only relevant rows), then agg and join share one l_partkey
    // exchange.
    "tpch_q17_small_qty" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#23")
        .select("p_partkey")
      val lb = Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val thr = lb.groupBy(col("l_partkey").as("t_partkey"))
        .agg((Det.davg(col("l_quantity")) * 0.2).as("qty_thr"))
      lb.join(thr, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg((Det.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    }),

    // q19 shape — disjunction of conjunct groups as the join residual:
    // Catalyst extracts the common l_partkey equi-key and pushes the
    // p_brand/p_size disjuncts to the broadcast side.
    "tpch_q19_disjunctive" -> ((s, dir) => {
      val disj =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey") && disj)
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // q21 shape — the EXISTS / NOT-EXISTS pair over the same fact: lines
    // returned in finished multi-supplier orders where no OTHER supplier
    // also returned. Semi + anti self-joins all keyed on l_orderkey with
    // the supplier inequality as residual — one exchange feeds the chain.
    "tpch_q21_waiting" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val fOrders = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val l1 = l.filter(col("l_returnflag") === "R")
        .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      val others = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val withOther = l1.join(others,
        col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      val othersR = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      val sole = withOther.join(othersR,
        col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
        "left_anti")
      sole.groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey").asc)
        .limit(20)
    }),

    // q22 shape — global scalar AVG + NOT EXISTS: rich customers with no
    // large orders. The average broadcasts as a 1-row join; the NOT
    // EXISTS is a left-anti join against the filtered orders (fixtures
    // carry no phone, nationkey plays the country code; every fixture
    // customer has *some* order, so the anti-join is against
    // o_totalprice > 300000 — non-empty at sf0.001/0.01/0.1 so the
    // differential gate actually exercises the join direction).
    "tpch_q22_balance" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val avgbal = c.filter(col("c_acctbal") > 0.0)
        .agg(Det.davg(col("c_acctbal")).as("avg_bal"))
      c.join(broadcast(avgbal), col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, dir)
            .filter(col("o_totalprice") > 300000.0).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          Det.dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // q1 shape — the full pricing-summary battery over one scan: eight
    // aggregates reduce map-side to 4 groups before the single exchange.
    // Product addends are Det.q6-quantized so the decimal casts are
    // tie-free in both engines (see Det.q6).
    "tpch_q1_pricing" -> ((s, dir) => {
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val charge = disc * (lit(1) + col("l_tax"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base_price"),
          Det.dsum(Det.q6(disc)).as("sum_disc_price"),
          Det.dsum(Det.q6(charge)).as("sum_charge"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          Det.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // q7 shape — volume shipping between two nations, both directions.
    // Supplier and customer are nation-filtered BEFORE the fact joins
    // (the disjunctive pair predicate can't be pushed through the join,
    // but its single-side implication can — manually), so the broadcast
    // hash tables carry only the two nations' rows; the only shuffle is
    // lineitem⋈orders on orderkey.
    "tpch_q7_volume" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(n.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .select("s_suppkey", "supp_nation")
      val cust = Tables.customer(s, dir)
        .join(broadcast(n.select(col("n_nationkey").as("cnk"),
          col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
        .select("c_custkey", "cust_nation")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(Det.dsum(Det.q6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // q8 shape — national market share inside a region: the share is a
    // ratio of two decimal-exact sums over the same grouped rows (one
    // aggregate, identical division in both engines). Part and customer
    // survive only as semi-join filters — no payload columns travel.
    "tpch_q8_market_share" -> ((s, dir) => {
      val vol = Det.q6(col("l_extendedprice") * (lit(1) - col("l_discount")))
      val amerCust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)
            .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("amk"))),
          col("c_nationkey") === col("amk"), "left_semi")
        .select("c_custkey")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate").between(
              to_timestamp(lit("1996-01-01")), to_timestamp(lit("1997-12-31"))))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(amerCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((Det.dsum(when(col("supp_nation") === "NATION_1", vol).otherwise(lit(0.0))) /
          Det.dsum(vol)).as("mkt_share"))
        .orderBy("o_year")
    }),

    // q9 shape — product profit by nation × year. The fixtures carry no
    // partsupp, so supply cost is the per-(part, supplier) mean unit
    // price (q2's derivation): a second aggregate over the fact joined
    // back on the (partkey, suppkey) pair — a genuine shuffle join whose
    // two sides share the grouping key; dims broadcast.
    //
    // The pair key is NEAR-UNIQUE in the fact (≈1.1 rows/pair at every
    // SF), so a plain groupBy's map-side partial aggregate achieves no
    // reduction while holding its task's full slice as a hash map —
    // at sf10 under 16-thread/20 GiB executors that partial-agg
    // spill-merge OOMs before the reduce side ever runs. Repartition
    // by the pair FIRST: the raw-row shuffle is the same volume the
    // no-op partial agg would have written, and aggregation state
    // shrinks from (task's scan slice) to (corpus / shuffle
    // partitions) — the knob that actually scales.
    "tpch_q9_profit" -> ((s, dir) => {
      val ps = Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .repartition(col("l_partkey"), col("l_suppkey"))
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(Det.davg(Det.q6(col("l_extendedprice") / col("l_quantity")))
          .as("ps_supplycost"))
      val amount = Det.q6(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_name").like("small%"))
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(ps, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(Det.dsum(amount).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // q11 shape — important stock: synthetic partsupp rows derived from
    // the fact (availqty = lifetime shipped qty, cost = mean unit
    // price), per-part value vs a 1e-4 global-value threshold delivered
    // as a broadcast one-row cross join (never a collect).
    "tpch_q11_important_stock" -> ((s, dir) => {
      val sup3 = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select("s_suppkey")
      val ps = Tables.lineitem(s, dir)
        .join(broadcast(sup3), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(Det.dsum(col("l_quantity")).as("availqty"),
          Det.davg(Det.q6(col("l_extendedprice") / col("l_quantity"))).as("unit_cost"))
        .withColumn("value", Det.q6(col("availqty") * col("unit_cost")))
      val grp = ps.groupBy("l_partkey").agg(Det.dsum(col("value")).as("part_value"))
      // The global threshold re-aggregates grp, not ps: per-part sums of
      // 6dp-quantized values are exact in double (magnitudes ≪ 2^53·1e-6),
      // so summing part_value decimal-exactly equals the global sum over
      // pairs bit-for-bit — and the expensive ps subtree is computed once.
      val tot = grp.agg((Det.dsum(col("part_value")) * lit(1e-4)).as("threshold"))
      grp.crossJoin(broadcast(tot))
        .filter(col("part_value") > col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),

    // q16 shape — supplier-relationship count per part attribute. The
    // distinct (part, supplier) fact pairs play partsupp; suppliers with
    // negative balance play the complaint filter; COUNT(DISTINCT) is
    // exact (expand + two-phase agg, no sketch).
    "tpch_q16_supplier_cnt" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey").distinct()
      val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0).select("s_suppkey")
      pairs
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, dir)
            .filter(col("p_brand") =!= "Brand#9" && !col("p_type").like("MED%") &&
              col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // q20 shape — potential promotion: suppliers whose 1998 availability
    // of a 'small%' part exceeds half their 1996 shipments. Both sides
    // of the comparison aggregate the same fact under different date
    // windows and meet on the (part, supplier) pair — two map-filtered
    // aggregates, one pair join, then everything broadcasts.
    "tpch_q20_promotion" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val shipped96 = li
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .groupBy(col("l_partkey").as("k96p"), col("l_suppkey").as("k96s"))
        .agg(Det.dsum(col("l_quantity")).as("qty96"))
      val avail98 = li
        .filter(col("l_shipdate") >= to_timestamp(lit("1998-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1999-01-01")))
        .groupBy(col("l_partkey").as("k98p"), col("l_suppkey").as("k98s"))
        .agg(Det.dsum(col("l_quantity")).as("avail98"))
      val cand = avail98
        .join(shipped96, col("k98p") === col("k96p") && col("k98s") === col("k96s"))
        .filter(col("avail98") > lit(0.5) * col("qty96"))
        .join(broadcast(Tables.part(s, dir).filter(col("p_name").like("small%"))
            .select("p_partkey")),
          col("k98p") === col("p_partkey"), "left_semi")
        .select(col("k98s").as("cand_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(broadcast(cand), col("s_suppkey") === col("cand_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, dir)
            .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    }),

    // f14 — unpivot (wide → long), the inverse of f8's pivot: per-year
    // status counts melted back to (year, status, count) rows via the
    // native unpivot operator (a generator, not a union of scans).
    "f14_unpivot" -> ((s, dir) => {
      val wide = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_filled"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_pending"))
      wide.unpivot(Array(col("order_year")),
          Array(col("n_open"), col("n_filled"), col("n_pending")),
          "status_col", "n_orders")
        .orderBy("order_year", "status_col")
    }),

    // g13 — histogram quantile [scale path]: approximate median from a
    // fixed-width bin histogram — one pass, O(bins) state per group,
    // mergeable across partitions (bin counts add), and fully
    // engine-portable: unlike HLL (g6), the ESTIMATE hash-matches the
    // oracle because both engines bin, accumulate, and interpolate
    // identically. The quantile bin is picked by a min-struct aggregate
    // over bins past the target rank (no second scan).
    "g13_histogram_quantile" -> ((s, dir) => {
      val W = lit(1000.0)
      val binned = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), floor(col("o_totalprice") / W).as("bin"))
        .agg(count(lit(1)).as("n"))
      val cum = binned
        .withColumn("cum", sum(col("n")).over(
          Window.partitionBy("o_orderpriority").orderBy("bin")))
        .withColumn("tot", sum(col("n")).over(
          Window.partitionBy("o_orderpriority")))
      val hit = cum
        .filter(col("cum").cast("double") >= col("tot").cast("double") * lit(0.5))
        .groupBy("o_orderpriority")
        .agg(min(struct(col("bin"), col("n"), col("cum"), col("tot"))).as("s"))
      hit.select(col("o_orderpriority"),
          (col("s.bin") * W + W *
            ((col("s.tot").cast("double") * lit(0.5) -
              (col("s.cum") - col("s.n")).cast("double")) /
              col("s.n").cast("double"))).as("est_p50"),
          col("s.tot").as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // g12 — sampled approximate quantiles [scale path]: exact interpolated
    // quantiles over a 10% deterministic hash sample — the estimate both
    // engines can replay bit-for-bit (same md5 predicate, same sample;
    // binary-exact fractions keep the interpolation arithmetic identical,
    // as in g9). At 100 TB this reads a tenth of the data for quantiles
    // within ~1e-2 of exact.
    "g12_sampled_quantile" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter((graft.functions.DetHash.h(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))) % 10) === 0)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("q"),
          count(lit(1)).as("n_sampled"))
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("p25"),
          element_at(col("q"), 2).as("p50"),
          element_at(col("q"), 3).as("p75"),
          col("n_sampled"))
        .orderBy("l_returnflag")),

    // o5 — SCD-2 history build via the public `DimOps.scd2History`: each
    // order is an "update" to its customer's priority attribute; change
    // detection (lag) keeps only transitions, then validity intervals
    // come from lead over the surviving changes — [valid_from, valid_to)
    // rows with is_current, the classic type-2 dimension. Both windows
    // shuffle once on custkey; random-history semantics proven vs a
    // sequential fold in DifferentialSpec.
    "o5_scd2_history" -> ((s, dir) =>
      graft.etl.DimOps.scd2History(Tables.orders(s, dir),
          keyCol = "o_custkey", dateCol = "o_orderdate",
          tieCol = "o_orderkey", attrCol = "o_orderpriority")
        .select(col("o_custkey").as("cust_id"),
          col("o_orderkey").as("change_id"),
          col("o_orderpriority").as("priority"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("cust_id", "valid_from", "change_id")),

    // o6 — MERGE with deletes: the full MERGE INTO surface (WHEN MATCHED
    // AND op='D' THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT
    // MATCHED THEN INSERT) as one full-outer join + row-presence picks.
    // Incoming rows derive deterministically from the fixture.
    "o6_merge_delete" -> ((s, dir) => {
      val ex = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("id"), col("s_name").as("name"),
          col("s_acctbal").as("acctbal"))
      val upd = ex.filter(col("id") % 3 === 0 && col("id") % 5 =!= 0)
        .select(col("id"), col("name"),
          (col("acctbal") + 100.0).as("acctbal"), lit("U").as("op"))
      val del = ex.filter(col("id") % 5 === 0)
        .select(col("id"), col("name"), col("acctbal"), lit("D").as("op"))
      val ins = ex.filter(col("id") % 7 === 0)
        .select((col("id") + 2000000L).as("id"),
          concat(lit("INS "), col("name")).as("name"),
          col("acctbal"), lit("I").as("op"))
      val inc = upd.unionByName(del).unionByName(ins)
        .select(col("id").as("i_id"), col("name").as("i_name"),
          col("acctbal").as("i_acctbal"), col("op"))
      ex.join(inc, col("id") === col("i_id"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(coalesce(col("id"), col("i_id")).as("id"),
          when(col("op").isin("U", "I"), col("i_name"))
            .otherwise(col("name")).as("name"),
          when(col("op").isin("U", "I"), col("i_acctbal"))
            .otherwise(col("acctbal")).as("acctbal"))
        .orderBy("id")
    }),

    // o4 — SCD-1 merge (MERGE INTO semantics): matched keys take the
    // incoming row, unmatched existing rows survive, brand-new keys
    // insert — one full-outer join + coalesce, no per-row logic. The
    // "updates" are a deterministic derivation from the fixture
    // (acctbal +100 for every third supplier, plus synthetic new keys).
    "o4_scd1_merge" -> ((s, dir) => {
      val existing = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("id"), col("s_name").as("name"),
          col("s_acctbal").as("acctbal"))
      val updates = existing.filter(col("id") % 3 === 0)
        .withColumn("acctbal", col("acctbal") + 100.0)
      val inserts = existing.filter(col("id") % 7 === 0)
        .select((col("id") + 1000000L).as("id"),
          concat(lit("NEW "), col("name")).as("name"), col("acctbal"))
      graft.etl.DimOps.merge(existing, updates.unionByName(inserts), Seq("id"))
        .orderBy("id")
    }),

    // f10 — map-type functions: construction, lookup, key listing.
    "f10_map_funcs" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("m", map(
          lit("price"), col("o_totalprice"),
          lit("key"), col("o_orderkey").cast("double")))
        .select(col("o_orderkey"),
          element_at(col("m"), "price").as("price_via_map"),
          size(col("m")).as("m_size"),
          array_join(map_keys(col("m")), ",").as("keys_csv"))
        .orderBy("o_orderkey")),

    // f11 — regex group extraction.
    "f11_regexp_extract" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"))
        .orderBy("p_partkey")),

    // sm1 — deterministic hash sampling: the scale-correct reproducible
    // sample (hash the key, keep a residue class) — unlike rng-based
    // df.sample, replayable by any engine.
    "sm1_hash_sample" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter((graft.functions.DetHash.h(col("o_orderkey").cast("string")) % 10) === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // sm2 — deterministic STRATIFIED sampling [extension]: per-stratum
    // rates (50% of 'en' docs, 10% of everything else) from the same
    // md5-hash bucketing as sm1 — reproducible across runs and engines,
    // no RNG, pure map (the curation-pipeline downsampling step).
    "sm2_stratified_sample" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("__h",
          graft.functions.DetHash.h(col("doc_id").cast("string")) % 100)
        .filter(when(col("lang") === "en", col("__h") < 50)
          .otherwise(col("__h") < 10))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // f12 — date arithmetic: add/diff/last_day/month-truncate.
    "f12_datetime_arith" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate")))
          .as("days_to_y2k"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        trunc(to_date(col("o_orderdate")), "month").as("month_start"))
        .orderBy("o_orderkey")),

    // u2 — UNION with set semantics (vs u1's UNION ALL).
    "u2_union_distinct" -> ((s, dir) => {
      val cn = Tables.customer(s, dir).select(col("c_nationkey").cast("long").as("nationkey"))
      val sn = Tables.supplier(s, dir).select(col("s_nationkey").cast("long").as("nationkey"))
      cn.union(sn).distinct().orderBy("nationkey")
    }),

    // c1 — explicit cross join (small × small).
    "c1_cross_join" -> ((s, dir) =>
      Tables.nation(s, dir).select(col("n_name"))
        .crossJoin(Tables.region(s, dir).select(col("r_name")))
        .orderBy("n_name", "r_name")),

    // w6 — RANGE frame: value-based window (ties share the frame, so the
    // result is order-independent within equal sort values).
    "w6_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(year(col("o_orderdate")).cast("long"))
        .rangeBetween(-1, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("two_year_spend",
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .over(w).cast("double"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          year(col("o_orderdate")).cast("long").as("yr"), col("two_year_spend"))
        .orderBy("o_orderkey")
    }),

    // w7 — value window functions over an explicit full frame.
    "w7_value_functions" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          first(col("o_totalprice")).over(w).as("max_in_prio"),
          last(col("o_totalprice")).over(w).as("min_in_prio"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_in_prio"))
        .orderBy("o_orderkey")
    }),

    // ── O: sort / limit / top-k [extension per §2.6] ──────────────────
    "o1_multi_sort" -> ((s, dir) =>
      Tables.supplier(s, dir)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy(col("s_nationkey").asc, col("s_acctbal").desc, col("s_suppkey").asc)),

    // top-k plans as TakeOrderedAndProject — no full sort at scale.
    "o2_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // ── U/E/I: set operations (§2.7) ──────────────────────────────────
    "u1_union_all" -> ((s, dir) => {
      val cn = Tables.customer(s, dir).select(col("c_nationkey").cast("long").as("nationkey"))
      val sn = Tables.supplier(s, dir).select(col("s_nationkey").cast("long").as("nationkey"))
      cn.unionByName(sn).groupBy("nationkey").agg(count(lit(1)).as("n")).orderBy("nationkey")
    }),

    "e1_except" -> ((s, dir) => {
      val cn = Tables.customer(s, dir).select(col("c_nationkey").cast("long").as("nationkey"))
      val sn = Tables.supplier(s, dir).select(col("s_nationkey").cast("long").as("nationkey"))
      cn.except(sn).orderBy("nationkey")
    }),

    "i1_intersect" -> ((s, dir) => {
      val cn = Tables.customer(s, dir).select(col("c_nationkey").cast("long").as("nationkey"))
      val sn = Tables.supplier(s, dir).select(col("s_nationkey").cast("long").as("nationkey"))
      cn.intersect(sn).orderBy("nationkey")
    }),

    // ── F: scalar functions (§2.8) ────────────────────────────────────
    // F1-F5: date parts incl. the reference's quarter-start-month
    // ("three_months", warehouse.py:164-165).
    "f1_date_parts" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        ((quarter(col("o_orderdate")) - 1) * 3 + 1).cast("long").as("three_months"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"))
        .orderBy("o_orderkey")),

    "f2_string_funcs" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        trim(col("p_type")).as("tr"),
        substring(col("p_name"), 1, 5).as("sub"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
        size(split(col("p_name"), " ")).as("n_words"),
        length(col("p_name")).cast("long").as("len"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"))
        .orderBy("p_partkey")),

    "f3_math_funcs" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25.0).as("dev"),
        floor(col("l_extendedprice")).cast("long").as("fl"),
        ceil(col("l_extendedprice")).cast("long").as("ce"),
        round(col("l_discount") * 100, 0).as("disc_pct"),
        sqrt(col("l_quantity")).as("rt"),
        pmod(col("l_orderkey"), lit(7L)).as("mod7"))
        // non-unique key pair at sf1 volume: deterministic sort needs
        // the value columns too (dev alone is |q-25| — not injective)
        .orderBy("l_orderkey", "l_linenumber", "rt", "fl", "ce", "disc_pct")),

    // F-json [extension]: events.props is JSON text (FIXTURES.md).
    "f4_json_extract" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    "f5_conditional" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("DEFAULT")).as("seg"),
        when(col("c_acctbal") < 0, "debtor")
          .when(col("c_acctbal") < 5000, "regular")
          .otherwise("premium").as("tier"))
        .orderBy("c_custkey")))

  val oracles: Map[String, String] = Map(
    "s1_full_scan" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |       CAST(l_shipdate AS DATE) AS l_shipdate
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_quantity, l_extendedprice""".stripMargin,

    "s2_routed_scan" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey",

    "s3_multi_concat" ->
      """SELECT name, src FROM (
        |  SELECT c_name AS name, 'customer' AS src FROM customer
        |  UNION ALL SELECT s_name, 'supplier' FROM supplier
        |  UNION ALL SELECT p_name, 'part' FROM part)
        |ORDER BY src, name""".stripMargin,

    "s4_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey = 42""".stripMargin,

    "s5_natural_key_lookup" ->
      """WITH subcat AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY p_type) AS BIGINT) AS id,
        |         p_type AS subcategory
        |  FROM (SELECT DISTINCT p_type FROM part))
        |SELECT id, subcategory FROM subcat
        |WHERE subcategory = (SELECT min(subcategory) FROM subcat)""".stripMargin,

    "src_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "src_orc_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    // the Morton interleave is generated from the same bit spec as the
    // Spark Column (Layout.duckZ), so the two engines cannot drift
    "zo1_zorder_layout" ->
      s"""WITH z AS (
         |  SELECT ${graft.ops.Layout.duckZ("l_partkey", "l_suppkey")} AS zv,
         |         l_extendedprice
         |  FROM lineitem
         |  WHERE l_partkey BETWEEN 1 AND 2000 AND l_suppkey BETWEEN 1 AND 200)
         |SELECT (zv >> 16) AS zbucket, count(*) AS n,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,

    // compaction is content-preserving: the compacted copy aggregates
    // exactly like the source table
    "cp1_compaction" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "g9_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.50) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "g10_filtered_agg" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  CAST(CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice
        |                     ELSE 0.0 END AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS discounted_price,
        |  COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // KMV replayed exactly: distinct H per group, 16th-smallest, same
    // (k-1)·2^60 double constant, one IEEE division
    "g11_kmv_distinct" ->
      """WITH d AS (SELECT DISTINCT l_returnflag,
        |    (('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::UBIGINT)::BIGINT AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk FROM d),
        |kk AS (SELECT l_returnflag, h AS h_k FROM r WHERE rk = 16),
        |nh AS (SELECT l_returnflag, COUNT(*) AS nd FROM d GROUP BY 1),
        |ex AS (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
        |  FROM lineitem GROUP BY 1)
        |SELECT ex.l_returnflag,
        |  CASE WHEN nh.nd < 16 THEN CAST(nh.nd AS DOUBLE)
        |       ELSE (15.0 * 1152921504606846976.0) / CAST(kk.h_k AS DOUBLE)
        |  END AS est_distinct,
        |  ex.exact_distinct
        |FROM ex JOIN nh USING (l_returnflag) LEFT JOIN kk USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    // Replays the KMV algebra relationally: sketches = first 64 hash
    // ranks per set, union sketch = first 64 of the merged distinct
    // hashes, rho = union-sketch members present in BOTH sketches.
    "g14_sketch_algebra" ->
      """WITH da AS (SELECT DISTINCT o_custkey,
        |    (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::UBIGINT)::BIGINT AS h
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |db AS (SELECT DISTINCT o_custkey,
        |    (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::UBIGINT)::BIGINT AS h
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |ra AS (SELECT h, row_number() OVER (ORDER BY h) AS rk
        |       FROM (SELECT DISTINCT h FROM da)),
        |rb AS (SELECT h, row_number() OVER (ORDER BY h) AS rk
        |       FROM (SELECT DISTINCT h FROM db)),
        |ka AS (SELECT h FROM ra WHERE rk <= 64),
        |kb AS (SELECT h FROM rb WHERE rk <= 64),
        |uu AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM (
        |         SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb))),
        |ku AS (SELECT h FROM uu WHERE rk <= 64),
        |ui AS (SELECT o_custkey,
        |         max(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS ina,
        |         max(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS inb
        |       FROM orders GROUP BY 1),
        |ex AS (SELECT
        |    CAST(sum(CASE WHEN ina = 1 OR inb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_union,
        |    CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
        |  FROM ui),
        |sc AS (SELECT
        |    (SELECT count(*) FROM da) AS exact_a,
        |    (SELECT count(*) FROM db) AS exact_b,
        |    (SELECT count(*) FROM ra) AS nha,
        |    (SELECT count(*) FROM rb) AS nhb,
        |    (SELECT count(*) FROM uu) AS nhu,
        |    (SELECT h FROM ra WHERE rk = 64) AS hka,
        |    (SELECT h FROM rb WHERE rk = 64) AS hkb,
        |    (SELECT h FROM uu WHERE rk = 64) AS hku,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ku
        |       JOIN ka USING (h) JOIN kb USING (h)) AS rho),
        |fin AS (SELECT
        |    CASE WHEN nha < 64 THEN CAST(exact_a AS DOUBLE)
        |         ELSE (63.0 * 1152921504606846976.0) / CAST(hka AS DOUBLE) END AS est_a,
        |    exact_a,
        |    CASE WHEN nhb < 64 THEN CAST(exact_b AS DOUBLE)
        |         ELSE (63.0 * 1152921504606846976.0) / CAST(hkb AS DOUBLE) END AS est_b,
        |    exact_b,
        |    CASE WHEN nhu < 64 THEN (SELECT CAST(exact_union AS DOUBLE) FROM ex)
        |         ELSE (63.0 * 1152921504606846976.0) / CAST(hku AS DOUBLE) END AS est_union,
        |    rho
        |  FROM sc)
        |SELECT est_a, exact_a, est_b, exact_b, est_union,
        |  (SELECT exact_union FROM ex) AS exact_union, rho,
        |  (CAST(rho AS DOUBLE) / CAST((SELECT count(*) FROM ku) AS DOUBLE))
        |    * est_union AS est_inter,
        |  (SELECT exact_inter FROM ex) AS exact_inter
        |FROM fin""".stripMargin,

    "f7_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS lo_byte,
        |  l_orderkey | 4096 AS with_flag,
        |  xor(l_orderkey, l_partkey) AS xored,
        |  l_orderkey << 2 AS shl,
        |  l_orderkey >> 3 AS shr,
        |  CAST(bit_count(l_orderkey) AS INT) AS popcnt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, xored""".stripMargin,

    "f8_pivot" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "f9_null_safe_eq" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount > 0.05 THEN l_discount END AS d,
        |  (CASE WHEN l_discount > 0.05 THEN l_discount END) IS NOT DISTINCT FROM 0.1 AS is_point_1,
        |  (CASE WHEN l_discount > 0.05 THEN l_discount END) IS NOT DISTINCT FROM NULL AS is_null,
        |  (CASE WHEN l_discount > 0.05 THEN l_discount END) IS NULL AS isnull_fn
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, d ASC NULLS FIRST""".stripMargin,

    "ts1_gapfill" ->
      """WITH bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        |  FROM events),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
        |hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n FROM events GROUP BY 1)
        |SELECT epoch_us(spine.h) AS hour_us, coalesce(hourly.n, 0) AS n
        |FROM spine LEFT JOIN hourly ON spine.h = hourly.h
        |ORDER BY hour_us""".stripMargin,

    "ts2_resample_interpolate" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(value) AS v
        |  FROM events GROUP BY 1, 2),
        |sp AS (
        |  SELECT event_type, unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        |  FROM b GROUP BY event_type),
        |j AS (
        |  SELECT sp.event_type, epoch_us(sp.h) AS hour_us, b.v
        |  FROM sp LEFT JOIN b ON sp.event_type = b.event_type AND sp.h = b.h),
        |w AS (
        |  SELECT event_type, hour_us, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN hour_us END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY hour_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour_us
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN hour_us END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY hour_us
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT event_type, hour_us,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE pv + (nv - pv) * (CAST(hour_us - ph AS DOUBLE)
        |                              / CAST(nh - ph AS DOUBLE)) END AS val,
        |  v IS NULL AS is_interp
        |FROM w ORDER BY event_type, hour_us""".stripMargin,

    "src_json_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "s6_dim_sink" ->
      s"""SELECT c_custkey AS id, c_name AS client_name,
         |  CASE c_mktsegment
         |    WHEN 'BUILDING'   THEN 'industry'
         |    WHEN 'AUTOMOBILE' THEN 'mechanic_company'
         |    WHEN 'MACHINERY'  THEN 'mechanic_company'
         |    WHEN 'HOUSEHOLD'  THEN 'electric_company'
         |    WHEN 'FURNITURE'  THEN 'industry'
         |  END AS company_type
         |FROM customer ORDER BY id""".stripMargin,

    "s7_partitioned_fact_sink" ->
      """SELECT CAST(l_orderkey*100 + l_linenumber AS BIGINT) AS id,
        |       l_partkey AS product_id, o_custkey AS client_id,
        |       CAST(o_orderdate AS DATE) AS date_id,
        |       CAST(c_nationkey AS BIGINT) AS country_id,
        |       l_quantity AS quantity, l_extendedprice AS price,
        |       CAST(year(l_shipdate) AS BIGINT) AS year
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE year(l_shipdate) = 1997
        |ORDER BY id, product_id, client_id, date_id, country_id,
        |         quantity, price""".stripMargin,

    "s8_full_refresh_sink" ->
      """WITH subcat AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY p_type) AS BIGINT) AS id,
        |         p_type AS subcategory
        |  FROM (SELECT DISTINCT p_type FROM part))
        |SELECT sc.subcategory AS category, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_price
        |FROM lineitem
        |JOIN part p ON l_partkey = p.p_partkey
        |JOIN subcat sc ON p.p_type = sc.subcategory
        |GROUP BY category ORDER BY category""".stripMargin,

    "p1_fact_projection" ->
      """SELECT o_orderkey AS purchase_id, o_custkey AS client_id,
        |       CAST(o_orderdate AS DATE) AS date,
        |       CAST(NULL AS BIGINT) AS quantity,
        |       CAST(NULL AS DOUBLE) AS price,
        |       CAST(year(o_orderdate) AS BIGINT) AS year
        |FROM orders ORDER BY purchase_id""".stripMargin,

    "p2_alias_projection" ->
      """SELECT o_orderkey AS order_id, o_custkey AS client_id,
        |       o_orderstatus AS status, o_totalprice AS total_price,
        |       o_orderpriority AS priority
        |FROM orders ORDER BY order_id""".stripMargin,

    "p3_eq_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "p4_conj_predicate" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE year(o_orderdate) = 1997 AND month(o_orderdate) = 3
        |  AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "p5_decode" ->
      """SELECT c_custkey AS id,
        |  CASE c_mktsegment
        |    WHEN 'BUILDING'   THEN 'industry'
        |    WHEN 'AUTOMOBILE' THEN 'mechanic_company'
        |    WHEN 'MACHINERY'  THEN 'mechanic_company'
        |    WHEN 'HOUSEHOLD'  THEN 'electric_company'
        |    WHEN 'FURNITURE'  THEN 'industry'
        |  END AS company_type
        |FROM customer ORDER BY id""".stripMargin,

    "j1_star_join" ->
      """SELECT r_name, n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "j3_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,

    "ds1_typed_pipeline" ->
      """SELECT l_returnflag, COUNT(*) AS n, MAX(l_quantity) AS max_qty
        |FROM lineitem WHERE l_quantity > 30.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a3_topk_aggregator" ->
      """SELECT o_orderpriority, rk, o_totalprice, o_orderkey FROM (
        |  SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "a1_first_wins_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |         row_number() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_linenumber ASC NULLS FIRST, l_partkey ASC NULLS FIRST,
        |                    l_quantity ASC NULLS FIRST) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    "a2_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "g1_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "g2_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "g3_cube_grouping" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "g4_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "g5_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "w1_row_number" ->
      """SELECT l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, rn""".stripMargin,

    "w2_rank_dense" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
        |  FROM orders) WHERE rnk <= 10
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,

    "w3_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w4_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "bkt_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "tpch_q3_shipping" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_orderpriority,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1996-01-01'
        |GROUP BY l_orderkey, o_date, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "tpch_q5_local_volume" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE year(o_orderdate) = 1996 AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "tpch_q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "tpch_q6_forecast" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE year(l_shipdate) = 1996
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "tpch_q12_priority" ->
      """SELECT l_linestatus,
        |  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
        |  COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE year(l_shipdate) = 1996
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "tpch_q14_promo" ->
      """WITH s AS (
        |  SELECT
        |    CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice*(1-l_discount) ELSE 0.0 END AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS promo_rev,
        |    CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01')
        |SELECT (100.0 * promo_rev) / total_rev AS promo_pct, promo_rev, total_rev
        |FROM s""".stripMargin,

    "tpch_q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  o_totalprice, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |      FROM lineitem GROUP BY 1) b ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE sum_qty > 150.0
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "tpch_q2_min_cost" ->
      """WITH unit AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(CAST(SUM(CAST(FLOOR(l_extendedprice / l_quantity * 1000000 + 0.5) / 1000000
        |                  AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |      / COUNT(l_extendedprice / l_quantity) AS avg_unit
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT *, MIN(avg_unit) OVER (PARTITION BY l_partkey) AS min_unit
        |      FROM unit)
        |SELECT p_partkey, p_name, s_suppkey, s_name, min_unit
        |FROM m
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE avg_unit = min_unit AND p_size < 10
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    "tpch_q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "tpch_q13_custdist" ->
      """WITH cc AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM cc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "tpch_q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch_q17_small_qty" ->
      """WITH b AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')),
        |t AS (
        |  SELECT l_partkey AS t_partkey,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |      / COUNT(l_quantity) * 0.2 AS qty_thr
        |  FROM b GROUP BY 1)
        |SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM b JOIN t ON l_partkey = t_partkey
        |WHERE l_quantity < qty_thr""".stripMargin,

    "tpch_q19_disjunctive" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "tpch_q21_waiting" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem),
        |l1 AS (
        |  SELECT * FROM l
        |  WHERE l_returnflag = 'R'
        |    AND EXISTS (SELECT 1 FROM orders
        |                WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F'))
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM l l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey ASC LIMIT 20""".stripMargin,

    "tpch_q22_balance" ->
      """WITH ab AS (
        |  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |    / COUNT(c_acctbal) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS totacctbal
        |FROM customer, ab
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "tpch_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*1000000 + 0.5)/1000000
        |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000 + 0.5)/1000000
        |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "tpch_q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*1000000 + 0.5)/1000000
        |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
        |       (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "tpch_q8_market_share" ->
      """WITH base AS (
        |  SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
        |    FLOOR(l_extendedprice*(1-l_discount)*1000000 + 0.5)/1000000 AS vol
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |    AND o_custkey IN (
        |      SELECT c_custkey FROM customer
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      JOIN region ON n2.n_regionkey = r_regionkey
        |      WHERE r_name = 'AMERICA')
        |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
        |SELECT o_year,
        |  CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE 0.0 END
        |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |  / CAST(CAST(SUM(CAST(vol AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS mkt_share
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,

    "tpch_q9_profit" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    CAST(CAST(SUM(CAST(FLOOR(l_extendedprice / l_quantity * 1000000 + 0.5) / 1000000
        |                  AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |      / COUNT(*) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount) - ps_supplycost*l_quantity)
        |    *1000000 + 0.5)/1000000 AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "tpch_q11_important_stock" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS availqty,
        |    CAST(CAST(SUM(CAST(FLOOR(l_extendedprice / l_quantity * 1000000 + 0.5) / 1000000
        |                  AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        |      / COUNT(*) AS unit_cost
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      JOIN nation ON s_nationkey = n_nationkey
        |                      WHERE n_name = 'NATION_3')
        |  GROUP BY 1, 2),
        |v AS (SELECT l_partkey,
        |        FLOOR(availqty * unit_cost * 1000000 + 0.5)/1000000 AS value FROM ps),
        |grp AS (SELECT l_partkey,
        |          CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS part_value
        |        FROM v GROUP BY 1),
        |tot AS (SELECT CAST(CAST(SUM(CAST(part_value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) * 1e-4 AS threshold
        |        FROM grp)
        |SELECT l_partkey, part_value FROM grp, tot
        |WHERE part_value > threshold
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "tpch_q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#9' AND p_type NOT LIKE 'MED%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "tpch_q20_promotion" ->
      """WITH s96 AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS qty96
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |a98 AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS avail98
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |    AND l_shipdate <  TIMESTAMP '1999-01-01'
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a98.l_suppkey
        |  FROM a98 JOIN s96 ON a98.l_partkey = s96.l_partkey
        |               AND a98.l_suppkey = s96.l_suppkey
        |  WHERE avail98 > 0.5 * qty96
        |    AND a98.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'))
        |SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM cand)
        |  AND s_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
        |ORDER BY s_suppkey""".stripMargin,

    "f14_unpivot" ->
      """WITH wide AS (
        |  SELECT year(o_orderdate) AS order_year,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
        |  FROM orders GROUP BY 1)
        |SELECT order_year, 'n_open' AS status_col, n_open AS n_orders FROM wide
        |UNION ALL
        |SELECT order_year, 'n_filled', n_filled FROM wide
        |UNION ALL
        |SELECT order_year, 'n_pending', n_pending FROM wide
        |ORDER BY order_year, status_col""".stripMargin,

    "g13_histogram_quantile" ->
      """WITH b AS (
        |  SELECT o_orderpriority, FLOOR(o_totalprice / 1000.0) AS bin, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |c AS (
        |  SELECT o_orderpriority, bin, n,
        |    CAST(SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS tot
        |  FROM b),
        |hit AS (
        |  SELECT o_orderpriority,
        |    min(struct_pack(bin := bin, n := n, cum := cum, tot := tot)) AS s
        |  FROM c
        |  WHERE CAST(cum AS DOUBLE) >= CAST(tot AS DOUBLE) * 0.5
        |  GROUP BY 1)
        |SELECT o_orderpriority,
        |  s.bin * 1000.0 + 1000.0 *
        |    ((CAST(s.tot AS DOUBLE) * 0.5 - CAST(s.cum - s.n AS DOUBLE))
        |     / CAST(s.n AS DOUBLE)) AS est_p50,
        |  s.tot AS n_orders
        |FROM hit ORDER BY o_orderpriority""".stripMargin,

    "g12_sampled_quantile" ->
      s"""SELECT l_returnflag,
         |  quantile_cont(l_quantity, 0.25) AS p25,
         |  quantile_cont(l_quantity, 0.50) AS p50,
         |  quantile_cont(l_quantity, 0.75) AS p75,
         |  COUNT(*) AS n_sampled
         |FROM lineitem
         |WHERE ${graft.functions.DetHash.hSql(
              "concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)")} % 10 = 0
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "o5_scd2_history" ->
      """WITH ord AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    lag(o_orderpriority) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_p
        |  FROM orders),
        |chg AS (SELECT * FROM ord
        |        WHERE prev_p IS NULL OR prev_p <> o_orderpriority)
        |SELECT o_custkey AS cust_id, o_orderkey AS change_id,
        |  o_orderpriority AS priority,
        |  CAST(o_orderdate AS DATE) AS valid_from,
        |  COALESCE(CAST(lead(o_orderdate) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
        |    DATE '9999-12-31') AS valid_to,
        |  lead(o_orderdate) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
        |    AS is_current
        |FROM chg ORDER BY cust_id, valid_from, change_id""".stripMargin,

    "o6_merge_delete" ->
      """WITH ex AS (SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal
        |            FROM supplier),
        |upd AS (SELECT id, name, acctbal + 100.0 AS acctbal, 'U' AS op
        |        FROM ex WHERE id % 3 = 0 AND id % 5 <> 0),
        |del AS (SELECT id, name, acctbal, 'D' AS op FROM ex WHERE id % 5 = 0),
        |ins AS (SELECT id + 2000000 AS id, 'INS ' || name AS name, acctbal, 'I' AS op
        |        FROM ex WHERE id % 7 = 0),
        |inc AS (SELECT * FROM upd UNION ALL SELECT * FROM del
        |        UNION ALL SELECT * FROM ins)
        |SELECT COALESCE(ex.id, inc.id) AS id,
        |  CASE WHEN inc.op IN ('U', 'I') THEN inc.name ELSE ex.name END AS name,
        |  CASE WHEN inc.op IN ('U', 'I') THEN inc.acctbal ELSE ex.acctbal END
        |    AS acctbal
        |FROM ex FULL OUTER JOIN inc ON ex.id = inc.id
        |WHERE inc.op IS NULL OR inc.op <> 'D'
        |ORDER BY id""".stripMargin,

    "o4_scd1_merge" ->
      """WITH ex AS (SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal
        |            FROM supplier),
        |upd AS (SELECT id, name, acctbal + 100.0 AS acctbal FROM ex WHERE id % 3 = 0),
        |ins AS (SELECT id + 1000000 AS id, 'NEW ' || name AS name, acctbal
        |        FROM ex WHERE id % 7 = 0),
        |inc AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT COALESCE(inc.id, ex.id) AS id,
        |  CASE WHEN inc.id IS NOT NULL THEN inc.name ELSE ex.name END AS name,
        |  CASE WHEN inc.id IS NOT NULL THEN inc.acctbal ELSE ex.acctbal END AS acctbal
        |FROM ex FULL OUTER JOIN inc ON ex.id = inc.id
        |ORDER BY id""".stripMargin,

    "f10_map_funcs" ->
      """SELECT o_orderkey,
        |  o_totalprice AS price_via_map,
        |  2 AS m_size,
        |  'price,key' AS keys_csv
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f11_regexp_extract" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
        |FROM part ORDER BY p_partkey""".stripMargin,

    "sm1_hash_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::UBIGINT)::BIGINT % 10 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "sm2_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CASE WHEN lang = 'en'
        |  THEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT)::BIGINT % 100 < 50
        |  ELSE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT)::BIGINT % 100 < 10
        |END
        |ORDER BY doc_id""".stripMargin,

    "f12_datetime_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "u2_union_distinct" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "c1_cross_join" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,

    "w6_range_frame" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |    PARTITION BY o_orderpriority ORDER BY CAST(year(o_orderdate) AS BIGINT)
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS two_year_spend
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "w7_value_functions" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  first_value(o_totalprice) OVER w AS max_in_prio,
        |  last_value(o_totalprice) OVER w AS min_in_prio,
        |  nth_value(o_totalprice, 2) OVER w AS second_in_prio
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "w5_analytic_suite" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,

    "g7_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS INT) AS gid,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "g8_stats_powersums" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s_q,
        |    CAST(CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s_qq,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s_p,
        |    CAST(CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s_qp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  s_q / n AS mean_q,
        |  (s_qq - s_q*s_q/n) / (n - 1) AS var_q,
        |  sqrt((s_qq - s_q*s_q/n) / (n - 1)) AS stddev_q,
        |  (s_qp - s_q*s_p/n) / (n - 1) AS covar_qp
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "f6_array_collect" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
        |  COUNT(DISTINCT l_linestatus) AS n_statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "j5_asof_join" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |         CAST(year(o_orderdate) AS INT) AS yr
        |  FROM orders),
        |anchors AS (
        |  SELECT DISTINCT yr, CAST(date_trunc('quarter', d) AS DATE) AS ad,
        |         CAST(yr*100 + month(date_trunc('quarter', d)) AS BIGINT) AS rate
        |  FROM o)
        |SELECT o.o_orderkey, o.d AS o_date, a.rate AS asof_rate
        |FROM o ASOF JOIN anchors a ON o.yr = a.yr AND o.d >= a.ad
        |ORDER BY o_orderkey""".stripMargin,

    "p7_dynamic_pruning" ->
      """WITH f AS (
        |  SELECT o_orderkey, o_totalprice, year(o_orderdate) AS year FROM orders),
        |d AS (
        |  SELECT year FROM (SELECT DISTINCT year(l_shipdate) AS year FROM lineitem)
        |  WHERE year % 2 = 1)
        |SELECT CAST(f.year AS BIGINT) AS year, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total
        |FROM f JOIN d USING (year)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // native inequality join replays the binned range join
    "j7_range_join" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS d,
        |         l_extendedprice
        |  FROM lineitem),
        |iv AS (
        |  SELECT DISTINCT CAST(date_trunc('quarter', d) AS DATE) AS qstart,
        |    CAST(date_trunc('quarter', d) AS DATE) + INTERVAL 3 MONTH AS qend
        |  FROM li)
        |SELECT iv.qstart,
        |  COUNT(*) AS n_lines,
        |  CAST(CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM li JOIN iv ON li.d >= iv.qstart AND li.d < iv.qend
        |GROUP BY iv.qstart ORDER BY iv.qstart""".stripMargin,

    // The naive inequality-join formulation — an algorithm independent
    // of the Spark side's month-binned candidate generation.
    "j8_interval_overlap" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key, CAST(o_orderdate AS DATE) AS a_start,
        |         CAST(o_orderdate AS DATE) + 20 AS a_end
        |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 97 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_key, CAST(o_orderdate AS DATE) AS b_start,
        |         CAST(o_orderdate AS DATE) + 15 AS b_end
        |  FROM orders WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 89 = 0)
        |SELECT a_key, b_key,
        |  CAST(date_diff('day', greatest(a_start, b_start),
        |                 least(a_end, b_end)) AS INT) AS overlap_days
        |FROM a JOIN b ON a_start < b_end AND b_start < a_end
        |ORDER BY a_key, b_key""".stripMargin,

    "skew_salted_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "skew_salted_join" ->
      """SELECT s_name, COUNT(*) AS n_lines,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "o1_multi_sort" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC""".stripMargin,

    "o2_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "u1_union_all" ->
      """SELECT nationkey, COUNT(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "e1_except" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "i1_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "f1_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST((quarter(o_orderdate)-1)*3+1 AS BIGINT) AS three_months,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f2_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lo, upper(p_brand) AS up, trim(p_type) AS tr,
        |  substr(p_name, 1, 5) AS sub,
        |  concat_ws('|', p_brand, p_type) AS cat,
        |  CAST(len(str_split(p_name, ' ')) AS INT) AS n_words,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f3_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  round(l_discount * 100, 0) AS disc_pct,
        |  sqrt(l_quantity) AS rt,
        |  l_orderkey % 7 AS mod7
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, rt, fl, ce, disc_pct""".stripMargin,

    "f4_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "f5_conditional" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg,
        |  CASE WHEN c_acctbal < 0 THEN 'debtor'
        |       WHEN c_acctbal < 5000 THEN 'regular'
        |       ELSE 'premium' END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "j2_cube_view" -> {
      val subcatCte =
        """subcat AS (
          |  SELECT CAST(dense_rank() OVER (ORDER BY p_type) AS BIGINT) AS id,
          |         p_type AS subcategory
          |  FROM (SELECT DISTINCT p_type FROM part))""".stripMargin
      s"""WITH $subcatCte
         |SELECT sc.subcategory AS category,
         |       CAST(year(o_orderdate) AS BIGINT) AS year,
         |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_price,
         |       COUNT(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN part p ON l_partkey = p.p_partkey
         |JOIN subcat sc ON p.p_type = sc.subcategory
         |GROUP BY category, year ORDER BY category, year""".stripMargin
    })
}
