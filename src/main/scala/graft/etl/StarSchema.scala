package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's star schema (/root/reference/warehouse.py:76-305)
  * rebuilt set-level over the fixture tables (FIXTURES.md mapping):
  *
  *   customer → dimclient (+ dimclient_companytype decode,  wh.py:76-94)
  *   part     → dimproduct (+ dimproduct_subcategory,       wh.py:96-116)
  *   nation   → dimcountry (+ dimcountry_subregion/region,  wh.py:118-136)
  *   orders.o_orderdate → dimdate (+ month/year sub-dims,   wh.py:138-170)
  *   lineitem ⋈ orders  → transportfact,                    wh.py:172-210
  *   7-way star join    → cube_table,                       wh.py:212-305
  *
  * Every loader is a pure DataFrame → DataFrame function: no driver-side
  * row loops, no collect(), dims broadcast into the fact join, fact stays
  * partition-local. Column-swap bug Q4 and the date-join inconsistency Q5
  * (SURVEY.md Appendix) are fixed to the evident intent.
  */
object StarSchema {
  import DimOps._

  /** dimclient (id, client_name, company_type) — warehouse.py:76-94.
    * The company-type decode source is c_mktsegment (FIXTURES.md). */
  def dimClient(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("id"),
      col("c_name").as("client_name"),
      decode(col("c_mktsegment"), Seq(
        "BUILDING"   -> "industry",
        "AUTOMOBILE" -> "mechanic_company",
        "MACHINERY"  -> "mechanic_company",
        "HOUSEHOLD"  -> "electric_company",
        "FURNITURE"  -> "industry")).as("company_type"))

  /** dimproduct_subcategory (id, subcategory) — natural-key dim with
    * surrogate ids (warehouse.py:104-110; AUTO_INCREMENT replaced by
    * dense_rank, SURVEY.md §7.3). */
  def dimProductSubcategory(part: DataFrame): DataFrame =
    withSurrogateKey(
      distinctByNaturalKey(part, Seq("p_type")).withColumnRenamed("p_type", "subcategory"),
      Seq("subcategory"))

  /** dimproduct (id, product_name, code, family, category_id) —
    * warehouse.py:96-116; category_id resolved by joining the subcategory
    * dim on its natural key (the reference's per-row lookup at wh.py:104
    * becomes one broadcast join). */
  def dimProduct(part: DataFrame, subcategory: DataFrame): DataFrame =
    part.join(broadcast(subcategory.withColumnRenamed("id", "category_id")),
        part("p_type") === subcategory("subcategory"), "left")
      .select(
        col("p_partkey").as("id"),
        col("p_name").as("product_name"),
        col("p_brand").as("code"),
        col("p_type").as("family"),
        col("category_id"))

  /** dimcountry (id, name, code/region fk) — warehouse.py:118-126. */
  def dimCountry(nation: DataFrame): DataFrame =
    nation.select(
      col("n_nationkey").as("id"),
      col("n_name").as("name"),
      col("n_regionkey").as("subregion_id"))

  /** dimcountry_subregion (id, subregion) — warehouse.py:128-136. */
  def dimCountrySubregion(region: DataFrame): DataFrame =
    region.select(
      col("r_regionkey").as("id"),
      col("r_name").as("subregion"))

  /** dimdate_month (id, month) — the reference assumes this 12-row dim is
    * pre-populated and only looks it up (warehouse.py:155-156, quirk Q7);
    * we generate it explicitly. */
  def dimDateMonth(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 to 12).map(m => (m.toLong,
      java.time.Month.of(m).getDisplayName(java.time.format.TextStyle.FULL, java.util.Locale.ENGLISH)))
      .toDF("id", "month")
  }

  /** dimdate_year (id, year) — lookup-or-insert with AUTO_INCREMENT ids
    * (warehouse.py:145-151) → distinct years + dense_rank surrogate. */
  def dimDateYear(dates: DataFrame, dateCol: String): DataFrame =
    withSurrogateKey(
      dates.select(year(col(dateCol)).cast("long").as("year")).distinct(),
      Seq("year"))

  /** dimdate (id, day, month_id, year_id, date, three_months) —
    * warehouse.py:138-170. three_months is the quarter-start month
    * ((quarter-1)*3+1, wh.py:164-165); the in-place UPDATE at wh.py:167 is
    * eliminated by computing it in the projection (SURVEY.md S9). */
  def dimDate(source: DataFrame, dateCol: String, yearDim: DataFrame): DataFrame = {
    val dates = source.select(to_date(col(dateCol)).as("date")).distinct()
    val withParts = dates
      .withColumn("day", dayofmonth(col("date")).cast("long"))
      .withColumn("month_id", month(col("date")).cast("long"))
      .withColumn("year", year(col("date")).cast("long"))
      .withColumn("three_months", ((quarter(col("date")) - 1) * 3 + 1).cast("long"))
    withSurrogateKey(
      withParts.join(broadcast(yearDim.withColumnRenamed("id", "year_id")), Seq("year"))
        .select("date", "day", "month_id", "year_id", "three_months"),
      Seq("date"))
  }

  /** The fact-pipeline input: lineitem pruned to exactly the columns
    * [[fact]] consumes, THEN widened with [[graft.Tables.fanOut]]. The
    * projection is applied before the exchange on purpose — the
    * rebalancing shuffle then moves 6 narrow columns instead of the full
    * 16-column scan row, explicitly rather than trusting the optimizer
    * to push a projection through a round-robin repartition. On a
    * properly split multi-row-group layout fanOut is a no-op and this is
    * just the column-pruned scan. */
  def factInput(lineitem: DataFrame): DataFrame =
    graft.Tables.fanOut(lineitem.select(
      "l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_shipdate"))

  /** transportfact (id, product_id, client_id, date_id, country_id,
    * quantity, price, year) — warehouse.py:172-210. The fact id replaces
    * AUTO_INCREMENT (wh.py:174) with a deterministic composite encode of
    * the business key — no global sort, holds at any scale. The reference
    * loads quantity/price as NULL (wh.py:208, P6); we carry the real
    * measures and keep the null-injection path in SparkEntry's p1 query.
    * `year` (partition column, wh.py:188-200) comes from l_shipdate
    * (FIXTURES.md).
    */
  def fact(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "inner")
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        orders("o_custkey") === col("c_custkey"), "inner")
      .select(
        (col("l_orderkey") * 100 + col("l_linenumber")).as("id"),
        col("l_partkey").as("product_id"),
        col("o_custkey").as("client_id"),
        to_date(col("o_orderdate")).as("date_id"),
        col("c_nationkey").cast("long").as("country_id"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("price"),
        year(col("l_shipdate")).cast("long").as("year"))

  /** cube_table — the 7-way denormalized star join (warehouse.py:254-284),
    * with quirk Q4 fixed: product_name ← dimproduct.product_name and
    * family ← dimproduct.family (the reference cross-wires them through a
    * misordered column list, SURVEY.md Appendix Q4), and quirk Q5 fixed:
    * year reached through dimdate.year_id, the only self-consistent
    * linkage. All dims are broadcast → the fact side never shuffles.
    */
  def cube(fact: DataFrame, dimProduct: DataFrame, subcat: DataFrame,
           dimClient: DataFrame, dimDate: DataFrame, monthDim: DataFrame,
           yearDim: DataFrame, country: DataFrame): DataFrame = {
    val dp  = dimProduct.as("dp")
    val dps = subcat.as("dps")
    val dc  = dimClient.as("dc")
    val dd  = dimDate.as("dd")
    val ddm = monthDim.as("ddm")
    val ddy = yearDim.as("ddy")
    val dco = country.as("dco")
    fact.as("tf")
      .join(broadcast(dp),  col("tf.product_id") === col("dp.id"))
      .join(broadcast(dps), col("dp.category_id") === col("dps.id"))
      .join(broadcast(dc),  col("tf.client_id") === col("dc.id"))
      .join(broadcast(dd),  col("tf.date_id") === col("dd.date"))
      .join(broadcast(ddm), col("dd.month_id") === col("ddm.id"))
      .join(broadcast(ddy), col("dd.year_id") === col("ddy.id"))
      .join(broadcast(dco), col("tf.country_id") === col("dco.id"))
      .select(
        col("tf.id").as("fact_id"),
        col("tf.product_id").as("product_id"),
        col("dps.subcategory").as("category"),
        col("dp.product_name").as("product_name"),
        col("dp.family").as("family"),
        col("tf.client_id").as("client_id"),
        col("dc.client_name").as("client_name"),
        col("dd.id").as("date_id"),
        col("dd.day").as("day"),
        col("dd.month_id").as("month_id"),
        col("ddm.month").as("month"),
        col("ddy.year").as("year"),
        col("tf.country_id").as("country_id"),
        col("dco.name").as("country_name"),
        col("tf.quantity").as("quantity"),
        col("tf.price").as("price"))
  }

  /** Build everything from a fixture directory — the pipeline in dependency
    * order (SURVEY.md O1): sub-dims before dims, dims before fact, fact
    * before cube (fixing quirk Q6's dims-after-cube ordering). */
  def build(spark: SparkSession, dir: String): StarOutputs = {
    val customer = graft.Tables.customer(spark, dir)
    val part     = graft.Tables.part(spark, dir)
    val nation   = graft.Tables.nation(spark, dir)
    val region   = graft.Tables.region(spark, dir)
    val orders   = graft.Tables.orders(spark, dir)
    // The fact input feeds an 8-deep broadcast-join chain plus whatever
    // sink/aggregate the caller attaches — the most compute-heavy
    // narrow-dependent pipeline in the engine. factInput prunes columns
    // and widens an under-parallel (single-row-group) scan once here so
    // the whole chain runs on all cores; a no-op on a split layout.
    val lineitem = factInput(graft.Tables.lineitem(spark, dir))

    val subcat   = dimProductSubcategory(part)
    val product  = dimProduct(part, subcat)
    val client   = dimClient(customer)
    val country  = dimCountry(nation)
    val subreg   = dimCountrySubregion(region)
    val months   = dimDateMonth(spark)
    val years    = dimDateYear(orders, "o_orderdate")
    val dates    = dimDate(orders, "o_orderdate", years)
    val factDf   = fact(lineitem, orders, customer)
    val cubeDf   = cube(factDf, product, subcat, client, dates, months, years, country)
    StarOutputs(subcat, product, client, country, subreg, months, years, dates, factDf, cubeDf)
  }
}

final case class StarOutputs(
    subcategory: DataFrame, product: DataFrame, client: DataFrame,
    country: DataFrame, subregion: DataFrame, months: DataFrame,
    years: DataFrame, dates: DataFrame, fact: DataFrame, cube: DataFrame)
