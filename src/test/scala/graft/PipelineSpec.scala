package graft

import org.apache.spark.sql.functions._
import graft.etl.StarSchema

/** Golden end-to-end pipeline invariants at sf0.001 (FIXTURES.md):
  * dim row counts equal source distinct-key counts, every fact row
  * survives the star join into the cube, null measures propagate, and
  * re-running a load changes nothing. */
class PipelineSpec extends SparkSuite {

  lazy val out: graft.etl.StarOutputs = StarSchema.build(spark, sf)

  test("dim cardinalities match source distinct keys (5/25/150/200)") {
    assert(out.subregion.count() === 5)
    assert(out.country.count() === 25)
    assert(out.client.count() === 150)
    assert(out.product.count() === 200)
    assert(out.months.count() === 12)
  }

  test("every lineitem survives the FK joins: fact rows == cube rows == 6000") {
    assert(out.fact.count() === 6000)
    assert(out.cube.count() === 6000)
  }

  test("cube carries correctly-wired product columns (quirk Q4 fixed)") {
    val row = out.cube.filter(col("product_id") === 7).select("product_name", "family").head()
    val src = Tables.part(spark, sf).filter(col("p_partkey") === 7)
      .select("p_name", "p_type").head()
    assert(row.getString(0) === src.getString(0)) // product_name ← p_name
    assert(row.getString(1) === src.getString(1)) // family ← p_type
  }

  test("surrogate keys on the date dim are dense 1..n") {
    val n = out.dates.count()
    val agg = out.dates.agg(min("id"), max("id"), countDistinct("id")).head()
    assert(agg.getLong(0) === 1L && agg.getLong(1) === n && agg.getLong(2) === n)
  }

  test("date dim year_id resolves through the year sub-dim (quirk Q5 fixed)") {
    val joined = out.dates.join(out.years.withColumnRenamed("id", "year_id"), "year_id")
      .filter(year(col("date")) =!= col("year"))
    assert(joined.count() === 0)
  }

  test("fact load is idempotent under anti-join re-run (wh.py:81 invariant)") {
    val again = graft.etl.DimOps.newRows(out.fact, out.fact, Seq("id"))
    assert(again.count() === 0)
  }

  test("p1 projection injects typed nulls for quantity/price (P6)") {
    val df = graft.queries.Relational.queries("p1_fact_projection")(spark, sf)
    val r = df.limit(1).head()
    assert(r.isNullAt(r.fieldIndex("quantity")))
    assert(r.isNullAt(r.fieldIndex("price")))
    assert(df.schema("quantity").dataType.typeName === "long")
    assert(df.schema("price").dataType.typeName === "double")
  }

  test("entry (flagship) returns 5 regions × 7 years") {
    assert(SparkEntry.entry(spark).count() === 35)
  }

  test("every declared oracle has a matching query entry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
