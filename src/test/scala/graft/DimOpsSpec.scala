package graft

import org.apache.spark.sql.functions._
import graft.etl.DimOps

/** Edge semantics of the dimension-conformance operators (SURVEY.md §5.2):
  * anti-join with empty existing side, unmatched decode → null, surrogate
  * key density, idempotence, quarter math across all 12 months. */
class DimOpsSpec extends SparkSuite {
  import spark.implicits._

  test("newRows against an empty existing side passes everything through") {
    val incoming = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val existing = incoming.limit(0)
    assert(DimOps.newRows(existing, incoming, Seq("id")).count() === 2)
  }

  test("newRows drops keys already present (insert-if-absent, wh.py:78-81)") {
    val existing = Seq((1L, "old")).toDF("id", "v")
    val incoming = Seq((1L, "new"), (2L, "b")).toDF("id", "v")
    val out = DimOps.newRows(existing, incoming, Seq("id")).collect()
    assert(out.map(_.getLong(0)).toSet === Set(2L))
  }

  test("antiUpsert is idempotent and first-wins (existing rows survive)") {
    val existing = Seq((1L, "old")).toDF("id", "v")
    val incoming = Seq((1L, "new"), (2L, "b")).toDF("id", "v")
    val once = DimOps.antiUpsert(existing, incoming, Seq("id"))
    val twice = DimOps.antiUpsert(once, incoming, Seq("id"))
    assert(once.count() === 2)
    assert(twice.count() === 2)
    assert(once.filter($"id" === 1L).head().getString(1) === "old")
    assert(twice.except(once).count() === 0)
  }

  test("merge: incoming wins wholesale on match (even NULLs), new keys insert, rest survive") {
    val existing = Seq((1L, Some("old1"), 10.0), (2L, Some("old2"), 20.0))
      .toDF("id", "v", "x")
    val incoming = Seq((2L, None: Option[String], 99.0), (3L, Some("new3"), 30.0))
      .toDF("id", "v", "x")
    val out = DimOps.merge(existing, incoming, Seq("id")).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(out(0).getString(1) === "old1")
    // matched row takes the incoming values WHOLESALE: v updates to NULL
    assert(out(1).isNullAt(1) && out(1).getDouble(2) === 99.0)
    assert(out(2).getString(1) === "new3")
    // idempotent: merging the same incoming again changes nothing
    val again = DimOps.merge(
      DimOps.merge(existing, incoming, Seq("id")), incoming, Seq("id"))
    assert(again.orderBy("id").collect().toSeq === out.toSeq)
  }

  test("firstWins keeps the lowest-sorting row per key, deterministically") {
    val df = Seq((1L, 9, "z"), (1L, 3, "m"), (1L, 3, "a"), (2L, 5, "x"))
      .toDF("id", "n", "s")
    val out = DimOps.firstWins(df, Seq("id")).orderBy("id").collect()
    assert(out.length === 2)
    assert(out(0).getInt(1) === 3 && out(0).getString(2) === "a")
  }

  test("withSurrogateKey assigns dense gap-free keys 1..n ordered by natural key") {
    val df = Seq("carol", "alice", "bob").toDF("name")
    val keyed = DimOps.withSurrogateKey(df, Seq("name")).orderBy("id").collect()
    assert(keyed.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(keyed.map(_.getString(1)).toSeq === Seq("alice", "bob", "carol"))
    val offset = DimOps.withSurrogateKey(df, Seq("name"), offset = 10L)
      .agg(min("id"), max("id")).head()
    assert(offset.getLong(0) === 11L && offset.getLong(1) === 13L)
  }

  test("decode maps listed values and yields null otherwise (quirk Q1 normalized)") {
    val df = Seq("BUILDING", "AUTOMOBILE", "UNKNOWN").toDF("seg")
    val out = df.select(DimOps.decode($"seg", Seq(
      "BUILDING" -> "industry", "AUTOMOBILE" -> "mechanic_company")).as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("industry"), Some("mechanic_company"), None))
  }

  test("quarter-start month (three_months, wh.py:164-165) is correct for all 12 months") {
    val df = (1 to 12).map(m => java.sql.Date.valueOf(f"2020-$m%02d-15")).toDF("date")
    val out = df.select(month($"date").as("m"),
        ((quarter($"date") - 1) * 3 + 1).as("tm"))
      .orderBy("m").collect()
    val expected = Seq(1, 1, 1, 4, 4, 4, 7, 7, 7, 10, 10, 10)
    assert(out.map(_.getInt(1)).toSeq === expected)
  }
}
