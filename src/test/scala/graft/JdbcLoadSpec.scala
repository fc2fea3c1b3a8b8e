package graft

import org.apache.spark.sql.functions._

import graft.etl.JdbcLoad

/** Live exercise of the JDBC LOAD surface (the reference's real sink
  * protocol — warehouse.py writes every table INTO MySQL) against
  * embedded Derby, completing the extraction coverage in
  * JdbcSourceSpec: batched parallel append, staging-swap full refresh,
  * and the set-based anti-join upsert with its inserted-count audit. */
class JdbcLoadSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftload;create=true"

  private def drop(table: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () }
    } finally conn.close()
  }

  private def dim(n: Int, from: Int = 1) =
    (from until from + n).map(i => (i.toLong, s"name_$i", i * 2.5)).toDF("id", "name", "score")

  test("append streams batched inserts; round-trip preserves every row") {
    drop("D_APPEND")
    JdbcLoad.append(dim(250), url, "D_APPEND", numPartitions = Some(4))
    val back = Tables.readJdbc(spark, url, "D_APPEND")
    assert(back.count() == 250)
    assert(back.agg(sum(col("score"))).head().getDouble(0) ==
      (1 to 250).map(_ * 2.5).sum)
    JdbcLoad.append(dim(50, from = 251), url, "D_APPEND")
    assert(Tables.readJdbc(spark, url, "D_APPEND").count() == 300)
  }

  test("refresh swaps a complete new generation in; the old table serves until the swap") {
    drop("D_REF"); drop("D_REF_STAGING"); drop("D_REF_OLD")
    JdbcLoad.refresh(spark, dim(100), url, "D_REF")
    assert(Tables.readJdbc(spark, url, "D_REF").count() == 100)
    // second generation: different rows entirely; after refresh the
    // target holds exactly the new generation (no truncated mix), and
    // the staging/old scaffolding is gone
    JdbcLoad.refresh(spark, dim(40, from = 1000), url, "D_REF")
    val back = Tables.readJdbc(spark, url, "D_REF")
    assert(back.count() == 40)
    assert(back.agg(min(col("id"))).head().getLong(0) == 1000L)
    assert(!Seq("D_REF_STAGING", "D_REF_OLD").exists { t =>
      try { Tables.readJdbc(spark, url, t).count(); true }
      catch { case _: Exception => false }
    }, "staging/old scaffolding left behind")
  }

  test("existence probe is an exact lookup — a wildcard-decoy table cannot fool refresh") {
    // DatabaseMetaData.getTables takes a PATTERN: unescaped, the probe
    // for D_WC_STAGING ('_' = any char) also matches DXWCXSTAGING, and
    // refresh would DROP a staging table that doesn't exist. The decoy
    // must neither break the refresh nor be touched by it.
    drop("D_WC"); drop("D_WC_STAGING"); drop("D_WC_OLD"); drop("DXWCXSTAGING")
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE DXWCXSTAGING (id BIGINT)"): Unit
    finally conn.close()
    JdbcLoad.refresh(spark, dim(10), url, "D_WC")
    assert(Tables.readJdbc(spark, url, "D_WC").count() == 10)
    // second refresh exercises the table-exists branch too
    JdbcLoad.refresh(spark, dim(5, from = 100), url, "D_WC")
    assert(Tables.readJdbc(spark, url, "D_WC").count() == 5)
    // the decoy survived untouched
    assert(Tables.readJdbc(spark, url, "DXWCXSTAGING").count() == 0)
  }

  test("identifier case folding is locale-independent (Turkish-I safe)") {
    // Under a tr-TR default locale, locale-sensitive folding turns
    // "d_client".toUpperCase into "D_CLİENT" (dotted İ): the existence
    // probe then misses the real D_CLIENT and the second refresh takes
    // the create branch against an existing table. The fold must use
    // Locale.ROOT — the database's ASCII case rules, not the JVM's.
    drop("D_CLIENT"); drop("D_CLIENT_STAGING"); drop("D_CLIENT_OLD")
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      JdbcLoad.refresh(spark, dim(10), url, "d_client")
      assert(Tables.readJdbc(spark, url, "D_CLIENT").count() == 10)
      // the second refresh exercises the exists branch under tr-TR
      JdbcLoad.refresh(spark, dim(4, from = 500), url, "d_client")
      assert(Tables.readJdbc(spark, url, "D_CLIENT").count() == 4)
    } finally java.util.Locale.setDefault(saved)
  }

  test("differential: upsert audit counts match a set-difference replay over random key batches") {
    drop("D_UPDIFF")
    val rnd = new scala.util.Random(4242)
    // upsert probes the target's keys, so the table must exist first
    JdbcLoad.append(Seq((-1L, "seed", 0.0)).toDF("id", "name", "score"),
      url, "D_UPDIFF")
    var present = Set(-1L)
    (1 to 5).foreach { round =>
      val keys = Seq.fill(40)(rnd.nextInt(80).toLong).distinct
      val batch = keys.map(k => (k, s"n_$k", k * 0.5)).toDF("id", "name", "score")
      val want = (keys.toSet -- present).size.toLong
      val got = JdbcLoad.upsert(spark, batch, url, "D_UPDIFF", Seq("id"))
      assert(got == want,
        s"round $round: upsert reported $got inserts, set-difference says $want")
      present ++= keys
      assert(Tables.readJdbc(spark, url, "D_UPDIFF").count() == present.size,
        s"round $round: table row count diverged from the reference key set")
    }
  }

  test("upsert inserts only absent keys and reports the audit count; idempotent") {
    drop("D_UP")
    JdbcLoad.append(dim(100), url, "D_UP")
    // 50 overlapping + 30 new
    val incoming = dim(80, from = 51)
    assert(JdbcLoad.upsert(spark, incoming, url, "D_UP", Seq("id")) == 30L)
    assert(Tables.readJdbc(spark, url, "D_UP").count() == 130)
    // replay: nothing new, nothing duplicated
    assert(JdbcLoad.upsert(spark, incoming, url, "D_UP", Seq("id")) == 0L)
    val dupKeys = Tables.readJdbc(spark, url, "D_UP")
      .groupBy("id").count().filter(col("count") > 1).count()
    assert(dupKeys == 0, "upsert duplicated keys")
  }
}
