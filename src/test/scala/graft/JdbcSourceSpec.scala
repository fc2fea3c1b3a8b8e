package graft

import org.apache.spark.sql.functions._

/** End-to-end exercise of the JDBC extraction surface (the reference's
  * real source protocol, warehouse.py:25-43) against embedded Apache
  * Derby — the one SQL engine already on the Spark classpath
  * (/opt/spark/jars/derby*.jar), so the round trip needs no network and
  * no new dependency. Rounds 1-6 could only unit-test the option map;
  * this pins the live path: scheme routing, actual row transfer, and
  * the parallel bounded-range extraction that replaces the reference's
  * single-connection full-table pull (warehouse.py:37).
  */
class JdbcSourceSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftjdbc"

  private def seed(): Unit = {
    System.setProperty("derby.stream.error.file", "/root/repo/target/derby.log")
    val conn = java.sql.DriverManager.getConnection(s"$url;create=true")
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE T") catch { case _: java.sql.SQLException => () }
      st.execute("CREATE TABLE T (ID BIGINT NOT NULL, NAME VARCHAR(32), VAL DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO T VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"row_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch(): Unit
    } finally conn.close()
  }

  test("readJdbc round-trips an embedded Derby table; jdbc: dirs route automatically") {
    seed()
    import spark.implicits._
    val df = Tables.readJdbc(spark, url, "T")
    assert(df.count() == 100)
    assert(df.filter(col("ID") === 42L).select("NAME").as[String].head() == "row_42")
    // Tables.read treats a jdbc: "directory" as a database: the whole
    // query battery can point at a warehouse by swapping the dir string.
    assert(Tables.read(spark, url, "T").count() == 100)
  }

  test("partitionColumn turns the extraction into parallel bounded range scans") {
    seed()
    val df = Tables.readJdbc(spark, url, "T",
      partitionColumn = Some("ID"), bounds = Some((1L, 100L)), numPartitions = 4)
    // the scale path: numPartitions concurrent range queries, not one
    // connection dragging the table through a single task
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    assert(df.agg(sum(col("VAL"))).head().getDouble(0) == (1 to 100).map(_ * 1.5).sum)
  }
}
