package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The reference's LOAD side re-expressed for Spark: warehouse.py writes
  * every dim/fact/cube INTO MySQL — per-row `INSERT` statements
  * (warehouse.py:82,92,...,207), `TRUNCATE`+`INSERT...SELECT` refreshes
  * (warehouse.py:254), and SELECT-then-INSERT-if-missing upserts —
  * all through one client connection. The engine's primary warehouse is
  * parquet + [[AtomicPublish]]; this module is the EXPORT path for a
  * serving database, with each reference shape made set-based and
  * parallel:
  *
  *  - [[append]] (S6): `numPartitions` concurrent connections, each
  *    streaming batched `INSERT`s (`batchsize` rows per round trip) —
  *    the per-row client loop becomes executor-side batched writes.
  *  - [[refresh]] (S8): full refresh via STAGING-TABLE SWAP — write the
  *    new generation to `<table>_STAGING`, then swap names in one
  *    connection. Readers see old-complete or new-complete, never a
  *    truncated half-load (the reference needs a transaction for this;
  *    a multi-partition Spark write cannot span one, so the atomicity
  *    moves to the metadata swap — MySQL's multi-table `RENAME TABLE`
  *    is a single atomic statement; on engines whose renames are
  *    separate DDL (Derby here) the swap window is two statements,
  *    documented, with old data never partially overwritten either
  *    way).
  *  - [[upsert]] (J3 against a JDBC target): anti-join the target's
  *    keys, append only the new rows — the reference's row-at-a-time
  *    existence probe as one set operation. Single-writer contract, as
  *    everywhere in this engine.
  */
object JdbcLoad {

  private def writer(df: DataFrame, url: String, table: String,
                     options: Map[String, String], batchSize: Int,
                     numPartitions: Option[Int]) = {
    val shaped = numPartitions.fold(df)(df.coalesce)
    shaped.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .options(options)
  }

  /** S6: batched parallel append. One JDBC connection per partition, so
    * cap `numPartitions` to what the target tolerates (the scale knob a
    * 1000-executor cluster must set — a default Spark write would open
    * a connection per task). */
  def append(df: DataFrame, url: String, table: String,
             options: Map[String, String] = Map.empty,
             batchSize: Int = 1000,
             numPartitions: Option[Int] = Some(8)): Unit =
    writer(df, url, table, options, batchSize, numPartitions)
      .mode("append").save()

  /** Driver-side connection honoring the SAME `options` the executor
    * writes use: `user`/`password` go into connection Properties (the
    * production target needs credentials that aren't embedded in the
    * URL) and `driver` is class-loaded first (DriverManager won't find
    * a driver jar the Spark session loaded lazily). */
  private def connect(url: String,
                      options: Map[String, String]): java.sql.Connection = {
    options.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    options.get("user").foreach(props.setProperty("user", _))
    options.get("password").foreach(props.setProperty("password", _))
    java.sql.DriverManager.getConnection(url, props)
  }

  /** One driver-side DDL statement on a fresh connection. */
  private def ddl(url: String, options: Map[String, String],
                  sql: String): Unit = {
    val conn = connect(url, options)
    try { conn.createStatement().execute(sql): Unit } finally conn.close()
  }

  /** Existence probe that respects the target's identifier folding:
    * try the exact name, then the case the engine says it stores
    * unquoted identifiers in (DatabaseMetaData.storesUpper/LowerCase).
    * MySQL on Linux is case-SENSITIVE for table names, so a blanket
    * toUpperCase would miss a lowercase table and [[refresh]] would
    * wrongly take the create branch.
    *
    * `getTables` takes a search PATTERN, where `_` matches any single
    * char and `%` any run — unescaped, the probe for `D_UP_STAGING`
    * also matches `DXUPXSTAGING` and [[refresh]] would DROP/RENAME
    * against a table that doesn't exist. Two defenses, because drivers
    * disagree: metacharacters are escaped with the driver's own escape
    * string where one exists (DatabaseMetaData.getSearchStringEscape —
    * Derby returns "" and honors NO escape in metadata patterns), and
    * the result set is post-filtered to an exact TABLE_NAME match, so
    * the probe is exact even on escape-less drivers. */
  private def tableExists(url: String, options: Map[String, String],
                          table: String): Boolean = {
    val conn = connect(url, options)
    try {
      val md = conn.getMetaData
      val esc = Option(md.getSearchStringEscape).getOrElse("")
      def pattern(name: String): String =
        if (esc.isEmpty) name
        else name.flatMap {
          case c if esc.length == 1 && c == esc.head => esc + c
          case c @ ('_' | '%') => esc + c
          case c => c.toString
        }
      // Locale.ROOT: identifier folding must match the DATABASE's ASCII
      // case rules, not the JVM default locale's — under tr-TR,
      // "d_client".toUpperCase is "D_CLİENT" (dotted İ), the probe
      // misses the real D_CLIENT, and refresh takes the create branch
      // against an existing table (JdbcLoadSpec pins this under a
      // swapped default locale).
      val root = java.util.Locale.ROOT
      val candidates = (Seq(table) ++
        (if (md.storesUpperCaseIdentifiers) Seq(table.toUpperCase(root)) else Nil) ++
        (if (md.storesLowerCaseIdentifiers) Seq(table.toLowerCase(root)) else Nil)).distinct
      candidates.exists { t =>
        val rs = md.getTables(null, null, pattern(t), null)
        try {
          var found = false
          while (!found && rs.next())
            found = rs.getString("TABLE_NAME") == t
          found
        } finally rs.close()
      }
    } finally conn.close()
  }

  /** S8: full refresh via staging swap. The corpus-sized write lands in
    * `<table>_STAGING` (parallel, batched, target table untouched and
    * serving throughout); the swap is metadata-only. `renameSql` shapes
    * the engine-specific rename — default is the portable two-statement
    * form; MySQL callers pass the atomic
    * `RENAME TABLE t TO t_OLD, t_STAGING TO t`. */
  def refresh(spark: SparkSession, df: DataFrame, url: String, table: String,
              options: Map[String, String] = Map.empty,
              batchSize: Int = 1000,
              numPartitions: Option[Int] = Some(8),
              renameSql: (String, String, String) => Seq[String] =
                (t, staging, old) => Seq(
                  s"RENAME TABLE $t TO $old",
                  s"RENAME TABLE $staging TO $t")): Unit = {
    val staging = s"${table}_STAGING"
    val old = s"${table}_OLD"
    if (tableExists(url, options, staging)) ddl(url, options, s"DROP TABLE $staging")
    if (tableExists(url, options, old)) ddl(url, options, s"DROP TABLE $old")
    writer(df, url, staging, options, batchSize, numPartitions)
      .mode("errorifexists").save()
    if (tableExists(url, options, table)) {
      renameSql(table, staging, old).foreach(ddl(url, options, _))
      ddl(url, options, s"DROP TABLE $old")
    } else ddl(url, options, s"RENAME TABLE $staging TO $table")
  }

  /** J3's anti-join upsert against a JDBC target: read the target's key
    * columns (pushed projection — only the keys cross the wire), keep
    * the incoming rows whose key is absent, batch-append those. Returns
    * the inserted count (the reference's `inserted/skipped` audit, O3).
    * Single-writer: a concurrent writer could race the existence read;
    * same contract as the reference's non-locking probe loop. */
  def upsert(spark: SparkSession, df: DataFrame, url: String, table: String,
             keys: Seq[String],
             options: Map[String, String] = Map.empty,
             batchSize: Int = 1000,
             numPartitions: Option[Int] = Some(8)): Long = {
    val existing = graft.Tables.readJdbc(spark, url, table, options)
      .select(keys.map(col): _*)
    val fresh = df.join(existing, keys, "left_anti")
    // one pass: materialize the delta before counting + writing so the
    // anti-join doesn't run twice
    val delta = fresh.persist()
    try {
      val n = delta.count()
      if (n > 0)
        writer(delta, url, table, options, batchSize, numPartitions)
          .mode("append").save()
      n
    } finally { delta.unpersist(); () }
  }
}
