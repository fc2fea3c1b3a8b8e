package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped shared intermediates for the query battery.
  *
  * The reference materializes `cube_table` once per ETL run and serves
  * every downstream view from that one table
  * (/root/reference/warehouse.py:212-305) — it never re-derives the
  * 7-way join per query. The Spark analogue of that materialize-once
  * contract is `persist`: when several queries in one session consume
  * the identical expensive intermediate (the denormalized cube; the
  * MinHash-LSH verified pair list and its component closure), the first
  * consumer materializes it and the rest read the cached columnar form
  * instead of re-running the join chain / candidate generation.
  *
  * Scale posture: at 100 TB the cube would be materialized to a TABLE
  * (exactly what `s8_full_refresh_sink` exercises) rather than the
  * block-manager cache, but the sharing decision is the same — one
  * build, many readers. MEMORY_AND_DISK spills oversized partitions
  * instead of recomputing the lineage. The memo key includes the
  * session UUID so concurrent test sessions never share plans across
  * stopped contexts, and the fixture dir so different scale factors
  * coexist.
  *
  * Correctness is unaffected: a persisted plan returns bit-identical
  * rows to its lineage, and every consumer below is still individually
  * DuckDB-oracle-checked. Plan-shape tests pin the UNCACHED builder
  * ([[graft.etl.StarSchema.build]]) so the join topology stays guarded.
  */
object Shared {
  private val memo = new ConcurrentHashMap[(Int, String, String), DataFrame]()

  /** Lifecycle contract: entries live as long as their session — the
    * intended scope for a bench/verify run, which stops the context at
    * exit and takes the cached blocks with it. So that a LONG-LIVED
    * process cycling many sessions doesn't accumulate stale driver-side
    * plan references (the cached blocks themselves die with each
    * context), the first cache entry per session registers a listener
    * that evicts that session's memo entries on application end. */
  private val cleanupHooked = new ConcurrentHashMap[Int, Boolean]()
  private def hookCleanup(spark: SparkSession): Unit = {
    val key = System.identityHashCode(spark)
    cleanupHooked.computeIfAbsent(key, _ => {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          memo.keySet.removeIf(_._1 == key)
          once.keySet.removeIf(_._1 == key)
          objMemo.keySet.removeIf(_._1 == key)
          cleanupHooked.remove(key)
        }
      })
      true
    }): Unit
  }

  /** Test hook (SharedSoakSpec): per-session entry counts across the
    * three memo maps, so a concurrency soak can assert that sessions
    * coexist without evicting or duplicating each other's entries. */
  private[graft] def memoCounts(spark: SparkSession): (Int, Int, Int) = {
    val key = System.identityHashCode(spark)
    def c(m: ConcurrentHashMap[(Int, String, String), _]): Int = {
      var n = 0
      m.forEach((k, _) => if (k._1 == key) n += 1)
      n
    }
    (c(memo), c(objMemo), c(once))
  }

  /** Two materialization forms behind one memo, selected by the same
    * deployment conf as [[materialized]]:
    *
    *   - default: `persist(MEMORY_AND_DISK)` — right for a single-JVM
    *     harness where the block manager owns the whole heap.
    *   - `graft.materialize.dir` set: write-parquet-and-read-back — the
    *     production form the header Scaladoc promises ("at 100 TB the
    *     cube would be materialized to a TABLE"). On memory-tight
    *     executors the block-cache form is actively dangerous: caching a
    *     corpus-sized intermediate (the sf10 cube is 60M wide rows)
    *     crowds the storage pool until an unrelated allocation — in the
    *     observed failure, deserializing a broadcast dim's
    *     LongHashedRelation into the MemoryStore — becomes the
    *     last-straw OOM. A written table costs one extra scan per
    *     consumer and holds zero executor memory between queries.
    *
    * Row identity of the two forms is pinned by MaterializeSpec. The
    * materialize dir is per-run state (one writer per path), same
    * convention as [[materialized]]. */
  private def cached(spark: SparkSession, dir: String, what: String)(
      build: => DataFrame): DataFrame = {
    hookCleanup(spark)
    memo.computeIfAbsent((System.identityHashCode(spark), dir, what),
      _ => spark.conf.getOption("graft.materialize.dir") match {
        case Some(root) =>
          val out = s"$root/${what}_${graft.Tables.dirSlug(dir)}"
          matWrite(spark, build, out)
          spark.read.parquet(out)
        case None => build.persist(StorageLevel.MEMORY_AND_DISK)
      })
  }

  /** Materialization write with a BOUNDED parquet writer footprint.
    *
    * Parquet's writer buffers are UNTRACKED by Spark's memory manager:
    * each open file holds up to `parquet.block.size` of encoded pages
    * plus, per column, a dictionary hash map that grows until the
    * dictionary-page threshold trips the plain-encoding fallback. A
    * denormalized materialization (the cube: every fact row joined ~4×
    * wider) amplifies a 128 MB scan slice into ~0.5 GB of write-side
    * work, so at 16 concurrent tasks the DEFAULT 128 MB row group can
    * demand multiple GB of unevictable buffers per executor — on the
    * sf10 64 MiB/core rehearsal (SCALE.md r13) the OOM was literally
    * inside PlainLongDictionaryValuesWriter.rehash. Two bounds, both
    * per-write options so nothing global changes:
    *
    *   - row group = 32 MiB (`graft.materialize.rowgroup.bytes` to
    *     override): 16 writers buffer ≤ 0.5 GB total. These tables are
    *     written once and scanned sequentially a handful of times inside
    *     the pipeline — the read-side cost of smaller groups is noise.
    *   - dictionary page = 256 KiB: near-unique key columns (where the
    *     dictionary can never win) fall back to plain encoding 4× sooner
    *     and drop their maps; low-cardinality dim columns never reach
    *     the threshold and still dictionary-encode.
    *
    * Values are unaffected (row-group geometry only); every gated
    * consumer sorts, so read-back order is immaterial. */
  private def matWrite(spark: SparkSession, df: DataFrame,
                       out: String): Unit = {
    val rgKey = "graft.materialize.rowgroup.bytes"
    val rowGroup = spark.conf.getOption(rgKey).map { raw =>
      // name the conf key on a malformed value — a bare toLong throws a
      // NumberFormatException that says only "For input string", the
      // same unnamed-failure class SessionConf.parse was fixed for
      try raw.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"malformed $rgKey value '$raw' — expected a byte count")
      }
    }.getOrElse(32L * 1024 * 1024)
    df.write.mode("overwrite")
      .option("parquet.block.size", rowGroup.toString)
      .option("parquet.dictionary.page.size", (256 * 1024).toString)
      .parquet(out)
  }

  /** The denormalized star cube — one broadcast-join build per
    * (session, fixture dir), shared by `j2_cube_view`,
    * `s8_full_refresh_sink`, `etl_cube_build`, and `o1_pipeline_counts`. */
  def cube(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cube")(graft.etl.StarSchema.build(spark, dir).cube)

  /** MinHash-LSH verified near-dup pairs over `documents` — one
    * candidate-generation + verification pass per (session, dir),
    * shared by `dd2_minhash_lsh`, `dd7_cluster_dedup`, and
    * `px2_cluster_curation` (which previously each recomputed the
    * identical edge set). */
  def lshPairs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "lsh_pairs")(
      graft.ops.TextDedup.minhashLsh(graft.Tables.documents(spark, dir),
        "doc_id", "text"))

  /** Span-coverage profile over `documents` (dd12's chain — the
    * postings shuffle + per-doc interval union), shared by
    * `dd12_span_coverage` and `px4_pack_manifest` (whose gate reads
    * exactly this frame). */
  def spanCoverage(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "span_cov")(
      graft.ops.TextDedup.spanCoverage(graft.Tables.documents(spark, dir),
        "doc_id", "text"))

  /** Session-scoped memo for DRIVER-SIDE model objects (sim11/sim12's
    * trained IVF centroids and PQ codebook): the analogue of [[cached]]
    * for values that live on the driver rather than in the block
    * manager. Same lifecycle (evicted on application end). Dependency
    * rule as for [[lshClusters]]: resolve any `obj`/`frame` dependency
    * BEFORE the memo call — nesting computeIfAbsent on one map can
    * throw "Recursive update" hash-bin-dependently. */
  private val objMemo = new ConcurrentHashMap[(Int, String, String), AnyRef]()
  def obj[A <: AnyRef : scala.reflect.ClassTag](
      spark: SparkSession, dir: String, what: String)(build: => A): A = {
    hookCleanup(spark)
    val v = objMemo.computeIfAbsent(
      (System.identityHashCode(spark), dir, what), _ => build)
    // The cast below is unchecked by the JVM (erasure): two call sites
    // reusing one `what` key with different result types would otherwise
    // CCE at first USE of the value, far from the offending call. Check
    // the runtime class here so a key collision fails AT the memo with a
    // message naming the key. (Erasure still blinds this to type
    // parameters — Seq[X] vs Seq[Y] — but every current payload is a
    // distinct top-level class, which is exactly what collisions mix.)
    val expect = implicitly[scala.reflect.ClassTag[A]].runtimeClass
    require(expect.isInstance(v),
      s"Shared.obj key collision on (session,$dir,$what): memo holds " +
        s"${v.getClass.getName}, caller expects ${expect.getName}")
    v.asInstanceOf[A]
  }

  /** Eagerly-materialized once-per-(session, dir, key) frame for SMALL
    * derived inputs that later stages self-join (sim9's MMR pool and
    * pairwise sims — poolK·|Q| and poolK²·|Q| rows). Two forms behind
    * one contract:
    *
    *   - default: `localCheckpoint(eager)` — cheapest in a single-JVM
    *     harness, but the blocks are executor-local and NOT
    *     fault-tolerant: on a real cluster an executor loss makes every
    *     later consumer fail unrecoverably.
    *   - `graft.materialize.dir` set (a durable, cluster-visible path):
    *     write-parquet-and-read-back — the production form. The
    *     materialization survives executor loss, has no block-locality
    *     concerns, and is exactly the persist-and-serve shape the ANN
    *     index uses ([[graft.ops.AnnIndexStore]]).
    *
    * Row identity of the two forms is pinned by MaterializeSpec. Memoized
    * through [[obj]] (NOT [[cached]]): both forms return an
    * already-materialized frame, and layering persist() over a
    * self-joined checkpoint RDD trips CacheManager's attribute rewrite
    * ("key not found" at plan substitution). */
  def materialized(spark: SparkSession, dir: String, what: String)(
      build: => DataFrame): DataFrame =
    obj(spark, dir, what) {
      spark.conf.getOption("graft.materialize.dir") match {
        case Some(root) =>
          val out = s"$root/${what}_${graft.Tables.dirSlug(dir)}"
          matWrite(spark, build, out)
          spark.read.parquet(out)
        case None => build.localCheckpoint(true)
      }
    }

  /** Public form of [[cached]] for serving-index frames whose builder
    * lives with the operator (sim11's assigned corpus, sim12's PQ-coded
    * corpus): one build + persist per (session, dir, key), every later
    * consumer reads the columnar cache. */
  def frame(spark: SparkSession, dir: String, what: String)(
      build: => DataFrame): DataFrame = cached(spark, dir, what)(build)

  private val once = new ConcurrentHashMap[(Int, String, String), Boolean]()

  /** Run a side-effecting layout setup exactly once per (session, dir) —
    * for queries whose subject is a PERSISTENT layout artifact (bucketed
    * tables): the layout is written once and queried many times in a
    * real warehouse, so re-writing it per query run would benchmark the
    * setup, not the operator under test. Sink operators (s6-s8, cp1,
    * zo1) do NOT use this — there the write IS the operator. */
  def setupOnce(spark: SparkSession, dir: String, what: String)(
      body: => Unit): Unit = {
    hookCleanup(spark)
    once.computeIfAbsent((System.identityHashCode(spark), dir, what),
      _ => { body; true }): Unit
  }

  /** Connected-component labels over [[lshPairs]] — the transitive
    * cluster closure shared by `dd7` and `px2`. Below the local-path
    * threshold this is a LocalRelation (broadcastable for free), so the
    * persist costs nothing; above it, it pins the converged label table. */
  def lshClusters(spark: SparkSession, dir: String): DataFrame = {
    // Resolve the dependency BEFORE the memo entry: calling lshPairs
    // inside this cached() lambda nests a computeIfAbsent in a
    // computeIfAbsent on the same map, and ConcurrentHashMap throws
    // "Recursive update" when a clusters consumer (dd7/px2) runs before
    // any pairs consumer (dd2) AND the two keys land in one hash bin —
    // run-order- and identityHashCode-dependent, so it surfaces as a
    // once-in-a-while battery crash, not a test failure.
    val pairs = lshPairs(spark, dir)
    cached(spark, dir, "lsh_clusters")(
      graft.ops.Clusters.connectedComponents(pairs, "doc_a", "doc_b"))
  }
}
