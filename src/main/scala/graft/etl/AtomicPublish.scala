package graft.etl

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table transactional atomicity — the one reference behavior the
  * engine had documented as a non-goal (warehouse.py:50-70,252-301 wraps
  * each multi-table load and the cube rebuild in multi-statement MySQL
  * transactions, so a reader never sees table A from batch N next to
  * table B from batch N-1).
  *
  * On a file warehouse the equivalent primitive is SNAPSHOT PUBLICATION:
  * writers materialize EVERY output of a batch under a fresh versioned
  * directory (`root/v<N>/<table>/`), then commit the whole batch by
  * atomically replacing one version pointer (`root/_CURRENT`). Readers
  * resolve the pointer once per job ([[snapshot]]) and read all tables
  * from that same version — a consistent multi-table view by
  * construction. This is the single-pointer commit at the heart of
  * Iceberg/Delta (their metadata-file swap), reduced to plain parquet
  * plus one rename; no table data is ever mutated in place.
  *
  * Failure atomicity: all writes land under the NEW version directory
  * before the pointer moves, so a crash mid-batch leaves `_CURRENT`
  * untouched and readers keep the previous consistent snapshot; the
  * orphaned half-written `v<N+1>` is invisible and reclaimed by
  * [[vacuum]]. The pointer read/swap primitive is pluggable
  * ([[PointerStore]]), selected engine-wide by
  * `SPARK_GRAFT_POINTER_STORE` ([[DefaultStore]]): the default
  * [[RenamePointerStore]] implements it as
  * `FileContext.rename(…, Rename.OVERWRITE)` — atomic on POSIX
  * filesystems and HDFS — with a verify-then-swap whose microsecond
  * window the single-writer convention covers; [[CasPointerStore]] is
  * a TRUE create-if-absent CAS (generation files) for deployments that
  * want no residual window at all, mapping to a conditional PUT on
  * object stores. PointerStoreSpec pins the contract every
  * implementation must satisfy (claim exclusivity, swap visibility,
  * crashed-claim recoverability), and the full oracle battery is
  * rehearsed green under the CAS store (SCALE.md round-15).
  *
  * Concurrency: single writer, many readers — the reference's shape (one
  * ETL job owns the warehouse). As insurance against a VIOLATED
  * single-writer convention, the commit is conditional ([[stage]] /
  * [[commit]]): outputs land in a private `tx-<uuid>/` staging dir, and
  * the commit (a) claims the next version directory by a no-overwrite
  * rename — two publishers racing from the same base version collide
  * there, exactly one wins — and (b) verifies the pointer still reads
  * the staged-against version before swapping it. The loser throws
  * [[java.util.ConcurrentModificationException]] naming both versions;
  * it never silently clobbers the winner's commit or data, and nothing
  * in the commit path ever deletes another publisher's claim — orphan
  * reclaim lives solely in the age-guarded [[vacuum]], so the only way
  * to destroy a live publisher's in-flight state is to run vacuum with
  * `minAgeMs` shorter than a write phase. (On an object store the
  * no-overwrite rename becomes a conditional PUT or a catalog CAS;
  * layout and protocol unchanged.)
  */
object AtomicPublish {

  private val Pointer = "_CURRENT"

  private def fc(spark: SparkSession): FileContext =
    FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)

  /** Read a tiny pointer/metadata file to EOF. `InputStream.read` may
    * legally return fewer bytes than available; a single read that came
    * up short here would TRUNCATE the version digits and PARSE A WRONG
    * VERSION (not a safe failure) — the pointer is the one place
    * correctness must not lean on "a 60-byte file never splits in
    * practice". Loops until EOF or `cap` (pointer payloads are well
    * under it either way). */
  private[graft] def readToEof(in: java.io.InputStream, cap: Int = 256): String = {
    val buf = new Array[Byte](cap)
    var off = 0
    var n = 0
    while (off < cap && { n = in.read(buf, off, cap - off); n > 0 }) off += n
    new String(buf, 0, off, "UTF-8")
  }

  /** The pluggable pointer-commit primitive — the ONE place the
    * publish protocol touches mutable shared state. Everything else
    * (staging dirs, claim renames, immutable version dirs) is
    * filesystem-portable as-is; a deployment whose store cannot rename
    * atomically (S3 and friends) swaps only this: `read` resolves the
    * committed version, `compareAndSwap` advances it iff it still
    * reads `expected`. Implementations must make compareAndSwap
    * LINEARIZABLE against concurrent compareAndSwaps for the contract
    * to hold (the rename default approximates this with a
    * verify-then-swap whose window the single-writer convention
    * covers; a catalog/conditional-PUT implementation closes it).
    * PointerStoreContractSpec is the conformance test. */
  trait PointerStore {
    /** The committed version, or None before the first publish. */
    def read(ctx: FileContext, root: String): Option[Long]
    /** Advance the pointer to `next` iff it currently reads `expected`;
      * false = precondition failed (a concurrent publisher advanced
      * it). Must never leave the pointer unreadable. */
    def compareAndSwap(ctx: FileContext, root: String,
                       expected: Option[Long], next: Long): Boolean
  }

  /** Default [[PointerStore]]: the pointer is a one-line `_CURRENT`
    * file swapped by write-temp + atomic rename — correct on POSIX /
    * HDFS. The verify-then-rename pair is NOT a true CAS: a commit
    * landing in the microsecond between the read and the rename is the
    * residual window the single-writer convention covers (every
    * MINUTES-long window — stage, encode, merge — is closed by the
    * claim protocol and `expectedBase` pins around it). */
  object RenamePointerStore extends PointerStore {
    def read(ctx: FileContext, root: String): Option[Long] = {
      val p = new Path(root, Pointer)
      if (!ctx.util.exists(p)) None
      else {
        val in = ctx.open(p)
        try Some(readToEof(in).trim.toLong) finally in.close()
      }
    }
    def compareAndSwap(ctx: FileContext, root: String,
                       expected: Option[Long], next: Long): Boolean =
      read(ctx, root) == expected && {
        val tmp = new Path(root, s"$Pointer.tmp-${java.util.UUID.randomUUID}")
        val out = ctx.create(tmp,
          java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
            org.apache.hadoop.fs.CreateFlag.OVERWRITE),
          Options.CreateOpts.createParent())
        try out.write(next.toString.getBytes("UTF-8")) finally out.close()
        ctx.rename(tmp, new Path(root, Pointer), Options.Rename.OVERWRITE)
        true
      }
  }

  /** A TRUE-CAS [[PointerStore]] on any filesystem with atomic
    * create-if-absent — the production-grade alternative to
    * [[RenamePointerStore]]'s verify-then-swap, with NO residual race
    * window. The pointer is a directory `_CURRENT.d/` of immutable
    * GENERATION files `gen-<G>` whose content is the committed version;
    * the committed pointer is the highest generation present.
    *
    *   - `read`: list the dir, parse the max generation, read its
    *     content. A generation file becomes visible atomically WITH its
    *     content (written to a temp name, then renamed without
    *     overwrite), so a reader never observes a partial pointer.
    *   - `compareAndSwap`: read (maxGen, version); precondition-check
    *     against `expected`; then attempt to create `gen-<maxGen+1>`
    *     atomically-if-absent — a hardlink (`link(2)`) of a complete
    *     temp file on the local filesystem, a no-overwrite rename on
    *     HDFS, a conditional PUT (`If-None-Match: *`) on an object
    *     store. The create-if-absent is the linearization point: two
    *     CAS calls racing from the same observed generation propose
    *     the SAME file name, the store admits exactly one, and the
    *     loser returns false. A nonce read-back double-checks the
    *     verdict, failing safe on any store whose no-overwrite
    *     semantics are weaker than advertised.
    *
    * Old generations are pruned with a deep retention margin
    * ([[CasPointerStore.Retain]]) rather than eagerly: pruning
    * re-exposes a generation name, and a CAS stalled between its read
    * and its create for that many intervening commits could then
    * create a stale below-max file and misreport success. Inside the
    * publish protocol that is unreachable — a committer holds the
    * exclusive `v<next>` claim, so a CAS proposing generation G runs
    * only after winning claim G, and G can't be reproposed — but the
    * margin keeps the primitive safe even for callers outside the
    * protocol, at ~8 bytes per retained generation.
    *
    * A root commits to ONE store implementation for its lifetime: the
    * rename store and this one keep their state under different names
    * and do not see each other's pointer. */
  object CasPointerStore extends PointerStore {
    private val Dir = s"$Pointer.d"
    private[graft] val Retain = 64
    private def gname(g: Long): String = f"gen-$g%020d"

    /** On the LOCAL filesystem the default `LocalFs` is a ChecksumFs:
      * every file rename is secretly TWO renames (data + `.crc`
      * sidecar), a non-atomic pair under which concurrent CAS attempts
      * interleave pathologically (one racer's data lands with another's
      * crc; the winner reads back a foreign nonce; nobody claims the
      * committed generation). Generation files are tiny, self-verified
      * by the nonce, and never read by anything else — so route their
      * I/O through a raw, checksum-free local FileContext instead.
      * Remote stores (HDFS, object stores) do their atomicity
      * server-side and are used as given. */
    private lazy val rawLocal: FileContext = {
      val conf = new org.apache.hadoop.conf.Configuration()
      conf.set("fs.AbstractFileSystem.file.impl",
        "org.apache.hadoop.fs.local.RawLocalFs")
      FileContext.getFileContext(java.net.URI.create("file:///"), conf)
    }
    private def genCtx(ctx: FileContext, root: String): FileContext = {
      val scheme = ctx.makeQualified(new Path(root)).toUri.getScheme
      if (scheme == null || scheme == "file") rawLocal else ctx
    }

    private def listGens(ctx: FileContext, root: String): Seq[Long] = {
      val c = genCtx(ctx, root)
      val d = new Path(root, Dir)
      if (!c.util.exists(d)) Nil
      else {
        val it = c.listStatus(d)
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
          .map(_.getPath.getName)
          .filter(_.startsWith("gen-"))
          .flatMap(_.drop(4).toLongOption)
          .toSeq
      }
    }

    /** A generation file's content: `<version> <writer-nonce>`, written
      * whole to a temp name then renamed, so readers only ever observe
      * complete files. */
    private def readGenRaw(ctx: FileContext, root: String,
                           g: Long): (Long, String) = {
      val in = genCtx(ctx, root).open(new Path(new Path(root, Dir), gname(g)))
      try {
        val parts = readToEof(in).trim.split(' ')
        (parts(0).toLong, if (parts.length > 1) parts(1) else "")
      } finally in.close()
    }

    def read(ctx: FileContext, root: String): Option[Long] = {
      val gens = listGens(ctx, root)
      if (gens.isEmpty) None else Some(readGenRaw(ctx, root, gens.max)._1)
    }

    def compareAndSwap(ctx: FileContext, root: String,
                       expected: Option[Long], next: Long): Boolean = {
      val gens = listGens(ctx, root)
      val observed =
        if (gens.isEmpty) None else Some(readGenRaw(ctx, root, gens.max)._1)
      observed == expected && {
        val c = genCtx(ctx, root)
        val nextGen = gens.maxOption.fold(0L)(_ + 1)
        val dir = new Path(root, Dir)
        val nonce = java.util.UUID.randomUUID.toString
        // The create-if-absent itself, per store class:
        //   - LOCAL: hardlink a complete temp file onto the generation
        //     name (link(2) — atomic, fails if the name exists, and the
        //     content appears whole because both names are one inode).
        //     A no-overwrite RENAME is *not* safe here: Hadoop's
        //     existence check is check-then-act over a POSIX rename
        //     that silently REPLACES files, so two racers can both see
        //     "success".
        //   - REMOTE (HDFS, object stores): write a temp file, rename
        //     without overwrite — atomic server-side (conditional PUT
        //     on an object store).
        val renamed =
          if (c eq rawLocal) {
            import java.nio.file.{Files, Paths}
            val dirP = Paths.get(ctx.makeQualified(dir).toUri.getPath)
            Files.createDirectories(dirP)
            val tmpP = dirP.resolve(s".tmp-$nonce")
            Files.write(tmpP, s"$next $nonce".getBytes("UTF-8"))
            try { Files.createLink(dirP.resolve(gname(nextGen)), tmpP); true }
            catch { case _: java.nio.file.FileAlreadyExistsException => false }
            finally { Files.deleteIfExists(tmpP); () }
          } else {
            val tmp = new Path(dir, s".tmp-$nonce")
            val out = c.create(tmp,
              java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE),
              Options.CreateOpts.createParent())
            try out.write(s"$next $nonce".getBytes("UTF-8")) finally out.close()
            try { c.rename(tmp, new Path(dir, gname(nextGen))); true }
            catch {
              case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                   _: org.apache.hadoop.fs.PathExistsException =>
                c.delete(tmp, false); false
            }
          }
        // Belt-and-braces read-back: you won iff the committed
        // generation file holds YOUR nonce. With an atomic
        // create-if-absent this never disagrees with `renamed`; it
        // exists to fail safe on a store whose no-overwrite semantics
        // turn out weaker than advertised.
        val won = renamed && readGenRaw(ctx, root, nextGen)._2 == nonce
        // deep-margin prune (see Scaladoc); best-effort, losers' and
        // readers' correctness never depends on which gens remain
        // because read always takes the max
        if (won) gens.filter(_ < nextGen - Retain)
          .foreach(g => try c.delete(new Path(dir, gname(g)), false)
            catch { case _: java.io.IOException => () })
        won
      }
    }
  }

  /** The deployment-selected default [[PointerStore]]: every
    * AtomicPublish entry point defaults to this, so ONE environment
    * flag (`SPARK_GRAFT_POINTER_STORE=cas|rename`) switches the whole
    * engine's pointer primitive — no call-site changes. Unset =
    * rename (POSIX/HDFS). A root commits to one store for its
    * lifetime: the two keep their pointer state under different names
    * and do not see each other's commits, so flip the flag only with
    * fresh roots (the per-run sinks the harness uses) or after a
    * re-seed. The full oracle battery is rehearsed green under `cas`
    * (SCALE.md round-15). */
  val DefaultStore: PointerStore = sys.env.get("SPARK_GRAFT_POINTER_STORE") match {
    case Some("cas") => CasPointerStore
    case Some("rename") | None => RenamePointerStore
    case Some(other) => throw new IllegalArgumentException(
      s"SPARK_GRAFT_POINTER_STORE='$other' (expected cas|rename)")
  }

  /** The committed version, or None before the first publish. */
  def currentVersion(spark: SparkSession, root: String,
                     store: PointerStore = DefaultStore): Option[Long] =
    store.read(fc(spark), root)

  /** A resolved snapshot: table reads through it all see ONE version,
    * even if a publish commits concurrently mid-job. */
  final case class Snapshot(root: String, version: Long) {
    def table(spark: SparkSession, name: String): DataFrame =
      spark.read.parquet(s"$root/v$version/$name")
  }

  /** Resolve the current snapshot once; throws before the first publish. */
  def snapshot(spark: SparkSession, root: String,
               store: PointerStore = DefaultStore): Snapshot =
    Snapshot(root, currentVersion(spark, root, store).getOrElse(
      throw new IllegalStateException(s"no published version under $root")))

  /** TIME TRAVEL: resolve a specific retained version — "read the
    * warehouse as of batch N", the as-of read Iceberg/Delta expose via
    * snapshot ids. Works because version directories are immutable once
    * committed and [[vacuum]] is the only deleter; throws if the asked
    * version was vacuumed or never committed. */
  def snapshotAt(spark: SparkSession, root: String, version: Long): Snapshot = {
    val p = new Path(root, s"v$version")
    require(fc(spark).util.exists(p),
      s"version $version not present under $root (vacuumed or never committed)")
    Snapshot(root, version)
  }

  /** Convenience single-table read through the current snapshot. Jobs
    * touching several tables should hold one [[snapshot]] instead, so
    * all their reads resolve to the same version. */
  def readTable(spark: SparkSession, root: String, name: String,
                store: PointerStore = DefaultStore): DataFrame =
    snapshot(spark, root, store).table(spark, name)

  /** Publish `outputs` as one atomic batch; returns the new version.
    * Either every table of the batch becomes visible together, or (on
    * any failure before the pointer swap) none do. Equivalent to
    * `commit(spark, stage(spark, root, outputs))` — split those when a
    * test (or a long write phase) needs the race window explicit. */
  def publish(spark: SparkSession, root: String,
              outputs: Seq[(String, DataFrame)],
              expectedBase: Option[Option[Long]] = None,
              store: PointerStore = DefaultStore): Long =
    commit(spark, stage(spark, root, outputs, expectedBase, store), store)

  /** A written-but-uncommitted batch: every output is materialized under
    * a private staging dir, and `expected` records the version the batch
    * was built against (None before the first publish). */
  final case class Staged(root: String, txDir: String, expected: Option[Long])

  /** A small LOCAL output, written driver-side (r20 optimization):
    * manifests, ledgers and cuts are kilobyte tables whose Spark write
    * jobs dominated the per-batch fixed floor (~250 ms each against
    * ~5 ms of actual I/O — profiled in OPTIMIZATION_r20.md). When a
    * staged output's optimized plan is a [[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]]
    * of supported primitive types, its rows already sit in the driver
    * — write them through [[LocalParquet]] instead of scheduling a
    * job. Same directory layout, same parquet format, same readers.
    * Size-capped so an accidentally-local BIG relation still goes
    * through Spark. */
  private def localTable(df: DataFrame)
      : Option[(org.apache.spark.sql.types.StructType,
                Seq[org.apache.spark.sql.Row])] =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if l.data.lengthCompare(500000) <= 0 &&
            LocalParquet.supported(l.schema) =>
        import org.apache.spark.sql.types._
        val fields = l.schema.fields
        Some((l.schema, l.data.map { ir =>
          org.apache.spark.sql.Row(fields.indices.map { i =>
            if (ir.isNullAt(i)) null
            else fields(i).dataType match {
              case IntegerType => ir.getInt(i)
              case LongType => ir.getLong(i)
              case DoubleType => ir.getDouble(i)
              case FloatType => ir.getFloat(i)
              case BooleanType => ir.getBoolean(i)
              case StringType => ir.getUTF8String(i).toString
              case other => throw new IllegalStateException(other.toString)
            }
          }: _*)
        }))
      case _ => None
    }

  /** Write phase: materialize every output under a fresh `tx-<uuid>/`
    * staging dir private to this publisher — concurrent stages never
    * touch each other's files, and a crash mid-stage leaves only an
    * invisible orphan ([[vacuum]] reclaims it).
    *
    * `expectedBase` pins the version this batch was DERIVED from, for
    * callers whose outputs were computed from an earlier snapshot (an
    * index append, an incremental merge): `Some(base)` makes [[commit]]
    * conditional on the warehouse still being at `base` — a publish
    * that landed during the (possibly minutes-long) compute window then
    * surfaces as [[java.util.ConcurrentModificationException]] instead
    * of a silently-regressed output. The default (outer `None`) reads
    * the pointer at stage time — correct when the outputs don't depend
    * on prior warehouse state (a full rebuild). The inner Option is the
    * base itself: `Some(None)` means "derived from the empty,
    * never-published warehouse". */
  def stage(spark: SparkSession, root: String,
            outputs: Seq[(String, DataFrame)],
            expectedBase: Option[Option[Long]] = None,
            store: PointerStore = DefaultStore): Staged = {
    require(outputs.nonEmpty, "empty publish batch")
    val expected = expectedBase.getOrElse(currentVersion(spark, root, store))
    val tx = s"tx-${java.util.UUID.randomUUID}"
    // Outputs are independent writes into a private dir, so they submit
    // as CONCURRENT Spark jobs (one thread each — Spark's scheduler is
    // thread-safe and fair-shares the same executors): a batch of small
    // dimension tables pays one job latency, not one per table, and big
    // outputs overlap their write tails. The writes share one JOB GROUP
    // and the FIRST failure cancels it: a doomed multi-table stage
    // stops its siblings (and their cluster time) instead of running
    // every other corpus-sized write to completion before failing. The
    // first error is what propagates — the siblings' cancellation
    // exceptions are consequences, not causes. Nothing is visible
    // outside the tx dir either way.
    // split LOCAL outputs (driver-held rows — manifests, ledgers,
    // cuts) from DISTRIBUTED ones: local tables are written inline at
    // ~I/O cost, only the distributed ones pay (concurrent) Spark jobs
    val resolved = outputs.map { case (name, df) => (name, df, localTable(df)) }
    resolved.foreach {
      case (name, _, Some((schema, rows))) =>
        LocalParquet.write(spark.sparkContext.hadoopConfiguration,
          s"$root/$tx/$name", schema, rows)
      case _ => ()
    }
    val sparkOutputs = resolved.collect { case (name, df, None) => (name, df) }
    if (sparkOutputs.size == 1) {
      val (name, df) = sparkOutputs.head
      df.write.mode("overwrite").parquet(s"$root/$tx/$name")
    } else if (sparkOutputs.nonEmpty) {
      val sc = spark.sparkContext
      val group = s"graft-stage-$tx"
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val threads = sparkOutputs.map { case (name, df) =>
        val t = new Thread(() => {
          // job-group tags are thread-local: each writer tags its own
          sc.setJobGroup(group, s"atomic-publish stage $tx/$name",
            interruptOnCancel = true)
          try {
            // a sibling already failed → don't even submit this write
            if (err.get() == null)
              df.write.mode("overwrite").parquet(s"$root/$tx/$name")
          } catch {
            case e: Throwable =>
              // AndFutureJobs: a sibling whose job submission RACES this
              // cancel (queued but not yet an active job, or submitted a
              // beat later) is still cancelled — plain cancelJobGroup
              // only reaches running jobs and would let that sibling run
              // to completion. The group id is tx-unique, so marking it
              // permanently cancelled poisons nothing else.
              if (err.compareAndSet(null, e))
                sc.cancelJobGroupAndFutureJobs(group)
          } finally sc.clearJobGroup()
        })
        t.setDaemon(true)
        t.start()
        t
      }
      threads.foreach(_.join())
      Option(err.get()).foreach(throw _)
    }
    Staged(root, tx, expected)
  }

  /** Commit phase — conditional on the warehouse still being at the
    * version the batch was staged against:
    *
    *  1. CLAIM `v<expected+1>` by renaming the staging dir onto it with
    *     NO overwrite — if a racing publisher staged against the same
    *     base and committed first, the rename fails on its existing
    *     claim and this publisher throws (its staging dir left intact
    *     for diagnosis; [[vacuum]] reclaims it). A claim that exists
    *     while the pointer has NOT advanced is NEVER deleted here: it
    *     is indistinguishable from a LIVE racing winner between its
    *     claim-rename and its pointer swap, and deleting it would let
    *     both publishers "win" the same version (one batch silently
    *     replaced). The commit fails loudly instead; a genuinely
    *     crashed claim is reclaimed by an age-guarded [[vacuum]].
    *  2. VERIFY the pointer still reads `expected`, then swap it.
    *
    * Only the claim-exists signal ([[org.apache.hadoop.fs.FileAlreadyExistsException]]
    * / [[org.apache.hadoop.fs.PathExistsException]]) is treated as a
    * publish conflict; any other I/O failure on the rename (permissions,
    * quota, a vanished staging dir) propagates as itself — misreporting
    * an I/O error as a conflict would send the operator chasing a
    * phantom second writer. */
  def commit(spark: SparkSession, staged: Staged,
             store: PointerStore = DefaultStore): Long = {
    val ctx = fc(spark)
    val next = staged.expected.getOrElse(-1L) + 1
    val src = new Path(staged.root, staged.txDir)
    val dest = new Path(staged.root, s"v$next")
    def observed: Option[Long] = store.read(ctx, staged.root)
    def lost(detail: String): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"publish conflict under ${staged.root}: staged against version " +
          s"${staged.expected.getOrElse(-1L)} but $detail; " +
          s"this batch (${staged.txDir}) was NOT committed")
    try ctx.rename(src, dest)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.PathExistsException =>
        if (observed != staged.expected)
          lost(s"a concurrent publisher advanced the warehouse to " +
            s"${observed.getOrElse(-1L)}")
        else
          lost(s"version dir v$next already exists while the pointer is " +
            s"unmoved — a publisher mid-commit, or a crashed publisher's " +
            s"orphaned claim (reclaim aged orphans with vacuum, then re-stage)")
    }
    // Touch the claim so its mtime records CLAIM time, not stage time:
    // rename preserves the staging dir's mtime, so a slow writer's
    // claim would otherwise look "aged" the moment it appears and an
    // age-guarded vacuum could misread the live commit as a crashed
    // orphan. Best-effort — the pointer re-check in [[vacuum]] is the
    // hard guard — but LOUD on failure: on a filesystem where setTimes
    // does not work, the age guard silently degrades to stage-time
    // mtimes, and the operator should know to schedule vacuum with
    // minAgeMs above the longest write phase instead.
    try ctx.setTimes(dest, System.currentTimeMillis(), -1)
    catch {
      case e: java.io.IOException => System.err.println(
        s"[atomic-publish] claim mtime refresh failed for $dest " +
          s"(${e.getMessage}) — vacuum's age guard will see STAGE-time " +
          s"mtimes for this store; schedule vacuum with minAgeMs above " +
          s"the longest write phase")
    }
    // the conditional swap: the pointer must still read the staged-
    // against version, else a concurrent publisher won the version
    if (!store.compareAndSwap(ctx, staged.root, staged.expected, next))
      lost(s"a concurrent publisher advanced the warehouse to " +
        s"${observed.getOrElse(-1L)}")
    next
  }

  /** Default age below which vacuum presumes a staging dir / unswapped
    * claim belongs to a LIVE publisher and leaves it alone. Staging-dir
    * age is measured from the NEWEST mtime anywhere in the dir's
    * SUBTREE — recursive, so the part files a live write keeps landing
    * under the committer's `_temporary` attempt dirs count (they only
    * move up to the table dir at job commit). This therefore only needs
    * to cover the longest GAP between file creations of one write — not
    * a whole write phase — plus the claim-to-swap window; an hour is
    * comfortably past both. Crashed orphans older than this are
    * reclaimed on the next vacuum pass. */
  val DefaultVacuumMinAgeMs: Long = 60L * 60 * 1000

  /** Reclaim version directories older than the last `keep` committed
    * versions (plus any orphaned never-committed ones below them),
    * orphaned `tx-*` staging dirs (crashed or conflict-losing
    * publishers), and orphaned unswapped claims ABOVE the pointer
    * (publishers that crashed between claim and pointer swap — these
    * otherwise block every future commit of that version). Readers of
    * retained versions are unaffected — data dirs are immutable once
    * written.
    *
    * Staging dirs and above-pointer claims younger than `minAgeMs` are
    * SKIPPED (a staging dir's age is measured from the newest mtime
    * under it, so a write that is still landing part files never looks
    * aged): a fresh one may belong to a live in-flight publisher, and
    * deleting it mid-[[stage]] (or between its claim and swap) would
    * corrupt that publisher's batch. Committed versions below the
    * retained window carry no such hazard and are reclaimed regardless
    * of age. Pass `minAgeMs = 0` only where no publisher can be
    * in flight. Returns the reclaimed COMMITTED versions. */
  /** Newest mtime anywhere in `dir`'s subtree (including `dir` itself,
    * passed as `dirMtime`) — the age basis for [[vacuum]]'s staging-dir
    * guard. RECURSIVE, because a staging dir's own mtime is set when
    * its output subdirs are created and never refreshed by the write
    * itself, and under the default FileOutputCommitter (algorithm v1) a
    * live write's part files land at tx/<table>/_temporary/<attempt>/…
    * and only move up at job commit: during a long write phase the
    * freshest mtimes live two or more levels down, so a shallow scan
    * would misread the live write as silent and vacuum it mid-write.
    * A subtree that vanishes mid-scan (a concurrent vacuum, a
    * publisher's own cleanup) is treated as already gone, not an abort:
    * its mtimes stop contributing and the caller's delete is a no-op. */
  private[graft] def newestUnder(ctx: FileContext, dir: Path,
                                 dirMtime: Long): Long =
    try {
      val children = ctx.listStatus(dir)
      Iterator.continually(children).takeWhile(_.hasNext).map(_.next())
        .map(s =>
          if (s.isDirectory) newestUnder(ctx, s.getPath, s.getModificationTime)
          else s.getModificationTime)
        .foldLeft(dirMtime)(math.max)
    } catch {
      case _: java.io.FileNotFoundException => dirMtime
    }

  /** The RETAINED committed versions under `root`: every immutable
    * version dir at or below the current pointer, ascending. (Dirs
    * above the pointer are in-flight or crashed stages — not
    * committed, not readable.) Empty before the first publish. */
  def liveVersions(spark: SparkSession, root: String,
                   store: PointerStore = DefaultStore): Seq[Long] = {
    val ctx = fc(spark)
    val cur = store.read(ctx, root).getOrElse(return Nil)
    val rootPath = new Path(root)
    if (!ctx.util.exists(rootPath)) return Nil
    val it = ctx.listStatus(rootPath)
    Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .filter(_.isDirectory)
      .flatMap(s => if (s.getPath.getName.startsWith("v"))
        s.getPath.getName.drop(1).toLongOption else None)
      .filter(_ <= cur).toSeq.sorted
  }

  /** `protect`: versions NEVER deleted regardless of `keep` — the
    * cross-store retention hook ([[Coordinator.vacuumMember]] passes
    * every version a retained cut references, so vacuuming a member
    * can never break a coordinator snapshot a reader could resolve).
    * BY-NAME, evaluated exactly once, immediately before the doomed
    * versions are computed and deleted: a protect set derived from
    * ANOTHER store's state (the coordinator's retained cuts) is read
    * as late as possible, so a commit landing while the earlier
    * staging/claim sweeps ran is still seen. The residual window —
    * a commit between that read and the deletes — is the microsecond
    * class the single-writer convention covers (same as the claim
    * recheck above), not the seconds-long sweep phases this guards. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2,
             minAgeMs: Long = DefaultVacuumMinAgeMs,
             store: PointerStore = DefaultStore,
             protect: => Set[Long] = Set.empty): Seq[Long] = {
    val ctx = fc(spark)
    val cur = store.read(ctx, root).getOrElse(return Nil)
    val rootPath = new Path(root)
    if (!ctx.util.exists(rootPath)) return Nil
    val it = ctx.listStatus(rootPath)
    val dirs = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(_.isDirectory)
      .map(s => (s.getPath.getName, s.getModificationTime))
      .toSeq
    val now = System.currentTimeMillis()
    def aged(mtime: Long): Boolean = now - mtime >= minAgeMs
    dirs.filter { case (n, m) =>
      n.startsWith("tx-") && aged(newestUnder(ctx, new Path(root, n), m))
    }.foreach { case (n, _) => ctx.delete(new Path(root, n), true) }
    val versions = dirs.flatMap {
      case (n, m) if n.startsWith("v") => n.drop(1).toLongOption.map((_, m))
      case _ => None
    }
    // Aged claims above the pointer: crashed mid-commit, never visible.
    // Re-read the pointer immediately before each delete — a publisher
    // may have COMMITTED this very version since `cur` was read at
    // entry (and [[commit]] refreshes the claim's mtime at claim time,
    // so only a genuinely old claim reaches this branch at all). The
    // remaining commit-between-recheck-and-delete window is the
    // microsecond class the single-writer convention covers, not the
    // minutes-long stage/encode class these guards exist for.
    versions.filter { case (v, m) => v > cur && aged(m) }
      .foreach { case (v, _) =>
        if (store.read(ctx, root).forall(_ < v))
          ctx.delete(new Path(root, s"v$v"), true)
      }
    val prot = protect // single late evaluation (see the param's doc)
    val doomed = versions.map(_._1)
      .filter(v => v <= cur - keep && !prot(v)).sorted
    doomed.foreach(v => ctx.delete(new Path(root, s"v$v"), true))
    doomed
  }
}

