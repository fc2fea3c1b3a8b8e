package graft

import org.apache.hadoop.fs.FileContext
import graft.etl.AtomicPublish
import graft.etl.AtomicPublish.{PointerStore, RenamePointerStore}

/** Conformance contract for [[AtomicPublish.PointerStore]] — every
  * implementation (the rename default; any object-store CAS) must make
  * the same three guarantees hold through the publish protocol:
  *
  *   1. CLAIM EXCLUSIVITY — two publishers staged against the same base
  *      commit at most once; the loser throws and clobbers nothing.
  *   2. SWAP VISIBILITY — after a commit, readers resolve the new
  *      version and see every table of the batch together.
  *   3. CRASHED-CLAIM RECOVERABILITY — a claim whose swap never
  *      happened blocks that version loudly until an aged vacuum
  *      reclaims it, after which publishing resumes.
  *
  * Run against THREE implementations: the rename default, a
  * LOCK-SERIALIZED CAS stand-in (a catalog/conditional-PUT pointer
  * reduced to a JVM lock — compareAndSwap is genuinely atomic, the way
  * S3 conditional PUT or a DynamoDB pointer would make it), and the
  * production [[AtomicPublish.CasPointerStore]] (create-if-absent
  * generation files). The protocol code is identical in every case;
  * only the pointer primitive differs. */
class PointerStoreSpec extends SparkSuite {
  import spark.implicits._

  /** A true-CAS stand-in: file-backed like the default (so readers and
    * time travel work unchanged) but with read-compare-swap serialized
    * under a per-root lock — the linearizability a catalog pointer or
    * conditional PUT provides natively. */
  private object LockedCasPointerStore extends PointerStore {
    private val locks =
      new java.util.concurrent.ConcurrentHashMap[String, Object]()
    private def lock(root: String): Object =
      locks.computeIfAbsent(root, _ => new Object)
    def read(ctx: FileContext, root: String): Option[Long] =
      RenamePointerStore.read(ctx, root)
    def compareAndSwap(ctx: FileContext, root: String,
                       expected: Option[Long], next: Long): Boolean =
      lock(root).synchronized {
        RenamePointerStore.compareAndSwap(ctx, root, expected, next)
      }
  }

  private val stores: Seq[(String, PointerStore)] = Seq(
    "rename" -> RenamePointerStore,
    "locked-cas" -> LockedCasPointerStore,
    // the src/main production CAS: generation files created-if-absent
    "cas-file" -> AtomicPublish.CasPointerStore)

  private def freshRoot(tag: String): String =
    s"/root/repo/target/test-publish/ptr-$tag-${java.util.UUID.randomUUID}"

  for ((name, store) <- stores) {

    test(s"[$name] claim exclusivity: one of two same-base publishers wins, the loser throws") {
      val root = freshRoot(name)
      AtomicPublish.publish(spark, root,
        Seq("a" -> Seq((1, "base")).toDF("k", "v")), store = store)
      val s1 = AtomicPublish.stage(spark, root,
        Seq("a" -> Seq((2, "winner")).toDF("k", "v")), store = store)
      val s2 = AtomicPublish.stage(spark, root,
        Seq("a" -> Seq((2, "loser")).toDF("k", "v")), store = store)
      assert(AtomicPublish.commit(spark, s1, store) === 1L)
      intercept[java.util.ConcurrentModificationException] {
        AtomicPublish.commit(spark, s2, store)
      }
      assert(AtomicPublish.currentVersion(spark, root, store) === Some(1L))
      assert(AtomicPublish.readTable(spark, root, "a", store)
        .filter(org.apache.spark.sql.functions.col("k") === 2)
        .first().getString(1) === "winner")
    }

    test(s"[$name] swap visibility: a committed batch's tables appear together at the new version") {
      val root = freshRoot(name)
      val v0 = AtomicPublish.publish(spark, root, Seq(
        "a" -> Seq((1, "x")).toDF("k", "v"),
        "b" -> Seq((1, 10L)).toDF("k", "n")), store = store)
      assert(v0 === 0L)
      assert(AtomicPublish.currentVersion(spark, root, store) === Some(0L))
      val snap = AtomicPublish.snapshot(spark, root, store)
      assert(snap.table(spark, "a").count() === 1)
      assert(snap.table(spark, "b").count() === 1)
      val v1 = AtomicPublish.publish(spark, root, Seq(
        "a" -> Seq((1, "x"), (2, "y")).toDF("k", "v"),
        "b" -> Seq((1, 10L), (2, 20L)).toDF("k", "n")), store = store)
      assert(v1 === 1L)
      val snap2 = AtomicPublish.snapshot(spark, root, store)
      assert(snap2.table(spark, "a").count() === 2)
      assert(snap2.table(spark, "b").count() === 2)
    }

    test(s"[$name] crashed-claim recoverability: aged vacuum reclaims the claim, publishing resumes") {
      val root = freshRoot(name)
      AtomicPublish.publish(spark, root,
        Seq("a" -> Seq((1, "base")).toDF("k", "v")), store = store)
      // crash between claim-rename and pointer swap: v1 exists, pointer
      // still reads 0
      val dead = AtomicPublish.stage(spark, root,
        Seq("a" -> Seq((9, "dead")).toDF("k", "v")), store = store)
      assert(new java.io.File(s"$root/${dead.txDir}")
        .renameTo(new java.io.File(s"$root/v1")))
      assert(AtomicPublish.currentVersion(spark, root, store) === Some(0L))
      intercept[java.util.ConcurrentModificationException] {
        AtomicPublish.publish(spark, root,
          Seq("a" -> Seq((2, "alive")).toDF("k", "v")), store = store)
      }
      AtomicPublish.vacuum(spark, root, keep = 10, minAgeMs = 0, store = store)
      assert(!new java.io.File(s"$root/v1").exists(),
        "aged orphan claim not reclaimed")
      assert(AtomicPublish.publish(spark, root,
        Seq("a" -> Seq((2, "alive")).toDF("k", "v")), store = store) === 1L)
      assert(AtomicPublish.readTable(spark, root, "a", store)
        .filter(org.apache.spark.sql.functions.col("k") === 2)
        .first().getString(1) === "alive")
    }
  }

  test("cas-file: racing compareAndSwaps from one observed state admit " +
    "EXACTLY one winner (the create-if-absent linearization point)") {
    val ctx = FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)
    val store = AtomicPublish.CasPointerStore
    val root = freshRoot("casrace")
    new java.io.File(root).mkdirs()
    assert(store.compareAndSwap(ctx, root, None, 0L))
    assert(store.read(ctx, root) === Some(0L))
    // 8 threads all try to advance 0 → their own distinct version; the
    // generation file name is shared, so the filesystem admits one
    for (round <- 1 to 5) {
      val base = store.read(ctx, root)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until 8).map { i =>
        val t = new Thread(() => {
          gate.await()
          // each its own FileContext: no accidental JVM-side sharing
          val myCtx = FileContext.getFileContext(
            spark.sparkContext.hadoopConfiguration)
          if (store.compareAndSwap(myCtx, root, base, round * 100L + i))
            wins.incrementAndGet(): Unit
        })
        t.start(); t
      }
      gate.countDown()
      threads.foreach(_.join())
      assert(wins.get() === 1, s"round $round: ${wins.get()} winners")
      // the committed version is the unique winner's proposal
      val v = store.read(ctx, root).get
      assert(v >= round * 100L && v < round * 100L + 8)
      // a CAS against the stale base now fails cleanly
      assert(!store.compareAndSwap(ctx, root, base, 999999L))
    }
  }

  test("pointer reads survive short reads: readToEof drains a stream " +
    "that returns ONE byte per read call") {
    // the r15 advisory: a single in.read(buf) may legally return fewer
    // bytes than available, and a truncated pointer read would PARSE A
    // WRONG VERSION (RenamePointerStore) or misreport a committed CAS
    // as lost (CasPointerStore's nonce read-back). readToEof must
    // drain to EOF regardless of how the stream chunks.
    val payload = "1234567 3f2a9c1e-nonce"
    val oneByteAtATime = new java.io.InputStream {
      private val bytes = payload.getBytes("UTF-8")
      private var i = 0
      override def read(): Int =
        if (i >= bytes.length) -1 else { val b = bytes(i); i += 1; b & 0xff }
      // the adversarial part: even a buffered read yields ONE byte
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (i >= bytes.length) -1
        else if (len == 0) 0
        else { b(off) = bytes(i); i += 1; 1 }
      }
    }
    assert(AtomicPublish.readToEof(oneByteAtATime) === payload)
    // and the cap bounds a runaway stream without mangling short ones
    assert(AtomicPublish.readToEof(
      new java.io.ByteArrayInputStream("42".getBytes("UTF-8"))) === "42")
  }

  test("cas-file: generation pruning keeps reads correct across many commits") {
    val ctx = FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)
    val store = AtomicPublish.CasPointerStore
    val root = freshRoot("casprune")
    new java.io.File(root).mkdirs()
    var cur: Option[Long] = None
    val n = AtomicPublish.CasPointerStore.Retain + 20
    (0 until n).foreach { v =>
      assert(store.compareAndSwap(ctx, root, cur, v.toLong), s"commit $v")
      cur = Some(v.toLong)
    }
    assert(store.read(ctx, root) === Some((n - 1).toLong))
    val gens = new java.io.File(s"$root/_CURRENT.d").listFiles()
      .map(_.getName).filter(_.startsWith("gen-"))
    assert(gens.length <= AtomicPublish.CasPointerStore.Retain + 2,
      s"pruning left ${gens.length} generation files")
  }

  test("a live slow write never looks aged: staging age follows the newest " +
    "file ANYWHERE in the subtree, committer layout included") {
    // the r13 advisory, tightened in r15: under the default
    // FileOutputCommitter (algorithm v1) a live write's part files land
    // in tx/<table>/_temporary/<attempt>/... and only move into the
    // table dir at job commit — so during one long write phase NOTHING
    // at depth 1 is refreshed. Model exactly that layout: tx dir AND
    // table subdir both 2 h stale, the only fresh mtimes two+ levels
    // down inside _temporary. The age guard must scan recursively or it
    // vacuums a live publisher's staging mid-write.
    val root = freshRoot("slowwrite")
    AtomicPublish.publish(spark, root,
      Seq("a" -> Seq((1, "base")).toDF("k", "v")))
    val staged = AtomicPublish.stage(spark, root,
      Seq("a" -> Seq((2, "slow")).toDF("k", "v")))
    val tx = new java.io.File(s"$root/${staged.txDir}")
    val old = System.currentTimeMillis() - 2 * 3600 * 1000L
    // sculpt the committer layout: a deep in-flight attempt dir whose
    // part file is FRESH, while everything at depths 0–2 is backdated
    val attempt = new java.io.File(s"$root/${staged.txDir}/a/_temporary/0/" +
      "_temporary/attempt_2025_m_000000_0")
    assert(attempt.mkdirs())
    val part = new java.io.File(attempt, "part-00000.parquet")
    assert(part.createNewFile())
    def walk(f: java.io.File): Seq[java.io.File] =
      f +: Option(f.listFiles()).toSeq.flatten.flatMap(walk)
    walk(tx).filterNot(_ == part).foreach(f => assert(f.setLastModified(old)))
    AtomicPublish.vacuum(spark, root, keep = 10)
    assert(tx.isDirectory,
      "vacuum deleted a staging dir whose write was still landing files " +
        "deep under _temporary")
    // once the ENTIRE subtree is aged, the dir is a genuine orphan
    walk(tx).foreach(f => assert(f.setLastModified(old)))
    AtomicPublish.vacuum(spark, root, keep = 10)
    assert(!tx.exists(), "vacuum kept a genuinely aged orphan staging dir")
    // the backdated stage never had a claim; committing it would now
    // fail on the vanished dir — publishing a fresh batch still works
    assert(AtomicPublish.publish(spark, root,
      Seq("a" -> Seq((3, "next")).toDF("k", "v"))) === 1L)
  }

  test("vacuum skips a staging dir that vanishes mid-pass instead of aborting") {
    // the r14 advisory: newestUnder listed each tx- dir after the root
    // listing; a dir deleted in between (a concurrent vacuum, a
    // publisher's own cleanup) threw FileNotFoundException and aborted
    // the whole pass. A vanished subtree now just stops contributing
    // mtimes and the later delete is a no-op.
    val ctx = FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)
    // the FNF path directly: a dir that no longer exists contributes
    // only the mtime the root listing already recorded
    assert(AtomicPublish.newestUnder(ctx,
      new org.apache.hadoop.fs.Path(
        s"/root/repo/target/test-publish/never-existed-${java.util.UUID.randomUUID}"),
      123L) === 123L)
    // and end-to-end: a pass over a root where an orphan vanished
    // still reclaims everything else
    val root = freshRoot("vanish")
    AtomicPublish.publish(spark, root,
      Seq("a" -> Seq((1, "base")).toDF("k", "v")))
    // two aged orphans plus three committed versions to reclaim
    val s1 = AtomicPublish.stage(spark, root,
      Seq("a" -> Seq((2, "dead1")).toDF("k", "v")))
    AtomicPublish.stage(spark, root,
      Seq("a" -> Seq((3, "dead2")).toDF("k", "v")))
    AtomicPublish.publish(spark, root, Seq("a" -> Seq((4, "x")).toDF("k", "v")))
    AtomicPublish.publish(spark, root, Seq("a" -> Seq((5, "y")).toDF("k", "v")))
    // delete one orphan between the root listing and its subtree scan —
    // simulated by deleting it before the pass; the pass must still
    // reclaim the other orphan and the old versions
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(s"$root/${s1.txDir}"))
    val reclaimed = AtomicPublish.vacuum(spark, root, keep = 1, minAgeMs = 0)
    assert(reclaimed === Seq(0L, 1L))
    assert(!new java.io.File(root).listFiles().exists(_.getName.startsWith("tx-")),
      "surviving orphan staging dir not reclaimed")
  }
}

