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
  * Run against both the rename implementation and a LOCK-SERIALIZED
  * CAS stand-in (a catalog/conditional-PUT pointer reduced to a JVM
  * lock — compareAndSwap is genuinely atomic, the way S3 conditional
  * PUT or a DynamoDB pointer would make it). The protocol code is
  * identical either way; only the pointer primitive differs. */
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
    "locked-cas" -> LockedCasPointerStore)

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
      assert(AtomicPublish.readTable(spark, root, "a")
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
      val snap = AtomicPublish.snapshot(spark, root)
      assert(snap.table(spark, "a").count() === 1)
      assert(snap.table(spark, "b").count() === 1)
      val v1 = AtomicPublish.publish(spark, root, Seq(
        "a" -> Seq((1, "x"), (2, "y")).toDF("k", "v"),
        "b" -> Seq((1, 10L), (2, 20L)).toDF("k", "n")), store = store)
      assert(v1 === 1L)
      val snap2 = AtomicPublish.snapshot(spark, root)
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
      assert(AtomicPublish.readTable(spark, root, "a")
        .filter(org.apache.spark.sql.functions.col("k") === 2)
        .first().getString(1) === "alive")
    }
  }

  test("a live slow write never looks aged: staging age follows the newest file, not dir creation") {
    // the r13 advisory: tx- dir mtime is set when output subdirs are
    // created and never refreshed during a long parquet write, so a
    // single write phase longer than the age guard used to qualify a
    // LIVE staging dir for deletion. Age now follows the newest mtime
    // one level down — backdating the dir itself must not age it while
    // its contents are fresh.
    val root = freshRoot("slowwrite")
    AtomicPublish.publish(spark, root,
      Seq("a" -> Seq((1, "base")).toDF("k", "v")))
    val staged = AtomicPublish.stage(spark, root,
      Seq("a" -> Seq((2, "slow")).toDF("k", "v")))
    val tx = new java.io.File(s"$root/${staged.txDir}")
    // the dir looks 2 hours old (output subdir created at write start)…
    assert(tx.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L))
    // …but its table subdir is fresh (part files still landing)
    AtomicPublish.vacuum(spark, root, keep = 10)
    assert(tx.isDirectory,
      "vacuum deleted a staging dir whose write was still landing files")
    // once the CONTENTS are aged too, the dir is a genuine orphan
    tx.listFiles().foreach(f =>
      assert(f.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L)))
    AtomicPublish.vacuum(spark, root, keep = 10)
    assert(!tx.exists(), "vacuum kept a genuinely aged orphan staging dir")
    // the backdated stage never had a claim; committing it would now
    // fail on the vanished dir — publishing a fresh batch still works
    assert(AtomicPublish.publish(spark, root,
      Seq("a" -> Seq((3, "next")).toDF("k", "v"))) === 1L)
  }
}

