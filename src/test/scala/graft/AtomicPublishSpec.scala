package graft

import org.apache.spark.sql.functions._
import graft.etl.AtomicPublish

/** The cross-table transaction contract (warehouse.py:50-70,252-301):
  * a batch's tables become visible together or not at all; a resolved
  * snapshot never tears across a concurrent commit; vacuum reclaims
  * history without touching retained versions. */
class AtomicPublishSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = s"/root/repo/target/test-publish/$tag-${java.util.UUID.randomUUID}"
    d
  }

  test("publish commits all tables of a batch atomically; versions bump") {
    val root = freshRoot("basic")
    val v0 = AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "x")).toDF("k", "v"),
      "b" -> Seq((1, 10L)).toDF("k", "n")))
    assert(v0 === 0L)
    assert(AtomicPublish.currentVersion(spark, root) === Some(0L))
    val snap = AtomicPublish.snapshot(spark, root)
    assert(snap.table(spark, "a").count() === 1)
    assert(snap.table(spark, "b").count() === 1)
    val v1 = AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "x"), (2, "y")).toDF("k", "v"),
      "b" -> Seq((1, 10L), (2, 20L)).toDF("k", "n")))
    assert(v1 === 1L)
    assert(AtomicPublish.readTable(spark, root, "a").count() === 2)
  }

  test("a failed publish leaves the previous snapshot fully intact") {
    val root = freshRoot("fail")
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "x")).toDF("k", "v"),
      "b" -> Seq((1, 10L)).toDF("k", "n")))
    // second batch: table a writes fine, table b explodes mid-write —
    // the pointer must not move, so readers keep seeing v0 of BOTH
    val bomb = udf((k: Int) => {
      if (k > 0) throw new RuntimeException("boom"); k
    })
    val failed = intercept[Exception] {
      AtomicPublish.publish(spark, root, Seq(
        "a" -> Seq((1, "x"), (2, "y")).toDF("k", "v"),
        "b" -> Seq((1, 10L)).toDF("k", "n").withColumn("k", bomb(col("k")))))
    }
    assert(failed != null)
    assert(AtomicPublish.currentVersion(spark, root) === Some(0L),
      "pointer moved despite a failed batch")
    val snap = AtomicPublish.snapshot(spark, root)
    assert(snap.table(spark, "a").count() === 1, "reader saw a torn batch")
    assert(snap.table(spark, "b").count() === 1)
    // and the warehouse recovers: the next successful publish wins
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "x"), (2, "y")).toDF("k", "v"),
      "b" -> Seq((1, 10L), (2, 20L)).toDF("k", "n")))
    assert(AtomicPublish.readTable(spark, root, "b").count() === 2)
  }

  test("the cancel covers jobs submitted AFTER it fires: a sibling whose " +
    "submission races the cancellation is still stopped") {
    // the window the fail-fast test can't pin deterministically: thread
    // A fails and cancels the group BEFORE thread B's write job becomes
    // an active job. Plain cancelJobGroup only reaches running jobs and
    // would let B run to completion; stage() uses
    // cancelJobGroupAndFutureJobs, whose semantic — a job submitted
    // into an already-cancelled group is refused — is pinned here by
    // cancelling FIRST, then submitting.
    val sc = spark.sparkContext
    val group = s"graft-race-pin-${java.util.UUID.randomUUID}"
    sc.setJobGroup(group, "race pin", interruptOnCancel = true)
    try {
      sc.cancelJobGroupAndFutureJobs(group)
      val e = intercept[Throwable] { spark.range(8).count() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.toLowerCase.contains("cancel")),
        s"late-submitted job was not cancelled: $e")
    } finally sc.clearJobGroup()
    // the session is unharmed outside the poisoned group id
    assert(spark.range(8).count() === 8L)
  }

  test("stage is fail-fast: a failing output cancels its siblings and " +
    "rethrows the ORIGINAL error, not the cancellations") {
    // the r14 advisory: the concurrent writer threads joined ALL
    // siblings before rethrowing, so a fast-failing output let every
    // other corpus-sized write run to completion first. The writes now
    // share a job group and the first failure cancels it.
    val root = freshRoot("failfast")
    val boom = udf((l: Long) => {
      if (l >= 0) throw new RuntimeException("boom-stage"); l
    })
    val crawl = udf((l: Long) => { Thread.sleep(60000L); l })
    val bad = spark.range(4).select(boom(col("id")).as("x"))
    // 2 single-row tasks × 60 s each: without cancellation the stage
    // cannot finish under a minute
    val slow = spark.range(2).repartition(2).select(crawl(col("id")).as("x"))
    val t0 = System.nanoTime()
    val e = intercept[Throwable] {
      AtomicPublish.stage(spark, root, Seq("bad" -> bad, "slow" -> slow))
    }
    val secs = (System.nanoTime() - t0) / 1e9
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("boom-stage"))),
      s"rethrown error is not the original failure: $e")
    assert(secs < 45,
      f"stage took $secs%.1f s — the slow sibling ran to completion " +
        "instead of being cancelled")
    // nothing committed, and a later publish on the same root works
    assert(AtomicPublish.currentVersion(spark, root) === None)
    assert(AtomicPublish.publish(spark, root,
      Seq("a" -> Seq((1, "ok")).toDF("k", "v"))) === 0L)
  }

  test("a resolved snapshot is immune to a commit that lands mid-job") {
    val root = freshRoot("iso")
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "x")).toDF("k", "v"),
      "b" -> Seq((1, 10L)).toDF("k", "n")))
    val snap = AtomicPublish.snapshot(spark, root) // reader starts here
    val aBefore = snap.table(spark, "a").count()
    // writer publishes a new batch while the reader's job is "running"
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v"),
      "b" -> Seq((1, 10L), (2, 20L), (3, 30L)).toDF("k", "n")))
    // the held snapshot still reads version 0 of BOTH tables
    assert(snap.table(spark, "a").count() === aBefore)
    assert(snap.table(spark, "b").count() === 1)
    // a fresh resolve sees the new version of both
    val snap2 = AtomicPublish.snapshot(spark, root)
    assert(snap2.table(spark, "a").count() === 3)
    assert(snap2.table(spark, "b").count() === 3)
  }

  test("racing publishers: exactly one commit wins, the loser throws and clobbers nothing") {
    val root = freshRoot("race")
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "base")).toDF("k", "v")))
    // both publishers stage against version 0 — the violated
    // single-writer convention the CAS check exists to catch
    val s1 = AtomicPublish.stage(spark, root, Seq(
      "a" -> Seq((2, "winner")).toDF("k", "v")))
    val s2 = AtomicPublish.stage(spark, root, Seq(
      "a" -> Seq((2, "loser")).toDF("k", "v")))
    assert(AtomicPublish.commit(spark, s1) === 1L)
    val err = intercept[java.util.ConcurrentModificationException] {
      AtomicPublish.commit(spark, s2)
    }
    assert(err.getMessage.contains("publish conflict"))
    assert(err.getMessage.contains("NOT committed"))
    // the winner's commit is untouched — no silent clobber
    assert(AtomicPublish.currentVersion(spark, root) === Some(1L))
    assert(AtomicPublish.readTable(spark, root, "a")
      .first().getString(1) === "winner")
    // the loser's staging dir is an orphan until vacuum reclaims it —
    // but a default-age vacuum SKIPS it (it's seconds old, and a fresh
    // tx dir is indistinguishable from a live publisher's in-flight
    // stage); only an explicit zero-age vacuum may reclaim it here,
    // where we know no publisher is in flight
    def txDirs = new java.io.File(root).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("tx-"))
    assert(txDirs.nonEmpty)
    AtomicPublish.vacuum(spark, root, keep = 10)
    assert(txDirs.nonEmpty, "age-guarded vacuum reclaimed a fresh staging dir")
    AtomicPublish.vacuum(spark, root, keep = 10, minAgeMs = 0)
    assert(txDirs.isEmpty, "orphaned staging dirs not reclaimed")
    // and the warehouse stays writable afterwards
    assert(AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((3, "next")).toDF("k", "v"))) === 2L)
  }

  test("a crashed claim fails the next commit loudly; an aged vacuum reclaims it") {
    val root = freshRoot("orphanclaim")
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "base")).toDF("k", "v")))
    // simulate a crash BETWEEN the claim-rename and the pointer swap:
    // v1 exists on disk, the pointer still reads 0
    val dead = AtomicPublish.stage(spark, root, Seq(
      "a" -> Seq((9, "dead")).toDF("k", "v")))
    assert(new java.io.File(s"$root/${dead.txDir}")
      .renameTo(new java.io.File(s"$root/v1")))
    assert(AtomicPublish.currentVersion(spark, root) === Some(0L))
    // the next publisher must NOT auto-delete the claim (it cannot
    // distinguish a crash leftover from a live winner mid-commit —
    // deleting a live one would let two publishers win the same
    // version); it fails loudly, naming the recovery path
    val err = intercept[java.util.ConcurrentModificationException] {
      AtomicPublish.publish(spark, root, Seq(
        "a" -> Seq((2, "alive")).toDF("k", "v")))
    }
    assert(err.getMessage.contains("already exists"))
    assert(err.getMessage.contains("vacuum"))
    // a default-age vacuum skips the fresh claim (could be a live
    // publisher); an explicit zero-age one reclaims it
    AtomicPublish.vacuum(spark, root, keep = 10)
    assert(new java.io.File(s"$root/v1").isDirectory,
      "age-guarded vacuum reclaimed a fresh claim")
    AtomicPublish.vacuum(spark, root, keep = 10, minAgeMs = 0)
    assert(!new java.io.File(s"$root/v1").exists(),
      "aged orphan claim not reclaimed")
    // and publishing works again
    val v = AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((2, "alive")).toDF("k", "v")))
    assert(v === 1L)
    assert(AtomicPublish.readTable(spark, root, "a")
      .first().getString(1) === "alive")
  }

  test("a non-race rename failure surfaces as the I/O error it is, not a publish conflict") {
    val root = freshRoot("ioerr")
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "base")).toDF("k", "v")))
    val staged = AtomicPublish.stage(spark, root, Seq(
      "a" -> Seq((2, "next")).toDF("k", "v")))
    // sabotage: the staging dir vanishes before commit (quota purge,
    // operator error). The old code swallowed every IOException as
    // "claim failed" and misdiagnosed this as a ConcurrentModification
    // conflict — sending the operator hunting a phantom second writer.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(s"$root/${staged.txDir}"))
    val err = intercept[java.io.IOException] {
      AtomicPublish.commit(spark, staged)
    }
    assert(!err.isInstanceOf[java.util.ConcurrentModificationException],
      s"I/O error misreported as a publish conflict: $err")
    // nothing moved
    assert(AtomicPublish.currentVersion(spark, root) === Some(0L))
  }

  test("stage(expectedBase) makes a commit conditional on the derivation snapshot") {
    val root = freshRoot("expbase")
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "v0")).toDF("k", "v")))
    // a slow writer derives its outputs from v0...
    val slow = AtomicPublish.stage(spark, root, Seq(
      "a" -> Seq((1, "derived-from-v0")).toDF("k", "v")),
      expectedBase = Some(Some(0L)))
    // ...and a fast writer commits v1 inside the slow one's window
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((2, "v1")).toDF("k", "v")))
    // the slow writer's commit must fail — its output would silently
    // drop the fast writer's batch
    val err = intercept[java.util.ConcurrentModificationException] {
      AtomicPublish.commit(spark, slow)
    }
    assert(err.getMessage.contains("NOT committed"))
    assert(AtomicPublish.readTable(spark, root, "a")
      .first().getString(1) === "v1")
    // without the pin, a stale derivation would commit blindly: the
    // default stage reads the pointer at stage time and still works
    assert(AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((3, "v2")).toDF("k", "v"))) === 2L)
  }

  test("a slow writer's committed version never looks aged: claim time resets the age clock") {
    // rename preserves mtime, so a version dir committed from a
    // staging dir written 25 minutes ago would otherwise carry a
    // 25-minute-old mtime from the instant it appears — and a vacuum
    // whose pointer read predates the commit would misread the LIVE
    // commit as an aged crashed claim and delete the current version.
    // commit() therefore touches the claim dir: age measures
    // time-since-claim, not time-since-stage.
    val root = freshRoot("slowstage")
    AtomicPublish.publish(spark, root, Seq(
      "a" -> Seq((1, "base")).toDF("k", "v")))
    val staged = AtomicPublish.stage(spark, root, Seq(
      "a" -> Seq((2, "slow")).toDF("k", "v")))
    // backdate the staging dir 25 minutes (the slow encode)
    val tx = new java.io.File(s"$root/${staged.txDir}")
    assert(tx.setLastModified(System.currentTimeMillis() - 25 * 60 * 1000L))
    assert(AtomicPublish.commit(spark, staged) === 1L)
    val age = System.currentTimeMillis() -
      new java.io.File(s"$root/v1").lastModified()
    assert(age < 60 * 1000L,
      s"committed claim still carries the stale stage mtime (age ${age}ms)")
  }

  test("vacuum reclaims old versions but never the retained window") {
    val root = freshRoot("vacuum")
    (0 until 4).foreach { i =>
      AtomicPublish.publish(spark, root, Seq(
        "a" -> Seq((i, s"v$i")).toDF("k", "v")))
    }
    val removed = AtomicPublish.vacuum(spark, root, keep = 2)
    assert(removed === Seq(0L, 1L))
    // retained: v2 (cur-1) and v3 (cur)
    assert(AtomicPublish.Snapshot(root, 2L).table(spark, "a")
      .first().getString(1) === "v2")
    assert(AtomicPublish.readTable(spark, root, "a")
      .first().getString(1) === "v3")
    // vacuum on an unpublished root is a no-op
    assert(AtomicPublish.vacuum(spark, freshRoot("empty")) === Nil)
  }

  test("snapshotAt time-travels to retained versions and refuses vacuumed ones") {
    val root = freshRoot("travel")
    (0 until 4).foreach { i =>
      AtomicPublish.publish(spark, root, Seq(
        "a" -> Seq((i, s"v$i")).toDF("k", "v")))
    }
    // a historical read sees the version's ORIGINAL contents even after
    // later commits moved the pointer (immutability of version dirs)
    assert(AtomicPublish.snapshotAt(spark, root, 1L).table(spark, "a")
      .first().getString(1) === "v1")
    AtomicPublish.vacuum(spark, root, keep = 2)
    // vacuumed → loud failure, not a silent empty read
    intercept[IllegalArgumentException] {
      AtomicPublish.snapshotAt(spark, root, 1L)
    }
    // never-committed → same refusal
    intercept[IllegalArgumentException] {
      AtomicPublish.snapshotAt(spark, root, 99L)
    }
    // the retained window still travels
    assert(AtomicPublish.snapshotAt(spark, root, 2L).table(spark, "a")
      .first().getString(1) === "v2")
  }
}
