package graft

import org.apache.spark.sql.functions._
import graft.etl.{AtomicPublish, ChangeFeed}

/** [[graft.etl.ChangeFeed]] — the post-hoc CDC diff of two immutable
  * snapshots. The oracle gate (o10_change_feed) pins the end-to-end
  * values against DuckDB; this spec pins the semantic edges the fixture
  * data can't reach: null-safe update detection, null-key behavior, the
  * empty feed, schema/key preconditions, and the version-store
  * round-trip through snapshotAt. */
class ChangeFeedSpec extends SparkSuite {
  import spark.implicits._

  private def feed(from: Seq[(Int, Option[String], Option[Long])],
                   to: Seq[(Int, Option[String], Option[Long])]) =
    ChangeFeed.diff(
      from.toDF("id", "name", "score"),
      to.toDF("id", "name", "score"),
      Seq("id"))

  test("classifies insert, delete, and update; unchanged rows emit nothing") {
    val out = feed(
      from = Seq((1, Some("a"), Some(10L)), (2, Some("b"), Some(20L)),
        (3, Some("c"), Some(30L))),
      to = Seq((1, Some("a"), Some(10L)), (2, Some("b2"), Some(20L)),
        (4, Some("d"), Some(40L))))
      .orderBy("id", "_change_type")
      .as[(Int, Option[String], Option[Long], String)].collect().toSeq
    assert(out === Seq(
      (2, Some("b2"), Some(20L), "update_postimage"),
      (2, Some("b"), Some(20L), "update_preimage"),
      (3, Some("c"), Some(30L), "delete"),
      (4, Some("d"), Some(40L), "insert")))
  }

  test("update detection is null-safe: null→value is an update, null→null is not") {
    val out = feed(
      from = Seq((1, None, Some(10L)), (2, None, None)),
      to = Seq((1, Some("x"), Some(10L)), (2, None, None)))
      .orderBy("id", "_change_type")
      .as[(Int, Option[String], Option[Long], String)].collect().toSeq
    // id=2 is identical under null-safe compare → absent from the feed
    assert(out === Seq(
      (1, Some("x"), Some(10L), "update_postimage"),
      (1, None, Some(10L), "update_preimage")))
  }

  test("identical snapshots produce an empty feed") {
    val rows = Seq((1, Some("a"), Some(1L)), (2, None, None))
    assert(feed(rows, rows).count() === 0L)
  }

  test("a null key never matches across sides: surfaces as delete+insert, not update") {
    val from = Seq((Some(1), "a"), (None, "b")).toDF("id", "name")
    val to = Seq((Some(1), "a"), (None, "b2")).toDF("id", "name")
    val out = ChangeFeed.diff(from, to, Seq("id"))
      .orderBy("_change_type")
      .as[(Option[Int], String, String)].collect().toSeq
    assert(out === Seq(
      (None, "b", "delete"), (None, "b2", "insert")))
  }

  test("key = whole row degrades to a presence-only diff: inserts and deletes, never updates") {
    val from = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val to = Seq((2, "b"), (3, "c")).toDF("id", "name")
    val out = ChangeFeed.diff(from, to, Seq("id", "name"))
      .orderBy("id")
      .as[(Int, String, String)].collect().toSeq
    assert(out === Seq((1, "a", "delete"), (3, "c", "insert")))
  }

  test("requireUniqueKey fails loudly on a duplicate key; unchecked diff " +
    "row-multiplies (the documented CDC false-primary-key hazard)") {
    val from = Seq((1, "a"), (1, "a2")).toDF("id", "name") // dup key
    val to = Seq((1, "b")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.diff(from, to, Seq("id"), requireUniqueKey = true)
    }
    assert(e.getMessage.contains("not unique on the from side"))
    // the unchecked form multiplies: 2 from-rows × 1 to-row → 2 update
    // pairs (4 rows) — pinned so the hazard stays visible, not vague
    assert(ChangeFeed.diff(from, to, Seq("id")).count() === 4L)
    // a clean pair passes the check and diffs normally
    assert(ChangeFeed.diff(to, to, Seq("id"),
      requireUniqueKey = true).count() === 0L)
  }

  test("compose nets out the vanishing chains: insert-then-delete, revert, " +
    "delete-then-reinsert-same; update chains collapse to one pair") {
    val v1 = Seq((1, Some("a"), Some(10L)), (2, Some("b"), Some(20L)),
      (3, Some("c"), Some(30L)), (4, Some("d"), Some(40L)))
    val v2 = Seq((1, Some("a!"), Some(10L)),              // 1 updated…
      (2, Some("b"), Some(20L)),
      (4, Some("d!"), Some(41L)),                         // 4 updated (chain 1/2)
      (5, Some("born"), Some(50L)))                       // 5 inserted… (3 deleted…)
    val v3 = Seq((1, Some("a"), Some(10L)),               // …1 REVERTED
      (2, Some("b"), Some(20L)),
      (3, Some("c"), Some(30L)),                          // …3 REINSTATED verbatim
      (4, Some("d!!"), Some(42L)))                        // 4 updated again (…5 deleted)
    val composed = ChangeFeed.compose(feed(v1, v2), feed(v2, v3), Seq("id"))
      .as[(Int, Option[String], Option[Long], String)].collect().toSet
    // 1, 3, 5 net to NOTHING; 4's two updates collapse to v1→v3 images
    assert(composed === Set(
      (4, Some("d"), Some(40L), "update_preimage"),
      (4, Some("d!!"), Some(42L), "update_postimage")))
    // and the identity against the direct diff, on the same chain
    assert(composed === feed(v1, v3)
      .as[(Int, Option[String], Option[Long], String)].collect().toSet)
    // preconditions: non-feed input, schema mismatch, bad key
    val notFeed = Seq((1, "x")).toDF("id", "name")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.compose(notFeed, feed(v1, v2), Seq("id"))
    }.getMessage.contains("_change_type"))
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.compose(feed(v1, v2),
        feed(v2, v3).withColumnRenamed("score", "points"), Seq("id"))
    }.getMessage.contains("schema mismatch"))
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.compose(feed(v1, v2), feed(v2, v3), Seq("missing"))
    }.getMessage.contains("absent"))
  }

  test("preconditions fail fast: schema mismatch, missing key, empty key") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((1, "x", 2L)).toDF("id", "name", "extra")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(a, b, Seq("id"))
    }.getMessage.contains("schema mismatch"))
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(a, a, Seq("nope"))
    }.getMessage.contains("key columns absent"))
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(a, a, Nil)
    }.getMessage.contains("at least one column"))
    val clash = Seq((1, "x")).toDF("id", "_change_type")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(clash, clash, Seq("id"))
    }.getMessage.contains("reserved change-feed column"))
  }

  test("applyTo replays a feed exactly: apply(a, diff(a,b)) ≡ b, and " +
    "composing before applying changes nothing") {
    val v1 = Seq((1, Some("a"), Some(10L)), (2, Some("b"), Some(20L)),
      (3, Some("c"), Some(30L)))
    val v2 = Seq((1, Some("a!"), Some(11L)), (3, Some("c"), Some(30L)),
      (4, Some("d"), Some(40L)))
    val v3 = Seq((1, Some("a!"), Some(11L)), (4, Some("d!"), Some(41L)),
      (5, Some("e"), Some(50L)))
    def df(rows: Seq[(Int, Option[String], Option[Long])]) =
      rows.toDF("id", "name", "score")
    def set(d: org.apache.spark.sql.DataFrame) =
      d.as[(Int, Option[String], Option[Long])].collect().toSet
    val f12 = feed(v1, v2)
    val f23 = feed(v2, v3)
    // the replay identity
    assert(set(ChangeFeed.applyTo(df(v1), f12, Seq("id"))) === v2.toSet)
    // sequential apply walks the chain…
    val stepped = ChangeFeed.applyTo(
      ChangeFeed.applyTo(df(v1), f12, Seq("id")), f23, Seq("id"))
    assert(set(stepped) === v3.toSet)
    // …and applying the COMPOSED feed lands on the same rows
    val composed = ChangeFeed.applyTo(df(v1),
      ChangeFeed.compose(f12, f23, Seq("id")), Seq("id"))
    assert(set(composed) === v3.toSet)
    // an empty feed is the identity
    assert(set(ChangeFeed.applyTo(df(v1), feed(v1, v1), Seq("id"))) === v1.toSet)
  }

  test("applyTo matches keys null-safely: a NULL-keyed row's " +
    "delete+insert pair replays correctly") {
    val from = Seq((Some(1), "a"), (None, "b")).toDF("id", "name")
    val to = Seq((Some(1), "a"), (None, "b2")).toDF("id", "name")
    val f = ChangeFeed.diff(from, to, Seq("id"))
    val out = ChangeFeed.applyTo(from, f, Seq("id"))
      .as[(Option[Int], String)].collect().toSet
    assert(out === Set((Some(1), "a"), (None, "b2")))
  }

  test("applyTo strict mode fails loudly on a feed that does not " +
    "correspond to the base; lenient mode silently merges") {
    val right = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val wrong = Seq((9, "z")).toDF("id", "name") // never saw key 1 or 2
    val f = ChangeFeed.diff(right,
      Seq((1, "a!"), (2, "b")).toDF("id", "name"), Seq("id"))
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.applyTo(wrong, f, Seq("id"), strict = true)
    }
    assert(e.getMessage.contains("does not correspond"))
    // lenient: the preimage delete no-ops, the postimage still lands
    val merged = ChangeFeed.applyTo(wrong, f, Seq("id"))
      .as[(Int, String)].collect().toSet
    assert(merged === Set((9, "z"), (1, "a!")))
    // and strict passes on the base the feed was actually diffed from
    assert(ChangeFeed.applyTo(right, f, Seq("id"), strict = true)
      .count() === 2L)
  }

  test("applyTo preconditions fail fast: non-feed input, schema " +
    "mismatch, missing key") {
    val base = Seq((1, "a")).toDF("id", "name")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.applyTo(base, base, Seq("id"))
    }.getMessage.contains("_change_type"))
    val f = ChangeFeed.diff(base, Seq((1, "b")).toDF("id", "name"), Seq("id"))
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.applyTo(base.withColumnRenamed("name", "label"), f, Seq("id"))
    }.getMessage.contains("schema mismatch"))
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.applyTo(base, f, Seq("nope"))
    }.getMessage.contains("absent"))
  }

  test("between() reads the two RETAINED versions through snapshotAt") {
    val root = "/root/repo/target/test-sink/changefeed_between"
    new java.io.File(root).getParentFile.mkdirs()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val v1 = AtomicPublish.publish(spark, root,
      Seq("t" -> Seq((1, "a"), (2, "b")).toDF("id", "name")))
    val v2 = AtomicPublish.publish(spark, root,
      Seq("t" -> Seq((2, "b!"), (3, "c")).toDF("id", "name")))
    val out = ChangeFeed.between(spark, root, "t", v1, v2, Seq("id"))
      .orderBy("id", "_change_type")
      .as[(Int, String, String)].collect().toSeq
    assert(out === Seq(
      (1, "a", "delete"),
      (2, "b!", "update_postimage"), (2, "b", "update_preimage"),
      (3, "c", "insert")))
    // feed direction matters: reversed versions invert the classification
    val rev = ChangeFeed.between(spark, root, "t", v2, v1, Seq("id"))
      .groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(rev === Map("insert" -> 1L, "delete" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L))
  }
}
