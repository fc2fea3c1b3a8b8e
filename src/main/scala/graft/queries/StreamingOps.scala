package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.Streams
import graft.Tables

/** Structured Streaming operators over the `events` fixture [extension —
  * SURVEY.md §2.10]: windowed aggregation, watermarked dedup (the
  * streaming analogue of the reference's insert-if-absent J3/A1), and
  * custom sessionization state via flatMapGroupsWithState. Each runs to
  * completion with Trigger.AvailableNow into a memory sink, so results
  * are batch-verifiable against DuckDB.
  */
/** Output row of st3's sessionizer (top-level so the Catalyst encoder can
  * codegen its constructor). */
final case class Session(
    user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

/** Output row of st11's streaming funnel: emitted when `user_id`'s
  * furthest stage advances to `stage` within a micro-batch. */
final case class StageAdvance(user_id: Long, stage: Int)

object StreamingOps {

  /** Session gap: events within this many µs of the previous event of the
    * same user belong to one session. */
  private val GAP_US = 3600L * 1000000L

  // ── st10: streaming near-dup annotation (dd2/dd10, streaming form) ──
  // State rows: (doc_id, text, dup_of). Carrying text keeps the fixture
  // harness self-contained; a production deployment stores the 16-long
  // MinHash signatures instead (16×8 bytes/doc) — the probe side of
  // incrementalMinhashLsh needs nothing else from the snapshot.

  /** Within-batch annotation: dup_of = min lower-id LSH match in the
    * same micro-batch (the symmetric dd2 pass), null when clean. */
  private[graft] def lshAnnotateBatch(batch: DataFrame): DataFrame = {
    val m = graft.ops.TextDedup.minhashLsh(batch, "doc_id", "text")
      .groupBy(col("doc_b").as("doc_id")).agg(min("doc_a").as("__within"))
    batch.select("doc_id", "text").join(m, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("__within").as("dup_of"))
  }

  /** Cross-batch merge: the new batch probes the accumulated state with
    * the dd10 asymmetric LSH (batch bands broadcast; state never
    * shuffles); dup_of tightens to the minimum over within-batch and
    * prior-arrival matches (least() skips nulls). Union is append-only —
    * earlier annotations are immutable, so replays converge. */
  private[graft] def lshMergeState(prev: DataFrame, cur: DataFrame): DataFrame = {
    val cross = graft.ops.TextDedup.incrementalMinhashLsh(
        batch = cur, snapshot = prev, "doc_id", "text")
      .groupBy(col("batch_id").as("doc_id")).agg(min("snap_id").as("__cross"))
    val curUpd = cur.join(cross, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        least(col("dup_of"), col("__cross")).as("dup_of"))
    prev.unionByName(curUpd)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // st1 — tumbling-window aggregation with a watermark. Complete mode:
    // AvailableNow replays the fixture in one batch, and complete emits
    // every window (append would hold back windows newer than the
    // watermark). In production the same plan runs append + trigger.
    "st1_stream_window_agg" -> ((s, dir) => {
      val agg = Streams.events(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total_value"))
      Streams.runToTable(s, agg, s"st1_out_${Tables.dirSlug(dir)}", "complete")
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start_us", "event_type")
    }),

    // st2 — dropDuplicatesWithinWatermark: the stream is the fixture
    // unioned with itself (every event arrives twice); dedup state keyed
    // on event_id emits each exactly once. State stays bounded by the
    // watermark — the streaming form of the reference's existence-check
    // skip (warehouse.py:78-81).
    "st2_stream_dedup" -> ((s, dir) => {
      val ev = Streams.events(s, dir)
      val deduped = ev.union(ev)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
      Streams.runToTable(s, deduped, s"st2_out_${Tables.dirSlug(dir)}", "append",
          rocksdb = true)
        .orderBy("event_id")
    }),

    // st4 — sliding-window aggregation: 1-hour windows every 30 minutes;
    // each event lands in exactly two windows. Oracle replays by
    // unnesting both candidate window starts per event.
    "st4_stream_sliding_agg" -> ((s, dir) => {
      val agg = Streams.events(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total_value"))
      Streams.runToTable(s, agg, s"st4_out_${Tables.dirSlug(dir)}", "complete")
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start_us", "event_type")
    }),

    // st5 — stream-static join: the event stream enriched against a
    // static dimension (broadcast into every micro-batch — the standard
    // streaming-enrichment shape).
    "st5_stream_static_join" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(
        ("click", "engagement"), ("view", "engagement"),
        ("purchase", "revenue"), ("signup", "growth"), ("error", "ops"))
        .toDF("event_type", "category")
      val joined = Streams.events(s, dir)
        .join(broadcast(dim), Seq("event_type"))
        .groupBy("category")
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total_value"))
      Streams.runToTable(s, joined, s"st5_out_${Tables.dirSlug(dir)}", "complete")
        .orderBy("category")
    }),

    // st11 — streaming funnel [extension]: fn1's conversion tracking
    // LIVE. Per-user furthest stage rides GroupState across
    // micro-batches; each batch sorts only ITS slice by (ts, event_id)
    // and continues the greedy fold (convergence precondition: arrival
    // order respects event time ACROSS batches — st10's contract; order
    // within a batch is free). A row is emitted only when a user's
    // stage advances, so sink volume ∝ conversions, not events. The
    // read-back collapses advances to final stages and reuses
    // Funnel.stageCounts — the oracle is fn1's, verbatim. Multi-batch
    // equivalence to the batch fold is pinned in PipelineStorageSpec.
    "st11_stream_funnel" -> ((s, dir) => {
      val steps = EventOps.FUNNEL_STEPS
      val adv = funnelAdvances(s, Streams.events(s, dir), steps)
      val tbl = Streams.runToTable(s, adv.toDF(),
        s"st11_out_${Tables.dirSlug(dir)}", "append")
      graft.ops.Funnel.stageCounts(
          tbl.groupBy("user_id").agg(max("stage").as("stage")), steps)
        .orderBy("stage")
    }),

    // st12 — streaming data-quality gate [extension]: dq1's validation
    // moved to INGESTION time — rule counters accumulate in a global
    // streaming aggregate (complete mode), so a bad feed is visible
    // while it streams, not at the next batch audit. Violation counters
    // are associative integer sums, so ANY micro-batch split converges
    // exactly to the batch report (the st9 decimal-merge argument,
    // integer case). The value range rule genuinely FAILS on the
    // fixture (3,665 events above 50 at sf0.01) — same
    // catches-real-defects posture as dq1.
    "st12_stream_dq" -> ((s, dir) => {
      val ev = Streams.events(s, dir)
      val agg = ev.agg(
        count(lit(1)).as("checked"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("v_user"),
        sum(when(!col("event_type").isin(
          "click", "view", "purchase", "signup", "error"), 1L).otherwise(0L))
          .as("v_type"),
        sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("v_range"))
      Streams.runToTable(s, agg, s"st12_out_${Tables.dirSlug(dir)}", "complete")
        .select(expr(
          """stack(3,
            |  'events.user_id_not_null', v_user,
            |  'events.type_in_set', v_type,
            |  'events.value_le_50', v_range) AS (rule, violations)""".stripMargin),
          col("checked"))
        .select(col("rule"), col("violations"), col("checked"),
          (col("violations") === 0L).as("pass"))
        .orderBy("rule")
    }),

    // st13 — streaming ANN index ingest [extension]: the streaming twin
    // of sim13's table-persisted serve, closing the loop on a
    // continuously-fed vector corpus. The trained model publishes once
    // as v0 with an EMPTY index (the "create index" step; training is
    // session-shared with sim12 — the ingest prices ingest, not
    // retraining); each arriving micro-batch of embeddings then
    // foreachBatch-appends ONE coded segment named by its batchId
    // (AnnIndexStore.appendEncode — batch-sized encode + pointer
    // commit, idempotent under batch replay via the applied-segment
    // ledger, which keeps the replay a no-op even after a compaction
    // merged the segment away), and the final snapshot serves the query
    // batch. The fixture is ONE parquet file — a single AvailableNow
    // batch — so the feed is staged once per (session, dir) as four
    // hash-split files admitted one per trigger: a genuine four-batch
    // ingest LOOP, the shape production runs. Codes are deterministic
    // per row under the frozen model, so ANY micro-batch split
    // converges to the batch index — the served ranking hash-matches
    // sim12's oracle (multi-batch convergence pinned in
    // IncrementalIndexSpec's streaming test).
    "st13_stream_index_ingest" -> ((s, dir) => {
      val (nq, topk, nprobe) = SimilarityOps.servingConstants
      val model = SimilarityOps.sharedPqModel(s, dir)
      val root = s"/root/repo/target/sink/st13_ann_${Tables.dirSlug(dir)}"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(root))
      val corpus = Tables.embeddings(s, dir)
      val feed = s"/root/repo/target/sink/st13_feed_${Tables.dirSlug(dir)}"
      // hash-split (not round-robin: no sortBeforeRepartition tax, and
      // the file↔row assignment is deterministic); written once per
      // session like the bkt layout — the arrival feed is the
      // warehouse's input, not part of the ingest being priced
      Shared.setupOnce(s, dir, "st13_feed")(
        corpus.repartition(4, col("vec_id"))
          .write.mode("overwrite").parquet(feed))
      graft.ops.AnnIndexStore.publish(s, root, model,
        graft.ops.VectorSearch.ivfPqEncode(model, corpus.limit(0),
          "vec_id", "embedding"))
      var applied = 0
      val stream = s.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
      // the checkpoint is recreated per harness run (runIngest clears it
      // at entry), so tmpfs placement prices the ingest loop, not disk
      // fsync — see Streams.ephemeralChkRoot; replay idempotence is
      // pinned by IncrementalIndexSpec's applied-ledger tests
      val chk = s"${Streams.ephemeralChkRoot}/st13_${Tables.dirSlug(dir)}"
      Streams.runIngest(s, stream, chk) {
        (batch, batchId) =>
          if (!batch.isEmpty) {
            graft.ops.AnnIndexStore.appendEncode(s, root, batch,
              "vec_id", "embedding", Some(f"batch-$batchId%05d")): Unit
            applied += 1
            // ops-cadence compaction INSIDE the live ingest loop — the
            // production counterweight to per-batch segment accretion,
            // gated here so the full lifecycle (ingest → compact →
            // serve) hash-matches sim12's oracle every round, not just
            // in IncrementalIndexSpec. Every FOURTH applied batch, per
            // compactSegments' own trigger policy (an ops cadence
            // against a finer-grained ingest — compacting after every
            // batch re-rewrites the same smallest segments each time).
            // Codes are pure (model, row) functions and the merge is a
            // byte-copy, so the served ranking is unchanged by
            // construction.
            if (applied % 4 == 0)
              graft.ops.AnnIndexStore.compactSegments(s, root): Unit
          }
      }
      graft.ops.AnnIndexStore.serve(s, root,
          corpus.filter(col("vec_id") < nq), "vec_id", "embedding",
          k = topk, nprobe = nprobe)
        .orderBy("query_id", "rank")
    }),

    // st14 — streaming CDC APPLY [extension; the consumer side of
    // o10/o11]: a stream of change-feed batches (the shape a CDC topic
    // delivers) maintains a PUBLISHED downstream aggregate exactly-once.
    // Each micro-batch applies IncrementalAgg.maintain to the current
    // snapshot's state and commits (state', ledger+batchId) as ONE
    // atomic publish — the applied ledger rides in the same version as
    // the state it describes, so a checkpoint-replayed batch reads its
    // own id and skips (Delta's txn device again, here for the MV).
    // Additive deltas COMMUTE, so the final state is independent of
    // feed admission order and batching — maxFilesPerTrigger=1 makes
    // the loop genuinely multi-batch, but any split converges. The
    // oracle recomputes the final slice's aggregate from scratch: the
    // hash match proves streamed maintenance ≡ full recompute.
    "st14_stream_cdc_apply" -> ((s, dir) => {
      import graft.etl.{AtomicPublish, ChangeFeed, IncrementalAgg}
      val grp = Seq("o_orderpriority")
      val sums = Seq("total_price" -> "o_totalprice")
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      // the version chain: base, then three correction batches (drop a
      // decile, admit a decile, reclassify a decile — group migrations
      // included), each feed = the exact row-level delta
      val chain = Seq[DataFrame => DataFrame](
        df => df.filter(col("o_orderkey") % 10 =!= 7),
        df => df.filter(col("o_orderkey") % 10 =!= 3),
        df => df.filter(col("o_orderkey") % 10 =!= 3)
          .withColumn("o_orderpriority",
            when(col("o_orderkey") % 10 === 4, lit("9-RECLASSIFIED"))
              .otherwise(col("o_orderpriority"))),
        df => df.filter(col("o_orderkey") % 10 =!= 3 &&
            col("o_orderkey") % 10 =!= 1)
          .withColumn("o_orderpriority",
            when(col("o_orderkey") % 10 === 4, lit("9-RECLASSIFIED"))
              .otherwise(col("o_orderpriority"))))
      val versions = chain.map(_(orders))
      val feedDir = s"/root/repo/target/sink/st14_feeds_${Tables.dirSlug(dir)}"
      Shared.setupOnce(s, dir, "st14_feeds") {
        // one subdir per feed, each overwritten idempotently (a fresh
        // JVM re-stages the same bytes — append would double the feed):
        // the CDC topic's batch boundaries, admitted one per trigger
        versions.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
          ChangeFeed.diff(a, b, Seq("o_orderkey"))
            .repartition(1).write.mode("overwrite").parquet(s"$feedDir/f$i")
        }
      }
      val root = s"/root/repo/target/sink/st14_mv_${Tables.dirSlug(dir)}"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(root))
      // 8 buckets for a handful of groups: B sizes the write granularity
      // (SCALE.md's f ≈ gΔ/B rule), not the group capacity
      IncrementalAgg.publishInitial(s, root, versions.head, grp, sums,
        numBuckets = 8)
      val feedSchema = versions.head.schema
        .add("_change_type", "string", nullable = false)
      val stream = s.readStream.schema(feedSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$feedDir/*")
      val chk = s"${Streams.ephemeralChkRoot}/st14_${Tables.dirSlug(dir)}"
      Streams.runIngest(s, stream, chk) { (batch, batchId) =>
        if (!batch.isEmpty &&
            IncrementalAgg.applyOnce(s, root, batch, batchId, grp, sums))
          AtomicPublish.vacuum(s, root, keep = 2): Unit
      }
      // segment GC: in THIS harness query it runs exactly once, after
      // the bounded stream has drained (the feed set is finite). A
      // long-running production consumer must instead call it at an
      // OPS cadence — inside the foreachBatch body gated on
      // batchId % N == 0, the way st13 schedules compaction — or it
      // accretes one superseded segment per touched bucket per batch
      // until shutdown; per-batch GC overshoots the other way (each
      // pass costs one manifest read per retained version). minAgeMs=0
      // is safe here because the consumer is the only publisher
      // (nothing can be in flight between its own batches).
      IncrementalAgg.vacuumSegments(s, root, minAgeMs = 0)
      IncrementalAgg.readState(s, root)
        .select(col("o_orderpriority"), col("n"),
          col("total_price").cast("double").as("total_price"))
        .orderBy("o_orderpriority")
    }),

    // st15 — streaming JOIN-VIEW maintenance over a MULTIPLEXED CDC
    // topic [extension; the streaming form of o18, hash-gated like
    // every other st query instead of spec-only]: one stream carries
    // BOTH tables' change feeds under a super-schema with a _table
    // tag (the one-topic-many-tables CDC shape); each micro-batch
    // demultiplexes, computes the six-term join delta with both
    // pre-states read bucket-pruned AT THE LAST CUT, advances the
    // three stores CONCURRENTLY (Coordinator.advanceMembers — the
    // per-commit latencies overlap), and commits one cut. A replayed
    // batch no-ops every ledger and re-commits an identical cut. The
    // oracle joins the final slices directly — the feed files, the
    // demux, the six terms, and the cuts never appear in it.
    "st15_stream_join_maintain" -> ((s, dir) => {
      import graft.etl.{AtomicPublish, ChangeFeed, Coordinator, IncrementalAgg, JoinView}
      import graft.etl.IncrementalAgg.ReplicaSpec
      val ordBase = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val custBase = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      val bump = (df: DataFrame) =>
        df.withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 4, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val reseg = (df: DataFrame) =>
        df.withColumn("c_mktsegment",
          when(col("c_custkey") % 5 === 0, lit("GRAFTSEG"))
            .otherwise(col("c_mktsegment")))
      // 4 versions → 3 multiplexed feed files; both sides churn every
      // batch (order deletes/re-inserts + price updates beside
      // customer resegmentations and a customer slice deletion)
      val aChain = Seq(
        ordBase,
        ordBase.filter(col("o_orderkey") % 10 =!= 7),
        ordBase.filter(col("o_orderkey") % 10 =!= 7 &&
          col("o_orderkey") % 10 =!= 3),
        bump(ordBase.filter(col("o_orderkey") % 10 =!= 3)))
      val bChain = Seq(
        custBase,
        reseg(custBase),
        reseg(custBase).filter(col("c_custkey") % 7 =!= 3),
        reseg(custBase).filter(col("c_custkey") % 7 =!= 3))
      def mux(fa: DataFrame, fb: DataFrame): DataFrame =
        fa.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(null).cast("bigint").as("c_custkey"),
            lit(null).cast("string").as("c_mktsegment"),
            col("_change_type"), lit("a").as("_table"))
          .unionByName(fb.select(
            lit(null).cast("bigint").as("o_orderkey"),
            lit(null).cast("bigint").as("o_custkey"),
            lit(null).cast("double").as("o_totalprice"),
            col("c_custkey"), col("c_mktsegment"),
            col("_change_type"), lit("b").as("_table")))
      val feedDir = s"/root/repo/target/sink/st15_feeds_${Tables.dirSlug(dir)}"
      Shared.setupOnce(s, dir, "st15_feeds") {
        // one subdir per batch, each overwritten idempotently — the
        // CDC topic's batch boundaries, admitted one per trigger
        aChain.zip(bChain).sliding(2).zipWithIndex.foreach {
          case (Seq((a0, b0), (a1, b1)), i) =>
            mux(ChangeFeed.diff(a0, a1, Seq("o_orderkey")),
                ChangeFeed.diff(b0, b1, Seq("c_custkey")))
              .repartition(1).write.mode("overwrite").parquet(s"$feedDir/f$i")
        }
      }
      val base = s"/root/repo/target/sink/st15_jv_${Tables.dirSlug(dir)}"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(base))
      val aRoot = s"$base/a"; val bRoot = s"$base/b"
      val vRoot = s"$base/v"; val cutRoot = s"$base/cut"
      val aT = Seq(ReplicaSpec("replica", Seq("o_orderkey"), numBuckets = 16,
        bucketOn = Seq("o_custkey")))
      val bT = Seq(ReplicaSpec("replica", Seq("c_custkey"), numBuckets = 16))
      val vT = Seq(ReplicaSpec("view", Seq("o_orderkey", "c_custkey"),
        numBuckets = 16))
      Coordinator.seedMembers(s, Seq(
        Coordinator.SeedRows(aRoot, aChain.head, aT),
        Coordinator.SeedRows(bRoot, bChain.head, bT),
        Coordinator.SeedRows(vRoot, aChain.head.join(bChain.head,
          col("o_custkey") === col("c_custkey"), "inner"), vT)))
      Coordinator.commitCut(s, cutRoot, Map("a" -> 0L, "b" -> 0L, "v" -> 0L))
      val muxSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
          "c_custkey BIGINT, c_mktsegment STRING, " +
          "_change_type STRING, _table STRING")
      val stream = s.readStream.schema(muxSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$feedDir/*")
      val chk = s"${Streams.ephemeralChkRoot}/st15_${Tables.dirSlug(dir)}"
      Streams.runIngest(s, stream, chk) { (batch, batchId) =>
        if (!batch.isEmpty) {
          val fA = batch.filter(col("_table") === "a")
            .select("o_orderkey", "o_custkey", "o_totalprice", "_change_type")
            .persist()
          val fB = batch.filter(col("_table") === "b")
            .select("c_custkey", "c_mktsegment", "_change_type").persist()
          // pre-state reads pin to the LAST cut, so the concurrent
          // store advances below cannot race them
          val cut = Coordinator.currentCut(s, cutRoot)
          val viewFeed = JoinView.joinDeltaFromStores(s,
            JoinView.Side(aRoot, "replica", Seq("o_custkey"), cut("a")),
            JoinView.Side(bRoot, "replica", Seq("c_custkey"), cut("b")),
            fA, fB).persist()
          try Coordinator.advanceMembers(s, batchId, Seq(
            Coordinator.MemberAdvance(aRoot, fA, aT),
            Coordinator.MemberAdvance(bRoot, fB, bT),
            Coordinator.MemberAdvance(vRoot, viewFeed, vT)))
          finally {
            fA.unpersist(); fB.unpersist(); viewFeed.unpersist(); ()
          }
          Coordinator.commitCut(s, cutRoot, Map(
            "a" -> AtomicPublish.currentVersion(s, aRoot).get,
            "b" -> AtomicPublish.currentVersion(s, bRoot).get,
            "v" -> AtomicPublish.currentVersion(s, vRoot).get))
        }
      }
      val cut = Coordinator.currentCut(s, cutRoot)
      IncrementalAgg.readView(s, vRoot, "view", Some(cut("v")))
        .orderBy("o_orderkey")
    }),

    // st16 — the STREAMING form of the one-root join family (o26): the
    // same multiplexed CDC topic as st15 drives BOTH bases and ALL SIX
    // join-form views of the pair, the views living as six sibling
    // targets of ONE maintained store (applyOnceFeeds) — three ledgered
    // commits and one coordinator cut per micro-batch no matter how
    // many forms the family maintains. familyDeltas derives the six
    // view feeds from ONE shared Corrections per side, so each trigger
    // pays the substrate once; pre-state reads pin to the LAST cut so
    // the member advances below cannot race them. The final read
    // resolves ONE cut and reads every view at that cut's single store
    // version — the streaming analogue of o26's batch gate, against
    // the same tagged-union oracle shape.
    "st16_stream_family_maintain" -> ((s, dir) => {
      import graft.etl.{AtomicPublish, ChangeFeed, Coordinator, IncrementalAgg, JoinView}
      import graft.etl.IncrementalAgg.{ReplicaSpec, TargetFeed, ViewSpec}
      val ordBase = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val custBase = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      val bump = (df: DataFrame) =>
        df.withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 4, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val reseg = (df: DataFrame) =>
        df.withColumn("c_mktsegment",
          when(col("c_custkey") % 5 === 0, lit("GRAFTSEG"))
            .otherwise(col("c_mktsegment")))
      // st15's chains: both sides churn every batch — deletes,
      // re-inserts, price updates, resegmentations, a customer slice
      // deletion — so every join form crosses its null-extension /
      // membership transitions mid-stream
      val aChain = Seq(
        ordBase,
        ordBase.filter(col("o_orderkey") % 10 =!= 7),
        ordBase.filter(col("o_orderkey") % 10 =!= 7 &&
          col("o_orderkey") % 10 =!= 3),
        bump(ordBase.filter(col("o_orderkey") % 10 =!= 3)))
      val bChain = Seq(
        custBase,
        reseg(custBase),
        reseg(custBase).filter(col("c_custkey") % 7 =!= 3),
        reseg(custBase).filter(col("c_custkey") % 7 =!= 3))
      def mux(fa: DataFrame, fb: DataFrame): DataFrame =
        fa.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(null).cast("bigint").as("c_custkey"),
            lit(null).cast("string").as("c_mktsegment"),
            col("_change_type"), lit("a").as("_table"))
          .unionByName(fb.select(
            lit(null).cast("bigint").as("o_orderkey"),
            lit(null).cast("bigint").as("o_custkey"),
            lit(null).cast("double").as("o_totalprice"),
            col("c_custkey"), col("c_mktsegment"),
            col("_change_type"), lit("b").as("_table")))
      val feedDir = s"/root/repo/target/sink/st16_feeds_${Tables.dirSlug(dir)}"
      Shared.setupOnce(s, dir, "st16_feeds") {
        aChain.zip(bChain).sliding(2).zipWithIndex.foreach {
          case (Seq((a0, b0), (a1, b1)), i) =>
            mux(ChangeFeed.diff(a0, a1, Seq("o_orderkey")),
                ChangeFeed.diff(b0, b1, Seq("c_custkey")))
              .repartition(1).write.mode("overwrite").parquet(s"$feedDir/f$i")
        }
      }
      val base = s"/root/repo/target/sink/st16_fam_${Tables.dirSlug(dir)}"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(base))
      val aRoot = s"$base/a"; val bRoot = s"$base/b"
      val famRoot = s"$base/fam"; val cutRoot = s"$base/cut"
      val forms = Seq("inner", "left", "right", "full", "semi", "anti")
      val aT = Seq(
        ReplicaSpec("replica", Seq("o_orderkey"), numBuckets = 16,
          bucketOn = Seq("o_custkey")),
        ViewSpec("acnt", Seq("o_custkey"), Nil, numBuckets = 16))
      val bT = Seq(
        ReplicaSpec("replica", Seq("c_custkey"), numBuckets = 16),
        ViewSpec("bcnt", Seq("c_custkey"), Nil, numBuckets = 16))
      val famT: Map[String, IncrementalAgg.TargetSpec] = Map(
        "inner" -> ReplicaSpec("v_inner",
          Seq("o_orderkey", "c_custkey"), numBuckets = 16),
        "left" -> ReplicaSpec("v_left",
          Seq("o_orderkey", "c_custkey"), numBuckets = 16),
        "right" -> ReplicaSpec("v_right",
          Seq("c_custkey", "o_orderkey"), numBuckets = 16),
        "full" -> ReplicaSpec("v_full",
          Seq("o_orderkey", "c_custkey"), numBuckets = 16),
        "semi" -> ReplicaSpec("v_semi", Seq("o_orderkey"), numBuckets = 16),
        "anti" -> ReplicaSpec("v_anti", Seq("o_orderkey"), numBuckets = 16))
      val joinType = Map("inner" -> "inner", "left" -> "left_outer",
        "right" -> "right_outer", "full" -> "full_outer",
        "semi" -> "left_semi", "anti" -> "left_anti")
      Coordinator.seedMembers(s, Seq(
        Coordinator.SeedRows(aRoot, aChain.head, aT),
        Coordinator.SeedRows(bRoot, bChain.head, bT),
        Coordinator.SeedFeeds(famRoot, forms.map { f =>
          TargetFeed(famT(f), aChain.head.join(bChain.head,
            col("o_custkey") === col("c_custkey"), joinType(f)))
        })))
      def allVersions(): Map[String, Long] =
        Seq("a" -> aRoot, "b" -> bRoot, "fam" -> famRoot)
          .map { case (n, r) =>
            n -> AtomicPublish.currentVersion(s, r).get }.toMap
      Coordinator.commitCut(s, cutRoot, allVersions())
      val muxSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
          "c_custkey BIGINT, c_mktsegment STRING, " +
          "_change_type STRING, _table STRING")
      val stream = s.readStream.schema(muxSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$feedDir/*")
      val chk = s"${Streams.ephemeralChkRoot}/st16_${Tables.dirSlug(dir)}"
      Streams.runIngest(s, stream, chk) { (batch, batchId) =>
        if (!batch.isEmpty) {
          val fA = batch.filter(col("_table") === "a")
            .select("o_orderkey", "o_custkey", "o_totalprice", "_change_type")
            .persist()
          val fB = batch.filter(col("_table") === "b")
            .select("c_custkey", "c_mktsegment", "_change_type").persist()
          val cut = Coordinator.currentCut(s, cutRoot)
          val fam = JoinView.familyDeltas(s,
            JoinView.Side(aRoot, "replica", Seq("o_custkey"), cut("a")),
            JoinView.Side(bRoot, "replica", Seq("c_custkey"), cut("b")),
            "acnt", "bcnt", fA, fB)
          val feeds = Map(
            "inner" -> fam.inner.persist(),
            "left" -> fam.leftOuter.persist(),
            "right" -> fam.rightOuter.persist(),
            "full" -> fam.fullOuter.persist(),
            "semi" -> fam.semi.persist(),
            "anti" -> fam.anti.persist())
          try {
            Coordinator.advanceMembers(s, batchId, Seq(
              Coordinator.MemberAdvance(aRoot, fA, aT),
              Coordinator.MemberAdvance(bRoot, fB, bT),
              Coordinator.MemberAdvanceFeeds(famRoot,
                forms.map(f => TargetFeed(famT(f), feeds(f))))))
            Coordinator.commitCut(s, cutRoot, allVersions())
          } finally {
            fA.unpersist(); fB.unpersist()
            feeds.values.foreach(_.unpersist()); fam.release()
          }
        }
      }
      val cut = Coordinator.currentCut(s, cutRoot)
      def rd(f: String) =
        IncrementalAgg.readView(s, famRoot, s"v_$f", Some(cut("fam")))
      val aOnly = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"),
        lit(null).cast("long").as("c_custkey"),
        lit(null).cast("string").as("c_mktsegment"))
      forms.map { f =>
        val v = if (f == "semi" || f == "anti") rd(f).select(aOnly: _*)
                else rd(f)
        v.withColumn("side", lit(f))
      }.reduce(_ unionByName _)
        .select(col("side"), col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("side"), col("o_orderkey").asc_nulls_last,
          col("c_custkey").asc_nulls_last)
    }),

    // st3 — custom sessionization state: flatMapGroupsWithState per user,
    // splitting the user's event times on gaps > GAP_US. One AvailableNow
    // batch delivers each user's full history, so the emitted sessions
    // are the complete sessionization (verified by the gaps-and-islands
    // SQL oracle). Live, the same function holds open sessions in
    // GroupState across batches.
    "st3_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      val ev = Streams.events(s, dir)
        .select(col("user_id").cast("long"), unix_micros(col("ts")).as("tus"))
        .as[(Long, Long)]
      val sessions = ev.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
          (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) => {
            val ts = rows.map(_._2).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var start = 0
            var i = 1
            while (i <= ts.length) {
              if (i == ts.length || ts(i) - ts(i - 1) > GAP_US) {
                out += Session(uid, ts(start), ts(i - 1), (i - start).toLong)
                start = i
              }
              i += 1
            }
            out.iterator
          })
      Streams.runToTable(s, sessions.toDF(), s"st3_out_${Tables.dirSlug(dir)}", "append")
        .orderBy("user_id", "session_start_us")
    }),

    // st8 — checkpointed parquet file sink (the production sink the
    // memory-sink harness queries stand in for): stream-projected events
    // append to a parquet directory with a commit log, then read back.
    "st8_stream_file_sink" -> ((s, dir) => {
      val proj = Streams.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
      Streams.runToParquet(s, proj,
          s"/root/repo/target/sink/st8_${Tables.dirSlug(dir)}")
        .orderBy("event_id")
    }),

    // st7 — built-in session_window aggregation (SURVEY §2.10 names it
    // explicitly; st3 is the custom-state flavor of the same shape):
    // per-user sessions close after 30 idle minutes, window.end is
    // last-event + gap by definition. The result surface is the
    // file-sink read-back, NOT a memory sink: st7's output is
    // corpus-shaped (one row per user-session), and collecting it to
    // the driver per batch trips spark.driver.maxResultSize at sf10 —
    // the one harness-surface failure of the r13 density campaign.
    "st7_session_window" -> ((s, dir) => {
      val agg = Streams.events(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total_value"))
      Streams.runCompleteToParquet(s, agg,
          s"/root/repo/target/sink/st7_${Tables.dirSlug(dir)}")
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n"), col("total_value"))
        .orderBy("user_id", "session_start_us")
    }),

    // st9 — streaming upsert via foreachBatch MERGE (the streaming form
    // of o4's SCD-1): per-user running totals maintained in a versioned
    // parquet state table. The running sum is kept as DECIMAL(38,6)
    // INSIDE the state (exact, associative — batch boundaries can't
    // perturb it); the latest event is a lexicographic struct max on
    // (ts, event_id). Both merge operations are associative, so any
    // micro-batch split converges to the batch answer.
    "st9_stream_upsert" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      def reduceBatch(df: DataFrame): DataFrame = df
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).as("total_dec"),
          max(struct(unix_micros(col("ts")).as("us"),
            col("event_id").as("id"))).as("last"))
      def mergeStates(prev: DataFrame, cur: DataFrame): DataFrame = prev
        .unionByName(cur)
        .groupBy(col("user_id"))
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("total_dec")).cast(dec).as("total_dec"),
          max(col("last")).as("last"))
      Streams.runMergeToParquet(s, Streams.events(s, dir),
          s"/root/repo/target/sink/st9_${Tables.dirSlug(dir)}")(
          reduceBatch)(mergeStates)
        .select(col("user_id"), col("n_events"),
          col("total_dec").cast("double").as("total_value"),
          col("last.us").as("last_us"), col("last.id").as("last_event_id"))
        .orderBy("user_id")
    }),

    // st10 — streaming near-dup annotation [extension]: the streaming
    // form of dd2/dd10 — every arriving document is annotated with its
    // FIRST near-duplicate among all earlier arrivals (min id among
    // MinHash-LSH matches arrived in earlier batches or earlier in the
    // same batch), the ingestion-time dedup gate of a continuously fed
    // corpus. Within a batch the symmetric LSH runs; across batches the
    // batch probes the accumulated state with the dd10 asymmetric form
    // (batch bands broadcast, state never shuffles). With id-ordered
    // arrival the result is IDENTICAL to the one-shot batch answer —
    // the multi-batch convergence law is pinned in PipelineStorageSpec; the
    // fixture replays as one AvailableNow batch, so the DuckDB oracle
    // is the symmetric dd2 min-pair form.
    "st10_stream_lsh_dedup" -> ((s, dir) =>
      Streams.runMergeToParquet(s, Streams.documents(s, dir),
          s"/root/repo/target/sink/st10_${Tables.dirSlug(dir)}")(
          lshAnnotateBatch)(lshMergeState)
        .select(col("doc_id"), col("dup_of"),
          col("dup_of").isNotNull.as("is_dup"))
        .orderBy("doc_id")),

    // st6 — watermarked stream-stream inner join: each view event joins
    // purchase events by the same user within the following 30 minutes.
    // Both sides carry watermarks and the join condition bounds event
    // time on both ends, so state is evictable — the shape that keeps a
    // stream-stream join's state finite on an unbounded 100 TB/day feed.
    "st6_stream_stream_join" -> ((s, dir) => {
      val views = Streams.events(s, dir)
        .filter(col("event_type") === "view")
        .withWatermark("ts", "1 hour")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_id"))
      val buys = Streams.events(s, dir)
        .filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("b_user"), col("ts").as("buy_ts"),
          col("event_id").as("buy_id"))
      val joined = views.join(buys,
        col("user_id") === col("b_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      Streams.runToTable(s, joined, s"st6_out_${Tables.dirSlug(dir)}", "append")
        .select(col("user_id"),
          unix_micros(col("view_ts")).as("view_ts_us"),
          unix_micros(col("buy_ts")).as("buy_ts_us"),
          col("view_id"), col("buy_id"))
        .orderBy("user_id", "view_ts_us", "buy_ts_us", "view_id", "buy_id")
    }))

  /** st11's stateful core, shared with the PipelineStorageSpec
    * convergence test: per-user greedy funnel fold continued from
    * GroupState, emitting a [[StageAdvance]] per batch in which the
    * user's stage moved. */
  def funnelAdvances(s: SparkSession, events: DataFrame,
                     steps: Seq[String]): org.apache.spark.sql.Dataset[StageAdvance] = {
    import s.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("tus"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[Int]) => {
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(0)
          val before = st
          sorted.foreach { r =>
            if (st < steps.length && r._4 == steps(st)) st += 1
          }
          state.update(st)
          if (st > before) Iterator(StageAdvance(uid, st)) else Iterator.empty
        })
  }

  val oracles: Map[String, String] = Map(
    // fn1's oracle verbatim: the streamed fold must converge to the
    // batch funnel's conversion table.
    "st11_stream_funnel" -> EventOps.oracles("fn1_funnel"),

    // sim12's oracle verbatim: the streamed ingest must converge to the
    // batch index, so the served ranking is the IVFADC chain's.
    "st13_stream_index_ingest" -> SimilarityOps.oracles("sim12_ivf_pq"),

    // The final version of the chain recomputed from scratch — the
    // streamed incremental path never appears in the oracle.
    "st14_stream_cdc_apply" ->
      """WITH final AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 4 THEN '9-RECLASSIFIED'
        |              ELSE o_orderpriority END AS o_orderpriority,
        |         o_totalprice
        |  FROM orders WHERE o_orderkey % 10 NOT IN (3, 1))
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR)
        |    AS DOUBLE) AS total_price
        |FROM final GROUP BY 1 ORDER BY 1""".stripMargin,

    // The final slices joined directly — the multiplexed topic, the
    // demux, the six-term delta algebra, the three stores, and the
    // per-batch cuts never appear here, so the hash match proves the
    // STREAMED join view ≡ a from-scratch join of the final tables.
    "st15_stream_join_maintain" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 10 = 4 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 <> 3),
        |c AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'GRAFTSEG'
        |         ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer WHERE c_custkey % 7 <> 3)
        |SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_mktsegment
        |FROM o JOIN c ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // o26's tagged-union oracle shape over st15's final slices — the
    // topic, the demux, familyDeltas, the one-root store, and the
    // per-trigger cuts never appear here, so the hash match proves the
    // STREAMED six-form family ≡ six direct joins of the final tables.
    "st16_stream_family_maintain" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 10 = 4 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 <> 3),
        |c AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'GRAFTSEG'
        |         ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer WHERE c_custkey % 7 <> 3)
        |SELECT * FROM (
        |  SELECT 'inner' AS side, o_orderkey, o_custkey, o_totalprice,
        |         c_custkey, c_mktsegment
        |  FROM o JOIN c ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'left', o_orderkey, o_custkey, o_totalprice,
        |         c_custkey, c_mktsegment
        |  FROM o LEFT JOIN c ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'right', o_orderkey, o_custkey, o_totalprice,
        |         c_custkey, c_mktsegment
        |  FROM o RIGHT JOIN c ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'full', o_orderkey, o_custkey, o_totalprice,
        |         c_custkey, c_mktsegment
        |  FROM o FULL JOIN c ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'semi', o_orderkey, o_custkey, o_totalprice,
        |         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
        |  FROM o WHERE EXISTS (SELECT 1 FROM c WHERE c_custkey = o_custkey)
        |  UNION ALL
        |  SELECT 'anti', o_orderkey, o_custkey, o_totalprice,
        |         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
        |  FROM o WHERE NOT EXISTS (SELECT 1 FROM c WHERE c_custkey = o_custkey))
        |ORDER BY side, o_orderkey NULLS LAST, c_custkey NULLS LAST""".stripMargin,

    "st12_stream_dq" ->
      """WITH a AS (SELECT
        |    CAST(count(*) AS BIGINT) AS checked,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_user,
        |    CAST(sum(CASE WHEN event_type NOT IN
        |      ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT) AS v_type,
        |    CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_range
        |  FROM events)
        |SELECT rule, violations, checked, violations = 0 AS pass FROM (
        |  SELECT 'events.user_id_not_null' AS rule, v_user AS violations, checked FROM a
        |  UNION ALL SELECT 'events.type_in_set', v_type, checked FROM a
        |  UNION ALL SELECT 'events.value_le_50', v_range, checked FROM a)
        |ORDER BY rule""".stripMargin,
    "st1_stream_window_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
        |       event_type, COUNT(*) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,

    "st2_stream_dedup" ->
      """SELECT event_id, event_type, user_id, value
        |FROM events ORDER BY event_id""".stripMargin,

    "st4_stream_sliding_agg" ->
      """WITH w AS (
        |  SELECT event_type, value,
        |    unnest([epoch_us(date_trunc('hour', ts) +
        |              CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
        |                   ELSE INTERVAL 0 MINUTE END),
        |            epoch_us(date_trunc('hour', ts) +
        |              CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
        |                   ELSE INTERVAL 0 MINUTE END) - 1800000000]) AS window_start_us
        |  FROM events)
        |SELECT window_start_us, event_type, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,

    "st5_stream_static_join" ->
      """WITH dim AS (
        |  SELECT * FROM (VALUES
        |    ('click', 'engagement'), ('view', 'engagement'),
        |    ('purchase', 'revenue'), ('signup', 'growth'),
        |    ('error', 'ops')) AS t(event_type, category))
        |SELECT category, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events JOIN dim USING (event_type)
        |GROUP BY category ORDER BY category""".stripMargin,

    "st8_stream_file_sink" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // 30-minute-gap sessions via gaps-and-islands; session end is
    // last-event + gap, matching session_window's definition
    "st7_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
        |o AS (SELECT user_id, tus, value,
        |        lag(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
        |      FROM e),
        |f AS (SELECT user_id, tus, value,
        |        CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS newses
        |      FROM o),
        |g AS (SELECT user_id, tus, value,
        |        SUM(newses) OVER (PARTITION BY user_id ORDER BY tus
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM f)
        |SELECT user_id, min(tus) AS session_start_us,
        |       max(tus) + 1800000000 AS session_end_us,
        |       COUNT(*) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "st9_stream_upsert" ->
      """WITH m AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value,
        |    max(struct_pack(us := epoch_us(ts), id := event_id)) AS last
        |  FROM events GROUP BY 1)
        |SELECT user_id, n_events, total_value,
        |  last.us AS last_us, last.id AS last_event_id
        |FROM m ORDER BY user_id""".stripMargin,

    // The fixture replays as one AvailableNow batch, so the streaming
    // annotation reduces to the symmetric dd2 min-pair form (the
    // multi-batch path is pinned by PipelineStorageSpec's convergence law).
    "st10_stream_lsh_dedup" ->
      s"""WITH ${DedupOps.duckLshPairCtes},
         |m AS (SELECT doc_b AS doc_id, MIN(doc_a) AS dup_of
         |      FROM pairs GROUP BY doc_b)
         |SELECT d.doc_id, m.dup_of, m.dup_of IS NOT NULL AS is_dup
         |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "st6_stream_stream_join" ->
      """SELECT a.user_id, epoch_us(a.ts) AS view_ts_us,
        |  epoch_us(b.ts) AS buy_ts_us,
        |  a.event_id AS view_id, b.event_id AS buy_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'view' AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |ORDER BY a.user_id, view_ts_us, buy_ts_us, view_id, buy_id""".stripMargin,

    "st3_stream_sessionize" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
         |o AS (SELECT user_id, tus,
         |        lag(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
         |      FROM e),
         |f AS (SELECT user_id, tus,
         |        CASE WHEN prev IS NULL OR tus - prev > $GAP_US THEN 1 ELSE 0 END AS newses
         |      FROM o),
         |g AS (SELECT user_id, tus,
         |        SUM(newses) OVER (PARTITION BY user_id ORDER BY tus
         |          ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM f)
         |SELECT user_id, min(tus) AS session_start_us, max(tus) AS session_end_us,
         |       COUNT(*) AS n_events
         |FROM g GROUP BY user_id, sid
         |ORDER BY user_id, session_start_us""".stripMargin)
}
