package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextDedup, VectorSearch}

/** The public ops API must work against caller-named columns, not just
  * the fixture schema — exercised here with renamed inputs. */
class OpsApiSpec extends SparkSuite {

  test("TextDedup handles arbitrary id/text column names") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("pk"), col("text").as("body"))
    val exact = TextDedup.exactDedup(docs, "pk", "body")
    assert(exact.columns.toSeq === Seq("pk", "fingerprint", "canonical_id", "is_dup"))
    assert(exact.count() === 500)
    val pairs = TextDedup.minhashLsh(docs, "pk", "body", threshold = 0.5)
    assert(pairs.columns.toSeq === Seq("doc_a", "doc_b", "est_jaccard"))
    assert(pairs.count() > 0)
    val jac = TextDedup.ngramJaccard(docs, "pk", "body", n = 3, threshold = 0.8)
    jac.collect().foreach(r => assert(r.getAs[Double]("jaccard") >= 0.8))
  }

  test("VectorSearch handles arbitrary id/vector column names and k") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("pk"), col("embedding").as("v"))
    val top3 = VectorSearch.cosineTopK(spark, vecs,
      vecs.filter(col("pk") < 3), "pk", "v", k = 3)
    assert(top3.columns.toSeq === Seq("query_id", "vec_id", "cos_sim", "rank"))
    assert(top3.count() === 9)
    assert(top3.groupBy("query_id").count().filter(col("count") =!= 3).count() === 0)
    val ivf = VectorSearch.ivfTopK(spark, vecs, vecs.filter(col("pk") < 3),
      vecs.filter(col("pk") >= 20 && col("pk") < 28), "pk", "v", k = 3, nprobe = 2)
    assert(ivf.groupBy("query_id").count().filter(col("count") > 3).count() === 0)
  }

  test("pickCanonical / histogram / kmeans handle arbitrary column names") {
    import graft.ops.TextAnalysis
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("pk"), col("text").as("body"),
        col("n_chars").as("weight"))
    val reps = TextDedup.pickCanonical(docs, "pk", "body", "weight")
    assert(reps.columns.toSeq === Seq("fingerprint", "rep_id", "rep_quality", "n_docs"))
    // every group's representative carries its max quality
    assert(reps.filter(col("rep_quality").isNull).count() === 0)
    assert(reps.agg(sum("n_docs")).head().getLong(0) === docs.count())

    val hist = TextAnalysis.histogram(docs, "weight", 50L)
    assert(hist.columns.toSeq === Seq("bucket_lo", "n_docs"))
    assert(hist.agg(sum("n_docs")).head().getLong(0) === docs.count())

    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("pk"), col("embedding").as("v"))
    val cents = VectorSearch.kmeansCentroids(spark, vecs, "pk", "v", k = 4, iters = 2)
    assert(cents.columns.toSeq === Seq("cid", "centroid", "n_members"))
    assert(cents.count() <= 4)
  }

  test("jdbc option plumbing: routing, partitioned-read options, and guards") {
    val plain = Tables.jdbcOptions("jdbc:mysql://wh:3306/transportation", "lineitem")
    assert(plain("url") === "jdbc:mysql://wh:3306/transportation")
    assert(plain("dbtable") === "lineitem")
    assert(!plain.contains("partitionColumn"))
    val part = Tables.jdbcOptions("jdbc:mysql://wh:3306/transportation", "lineitem",
      options = Map("fetchsize" -> "10000"),
      partitionColumn = Some("l_orderkey"), bounds = Some((1L, 600000L)),
      numPartitions = 16)
    assert(part("partitionColumn") === "l_orderkey")
    assert(part("lowerBound") === "1" && part("upperBound") === "600000")
    assert(part("numPartitions") === "16")
    assert(part("fetchsize") === "10000")
    intercept[IllegalArgumentException] {
      Tables.jdbcOptions("not-a-url", "t")
    }
    intercept[IllegalArgumentException] {
      Tables.jdbcOptions("jdbc:mysql://wh/db", "t", partitionColumn = Some("id"))
    }
    // dir-based routing picks the JDBC branch for jdbc: dirs (no database
    // in this sandbox, so resolution must fail INSIDE the jdbc source —
    // not by trying to read a parquet file named "jdbc:...")
    val ex = intercept[Throwable] {
      Tables.read(spark, "jdbc:mysql://nowhere:3306/db", "lineitem")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(!causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("parquet")))
  }

  test("connectedComponents labels each node with the component min id") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), triangle
    // 10-11-12, isolated pair (20,21); node 4 only appears as a right id.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("a", "b")
    val cc = graft.ops.Clusters.connectedComponents(pairs, "a", "b")
    assert(cc.columns.toSeq === Seq("id", "cluster_id", "n_members"))
    val got = cc.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> (1L, 4L), 2L -> (1L, 4L), 3L -> (1L, 4L), 4L -> (1L, 4L),
      10L -> (10L, 3L), 11L -> (10L, 3L), 12L -> (10L, 3L),
      20L -> (20L, 2L), 21L -> (20L, 2L)))
  }

  test("connectedComponents pointer jumping: 1024-node path converges in O(log n) rounds") {
    import spark.implicits._
    // Plain min-label propagation needs ~1023 rounds on this graph; the
    // pointer-jumped variant doubles the known-minimum radius per round,
    // so 14 rounds must suffice (2^t growth ⇒ ~10 propagation rounds plus
    // the verification round, detected on a checkEvery=2 boundary).
    val path = (0L until 1023L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = graft.ops.Clusters.connectedComponents(path, "a", "b", maxIters = 14,
      localEdgeThreshold = 0L) // force the distributed loop

    val labels = cc.select("cluster_id").distinct().collect().map(_.getLong(0))
    assert(labels.toSeq === Seq(0L))
    assert(cc.count() === 1024L)
    assert(cc.select("n_members").distinct().collect().map(_.getLong(0)).toSeq === Seq(1024L))
  }

  test("connectedComponents throws instead of returning unconverged labels") {
    import spark.implicits._
    val path = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Clusters.connectedComponents(path, "a", "b", maxIters = 2,
        localEdgeThreshold = 0L)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("thresholds actually gate the pair sets") {
    val docs = Tables.documents(spark, sf)
    val loose = TextDedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5).count()
    val tight = TextDedup.minhashLsh(docs, "doc_id", "text", threshold = 0.9).count()
    assert(tight <= loose)
  }

  test("zValue interleaves bits; z-ordered files cover narrow ranges of BOTH dims") {
    import org.apache.spark.sql.functions._
    // bit-spec ground truth: (a=5, b=3) → a bits at even, b at odd positions
    val z = spark.range(1).select(
      graft.ops.Layout.zValue(lit(5), lit(3)).as("z")).head().getLong(0)
    assert(z == ((1L << 0) | (1L << 4)      // a = 101b → bits 0, 4
               | (1L << 1) | (1L << 3)))    // b =  11b → bits 1, 3
    val out = "/root/repo/target/test/zo_layout"
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey", "l_extendedprice")
    graft.ops.Layout.zorderWrite(li, "l_partkey", "l_suppkey", out, nFiles = 8)
    val files = graft.ops.Maintenance.dataFiles(spark, out).map(_._1)
    assert(files.size > 1, "need multiple files to demonstrate pruning")
    val Seq(pLo, pHi, sLo, sHi) = li.agg(
      min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .head().toSeq.map(_.toString.toLong)
    // Every file must span strictly less than the full domain in BOTH
    // clustered dims — a single-column sort would leave the other dim's
    // span at ~100% per file; the z-curve bounds both. (Generous 75%
    // bound: the top z-range file legitimately spans the widest quads.)
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
      val ps = (r.getLong(1) - r.getLong(0)).toDouble / math.max(1L, pHi - pLo)
      val ss = (r.getLong(3) - r.getLong(2)).toDouble / math.max(1L, sHi - sLo)
      (ps, ss)
    }
    assert(spans.forall { case (ps, ss) => ps < 0.75 || ss < 0.75 },
      s"some file spans ~the full domain in both dims: $spans")
    // and the box predicate used by zo1 prunes: some file's stats fall
    // fully outside a quadrant box, so footer min/max skip it
    val boxPHi = pLo + (pHi - pLo) / 4; val boxSHi = sLo + (sHi - sLo) / 4
    val overlapping = spans.zip(files).count { case (_, f) =>
      val r = spark.read.parquet(f).agg(
        min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
      r.getLong(0) <= boxPHi && r.getLong(2) <= boxSHi
    }
    assert(overlapping < files.size,
      "quadrant box should be prunable against at least one file's stats")
  }

  test("compact rewrites many small files into few without losing rows") {
    val frag = "/root/repo/target/test/cp_frag"
    val out = "/root/repo/target/test/cp_out"
    val orders = Tables.orders(spark, sf)
    orders.repartition(16).write.mode("overwrite").parquet(frag)
    val before = graft.ops.Maintenance.dataFiles(spark, frag)
    assert(before.size == 16)
    val compacted = graft.ops.Maintenance.compact(spark, frag, out,
      targetBytes = 64L * 1024 * 1024)
    val after = graft.ops.Maintenance.dataFiles(spark, out)
    assert(after.size < before.size)
    assert(after.map(_._2).sum > 0)
    assert(compacted.count() == orders.count())
  }

  test("scalar-quantized ranking tracks exact cosine ranking (recall@10)") {
    import org.apache.spark.sql.functions.col
    val corpus = Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 10)
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(VectorSearch.cosineTopK(spark, corpus, queries,
      "vec_id", "embedding", 10).select("query_id", "vec_id"))
    val quant = topSets(VectorSearch.scalarQuantTopK(spark, corpus, queries,
      "vec_id", "embedding", 10).select("query_id", "vec_id"))
    assert(exact.keySet == quant.keySet)
    val recalls = exact.map { case (q, s) => (quant(q) & s).size.toDouble / s.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, s"int8 quantization lost too much ranking fidelity: $avg")
  }

  test("funnel: subsequence-in-order semantics, tie order, cumulative counts") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // u1 completes in order; u2 has the steps OUT of order (purchase
    // before click) → stage 1 only... except a later click+purchase
    // would re-qualify — none here; u3 stops at click; u4 never views
    // (stage 0, not in any count); u5 has click/purchase at the SAME
    // timestamp as its view — event_id breaks the tie, in order
    val ev = Seq(
      (1L, t(10), 100L, "view"), (1L, t(20), 101L, "click"), (1L, t(30), 102L, "purchase"),
      (2L, t(10), 200L, "view"), (2L, t(20), 201L, "purchase"), (2L, t(30), 202L, "click"),
      (3L, t(10), 300L, "view"), (3L, t(20), 301L, "click"),
      (4L, t(10), 400L, "click"), (4L, t(20), 401L, "purchase"),
      (5L, t(10), 500L, "view"), (5L, t(10), 501L, "click"), (5L, t(10), 502L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val steps = Seq("view", "click", "purchase")
    val stages = graft.ops.Funnel.funnelStages(ev, "user_id", "ts", "event_id", "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // u2: purchase precedes click, so the purchase can't count — but the
    // later click still advances it to stage 2
    assert(stages === Map(1L -> 3, 2L -> 2, 3L -> 2, 4L -> 0, 5L -> 3))
    val counts = graft.ops.Funnel.funnelCounts(ev, "user_id", "ts", "event_id", "event_type", steps)
      .orderBy("stage").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(counts === Array((1, "view", 4L), (2, "click", 4L), (3, "purchase", 2L)))
    // counts are monotone non-increasing by construction of the cumsum
    assert(counts.map(_._3).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("DataQuality: each rule type counts its planted violations exactly") {
    import spark.implicits._
    import graft.ops.DataQuality._
    val t = Seq(
      (Some(1L), "ok", 10.0), (Some(2L), "ok", -5.0), // one range violation
      (None, "ok", 1.0),                              // one null violation
      (Some(4L), "BAD", 2.0),                         // one set violation
      (Some(4L), "ok", 3.0))                          // dup key with previous
      .toDF("k", "status", "v")
    val rows = rowExpectations(t, Seq(
      "k_not_null" -> col("k").isNull,
      "status_in_set" -> !col("status").isin("ok"),
      "v_positive" -> (col("v") <= 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rows === Map(
      "k_not_null" -> ((1L, 5L, false)),
      "status_in_set" -> ((1L, 5L, false)),
      "v_positive" -> ((1L, 5L, false))))
    val uk = uniqueKey(t.filter(col("k").isNotNull), "k_unique", Seq("k")).head()
    assert(uk.getLong(1) === 1L && !uk.getBoolean(3)) // one extra row on key 4
    // RI: child 99 has no parent; NULL child key is an orphan too
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(99L), None).toDF("fk")
    val ri = referential(child, "fk", parent, "pk", "fk_in_parent").head()
    assert(ri.getLong(1) === 2L && ri.getLong(2) === 3L && !ri.getBoolean(3))
    // an all-clean table reports pass across the board
    val clean = report(rowExpectations(parent, Seq("pk_not_null" -> col("pk").isNull)),
      uniqueKey(parent, "pk_unique", Seq("pk")))
    assert(clean.collect().forall(_.getBoolean(3)))
    // profile: nulls counted, distinct excludes them, mean over non-nulls
    val prof = profile(Seq((Some(2.0), "b"), (None, "a"), (Some(4.0), "a"))
        .toDF("x", "s"), numericCols = Seq("x"), stringCols = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val px = prof("x")
    assert(px.getLong(1) === 3L && px.getLong(2) === 1L && px.getLong(3) === 2L)
    assert(px.getDouble(4) === 2.0 && px.getDouble(5) === 4.0 && px.getDouble(6) === 3.0)
    val ps = prof("s")
    assert(ps.getLong(2) === 0L && ps.getLong(3) === 2L &&
      ps.getString(7) === "a" && ps.getString(8) === "b")
  }

  test("rfmSegments: balanced quintiles, 5 = best, deterministic under repartition") {
    import spark.implicits._
    import java.sql.Timestamp
    // 10 users: user u is last active on day u, has u events of value u
    // each — so every metric's ranking is the identity and quintiles
    // split 2/2/2/2/2 with u10,u9 scoring 5 on every axis
    val ev = (1 to 10).flatMap(u => (1 to u).map(_ =>
      (u.toLong, Timestamp.valueOf(f"2024-01-$u%02d 12:00:00"), u.toDouble)))
      .toDF("user_id", "ts", "value")
    val out = graft.ops.Funnel.rfmSegments(ev, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    (1 to 10).foreach { u =>
      val (rec, freq, mon, r, f, m) = out(u.toLong)
      assert(rec === 10 - u && freq === u.toLong && mon === (u * u).toDouble)
      val expect = (u + 1) / 2 // u=10,9 → 5; u=2,1 → 1
      assert(r === expect && f === expect && m === expect,
        s"user $u scored ($r,$f,$m), expected $expect on all axes")
    }
    // repartitioning must not move any quintile edge (total-order ntile)
    val again = graft.ops.Funnel.rfmSegments(ev.repartition(7), "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(again === out.map { case (k, v) => k -> s"${v._4}${v._5}${v._6}" })
  }

  test("cohortRetention: Monday-truncated cohorts, offset cells, distinct users") {
    import spark.implicits._
    import java.sql.Timestamp
    // 2024-01-01 is a Monday. u1,u2 cohort week 0; u3 cohorts week 1.
    // u1 active weeks 0,1,3 (two events in week 1 count once);
    // u2 active week 0 only; u3 active weeks 1,2 (its offsets 0,1).
    def t(day: Int, hour: Int = 12) =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00")
    val ev = Seq(
      (1L, t(0)), (1L, t(7)), (1L, t(8)), (1L, t(22)),
      (2L, t(2)),
      (3L, t(9)), (3L, t(15)))
      .toDF("user_id", "ts")
    val out = graft.ops.Funnel.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_week_us", "week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    val w1 = Timestamp.valueOf("2024-01-08 00:00:00").getTime * 1000L
    assert(out === Array(
      (w0, 0L, 2L), // u1 + u2 in their cohort week
      (w0, 1L, 1L), // u1 (the two week-1 events deduped)
      (w0, 3L, 1L), // u1
      (w1, 0L, 1L), // u3 cohort week
      (w1, 1L, 1L))) // u3
  }

  test("pqTopK: exact-integer ADC ranking with useful recall@10 vs exact L2") {
    import org.apache.spark.sql.functions.col
    val corpus = Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 10)
    val seeds = corpus.filter(col("vec_id") >= 40 && col("vec_id") < 72)
    val pq = VectorSearch.pqTopK(spark, corpus, queries, seeds,
      "vec_id", "embedding", k = 10, nSub = 16)
    val rows = pq.collect()
    // every query returns exactly k candidates with non-negative
    // integer distances and dense ranks
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 10))
    assert(rows.forall(r => r.getLong(2) >= 0L && r.getInt(3) >= 1 && r.getInt(3) <= 10))
    // PQ's ADC approximates L2, so the honest baseline is exact L2 (the
    // PQ paper's metric), computed brute-force here on the raw floats
    val all = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    val exact = all.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .sortBy(c => (l2(qv, c._2), c._1)).take(10).map(_._1).toSet
    }.toMap
    val got = rows.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exact.keySet == got.keySet)
    // a 16×32 codebook of random seeds on a near-uniform synthetic
    // corpus measures 0.42 here; chance overlap on 500 vectors is 0.02.
    // Real (clustered) embeddings and learned codebooks score far
    // higher — this pins "the machinery ranks, and far above chance"
    val recalls = exact.map { case (q, s) => (got(q) & s).size.toDouble / s.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.3, s"PQ ADC ranking degraded: recall@10 vs exact L2 = $avg")
  }

  test("pqTopK fails fast on an empty or all-zero corpus instead of NPEing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 2)
    val empty = Tables.embeddings(spark, sf).filter(col("vec_id") < 0)
    val exEmpty = intercept[IllegalArgumentException] {
      VectorSearch.pqTopK(spark, empty, queries, queries, "vec_id", "embedding")
    }
    assert(exEmpty.getMessage.contains("empty or all-zero"))
    // all-zero vectors: amax = 0, the quantize divisor would be 0
    val zeros = Seq((1L, Array.fill(64)(0.0f)), (2L, Array.fill(64)(0.0f)))
      .toDF("vec_id", "embedding")
    val exZero = intercept[IllegalArgumentException] {
      VectorSearch.pqTopK(spark, zeros, zeros, zeros, "vec_id", "embedding")
    }
    assert(exZero.getMessage.contains("empty or all-zero"))
  }

  test("DataQuality.profile rejects overlapping or duplicated column lists") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("n", "s")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.DataQuality.profile(df, Seq("n"), Seq("n", "s"))
    }
    assert(ex.getMessage.contains("disjoint"))
    val ex2 = intercept[IllegalArgumentException] {
      graft.ops.DataQuality.profile(df, Seq("n", "n"), Seq("s"))
    }
    assert(ex2.getMessage.contains("disjoint"))
  }

  test("rpTopK: projected-space ranking tracks exact cosine well above chance") {
    import org.apache.spark.sql.functions.col
    // sf0.001's ~50 vectors make chance overlap ~0.2 — measure on the
    // 500-vector corpus where chance is 0.02 and the floor has teeth
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = corpus.filter(col("vec_id") < 10)
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(VectorSearch.cosineTopK(spark, corpus, queries,
      "vec_id", "embedding", 10).select("query_id", "vec_id"))
    val rp = topSets(VectorSearch.rpTopK(spark, corpus, queries,
      "vec_id", "embedding", 10, dims = 16, oracleDim = 64)
      .select("query_id", "vec_id"))
    assert(exact.keySet == rp.keySet)
    // 16/64 dims on this NEAR-UNIFORM synthetic corpus measures 0.19 —
    // JL distortion (~1/sqrt(16)) swamps the tiny cosine spread random
    // data has, which is exactly why the Scaladoc sizes dims by data
    // geometry; chance overlap on 500 vectors is 0.02, so 0.12 pins
    // "the projection preserves ranking signal, 6x above chance"
    val recalls = exact.map { case (q, s) => (rp(q) & s).size.toDouble / s.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.12, s"random projection lost the ranking: recall@10 = $avg")
  }

  test("mmrDiversify: picks from pool, no repeats, strictly more diverse than plain top-k") {
    import org.apache.spark.sql.functions.col
    val corpus = Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 10)
    val picks = VectorSearch.mmrDiversify(spark, corpus, queries,
      "vec_id", "embedding", poolK = 20, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byQ = picks.groupBy(_._1)
    assert(byQ.forall(_._2.length == 5) && byQ.size == 10)
    byQ.values.foreach { ps =>
      assert(ps.map(_._2).distinct.length == 5, "a pick repeated")
      assert(ps.map(_._3).sorted.toSeq == (1 to 5), "pick orders not dense")
    }
    // diversity law: the MMR set's mean pairwise cosine must not exceed
    // the plain top-5's (greedy redundancy penalty must bite somewhere)
    val all = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def meanPair(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- ids.indices if j > i)
        yield cos(all(ids(i)), all(ids(j)))
      ps.sum / ps.size
    }
    val top5 = VectorSearch.cosineTopK(spark, corpus, queries,
      "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, v) => q -> v.map(_._2).toSeq }
    val mmrMean = byQ.map { case (q, v) => meanPair(v.map(_._2).toSeq) }.sum / 10
    val topMean = top5.map { case (_, v) => meanPair(v) }.sum / 10
    assert(mmrMean <= topMean + 1e-12,
      s"MMR did not diversify: mean pairwise cos $mmrMean vs top-k $topMean")
  }

  test("rerankTopK: results come from the shortlist, scored exactly, near-perfect recall") {
    import org.apache.spark.sql.functions.col
    val corpus = Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 10)
    val fused = VectorSearch.rerankTopK(spark, corpus, queries,
      "vec_id", "embedding", k = 10, shortlist = 50).collect()
    // stage-1 rank is within the shortlist depth, final rank within k
    assert(fused.forall(r => r.getInt(2) <= 50 && r.getInt(4) <= 10))
    // the re-rank scores equal the brute-force exact cosine for the
    // same pairs (stage 2 is sim1's arithmetic, not an approximation)
    val exact = VectorSearch.cosineTopK(spark, corpus, queries,
        "vec_id", "embedding", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val agree = fused.count { r =>
      exact.get((r.getLong(0), r.getLong(1)))
        .exists(_ === r.getDouble(3))
    }
    // a 50-deep int8 shortlist should recover (essentially) all of the
    // exact top-10 — allow one borderline miss across the 100 rows
    assert(agree >= fused.length - 1,
      s"two-stage recall vs exact top-10: $agree/${fused.length}")
  }

  test("semanticDedup: keeps cluster-lowest representatives, prunes their t-neighbors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two well-separated directions; near-dups planted along each
    def v(base: Array[Double], eps: Double, at: Int): Seq[Float] =
      base.zipWithIndex.map { case (x, i) =>
        (if (i == at) x + eps else x).toFloat }.toSeq
    val d1 = Array(1.0, 0.0, 0.0, 0.0)
    val d2 = Array(0.0, 1.0, 0.0, 0.0)
    val vecs = Seq(
      (1L, v(d1, 0, 0)),        // centroid-ish, cluster 1 canonical
      (2L, v(d1, 0.01, 1)),     // near-dup of 1 → pruned
      (3L, v(d1, 0.02, 2)),     // near-dup of 1 and 2 → pruned
      (10L, v(d2, 0, 0)),       // cluster 2 canonical
      (11L, v(d2, 0.01, 2)),    // near-dup of 10 → pruned
      (20L, Seq(0.5f, -0.5f, 0.5f, -0.5f)) // off both clusters, alone
    ).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id").isin(1L, 10L))
    val out = VectorSearch.semanticDedup(spark, vecs, cents,
      "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) === ((1L, 0L, true)))
    assert(out(2L) === ((1L, 1L, false)))
    assert(out(3L) === ((1L, 2L, false)), "sees both lower-id neighbors")
    assert(out(10L) === ((10L, 0L, true)))
    assert(out(11L) === ((10L, 1L, false)))
    // the outlier joins SOME cluster but has no t-neighbor there
    assert(out(20L)._2 === 0L && out(20L)._3)
    assert(out.size === 6)
  }

  test("semanticDedup prunes nothing across cluster boundaries") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val cents = emb.filter(col("vec_id") >= 20 && col("vec_id") < 36)
    val out = VectorSearch.semanticDedup(spark, emb, cents,
      "vec_id", "embedding", threshold = 0.4)
    assert(out.count() === emb.count())
    // survivors + pruned partition the corpus; every cluster keeps at
    // least its lowest member (which can have no lower-id neighbor)
    val perCluster = out.groupBy("cid")
      .agg(org.apache.spark.sql.functions.min("vec_id").as("lo"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("keep"), 0).otherwise(1)).as("pruned"))
      .collect()
    val kept = out.filter(col("keep")).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    perCluster.foreach(r => assert(kept.contains(r.getLong(1)),
      s"cluster ${r.getLong(0)} lost its lowest member"))
  }
}
