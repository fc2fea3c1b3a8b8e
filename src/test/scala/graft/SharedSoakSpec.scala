package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.DataFrame

/** Round-11 ask #5: concurrency soak of [[graft.queries.Shared]]. Two
  * SparkSessions in one JVM (newSession twins off the suite context —
  * separate SQLConf/catalog, separate memo keys) run overlapping
  * Shared-backed battery subsets against DIFFERENT fixture dirs
  * concurrently, 20 iterations each with seeded per-iteration query
  * order. Pins the hazards the code comments document but nothing
  * exercised multi-threaded before:
  *  - session isolation: every iteration's rows equal the
  *    single-threaded baseline for that (session, dir) — a memo hit
  *    can never serve another session's (or dir's) frame;
  *  - no cross-eviction: both sessions' memo entries coexist for the
  *    whole soak, and entry counts stay FLAT after iteration 1 (no
  *    duplicate builds from computeIfAbsent races, no unbounded
  *    growth);
  *  - no ConcurrentHashMap recursive-update crash under contended
  *    first-build interleavings (the dependency rule in Shared's
  *    scaladoc — sim12 resolves its ivf/codebook memos in sequence
  *    while the other thread hammers the same maps).
  */
class SharedSoakSpec extends SparkSuite {

  private val ITERS = 20

  // Shared-backed subset: cube (frame memo), LSH pairs (frame),
  // span coverage (frame), learned IVF + IVF-PQ (obj + frame memos,
  // nested-dependency chain)
  private val SUBSET = Seq("j2_cube_view", "dd2_minhash_lsh",
    "dd12_span_coverage", "sim11_ivf_learned", "sim12_ivf_pq")

  private def norm(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("two sessions soak Shared concurrently without cross-talk (20 iterations)") {
    val dirA = "/root/testdata/sf0.001"
    val dirB = "/root/testdata/sf0.01"
    val sessA = spark.newSession()
    val sessB = spark.newSession()

    // single-threaded baselines, one per (session, dir) — computed on
    // the SUITE session so the soak sessions' first builds happen under
    // contention below
    val baseline: Map[(String, String), Seq[String]] =
      (for (d <- Seq(dirA, dirB); q <- SUBSET)
        yield (q, d) -> norm(SparkEntry.queries(q)(spark, d))).toMap

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    def soak(sess: org.apache.spark.sql.SparkSession, dir: String,
             seed: Long): Runnable = () => {
      try {
        start.await()
        val rng = new scala.util.Random(seed)
        var flatSince: Option[(Int, Int, Int)] = None
        for (it <- 1 to ITERS) {
          for (q <- rng.shuffle(SUBSET)) {
            val got = norm(SparkEntry.queries(q)(sess, dir))
            if (got != baseline((q, dir)))
              failures.add(s"$dir/$q iteration $it diverged from baseline")
          }
          val counts = graft.queries.Shared.memoCounts(sess)
          flatSince match {
            case None => flatSince = Some(counts)
            case Some(c0) => if (counts != c0)
              failures.add(s"$dir memo counts moved after first full " +
                s"iteration: $c0 -> $counts at iteration $it")
          }
        }
      } catch {
        case e: Throwable =>
          failures.add(s"$dir thread died: ${e.getClass.getName}: ${e.getMessage}")
      }
    }

    pool.submit(soak(sessA, dirA, seed = 1))
    pool.submit(soak(sessB, dirB, seed = 2))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(15, TimeUnit.MINUTES), "soak timed out")

    assert(failures.isEmpty, failures.toArray.mkString("\n"))
    // both sessions' entries still coexist — neither evicted the other
    val (fa, oa, _) = graft.queries.Shared.memoCounts(sessA)
    val (fb, ob, _) = graft.queries.Shared.memoCounts(sessB)
    assert(fa > 0 && oa > 0, s"session A lost its memo entries ($fa, $oa)")
    assert(fb > 0 && ob > 0, s"session B lost its memo entries ($fb, $ob)")
  }
}
