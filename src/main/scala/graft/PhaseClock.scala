package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Wall-clock split of a maintained-store lifecycle query into its
  * SEED cost (the one-time initial publish of the stores) and its
  * steady-state PER-BATCH cost (the maintenance commits) — the
  * decomposition a 100 TB operator actually prices: a benchmark entry
  * that rehearses `seed + k batches + serve` in one number hides the
  * per-batch floor the production cadence pays, so [[Bench]] resets
  * this clock before each query and ships `seed_s` / `batch_s` beside
  * the total in BENCH_FULL.json ("serve" = total − seed − batch,
  * derivable). Zero for non-lifecycle queries, which never enter the
  * instrumented primitives.
  *
  * Instrumented choke points (every lifecycle gate routes through
  * them, so the GATES need no edits):
  *   - seed:  [[graft.etl.IncrementalAgg.publishInitialMulti]] /
  *            `publishInitialSeeds`, [[graft.ops.AnnIndexStore.publish]]
  *   - batch: [[graft.etl.IncrementalAgg.applyOnceMulti]] /
  *            `applyOnceFeeds` / `applyComposedMulti`,
  *            [[graft.etl.Coordinator.advanceMembers]],
  *            [[graft.ops.AnnIndexStore.appendEncode]] / `applyDeletes`
  *            / `compactSegments`
  *
  * Nesting counts wall-clock ONCE: [[graft.etl.Coordinator.advanceMembers]]
  * runs its members' `applyOnceMulti` CONCURRENTLY on pool threads, so
  * summing the members' own durations would overstate the batch by up
  * to |members|×; instead the outer call's interval is the batch time
  * and nested recordings are suppressed via a global depth counter.
  * A GLOBAL counter (not a ThreadLocal) on purpose: the nested calls
  * run on different threads than the outer one. That makes the clock
  * per-JVM-sequential — exactly [[Bench]]'s execution model (one query
  * at a time; a streaming gate's micro-batch thread is the only live
  * worker while the main thread blocks on the stream) — not a general
  * concurrent profiler, and it costs a few atomic ops per instrumented
  * call, noise against the multi-second commits it brackets.
  *
  * Robustness of that model, made observable instead of assumed:
  *   - EPOCHS: [[reset]] bumps an epoch stamped into every bracket at
  *     entry. A bracket still in flight across a reset (a streaming
  *     micro-batch commit outliving its query) finds the epoch moved
  *     at exit and DISCARDS its interval instead of billing it to the
  *     next query; reset also zeroes the depth unconditionally, so the
  *     stale bracket cannot suppress the next query's own outermost
  *     timing (its own exit under the old epoch is a no-op on the new
  *     epoch's depth). A reset under nonzero depth increments
  *     [[resetWhileBusy]] — the next query's artifact carries the
  *     violated-assumption flag rather than silently absorbing it.
  *   - SUPPRESSION COUNTER: every non-outermost bracket increments
  *     [[suppressedBrackets]]. Under the intended model the count is
  *     exactly the nested member commits; a SECOND independent
  *     top-level primitive racing the first (two stores driven from a
  *     gate's own threads) also lands here, so an undercounted
  *     seed/batch split is detectable from the counter instead of
  *     invisible.
  *   - PER-STORE ATTRIBUTION: store primitives stamp their ROOT as a
  *     label; labeled time accumulates per root even when the global
  *     bracket is suppressed (concurrent members therefore SUM to more
  *     than the wall-clock batch — that is the point: the global split
  *     answers "what does the batch cost", the labels answer "which
  *     store's commit dominates it", the attribution r19's o25 entry
  *     could not make). [[Bench]] ships the per-root map as `stores`
  *     beside `seed`/`batch` for lifecycle queries.
  */
object PhaseClock {
  private val seedNs = new AtomicLong(0)
  private val batchNs = new AtomicLong(0)
  // high 32 bits: epoch, low 32 bits: depth — one word so a reset
  // (epoch bump + depth zero) is atomic against concurrent enter/exit
  private val state = new AtomicLong(0)
  private val suppressed = new AtomicInteger(0)
  private val busyResets = new AtomicInteger(0)
  private val labeledNs = new ConcurrentHashMap[String, AtomicLong]()

  private def epochOf(s: Long): Int = (s >>> 32).toInt
  private def depthOf(s: Long): Int = (s & 0xffffffffL).toInt
  private def pack(e: Int, d: Int): Long = (e.toLong << 32) | (d & 0xffffffffL)

  /** Zero the accumulators and open a new epoch (between benchmark
    * queries). In-flight brackets from the old epoch discard their
    * intervals at exit; if any are still open, the event is counted
    * in [[resetWhileBusy]]. */
  def reset(): Unit = {
    var done = false
    while (!done) {
      val s = state.get()
      if (depthOf(s) != 0) busyResets.incrementAndGet()
      done = state.compareAndSet(s, pack(epochOf(s) + 1, 0))
    }
    seedNs.set(0); batchNs.set(0); suppressed.set(0)
    labeledNs.clear()
  }

  /** Seconds spent inside seed primitives since [[reset]]. */
  def seedSeconds: Double = seedNs.get() / 1e9

  /** Seconds spent inside batch primitives since [[reset]]. */
  def batchSeconds: Double = batchNs.get() / 1e9

  /** Per-store-root seconds since [[reset]] — recorded even for
    * suppressed (nested/concurrent) brackets, so concurrent members'
    * labels sum to ≥ the wall-clock accumulators. */
  def labeledSeconds: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    labeledNs.asScala.map { case (k, v) => k -> v.get() / 1e9 }.toMap
  }

  /** Brackets entered while another was already open since [[reset]] —
    * nested member commits under the intended model; anything beyond
    * them means two independent top-level primitives overlapped and
    * the seed/batch split undercounts. */
  def suppressedBrackets: Int = suppressed.get()

  /** Resets that found a bracket still open (cumulative, survives
    * reset by design — it flags the violated assumption itself). */
  def resetWhileBusy: Int = busyResets.get()

  private def timed[T](into: AtomicLong, label: String)(body: => T): T = {
    var entered = 0L
    var swapped = false
    while (!swapped) {
      entered = state.get()
      swapped = state.compareAndSet(entered,
        pack(epochOf(entered), depthOf(entered) + 1))
    }
    val epoch = epochOf(entered)
    val outermost = depthOf(entered) == 0
    if (!outermost) suppressed.incrementAndGet()
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = System.nanoTime() - t0
      // decrement depth only if our epoch is still live; record only
      // then too — a bracket that straddled a reset is a stale read
      // of a query that already reported
      var done = false
      var live = false
      while (!done) {
        val s = state.get()
        if (epochOf(s) != epoch) { live = false; done = true }
        else {
          live = true
          done = state.compareAndSet(s,
            pack(epoch, math.max(0, depthOf(s) - 1)))
        }
      }
      if (live) {
        if (outermost) into.addAndGet(dt)
        if (label != null)
          labeledNs.computeIfAbsent(label, _ => new AtomicLong).addAndGet(dt)
      }
      ()
    }
  }

  /** Bracket a SEED primitive (initial store publish). */
  def seed[T](body: => T): T = timed(seedNs, null)(body)

  /** [[seed]] with the store root as the attribution label. */
  def seedAt[T](root: String)(body: => T): T = timed(seedNs, root)(body)

  /** Bracket a BATCH primitive (one maintenance commit round). */
  def batch[T](body: => T): T = timed(batchNs, null)(body)

  /** [[batch]] with the store root as the attribution label. */
  def batchAt[T](root: String)(body: => T): T = timed(batchNs, root)(body)
}
