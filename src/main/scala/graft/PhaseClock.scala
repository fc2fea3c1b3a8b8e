package graft

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
  *   - seed:  [[graft.etl.IncrementalAgg.publishInitialMulti]],
  *            [[graft.ops.AnnIndexStore.publish]]
  *   - batch: [[graft.etl.IncrementalAgg.applyOnceMulti]] /
  *            `applyComposedMulti`, [[graft.etl.Coordinator.advanceMembers]],
  *            [[graft.ops.AnnIndexStore.appendEncode]] / `applyDeletes` /
  *            `compactSegments`
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
  * concurrent profiler, and it costs two atomic ops per instrumented
  * call, noise against the multi-second commits it brackets. */
object PhaseClock {
  private val seedNs = new AtomicLong(0)
  private val batchNs = new AtomicLong(0)
  private val depth = new AtomicInteger(0)

  /** Zero both accumulators (between benchmark queries). */
  def reset(): Unit = { seedNs.set(0); batchNs.set(0) }

  /** Seconds spent inside seed primitives since [[reset]]. */
  def seedSeconds: Double = seedNs.get() / 1e9

  /** Seconds spent inside batch primitives since [[reset]]. */
  def batchSeconds: Double = batchNs.get() / 1e9

  private def timed[T](into: AtomicLong)(body: => T): T = {
    val outermost = depth.getAndIncrement() == 0
    val t0 = if (outermost) System.nanoTime() else 0L
    try body
    finally {
      if (outermost) into.addAndGet(System.nanoTime() - t0)
      depth.decrementAndGet()
      ()
    }
  }

  /** Bracket a SEED primitive (initial store publish). */
  def seed[T](body: => T): T = timed(seedNs)(body)

  /** Bracket a BATCH primitive (one maintenance commit round). */
  def batch[T](body: => T): T = timed(batchNs)(body)
}
