package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.CountDownLatch

/** [[PhaseClock]]'s concurrency/epoch semantics, pinned without Spark:
  * the clock is the instrument every lifecycle bench split rests on,
  * so its failure modes (stale brackets billing the next query,
  * suppressed concurrent primitives, label attribution) are unit-gated
  * here rather than inferred from bench artifacts. */
class PhaseClockSpec extends AnyFunSuite {

  private def spin(ms: Long): Unit = {
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < ms * 1000000L) {}
  }

  test("outermost brackets accumulate; nested brackets are suppressed " +
    "but still counted and labeled") {
    PhaseClock.reset()
    PhaseClock.batchAt("/store/outer") {
      spin(20)
      PhaseClock.batchAt("/store/inner") { spin(10) }
    }
    assert(PhaseClock.batchSeconds >= 0.020,
      "outer bracket's full interval must land in the batch accumulator")
    assert(PhaseClock.suppressedBrackets === 1,
      "the nested bracket must be counted as suppressed")
    val labels = PhaseClock.labeledSeconds
    assert(labels.keySet === Set("/store/outer", "/store/inner"),
      "both roots must be attributed even though only one was outermost")
    assert(labels("/store/inner") >= 0.010 &&
      labels("/store/inner") <= labels("/store/outer"),
      "nested label time is its own interval, bounded by the outer's")
  }

  test("seed and batch accumulate independently; reset zeroes " +
    "accumulators, labels, and the suppression counter") {
    PhaseClock.reset()
    PhaseClock.seedAt("/s") { spin(5) }
    PhaseClock.batch { spin(5) }
    assert(PhaseClock.seedSeconds >= 0.005 && PhaseClock.batchSeconds >= 0.005)
    assert(PhaseClock.labeledSeconds.keySet === Set("/s"))
    PhaseClock.reset()
    assert(PhaseClock.seedSeconds === 0.0)
    assert(PhaseClock.batchSeconds === 0.0)
    assert(PhaseClock.labeledSeconds.isEmpty)
    assert(PhaseClock.suppressedBrackets === 0)
  }

  test("a bracket straddling a reset discards its interval, flags the " +
    "busy reset, and cannot suppress the next epoch's outermost timing") {
    PhaseClock.reset()
    val inBody = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val t = new Thread(() => {
      PhaseClock.batchAt("/stale") {
        inBody.countDown()
        release.await()
        spin(30)
      }
    })
    t.start()
    inBody.await()
    val busyBefore = PhaseClock.resetWhileBusy
    PhaseClock.reset() // the stale bracket is still open
    assert(PhaseClock.resetWhileBusy === busyBefore + 1,
      "a reset under an open bracket must be flagged")
    // the NEW epoch's outermost bracket must record even though the
    // stale one has not exited yet (old-epoch depth was zeroed)
    PhaseClock.batchAt("/fresh") { spin(10) }
    assert(PhaseClock.batchSeconds >= 0.010,
      "stale bracket must not suppress the new epoch's outermost timing")
    release.countDown()
    t.join()
    // the stale bracket exited AFTER the reset: its 30 ms must not be
    // billed to this epoch's accumulator or labels
    assert(PhaseClock.batchSeconds < 0.030,
      "stale bracket's interval leaked into the new epoch")
    assert(!PhaseClock.labeledSeconds.contains("/stale"),
      "stale bracket's label leaked into the new epoch")
    assert(PhaseClock.labeledSeconds.contains("/fresh"))
  }

  test("two concurrent top-level primitives: one records, the other is " +
    "suppressed — and the counter makes the undercount observable") {
    PhaseClock.reset()
    val bothIn = new CountDownLatch(2)
    val release = new CountDownLatch(1)
    def worker(root: String) = new Thread(() => {
      PhaseClock.batchAt(root) {
        bothIn.countDown(); release.await(); spin(10)
      }
    })
    val w1 = worker("/r1"); val w2 = worker("/r2")
    w1.start(); w2.start()
    bothIn.await(); release.countDown()
    w1.join(); w2.join()
    assert(PhaseClock.suppressedBrackets === 1,
      "exactly one of the two racing top-level brackets is suppressed")
    // attribution still covers BOTH roots — the labels are the recovery
    // path when the global split undercounts
    assert(PhaseClock.labeledSeconds.keySet === Set("/r1", "/r2"))
  }
}
