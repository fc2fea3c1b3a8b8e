package graft

import org.scalatest.funsuite.AnyFunSuite

/** SPARK_GRAFT_CONF parsing: the rehearsal knob must fail FAST and
  * NAMED on a malformed entry — a bare MatchError here used to kill a
  * whole verify/bench run with no hint which fragment was at fault. */
class SessionConfSpec extends AnyFunSuite {

  test("well-formed entries parse; whitespace and empty fragments are tolerated") {
    assert(SessionConf.parse("a=1;b=x=y; c.d =v;") ===
      Seq("a" -> "1", "b" -> "x=y", "c.d" -> "v"))
    assert(SessionConf.parse(";;") === Nil)
  }

  test("a malformed entry fails with a message naming it, not a MatchError") {
    val err = intercept[IllegalArgumentException] {
      SessionConf.parse("a=1;spark.foo")
    }
    assert(err.getMessage.contains("spark.foo"))
    val err2 = intercept[IllegalArgumentException] { SessionConf.parse("=v") }
    assert(err2.getMessage.contains("expected key=value"))
  }

  test("the tight-memory profile carries the SCALE.md density recipe as one flag") {
    val p = SessionConf.profile("tight-memory", "/mat/dir").toMap
    assert(p("spark.sql.shuffle.partitions") === "256")
    assert(p("spark.sql.adaptive.coalescePartitions.enabled") === "false")
    assert(p("spark.cleaner.periodicGC.interval") === "45s")
    assert(p("spark.hadoop.parquet.hadoop.vectored.io.enabled") === "false")
    assert(p("graft.materialize.dir") === "/mat/dir")
    // the deployment's real heap is deliberately NOT defaulted by the
    // profile (the local-cluster worker-capacity pitfall): it must come
    // from an explicit SPARK_GRAFT_CONF entry
    assert(!p.contains("spark.executor.memory"))
  }

  test("an unknown profile fails with a message naming it and the known set") {
    val err = intercept[IllegalArgumentException] {
      SessionConf.profile("tight-memroy", "/mat")
    }
    assert(err.getMessage.contains("tight-memroy"))
    assert(err.getMessage.contains("tight-memory"))
  }
}
