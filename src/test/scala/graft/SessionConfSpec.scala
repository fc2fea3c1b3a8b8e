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
}
