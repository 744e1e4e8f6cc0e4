package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GuardRefusal

/** The refused/failed split in bench records (round 19, r18 verdict
  * item 1): BENCH_100X.json listed d4_simhash_pairs' BY-DESIGN 2B-pair
  * guard trip under "failed", indistinguishable from a crash. The
  * record writer classifies via [[GuardRefusal]] — these pin the
  * classifier the writer keys on.
  */
class GuardRefusalSpec extends AnyFunSuite {

  test("check() throws GuardRefusal with the message, passes when ok") {
    GuardRefusal.check(cond = true, fail("message must stay unevaluated"))
    val e = intercept[GuardRefusal] {
      GuardRefusal.check(cond = false, "cap 2e9 exceeded")
    }
    assert(e.getMessage == "cap 2e9 exceeded")
  }

  test("a refusal is an IllegalArgumentException (PlanSpec contract)") {
    // the guard specs intercept IllegalArgumentException — the refined
    // type must not break that contract
    assert(intercept[IllegalArgumentException] {
      GuardRefusal.check(cond = false, "m")
    }.isInstanceOf[GuardRefusal])
  }

  test("the classifier finds a refusal anywhere in the cause chain") {
    val direct = new GuardRefusal("refused: cap")
    assert(GuardRefusal.unapply(direct).contains("refused: cap"))
    val wrapped = new RuntimeException("outer",
      new java.util.concurrent.ExecutionException(direct))
    assert(GuardRefusal.unapply(wrapped).contains("refused: cap"))
  }

  test("a real failure never classifies as a refusal") {
    assert(GuardRefusal.unapply(new IllegalArgumentException(
      "requirement failed: grid misconfigured")).isEmpty)
    assert(GuardRefusal.unapply(new RuntimeException("boom",
      new IllegalStateException("inner"))).isEmpty)
    // a cause CYCLE must not hang the classifier
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b)
    assert(GuardRefusal.unapply(a).isEmpty)
  }
}
