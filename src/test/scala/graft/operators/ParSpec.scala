package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Par]] — the concurrent-maintenance helper the lifecycle families
  * route their independent artifact tasks through (round-18
  * optimization). The semantics the callers rely on: EVERY task ran to
  * completion before run() returns, a failing task fails the composite
  * call (no silent half-maintained artifact set), and the degenerate
  * arities behave (empty = no-op, single = inline). */
class ParSpec extends AnyFunSuite {

  test("runs every task and blocks until all complete") {
    val done = new java.util.concurrent.atomic.AtomicInteger
    Par.run((1 to 7).map(i => () => {
      // stagger so completion order ≠ submission order
      Thread.sleep((7 - i) * 10L); done.incrementAndGet(); ()
    }))
    assert(done.get() === 7,
      "run() returned before every task completed")
  }

  test("a failing task fails the composite call") {
    val boom = intercept[RuntimeException] {
      Par.run(
        () => (),
        () => throw new RuntimeException("artifact 2 failed"),
        () => ())
    }
    assert(boom.getMessage === "artifact 2 failed")
  }

  test("empty and single-task arities: no pool, same semantics") {
    Par.run(Seq.empty) // no-op, must not throw
    var ran = false
    val t = Thread.currentThread()
    var inline = false
    Par.run(Seq(() => { ran = true; inline = Thread.currentThread() eq t }))
    assert(ran)
    assert(inline, "a single task should run on the calling thread")
  }
}
