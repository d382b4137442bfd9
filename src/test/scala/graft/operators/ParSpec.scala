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

  test("deferred: tasks start before join; join blocks until all done and rethrows") {
    val done = new java.util.concurrent.atomic.AtomicInteger
    val started = new java.util.concurrent.CountDownLatch(1)
    val join = Par.deferred(Seq(
      () => { started.countDown(); Thread.sleep(50); done.incrementAndGet(); () },
      () => { Thread.sleep(30); done.incrementAndGet(); () }))
    // fork semantics: the first task begins without the join being called
    assert(started.await(2, java.util.concurrent.TimeUnit.SECONDS),
      "deferred tasks did not start until join — that's run(), not deferred()")
    join()
    assert(done.get() === 2, "join returned before every task completed")
    join() // idempotent: re-await of completed futures must not throw
    val failing = Par.deferred(Seq(
      () => throw new RuntimeException("append 3 failed")))
    val boom = intercept[RuntimeException](failing())
    assert(boom.getMessage === "append 3 failed")
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
