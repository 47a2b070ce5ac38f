package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The driver-side parallel-I/O helper backs partition swaps,
  * retention sweeps and per-dir compaction jobs — its contract
  * (input-order results, original-exception propagation, genuine
  * concurrency, bounded pool) is what those call sites rely on. */
class DriverParSpec extends AnyFunSuite {

  test("results come back in input order") {
    val in = (1 to 200).toVector
    val out = DriverPar.map(in) { i =>
      Thread.sleep(if (i % 7 == 0) 3 else 0) // jitter the finish order
      i * 2
    }
    assert(out == in.map(_ * 2))
  }

  test("the first failure propagates as the ORIGINAL exception") {
    val boom = intercept[IllegalStateException] {
      DriverPar.map(1 to 50) { i =>
        if (i == 13) throw new IllegalStateException("boom-13")
        i
      }
    }
    assert(boom.getMessage == "boom-13") // not ExecutionException
  }

  test("empty and single-item inputs run inline on the caller thread") {
    val caller = Thread.currentThread()
    assert(DriverPar.map(Seq.empty[Int])(identity).isEmpty)
    var ran: Thread = null
    DriverPar.foreach(Seq(1)) { _ => ran = Thread.currentThread() }
    assert(ran eq caller)
  }

  test("work genuinely overlaps across threads") {
    // two tasks that each block until the OTHER has started can only
    // both finish if they run concurrently
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val out = DriverPar.map(Seq(1, 2), maxThreads = 2) { i =>
      gate.await(5, java.util.concurrent.TimeUnit.SECONDS); i
    }
    assert(out == Seq(1, 2))
  }

  test("pool is bounded by maxThreads") {
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    DriverPar.foreach(1 to 64, maxThreads = 4) { _ =>
      val now = active.incrementAndGet()
      peak.updateAndGet(p => math.max(p, now))
      Thread.sleep(2)
      active.decrementAndGet()
    }
    assert(peak.get() <= 4)
  }
}
