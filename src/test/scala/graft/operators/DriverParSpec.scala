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

  test("the first failure CANCELS queued tasks and quiesces running " +
    "ones before control returns — a retrying caller never races " +
    "attempt-1 threads") {
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val finished = new java.util.concurrent.atomic.AtomicInteger(0)
    intercept[IllegalStateException] {
      DriverPar.map(1 to 1000, maxThreads = 2) { i =>
        started.incrementAndGet()
        if (i == 1) { Thread.sleep(30); throw new IllegalStateException("x") }
        Thread.sleep(5)
        finished.incrementAndGet()
      }
    }
    // queued work must not keep mutating after the rethrow: with 2
    // threads and a failure ~30ms in, virtually all of the 1000 items
    // must have been cancelled un-started
    assert(started.get() < 100,
      s"queued tasks kept starting after the failure: ${started.get()}")
    // and everything that DID start has finished — no background
    // thread is still running when the caller regains control
    assert(finished.get() == started.get() - 1,
      "control returned while a started task was still running")
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
