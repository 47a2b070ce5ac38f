package graft.operators

/** Bounded driver-side parallelism for independent metadata I/O —
  * partition-swap renames, retention-sweep deletes, per-partition
  * maintenance jobs. Each such operation is a handful of
  * namenode/object-store RPCs (or one small Spark job), so a serial
  * loop over 10k of them pays 10k round trips of pure latency on an
  * otherwise idle cluster; Spark's own task-commit protocol
  * parallelizes its renames the same way. Hadoop `FileSystem`
  * instances are thread-safe, and Spark supports concurrent job
  * submission from multiple driver threads (the multi-thread
  * one-session shape Verify uses).
  */
private[graft] object DriverPar {

  /** Apply `f` to every item on a pool of at most `maxThreads`
    * threads; results return in INPUT order and the first failure
    * propagates with its original exception. Single-item (and empty)
    * inputs run inline — no pool overhead on the common small case.
    *
    * Failure semantics matter for filesystem mutators: on the first
    * failure every QUEUED task is cancelled (it never starts), and
    * control does not return to the caller until the tasks already
    * RUNNING have finished — a caller that catches the error and
    * retries must never race attempt-1 threads still renaming or
    * deleting under it. */
  def map[A, B](items: Seq[A], maxThreads: Int = 32)(f: A => B): Seq[B] =
    if (items.sizeIs <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxThreads, items.size))
      try {
        val futures = items.map(a =>
          pool.submit(new java.util.concurrent.Callable[B] {
            def call(): B = f(a)
          }))
        try futures.map(_.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            // not-yet-started tasks must not keep mutating after the
            // caller regains control; running ones are left to finish
            // (no interrupt — a half-interrupted rename is worse)
            futures.foreach(_.cancel(false))
            throw e.getCause
        }
      } finally {
        pool.shutdown()
        // quiesce: wait out still-running tasks before returning on
        // the failure path (instant on success — everything is done)
        try pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
        catch {
          case _: InterruptedException => Thread.currentThread().interrupt()
        }
      }
    }

  def foreach[A](items: Seq[A], maxThreads: Int = 32)(f: A => Unit): Unit = {
    map(items, maxThreads)(f); ()
  }
}
