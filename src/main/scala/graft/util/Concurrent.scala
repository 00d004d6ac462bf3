package graft.util

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Overlap INDEPENDENT Spark actions from one driver (optimization
  * guide §2.6): Spark's scheduler runs several jobs at once inside one
  * application — actions are only sequential because the driver calls
  * them sequentially. A query that must price N independent read-only
  * jobs over the same inputs (e.g. a recall matrix probing one store
  * under several configurations) can submit them from a small thread
  * pool so one job's straggler tail back-fills with the next job's
  * tasks, WITHOUT fusing the jobs' plans — each still exercises
  * exactly the production path it gates, and computes exactly the
  * value it would have computed serially.
  *
  * Use ONLY for actions with no data or ordering dependency between
  * them (pure reads of already-folded state). Writers, folds and
  * anything with an epoch contract stay serial.
  */
object Concurrent {

  /** Run every thunk as its own concurrent Spark action; results
    * return in INPUT order. The first failure is rethrown with its
    * original exception after the pool is torn down (queued thunks
    * cancelled, running ones interrupted) — same loud-failure contract
    * as the serial spelling. Pool threads are created by the
    * submitting thread, so Spark's InheritableThreadLocal job
    * description/group propagate to every job.
    */
  def all[A](thunks: Seq[() => A], maxThreads: Int = 6): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(_())
    val pool = Executors.newFixedThreadPool(thunks.size.min(maxThreads))
    try {
      val futures = thunks.map { t =>
        pool.submit(new Callable[A] { def call(): A = t() })
      }
      futures.map { f =>
        try f.get()
        catch { case e: ExecutionException => throw e.getCause }
      }
    } finally pool.shutdownNow()
  }
}
