package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry of frames the operator pipelines cache
  * (persisted LSH/SimHash signature bases, checkpointed CC labels,
  * checkpointed salted join inputs). The cached blocks are what make
  * each pipeline single-scan (or retry-deterministic), and they survive
  * the caller's action on purpose — the SAME lazy result may be
  * consumed more than once. Caller contract for long-running processes:
  * call [[release]] once the results of a batch are consumed; one-shot
  * sessions can skip it (session teardown / `catalog.clearCache` covers
  * persists, and checkpoint blocks die with the executors).
  */
object FrameCaches {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.Queue[Dataset[_]]]()

  def track[T](ds: Dataset[T]): Dataset[T] = {
    registry.computeIfAbsent(ds.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]())
      .add(ds)
    ds
  }

  /** Free every frame tracked in this session — persisted bases AND
    * localCheckpoint block storage (which `unpersist` alone does not
    * release).
    */
  def release(spark: SparkSession): Unit = {
    val q = registry.remove(spark)
    if (q != null)
      q.forEach(ds => org.apache.spark.sql.GraftColumnBridge.freeStorage(ds))
  }

  /** Identity snapshot of the frames currently tracked — pair with
    * [[releaseSince]] for a SCOPED drain: a framework step (the silver
    * layer's per-transform cleanup) must free only the frames ITS work
    * tracked, not reach into caches owned by other in-flight callers of
    * the same session (whose localCheckpoint blocks cannot be
    * recomputed once freed).
    */
  def mark(spark: SparkSession): java.util.Set[Dataset[_]] = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Dataset[_], java.lang.Boolean]())
    val q = registry.get(spark)
    if (q != null) q.forEach(d => { s.add(d); () })
    s
  }

  /** Free (and untrack) only the frames tracked AFTER `marked` was
    * taken; everything in the snapshot stays live.
    */
  def releaseSince(spark: SparkSession, marked: java.util.Set[Dataset[_]]): Unit = {
    val q = registry.get(spark)
    if (q != null) {
      val it = q.iterator()
      while (it.hasNext) {
        val d = it.next()
        if (!marked.contains(d)) {
          it.remove()
          org.apache.spark.sql.GraftColumnBridge.freeStorage(d)
        }
      }
    }
  }
}
