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
}
