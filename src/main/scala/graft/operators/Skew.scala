package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (AQE's skew-join handles sort-merge cases adaptively; explicit
  * salting remains the tool when a handful of hot keys dominate a
  * shuffled join and you know it up front).
  *
  * Fact rows get a salt in [0, S) from their position
  * (`monotonically_increasing_id` mod S — round-robin within each input
  * partition), splitting each hot key across S reducers EVEN when the
  * hot rows are full duplicates (a content hash would send identical
  * rows to one bucket, re-creating the skew it was meant to break). The
  * (small) build side replicates ×S; results are identical to the
  * unsalted join because the salt only affects partitioning.
  *
  * Retry safety: a position-derived salt is only as deterministic as
  * the fact side's row order. Spark's stage-rollback-on-retry applies
  * ONLY to plans whose RDDs are marked INDETERMINATE (e.g. round-robin
  * `repartition`) — a `Project` over `monotonically_increasing_id` is
  * NOT so marked, so if the fact frame sits downstream of a shuffle, a
  * map task retried after a fetch failure can replay its rows in a
  * different order, assign a row a different salt, and route it to a
  * different (possibly already-finished) reducer — duplicating or
  * dropping join rows. Invisible on a single machine; routine at
  * cluster scale. So by default the salted fact is eagerly
  * `localCheckpoint`ed before the join: the salt assignment is
  * materialized once and its lineage CUT, making re-derivation
  * impossible — a lost block fails the job loudly instead of silently
  * corrupting the join. Cost: one extra materialization of the fact
  * side to executor block storage (memory-and-disk). Callers whose fact
  * frame has deterministic row order end to end (a bare file scan with
  * no upstream shuffle — row order within a split is stable across
  * retries) can pass `checkpointSalt = false` to skip it. Checkpoint
  * storage is tracked in [[FrameCaches]]; long-running processes should
  * call [[FrameCaches.release]] (or [[Dedup.releaseCaches]]) after the
  * join's results are consumed.
  */
object Skew {

  /** Salted fact-dim join (see object doc for the full rationale).
    *
    * COST CONTRACT of the default `checkpointSalt = true`: the ENTIRE
    * fact frame — every column it carries — is materialized to executor
    * block storage (memory-and-disk) at plan-build time, its lineage
    * cut, and the blocks pinned until [[FrameCaches.release]] (or
    * [[Dedup.releaseCaches]]) is called. A long-running process that
    * never releases accumulates one checkpointed fact per salted join.
    * The checkpoint also stops predicate/projection pushdown into the
    * fact scan, so `.select(...)` / `.filter(...)` the fact frame down
    * to the columns and rows the join actually needs BEFORE calling —
    * the operator returns all fact columns and cannot prune for you.
    * Pass `checkpointSalt = false` only when the fact frame's row order
    * is retry-deterministic end to end (bare file scan, no upstream
    * shuffle); it skips the materialization and the cleanup obligation.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner",
      checkpointSalt: Boolean = true): DataFrame = {
    // right/full outer would emit saltBuckets null-extended copies of
    // every unmatched dim row — only fact-preserving types are sound.
    // Normalize through Catalyst so all Spark spellings are accepted.
    import org.apache.spark.sql.catalyst.plans._
    require(JoinType(joinType) match {
      case Inner | LeftOuter | LeftSemi | LeftAnti => true
      case _ => false
    }, s"saltedJoin supports fact-preserving join types only, got $joinType")
    val salted = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val factSalted =
      if (checkpointSalt) FrameCaches.track(salted.localCheckpoint(true))
      else salted
    val dimReplicated = dim.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    factSalted.join(dimReplicated,
      Seq(key, "_salt"), joinType).drop("_salt")
  }
}
