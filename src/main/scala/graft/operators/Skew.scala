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
  * (small) build side replicates ×S. Results are identical to the
  * unsalted join — the salt only affects partitioning, and Spark
  * recomputes whole stages on retry for indeterminate maps, so the
  * position-derived salt cannot split a row's fate across attempts.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit saltBuckets null-extended copies of
    // every unmatched dim row — only fact-preserving types are sound.
    // Normalize through Catalyst so all Spark spellings are accepted.
    import org.apache.spark.sql.catalyst.plans._
    require(JoinType(joinType) match {
      case Inner | LeftOuter | LeftSemi | LeftAnti => true
      case _ => false
    }, s"saltedJoin supports fact-preserving join types only, got $joinType")
    val factSalted = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val dimReplicated = dim.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    factSalted.join(dimReplicated,
      Seq(key, "_salt"), joinType).drop("_salt")
  }
}
