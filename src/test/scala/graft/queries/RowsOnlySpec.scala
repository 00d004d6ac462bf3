package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Verification home for the operators whose outputs are deliberately
  * NOT driver rows (round-10 verdict item 4: the CORRECTNESS ledger
  * carries only oracle-checkable queries; everything else needs a named
  * green ScalaTest instead):
  *
  *   - `hll1` (built-in `approx_count_distinct`): the sketch internals
  *     aren't SQL-re-derivable — its oracle-checked twin is
  *     `sk3_hll_distinct`. Here the estimate is checked against the
  *     exact count within the HLL error envelope.
  *   - `v8` (float IVF over k-means-trained centroids): float-mean
  *     summation order isn't SQL-re-derivable — its oracle-checked twin
  *     is `v11_kmeans_quantized`. Here the end-to-end shape contract is
  *     checked (k rows per query, valid ranks, descending scores).
  *   - `a11`'s NATIVE `array<long>` spelling: the gated surface
  *     serializes to a joined string (the driver's pandas sort can't
  *     order numpy arrays); the native API is pinned element-wise equal
  *     to that surface here.
  */
class RowsOnlySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hll1: approx_count_distinct lands inside the HLL error envelope") {
    val row = ExtendedQueries.hll1ApproxDistinct(spark, dir).head
    val approxParts = row.getLong(0)
    val exactOrders = row.getLong(1)
    val exactParts = graft.Tables.load(spark, dir, "lineitem")
      .select(countDistinct(col("l_partkey"))).head.getLong(0)
    val exactOrdersTrue = graft.Tables.load(spark, dir, "lineitem")
      .select(countDistinct(col("l_orderkey"))).head.getLong(0)
    assert(exactOrders == exactOrdersTrue, "exact path must be exact")
    // default rsd = 0.05; allow 4 sigma so the pin never flakes while
    // still catching an off-by-10x sketch wiring bug
    val tol = math.max(1.0, 4 * 0.05 * exactParts)
    assert(math.abs(approxParts - exactParts) <= tol,
      s"estimate $approxParts vs exact $exactParts exceeds ±$tol")
  }

  test("v8: float IVF top-k returns k ranked neighbors per query") {
    val out = VectorQueries.v8IvfKmeans(spark, dir)
      .select("query_id", "neighbor_id", "score", "rnk").collect()
    assert(out.nonEmpty, "v8 returned no rows")
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.size == 5, s"expected 5 queries, got ${perQuery.size}")
    perQuery.foreach { case (q, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to rows.length), s"query $q ranks not 1..k: $ranks")
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sortBy(-(_: Double)),
        s"query $q scores not descending by rank")
      assert(!rows.exists(_.getLong(1) == q),
        s"query $q returned itself as a neighbor")
    }
  }

  test("a11: native array spelling ≡ the gated string surface") {
    val native = Relational.a11ArrayAggNative(spark, dir)
      .select(col("o_custkey"),
        array_join(transform(col("order_keys"), _.cast("string")), ",")
          .as("order_keys"),
        col("n_orders"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gated = Relational.a11ArrayAgg(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(native.nonEmpty && native.sameElements(gated),
      "native array path diverged from the gated string surface")
  }
}
