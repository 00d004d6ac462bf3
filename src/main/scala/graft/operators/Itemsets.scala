package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket pair mining (the Apriori/FP-growth candidate stage;
  * reference scope: none — beyond-reference, SURVEY §2.13 L57).
  *
  * NOT the naive self-join: each basket's distinct items collapse to
  * ONE sorted array row (`collect_set`, one shuffle on the basket key)
  * and the pair expansion happens MAP-SIDE inside a higher-order
  * `transform × slice` generator, so the only other shuffle is the
  * pair-count aggregate — cost rides the true pair mass Σ|basket|²,
  * never corpus² (10× rehearsal exponent 0.34, BASELINE.md round 9).
  */
object Itemsets {

  /** Co-occurring item pairs with exact support counts.
    *
    * `maxBasketSize` (off by default — exactness is the default
    * contract): truncate each SORTED basket to its first N items before
    * pair expansion. A basket of B items emits B·(B−1)/2 pairs, so one
    * mega-basket (a crawl dump where "basket" is a domain, a power user
    * whose cart is the whole catalog) is a quadratic bomb the aggregate
    * cannot save — 10k items = 50M pairs from ONE row, materialized in
    * one task. The cap bounds every basket's contribution at
    * cap·(cap−1)/2 regardless of input shape — the same role as d9's
    * `maxPostingSize` and LSH's `maxBucketSize` ([[Dedup]]).
    *
    * Capped semantics (documented trade, mirroring d9): the kept slice
    * is the cap SMALLEST items of the sorted basket — deterministic,
    * no tie roulette. Pairs whose items both survive every containing
    * basket's truncation keep their EXACT support; a pair loses a
    * basket (undercounts) only where one of its items fell outside
    * that basket's slice, and pairs never co-surviving anywhere vanish.
    * When NO basket exceeds the cap the capped result is bit-identical
    * to the uncapped one — the regime the fi1 oracle runs in (TPC-H
    * order baskets top out at ~12 items; ItemsetsSpec pins both this
    * identity and the adversarial bound).
    */
  def itemPairs(rows: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L,
      maxBasketSize: Option[Int] = None): DataFrame = {
    maxBasketSize.foreach(cap => require(cap >= 2,
      s"maxBasketSize must be >= 2 to emit any pair, got $cap"))
    val sorted: Column = sort_array(collect_set(col(itemCol)))
    val basket: Column =
      maxBasketSize.map(cap => slice(sorted, 1, cap)).getOrElse(sorted)
    rows
      .groupBy(col(basketCol))
      .agg(basket.as("items"))
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |    y -> struct(x AS p1, y AS p2))))""".stripMargin)).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
