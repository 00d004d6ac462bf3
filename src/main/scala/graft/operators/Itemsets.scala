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

  /** Association rules over [[itemPairs]] — the confidence/lift stage
    * that turns co-occurrence counts into directed rules (the Apriori
    * output a recommender or basket report actually consumes): each
    * qualifying pair {a, b} emits a→b and b→a with
    *   `conf_permille = 1000·support(a,b) DIV support(a)`
    *   `lift_permille = 1000·support(a,b)·N DIV (support(a)·support(b))`
    * — all-integer permille arithmetic (the q14 playbook), so the
    * driver gate hash-checks the statistics, not just the pair list.
    * Lift is direction-symmetric by definition; confidence is the
    * directed part.
    *
    * Scale shape: [[itemPairs]]'s cost dominates; on top ride one
    * distinct (basket, item) projection → map-side-combined item
    * supports, one 1-row basket count joined in as a broadcast
    * (never a collect), and two broadcast-able equi joins of the rule
    * frame against the item-support table (|items| rows — broadcast at
    * dimension scale, keyed shuffle beyond). Item supports are counted
    * on the UNCAPPED rows: support(pair) ≤ support(item) holds under
    * the basket cap regardless (a cap only removes pair observations),
    * so confidence never exceeds 1000‰.
    */
  def associationRules(rows: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L,
      maxBasketSize: Option[Int] = None): DataFrame = {
    val pairs = itemPairs(rows, basketCol, itemCol, minSupport, maxBasketSize)
    val itemSupport = rows.select(col(basketCol), col(itemCol)).distinct()
      .groupBy(col(itemCol).as("_item"))
      .agg(count(lit(1)).as("_isup"))
    val nBaskets = rows.select(col(basketCol)).distinct()
      .agg(count(lit(1)).as("_n_baskets"))
    // both directions via one map-side explode — a union of two selects
    // over the same frame plans as TWO plan instances (no
    // ReusedExchange), recomputing the whole basket-pair pipeline per
    // branch; the explode emits a→b and b→a from ONE pass (measured:
    // 5 scans/20 aggregates → 3 scans/8 aggregates at sf0.001)
    val directed = pairs
      .select(explode(array(
        struct(col("p1").as("antecedent"), col("p2").as("consequent"),
          col("support")),
        struct(col("p2").as("antecedent"), col("p1").as("consequent"),
          col("support")))).as("r"))
      .select("r.*")
    directed
      .join(broadcast(itemSupport.select(col("_item").as("antecedent"),
        col("_isup").as("_sa"))), "antecedent")
      .join(broadcast(itemSupport.select(col("_item").as("consequent"),
        col("_isup").as("_sc"))), "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("support"),
        expr("1000 * support DIV _sa").as("conf_permille"),
        expr("1000 * support * _n_baskets DIV (_sa * _sc)").as("lift_permille"))
  }
}
