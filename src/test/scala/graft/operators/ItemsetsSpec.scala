package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Itemsets.itemPairs]]: exact pair semantics, the capped≡uncapped
  * identity on the fi1 gate data, and the adversarial mega-basket bound
  * (the round-9 verdict item — the cap must be code, not prose).
  */
class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  test("pair generation: sorted pairs, exact supports, minSupport filter") {
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 20L), (2L, 10L),            // unsorted arrival — pairs still (10,20)
      (3L, 10L), (3L, 20L), (3L, 10L), // duplicate item collapses (collect_set)
      (4L, 99L)                        // singleton basket emits nothing
    ).toDF("basket", "item")
    val pairs = Itemsets.itemPairs(rows, "basket", "item")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L)))
    val frequent = Itemsets.itemPairs(rows, "basket", "item", minSupport = 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(frequent == Set((10L, 20L, 3L)))
  }

  test("association rules: hand-computed confidence/lift, invariants hold") {
    // baskets: {10,20,30}, {10,20}, {10,20}, {10,40}
    // s(10)=4 s(20)=3 s(30)=1 s(40)=1 N=4; s(10,20)=3 s(10,30)=1
    // s(20,30)=1 s(10,40)=1
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 10L), (4L, 40L)).toDF("basket", "item")
    val rules = Itemsets.associationRules(rows, "basket", "item")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // 10→20: conf 3000/4=750, lift 1000·3·4/(4·3)=1000
    assert(rules((10L, 20L)) == ((3L, 750L, 1000L)), rules((10L, 20L)).toString)
    // 20→10: conf 3000/3=1000 (20 always co-occurs with 10), same lift
    assert(rules((20L, 10L)) == ((3L, 1000L, 1000L)))
    // 30→10: conf 1000, lift 1000·1·4/(1·4)=1000; 10→30: conf 250
    assert(rules((30L, 10L)) == ((1L, 1000L, 1000L)))
    assert(rules((10L, 30L)) == ((1L, 250L, 1000L)))
    // 20→30: conf 1000/3=333, lift 1000·4/(3·1)=1333 (positive assoc)
    assert(rules((20L, 30L)) == ((1L, 333L, 1333L)))
    // invariants: every pair yields both directions, conf never > 1000‰
    assert(rules.size == 8 && rules.keys.forall(k => rules.contains(k.swap)))
    assert(rules.values.forall(_._2 <= 1000L))
  }

  test("fi1 regime: capped is bit-identical to uncapped when no basket exceeds the cap") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val maxBasket = li.groupBy("l_orderkey")
      .agg(size(collect_set(col("l_partkey"))).as("b"))
      .agg(max("b")).head.getInt(0)
    assert(maxBasket <= 64,
      s"testdata basket grew past fi1's cap ($maxBasket > 64) — " +
        "the oracle-neutrality premise broke; re-check fi1's counts")
    val uncapped = Itemsets.itemPairs(li, "l_orderkey", "l_partkey",
      minSupport = 2L).as[(Long, Long, Long)].collect().toSet
    val capped = Itemsets.itemPairs(li, "l_orderkey", "l_partkey",
      minSupport = 2L, maxBasketSize = Some(64))
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == uncapped)
  }

  test("adversarial mega-basket: capped contribution is flat, uncapped is quadratic") {
    // ProfileHotKeys pattern: one pathological key must not produce a
    // quadratic task. 2k-item and 10k-item mega-baskets: the capped
    // pair count stays at C(64,2) = 2016 for BOTH (flat), while the
    // uncapped count at 2k already shows the square law (C(2000,2) —
    // the 10k uncapped case, 50M pairs from one row, is exactly the
    // task this test exists to never run).
    def megaBasket(n: Int) =
      spark.range(n.toLong).select(lit(1L).as("basket"), col("id").as("item"))
    for (n <- Seq(2000, 10000)) {
      val capped = Itemsets.itemPairs(megaBasket(n), "basket", "item",
        maxBasketSize = Some(64)).count()
      assert(capped == 64L * 63 / 2,
        s"capped mega-basket($n) must contribute exactly C(64,2), got $capped")
    }
    val uncapped = Itemsets.itemPairs(megaBasket(2000), "basket", "item").count()
    assert(uncapped == 2000L * 1999 / 2,
      s"uncapped mega-basket must be the full square law, got $uncapped")
  }

  test("the capped keep rule IS the oracle's row_number spelling on an over-cap basket") {
    // round-12: the fi1/fi2 oracles now SPELL the cap as
    // `row_number() OVER (PARTITION BY basket ORDER BY item) <= cap`
    // over the DISTINCT (basket, item) set — this pins the Spark side's
    // slice(sort_array(collect_set(item)), 1, cap) to that exact rule
    // on a basket that actually exceeds the cap (the regime the gate
    // data never enters)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val cap = 5
    val rows = (1 to 12).map(i => (1L, (13 - i).toLong)) ++ // reversed arrival
      Seq((2L, 100L), (2L, 101L))
    val df = rows.toDF("basket", "item")
    val capped = Itemsets.itemPairs(df, "basket", "item",
        maxBasketSize = Some(cap))
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("basket").orderBy("item")
    val oracleKept = df.distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= cap)
      .drop("rk")
    val oraclePairs = oracleKept.as("a").join(oracleKept.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("p1"), col("b.item").as("p2"))
      .agg(count(lit(1)).as("support"))
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == oraclePairs,
      s"slice keep rule must equal the row_number spelling: $capped vs $oraclePairs")
    // and the kept slice is the cap SMALLEST items (1..5, not 8..12)
    assert(capped.flatMap(p => Set(p._1, p._2)).filter(_ < 100).max == cap.toLong)
  }

  test("capped supports never exceed exact supports (undercount-only contract)") {
    // baskets 1-3 all contain (10,20); basket 3 is padded so item 20
    // falls outside a cap of 3 there — capped support drops 3 -> 2,
    // never invents pairs or overcounts
    val rows = (Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L)) ++
      Seq(10L, 11L, 12L, 20L).map(i => (3L, i))).toDF("basket", "item")
    val exact = Itemsets.itemPairs(rows, "basket", "item")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val capped = Itemsets.itemPairs(rows, "basket", "item",
        maxBasketSize = Some(3))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(capped((10L, 20L)) == 2L && exact((10L, 20L)) == 3L)
    capped.foreach { case (pair, s) =>
      assert(exact.contains(pair), s"cap invented pair $pair")
      assert(s <= exact(pair), s"cap overcounted $pair: $s > ${exact(pair)}")
    }
  }
}
