package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DemoDataGeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("generator is deterministic and honors reference value domains") {
    val c1 = DemoDataGenerator.customers(spark, 50, "2024-06-01").collect()
    val c2 = DemoDataGenerator.customers(spark, 50, "2024-06-01").collect()
    assert(c1.sameElements(c2), "same seed must reproduce identical rows")
    assert(c1.length == 50)
    assert(c1.forall(_.getAs[String]("customer_id").matches("C\\d{5}")))
    assert(c1.forall(_.getAs[String]("email").endsWith("@example.com")))

    val p = DemoDataGenerator.products(spark, 100)
    val prices = p.select("price", "cost").as[(Double, Double)].collect()
    assert(prices.forall { case (price, cost) =>
      price >= 5.0 && price <= 500.0 && cost <= 0.8 * price + 0.01 && cost >= 0.5 * price - 0.01
    })

    val t = DemoDataGenerator.transactions(spark, 200, 50, 100, "2024-06-01")
    val qty = t.select("quantity").as[Int].collect()
    assert(qty.forall(q => q >= 1 && q <= 5))
    assert(t.select(min("transaction_date")).as[java.sql.Date].head()
      .toString >= "2024-06-01")
    // every fact key must resolve against the generated dimensions
    assert(t.select("customer_id").as[String].collect()
      .forall(id => id.stripPrefix("C").toInt <= 50))
    assert(t.select("product_id").as[String].collect()
      .forall(id => id.stripPrefix("P").toInt <= 100))
    // amount = per-item price (2dp) * quantity, re-rounded — never null
    assert(t.filter($"amount".isNull || $"amount" <= 0).count() == 0)
  }
}
