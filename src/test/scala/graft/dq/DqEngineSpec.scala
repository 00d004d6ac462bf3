package graft.dq

import graft.SparkSpec
import graft.config.DqRuleConfig

class DqEngineSpec extends SparkSpec {
  import spark.implicits._

  private def rule(name: String, tpe: String, cols: Seq[String],
      action: String = "filter", pattern: Option[String] = None,
      expression: Option[String] = None, refTable: Option[String] = None,
      refColumn: Option[String] = None) =
    DqRuleConfig(name, tpe, cols, pattern, expression, refTable, refColumn, action)

  private def fixture = Seq(
    // (id, email, amount, qty, custkey)
    (1, "a@x.com", Some(10.0), 2, 100),
    (2, "bad-email", Some(20.0), 1, 100),
    (3, "c@y.org", None, 3, 200),
    (4, "d@z.net", Some(-5.0), 1, 999), // orphan custkey
    (5, "a@x.com", Some(10.0), 2, 100) // duplicate of row 1 on (email)
  ).toDF("id", "email", "amount", "qty", "custkey")

  private def refCustomers = Seq(100, 200, 300).toDF("custkey")

  test("not_null filter drops nulls and counts both sides") {
    val res = DqEngine(spark, fixture,
      Seq(rule("amount_nn", "not_null", Seq("amount"))))
    assert(res.data.count() == 4)
    assert(res.data.filter($"amount".isNull).count() == 0)
    assert(res.metrics.head.validCount == 4 && res.metrics.head.invalidCount == 1)
  }

  test("regex tag adds VALID/INVALID flag without dropping rows") {
    val res = DqEngine(spark, fixture,
      Seq(rule("email_fmt", "regex", Seq("email"), "tag",
        pattern = Some("^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"))))
    assert(res.data.count() == 5)
    val flags = res.data.select("id", "dq_email_fmt_flag").as[(Int, String)]
      .collect().toMap
    assert(flags(2) == "INVALID" && flags(1) == "VALID")
    assert(res.metrics.head.invalidCount == 1)
  }

  test("expression filter evaluates arbitrary boolean SQL") {
    val res = DqEngine(spark, fixture,
      Seq(rule("amount_pos", "expression", Nil,
        expression = Some("amount IS NOT NULL AND amount > 0"))))
    assert(res.data.count() == 3) // null and -5.0 both fail
    assert(res.metrics.head.invalidCount == 2)
  }

  test("referential integrity flags orphan keys via broadcast semi side") {
    refCustomers.createOrReplaceTempView("ref_customers")
    val res = DqEngine(spark, fixture,
      Seq(rule("cust_ref", "referential_integrity", Seq("custkey"),
        refTable = Some("ref_customers"), refColumn = Some("custkey"))))
    assert(res.data.count() == 4)
    assert(!res.data.select("id").as[Int].collect().contains(4))
    assert(res.metrics.head.invalidCount == 1)
  }

  test("uniqueness keeps exactly one row per key") {
    val res = DqEngine(spark, fixture,
      Seq(rule("email_uniq", "uniqueness", Seq("email"))))
    assert(res.data.count() == 4)
    assert(res.metrics.head.invalidCount == 1)
    assert(res.data.groupBy("email").count().filter($"count" > 1).count() == 0)
  }

  test("empty input yields zero metrics, not an NPE") {
    val res = DqEngine(spark, fixture.filter($"id" < 0),
      Seq(rule("amount_nn", "not_null", Seq("amount"))))
    assert(res.metrics.head.validCount == 0)
    assert(res.metrics.head.invalidCount == 0)
    assert(res.data.count() == 0)
    res.cleanup()
  }

  test("uniqueness survivor is deterministic across repeated runs") {
    val dup = Seq((1, "x", "a"), (1, "x", "b"), (2, "y", "c"))
      .toDF("k", "g", "payload")
    val surv = (1 to 3).map { _ =>
      DqEngine(spark, dup.repartition(4),
        Seq(rule("u", "uniqueness", Seq("k"))))
        .data.orderBy("k").select("payload").as[String].collect().toSeq
    }
    assert(surv.distinct.size == 1, surv.toString)
  }

  test("reject throws and names the failing rule") {
    val e = intercept[DqEngine.DqRejectException] {
      DqEngine(spark, fixture,
        Seq(rule("amount_nn", "not_null", Seq("amount"), "reject")))
    }
    assert(e.failed.head.rule == "amount_nn")
  }

  test("sequential semantics: later rule counts only filter survivors") {
    val res = DqEngine(spark, fixture, Seq(
      rule("amount_nn", "not_null", Seq("amount")), // drops id=3
      rule("qty_big", "expression", Nil, "tag", expression = Some("qty >= 2"))))
    // id=3 must not be counted by qty_big (it was filtered before)
    val m = res.metrics.find(_.rule == "qty_big").get
    assert(m.validCount + m.invalidCount == 4)
    assert(m.invalidCount == 2) // ids 2 and 4 (qty=1); id 3 excluded
  }

  test("uniqueness ranks only filter survivors: filtered rank-1 row " +
    "does not doom its duplicate group") {
    // row 1 is the deterministic keeper of the (email=a@x.com) group but
    // fails the amount rule; sequential semantics must then keep row 5
    val rules = Seq(
      rule("amount_cap", "expression", Nil,
        expression = Some("amount IS NULL OR amount < 10.0")),
      rule("email_unique", "uniqueness", Seq("email")))
    val res = DqEngine(spark, fixture, rules)
    try {
      // amount_cap filters rows 1, 2, 5? no: 10.0 < 10.0 false -> rows
      // 1 and 5 (10.0) and 2 (20.0) fail; 3 (null) and 4 (-5) pass
      assert(res.data.select("id").as[Int].collect().toSet == Set(3, 4))
      // now invert: cap lets the group through minus its rank-1 row
      val res2 = DqEngine(spark, fixture, Seq(
        rule("not_row1", "expression", Nil, expression = Some("id <> 1")),
        rule("email_unique", "uniqueness", Seq("email"))))
      try {
        val ids = res2.data.select("id").as[Int].collect().toSet
        assert(ids.contains(5), "row 5 must become the group's keeper once row 1 is filtered")
        assert(ids == Set(2, 3, 4, 5))
        val uniq = res2.metrics.find(_.rule == "email_unique").get
        assert(uniq.invalidCount == 0, "no surviving duplicates")
      } finally res2.cleanup()
    } finally res.cleanup()
  }

  test("filter + tag compose; flags partition the input exactly") {
    val res = DqEngine(spark, fixture, Seq(
      rule("amount_nn", "not_null", Seq("amount")),
      rule("email_fmt", "regex", Seq("email"), "tag",
        pattern = Some("@"))))
    val m0 = res.metrics.head
    assert(m0.validCount + m0.invalidCount == 5)
    assert(res.data.columns.contains("dq_email_fmt_flag"))
    assert(!res.data.columns.exists(_.startsWith("__dq_")))
  }
}
