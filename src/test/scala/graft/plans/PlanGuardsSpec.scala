package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The guard extension needs its OWN session (check rules inject at
  * session creation), built over the shared test SparkContext: the
  * active/default session is cleared, a guarded one is created through
  * the builder, and the shared session is restored afterwards so the
  * other suites are unaffected.
  */
class PlanGuardsSpec extends AnyFunSuite {

  private def withGuardedSession(f: SparkSession => Unit): Unit =
    graft.TestSpark.withGuardedSession(f)

  private def violation(t: Throwable): Option[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .collectFirst { case g: PlanGuards.GuardViolation => g.getMessage }

  test("unhinted cartesian products are refused at analysis time") {
    withGuardedSession { s =>
      val a = s.range(10).toDF("x")
      val b = s.range(10).toDF("y")
      val e = intercept[Throwable] { a.crossJoin(b).collect() }
      assert(violation(e).exists(_.contains("condition-less")),
        s"expected a cartesian guard violation, got $e")
      // the SQL comma-join spelling is caught too
      a.createOrReplaceTempView("ga"); b.createOrReplaceTempView("gb")
      val e2 = intercept[Throwable] {
        s.sql("SELECT * FROM ga, gb").collect() }
      assert(violation(e2).nonEmpty, s"SQL cartesian must be caught: $e2")
    }
  }

  test("broadcast-hinted scalar cross joins pass — the library's own idiom") {
    withGuardedSession { s =>
      val facts = s.range(100).toDF("x")
      val scalar = s.range(100).toDF("x").agg(sum("x").as("total"))
      val out = facts.crossJoin(broadcast(scalar))
        .select((col("x") * col("total")).as("scaled")).count()
      assert(out == 100L)
    }
  }

  test("equi joins and partitioned windows are untouched") {
    withGuardedSession { s =>
      val a = s.range(50).toDF("k")
      val b = s.range(50).select(col("id").as("k"), (col("id") * 2).as("v"))
      assert(a.join(b, "k").count() == 50L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k") % 5).orderBy("k")
      assert(a.withColumn("rn", row_number().over(w)).count() == 50L)
    }
  }

  test("global windows are refused; the session opt-out unlocks both guards") {
    withGuardedSession { s =>
      val df = s.range(20).toDF("x")
      val gw = org.apache.spark.sql.expressions.Window.orderBy("x")
      val e = intercept[Throwable] {
        df.withColumn("rn", row_number().over(gw)).collect() }
      assert(violation(e).exists(_.contains("PARTITION BY")),
        s"expected a global-window guard violation, got $e")
      s.conf.set(PlanGuards.AllowGlobalWindowKey, "true")
      assert(df.withColumn("rn", row_number().over(gw)).count() == 20L)
      s.conf.set(PlanGuards.AllowCartesianKey, "true")
      assert(df.crossJoin(s.range(3).toDF("y")).count() == 60L)
    }
  }

  test("tiny-funnel operators pass the window guard via constant partition keys") {
    withGuardedSession { s =>
      import s.implicits._
      // before round 13 these three planned a PARTITION-BY-less window
      // and a guarded session could not run the library's own
      // operators without the session-wide opt-out (round-12 advice);
      // the constant partition key survives analysis (where the guard
      // checks) and the optimizer then strips it, so the physical plan
      // is unchanged
      val sky = graft.operators.Skyline.pareto2(
        Seq((10L, 1L), (20L, 5L), (30L, 3L)).toDF("cost", "gain"),
        "cost", "gain").collect()
      assert(sky.length == 2, sky.mkString(","))
      val sketch = Seq((1L, 4L), (2L, 6L)).toDF("bkey", "cnt")
      val q = graft.operators.Sketches
        .hdrQuantiles(sketch, Seq(500)).collect()
      assert(q.length == 1, q.mkString(","))
      val cb = graft.operators.Similarity.pqCodebook(
        Seq((1L, Array(1, 2, 3, 4)), (2L, Array(5, 6, 7, 8)))
          .toDF("vec_id", "qv"), m = 2, sub = 2, k = 2).collect()
      assert(cb.length == 4, cb.mkString(","))
    }
  }

  test("a real library query runs clean under the guards") {
    withGuardedSession { s =>
      // dp4's bounds frame crosses as a broadcast-hinted 1-row scalar
      // and its window-free aggregate shape satisfies both guards —
      // evidence the guard encodes the house rules, not a new style
      val rows = graft.queries.SeriesQueries
        .dp4Histogram(s, "/root/testdata/sf0.001").count()
      assert(rows > 0)
    }
  }
}
