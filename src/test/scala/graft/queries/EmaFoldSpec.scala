package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Focused r19 test for rc3's optimization: the EMA recurrence moved
  * from a 27-step WITH RECURSIVE UnionLoop to one ordered `aggregate`
  * fold per priority. The driver gate proves equality on the REAL
  * corpus, whose quarter grid is dense — so the one semantic the fold
  * must reproduce that the gate can never exercise is CHAIN DEATH: the
  * recursive join extends only to qidx = prev + 1, so rows past a gap
  * never emit (even where contiguity resumes later). This spec plants
  * a gapped series and pins the fold against BOTH a hand-computed
  * expectation and the old recursive-CTE spelling run in-engine over
  * the same aggregated series.
  */
class EmaFoldSpec extends SparkSpec {

  test("rc3 fold ≡ recursive chain: anchor at min qidx, death at first gap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rc3gap").toString
    // pri A: qidx 0, 1, 3, 4 — gap at 2: the chain must emit 0, 1 ONLY
    //        (and NOT resume at the contiguous 3→4 tail)
    // pri B: qidx 0 (two orders aggregating into one cell), 1, 2 — dense
    Seq(
      ("A", "1995-01-15", 100.00), ("A", "1995-04-15", 50.00),
      ("A", "1995-11-15", 70.00), ("A", "1996-02-15", 30.00),
      ("B", "1995-02-15", 10.00), ("B", "1995-03-15", 15.00),
      ("B", "1995-05-15", 20.00), ("B", "1995-08-15", 40.00)
    ).toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = graft.SparkEntry.queries("rc3_ema_series")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq

    // hand-computed: ema0 = cents0; eman = (200·v + 800·prev) DIV 1000
    val expected = Seq(
      ("A", 0, 10000L, 10000L),
      ("A", 1, 5000L, (200L * 5000 + 800L * 10000) / 1000), // 9000
      ("B", 0, 2500L, 2500L),
      ("B", 1, 2000L, (200L * 2000 + 800L * 2500) / 1000), // 2400
      ("B", 2, 4000L, (200L * 4000 + 800L * 2400) / 1000)) // 2720
    assert(got == expected, s"fold chain diverged: $got")

    // and ≡ the r18 recursive-CTE spelling over the same series — the
    // exact plan the fold replaced, UnionLoop semantics included
    graft.Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        ((year(col("o_orderdate").cast("date")) - 1995) * 4 +
          quarter(col("o_orderdate").cast("date")) - 1).as("qidx"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .cast("long").as("cents"))
      .createOrReplaceTempView("ema_series_spec")
    val recursive = spark.sql(
      """WITH RECURSIVE ema(pri, qidx, cents, ema_cents) AS (
        |  SELECT pri, qidx, cents, cents FROM (
        |    SELECT pri, qidx, cents,
        |      MIN(qidx) OVER (PARTITION BY pri) AS _mn
        |    FROM ema_series_spec) WHERE qidx = _mn
        |  UNION ALL
        |  SELECT s.pri, s.qidx, s.cents,
        |    (200 * s.cents + 800 * e.ema_cents) DIV 1000
        |  FROM ema e JOIN ema_series_spec s
        |    ON s.pri = e.pri AND s.qidx = e.qidx + 1)
        |SELECT pri, qidx, cents, ema_cents FROM ema
        |ORDER BY pri, qidx""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == recursive,
      s"fold diverged from the recursive spelling: $got vs $recursive")
  }
}
