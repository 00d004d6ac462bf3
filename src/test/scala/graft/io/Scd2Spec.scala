package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def table(name: String): String = {
    spark.sql("CREATE DATABASE IF NOT EXISTS scd2_test")
    val t = s"scd2_test.$name"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    t
  }

  private def history(t: String): Seq[(Int, String, String, String, Boolean)] =
    spark.table(t)
      .select(col("k"), col("v"), col("valid_from").cast("string"),
        coalesce(col("valid_to").cast("string"), lit("-")), col("is_current"))
      .as[(Int, String, String, String, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  private def df(rows: (Int, String, String)*) =
    rows.toDF("k", "v", "eff").withColumn("eff", col("eff").cast("date"))

  test("versions chain across daily batches: close + open, one current per key") {
    val t = table("t_chain")
    val s1 = Scd2.merge(spark, t, df((1, "gold", "2024-01-01"), (2, "bronze", "2024-01-01")),
      Seq("k"), Seq("v"), "eff")
    assert(s1 == Scd2Stats(2, 2, 0, 0), s1)
    val s2 = Scd2.merge(spark, t, df((1, "platinum", "2024-02-01")),
      Seq("k"), Seq("v"), "eff")
    assert(s2 == Scd2Stats(1, 1, 1, 0), s2)
    val s3 = Scd2.merge(spark, t, df((1, "iridium", "2024-03-01"), (2, "bronze", "2024-03-01")),
      Seq("k"), Seq("v"), "eff")
    // key 2 re-observed unchanged: no version row, counted unchanged
    assert(s3 == Scd2Stats(2, 1, 1, 1), s3)
    assert(history(t) == Seq(
      (1, "gold", "2024-01-01", "2024-02-01", false),
      (1, "platinum", "2024-02-01", "2024-03-01", false),
      (1, "iridium", "2024-03-01", "-", true),
      (2, "bronze", "2024-01-01", "-", true)))
  }

  test("replaying the latest batch is a bit-identical no-op") {
    val t = table("t_replay")
    Scd2.merge(spark, t, df((1, "a", "2024-01-01")), Seq("k"), Seq("v"), "eff")
    val b2 = df((1, "b", "2024-02-01"), (2, "c", "2024-02-01"))
    Scd2.merge(spark, t, b2, Seq("k"), Seq("v"), "eff")
    val once = history(t)
    val replay = Scd2.merge(spark, t, b2, Seq("k"), Seq("v"), "eff")
    assert(replay == Scd2Stats(2, 0, 0, 2), replay)
    assert(history(t) == once, "replay must not move a single interval")
  }

  test("multi-version batch chains in-batch; consecutive-equal versions compress") {
    val t = table("t_multi")
    val s = Scd2.merge(spark, t, df(
      (1, "a", "2024-01-01"), (1, "b", "2024-02-01"),
      (1, "b", "2024-03-01"), // equal to predecessor: compressed away
      (1, "c", "2024-04-01")), Seq("k"), Seq("v"), "eff")
    assert(s == Scd2Stats(4, 3, 0, 1), s)
    val once = history(t)
    assert(once == Seq(
      (1, "a", "2024-01-01", "2024-02-01", false),
      (1, "b", "2024-02-01", "2024-04-01", false),
      (1, "c", "2024-04-01", "-", true)))
    // replaying the multi-version batch re-delivers versions that are
    // now CLOSED — they are no-ops, never "stale backfills"
    val replay = Scd2.merge(spark, t, df(
      (1, "a", "2024-01-01"), (1, "b", "2024-02-01"),
      (1, "b", "2024-03-01"), (1, "c", "2024-04-01")),
      Seq("k"), Seq("v"), "eff")
    assert(replay == Scd2Stats(4, 0, 0, 4), replay)
    assert(history(t) == once, "multi-version replay must converge")
  }

  test("a batch reverting to the standing current value keeps the reversion") {
    // the in-force no-op test must NOT absorb a row that matches the
    // standing current version at a LATER date when the same batch
    // changes the key in between — A -> (B, back to A) is three
    // versions, and replaying the batch afterwards must be a no-op
    val t = table("t_revert")
    Scd2.merge(spark, t, df((1, "a", "2024-01-01")), Seq("k"), Seq("v"), "eff")
    val b = df((1, "b", "2024-02-01"), (1, "a", "2024-03-01"))
    val s = Scd2.merge(spark, t, b, Seq("k"), Seq("v"), "eff")
    assert(s == Scd2Stats(2, 2, 1, 0), s)
    val once = history(t)
    assert(once == Seq(
      (1, "a", "2024-01-01", "2024-02-01", false),
      (1, "b", "2024-02-01", "2024-03-01", false),
      (1, "a", "2024-03-01", "-", true)))
    val replay = Scd2.merge(spark, t, b, Seq("k"), Seq("v"), "eff")
    assert(replay == Scd2Stats(2, 0, 0, 2), replay)
    assert(history(t) == once, "replaying the reversion batch must converge")
  }

  test("same-date restatement replaces the current version in place — no zero-length interval") {
    val t = table("t_restate")
    Scd2.merge(spark, t, df((1, "a", "2024-01-01"), (1, "typo", "2024-02-01")),
      Seq("k"), Seq("v"), "eff")
    val s = Scd2.merge(spark, t, df((1, "fixed", "2024-02-01")),
      Seq("k"), Seq("v"), "eff")
    assert(s == Scd2Stats(1, 1, 0, 0), s)
    assert(history(t) == Seq(
      (1, "a", "2024-01-01", "2024-02-01", false),
      (1, "fixed", "2024-02-01", "-", true)))
  }

  test("a version pre-dating the key's current valid_from fails loudly") {
    val t = table("t_stale")
    Scd2.merge(spark, t, df((1, "a", "2024-02-01")), Seq("k"), Seq("v"), "eff")
    val e = intercept[Exception] {
      Scd2.merge(spark, t, df((1, "older", "2024-01-15")), Seq("k"), Seq("v"), "eff")
    }
    assert(e.getMessage.contains("pre-date"), e.getMessage)
    // the failed merge must not have touched the table
    assert(history(t) == Seq((1, "a", "2024-02-01", "-", true)))
  }

  test("NULL tracked values transition null-safely; NULL keys chain as a group") {
    val t = table("t_nulls")
    val b1 = Seq((Option(1), Option("a"), "2024-01-01"),
        (Option.empty[Int], Option("x"), "2024-01-01"))
      .toDF("k", "v", "eff").withColumn("eff", col("eff").cast("date"))
    Scd2.merge(spark, t, b1, Seq("k"), Seq("v"), "eff")
    // a -> NULL is a change; NULL -> NULL is not; the null KEY folds
    // into its own chain instead of duplicating
    val b2 = Seq((Option(1), Option.empty[String], "2024-02-01"),
        (Option.empty[Int], Option("x"), "2024-02-01"))
      .toDF("k", "v", "eff").withColumn("eff", col("eff").cast("date"))
    val s = Scd2.merge(spark, t, b2, Seq("k"), Seq("v"), "eff")
    assert(s == Scd2Stats(2, 1, 1, 1), s)
    val rows = spark.table(t)
      .select(col("k"), col("v"), col("is_current")).collect()
    assert(rows.length == 3, rows.mkString("; "))
    val nullV = spark.table(t).filter(col("v").isNull)
      .select("k", "is_current").as[(Int, Boolean)].collect().toSeq
    assert(nullV == Seq((1, true)), nullV)
  }

  test("exact (key, effective) duplicates pick one survivor deterministically") {
    val t = table("t_dups")
    val s = Scd2.merge(spark, t,
      df((1, "a", "2024-01-01"), (1, "z", "2024-01-01")),
      Seq("k"), Seq("v"), "eff")
    assert(s.rawRows == 2 && s.newVersions == 1, s)
    assert(history(t) == Seq((1, "z", "2024-01-01", "-", true)))
  }

  test("guards: NULL effective, undeclared columns, reserved names, shape drift") {
    val t = table("t_guard")
    val eNull = intercept[Exception] {
      Scd2.merge(spark, t,
        Seq((1, "a", null.asInstanceOf[String])).toDF("k", "v", "eff")
          .withColumn("eff", col("eff").cast("date")),
        Seq("k"), Seq("v"), "eff")
    }
    assert(eNull.getMessage.contains("NULL eff"), eNull.getMessage)
    val eExtra = intercept[IllegalArgumentException] {
      Scd2.merge(spark, t, df((1, "a", "2024-01-01")).withColumn("junk", lit(1)),
        Seq("k"), Seq("v"), "eff")
    }
    assert(eExtra.getMessage.contains("undeclared"), eExtra.getMessage)
    val eReserved = intercept[IllegalArgumentException] {
      Scd2.merge(spark, t,
        df((1, "a", "2024-01-01")).withColumnRenamed("v", "is_current"),
        Seq("k"), Seq("is_current"), "eff")
    }
    assert(eReserved.getMessage.contains("derived"), eReserved.getMessage)
    // a table that is not this merge's shape must be refused, not mangled
    val t2 = table("t_guard_shape")
    Seq((1, "a")).toDF("k", "v").write.saveAsTable(t2)
    val eShape = intercept[IllegalArgumentException] {
      Scd2.merge(spark, t2, df((1, "a", "2024-01-01")), Seq("k"), Seq("v"), "eff")
    }
    assert(eShape.getMessage.contains("SCD2 shape"), eShape.getMessage)
  }

  test("asOf reads the version in force; pruneHistory forgets the past without moving it") {
    val t = table("t_prune")
    Scd2.merge(spark, t, df(
      (1, "a", "2024-01-01"), (1, "b", "2024-02-01"), (1, "c", "2024-03-01"),
      (2, "x", "2024-01-15")), Seq("k"), Seq("v"), "eff")
    def asOfRows(at: String) = Scd2.asOf(spark, t, at)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(asOfRows("2024-01-20") == Set((1, "a"), (2, "x")))
    assert(asOfRows("2024-02-15") == Set((1, "b"), (2, "x")))
    assert(asOfRows("2024-01-10") == Set((1, "a")),
      "a key first observed later has no as-of row")
    // prune at 2024-02-15: 'a' (closed 02-01) drops; 'b' is IN FORCE
    // at the horizon and must survive
    val before = asOfRows("2024-02-15")
    val dropped = Scd2.pruneHistory(spark, t, "2024-02-15")
    assert(dropped == 1L, s"only the fully-pre-horizon version drops: $dropped")
    assert(asOfRows("2024-02-15") == before,
      "an as-of read at the horizon must not change")
    assert(asOfRows("2024-03-10") == Set((1, "c"), (2, "x")))
    assert(spark.table(t).count() == 3)
  }

  test("incremental SCD2 equals the one-shot chain derivation over the concatenated feed") {
    val t = table("t_parity")
    val feed = Seq(
      df((1, "a", "2024-01-01"), (2, "p", "2024-01-01")),
      df((1, "b", "2024-02-01"), (2, "p", "2024-02-01"), (3, "x", "2024-02-01")),
      df((1, "b", "2024-03-01"), (3, "y", "2024-03-01")))
    feed.foreach(b => Scd2.merge(spark, t, b, Seq("k"), Seq("v"), "eff"))
    // direct derivation: change-compress the concatenated snapshots per
    // key, then interval-ize — the w8-style read-side spelling
    val all = feed.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("eff")
    val direct = all
      .withColumn("_chg", lag(col("v"), 1).over(w).isNull ||
        !(col("v") <=> lag(col("v"), 1).over(w)))
      .filter(col("_chg"))
      .withColumn("valid_to", lead(col("eff"), 1).over(w))
      .select(col("k"), col("v"), col("eff").cast("string").as("valid_from"),
        coalesce(col("valid_to").cast("string"), lit("-")).as("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .as[(Int, String, String, String, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(history(t) == direct)
  }
}
