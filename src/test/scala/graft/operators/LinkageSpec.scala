package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("name_a", "name_b", "dist")
      .as[(String, String, Int)].collect().toSet

  test("the block cap is results-neutral when no block exceeds it (TPC-H names)") {
    val names = graft.Tables.load(spark, "/root/testdata/sf0.001", "part")
      .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_parts"))
    val blk = get(split(col("name"), " "), lit(1))
    val capped = pairSet(Linkage.blockedFuzzyPairs(names, "name", blk,
      maxDist = 4, maxBlockSize = 256))
    val uncapped = pairSet(Linkage.blockedFuzzyPairs(names, "name", blk,
      maxDist = 4, maxBlockSize = 1000000))
    assert(capped.nonEmpty, "the fixture must produce candidate pairs")
    assert(capped == uncapped,
      "cap must be bit-neutral while every block fits under it")
  }

  test("a planted 10k-name hot block is flattened to the cap's pair bound") {
    // the quadratic bomb the cap exists for: 10k names sharing one
    // block would emit ~50M candidate pairs; the cap keeps the 32
    // first names and bounds the block at 32*31/2
    val hot = spark.range(10000)
      .select(format_string("hot name%05d", $"id").as("name"), lit(1L).as("w"))
    val out = Linkage.blockedFuzzyPairs(hot, "name",
      split(col("name"), " ").getItem(0), maxDist = 20, maxBlockSize = 32)
    val n = out.count()
    assert(n <= 32L * 31 / 2, s"hot block not flattened: $n pairs")
    // the keep rule is the 32 FIRST names in name order — deterministic
    val maxName = out.agg(max(greatest($"name_a", $"name_b"))).as[String].head()
    assert(maxName == "hot name00031",
      s"cap must keep the name-ordered prefix, saw $maxName")
  }

  test("NULL block keys fall back to an explicit singleton, not a silent drop") {
    // single-word names: get(..., 1) is NULL (getItem would THROW under
    // ANSI mode). Default policy blocks the row under its own name —
    // present but isolated (distinct names never share a singleton),
    // the DOCUMENTED no-pair outcome
    val names = Seq(("alpha", 1L), ("alphb", 1L), ("beta brass", 1L),
      ("betb brass", 1L)).toDF("name", "n")
    val blk = get(split(col("name"), " "), lit(1))
    val dflt = Linkage.blockedFuzzyPairs(names, "name", blk, maxDist = 2)
    assert(pairSet(dflt) == Set(("beta brass", "betb brass", 1)),
      "singleton fallback: null-block rows pair with nothing")
    // a caller-supplied coarser fallback lets null-key rows pair with
    // EACH OTHER — the explicit opt-in the default withholds
    val pooled = Linkage.blockedFuzzyPairs(names, "name", blk, maxDist = 2,
      nullBlockKey = Some(lit("_nullblock")))
    assert(pairSet(pooled) ==
      Set(("beta brass", "betb brass", 1), ("alpha", "alphb", 1)),
      "pooled fallback: null-block rows become their own block")
  }

  test("carry columns ride through with _a/_b suffixes; distance is thresholded") {
    val names = Seq(("aaaa x", 3L), ("aaab x", 7L), ("zzzz x", 1L))
      .toDF("name", "n_parts")
    val out = Linkage.blockedFuzzyPairs(names, "name",
      get(split(col("name"), " "), lit(1)), maxDist = 1)
    val rows = out.select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
      .as[(String, String, Int, Long, Long)].collect().toSet
    // zzzz is 4 edits from both others — excluded by the threshold
    assert(rows == Set(("aaaa x", "aaab x", 1, 3L, 7L)), s"got $rows")
  }

  test("degenerate knobs fail loudly") {
    val names = Seq(("a b", 1L)).toDF("name", "n")
    intercept[IllegalArgumentException] {
      Linkage.blockedFuzzyPairs(names, "name", lit("x"), maxBlockSize = 1)
    }
    intercept[IllegalArgumentException] {
      Linkage.blockedFuzzyPairs(names, "name", lit("x"), maxDist = -1)
    }
    intercept[IllegalArgumentException] {
      Linkage.blockedFuzzyPairs(names, "nope", lit("x"))
    }
  }
}
