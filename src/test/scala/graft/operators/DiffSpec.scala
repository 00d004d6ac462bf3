package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def diff(o: org.apache.spark.sql.DataFrame,
      n: org.apache.spark.sql.DataFrame) =
    Diff.snapshotDiff(o, n, Seq("k"))
      .select("k", "op", "v_old", "v_new")
      .as[(Long, String, Option[String], Option[String])].collect().toSet

  test("I/U/D classes; unchanged keys drop; null-safe value compare") {
    val o = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (4L, Option.empty[String]), (5L, Option.empty[String]))
      .toDF("k", "v")
    val n = Seq((2L, Some("b")), (3L, Some("c2")),
      (4L, Option.empty[String]), (5L, Some("now-set")), (6L, Some("new")))
      .toDF("k", "v")
    val got = diff(o, n)
    assert(got == Set(
      (1L, "D", Some("a"), None),
      (3L, "U", Some("c"), Some("c2")),
      (5L, "U", None, Some("now-set")), // NULL -> value IS a change
      (6L, "I", None, Some("new"))),
      s"got $got")
    // 2 (identical) and 4 (NULL == NULL under <=>) must not appear
  }

  test("NULL keys match each other (the null-safe upsert family's contract)") {
    val o = Seq((Option.empty[Long], "x")).toDF("k", "v")
    val n = Seq((Option.empty[Long], "y")).toDF("k", "v")
    val got = Diff.snapshotDiff(o, n, Seq("k"))
      .select("op", "v_old", "v_new").as[(String, String, String)]
      .collect().toSet
    assert(got == Set(("U", "x", "y")),
      s"null keys must fold to one U row, not I+D: $got")
  }

  test("keys-only snapshots diff on membership alone") {
    val o = Seq(1L, 2L).toDF("k")
    val n = Seq(2L, 3L).toDF("k")
    val got = Diff.snapshotDiff(o, n, Seq("k"))
      .select("k", "op").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "D"), (3L, "I")))
  }

  test("schema mismatch and bad keys fail loudly") {
    val o = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(o, Seq((1L, "a", 2L)).toDF("k", "v", "w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(o, o, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(o, o, Nil)
    }
  }

  test("plan: one keyed full-outer join — never a cartesian") {
    val o = Seq((1L, "a")).toDF("k", "v")
    val p = Diff.snapshotDiff(o, o, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
