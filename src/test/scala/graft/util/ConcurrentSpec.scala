package graft.util

import graft.SparkSpec

/** Focused r19 test for [[Concurrent.all]], the guide-§2.6 overlap of
  * independent Spark actions the recall matrices (v17/sp4/sp5) use for
  * their probe counts. The contract under test: results come back in
  * INPUT order (not completion order — the rows the oracle hashes are
  * built positionally from this sequence), real Spark actions can run
  * concurrently against one session, and a failing thunk surfaces its
  * ORIGINAL exception, not an ExecutionException wrapper.
  */
class ConcurrentSpec extends SparkSpec {

  test("results return in input order, not completion order") {
    // later thunks finish first: input order must still win
    val out = Concurrent.all(Seq(
      () => { Thread.sleep(150); "slow" },
      () => { Thread.sleep(50); "mid" },
      () => "fast"))
    assert(out === Seq("slow", "mid", "fast"))
  }

  test("independent Spark count actions overlap and agree with serial") {
    import spark.implicits._
    val df = (1L to 10000L).toDF("v").persist()
    try {
      val thunks: Seq[() => Long] = Seq(
        () => df.filter($"v" % 2 === 0).count(),
        () => df.filter($"v" % 3 === 0).count(),
        () => df.filter($"v" % 5 === 0).count())
      assert(Concurrent.all(thunks) === thunks.map(_()))
    } finally df.unpersist()
  }

  test("a failing thunk rethrows its original exception") {
    val boom = intercept[IllegalStateException] {
      Concurrent.all(Seq(
        () => 1,
        () => throw new IllegalStateException("probe died"),
        () => 3))
    }
    assert(boom.getMessage === "probe died")
  }

  test("single thunk runs inline") {
    assert(Concurrent.all(Seq(() => 42)) === Seq(42))
  }
}
