package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Negative + positive pins for the Verify output-surface lint (round-10
  * verdict item 2): the gate that turns a would-be driver red (DECIMAL
  * or nested output column) into a named build-time failure.
  */
class VerifySurfaceSpec extends AnyFunSuite {

  test("lint rejects DECIMAL and nested columns, naming them") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("money", DecimalType(12, 2)),
      StructField("keys", ArrayType(LongType)),
      StructField("meta", StructType(Seq(StructField("a", StringType)))),
      StructField("m", MapType(StringType, LongType))))
    val bad = Verify.surfaceViolations(schema).map(_._1)
    assert(bad == Seq("money", "keys", "meta", "m"))
    val e = intercept[IllegalArgumentException](
      Verify.lintSurface("q_test", schema))
    assert(e.getMessage.contains("q_test") && e.getMessage.contains("money"))
  }

  test("lint passes every scalar driver-gate type") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("dt", DateType), StructField("ts", TimestampType)))
    assert(Verify.surfaceViolations(schema).isEmpty)
    Verify.lintSurface("q_ok", schema)
  }

  test("every registered driver query passes the lint at sf0.001") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val vs = try Verify.surfaceViolations(fn(spark, dir).schema)
        catch { case _: Throwable => Nil } // runtime errs are other specs' job
        if (vs.isEmpty) Nil else Seq(s"$name: ${vs.mkString(", ")}")
    }
    assert(bad.isEmpty, s"queries with gate-unhashable surfaces:\n  " +
      bad.mkString("\n  "))
  }
}
