package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, file-index, scheduler) so the first
    // timed query doesn't absorb ~3s of one-time init
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    var failures = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        failures ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // persisted intermediates: no cross-query skew
      graft.operators.Dedup.releaseCaches(spark) // incl. checkpoint blocks
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fails,"sf":"$sfDir"}""")
    spark.stop()
  }
}
