package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.util.DemoDataGenerator

/** Self-contained demo loop — the analog of the reference's
  * `run_etl_demo.sh` (generate sample data → init metadata → run the
  * three layers → preview the result tables):
  *
  * {{{
  * sbt "runMain graft.pipeline.Demo"                 # everything under target/demo
  * sbt "runMain graft.pipeline.Demo --date 2024-06-01 --out /tmp/demo"
  * }}}
  */
object Demo {

  def main(argv: Array[String]): Unit = {
    var date = java.time.LocalDate.now().toString
    var out = "target/demo/raw"
    var warehouse = "target/demo/warehouse"
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--date" => date = argv(i + 1); i += 2
        case "--out" => out = argv(i + 1); i += 2
        case "--warehouse" => warehouse = argv(i + 1); i += 2
        case other => throw new IllegalArgumentException(
          s"unknown argument: $other (expected --date/--out/--warehouse)")
      }
    }
    val builder = SparkSession.builder().appName("graft-demo")
      .config("spark.sql.warehouse.dir", warehouse)
    if (sys.props.get("spark.master").isEmpty) builder.master("local[*]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      println(s"[demo] generating sample data under $out (500 customers, " +
        "1000 products, 5000 transactions)")
      DemoDataGenerator.generateAndSave(spark, out, date)
      sys.props("GRAFT_DEMO_DIR") = out
      val exit = Main.run(spark,
        Main.Args(date, Seq("bronze", "silver", "gold"), "configs/demo", None))
      println("-- gold previews --")
      for (t <- Seq("gold.daily_sales_by_category",
        "gold.customer_purchase_summary", "gold.product_performance")) {
        println(s"[demo] $t (${spark.table(t).count()} rows)")
        spark.table(t).show(10, truncate = false)
      }
      if (exit != 0) sys.exit(exit)
    } finally {
      sys.props.remove("GRAFT_DEMO_DIR")
      spark.stop()
    }
  }
}
