package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.SourceConfig

/** Source dispatch (reference operators S1–S5): file (parquet/csv/json
  * with reader-option pass-through), JDBC query pushdown, and REST API
  * (GET → JSON lines → schema-inferred DataFrame via
  * `spark.createDataset(Seq(json))` — the Spark-native form of the
  * reference's parallelize-one-string trick, db_utils.py:45-74).
  */
object Sources {

  def read(spark: SparkSession, src: SourceConfig): DataFrame =
    src.sourceType match {
      case "file" => readFile(spark, src)
      case "jdbc" => readJdbc(spark, src)
      case "api" => readApi(spark, src)
      case other => throw new IllegalArgumentException(s"unknown source_type: $other")
    }

  def readFile(spark: SparkSession, src: SourceConfig): DataFrame = {
    val reader = spark.read.options(src.options)
    src.fileFormat match {
      case "parquet" => reader.parquet(src.sourcePath)
      case "csv" => reader.csv(src.sourcePath)
      case "json" => reader.json(src.sourcePath)
      case fmt => reader.format(fmt).load(src.sourcePath)
    }
  }

  /** Full query pushed to the RDBMS with fetchsize batching
    * (db_utils.py:12-42). Credentials resolve through `${ENV:...}`
    * substitution before this point.
    */
  def readJdbc(spark: SparkSession, src: SourceConfig): DataFrame =
    spark.read.format("jdbc")
      .option("url", src.sourcePath)
      .option("fetchsize", src.options.getOrElse("fetchsize", "10000"))
      .options(src.options)
      .load()

  /** HTTP GET (optional bearer token in options) → JSON payload →
    * DataFrame. One driver-side request by design: the reference's API
    * sources are small config/reference feeds; sharded fetching would
    * go through a partitioned table of URLs instead.
    */
  def readApi(spark: SparkSession, src: SourceConfig): DataFrame = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val builder = HttpRequest.newBuilder(java.net.URI.create(src.sourcePath))
    src.options.get("auth_token").foreach(t =>
      builder.header("Authorization", s"Bearer $t"))
    val resp = HttpClient.newHttpClient()
      .send(builder.GET().build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 400)
      throw new RuntimeException(s"API source ${src.sourceId}: HTTP ${resp.statusCode()}")
    import spark.implicits._
    // one dataset element per JSON record: split JSON-lines payloads;
    // a top-level array parses as a single element
    val body = resp.body()
    val records =
      if (body.trim.startsWith("[")) Seq(body)
      else body.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    spark.read.json(spark.createDataset(records))
  }
}
