package graft.io

import graft.SparkSpec

/** Catalog / DDL / maintenance operators (SURVEY.md §2.11, D1–D9) on
  * the in-memory catalog + parquet provider.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("D1/D7: create database if not exists + show databases") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_test")
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_test") // idempotent
    assert(spark.sql("SHOW DATABASES").as[String].collect().contains("ddl_test"))
  }

  test("D3/D4: create table via DDL and via empty DataFrame") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_test")
    spark.sql(
      """CREATE TABLE IF NOT EXISTS ddl_test.ddl_made (
        | id BIGINT, name STRING NOT NULL) USING parquet""".stripMargin)
    assert(spark.table("ddl_test.ddl_made").schema.fieldNames.toSeq ==
      Seq("id", "name"))
    spark.emptyDataset[(Long, String)].toDF("id", "name")
      .write.mode("ignore").saveAsTable("ddl_test.df_made")
    assert(spark.table("ddl_test.df_made").count() == 0)
  }

  test("D2/D5: drop and truncate") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_test")
    Seq((1, "a")).toDF("k", "v").write.mode("overwrite")
      .saveAsTable("ddl_test.trunc_me")
    spark.sql("TRUNCATE TABLE ddl_test.trunc_me")
    assert(spark.table("ddl_test.trunc_me").count() == 0)
    spark.sql("DROP TABLE IF EXISTS ddl_test.trunc_me")
    assert(!spark.catalog.tableExists("ddl_test.trunc_me"))
    spark.sql("DROP TABLE IF EXISTS ddl_test.trunc_me") // idempotent
  }

  test("D6/D8/D9: describe, refresh, existence check") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_test")
    Seq((1, "a")).toDF("k", "v").write.mode("overwrite")
      .saveAsTable("ddl_test.meta_t")
    assert(spark.catalog.tableExists("ddl_test.meta_t"))
    val cols = spark.catalog.listColumns("ddl_test.meta_t").collect()
    assert(cols.map(_.name).sorted.toSeq == Seq("k", "v"))
    spark.sql("REFRESH TABLE ddl_test.meta_t") // no-op correctness
    assert(spark.sql("DESCRIBE TABLE ddl_test.meta_t").count() >= 2)
  }

  test("K6: INSERT INTO ... VALUES on a parquet table") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_test")
    spark.sql("DROP TABLE IF EXISTS ddl_test.ins_t")
    spark.sql("CREATE TABLE ddl_test.ins_t (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO ddl_test.ins_t VALUES (1, 'x'), (2, 'y')")
    assert(spark.table("ddl_test.ins_t").count() == 2)
  }
}
