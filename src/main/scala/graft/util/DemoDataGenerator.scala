package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo-data generator mirroring the reference's
  * `src/utils/data_generator.py:27-308` (same schemas, value domains,
  * and file formats: customers → CSV, products → JSON, transactions →
  * parquet) — but generated DISTRIBUTED and DETERMINISTIC: columns are
  * derived from `xxhash64(seed, id, salt)` uniforms over `spark.range`,
  * so any row count scales out across executors with no driver-side
  * loop (the reference builds Python lists on the driver) and the same
  * seed always yields the same data.
  */
object DemoDataGenerator {

  private val firstNames = Seq("John", "Jane", "Robert", "Mary", "Michael",
    "Lisa", "David", "Sarah", "James", "Emily", "William", "Olivia",
    "Richard", "Emma", "Joseph", "Sophia", "Thomas", "Isabella", "Charles", "Mia")
  private val lastNames = Seq("Smith", "Johnson", "Williams", "Jones", "Brown",
    "Davis", "Miller", "Wilson", "Moore", "Taylor", "Anderson", "Thomas",
    "Jackson", "White", "Harris", "Martin", "Thompson", "Garcia",
    "Martinez", "Robinson")
  private val categories = Seq("Electronics", "Clothing", "Home", "Kitchen",
    "Toys", "Books", "Sports", "Beauty", "Grocery", "Automotive")
  private val states = Seq("CA", "NY", "TX", "FL", "IL", "PA", "OH", "GA", "NC", "MI")
  private val payments = Seq("Credit Card", "Debit Card", "Cash", "PayPal",
    "Apple Pay", "Google Pay")

  /** Deterministic uniform in [0, 1) per row from (seed, salt, id). */
  private def u(seed: Long, salt: Int): Column =
    pmod(xxhash64(lit(seed), lit(salt), col("id")), lit(1000000L)) / 1000000.0

  /** Deterministic integer in [lo, hi] per row. */
  private def ri(seed: Long, salt: Int, lo: Int, hi: Int): Column =
    (u(seed, salt) * (hi - lo + 1)).cast("int") + lo

  private def pick(vals: Seq[String], seed: Long, salt: Int): Column =
    element_at(array(vals.map(lit): _*), ri(seed, salt, 1, vals.size))

  private def r2(c: Column): Column = round(c, 2)

  /** Customers (reference data_generator.py:93-134). `asOf` anchors the
    * registration-date window (reference used wall-clock now).
    */
  def customers(spark: SparkSession, n: Long, asOf: String,
      seed: Long = 42L): DataFrame =
    spark.range(1, n + 1).toDF("id").select(
      format_string("C%05d", col("id")).as("customer_id"),
      pick(firstNames, seed, 1).as("first_name"),
      pick(lastNames, seed, 2).as("last_name"),
      concat(lower(pick(firstNames, seed, 1)), lit("."),
        lower(pick(lastNames, seed, 2)), lit("@example.com")).as("email"),
      format_string("555-%03d-%04d",
        ri(seed, 3, 100, 999), ri(seed, 4, 1000, 9999)).as("phone"),
      format_string("%d Main St", ri(seed, 5, 100, 999)).as("address"),
      lit("Anytown").as("city"),
      pick(states, seed, 6).as("state"),
      format_string("%05d", ri(seed, 7, 10000, 99999)).as("zip_code"),
      date_sub(to_date(lit(asOf)), ri(seed, 8, 1, 365 * 3)).as("registration_date"))

  /** Products (reference data_generator.py:136-173): price $5–500, cost
    * 50–80 % of price.
    */
  def products(spark: SparkSession, n: Long, seed: Long = 43L): DataFrame =
    spark.range(1, n + 1).toDF("id").select(
      format_string("P%05d", col("id")).as("product_id"),
      concat(pick(categories, seed, 1), lit(" Item "), col("id")).as("product_name"),
      pick(categories, seed, 1).as("category"),
      r2(u(seed, 2) * 495.0 + 5.0).as("price"),
      r2((u(seed, 2) * 495.0 + 5.0) * (u(seed, 3) * 0.3 + 0.5)).as("cost"),
      format_string("S%03d", ri(seed, 4, 1, 20)).as("supplier_id"),
      concat(lit("Description for "), pick(categories, seed, 1),
        lit(" Item "), col("id")).as("description"))

  /** Transactions (reference data_generator.py:175-267): quantity 1–5,
    * $10–200 per item, over `spanDays` starting at `startDate` (the
    * reference anchored at now−90d; anchoring at the run date keeps the
    * demo silver layer's processing-date filter meaningful).
    * Transaction ids are deterministic digests, standing in for the
    * reference's uuid4.
    */
  def transactions(spark: SparkSession, n: Long, numCustomers: Long,
      numProducts: Long, startDate: String, spanDays: Int = 90,
      seed: Long = 44L): DataFrame =
    spark.range(1, n + 1).toDF("id").select(
      md5(concat(lit("tx-"), lit(seed), lit("-"), col("id"))).as("transaction_id"),
      format_string("C%05d", ri(seed, 1, 1, numCustomers.toInt)).as("customer_id"),
      format_string("P%05d", ri(seed, 2, 1, numProducts.toInt)).as("product_id"),
      date_add(to_date(lit(startDate)), ri(seed, 3, 0, spanDays)).as("transaction_date"),
      timestamp_seconds(
        unix_timestamp(date_add(to_date(lit(startDate)), ri(seed, 3, 0, spanDays))
          .cast("timestamp"))
          + ri(seed, 4, 8, 20) * 3600L + ri(seed, 5, 0, 59) * 60L
          + ri(seed, 6, 0, 59)).as("transaction_time"),
      r2(r2(u(seed, 7) * 190.0 + 10.0) * ri(seed, 8, 1, 5)).as("amount"),
      ri(seed, 8, 1, 5).as("quantity"),
      format_string("ST%02d", ri(seed, 9, 1, 10)).as("store_id"),
      pick(payments, seed, 10).as("payment_method"))

  /** Generate and save the demo trio in the reference's formats
    * (data_generator.py:267-308): 500 customers CSV, 1,000 products
    * JSON, 5,000 transactions parquet.
    */
  def generateAndSave(spark: SparkSession, outDir: String, startDate: String,
      numCustomers: Long = 500, numProducts: Long = 1000,
      numTransactions: Long = 5000): Unit = {
    customers(spark, numCustomers, startDate)
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/customers")
    products(spark, numProducts)
      .coalesce(1).write.mode("overwrite").json(s"$outDir/products")
    transactions(spark, numTransactions, numCustomers, numProducts, startDate)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/transactions")
  }
}
