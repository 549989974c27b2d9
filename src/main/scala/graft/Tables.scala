package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized
  * reader, predicate pushdown and column pruning apply. At cluster scale
  * the same views would be external tables (or JDBC sources, as in the
  * reference — /root/reference/main.py:25-41 pushes a join+projection to
  * Postgres; /root/reference/main.py:51-55 pushes a projection to Mongo).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Single source of truth for name -> loader (events needs its special
    * nanos->micros loader, so this is NOT just `all.map(apply)`).
    */
  def loaders: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "region" -> (region _), "nation" -> (nation _),
    "customer" -> (customer _), "supplier" -> (supplier _),
    "part" -> (part _), "orders" -> (orders _),
    "lineitem" -> (lineitem _), "events" -> (events _),
    "documents" -> (documents _), "embeddings" -> (embeddings _))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4 rejects by
    * default ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and convert to a
    * microsecond timestamp (`ts div 1000` — the corpus has at most
    * microsecond resolution, so this is lossless; the oracle casts its
    * TIMESTAMP_NS to TIMESTAMP identically).
    *
    * The nanosAsLong flag must be set by the SESSION BUILDER (Verify /
    * Bench / Explain / StreamDemo and the test fixture all do) — a loader
    * silently mutating session conf would change how every later
    * TIMESTAMP(NANOS) read behaves, so this fails fast instead.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(
      s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): set " +
        "spark.sql.legacy.parquet.nanosAsLong=true in the SparkSession builder")
    apply(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
