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
  /** events.parquet has stored `ts` two different ways across testdata
    * generations, so this loader branches on the LOADED schema rather than
    * assuming either:
    *
    *  - TIMESTAMP(NANOS) (pre-2026-08-13 corpus): Spark 4 rejects it by
    *    default ([PARQUET_TYPE_ILLEGAL]); with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set by every session
    *    builder in this repo) it arrives as LongType → convert via
    *    `timestamp_micros(ts div 1000)` (corpus has at most microsecond
    *    resolution, so lossless).
    *  - timestamp[us] without UTC adjustment (current corpus): Spark 4
    *    reads it as TIMESTAMP_NTZ → `cast("timestamp")`, which under the
    *    pinned UTC session timezone preserves wall-clock values and the
    *    downstream TimestampType schema the oracles expect.
    *
    * Either way the loader's contract is stable: `ts` is TimestampType.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.parquet: unsupported dtype for column ts: $other " +
          "(expected TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
