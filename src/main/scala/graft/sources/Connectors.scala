package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Config-gated external connectors — the literal source/sink shapes of the
  * reference, selected at runtime by session conf, with the sandbox's
  * parquet stand-ins as the default path.
  *
  *   - S1: relational source, join+projection pushed INTO the database
  *     (/root/reference/main.py:25-41 runs the customers⨝loans SQL inside
  *     Postgres via pd.read_sql_query; connect_postgres.py:15-23 holds the
  *     connection settings). Spark twin: `spark.read.format("jdbc")` with
  *     the SAME query pushed down, so only result rows cross the wire.
  *   - S2: document-collection source with projection
  *     (/root/reference/main.py:51-55 reads Mongo `loan_extensions` with a
  *     field projection; schemaless docs may MISS `emi_collected`,
  *     main.py:87). Spark twin: schema-on-read JSON Lines — missing fields
  *     surface as nulls, flowing into the same coalesce-to-0 path.
  *   - S3/S4: replace-mode relational sink (/root/reference/main.py:204-219
  *     `to_sql(..., if_exists="replace")`). Spark twin: `write.jdbc` in
  *     Overwrite mode with `truncate=true` (TRUNCATE + parallel INSERT
  *     keeps the table's grants/indexes, vs DROP+CREATE losing them — and
  *     is the only replace that is safe to retry per-partition).
  *
  * The gate defaults to the parquet fixtures; the JDBC paths are EXECUTED
  * against embedded Derby in JdbcRoundtripSpec (pushed-down join read,
  * create + truncate-overwrite writes), and the option maps are additionally
  * unit-tested in ConnectorsSpec. A cluster run against a real database
  * needs only its driver jar on the classpath and `graft.jdbc.*` conf.
  */
object Connectors {

  /** Session-conf keys (the Spark analogue of connect_postgres.py's .env). */
  val UrlKey = "graft.jdbc.url"
  val UserKey = "graft.jdbc.user"
  val PasswordKey = "graft.jdbc.password"

  /** Docs-collection override: a JSON-Lines directory standing in for the
    * Mongo collection (main.py:51-55). Unset → the lineitem-derived frame.
    */
  val DocsPathKey = "graft.docs.path"

  /** The reference's source query VERBATIM in shape (main.py:25-41): the
    * customers⨝loans join and 9-column projection evaluate inside the
    * database; Spark sees only the result cursor.
    */
  val sourceJoinQuery: String = """
    SELECT
        c.customer_id,
        c.customer_name,
        l.loan_id,
        l.disbursement_amount,
        l.disbursement_date,
        l.due_date,
        l.region,
        l.interest_rate,
        l.pos
    FROM customer_mgmt.customers c
    JOIN loan_mgmt.loans l
        ON c.loan_id = l.loan_id""".trim

  def jdbcUrl(spark: SparkSession): Option[String] =
    spark.conf.getOption(UrlKey)

  private def credentials(spark: SparkSession): Map[String, String] =
    spark.conf.getOption(UserKey).map("user" -> _).toMap ++
      spark.conf.getOption(PasswordKey).map("password" -> _).toMap

  /** Single-cursor read options: the whole pushed-down query through one
    * connection. Right for dimension-sized results; see
    * [[partitionedReadOptions]] for the fact-sized path.
    */
  def readOptions(url: String, query: String,
    creds: Map[String, String] = Map.empty): Map[String, String] =
    creds ++ Map(
      "url" -> url,
      "query" -> query,
      // rows per network round-trip: the Postgres driver default (0) reads
      // the ENTIRE result set into driver memory before the first row
      "fetchsize" -> "10000")

  /** Partition-parallel read options. Spark's JDBC source rejects `query`
    * combined with `partitionColumn`, so the pushed-down SQL becomes a
    * derived-table `dbtable`; each of `numPartitions` tasks then reads its
    * own `WHERE partCol BETWEEN ...` slice through its own connection — the
    * difference between one cursor and a saturated database at 100 TB.
    * Bounds come from the caller (a cheap MIN/MAX query or table stats);
    * they clip nothing — rows outside land in the edge partitions.
    */
  def partitionedReadOptions(url: String, query: String, partCol: String,
    lower: Long, upper: Long, numPartitions: Int,
    creds: Map[String, String] = Map.empty): Map[String, String] =
    creds ++ Map(
      "url" -> url,
      "dbtable" -> s"(${query.trim}) AS src",
      "partitionColumn" -> partCol,
      "lowerBound" -> lower.toString,
      "upperBound" -> upper.toString,
      "numPartitions" -> numPartitions.toString,
      "fetchsize" -> "10000")

  /** Replace-mode sink options (main.py:204-219 `if_exists="replace"`).
    * `truncate` makes Overwrite TRUNCATE-then-INSERT instead of
    * DROP-then-CREATE; `batchsize` batches the executor-side INSERTs;
    * `isolationLevel=NONE` skips per-batch transactions — the write is
    * idempotent under replace semantics, so retry safety comes from the
    * truncate, not from transaction isolation.
    */
  def writeOptions(url: String, table: String,
    creds: Map[String, String] = Map.empty): Map[String, String] =
    creds ++ Map(
      "url" -> url,
      "dbtable" -> table,
      "truncate" -> "true",
      "batchsize" -> "10000",
      "isolationLevel" -> "NONE")

  /** S1 — the joined relational source: JDBC with the pushed-down join when
    * `graft.jdbc.url` is set, else the parquet stand-in (FIXTURES.md §B
    * mapping: orders→loans, customer→customers).
    */
  def relationalSource(spark: SparkSession, sfDir: String): DataFrame =
    jdbcUrl(spark) match {
      case Some(url) =>
        spark.read.format("jdbc")
          .options(readOptions(url, sourceJoinQuery, credentials(spark)))
          .load()
      case None =>
        graft.loan.LoanDomain.customers(spark, sfDir)
          .join(graft.loan.LoanDomain.loans(spark, sfDir),
            Seq("customer_id"), "inner")
    }

  /** S2 — the document-collection source with Mongo-style projection:
    * schema-on-read JSON Lines when `graft.docs.path` is set (docs missing
    * `emi_collected` yield nulls — exactly main.py:87's `.get(...) or 0`
    * input), else the lineitem-derived stand-in.
    */
  def loanExtensionsSource(spark: SparkSession, sfDir: String): DataFrame =
    spark.conf.getOption(DocsPathKey) match {
      case Some(path) => documentCollection(spark, path,
        Seq("loan_id", "product_type", "emi_collected"))
      case None => graft.loan.LoanDomain.loanExtensions(spark, sfDir)
    }

  /** Projected schema-on-read over a JSON-Lines directory — the Spark shape
    * of `collection.find({}, projection)` (main.py:51-55). Schema inference
    * unions the fields seen across docs; a field absent from a doc is null
    * in its row, and a field absent from the WHOLE collection is added as
    * an all-null column so downstream code sees a stable schema.
    */
  def documentCollection(spark: SparkSession, path: String,
    fields: Seq[String]): DataFrame = {
    val raw = spark.read.json(path)
    val withAll = fields.foldLeft(raw) { (df, f) =>
      if (df.columns.contains(f)) df
      else df.withColumn(f, org.apache.spark.sql.functions.lit(null))
    }
    withAll.select(fields.map(col): _*)
  }

  /** S3/S4 — replace-mode sink: `write.jdbc` when configured, else the
    * warehouse managed table ([[Warehouse.replaceTable]]).
    */
  def replaceSink(df: DataFrame, table: String): Unit =
    jdbcUrl(df.sparkSession) match {
      case Some(url) =>
        df.write.mode(SaveMode.Overwrite).format("jdbc")
          .options(writeOptions(url, table, credentials(df.sparkSession)))
          .save()
      case None => Warehouse.replaceTable(df, table)
    }
}
