package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability, wired to the driver's correctness gate.
  *
  * Each implemented operator from SURVEY.md §2 (plus the extension surface)
  * registers exactly one `GraftQuery`:
  *   - `frame` builds the lazy Spark plan over the parquet tables in `sfDir`;
  *   - `oracle`, when present, is the ANSI-SQL twin the driver executes in
  *     DuckDB over the same tables (bare table names: region, nation,
  *     customer, supplier, part, orders, lineitem, events, documents,
  *     embeddings). Column names/types and row order must match the Spark
  *     result exactly — the driver hash-compares.
  *
  * Determinism contract (see SURVEY.md §5.2, §7.4): every query ends in a
  * total-order ORDER BY; double arithmetic keeps the same expression shape
  * on both sides (IEEE754 ops are deterministic given identical operand
  * order); order-sensitive double SUMs go through integer quantization
  * (exact, associative — see [[Det.sumQ]]; NOT a DECIMAL cast, whose
  * rounding differs between Spark and DuckDB).
  */
trait GraftQuery {
  def name: String

  /** One-line description for SURVEY §2 traceability. */
  def doc: String

  def frame(spark: SparkSession, sfDir: String): DataFrame

  /** DuckDB twin; None → driver records a weaker rows-only check. */
  def oracle: Option[String]

  /** True when the result is a single-row aggregate, which is exempt from
    * the "oracle ends in a total-order ORDER BY" structural invariant
    * (SmokeSpec) — a 1-row frame can't hash-flake on row order. Queries
    * self-declare via [[GraftQuery.oneRow]] so the exemption list can't
    * drift from the registry.
    */
  def singleRow: Boolean = false
}

object GraftQuery {
  def apply(n: String, d: String, sql: String)(
      f: (SparkSession, String) => DataFrame): GraftQuery = new GraftQuery {
    val name = n
    val doc = d
    def frame(spark: SparkSession, sfDir: String): DataFrame = f(spark, sfDir)
    val oracle = Option(sql)
  }

  /** A 1-row aggregate query: exempt from the ORDER-BY invariant (and
    * SmokeSpec asserts the frame really is 1 row, so the flag can't lie).
    */
  def oneRow(n: String, d: String, sql: String)(
      f: (SparkSession, String) => DataFrame): GraftQuery = new GraftQuery {
    val name = n
    val doc = d
    def frame(spark: SparkSession, sfDir: String): DataFrame = f(spark, sfDir)
    val oracle = Option(sql)
    override val singleRow = true
  }

  /** A query with no SQL-expressible oracle (driver does rows-only check). */
  def rowsOnly(n: String, d: String)(
      f: (SparkSession, String) => DataFrame): GraftQuery = new GraftQuery {
    val name = n
    val doc = d
    def frame(spark: SparkSession, sfDir: String): DataFrame = f(spark, sfDir)
    val oracle = None
  }
}
