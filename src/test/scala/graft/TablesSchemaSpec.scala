package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift guard.
  *
  * The driver regenerates /root/testdata between rounds and has changed
  * dtypes before (2026-08-13: events.ts went TIMESTAMP(NANOS) ->
  * timestamp[us], silently dropping 13 correctness rows and crashing two
  * bench runs). This spec pins every `Tables` loader's OUTPUT schema so a
  * regen that shifts a dtype fails loudly here, with a message naming the
  * table and column, instead of surfacing as analysis errors scattered
  * across the registry.
  *
  * Pins the loader CONTRACT, not the raw parquet footer: events.ts is
  * TimestampType whichever way the file stores it (Tables.events branches
  * on the loaded dtype); orders/lineitem date columns pass through as
  * TIMESTAMP_NTZ and downstream queries cast as needed.
  */
class TablesSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  test("every Tables loader matches its pinned schema on the current corpus") {
    val missing = expected.keySet -- Tables.loaders.map(_._1).toSet
    assert(missing.isEmpty, s"loaders with no pinned schema check: $missing")
    Tables.loaders.foreach { case (table, load) =>
      val actual = load(spark, sf).schema
      // both drift directions fail loudly BY NAME: a pin without a loader
      // is caught above, a loader without a pin is caught here (not via a
      // bare NoSuchElementException)
      val want = expected.getOrElse(table,
        fail(s"loader '$table' has no pinned schema — add a pin to TablesSchemaSpec"))
      assert(actual.fieldNames.toSeq === want.map(_._1),
        s"testdata drift: table '$table' columns changed " +
          s"(got ${actual.fieldNames.mkString(",")}; " +
          s"expected ${want.map(_._1).mkString(",")})")
      want.foreach { case (colName, dt) =>
        val got = actual(colName).dataType
        assert(got === dt,
          s"testdata drift: $table.$colName is $got, expected $dt — " +
            "the driver likely regenerated /root/testdata with a new dtype; " +
            "update the Tables loader (and this pin) deliberately")
      }
    }
  }
}
