package graft.relational

import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.{Det, GraftQuery}

/** Core relational coverage on the raw corpus tables — scan + pushed-down
  * filter + multi-measure hash agg, and a star join with broadcast dims.
  * These are the bench headliners: at sf0.1 they touch the 600k-row
  * lineitem; at 100 TB the same plans hold (filter reaches the parquet
  * scan as PushedFilters, dims broadcast, the single shuffle carries
  * partial agg states only).
  */
object RelationalQueries {

  /** Pricing summary (TPC-H Q1 shape): filtered scan + 8-measure hash agg
    * on a 6-value grouping key. Whole-stage-codegen'd end to end; the only
    * shuffle moves ~6 partial-state rows per partition.
    */
  val pricingSummary: GraftQuery = GraftQuery(
    "pricing_summary",
    "filtered scan + multi-measure groupBy on lineitem (TPC-H Q1 shape)",
    RelationalOracle.pricingSummarySql) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.sumQ(col("l_quantity")).as("sum_qty"),
        Det.sumQ(col("l_extendedprice")).as("sum_base_price"),
        Det.sumQ(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        Det.sumQ(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        Det.avgQ(col("l_quantity")).as("avg_qty"),
        Det.avgQ(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Revenue by nation (TPC-H Q5 shape): lineitem⋈orders shuffle join on the
    * fact keys; customer side joins then the 25-row nation dim is broadcast
    * (explicit hint — at any scale the dim stays driver-sized).
    */
  val revenueByNation: GraftQuery = GraftQuery(
    "revenue_by_nation",
    "star join (broadcast dim) + groupBy revenue per nation",
    RelationalOracle.revenueByNationSql) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(Det.sumQ(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Order-priority counts with a date-range filter pushed to the scan and a
    * left-semi existence check against lineitem (TPC-H Q4 shape).
    */
  val orderPriority: GraftQuery = GraftQuery(
    "order_priority_counts",
    "range filter + left_semi existence join + groupBy (TPC-H Q4 shape)",
    RelationalOracle.orderPrioritySql) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d).select("l_orderkey")
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  def all: Seq[GraftQuery] = Seq(pricingSummary, revenueByNation, orderPriority)
}
