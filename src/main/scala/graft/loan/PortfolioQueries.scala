package graft.loan

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{Det, GraftQuery}

/** Portfolio rollups over the loan_final relation — the aggregation /
  * window / sort / set-op / semi-anti-join categories the reference has no
  * instance of (SURVEY.md §2.5: "absent" rows). Each is the natural consumer
  * query of `loan_final` (/root/reference/main.py:204-210 just dumps the
  * table; these are what a portfolio analyst would run on it).
  *
  * Scale notes (100 TB story):
  *   - all aggregations are partial+final hash aggs (map-side combine) on
  *     low-cardinality keys (4 regions × 5 buckets) — the shuffle carries
  *     only the partial states, bytes not rows;
  *   - window top-k shuffles once on region and sorts within partitions;
  *   - double SUMs route through integer quantization (exact, associative)
  *     so results are identical at any partition count — see [[graft.api.Det]].
  */
object PortfolioQueries {

  private def lf(s: SparkSession, d: String): DataFrame =
    LoanDomain.loanFinalUnordered(s, d)

  /** Hash aggregation with multiple measures per (region, bucket). */
  val byRegion: GraftQuery = GraftQuery(
    "portfolio_by_region",
    "groupBy agg: loans/disbursed/arrear/avg-EMI per (region_cleaned, dpd_bucket)",
    PortfolioOracle.byRegionSql) { (s, d) =>
    lf(s, d)
      .groupBy(col("region_cleaned"), col("dpd_bucket"))
      .agg(
        count(lit(1)).as("loans"),
        Det.sumQ(col("disbursement_amount")).as("disbursed"),
        Det.sumQ(col("arrear")).as("total_arrear"),
        Det.avgQ(col("emi_amount")).as("avg_emi"))
      .orderBy(asc_nulls_first("region_cleaned"), asc_nulls_first("dpd_bucket"))
  }

  /** ROLLUP with grouping_id to disambiguate subtotal nulls from the real
    * null region (null passthrough of main.py:70-71 flows into loan_final).
    */
  val rollupQ: GraftQuery = GraftQuery(
    "portfolio_rollup",
    "rollup(region, bucket) + grouping_id subtotals",
    PortfolioOracle.rollupSql) { (s, d) =>
    lf(s, d)
      .rollup(col("region_cleaned"), col("dpd_bucket"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("loans"),
        Det.sumQ(col("arrear")).as("total_arrear"))
      .select("gid", "region_cleaned", "dpd_bucket", "loans", "total_arrear")
      .orderBy(col("gid"), asc_nulls_first("region_cleaned"), asc_nulls_first("dpd_bucket"))
  }

  /** CUBE — all four grouping-set combinations. */
  val cubeQ: GraftQuery = GraftQuery(
    "portfolio_cube",
    "cube(region, bucket) + grouping_id",
    PortfolioOracle.cubeSql) { (s, d) =>
    lf(s, d)
      .cube(col("region_cleaned"), col("dpd_bucket"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("loans"))
      .select("gid", "region_cleaned", "dpd_bucket", "loans")
      .orderBy(col("gid"), asc_nulls_first("region_cleaned"), asc_nulls_first("dpd_bucket"))
  }

  /** Top-k per group: row_number window, deterministic tie-break on loan_id.
    * Scale: one shuffle on region, per-partition sort, early filter rn<=5.
    */
  val topArrearsByRegion: GraftQuery = GraftQuery(
    "top_arrears_by_region",
    "window ranking: top-5 arrears per region (row_number <= k)",
    PortfolioOracle.topArrearsByRegionSql) { (s, d) =>
    val w = Window.partitionBy(col("region_cleaned"))
      .orderBy(desc("arrear"), asc("loan_id"))
    lf(s, d)
      .filter(col("arrear") > 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("region_cleaned"), col("rn").cast("int").as("rn"),
        col("loan_id"), col("arrear"))
      .orderBy(asc_nulls_first("region_cleaned"), col("rn"))
  }

  /** Running (cumulative) sum over an ordered window, on top of a hash agg.
    * The window sum runs over the QUANTIZED LONGS, not doubles: DuckDB's
    * windowed SUM uses segment-tree association while Spark's running frame
    * adds sequentially, so double window sums diverge in the low bits —
    * integer sums are exact under any association. Divide once at the end.
    */
  val monthlyRunning: GraftQuery = GraftQuery(
    "region_monthly_running",
    "analytic window: cumulative disbursement per region by month",
    PortfolioOracle.monthlyRunningSql) { (s, d) =>
    val w = Window.partitionBy(col("region_cleaned")).orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lf(s, d)
      .groupBy(col("region_cleaned"),
        trunc(col("disbursement_date"), "month").as("month"))
      .agg(sum(Det.quantize(col("disbursement_amount"))).as("disbursed_i"))
      .withColumn("cum_disbursed", sum(col("disbursed_i")).over(w) / lit(Det.pow10(4)))
      .withColumn("disbursed", col("disbursed_i") / lit(Det.pow10(4)))
      .select("region_cleaned", "month", "disbursed", "cum_disbursed")
      .orderBy(asc_nulls_first("region_cleaned"), col("month"))
  }

  /** DISTINCT (dropDuplicates) on a projection. */
  val distinctPairs: GraftQuery = GraftQuery(
    "region_bucket_distinct",
    "distinct (region_cleaned, dpd_bucket) pairs",
    PortfolioOracle.distinctPairsSql) { (s, d) =>
    lf(s, d)
      .select("region_cleaned", "dpd_bucket")
      .distinct()
      .orderBy(asc_nulls_first("region_cleaned"), asc_nulls_first("dpd_bucket"))
  }

  /** Left-semi join: customers holding at least one loan in arrears.
    * Semi joins ship only the join keys of the right side — at scale the
    * filtered key set is far smaller than the full loan_final row.
    */
  val overdueCustomers: GraftQuery = GraftQuery(
    "customers_overdue_semi",
    "left_semi join: customers with any arrear > 0",
    PortfolioOracle.overdueCustomersSql) { (s, d) =>
    LoanDomain.customers(s, d)
      .join(lf(s, d).filter(col("arrear") > 0), Seq("customer_id"), "left_semi")
      .orderBy("customer_id")
  }

  /** Left-anti join: fully-current customers (no loan in arrears). */
  val currentCustomers: GraftQuery = GraftQuery(
    "customers_current_anti",
    "left_anti join: customers with no arrear",
    PortfolioOracle.currentCustomersSql) { (s, d) =>
    LoanDomain.customers(s, d)
      .join(lf(s, d).filter(col("arrear") > 0), Seq("customer_id"), "left_anti")
      .orderBy("customer_id")
  }

  /** UNION / INTERSECT / EXCEPT in one result, tagged. Exercises null
    * handling in set ops (the null region participates; both engines treat
    * NULL as equal under set-op DISTINCT semantics).
    */
  val regionSetOps: GraftQuery = GraftQuery(
    "region_set_ops",
    "set ops: union/intersect/except of 90+DPD regions vs refund regions",
    PortfolioOracle.regionSetOpsSql) { (s, d) =>
    // Membership flags from ONE pass over loan_final, materialized via
    // localCheckpoint: the six set-op legs each re-plan their inputs
    // (exchange reuse does not fire across union/intersect/except legs —
    // measured 36 parquet scans), so without materialization the expensive
    // join+metrics chain runs 6x. localCheckpoint() instead of persist():
    // it truncates lineage without leaking a cache entry per invocation,
    // and keeps the 5-row relation on executors (no driver round-trip).
    val flags = lf(s, d)
      .groupBy(col("region_cleaned"))
      .agg(
        max(when(col("dpd_bucket") === "90+ DPD", 1).otherwise(0)).as("in_a"),
        max(when(col("amount_to_be_returned") > 0, 1).otherwise(0)).as("in_b"))
      .localCheckpoint()
    val a = flags.filter(col("in_a") === 1).select("region_cleaned")
    val b = flags.filter(col("in_b") === 1).select("region_cleaned")
    val u = a.union(b).distinct().withColumn("op", lit("union"))
    val i = a.intersect(b).withColumn("op", lit("intersect"))
    val e = a.except(b).withColumn("op", lit("except"))
    u.unionByName(i).unionByName(e)
      .select("op", "region_cleaned")
      .orderBy(col("op"), asc_nulls_first("region_cleaned"))
  }

  /** Global top-k: total order + limit. */
  val top10Arrears: GraftQuery = GraftQuery(
    "top10_arrears",
    "sort + limit: 10 largest arrears portfolio-wide",
    PortfolioOracle.top10ArrearsSql) { (s, d) =>
    lf(s, d)
      .orderBy(desc("arrear"), asc("loan_id"))
      .limit(10)
      .select("loan_id", "customer_name", "arrear", "dpd_bucket")
  }

  /** HLL++ approximate distinct. DuckDB's HLL differs bit-wise, so the
    * oracle checks the estimate's CONTRACT, not its bits: the output carries
    * the exact counts plus booleans attesting the estimate landed within its
    * documented error band (5-sigma slack at rsd=0.01), and the oracle
    * recomputes the exact counts and asserts the attestations are true.
    * At 100 TB this is THE way to count distinct keys: fixed-size sketch per
    * partition, no shuffle of raw values.
    */
  val approxDistinct: GraftQuery = GraftQuery(
    "product_type_approx_distinct",
    "approx_count_distinct (HLL++) vs exact, within-error-band attestation",
    PortfolioOracle.approxDistinctSql) { (s, d) =>
    lf(s, d).agg(
      countDistinct(col("product_type")).as("exact_products"),
      countDistinct(col("customer_id")).as("exact_customers"),
      approx_count_distinct(col("product_type")).as("ap"),
      approx_count_distinct(col("customer_id"), 0.01).as("ac"))
      .select(
        col("exact_products"), col("exact_customers"),
        (abs(col("ap") - col("exact_products")) <=
          greatest(lit(1.0), col("exact_products") * lit(0.1)))
          .as("products_est_ok"),
        (abs(col("ac") - col("exact_customers")) <=
          greatest(lit(5.0), col("exact_customers") * lit(0.05)))
          .as("customers_est_ok"))
  }

  /** Greenwald-Khanna quantile sketch (approx_percentile). Like HLL++, the
    * sketch's bits differ from DuckDB's, so the oracle checks the sketch's
    * CONTRACT: each approx percentile must lie inside the exact value
    * bracket [percentile(p-0.02), percentile(p+0.02)] — generous vs the
    * sketch's rank guarantee of 1/10000 — and the oracle asserts the
    * attestations hold. The exact nearest-rank twin (`arrear_percentiles`)
    * is the value-checked surface; this is the mergeable-sketch path that
    * avoids the global sort at 100 TB (the exact `percentile` here exists
    * only to ground the attestation).
    */
  val approxQuantiles: GraftQuery = GraftQuery(
    "arrear_approx_quantiles",
    "approx_percentile sketch p50/p90/p99 of arrear, rank-bracket attestation vs exact",
    PortfolioOracle.approxQuantilesSql) { (s, d) =>
    lf(s, d).agg(
      expr("approx_percentile(arrear, array(0.5, 0.9, 0.99), 10000)").as("ap"),
      expr("percentile(arrear, array(0.48, 0.52, 0.88, 0.92, 0.97, 1.0))").as("ex"),
      count(lit(1)).as("n"))
      .select(
        col("n"),
        element_at(col("ap"), 1)
          .between(element_at(col("ex"), 1), element_at(col("ex"), 2)).as("p50_ok"),
        element_at(col("ap"), 2)
          .between(element_at(col("ex"), 3), element_at(col("ex"), 4)).as("p90_ok"),
        element_at(col("ap"), 3)
          .between(element_at(col("ex"), 5), element_at(col("ex"), 6)).as("p99_ok"))
  }

  /** Exact nearest-rank percentiles per region: rank every arrear in its
    * region once (one shuffle + sort), pick the floor((n-1)*p)+1 ranked
    * value. Nearest-rank (no interpolation) keeps the arithmetic pure
    * integer + one value pick, so both engines agree bit-exactly —
    * interpolating percentile implementations differ in operation order.
    */
  val arrearPercentiles: GraftQuery = GraftQuery(
    "arrear_percentiles",
    "exact nearest-rank p50/p90/p99 of arrear per region via one ranking window",
    PortfolioOracle.arrearPercentilesSql) { (s, d) =>
    val w = Window.partitionBy(col("region_cleaned"))
      .orderBy(col("arrear"), col("loan_id"))
    val ranked = lf(s, d)
      .select(col("region_cleaned"), col("arrear"), col("loan_id"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("region_cleaned"))))
    def pick(p: Double, name: String) =
      max(when(col("rk") === floor((col("n") - 1) * p) + 1, col("arrear")))
        .as(name)
    ranked.groupBy(col("region_cleaned"))
      .agg(pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99"))
      .orderBy(asc_nulls_first("region_cleaned"))
  }

  /** The whole ranking-function family over one window: row_number, rank,
    * dense_rank, percent_rank, ntile — all integer/exact-arithmetic based,
    * so bit-exact across engines (percent_rank = (rank-1)/(n-1), one
    * division).
    */
  val rankFamily: GraftQuery = GraftQuery(
    "arrear_rank_family",
    "ranking windows: row_number/rank/dense_rank/percent_rank/ntile over arrears",
    PortfolioOracle.rankFamilySql) { (s, d) =>
    val w = Window.partitionBy(col("dpd_bucket")).orderBy(desc("arrear"), col("loan_id"))
    lf(s, d)
      .filter(col("arrear") > 0)
      .select(
        col("dpd_bucket"), col("loan_id"), col("arrear"),
        row_number().over(w).cast("int").as("rn"),
        rank().over(w).cast("int").as("rk"),
        dense_rank().over(w).cast("int").as("drk"),
        percent_rank().over(w).as("prk"),
        ntile(4).over(w).cast("int").as("quartile"))
      .filter(col("rn") <= 3)
      .orderBy(col("dpd_bucket"), col("rn"))
  }

  /** PIVOT: dpd_bucket values become columns (fixed value list — at scale
    * an unpinned pivot forces an extra distinct-values job; pinning keeps
    * it one pass).
    */
  val bucketPivot: GraftQuery = GraftQuery(
    "region_bucket_pivot",
    "pivot dpd_bucket values into per-region count columns",
    PortfolioOracle.bucketPivotSql) { (s, d) =>
    bucketPivotFrame(s, d).orderBy(asc_nulls_first("region_cleaned"))
  }

  /** UNPIVOT (melt): the wide per-region bucket counts back to long form —
    * the inverse operator, with the zeros the pivot materialized kept as
    * rows (a plain GROUP BY would omit empty (region, bucket) combos).
    * Pure per-row expansion: no shuffle beyond the pivot's own aggregation
    * and the presentation sort.
    */
  val bucketUnpivot: GraftQuery = GraftQuery(
    "region_bucket_unpivot",
    "unpivot the per-region bucket count columns back to long form",
    PortfolioOracle.bucketUnpivotSql) { (s, d) =>
    bucketPivotFrame(s, d)
      .unpivot(
        Array(col("region_cleaned")),
        Array(col("current"), col("dpd_1_30"), col("dpd_31_60"),
          col("dpd_61_90"), col("dpd_90_plus")),
        "dpd_bucket", "n")
      .orderBy(asc_nulls_first("region_cleaned"), col("dpd_bucket"))
  }

  private def bucketPivotFrame(s: SparkSession, d: String) = {
    lf(s, d)
      .groupBy(col("region_cleaned"))
      .pivot("dpd_bucket",
        Seq("Current", "1–30 DPD", "31–60 DPD", "61–90 DPD", "90+ DPD"))
      .agg(count(lit(1)))
      .select(
        col("region_cleaned"),
        coalesce(col("Current"), lit(0L)).as("current"),
        coalesce(col("1–30 DPD"), lit(0L)).as("dpd_1_30"),
        coalesce(col("31–60 DPD"), lit(0L)).as("dpd_31_60"),
        coalesce(col("61–90 DPD"), lit(0L)).as("dpd_61_90"),
        coalesce(col("90+ DPD"), lit(0L)).as("dpd_90_plus"))
  }

  /** Arbitrary GROUPING SETS (not derivable from rollup/cube): totals by
    * region alone, by product alone, and by (bucket, product) — the
    * report-cube shape where only some combinations matter, computed in one
    * pass instead of three queries.
    */
  val groupingSets: GraftQuery = GraftQuery(
    "portfolio_grouping_sets",
    "GROUPING SETS (region), (product), (bucket, product) in one pass",
    PortfolioOracle.groupingSetsSql) { (s, d) =>
    // Dataset.groupingSets (Spark 4) — no temp-view side effect, so
    // concurrent builds over different sfDirs can't race on a view name.
    lf(s, d)
      .groupingSets(
        Seq(
          Seq(col("region_cleaned")),
          Seq(col("product_type")),
          Seq(col("dpd_bucket"), col("product_type"))),
        col("region_cleaned"), col("product_type"), col("dpd_bucket"))
      .agg(
        grouping_id(col("region_cleaned"), col("product_type"), col("dpd_bucket"))
          .cast("int").as("gid"),
        count(lit(1)).as("loans"),
        Det.sumQ(col("arrear")).as("total_arrear"))
      .select("gid", "region_cleaned", "dpd_bucket", "product_type",
        "loans", "total_arrear")
      .orderBy(col("gid"), asc_nulls_first("region_cleaned"),
        asc_nulls_first("dpd_bucket"), asc_nulls_first("product_type"))
  }

  /** RANGE window frame (vs the ROWS frames used elsewhere): trailing
    * 3-calendar-month disbursement sum per region, keyed on a month index
    * so the frame is value-based — months with no rows still age out of
    * the window, which a ROWS frame cannot express.
    */
  val trailing3mo: GraftQuery = GraftQuery(
    "region_trailing_3mo",
    "RANGE BETWEEN 2 PRECEDING frame: trailing 3-month disbursement per region",
    PortfolioOracle.trailing3moSql) { (s, d) =>
    val w = Window.partitionBy(col("region_cleaned")).orderBy(col("month_idx"))
      .rangeBetween(-2, Window.currentRow)
    lf(s, d)
      .groupBy(col("region_cleaned"),
        ((year(col("disbursement_date")) * 12 + month(col("disbursement_date")))
          .cast("long")).as("month_idx"))
      .agg(sum(Det.quantize(col("disbursement_amount"))).as("disb_i"))
      .withColumn("trailing_3mo",
        sum(col("disb_i")).over(w) / lit(Det.pow10(4)))
      .select(col("region_cleaned"), col("month_idx"),
        (col("disb_i") / lit(Det.pow10(4))).as("disbursed"), col("trailing_3mo"))
      .orderBy(asc_nulls_first("region_cleaned"), col("month_idx"))
  }

  /** Columns profiled by [[tableProfile]] — the id, the dirty inputs
    * (region carries genuine nulls, product_type/emi_collected come off a
    * left join), and representative derived metrics of every type.
    */
  val ProfileCols: Seq[String] = Seq(
    "loan_id", "customer_name", "region", "region_cleaned", "product_type",
    "emi_collected", "arrear", "dpd_bucket", "disbursement_date",
    "months_due")

  /** Generic data-quality profile of the flagship relation: per-column
    * row/null/exact-distinct counts — the ANALYZE/profiling surface a
    * warehouse exposes, here run against the engine's own output so the
    * null-region quirk and the left-join nullability are visible numbers.
    *
    * Shape: one scan unpivoted to (col_name, value) via a generator —
    * the shuffle carries |cols| x rows stringified cells, the same cost
    * envelope as the multi-distinct EXPAND plan Spark would otherwise
    * produce, but in long form so the reduce keys are the column names.
    * Stringification is per-column and round-trip injective (Java's
    * shortest double repr, ISO dates), so distinct counts equal the
    * native ones the oracle computes.
    */
  val tableProfile: GraftQuery = GraftQuery(
    "loan_table_profile",
    "per-column profile of loan_final: rows, nulls, exact distinct",
    PortfolioOracle.tableProfileSql) { (s, d) =>
    lf(s, d)
      .select(explode(array(ProfileCols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("cell"))
      .select(col("cell.col_name").as("col_name"), col("cell.v").as("v"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"))
      .orderBy("col_name")
  }

  /** Monthly discount rate for [[portfolioNpv]] (12% annualized). */
  val NpvMonthlyRate = 0.01

  /** Present value of the remaining repayment stream per region — the
    * portfolio-valuation consumer of `loan_final`: each open loan's
    * remaining months discount at [[NpvMonthlyRate]] per month, rolled up
    * to (region, open-loan count, nominal remaining, NPV, discount
    * haircut). The schedule explode is the G1 row multiplier shape;
    * discount factors quantize to 1e-9 per month-offset TYPE right after
    * the one `pow` (the BM25 ln recipe — cross-libm ulp exposure is
    * months-sized, not loans-sized), and every money sum is an exact
    * quantized LONG.
    */
  val portfolioNpv: GraftQuery = GraftQuery(
    "portfolio_npv",
    s"NPV of remaining EMIs at ${NpvMonthlyRate * 100}%/month per region: nominal, NPV, haircut",
    PortfolioOracle.npvSql) { (s, d) =>
    // loan_final drops duration_months (reference parity) — recompute it
    // from the dates with the same F2 calendar-month formula
    val base = lf(s, d)
      .select(col("region_cleaned"), col("loan_id"), col("emi_amount"),
        (LoanDomain.monthDiff(col("due_date"), col("disbursement_date"))
          - col("months_due")).as("remaining"))
      .filter(col("remaining") >= 1)
    val perLoan = base
      .withColumn("k", explode(sequence(lit(1), col("remaining"))))
      .withColumn("df",
        floor(pow(lit(1.0 / (1.0 + NpvMonthlyRate)), col("k")) * lit(1e9)
          + lit(0.5)) / lit(1e9))
      .groupBy(col("region_cleaned"), col("loan_id"), col("emi_amount"),
        col("remaining"))
      .agg((sum(Det.quantize(col("emi_amount") * col("df"), 4)) /
        lit(Det.pow10(4))).as("npv"))
    perLoan.groupBy(col("region_cleaned"))
      .agg(count(lit(1)).as("loans_open"),
        Det.sumQ(col("emi_amount") * col("remaining"), 4).as("nominal"),
        Det.sumQ(col("npv"), 4).as("npv_total"))
      .select(col("region_cleaned"), col("loans_open"), col("nominal"),
        col("npv_total"),
        ((col("nominal") - col("npv_total")) / col("nominal")).as("haircut"))
      .orderBy(asc_nulls_first("region_cleaned"))
  }

  /** Months-on-book grid for [[vintageAnalysis]]. */
  val VintageMobGrid: Seq[Int] = Seq(3, 6, 9, 12)

  /** Vintage (cohort) default-curve analysis — THE lending-portfolio
    * dashboard: group loans by disbursement month (the "vintage") and
    * report, for each months-on-book horizon k in [[VintageMobGrid]],
    * the cumulative share of the cohort that had entered the 90+ DPD
    * bucket by k months after disbursement. The single as-of snapshot
    * CONTAINS the history: a loan at dpd_days > 90 today crossed into
    * 90+ on asOf − (dpd_days − 91) days, so its crossing month-on-book
    * is derivable per row — no time-series table needed. Horizons a
    * vintage hasn't reached yet (vintage month + k past the as-of
    * month) report NULL rate rather than a false 0 — the
    * right-censoring every real vintage curve shows. Shuffle carries
    * (vintage, k) counters only.
    */
  val vintageAnalysis: GraftQuery = GraftQuery(
    "loan_vintage_analysis",
    s"vintage default curves: per disbursement-month cohort, cumulative 90+ DPD entry rate at ${VintageMobGrid.mkString("/")} months on book",
    PortfolioOracle.vintageSql) { (s, d) =>
    val lf = LoanDomain.loanFinalFrame(s, d)
    val asOfD = LoanDomain.asOf
    val crossDate = date_sub(asOfD, col("dpd_days") - 91)
    val base = lf.select(
      trunc(col("disbursement_date"), "month").as("vintage"),
      when(col("dpd_days") > 90,
        LoanDomain.monthDiff(crossDate, col("disbursement_date")))
        .as("mob_crossed"),
      explode(array(VintageMobGrid.map(lit(_)): _*)).as("k"))
    base
      .groupBy(col("vintage"), col("k"))
      .agg(count(lit(1)).as("n_loans"),
        sum((col("mob_crossed") <= col("k")).cast("long")).as("n_defaulted"))
      .select(col("vintage"), col("k"), col("n_loans"),
        coalesce(col("n_defaulted"), lit(0L)).as("n_defaulted"),
        // right-censor: the horizon must have elapsed by the as-of month
        when(LoanDomain.monthDiff(asOfD, col("vintage")) >= col("k"),
          coalesce(col("n_defaulted"), lit(0L)) / col("n_loans"))
          .as("default_rate"))
      .orderBy("vintage", "k")
  }

  /** DPD roll-rate (bucket transition) matrix — the collections KPI that
    * pairs with [[vintageAnalysis]]: for each delinquency bucket a month
    * ago, the share of its loans in each bucket now. Like the vintage
    * curve, the single as-of snapshot CONTAINS the prior state under the
    * no-cure back-projection: a loan at dpd_days d today was at
    * max(d - 30, 0) days one month ago (delinquency accrues a day per
    * day; a loan under 30 DPD was current a month ago), so the matrix
    * reports the roll-FORWARD rates — Current→1–30, 1–30→31–60, … — that
    * collections teams track month over month. Numeric bucket ranks ride
    * along so the ordering never depends on en-dash label collation.
    * Shuffle carries a 5×5-bounded cell table; roll_pct is an exact
    * BIGINT/BIGINT window division.
    */
  /** [[rollRate]]'s plan over any frame carrying (dpd_days, dpd_bucket,
    * arrear) — separated so the fixture spec can hand-compute a matrix.
    */
  /** Numeric DPD bucket rank (0 = Current … 4 = 90+) — shared by the
    * roll-rate matrix and the bucket-distribution forecast.
    */
  def dpdRank(days: Column): Column =
    when(days === 0, 0).when(days <= 30, 1).when(days <= 60, 2)
      .when(days <= 90, 3).otherwise(4)

  def rollRateFrame(lfd: DataFrame): DataFrame = {
    def rank(days: Column): Column = dpdRank(days)
    val cells = lfd
      .withColumn("prev_days", greatest(lit(0), col("dpd_days") - 30))
      .select(
        rank(col("prev_days")).as("from_rank"),
        LoanDomain.dpdBucketFinal(col("prev_days")).as("from_bucket"),
        rank(col("dpd_days")).as("to_rank"),
        col("dpd_bucket").as("to_bucket"),
        col("arrear"))
      .groupBy("from_rank", "from_bucket", "to_rank", "to_bucket")
      .agg(count(lit(1)).as("n_loans"),
        Det.sumQ(col("arrear"), 4).as("arrear_total"))
    val w = Window.partitionBy(col("from_rank"))
    cells
      .withColumn("roll_pct", col("n_loans") / sum(col("n_loans")).over(w))
      .select(col("from_rank"), col("from_bucket"), col("to_rank"),
        col("to_bucket"), col("n_loans"), col("arrear_total"), col("roll_pct"))
      .orderBy("from_rank", "to_rank")
  }

  val rollRate: GraftQuery = GraftQuery(
    "loan_rollrate_matrix",
    "DPD bucket roll-rate matrix: prior-month bucket (no-cure back-projection) x current bucket, counts + arrear + roll share",
    PortfolioOracle.rollRateSql) { (s, d) => rollRateFrame(lf(s, d)) }

  /** Forecast horizon (months) for [[bucketForecast]]. */
  val ForecastHorizon = 3

  /** BUCKET-DISTRIBUTION FORECAST — the question the [[rollRate]] matrix
    * exists to answer but does not: given today's delinquency mix and
    * the observed month-over-month transition rates, what does the book
    * look like in 1–3 months? The Markov one-step is dist_{h} =
    * dist_{h−1} · P, unrolled to [[ForecastHorizon]] static join+agg
    * steps over the ≤5-state frames (the binseg unroll precedent — loop
    * state never crosses the driver). Horizon 0 is the EXACT current
    * census; each later horizon reports expected loans and share per
    * bucket — the collections-capacity planning number.
    *
    * The chain-rule caveat is documented, not hidden: powering a
    * one-month matrix assumes time-homogeneous transitions; the
    * forecast is the standard collections planning convention, not a
    * causal claim. A state carrying mass whose rank was never OBSERVED
    * as a prior-month state has no matrix row — such states are
    * ABSORBING (identity fallback via left join), so mass is conserved
    * by construction; the spec plants exactly that gap and pins
    * conservation to the 1e-6 quantization tolerance.
    *
    * Scale shape: ONE corpus pass (the roll-rate cells + the current
    * census ride the same loan frame); all three steps run on ≤5-row
    * frames with broadcast joins. Determinism: the census is exact
    * longs; roll_pct is the matrix's exact LONG/LONG division; each
    * step's products quantize to 1e-6 before the order-insensitive
    * per-state sums, so the unrolled recursion is bit-stable.
    */
  val bucketForecast: GraftQuery = GraftQuery(
    "loan_bucket_forecast",
    s"Markov bucket forecast: current DPD census pushed $ForecastHorizon months through the roll-rate matrix, expected loans + share per bucket",
    PortfolioOracle.bucketForecastSql) { (s, d) => bucketForecastFrame(lf(s, d)) }

  /** [[bucketForecast]]'s plan over any loan frame — shared with the
    * hand-matrix fixture (PortfolioSpec).
    */
  def bucketForecastFrame(lfd: DataFrame): DataFrame = {
    val lfc = lfd.select(col("dpd_days"), col("dpd_bucket"), col("arrear"))
      .localCheckpoint() // one corpus pass feeds matrix + census
    val matrix = rollRateFrame(lfc)
      .select(col("from_rank"), col("to_rank"), col("roll_pct"))
      .localCheckpoint() // <=25 rows
    val labels = rollRateFrame(lfc)
      .select(col("to_rank").as("rank"), col("to_bucket").as("bucket"))
      .distinct()
    val census = lfc
      .select(dpdRank(col("dpd_days")).as("rank"))
      .groupBy(col("rank")).agg(count(lit(1)).as("n"))
      .withColumn("expected", col("n").cast("double"))
      .select(col("rank"), col("expected"))
    val total = census.agg(sum(col("expected")).as("tot"))
    def step(dist: DataFrame): DataFrame = dist
      .join(broadcast(matrix), col("rank") === col("from_rank"), "left")
      .select(
        coalesce(col("to_rank"), col("rank")).as("dest"),
        Det.quantize(col("expected")
          * coalesce(col("roll_pct"), lit(1.0)), 6).as("tq"))
      .groupBy(col("dest"))
      .agg((sum(col("tq")) / lit(Det.pow10(6))).as("expected"))
      .select(col("dest").as("rank"), col("expected"))
    val horizons = (1 to ForecastHorizon)
      .scanLeft(census)((d, _) => step(d))
      .zipWithIndex
      .map { case (d, h) => d.withColumn("horizon", lit(h)) }
      .reduce(_ unionByName _)
    horizons
      .join(broadcast(labels), Seq("rank"))
      .crossJoin(broadcast(total))
      .select(col("horizon"), col("rank"), col("bucket"),
        col("expected").as("expected_loans"),
        (col("expected") / col("tot")).as("share"))
      .orderBy("horizon", "rank")
  }

  /** The late-arriving batch for [[incrementalMerge]]: loans with
    * loan_id % [[IncrDeltaMod]] == [[IncrDeltaRes]] (an ID split on
    * purpose — the delta must be an arbitrary slice, not a data-dependent
    * one). Shared with the oracle by interpolation.
    */
  val IncrDeltaMod = 10
  val IncrDeltaRes = 9

  /** Incremental aggregate maintenance — the 100 TB dashboard contract:
    * when a new partition lands, the materialized rollup is updated by
    * MERGING its algebraic state (counts and quantized-LONG sums — a
    * commutative monoid) with the delta's state, never by rescanning the
    * corpus. AVG is not algebraic but its (sum, count) decomposition is,
    * so avg_emi is recomposed from merged components. Both paths run
    * here — merge(state(90%), state(delta)) AND a full recompute — and
    * `merge_ok` is a GENUINE per-group equality check on both engines
    * (not an attestation): exact because the quantized sums are
    * associative LONGs, which is precisely why [[graft.api.Det]] exists.
    */
  val incrementalMerge: GraftQuery = GraftQuery(
    "portfolio_incremental_merge",
    s"incremental rollup maintenance: merge(state, delta 1/$IncrDeltaMod) vs full recompute, per-cell equality",
    PortfolioOracle.incrementalMergeSql) { (s, d) =>
    // three aggregations read the 5-column projection; materialize it
    // once so the loan_final derivation (levenshtein region cleaning
    // included) doesn't run per-branch
    val base = lf(s, d).select(col("loan_id"), col("region_cleaned"),
      col("dpd_bucket"), col("disbursement_amount"), col("emi_amount"))
      .localCheckpoint()
    def state(df: DataFrame): DataFrame =
      df.groupBy("region_cleaned", "dpd_bucket")
        .agg(count(lit(1)).as("n"),
          sum(Det.quantize(col("disbursement_amount"), 4)).as("dq"),
          sum(Det.quantize(col("emi_amount"), 4)).as("eq"))
    val merged = state(base.filter(col("loan_id") % IncrDeltaMod =!= IncrDeltaRes))
      .unionByName(state(base.filter(col("loan_id") % IncrDeltaMod === IncrDeltaRes)))
      .groupBy("region_cleaned", "dpd_bucket")
      .agg(sum(col("n")).as("n_merged"), sum(col("dq")).as("dqm"),
        sum(col("eq")).as("eqm"))
    val full = state(base).select(col("region_cleaned").as("r2"),
      col("dpd_bucket").as("b2"), col("n").as("n_full"),
      col("dq").as("dqf"), col("eq").as("eqf"))
    merged.join(full,
        col("region_cleaned") <=> col("r2") && col("dpd_bucket") <=> col("b2"),
        "full")
      .select(col("region_cleaned"), col("dpd_bucket"),
        col("n_merged").as("n_loans"),
        (col("dqm") / lit(Det.pow10(4))).as("disbursed"),
        (col("eqm") / lit(Det.pow10(4)) / col("n_merged")).as("avg_emi"),
        // coalesce to FALSE: a one-sided group (present in only the
        // merged or only the full path — a genuine merge defect) must
        // read merge_ok = false, not NULL-out of the attestation
        coalesce(col("n_merged") === col("n_full") && col("dqm") === col("dqf")
          && col("eqm") === col("eqf"), lit(false)).as("merge_ok"))
      .orderBy(asc_nulls_first("region_cleaned"), col("dpd_bucket"))
  }

  /** IFRS9 ECL parameters: per-stage probability of default (stage 1 =
    * performing 12-month PD, stage 2 = 30+ DPD backstop lifetime PD,
    * stage 3 = credit-impaired, PD 1) and a single loss-given-default.
    * The PD x LGD products are computed ONCE in Scala and interpolated
    * into both engines as identical double literals.
    */
  val EclPd: Map[Int, Double] = Map(1 -> 0.02, 2 -> 0.25, 3 -> 1.0)
  val EclLgd = 0.45

  /** IFRS9 expected-credit-loss staging — the provisioning dashboard that
    * completes the lending-analytics family ([[vintageAnalysis]] shows
    * WHERE defaults come from, [[rollRate]] where they're GOING, this
    * prices what they COST): every loan lands in a stage by the DPD
    * backstops (<=30 / 31-90 / >90), exposure-at-default = arrears plus
    * the undrawn EMI stream (the [[portfolioNpv]] remaining-months
    * formula, floored at 0 for loans past term), and
    * ECL = PD(stage) x LGD x EAD, rolled up per (region, stage) with the
    * coverage ratio auditors quote. One partial-aggregated groupBy over
    * the loan_final derivation — reduce keys are |regions| x 3.
    *
    * Determinism: EAD composes +/x of exact loan_final doubles in the
    * same association on both engines; each loan's ECL and EAD quantize
    * to 4-decimal LONGs before the sums; coverage is one division of the
    * two quantized sums.
    */
  val eclStaging: GraftQuery = GraftQuery(
    "loan_ecl_staging",
    s"IFRS9 ECL staging: DPD-backstop stages, EAD = arrears + remaining EMIs, PD x LGD x EAD rollup per region x stage",
    PortfolioOracle.eclStagingSql) { (s, d) =>
    val stage = when(col("dpd_days") <= 30, 1)
      .when(col("dpd_days") <= 90, 2).otherwise(3)
    val pdlgd = EclPd.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (st, pd)) => when(col("stage") === st, lit(pd * EclLgd))
        .otherwise(acc)
    }
    val remaining = LoanDomain.monthDiff(col("due_date"),
      col("disbursement_date")) - col("months_due")
    lf(s, d)
      .select(col("region_cleaned"), col("arrear"), col("emi_amount"),
        stage.as("stage"),
        (col("arrear") + col("emi_amount") * greatest(remaining, lit(0)))
          .as("ead"))
      .withColumn("eclq", Det.quantize(col("ead") * pdlgd, 4))
      .groupBy(col("region_cleaned"), col("stage"))
      .agg(count(lit(1)).as("n_loans"),
        Det.sumQ(col("ead"), 4).as("total_ead"),
        (sum(col("eclq")) / lit(Det.pow10(4))).as("total_ecl"))
      .withColumn("coverage", col("total_ecl") / col("total_ead"))
      .orderBy(asc_nulls_first("region_cleaned"), col("stage"))
  }

  /** Portfolio concentration (Herfindahl-Hirschman index) — the risk
    * metric regulators and credit committees quote: Σ share² of
    * disbursed exposure per grouping dimension (region and product), one
    * summary row per dimension with group count, HHI, and the largest
    * single share. HHI near 1/n_groups = diversified; near 1 =
    * concentrated. Each dimension is one partial-agg groupBy to a
    * |groups|-bounded frame; shares are ratios of exact 4dp-LONG sums,
    * each share² quantized to a 1e-9 LONG before the (group-bounded)
    * exact sum. The null-region group participates like any other —
    * concentration in unknown geography is itself a risk signal.
    */
  val concentrationHhi: GraftQuery = GraftQuery(
    "portfolio_concentration_hhi",
    "HHI concentration of disbursed exposure by region and by product",
    PortfolioOracle.concentrationHhiSql) { (s, d) =>
    val base = lf(s, d)
      .select(col("region_cleaned"), col("product_type"),
        col("disbursement_amount"))
    def forDim(dim: String): DataFrame = {
      val wAll = Window.partitionBy()
      base.groupBy(col(dim).as("grp"))
        .agg(sum(Det.quantize(col("disbursement_amount"), 4)).as("aq"))
        .withColumn("share", col("aq") / sum(col("aq")).over(wAll))
        .agg(count(lit(1)).as("n_groups"),
          (sum(floor(col("share") * col("share") * lit(1e9) + lit(0.5))
            .cast("long")) / lit(1e9)).as("hhi"),
          max(col("share")).as("top_share"))
        .withColumn("dimension", lit(dim))
    }
    forDim("region_cleaned").unionByName(forDim("product_type"))
      .select(col("dimension"), col("n_groups"), col("hhi"),
        col("top_share"))
      .orderBy("dimension")
  }

  /** Newton iterations for [[irrEffective]] — quadratic convergence snaps
    * the root to machine precision well inside 12 steps for every annuity
    * shape the portfolio holds, and both engines then agree within the
    * 1e-6 output quantum.
    */
  val IrrIters = 12

  /** Per-loan IRR / effective APR — the portfolio metric the reference's
    * simple-interest EMI formula quietly hides: EMI = P(1 + rate·yrs)/N
    * charges interest on the FULL principal for the full term, so the
    * EFFECTIVE rate of the resulting annuity is nearly twice the nominal
    * (a 12%-nominal 12-month loan prices at ~23.4% APR — the spec pins
    * exactly this). IRR solves NPV(r) = A·(1−(1+r)^−N)/r − P = 0 by
    * Newton's method UNROLLED into [[IrrIters]] chained column
    * expressions — closed-form annuity NPV means no per-month explode,
    * no UDF, no driver loop: the whole solver is one whole-stage-codegen
    * pass over the loan table, embarrassingly parallel at any scale.
    * Iterates clamp to [1e-9, 10]: a zero-interest loan's root is 0, and
    * the clamp pins both engines to the same floor instead of letting
    * r→0 cancellation diverge them.
    *
    * Determinism: each Newton step is a fixed dag of IEEE ops mirrored
    * shape-for-shape (pow's last-ulp wobble is erased by the quadratic
    * contraction near the root); outputs quantize to 1e-6.
    */
  val irrEffective: GraftQuery = GraftQuery(
    "loan_irr_effective",
    s"per-loan IRR via $IrrIters unrolled Newton steps on the closed-form annuity NPV; effective APR vs nominal",
    PortfolioOracle.irrSql) { (s, d) =>
    irrFrame(LoanDomain.loanFinal(LoanDomain.joined(s, d))
      .select(col("loan_id"), col("disbursement_amount"), col("emi_amount"),
        col("duration_months"), col("interest_rate")))
  }

  /** The IRR solver over any (loan_id, disbursement_amount, emi_amount,
    * duration_months, interest_rate) frame — shared by the registry query
    * and the root-check spec (PortfolioQueriesSpec-style, in LoanSpec).
    */
  def irrFrame(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val in = base
      .filter(col("duration_months") >= 1 && col("emi_amount") > 0
        && col("disbursement_amount") > 0)
      .select(col("loan_id"), col("duration_months"), col("interest_rate"),
        col("disbursement_amount").as("p"), col("emi_amount").as("a"),
        col("duration_months").cast("double").as("nd"))
    def step(r: Column): Column = {
      val pw = pow(lit(1.0) + r, -col("nd"))
      val f = col("a") * (lit(1.0) - pw) / r - col("p")
      val fp = col("a") * (col("nd") * (pw / (lit(1.0) + r)) * r
        - (lit(1.0) - pw)) / (r * r)
      least(greatest(r - f / fp, lit(1e-9)), lit(10.0))
    }
    val solved = (1 to IrrIters)
      .foldLeft(in.withColumn("r0", lit(0.01))) { (df, k) =>
        df.withColumn(s"r$k", step(col(s"r${k - 1}")))
      }
    solved
      .select(col("loan_id"), col("duration_months"), col("interest_rate"),
        (floor(col(s"r$IrrIters") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("irr_monthly"))
      .withColumn("apr_effective",
        floor((pow(lit(1.0) + col("irr_monthly"), 12.0) - lit(1.0))
          * lit(1e6) + lit(0.5)) / lit(1e6))
      .orderBy("loan_id")
  }

  /** Rate shocks (percentage points) for [[rateStress]]'s scenario grid. */
  val StressShocks: Seq[Double] = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)

  /** Rate-shock STRESS GRID — the what-if scenario operator a lending
    * portfolio runs before a rate decision: every loan is re-priced
    * under each of [[StressShocks]] (interest rate shifted by the shock,
    * floored at 0), the reference's own F3 simple-interest EMI chain
    * re-derives payment and arrears at the pinned as-of date, and the
    * output is one row per scenario: loan count, portfolio EMI and
    * arrear totals, delinquent-loan count, and the mean per-loan EMI
    * uplift vs the unshocked base — the sensitivity row a risk
    * committee reads.
    *
    * Scale shape: the scenario grid is a 5-way in-row explode of the
    * one-pass loan frame (scenarios × loans rows, partial-aggregated
    * per scenario map-side — never a per-scenario rescan); at 100 TB a
    * 50-scenario grid is still ONE corpus pass. Determinism: shock
    * arithmetic and the F3 chain are the [[LoanDomain]] expressions
    * verbatim (shock 0 reproduces the base EMI bit-for-bit: x + 0.0 = x
    * in IEEE); sums quantize to LONGs; the uplift mean quantizes each
    * per-loan ratio to 1e-9 first.
    */
  val rateStress: GraftQuery = GraftQuery(
    "loan_rate_stress",
    s"rate-shock stress grid (${StressShocks.mkString("/")}pp): per-scenario EMI/arrear totals, delinquency counts, mean EMI uplift vs base",
    PortfolioOracle.rateStressSql) { (s, d) =>
    val m1 = LoanDomain.joined(s, d)
      .withColumn("duration_months",
        LoanDomain.monthDiff(col("due_date"), col("disbursement_date")))
      .withColumn("ec0", coalesce(col("emi_collected"), lit(0.0)))
    val base = m1
      .withColumn("months_due", LoanDomain.monthsDue(LoanDomain.asOf,
        col("disbursement_date"), col("duration_months")))
      .withColumn("emi_base", LoanDomain.emiAmount(
        LoanDomain.totalPayable(col("disbursement_amount"),
          col("interest_rate"), col("duration_months")),
        col("duration_months")))
    base
      .withColumn("shock",
        explode(array(StressShocks.map(lit): _*)))
      .withColumn("rate_s",
        greatest(lit(0.0), col("interest_rate") + col("shock")))
      .withColumn("emi_s", LoanDomain.emiAmount(
        LoanDomain.totalPayable(col("disbursement_amount"), col("rate_s"),
          col("duration_months")),
        col("duration_months")))
      .withColumn("arrear_s",
        greatest(lit(0.0), col("emi_s") * col("months_due") - col("ec0")))
      .withColumn("uplift",
        when(col("emi_base") > 0,
          (col("emi_s") - col("emi_base")) / col("emi_base")))
      .groupBy(col("shock"))
      .agg(
        count(lit(1)).as("n_loans"),
        Det.sumQ(col("emi_s")).as("sum_emi"),
        Det.sumQ(col("arrear_s")).as("sum_arrear"),
        sum(when(col("arrear_s") > 0, 1L).otherwise(0L)).as("n_delinquent"),
        (sum(Det.quantize(col("uplift"), 9)).cast("double") / lit(1e9)
          / count(col("uplift")).cast("double")).as("avg_emi_uplift"))
      .orderBy("shock")
  }

  def all: Seq[GraftQuery] = Seq(
    irrEffective,
    byRegion, rollupQ, cubeQ, topArrearsByRegion, monthlyRunning,
    distinctPairs, overdueCustomers, currentCustomers, regionSetOps,
    top10Arrears, approxDistinct, approxQuantiles, arrearPercentiles,
    rankFamily, bucketPivot, bucketUnpivot, groupingSets, trailing3mo,
    tableProfile, portfolioNpv, vintageAnalysis, rollRate, bucketForecast,
    incrementalMerge,
    eclStaging, concentrationHhi, rateStress)
}
