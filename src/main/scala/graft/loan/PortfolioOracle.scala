package graft.loan

/** DuckDB twins of [[PortfolioQueries]]. All build on LoanOracle.loanFinalCtes
  * (`lf`). Ordering notes: Spark's default ASC is NULLS FIRST — DuckDB's is
  * NULLS LAST — so every ORDER BY on a nullable column says NULLS FIRST
  * explicitly. Double SUM goes through integer quantization exactly like
  * [[graft.api.Det.sumQ]].
  */
object PortfolioOracle {

  private val ctes = LoanOracle.loanFinalCtes

  private def sumDec(c: String): String =
    s"SUM(CAST(floor(($c) * 10000.0 + 0.5) AS BIGINT)) / 10000.0"

  /** IRR twin: the m7 intermediate (it still carries duration_months),
    * the same Newton step as a chain of [[PortfolioQueries.IrrIters]]
    * CTEs — every subexpression parenthesized to Spark's evaluation
    * shape, pow re-evaluated where Spark reuses a column (same pure
    * function, same double) — and the same [1e-9, 10] clamp and 1e-6
    * output quanta.
    */
  def irrSql: String = {
    val iters = PortfolioQueries.IrrIters
    def pw(r: String) = s"pow(1.0::DOUBLE + $r, -nd)"
    val steps = (1 to iters).map { k =>
      val r = s"r${k - 1}"
      s"""
    i$k AS (
      SELECT loan_id, duration_months, interest_rate, p, a, nd,
        LEAST(GREATEST($r -
          (a * (1.0::DOUBLE - ${pw(r)}) / $r - p)
          / (a * (nd * (${pw(r)} / (1.0::DOUBLE + $r)) * $r
              - (1.0::DOUBLE - ${pw(r)})) / ($r * $r)),
          1e-9), 10.0::DOUBLE) AS r$k
      FROM i${k - 1}
    )"""
    }.mkString(",")
    s"""
    WITH $ctes,
    i0 AS (
      SELECT loan_id, duration_months, interest_rate,
        disbursement_amount AS p, emi_amount AS a,
        CAST(duration_months AS DOUBLE) AS nd,
        0.01::DOUBLE AS r0
      FROM m7
      WHERE duration_months >= 1 AND emi_amount > 0
        AND disbursement_amount > 0
    ),$steps
    SELECT loan_id, duration_months, interest_rate,
      FLOOR(r$iters * 1e6 + 0.5) / 1e6 AS irr_monthly,
      FLOOR((pow(1.0::DOUBLE + FLOOR(r$iters * 1e6 + 0.5) / 1e6,
          12.0::DOUBLE) - 1.0::DOUBLE) * 1e6 + 0.5) / 1e6 AS apr_effective
    FROM i$iters ORDER BY loan_id"""
  }

  /** Stress-grid twin ([[PortfolioQueries.rateStress]]): the m3
    * intermediate (base EMI, months_due, ec0 all live there), a 5-way
    * ::DOUBLE shock unnest, the identical F3 re-pricing chain, quantized
    * sums and the 1e-9-quantized uplift mean. A `def` — this object
    * initializes while PortfolioQueries is mid-init and StressShocks is
    * declared after the first query val (the LayoutOracle init-order
    * lesson).
    */
  def rateStressSql: String = {
    val shocks = PortfolioQueries.StressShocks
      .map(s => s"$s::DOUBLE").mkString("[", ", ", "]")
    s"""
    WITH $ctes,
    grid AS (
      SELECT m3.*, s.shock,
        GREATEST(0.0::DOUBLE, interest_rate + s.shock) AS rate_s
      FROM m3 CROSS JOIN (SELECT unnest($shocks) AS shock) s
    ),
    px AS (
      SELECT shock, months_due, ec0, emi_amount AS emi_base,
        CASE WHEN duration_months > 0 THEN
          (disbursement_amount + disbursement_amount * (rate_s / 100.0)
            * (duration_months / 12.0)) / duration_months
        ELSE 0.0 END AS emi_s
      FROM grid
    ),
    ax AS (
      SELECT shock, emi_s,
        GREATEST(0.0::DOUBLE, emi_s * months_due - ec0) AS arrear_s,
        CASE WHEN emi_base > 0 THEN (emi_s - emi_base) / emi_base END
          AS uplift
      FROM px
    )
    SELECT shock, CAST(COUNT(*) AS BIGINT) AS n_loans,
      ${sumDec("emi_s")} AS sum_emi,
      ${sumDec("arrear_s")} AS sum_arrear,
      CAST(SUM(CASE WHEN arrear_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_delinquent,
      CAST(SUM(CAST(floor(uplift * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e9 / CAST(COUNT(uplift) AS DOUBLE) AS avg_emi_uplift
    FROM ax
    GROUP BY shock
    ORDER BY shock"""
  }

  val byRegionSql: String = s"""
    WITH $ctes
    SELECT region_cleaned, dpd_bucket,
      COUNT(*) AS loans,
      ${sumDec("disbursement_amount")} AS disbursed,
      ${sumDec("arrear")} AS total_arrear,
      ${sumDec("emi_amount")} / COUNT(emi_amount) AS avg_emi
    FROM lf
    GROUP BY region_cleaned, dpd_bucket
    ORDER BY region_cleaned NULLS FIRST, dpd_bucket NULLS FIRST"""

  val rollupSql: String = s"""
    WITH $ctes
    SELECT CAST(GROUPING(region_cleaned, dpd_bucket) AS INTEGER) AS gid,
      region_cleaned, dpd_bucket,
      COUNT(*) AS loans,
      ${sumDec("arrear")} AS total_arrear
    FROM lf
    GROUP BY ROLLUP (region_cleaned, dpd_bucket)
    ORDER BY gid, region_cleaned NULLS FIRST, dpd_bucket NULLS FIRST"""

  val cubeSql: String = s"""
    WITH $ctes
    SELECT CAST(GROUPING(region_cleaned, dpd_bucket) AS INTEGER) AS gid,
      region_cleaned, dpd_bucket,
      COUNT(*) AS loans
    FROM lf
    GROUP BY CUBE (region_cleaned, dpd_bucket)
    ORDER BY gid, region_cleaned NULLS FIRST, dpd_bucket NULLS FIRST"""

  val topArrearsByRegionSql: String = s"""
    WITH $ctes,
    ranked AS (
      SELECT region_cleaned,
        CAST(ROW_NUMBER() OVER (PARTITION BY region_cleaned
          ORDER BY arrear DESC, loan_id) AS INTEGER) AS rn,
        loan_id, arrear
      FROM lf WHERE arrear > 0
    )
    SELECT * FROM ranked WHERE rn <= 5
    ORDER BY region_cleaned NULLS FIRST, rn"""

  val monthlyRunningSql: String = s"""
    WITH $ctes,
    m AS (
      SELECT region_cleaned,
        CAST(date_trunc('month', disbursement_date) AS DATE) AS month,
        SUM(CAST(floor(disbursement_amount * 10000.0 + 0.5) AS BIGINT)) AS disbursed_i
      FROM lf
      GROUP BY region_cleaned, CAST(date_trunc('month', disbursement_date) AS DATE)
    )
    SELECT region_cleaned, month,
      disbursed_i / 10000.0 AS disbursed,
      SUM(disbursed_i) OVER (PARTITION BY region_cleaned ORDER BY month
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0 AS cum_disbursed
    FROM m
    ORDER BY region_cleaned NULLS FIRST, month"""

  val distinctPairsSql: String = s"""
    WITH $ctes
    SELECT DISTINCT region_cleaned, dpd_bucket FROM lf
    ORDER BY region_cleaned NULLS FIRST, dpd_bucket NULLS FIRST"""

  val overdueCustomersSql: String = s"""
    WITH $ctes
    SELECT c.customer_id, c.customer_name FROM cust c
    WHERE EXISTS (SELECT 1 FROM lf
      WHERE lf.customer_id = c.customer_id AND lf.arrear > 0)
    ORDER BY c.customer_id"""

  val currentCustomersSql: String = s"""
    WITH $ctes
    SELECT c.customer_id, c.customer_name FROM cust c
    WHERE NOT EXISTS (SELECT 1 FROM lf
      WHERE lf.customer_id = c.customer_id AND lf.arrear > 0)
    ORDER BY c.customer_id"""

  val regionSetOpsSql: String = s"""
    WITH $ctes,
    a AS (SELECT region_cleaned FROM lf WHERE dpd_bucket = '90+ DPD'),
    b AS (SELECT region_cleaned FROM lf WHERE amount_to_be_returned > 0)
    SELECT 'union' AS op, region_cleaned FROM (
      SELECT DISTINCT region_cleaned FROM (
        SELECT region_cleaned FROM a UNION ALL SELECT region_cleaned FROM b))
    UNION ALL
    SELECT 'intersect' AS op, region_cleaned FROM (
      SELECT region_cleaned FROM a INTERSECT SELECT region_cleaned FROM b)
    UNION ALL
    SELECT 'except' AS op, region_cleaned FROM (
      SELECT region_cleaned FROM a EXCEPT SELECT region_cleaned FROM b)
    ORDER BY op, region_cleaned NULLS FIRST"""

  val top10ArrearsSql: String = s"""
    WITH $ctes
    SELECT loan_id, customer_name, arrear, dpd_bucket FROM lf
    ORDER BY arrear DESC, loan_id LIMIT 10"""

  /** Sketch-contract oracles: DuckDB's HLL / quantile sketches are not
    * bit-compatible with Spark's, so the Spark side outputs exact values
    * plus booleans attesting the estimate landed inside its error band,
    * and the oracle recomputes the exact values and asserts TRUE — the
    * estimate's CONTRACT is what gets hash-checked.
    */
  val approxDistinctSql: String = s"""
    WITH $ctes
    SELECT COUNT(DISTINCT product_type) AS exact_products,
      COUNT(DISTINCT customer_id) AS exact_customers,
      true AS products_est_ok,
      true AS customers_est_ok
    FROM lf"""

  val approxQuantilesSql: String = s"""
    WITH $ctes
    SELECT COUNT(*) AS n,
      true AS p50_ok, true AS p90_ok, true AS p99_ok
    FROM lf"""

  val arrearPercentilesSql: String = s"""
    WITH $ctes,
    ranked AS (
      SELECT region_cleaned, arrear,
        ROW_NUMBER() OVER (PARTITION BY region_cleaned
          ORDER BY arrear, loan_id) AS rk,
        COUNT(*) OVER (PARTITION BY region_cleaned) AS n
      FROM lf
    )
    SELECT region_cleaned,
      MAX(CASE WHEN rk = floor((n - 1) * 0.5) + 1 THEN arrear END) AS p50,
      MAX(CASE WHEN rk = floor((n - 1) * 0.9) + 1 THEN arrear END) AS p90,
      MAX(CASE WHEN rk = floor((n - 1) * 0.99) + 1 THEN arrear END) AS p99
    FROM ranked
    GROUP BY region_cleaned
    ORDER BY region_cleaned NULLS FIRST"""

  val groupingSetsSql: String = s"""
    WITH $ctes
    SELECT CAST(GROUPING(region_cleaned, product_type, dpd_bucket) AS INTEGER) AS gid,
      region_cleaned, dpd_bucket, product_type,
      COUNT(*) AS loans,
      ${sumDec("arrear")} AS total_arrear
    FROM lf
    GROUP BY GROUPING SETS (
      (region_cleaned), (product_type), (dpd_bucket, product_type))
    ORDER BY gid, region_cleaned NULLS FIRST,
      dpd_bucket NULLS FIRST, product_type NULLS FIRST"""

  val trailing3moSql: String = s"""
    WITH $ctes,
    m AS (
      SELECT region_cleaned,
        CAST(year(disbursement_date) * 12 + month(disbursement_date) AS BIGINT)
          AS month_idx,
        SUM(CAST(floor(disbursement_amount * 10000.0 + 0.5) AS BIGINT)) AS disb_i
      FROM lf
      GROUP BY 1, 2
    )
    SELECT region_cleaned, month_idx,
      disb_i / 10000.0 AS disbursed,
      SUM(disb_i) OVER (PARTITION BY region_cleaned ORDER BY month_idx
        RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) / 10000.0 AS trailing_3mo
    FROM m
    ORDER BY region_cleaned NULLS FIRST, month_idx"""

  val rankFamilySql: String = s"""
    WITH $ctes,
    r AS (
      SELECT dpd_bucket, loan_id, arrear,
        CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
        CAST(RANK() OVER w AS INTEGER) AS rk,
        CAST(DENSE_RANK() OVER w AS INTEGER) AS drk,
        PERCENT_RANK() OVER w AS prk,
        CAST(NTILE(4) OVER w AS INTEGER) AS quartile
      FROM lf WHERE arrear > 0
      WINDOW w AS (PARTITION BY dpd_bucket ORDER BY arrear DESC, loan_id)
    )
    SELECT * FROM r WHERE rn <= 3
    ORDER BY dpd_bucket, rn"""

  val bucketPivotSql: String = s"""
    WITH $ctes
    SELECT region_cleaned,
      COUNT(*) FILTER (WHERE dpd_bucket = 'Current') AS current,
      COUNT(*) FILTER (WHERE dpd_bucket = '1–30 DPD') AS dpd_1_30,
      COUNT(*) FILTER (WHERE dpd_bucket = '31–60 DPD') AS dpd_31_60,
      COUNT(*) FILTER (WHERE dpd_bucket = '61–90 DPD') AS dpd_61_90,
      COUNT(*) FILTER (WHERE dpd_bucket = '90+ DPD') AS dpd_90_plus
    FROM lf
    GROUP BY region_cleaned
    ORDER BY region_cleaned NULLS FIRST"""

  /** Unpivot twin: the wide form melted back via UNION ALL — including the
    * zero rows the pivot materialized for empty (region, bucket) combos.
    */
  val bucketUnpivotSql: String = s"""
    WITH $ctes,
    w AS (
      SELECT region_cleaned,
        COUNT(*) FILTER (WHERE dpd_bucket = 'Current') AS current,
        COUNT(*) FILTER (WHERE dpd_bucket = '1–30 DPD') AS dpd_1_30,
        COUNT(*) FILTER (WHERE dpd_bucket = '31–60 DPD') AS dpd_31_60,
        COUNT(*) FILTER (WHERE dpd_bucket = '61–90 DPD') AS dpd_61_90,
        COUNT(*) FILTER (WHERE dpd_bucket = '90+ DPD') AS dpd_90_plus
      FROM lf
      GROUP BY region_cleaned
    )
    SELECT region_cleaned, dpd_bucket, n FROM (
      SELECT region_cleaned, 'current' AS dpd_bucket, current AS n FROM w
      UNION ALL
      SELECT region_cleaned, 'dpd_1_30', dpd_1_30 FROM w
      UNION ALL
      SELECT region_cleaned, 'dpd_31_60', dpd_31_60 FROM w
      UNION ALL
      SELECT region_cleaned, 'dpd_61_90', dpd_61_90 FROM w
      UNION ALL
      SELECT region_cleaned, 'dpd_90_plus', dpd_90_plus FROM w
    )
    ORDER BY region_cleaned NULLS FIRST, dpd_bucket"""

  /** Profile twin: per-column UNION ALL over the native values — COUNT
    * DISTINCT on natives equals the Spark side's stringified distinct
    * because per-column stringification is round-trip injective.
    */
  def tableProfileSql: String = {
    val legs = PortfolioQueries.ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
        CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct FROM lf"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH $ctes
    SELECT * FROM (
      $legs
    )
    ORDER BY col_name"""
  }

  /** NPV twin: same remaining-month explode (generate_series is
    * inclusive, matching Spark's sequence), the same per-month-offset
    * 1e-9 discount quantization after the one pow, and exact money sums.
    */
  def npvSql: String = {
    import PortfolioQueries.NpvMonthlyRate
    s"""
    WITH $ctes,
    nbase AS (
      SELECT region_cleaned, loan_id, emi_amount,
        ((year(due_date) - year(disbursement_date)) * 12
          + (month(due_date) - month(disbursement_date))) - months_due
          AS remaining
      FROM lf
    ),
    nopen AS (SELECT * FROM nbase WHERE remaining >= 1),
    terms AS (
      SELECT region_cleaned, loan_id, emi_amount, remaining, u.k,
        floor(pow(1.0::DOUBLE / (1.0::DOUBLE + $NpvMonthlyRate::DOUBLE), u.k)
          * 1000000000.0 + 0.5) / 1000000000.0 AS df
      FROM nopen, unnest(generate_series(1, remaining)) AS u(k)
    ),
    pl AS (
      SELECT region_cleaned, loan_id, emi_amount, remaining,
        SUM(CAST(floor(emi_amount * df * 10000.0 + 0.5) AS BIGINT))
          / 10000.0 AS npv
      FROM terms GROUP BY 1, 2, 3, 4
    ),
    agg AS (
      SELECT region_cleaned, COUNT(*) AS loans_open,
        ${sumDec("emi_amount * remaining")} AS nominal,
        ${sumDec("npv")} AS npv_total
      FROM pl GROUP BY region_cleaned
    )
    SELECT region_cleaned, loans_open, nominal, npv_total,
      (nominal - npv_total) / nominal AS haircut
    FROM agg
    ORDER BY region_cleaned NULLS FIRST"""
  }

  /** Vintage twin: the same snapshot-derived crossing date
    * (asOf − (dpd_days − 91) days), the F2 calendar-month diff, and the
    * same right-censoring NULL.
    */
  def vintageSql: String = {
    val asOf = LoanOracle.asOf
    val grid = PortfolioQueries.VintageMobGrid.mkString(", ")
    s"""
    WITH $ctes,
    vb AS (
      SELECT CAST(date_trunc('month', disbursement_date) AS DATE) AS vintage,
        CASE WHEN dpd_days > 90 THEN
          (year($asOf - to_days(dpd_days - 91)) - year(disbursement_date)) * 12
            + (month($asOf - to_days(dpd_days - 91))
               - month(disbursement_date))
        END AS mob_crossed
      FROM lf
    ),
    vk AS (
      SELECT vb.vintage, vb.mob_crossed, kk.k
      FROM vb CROSS JOIN (SELECT unnest([$grid]) AS k) kk
    ),
    vg AS (
      SELECT vintage, k, CAST(COUNT(*) AS BIGINT) AS n_loans,
        CAST(COALESCE(SUM(CASE WHEN mob_crossed <= k THEN 1 END), 0)
          AS BIGINT) AS n_defaulted
      FROM vk GROUP BY 1, 2
    )
    SELECT vintage, k, n_loans, n_defaulted,
      CASE WHEN (year($asOf) - year(vintage)) * 12
                + (month($asOf) - month(vintage)) >= k
           THEN n_defaulted / n_loans END AS default_rate
    FROM vg ORDER BY vintage, k"""
  }

  /** Roll-rate twin: same no-cure back-projection (prev = max(d-30, 0)),
    * same F9 label CASE (en-dashes byte-for-byte), quantized arrear sum,
    * exact BIGINT/BIGINT window division for the roll share.
    */
  def rollRateSql: String = {
    def bucketCase(d: String): String =
      s"""CASE WHEN $d = 0 THEN 'Current'
           WHEN $d <= 30 THEN '1–30 DPD'
           WHEN $d <= 60 THEN '31–60 DPD'
           WHEN $d <= 90 THEN '61–90 DPD'
           ELSE '90+ DPD' END"""
    def rankCase(d: String): String =
      s"""CAST(CASE WHEN $d = 0 THEN 0 WHEN $d <= 30 THEN 1
           WHEN $d <= 60 THEN 2 WHEN $d <= 90 THEN 3
           ELSE 4 END AS INTEGER)"""
    s"""
    WITH $ctes,
    rr AS (
      SELECT
        ${rankCase("prev_days")} AS from_rank,
        ${bucketCase("prev_days")} AS from_bucket,
        ${rankCase("dpd_days")} AS to_rank,
        dpd_bucket AS to_bucket,
        arrear
      FROM (SELECT greatest(0, dpd_days - 30) AS prev_days, dpd_days,
              dpd_bucket, arrear FROM lf)
    ),
    cell AS (
      SELECT from_rank, from_bucket, to_rank, to_bucket,
        CAST(COUNT(*) AS BIGINT) AS n_loans,
        ${sumDec("arrear")} AS arrear_total
      FROM rr GROUP BY 1, 2, 3, 4
    )
    SELECT from_rank, from_bucket, to_rank, to_bucket, n_loans, arrear_total,
      n_loans / SUM(n_loans) OVER (PARTITION BY from_rank) AS roll_pct
    FROM cell ORDER BY from_rank, to_rank"""
  }

  /** Twin of [[PortfolioQueries.bucketForecastFrame]]: the rollRateSql
    * matrix chain, the exact current census, and the three unrolled
    * Markov steps with 1e-6-quantized per-state product sums.
    */
  def bucketForecastSql: String = {
    def rankCase(d: String): String =
      s"""CAST(CASE WHEN $d = 0 THEN 0 WHEN $d <= 30 THEN 1
           WHEN $d <= 60 THEN 2 WHEN $d <= 90 THEN 3
           ELSE 4 END AS INTEGER)"""
    def bucketCase(d: String): String =
      s"""CASE WHEN $d = 0 THEN 'Current'
           WHEN $d <= 30 THEN '1–30 DPD'
           WHEN $d <= 60 THEN '31–60 DPD'
           WHEN $d <= 90 THEN '61–90 DPD'
           ELSE '90+ DPD' END"""
    def step(prev: String): String = s"""
      SELECT COALESCE(mat.to_rank, p.rank) AS rank,
        SUM(CAST(floor(p.expected * COALESCE(mat.roll_pct, 1.0::DOUBLE)
          * 1e6 + 0.5) AS BIGINT)) / 1e6 AS expected
      FROM $prev p LEFT JOIN mat ON p.rank = mat.from_rank
      GROUP BY 1"""
    s"""
    WITH $ctes,
    rr AS (
      SELECT ${rankCase("prev_days")} AS from_rank,
        ${rankCase("dpd_days")} AS to_rank,
        ${bucketCase("dpd_days")} AS to_bucket
      FROM (SELECT greatest(0, dpd_days - 30) AS prev_days, dpd_days
            FROM lf)
    ),
    cell AS (
      SELECT from_rank, to_rank, to_bucket,
        CAST(COUNT(*) AS BIGINT) AS n_loans
      FROM rr GROUP BY 1, 2, 3
    ),
    mat AS (
      SELECT from_rank, to_rank,
        n_loans / SUM(n_loans) OVER (PARTITION BY from_rank) AS roll_pct
      FROM cell
    ),
    labels AS (SELECT DISTINCT to_rank AS rank, to_bucket AS bucket
      FROM cell),
    census AS (
      SELECT rank, CAST(COUNT(*) AS DOUBLE) AS expected
      FROM (SELECT ${rankCase("dpd_days")} AS rank FROM lf) GROUP BY 1
    ),
    tot AS (SELECT SUM(expected) AS tot FROM census),
    d1 AS (${step("census")}),
    d2 AS (${step("d1")}),
    d3 AS (${step("d2")}),
    u AS (
      SELECT CAST(0 AS INTEGER) AS horizon, rank, expected FROM census
      UNION ALL SELECT CAST(1 AS INTEGER), rank, expected FROM d1
      UNION ALL SELECT CAST(2 AS INTEGER), rank, expected FROM d2
      UNION ALL SELECT CAST(3 AS INTEGER), rank, expected FROM d3
    )
    SELECT u.horizon, u.rank, l.bucket,
      u.expected AS expected_loans,
      u.expected / tot.tot AS share
    FROM u JOIN labels l ON u.rank = l.rank CROSS JOIN tot
    ORDER BY u.horizon, u.rank"""
  }

  /** Incremental-merge twin: the same two-path construction — merged
    * algebraic states vs full recompute — with merge_ok a GENUINE
    * equality (both engines independently prove the monoid merge exact).
    */
  def incrementalMergeSql: String = {
    import PortfolioQueries.{IncrDeltaMod, IncrDeltaRes}
    def state(pred: String): String = s"""
      SELECT region_cleaned, dpd_bucket,
        CAST(COUNT(*) AS BIGINT) AS n,
        SUM(CAST(floor(disbursement_amount * 10000.0 + 0.5) AS BIGINT)) AS dq,
        SUM(CAST(floor(emi_amount * 10000.0 + 0.5) AS BIGINT)) AS eq
      FROM lf $pred GROUP BY 1, 2"""
    s"""
    WITH $ctes,
    merged AS (
      SELECT region_cleaned, dpd_bucket,
        CAST(SUM(n) AS BIGINT) AS n_merged, SUM(dq) AS dqm, SUM(eq) AS eqm
      FROM (
        ${state(s"WHERE loan_id % $IncrDeltaMod <> $IncrDeltaRes")}
        UNION ALL
        ${state(s"WHERE loan_id % $IncrDeltaMod = $IncrDeltaRes")}
      ) GROUP BY 1, 2
    ),
    fullagg AS (
      ${state("")}
    )
    SELECT m.region_cleaned, m.dpd_bucket,
      m.n_merged AS n_loans,
      m.dqm / 10000.0 AS disbursed,
      m.eqm / 10000.0 / m.n_merged AS avg_emi,
      COALESCE(m.n_merged = f.n AND m.dqm = f.dq AND m.eqm = f.eq,
        FALSE) AS merge_ok
    FROM merged m FULL JOIN fullagg f
      ON m.region_cleaned IS NOT DISTINCT FROM f.region_cleaned
      AND m.dpd_bucket IS NOT DISTINCT FROM f.dpd_bucket
    ORDER BY m.region_cleaned NULLS FIRST, m.dpd_bucket"""
  }

  /** HHI twin: per-dimension exact 4dp-LONG sums, the identical share
    * division and 1e-9 share² quantization, UNION ALL of the two
    * one-row summaries.
    */
  def concentrationHhiSql: String = {
    def dim(c: String): String = s"""
      SELECT '$c' AS dimension, COUNT(*) AS n_groups,
        CAST(SUM(CAST(floor(share * share * 1000000000.0 + 0.5) AS BIGINT))
          AS BIGINT) / 1000000000.0 AS hhi,
        MAX(share) AS top_share
      FROM (
        SELECT aq / (SELECT CAST(SUM(CAST(floor(disbursement_amount
              * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) FROM lf) AS share
        FROM (
          SELECT CAST(SUM(CAST(floor(disbursement_amount * 10000.0 + 0.5)
            AS BIGINT)) AS BIGINT) AS aq
          FROM lf GROUP BY $c
        )
      )"""
    s"""
    WITH $ctes
    SELECT * FROM (
      ${dim("region_cleaned")}
      UNION ALL
      ${dim("product_type")}
    ) ORDER BY dimension"""
  }

  /** ECL twin: identical stage backstops, EAD association, and the same
    * Scala-computed PD x LGD double literals; per-loan ECL/EAD quantize
    * to 4-decimal LONGs before the sums.
    */
  def eclStagingSql: String = {
    import PortfolioQueries.{EclLgd, EclPd}
    val cases = EclPd.toSeq.sortBy(_._1)
      .map { case (st, pd) => s"WHEN $st THEN ${pd * EclLgd}" }.mkString(" ")
    s"""
    WITH $ctes,
    eb AS (
      SELECT region_cleaned,
        CASE WHEN dpd_days <= 30 THEN 1
             WHEN dpd_days <= 90 THEN 2 ELSE 3 END AS stage,
        arrear + emi_amount * greatest(
          ((year(due_date) - year(disbursement_date)) * 12
            + (month(due_date) - month(disbursement_date))) - months_due,
          0) AS ead
      FROM lf
    ),
    el AS (
      SELECT region_cleaned, stage, ead,
        CAST(floor(ead * (CASE stage $cases END) * 10000.0 + 0.5) AS BIGINT)
          AS eclq
      FROM eb
    )
    SELECT region_cleaned, stage, COUNT(*) AS n_loans,
      ${sumDec("ead")} AS total_ead,
      CAST(SUM(eclq) AS BIGINT) / 10000.0 AS total_ecl,
      (CAST(SUM(eclq) AS BIGINT) / 10000.0) / (${sumDec("ead")}) AS coverage
    FROM el GROUP BY region_cleaned, stage
    ORDER BY region_cleaned NULLS FIRST, stage"""
  }
}
