package graft.loan

/** DuckDB twins of the loan-domain derivations. Every expression mirrors the
  * Spark `Column` shape in [[LoanDomain]] operand-for-operand so doubles come
  * out bit-identical. DuckDB type notes: year()/date_diff()/generate_series
  * return BIGINT (→ CAST to INTEGER where Spark yields int); DATE + interval
  * returns TIMESTAMP (→ CAST back to DATE); numeric literals like 0.1 parse
  * as DECIMAL, not DOUBLE (→ `0.1::DOUBLE` wherever the value is not exactly
  * representable in binary, else decimal math silently diverges from Spark's
  * IEEE754 doubles — 0.5/5.0/12.0/100.0 are exact and safe).
  */
object LoanOracle {

  val asOf: String = s"DATE '${LoanDomain.AsOf}'"

  /** CTEs: loans / ext / cust / base — the mapped sources + J1/J2 joins. */
  val baseCtes: String = s"""
    loans AS (
      SELECT
        o_orderkey AS loan_id,
        o_custkey AS customer_id,
        o_totalprice AS disbursement_amount,
        CAST(o_orderdate AS DATE) AS disbursement_date,
        CAST(CAST(o_orderdate AS DATE)
             + to_months(CAST(6 + (o_orderkey % 55) AS INTEGER)) AS DATE) AS due_date,
        CASE WHEN o_orderkey % 37 = 0 THEN NULL ELSE
          CASE o_orderkey % 8
            WHEN 0 THEN 'Bangalore' WHEN 1 THEN 'Bangalre'
            WHEN 2 THEN 'Mumbai'    WHEN 3 THEN 'Mumbaii'
            WHEN 4 THEN 'Delhi'     WHEN 5 THEN 'Dehli'
            WHEN 6 THEN 'Kolkata'   ELSE 'Kolkatta' END
        END AS region,
        5.0::DOUBLE + (o_orderkey % 20) * 0.5::DOUBLE AS interest_rate,
        o_orderstatus AS pos
      FROM orders
    ),
    ext AS (
      SELECT
        l_orderkey AS loan_id,
        'PT-' || CAST(l_orderkey % 5 AS VARCHAR) AS product_type,
        SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) / 10000.0
          * (0.1::DOUBLE + (l_orderkey % 10) * 0.1::DOUBLE) AS emi_collected
      FROM lineitem GROUP BY l_orderkey
    ),
    cust AS (
      SELECT c_custkey AS customer_id, c_name AS customer_name FROM customer
    ),
    base AS (
      SELECT l.loan_id, l.customer_id, c.customer_name, l.disbursement_amount,
             l.disbursement_date, l.due_date, l.region, l.interest_rate, l.pos,
             e.product_type, e.emi_collected
      FROM cust c
      JOIN loans l ON c.customer_id = l.customer_id
      LEFT JOIN ext e ON l.loan_id = e.loan_id
    )"""

  /** F1 twin: argmin-levenshtein over the city dictionary, dictionary-order
    * tie-break, null passthrough. `$t` = alias of the row source.
    */
  def regionCleaned(t: String): String = s"""
    CASE WHEN $t.region IS NULL THEN NULL ELSE
      (SELECT c FROM (VALUES (1,'Bangalore'),(2,'Mumbai'),(3,'Delhi'),(4,'Kolkata')) AS v(i, c)
       ORDER BY levenshtein(upper($t.region), upper(c)), i LIMIT 1)
    END"""

  /** Full CTE chain ending in `lf` = the loan_final relation; reused by the
    * flagship and every portfolio rollup built on top of it.
    */
  val loanFinalCtes: String = s"""$baseCtes,
    m1 AS (
      SELECT *,
        CAST((year(due_date) - year(disbursement_date)) * 12
             + (month(due_date) - month(disbursement_date)) AS INTEGER) AS duration_months,
        COALESCE(emi_collected, 0.0) AS ec0
      FROM base
    ),
    m2 AS (
      SELECT *,
        disbursement_amount + disbursement_amount * (interest_rate / 100.0)
          * (duration_months / 12.0) AS total_payable,
        CAST(greatest(0, least(
          (year($asOf) - year(disbursement_date)) * 12
            + (month($asOf) - month(disbursement_date)),
          duration_months)) AS INTEGER) AS months_due
      FROM m1
    ),
    m3 AS (
      SELECT *,
        CASE WHEN duration_months > 0 THEN total_payable / duration_months
             ELSE 0.0 END AS emi_amount
      FROM m2
    ),
    m4 AS (SELECT *, emi_amount * months_due AS total_demand FROM m3),
    m5 AS (SELECT *, greatest(0.0, total_demand - ec0) AS arrear FROM m4),
    m6 AS (
      SELECT *,
        greatest(0.0, arrear + emi_amount - ec0) AS target_amount,
        greatest(0.0, -(arrear + emi_amount - ec0)) AS amount_to_be_returned,
        CASE WHEN arrear > 0
          THEN CAST(disbursement_date + to_months(months_due) AS DATE)
          ELSE disbursement_date END AS emi_due_date,
        total_payable - ec0 AS total_to_be_collected
      FROM m5
    ),
    m7 AS (
      SELECT *,
        CASE WHEN arrear > 0
          THEN CAST(greatest(0, date_diff('day', emi_due_date, $asOf)) AS INTEGER)
          ELSE 0 END AS dpd_days
      FROM m6
    ),
    lf AS (
      SELECT
        loan_id, customer_id, customer_name, disbursement_amount,
        disbursement_date, due_date, region,
        ${regionCleaned("m7")} AS region_cleaned,
        interest_rate, pos, product_type, emi_collected,
        emi_amount, total_demand, arrear, target_amount, amount_to_be_returned,
        months_due, dpd_days,
        CASE WHEN dpd_days = 0 THEN 'Current'
             WHEN dpd_days <= 30 THEN '1–30 DPD'
             WHEN dpd_days <= 60 THEN '31–60 DPD'
             WHEN dpd_days <= 90 THEN '61–90 DPD'
             ELSE '90+ DPD' END AS dpd_bucket,
        total_to_be_collected
      FROM m7
    )"""

  /** loan_final (flagship) — main.py:82-141 twin. */
  val loanFinalSql: String = s"""
    WITH $loanFinalCtes
    SELECT * FROM lf ORDER BY loan_id"""

  /** loan_monthly_schedule (G1) — main.py:146-193 twin. */
  val monthlyScheduleSql: String = s"""
    WITH $baseCtes,
    s1 AS (
      SELECT *,
        CAST((year(due_date) - year(disbursement_date)) * 12
             + (month(due_date) - month(disbursement_date)) AS INTEGER) AS duration_months,
        COALESCE(emi_collected, 0.0) AS ec0
      FROM base
    ),
    s2 AS (
      SELECT *,
        disbursement_amount * (1 + (interest_rate / 100.0)
          * (duration_months / 12.0)) AS total_payable
      FROM s1 WHERE duration_months >= 1
    ),
    s3 AS (
      SELECT *,
        CASE WHEN duration_months > 0 THEN total_payable / duration_months
             ELSE 0.0 END AS emi_raw
      FROM s2
    ),
    s4 AS (
      SELECT *, unnest(generate_series(1, CAST(duration_months AS BIGINT))) AS month_b
      FROM s3
    ),
    s5 AS (
      SELECT *,
        CAST(month_b AS INTEGER) AS month,
        CAST(disbursement_date + to_months(CAST(month_b AS INTEGER)) AS DATE) AS emi_due_date_d
      FROM s4
    ),
    s6 AS (
      SELECT *,
        emi_raw * month AS demand,
        CASE WHEN emi_due_date_d <= $asOf THEN ec0 ELSE 0.0 END AS collected,
        CAST(SUM(CASE WHEN emi_due_date_d <= $asOf THEN 1 ELSE 0 END)
             OVER (PARTITION BY loan_id ORDER BY month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS paid_months
      FROM s5
    ),
    s7 AS (
      SELECT *, greatest(0.0, demand - ec0 * paid_months) AS arrear_raw FROM s6
    ),
    s8 AS (
      SELECT *,
        CASE WHEN arrear_raw > 0
          THEN CAST(greatest(0, date_diff('day', emi_due_date_d, $asOf)) AS INTEGER)
          ELSE 0 END AS dpd_days
      FROM s7
    )
    SELECT
      loan_id, month,
      strftime(emi_due_date_d, '%d-%b-%Y') AS emi_due_date,
      floor(emi_raw * 100 + 0.5) / 100.0 AS emi_amount,
      floor(collected * 100 + 0.5) / 100.0 AS emi_collected,
      floor(demand * 100 + 0.5) / 100.0 AS total_demand_till_month,
      floor(arrear_raw * 100 + 0.5) / 100.0 AS arrear,
      dpd_days,
      CASE WHEN dpd_days = 0 THEN 'Current'
           WHEN dpd_days <= 30 THEN '0–30'
           WHEN dpd_days <= 60 THEN '30–60'
           WHEN dpd_days <= 90 THEN '60–90'
           ELSE '90+' END AS dpd_bucket
    FROM s8
    ORDER BY loan_id, month"""
}
