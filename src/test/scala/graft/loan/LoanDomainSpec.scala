package graft.loan

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit tests for the F1..F12 metric columns and the loan_final / schedule
  * derivations, on literal fixtures with hand-computed expectations.
  * Edge cases straight from the reference (FIXTURES.md §A4): zero-duration
  * loans (main.py:96), null emi_collected (main.py:87), null region
  * (main.py:70), DPD bucket boundaries (main.py:122-131).
  */
class LoanDomainSpec extends SparkSpec {
  import LoanDomain._

  private def df1(cols: (String, Any)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val schemaFields = cols.map {
      case (n, _: String) => s"$n STRING"
      case (n, _: Double) => s"$n DOUBLE"
      case (n, _: Int) => s"$n INT"
      case (n, _: Date) => s"$n DATE"
      case (n, null) => s"$n STRING"
      case (n, _) => s"$n STRING"
    }.mkString(", ")
    val row = org.apache.spark.sql.Row(cols.map(_._2): _*)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)),
      org.apache.spark.sql.types.StructType.fromDDL(schemaFields))
  }

  test("F1 cleanRegion: exact, misspelled, tie-break, null passthrough") {
    val in = Seq("Bangalore", "Bangalre", "Mumbaii", "Dehli", "Kolkatta", null)
    val spark0 = spark
    import spark0.implicits._
    val out = in.toDF("region")
      .select(cleanRegion(col("region")).as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq(
      "Bangalore", "Bangalore", "Mumbai", "Delhi", "Kolkata", null))
  }

  test("F2 monthDiff: calendar-month diff, ignores day-of-month") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq(
      ("2024-01-31", "2024-02-01"), // +1 month despite 1-day gap
      ("2024-01-01", "2024-01-31"), // same month
      ("2023-12-15", "2024-01-15"),
      ("2024-06-15", "2023-06-15")) // negative
      .toDF("d1", "d2")
      .select(monthDiff(to_date(col("d2")), to_date(col("d1"))).as("m"))
      .collect().map(_.getInt(0))
    assert(out.toSeq === Seq(1, 0, 1, -12))
  }

  test("F3 emiAmount: div-by-zero guard yields 0.0") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq((1200.0, 12), (1200.0, 0))
      .toDF("tp", "dm")
      .select(emiAmount(col("tp"), col("dm")).as("emi"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(100.0, 0.0))
  }

  test("F9 dpdBucketFinal: boundaries incl. en-dash labels (bugs-as-spec)") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq(0, 1, 30, 31, 60, 61, 90, 91)
      .toDF("d").select(dpdBucketFinal(col("d")).as("b"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq(
      "Current", "1–30 DPD", "1–30 DPD", "31–60 DPD",
      "31–60 DPD", "61–90 DPD", "61–90 DPD", "90+ DPD"))
    val sched = Seq(0, 30, 31, 91).toDF("d")
      .select(dpdBucketSchedule(col("d")).as("b"))
      .collect().map(_.getString(0))
    assert(sched.toSeq === Seq("Current", "0–30", "30–60", "90+"))
  }

  /** One fully hand-computed loan: P=1000, 12% for 12 months, disbursed
    * 2024-01-15, due 2025-01-15, as-of 2024-07-20, collected 300.
    * duration=12; total_payable = 1000 + 1000*0.12*1 = 1120; emi = 93.333...;
    * months_due = 6; total_demand = 560; arrear = 260; target = 260+93.33-300
    * = 53.33...; dpd: emi_due = 2024-07-15, dpd_days = 5, bucket 1-30.
    */
  test("loanFinal: full derivation on a hand-computed fixture") {
    val base = df1(
      "loan_id" -> 1, "customer_id" -> 1, "customer_name" -> "c",
      "disbursement_amount" -> 1000.0,
      "disbursement_date" -> Date.valueOf("2024-01-15"),
      "due_date" -> Date.valueOf("2025-01-15"),
      "region" -> "Mumbai", "interest_rate" -> 12.0, "pos" -> "O",
      "product_type" -> "PT-1", "emi_collected" -> 300.0)
    val r = loanFinal(base, to_date(lit("2024-07-20"))).collect()(0)
    // expectations computed with the SAME IEEE754 op order as the columns
    val tp = 1000.0 + 1000.0 * (12.0 / 100.0) * (12 / 12.0)
    val emi = tp / 12
    val arrearV = emi * 6 - 300.0
    assert(r.getAs[Int]("duration_months") === 12)
    assert(r.getAs[Double]("total_payable") === tp)
    assert(r.getAs[Int]("months_due") === 6)
    assert(r.getAs[Double]("emi_amount") === emi)
    assert(r.getAs[Double]("total_demand") === emi * 6)
    assert(r.getAs[Double]("arrear") === arrearV)
    assert(r.getAs[Double]("target_amount") === arrearV + emi - 300.0)
    assert(r.getAs[Double]("amount_to_be_returned") === 0.0)
    assert(r.getAs[Int]("dpd_days") === 5)
    assert(r.getAs[String]("dpd_bucket") === "1–30 DPD")
    assert(r.getAs[Double]("total_to_be_collected") === tp - 300.0)
  }

  test("loanFinal: null emi_collected coalesces to 0; zero duration no NaN") {
    val base = df1(
      "loan_id" -> 2, "customer_id" -> 2, "customer_name" -> "c2",
      "disbursement_amount" -> 500.0,
      "disbursement_date" -> Date.valueOf("2024-03-10"),
      "due_date" -> Date.valueOf("2024-03-28"), // duration 0
      "region" -> null, "interest_rate" -> 10.0, "pos" -> "O",
      "product_type" -> null, "emi_collected" -> null)
    val r = loanFinal(base, to_date(lit("2024-07-20"))).collect()(0)
    assert(r.getAs[Int]("duration_months") === 0)
    assert(r.getAs[Double]("emi_amount") === 0.0)
    assert(r.getAs[Double]("total_demand") === 0.0)
    assert(r.getAs[Double]("arrear") === 0.0)
    assert(r.getAs[String]("region_cleaned") === null)
    assert(r.getAs[String]("dpd_bucket") === "Current")
  }

  test("monthlySchedule: row count, contiguous months, credited-per-month quirk") {
    val base = df1(
      "loan_id" -> 3, "customer_id" -> 3, "customer_name" -> "c3",
      "disbursement_amount" -> 1200.0,
      "disbursement_date" -> Date.valueOf("2024-01-15"),
      "due_date" -> Date.valueOf("2024-07-15"), // 6 months
      "region" -> "Delhi", "interest_rate" -> 10.0, "pos" -> "O",
      "product_type" -> "PT-0", "emi_collected" -> 100.0)
    val rows = monthlySchedule(base, to_date(lit("2024-04-20")))
      .orderBy("month").collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[Int]("month")).toSeq === (1 to 6))
    // months 1..3 due on/before 2024-04-20: each credited the FULL 100
    // (main.py:162 quirk); months 4..6 credited 0
    assert(rows.map(_.getAs[Double]("emi_collected")).toSeq ===
      Seq(100.0, 100.0, 100.0, 0.0, 0.0, 0.0))
    // schedule dates formatted dd-MMM-yyyy
    assert(rows(0).getAs[String]("emi_due_date") === "15-Feb-2024")
  }

  test("rollRateFrame: no-cure back-projection matrix on a hand-computed fixture") {
    val spark0 = spark
    import spark0.implicits._
    // (dpd_days, arrear): two current, one fresh 15-DPD (current a month
    // ago), one 45 (was 15), one 100 (was 70), one 130 (was 100)
    val lfd = Seq(
      (0, 0.0), (0, 0.0), (15, 50.0), (45, 150.0), (100, 400.0), (130, 700.0))
      .toDF("dpd_days", "arrear")
      .withColumn("dpd_bucket", LoanDomain.dpdBucketFinal(col("dpd_days")))
    val rows = PortfolioQueries.rollRateFrame(lfd).collect()
    val cells = rows.map(r => (r.getAs[Int]("from_rank"), r.getAs[Int]("to_rank"))
      -> (r.getAs[String]("from_bucket"), r.getAs[String]("to_bucket"),
        r.getAs[Long]("n_loans"), r.getAs[Double]("roll_pct"))).toMap
    assert(rows.length === 5)
    // Current a month ago: 2 stayed, 1 rolled into 1-30 DPD
    assert(cells((0, 0)) === (("Current", "Current", 2L, 2.0 / 3.0)))
    assert(cells((0, 1)) === (("Current", "1–30 DPD", 1L, 1.0 / 3.0)))
    // each delinquent bucket rolls forward one band (or stays at 90+)
    assert(cells((1, 2)) === (("1–30 DPD", "31–60 DPD", 1L, 1.0)))
    assert(cells((3, 4)) === (("61–90 DPD", "90+ DPD", 1L, 1.0)))
    assert(cells((4, 4)) === (("90+ DPD", "90+ DPD", 1L, 1.0)))
    // arrear mass lands in its cell
    assert(rows.find(r => r.getAs[Int]("from_rank") == 3).get
      .getAs[Double]("arrear_total") === 400.0)
  }

  test("bucketForecastFrame: one Markov step replays exactly; absorbing gap conserves mass") {
    val spark0 = spark
    import spark0.implicits._
    // same census as the roll-rate fixture: ranks 0:2, 1:1, 2:1, 4:2.
    // rank 2 carries mass but was never a PRIOR state (no from_rank 2
    // row) — the planted absorbing gap
    val lfd = Seq(
      (0, 0.0), (0, 0.0), (15, 50.0), (45, 150.0), (100, 400.0), (130, 700.0))
      .toDF("dpd_days", "arrear")
      .withColumn("dpd_bucket", LoanDomain.dpdBucketFinal(col("dpd_days")))
    val rows = PortfolioQueries.bucketForecastFrame(lfd).collect()
    assert(rows.length === 16) // 4 horizons x ranks {0,1,2,4}
    def at(h: Int, r: Int) = rows.find(x =>
      x.getAs[Int]("horizon") == h && x.getAs[Int]("rank") == r).get
    // horizon 0 is the exact census
    assert(at(0, 0).getAs[Double]("expected_loans") === 2.0)
    assert(at(0, 4).getAs[Double]("expected_loans") === 2.0)
    assert(at(0, 4).getAs[String]("bucket") === "90+ DPD")
    // horizon 1 through the engine's exact shapes: q6 per product
    def q6(x: Double) = math.floor(x * 1e6 + 0.5)
    assert(at(1, 0).getAs[Double]("expected_loans") === q6(2.0 * (2.0 / 3.0)) / 1e6)
    assert(at(1, 1).getAs[Double]("expected_loans") === q6(2.0 * (1.0 / 3.0)) / 1e6)
    // rank 2 receives 1-30's roll-forward AND keeps its own absorbed mass
    assert(at(1, 2).getAs[Double]("expected_loans")
      === (q6(1.0 * 1.0) + q6(1.0 * 1.0)) / 1e6)
    assert(at(1, 4).getAs[Double]("expected_loans") === 2.0)
    // shares against the census total
    assert(at(1, 4).getAs[Double]("share")
      === at(1, 4).getAs[Double]("expected_loans") / 6.0)
    // mass conserved through the deepest horizon (quantization slack)
    (0 to 3).foreach { h =>
      val tot = rows.filter(_.getAs[Int]("horizon") == h)
        .map(_.getAs[Double]("expected_loans")).sum
      assert(math.abs(tot - 6.0) < 1e-5, s"mass lost at horizon $h: $tot")
    }
  }

  test("irrFrame: Newton root solves the annuity NPV; simple interest hides ~2x effective APR") {
    val spark0 = spark
    import spark0.implicits._
    // 12% nominal simple interest over 12 months: total payable
    // 1200*(1+0.12) = 1344, EMI 112; plus a zero-interest control and a
    // degenerate 0-month loan the solver must exclude
    val base = Seq(
      (1L, 1200.0, 112.0, 12, 12.0),
      (2L, 1200.0, 100.0, 12, 0.0),
      (3L, 1200.0, 0.0, 0, 12.0))
      .toDF("loan_id", "disbursement_amount", "emi_amount",
        "duration_months", "interest_rate")
    val got = PortfolioQueries.irrFrame(base).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // loan 3 excluded
    val r1 = got(0).getAs[Double]("irr_monthly")
    // root check: NPV(irr) ~ 0 for the solved rate
    val npv = 112.0 * (1.0 - math.pow(1.0 + r1, -12.0)) / r1 - 1200.0
    assert(math.abs(npv) < 0.01, s"Newton did not converge: irr=$r1 npv=$npv")
    // the effective APR of a 12%-nominal simple-interest loan is ~23.4%
    val apr1 = got(0).getAs[Double]("apr_effective")
    assert(apr1 > 0.20 && apr1 < 0.26, s"effective APR off: $apr1")
    assert(apr1 > 1.8 * 0.12, "simple interest should hide ~2x the nominal rate")
    // zero-interest: the clamp floors the root, quantization reads 0
    assert(got(1).getAs[Double]("irr_monthly") === 0.0)
    assert(got(1).getAs[Double]("apr_effective") === 0.0)
  }

  test("rateStress: shock 0 reproduces the base book exactly; EMI and delinquency monotone in the shock") {
    val rows = PortfolioQueries.rateStress.frame(spark, sf).collect()
      .map(r => r.getAs[Double]("shock") -> r).toMap
    assert(rows.keySet === PortfolioQueries.StressShocks.toSet)
    val base = rows(0.0)
    // the unshocked scenario IS the book: x + 0.0 = x in IEEE, so the
    // re-priced EMI equals loan_final's and the uplift is exactly zero
    assert(base.getAs[Double]("avg_emi_uplift") === 0.0)
    val lfAgg = LoanDomain.loanFinalUnordered(spark, sf)
      .agg(org.apache.spark.sql.functions.sum(
        graft.api.Det.quantize(
          org.apache.spark.sql.functions.col("emi_amount")))
        .as("q")).head.getLong(0)
    assert(base.getAs[Double]("sum_emi") === lfAgg / 1e4)
    assert(base.getAs[Long]("n_delinquent") ===
      LoanDomain.loanFinalUnordered(spark, sf)
        .filter(org.apache.spark.sql.functions.col("arrear") > 0).count())
    // monotonicity: a higher rate can only raise EMI, demand, arrears
    val ordered = PortfolioQueries.StressShocks.map(rows)
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(a.getAs[Double]("sum_emi") <= b.getAs[Double]("sum_emi"))
      assert(a.getAs[Double]("sum_arrear") <= b.getAs[Double]("sum_arrear"))
      assert(a.getAs[Long]("n_delinquent") <= b.getAs[Long]("n_delinquent"))
      assert(a.getAs[Double]("avg_emi_uplift") <= b.getAs[Double]("avg_emi_uplift"))
    }
    // every scenario re-prices the whole book
    assert(rows.values.map(_.getAs[Long]("n_loans")).toSet.size === 1)
  }
}
