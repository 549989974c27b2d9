package graft.loan

import graft.SparkSpec

/** The sketch queries' error-band attestations must actually hold on real
  * data — the oracle asserts the booleans are TRUE, this proves the Spark
  * side computes them honestly (GK sketch brackets the exact percentiles;
  * HLL++ lands inside its rsd band).
  */
class SketchSpec extends SparkSpec {

  test("arrear_approx_quantiles: GK sketch inside exact rank brackets") {
    val r = PortfolioQueries.approxQuantiles.frame(spark, sf).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("n") > 0)
    for (c <- Seq("p50_ok", "p90_ok", "p99_ok"))
      assert(row.getAs[Boolean](c), s"$c attestation failed")
  }

  test("product_type_approx_distinct: HLL++ inside its error band") {
    val r = PortfolioQueries.approxDistinct.frame(spark, sf).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("exact_products") > 0)
    assert(row.getAs[Long]("exact_customers") > 0)
    assert(row.getAs[Boolean]("products_est_ok"))
    assert(row.getAs[Boolean]("customers_est_ok"))
  }
}
