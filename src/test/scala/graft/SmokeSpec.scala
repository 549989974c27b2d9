package graft

import org.apache.spark.sql.functions.col

/** End-to-end smoke over the real sf0.001 corpus: the flagship entry and
  * every registry query must build a plan and execute; oracle keys must be
  * a subset of query names (the driver joins them by name).
  */
class SmokeSpec extends SparkSpec {

  test("flagship entry returns rows (t1 gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle keys match query keys") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length === names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every registry query executes on sf0.001") {
    SparkEntry.registry.foreach { q =>
      val n = q.frame(spark, sf).count()
      withClue(q.name) { assert(n >= 0) }
    }
  }

  test("loan_final quirk pins: en-dash labels and credited-per-month") {
    val lf = loan.LoanDomain.loanFinalFrame(spark, sf)
    val buckets = lf.select("dpd_bucket").distinct()
      .collect().map(_.getString(0)).toSet
    assert(buckets.subsetOf(Set(
      "Current", "1–30 DPD", "31–60 DPD", "61–90 DPD", "90+ DPD")))
    // every non-null region cleaned into the 4-city dictionary
    assert(lf.filter(col("region").isNotNull &&
      !col("region_cleaned").isin(loan.LoanDomain.ValidCities: _*)).count() === 0)
  }
}
