package graft.sources

import graft.SparkSpec

/** Replace-mode load semantics (S3-S6): second load overwrites, row counts
  * match the source frames, schema listed in the catalog.
  */
class WarehouseSpec extends SparkSpec {

  test("loadAll: replace-mode managed tables round-trip") {
    Warehouse.loadAll(spark, sf)
    Warehouse.loadAll(spark, sf) // replace, not append
    val lf = spark.table(s"${Warehouse.Schema}.loan_final")
    val sched = spark.table(s"${Warehouse.Schema}.loan_monthly_schedule")
    assert(lf.count() ===
      graft.loan.LoanDomain.loanFinalFrame(spark, sf).count())
    assert(sched.count() ===
      graft.loan.LoanDomain.monthlyScheduleFrame(spark, sf).count())
    assert(spark.catalog.databaseExists(Warehouse.Schema))
    assert(Warehouse.currentDatabase(spark).nonEmpty)
  }
}
