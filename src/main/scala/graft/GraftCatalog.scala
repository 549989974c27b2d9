package graft

import org.apache.spark.sql.SparkSession

/** SQL surface of the engine: registers every corpus table, the loan-domain
  * views, and the native functions as session temp views/functions, so the
  * whole capability set is reachable from `spark.sql(...)` — e.g.
  *
  *   GraftCatalog.register(spark, sfDir)
  *   spark.sql("SELECT dpd_bucket, sum(arrear) FROM loan_final GROUP BY 1")
  *   spark.sql("SELECT hash60(text) % 100 AS bucket FROM documents")
  *
  * Views are lazy logical plans — registering costs nothing until queried,
  * and every Catalyst optimization applies across view boundaries.
  */
object GraftCatalog {

  def register(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    Seq(
      "region" -> Tables.region _,
      "nation" -> Tables.nation _,
      "customer" -> Tables.customer _,
      "supplier" -> Tables.supplier _,
      "part" -> Tables.part _,
      "orders" -> Tables.orders _,
      "lineitem" -> Tables.lineitem _,
      "events" -> Tables.events _,
      "documents" -> Tables.documents _,
      "embeddings" -> Tables.embeddings _
    ).foreach { case (name, load) =>
      load(spark, sfDir).createOrReplaceTempView(name)
    }
    loan.LoanDomain.loans(spark, sfDir).createOrReplaceTempView("loans")
    loan.LoanDomain.loanExtensions(spark, sfDir)
      .createOrReplaceTempView("loan_extensions")
    loan.LoanDomain.customers(spark, sfDir).createOrReplaceTempView("customers")
    loan.LoanDomain.loanFinalUnordered(spark, sfDir)
      .createOrReplaceTempView("loan_final")
    loan.LoanDomain.monthlyScheduleFrame(spark, sfDir)
      .createOrReplaceTempView("loan_monthly_schedule")
  }
}
