package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Source/sink format breadth: the engine standardizes on Parquet (the
  * corpus format) but the same frames round-trip through CSV, JSON, and
  * ORC — the formats a production ingestion edge actually receives.
  * Schema notes per format are the point of the test: CSV needs explicit
  * schema-on-read (everything is strings otherwise), JSON preserves types
  * loosely (dates come back as strings unless schema'd), ORC is
  * schema-full like Parquet.
  */
class FormatsSpec extends SparkSpec {

  private def roundTripDir(fmt: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$fmt").toString + "/out"

  test("loan_final round-trips through ORC with schema intact") {
    val lf = graft.loan.LoanDomain.loanFinalUnordered(spark, sf)
    val dir = roundTripDir("orc")
    lf.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // file reads mark every column nullable — compare names and types
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      lf.schema.map(f => (f.name, f.dataType)))
    assert(back.count() === lf.count())
  }

  test("loan_final round-trips through JSON with explicit schema-on-read") {
    val lf = graft.loan.LoanDomain.loanFinalUnordered(spark, sf)
    val dir = roundTripDir("json")
    lf.write.mode("overwrite").json(dir)
    val back = spark.read.schema(lf.schema).json(dir)
    assert(back.count() === lf.count())
    // spot-check a value survives the text round-trip exactly
    val a = lf.orderBy("loan_id").limit(1).collect()(0)
    val b = back.orderBy("loan_id").limit(1).collect()(0)
    assert(a.getAs[Double]("arrear") === b.getAs[Double]("arrear"))
    assert(a.getAs[String]("dpd_bucket") === b.getAs[String]("dpd_bucket"))
  }

  test("schedule round-trips through CSV with explicit schema-on-read") {
    val sched = graft.loan.LoanDomain.monthlyScheduleUnordered(spark, sf)
    val dir = roundTripDir("csv")
    sched.write.mode("overwrite").option("header", true).csv(dir)
    val back = spark.read.schema(sched.schema)
      .option("header", true).csv(dir)
    assert(back.count() === sched.count())
    assert(back.filter(col("month") === 1).count() ===
      sched.filter(col("month") === 1).count())
  }
}
