package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** EXECUTED JDBC roundtrip against embedded Derby (`derby-*.jar` ships in
  * /opt/spark/jars): unlike ConnectorsSpec's option-map inspection, these
  * tests drive `spark.read.format("jdbc")` / `write.jdbc` for real —
  * the reference's S1 source (main.py:25-41, the customers x loans join
  * pushed into the database) and S3/S4 replace-mode sink (main.py:204-219)
  * as actual executed code paths, including the TRUNCATE branch.
  *
  * Derby folds unquoted identifiers to UPPER CASE, so the seed DDL uses
  * unquoted names (making the verbatim pushed-down query resolve) and the
  * read-back normalizes column names to lower case before asserting.
  */
class JdbcRoundtripSpec extends SparkSpec {

  private lazy val url: String = {
    // engine boots on first connection; keep derby.log out of the repo
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby").toString)
    "jdbc:derby:memory:graftjdbc;create=true"
  }

  test("S1 read: the pushed-down join query executes inside Derby") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // Derby creates the schema implicitly on the first qualified CREATE
      st.executeUpdate(
        """CREATE TABLE customer_mgmt.customers (
          |  customer_id INT, customer_name VARCHAR(50), loan_id INT)""".stripMargin)
      st.executeUpdate(
        """CREATE TABLE loan_mgmt.loans (
          |  loan_id INT, disbursement_amount DOUBLE, disbursement_date DATE,
          |  due_date DATE, region VARCHAR(40), interest_rate DOUBLE, pos DOUBLE)""".stripMargin)
      st.executeUpdate(
        """INSERT INTO customer_mgmt.customers VALUES
          |  (1, 'Asha', 101), (2, 'Bilal', 102), (3, 'Chen', 999)""".stripMargin)
      st.executeUpdate(
        """INSERT INTO loan_mgmt.loans VALUES
          |  (101, 50000.0, DATE('2024-01-15'), DATE('2026-01-15'), 'hyderabad', 10.5, 48000.0),
          |  (102, 75000.0, DATE('2024-03-01'), DATE('2027-03-01'), 'chennai', 9.0, 70000.0)""".stripMargin)
      st.close()
    } finally conn.close()

    spark.conf.set(Connectors.UrlKey, url)
    try {
      val df = Connectors.relationalSource(spark, sf)
      val out = df.toDF(df.columns.map(_.toLowerCase): _*)
        .orderBy("loan_id").collect()
      // inner join inside the database: customer 3's loan 999 never arrives
      assert(out.length === 2)
      assert(out(0).getAs[String]("customer_name") === "Asha")
      assert(out(0).getAs[Double]("disbursement_amount") === 50000.0)
      assert(out(0).getAs[java.sql.Date]("disbursement_date").toString === "2024-01-15")
      assert(out(1).getAs[String]("region") === "chennai")
      assert(out(1).getAs[Double]("interest_rate") === 9.0)
    } finally spark.conf.unset(Connectors.UrlKey)
  }

  test("flagship loan_final runs source-swapped: Derby S1 + document S2 gates") {
    val flagUrl = "jdbc:derby:memory:graftflag;create=true"
    val conn = DriverManager.getConnection(flagUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE customer_mgmt.customers (
          |  customer_id INT, customer_name VARCHAR(50), loan_id INT)""".stripMargin)
      st.executeUpdate(
        """CREATE TABLE loan_mgmt.loans (
          |  loan_id INT, disbursement_amount DOUBLE, disbursement_date DATE,
          |  due_date DATE, region VARCHAR(40), interest_rate DOUBLE, pos DOUBLE)""".stripMargin)
      st.executeUpdate(
        "INSERT INTO customer_mgmt.customers VALUES (1, 'Asha', 101), (2, 'Bilal', 102)")
      st.executeUpdate(
        """INSERT INTO loan_mgmt.loans VALUES
          |  (101, 12000.0, DATE('1998-01-15'), DATE('1999-01-15'), 'Bangalre', 10.0, 1.0),
          |  (102, 24000.0, DATE('1998-03-01'), DATE('2000-03-01'), 'Dehli', 9.0, 1.0)""".stripMargin)
      st.close()
    } finally conn.close()
    val dir = java.nio.file.Files.createTempDirectory("graft-flag-docs")
    // loan 102 is ABSENT: the left join's null feeds the ec0 coalesce path
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"loan_id": 101, "product_type": "PT-1", "emi_collected": 500.0}
        |""".stripMargin)
    spark.conf.set(Connectors.UrlKey, flagUrl)
    spark.conf.set(Connectors.DocsPathKey, dir.toString)
    try {
      val out = graft.loan.LoanDomain.loanFinalFrame(spark, sf)
      val rows = out.collect()
      assert(rows.length === 2)
      val r101 = rows(0)
      assert(r101.getAs[Int]("loan_id") === 101)
      // fuzzy cleaner ran on the database-sourced region column
      assert(r101.getAs[String]("region_cleaned") === "Bangalore")
      assert(r101.getAs[String]("customer_name") === "Asha")
      val r102 = rows(1)
      assert(r102.getAs[String]("region_cleaned") === "Delhi")
      // no extension doc: emi_collected null -> ec0 = 0 -> nothing credited
      assert(r102.isNullAt(r102.fieldIndex("emi_collected")))
      assert(r102.getAs[Double]("total_to_be_collected") ===
        24000.0 + 24000.0 * (9.0 / 100.0) * (24 / 12.0))
    } finally {
      spark.conf.unset(Connectors.UrlKey)
      spark.conf.unset(Connectors.DocsPathKey)
    }
  }

  test("S3/S4 replace sink: create, truncate-overwrite, read back") {
    val spark0 = spark
    import spark0.implicits._
    spark.conf.set(Connectors.UrlKey, url)
    try {
      val first = Seq((1, "PT-1", 10.5), (2, "PT-2", 20.0))
        .toDF("loan_id", "product_type", "arrears")
      Connectors.replaceSink(first, "app.loan_final") // CREATE + INSERT path
      val second = Seq((3, "PT-3", 30.25))
        .toDF("loan_id", "product_type", "arrears")
      Connectors.replaceSink(second, "app.loan_final") // TRUNCATE + INSERT path
      val back = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "app.loan_final").load()
      val rows = back.collect()
      // replace semantics: ONLY the second write's rows survive
      assert(rows.length === 1)
      assert(rows(0).getAs[Int]("loan_id") === 3)
      assert(rows(0).getAs[String]("product_type") === "PT-3")
      assert(rows(0).getAs[Double]("arrears") === 30.25)
    } finally spark.conf.unset(Connectors.UrlKey)
  }
}
