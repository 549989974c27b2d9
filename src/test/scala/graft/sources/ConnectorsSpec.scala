package graft.sources

import graft.SparkSpec

/** Option-map plumbing + gate behavior for the config-gated JDBC/document
  * connectors. No database runs in the sandbox, so the JDBC assertions are
  * on the exact option maps `spark.read/write.format("jdbc")` consumes —
  * the part a misconfiguration would silently break at cluster scale.
  */
class ConnectorsSpec extends SparkSpec {

  test("readOptions: pushed-down query + fetchsize + credentials") {
    val o = Connectors.readOptions("jdbc:postgresql://db:5432/etl",
      Connectors.sourceJoinQuery, Map("user" -> "u", "password" -> "p"))
    assert(o("url") === "jdbc:postgresql://db:5432/etl")
    assert(o("query").contains("JOIN loan_mgmt.loans"))
    assert(o("query").contains("c.customer_id"))
    assert(o("fetchsize").toInt > 0)
    assert(o("user") === "u" && o("password") === "p")
    // query and dbtable are mutually exclusive in Spark's JDBC source
    assert(!o.contains("dbtable"))
  }

  test("partitionedReadOptions: derived-table dbtable, never the query key") {
    val o = Connectors.partitionedReadOptions("jdbc:postgresql://db/etl",
      Connectors.sourceJoinQuery, "loan_id", 1L, 150000L, 32)
    assert(o("dbtable").startsWith("(SELECT"))
    assert(o("dbtable").endsWith(") AS src"))
    // Spark rejects query + partitionColumn; the subquery must be dbtable
    assert(!o.contains("query"))
    assert(o("partitionColumn") === "loan_id")
    assert(o("lowerBound") === "1" && o("upperBound") === "150000")
    assert(o("numPartitions") === "32")
  }

  test("writeOptions: replace is truncate-based, batched, untransacted") {
    val o = Connectors.writeOptions("jdbc:postgresql://db/portfolio",
      "test.loan_final")
    assert(o("dbtable") === "test.loan_final")
    assert(o("truncate") === "true")
    assert(o("batchsize").toInt > 0)
    assert(o("isolationLevel") === "NONE")
  }

  test("relationalSource: parquet fallback is the customers x loans join") {
    assert(Connectors.jdbcUrl(spark).isEmpty)
    val df = Connectors.relationalSource(spark, sf)
    assert(df.columns.toSet === Set(
      "customer_id", "customer_name", "loan_id", "disbursement_amount",
      "disbursement_date", "due_date", "region", "interest_rate", "pos"))
    // every order row has a customer: the inner join keeps all loans
    assert(df.count() === graft.Tables.orders(spark, sf).count())
  }

  test("documentCollection: schema-on-read projection, missing fields null") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"loan_id": 1, "product_type": "PT-1", "emi_collected": 120.5}
        |{"loan_id": 2, "product_type": "PT-2"}
        |{"loan_id": 3}
        |""".stripMargin)
    val df = Connectors.documentCollection(spark, dir.toString,
      Seq("loan_id", "product_type", "emi_collected"))
    assert(df.columns.toSeq === Seq("loan_id", "product_type", "emi_collected"))
    val rows = df.orderBy("loan_id").collect()
    assert(rows.length === 3)
    assert(rows(0).getDouble(2) === 120.5)
    assert(rows(1).isNullAt(2)) // doc without emi_collected -> null row cell
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("documentCollection: field absent from the whole collection still appears") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-miss")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"loan_id": 7, "product_type": "PT-0"}
        |""".stripMargin)
    val df = Connectors.documentCollection(spark, dir.toString,
      Seq("loan_id", "product_type", "emi_collected"))
    val r = df.collect()(0)
    assert(r.isNullAt(2)) // emi_collected never seen -> stable all-null column
  }

  test("loanExtensionsSource: docs-path gate switches source, null flows to ec0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-gate")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"loan_id": 1, "product_type": "PT-1", "emi_collected": 10.0}
        |{"loan_id": 2, "product_type": "PT-2"}
        |""".stripMargin)
    spark.conf.set(Connectors.DocsPathKey, dir.toString)
    try {
      val ext = Connectors.loanExtensionsSource(spark, sf)
      assert(ext.count() === 2)
      // the schemaless null feeds main.py:87's `.get(..., 0) or 0` twin
      val ec = ext.orderBy("loan_id")
        .select(graft.loan.LoanDomain.ec(
          org.apache.spark.sql.functions.col("emi_collected")).as("ec0"))
        .collect().map(_.getDouble(0))
      assert(ec.toSeq === Seq(10.0, 0.0))
    } finally spark.conf.unset(Connectors.DocsPathKey)
    // gate released: back to the lineitem-derived stand-in
    val fallback = Connectors.loanExtensionsSource(spark, sf)
    assert(fallback.columns.toSet ===
      Set("loan_id", "product_type", "emi_collected"))
    assert(fallback.count() > 2)
  }
}
