package graft

class GraftCatalogSpec extends SparkSpec {

  test("full capability surface reachable from spark.sql") {
    GraftCatalog.register(spark, sf)
    val arrears = spark.sql(
      """SELECT dpd_bucket, COUNT(*) AS n
        |FROM loan_final WHERE arrear > 0
        |GROUP BY dpd_bucket ORDER BY dpd_bucket""".stripMargin)
    assert(arrears.count() > 0)

    val joined = spark.sql(
      """SELECT c.customer_name, lf.arrear
        |FROM loan_final lf JOIN customers c USING (customer_id)
        |ORDER BY lf.arrear DESC LIMIT 5""".stripMargin)
    assert(joined.count() === 5)

    val hashed = spark.sql(
      "SELECT hash60(text) % 100 AS bucket FROM documents LIMIT 3")
    assert(hashed.collect().forall { r =>
      val b = r.getLong(0); b >= 0 && b < 100
    })

    val sched = spark.sql(
      "SELECT COUNT(*) FROM loan_monthly_schedule WHERE month = 1")
    assert(sched.collect()(0).getLong(0) > 0)

    // the native aggregate is reachable from SQL too, and its fingerprint
    // BIT-MATCHES the DataFrame path (TextQueries.simhashFromTokens) on
    // the same docs — the SQL tokenization mirrors TextFns.tokens (split
    // on single space, no empty-token filter) so the two paths see the
    // identical token stream
    val sqlFp = spark.sql(
      """SELECT doc_id, simhash_agg(hash60(tok)) AS simhash
        |FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents)
        |GROUP BY doc_id ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(sqlFp.length === 5, "simhash_agg SQL probe returned no rows")
    assert(sqlFp.forall { r =>
      val fp = r.getLong(1); fp >= 0L && fp < (1L << 60)
    }, "simhash fingerprint outside the 60-bit range")
    val dfFp = graft.text.TextQueries.simhashFromTokens(
      Tables.documents(spark, sf).select(
        org.apache.spark.sql.functions.col("doc_id"),
        graft.text.TextFns.tokens(
          org.apache.spark.sql.functions.col("text")).as("toks")))
      .orderBy("doc_id").limit(5).collect()
    assert(sqlFp.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      dfFp.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "SQL simhash_agg drifted from the DataFrame path")
  }
}
