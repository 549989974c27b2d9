package graft.relational

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the relational analytics that carry derivation logic beyond
  * what the DuckDB oracle shape alone makes obvious.
  */
class RelationalSpec extends SparkSpec {

  // The RFM cutoffs must DERIVE from the data: recompute the exact
  // nearest-rank terciles and the full segmentation in plain Scala from
  // the per-customer frame and require identical segment populations.
  test("customer_rfm_segments: cutoffs are the data's nearest-rank terciles") {
    val per = RelationalQueries.rfmPerCustomer(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Int]("rec_days"),
        r.getAs[Long]("freq"), r.getAs[Double]("mon")))
    assert(per.nonEmpty)
    val n = per.length
    def pick[T: Ordering](vs: Array[(T, Long)], p: Double): T = {
      val rk = math.floor((n - 1) * p).toInt // rank rk+1, 0-indexed rk
      vs.sortBy(identity)(Ordering.Tuple2(implicitly[Ordering[T]],
        implicitly[Ordering[Long]]))(rk)._1
    }
    val recT = (pick(per.map(x => (x._2, x._1)), 1.0 / 3),
      pick(per.map(x => (x._2, x._1)), 2.0 / 3))
    val frqT = (pick(per.map(x => (x._3, x._1)), 1.0 / 3),
      pick(per.map(x => (x._3, x._1)), 2.0 / 3))
    val monT = (pick(per.map(x => (x._4, x._1)), 1.0 / 3),
      pick(per.map(x => (x._4, x._1)), 2.0 / 3))
    // cutoffs genuinely split the data: terciles are strictly ordered
    assert(recT._1 < recT._2)
    assert(monT._1 < monT._2)
    val expected = per.groupBy { case (_, rec, frq, mon) =>
      val r = if (rec <= recT._1) 3 else if (rec <= recT._2) 2 else 1
      val f = if (frq > frqT._2) 3 else if (frq > frqT._1) 2 else 1
      val m = if (mon > monT._2) 3 else if (mon > monT._1) 2 else 1
      val score = r + f + m
      if (score >= 8) "champion" else if (score >= 6) "loyal"
      else if (score >= 4) "at_risk" else "hibernating"
    }.view.mapValues(_.length.toLong).toMap
    val got = RelationalQueries.rfmSegments.frame(spark, sf).collect()
      .map(r => r.getAs[String]("segment") -> r.getAs[Long]("n_customers"))
      .toMap
    assert(got === expected)
    // every band is actually populated at this SF
    assert(got.keySet === Set("champion", "loyal", "at_risk", "hibernating"))
  }

  // Dialect-shared type contract (the round-14 hash-fail class): Spark
  // parses `x / 10000.0` as DECIMAL while DuckDB's `/` yields DOUBLE, so
  // a dialect-shared query whose output schema contains a DecimalType
  // WILL hash-mismatch the oracle even when every value is numerically
  // identical. The trap is mechanical (it shipped three times in round
  // 14 despite being documented at RelationalOracle Q17), so the gate is
  // mechanical too: walk EVERY self-declared dialect-shared query in the
  // registry and reject DecimalType anywhere in its analyzed schema.
  test("dialect-shared queries expose no DecimalType output column") {
    val sharedQs = graft.SparkEntry.registry.filter(_.dialectShared)
    // the convention is load-bearing for the relational family — if the
    // filter comes back (near-)empty the flag has drifted, not the bug
    assert(sharedQs.size >= 11, s"expected >=11 shared queries, got ${sharedQs.size}")
    val offenders = sharedQs.flatMap { q =>
      val bad = q.frame(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
