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

  test("orders_fulfillment_lag: type-1 picks at hand-computed ranks; unshipped orders excluded") {
    val spark0 = spark
    import spark0.implicits._
    import java.sql.Timestamp
    def t(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val orders = Seq(
      (1L, t("1996-01-01"), "1-URGENT"), (2L, t("1996-01-01"), "1-URGENT"),
      (3L, t("1996-01-01"), "1-URGENT"), (4L, t("1996-01-01"), "1-URGENT"),
      (5L, t("1996-01-01"), "1-URGENT"),
      (6L, t("1996-01-01"), "1-URGENT")) // never ships -> excluded
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    // lags 1,2,3,4,100; order 5 also has a LATER line that must not move
    // the first-ship date
    val lineitem = Seq(
      (1L, t("1996-01-02")), (2L, t("1996-01-03")), (3L, t("1996-01-04")),
      (4L, t("1996-01-05")), (5L, t("1996-04-10")), (5L, t("1996-06-01")))
      .toDF("l_orderkey", "l_shipdate")
    val r = RelationalQueries.fulfillmentLagFrame(orders, lineitem)
      .collect().head
    // lags {1,2,3,4,100}: ceil(.5*5)=3 -> 3; ceil(.9*5)=5 -> 100
    assert((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4),
      r.getDouble(5)) === ((5L, 3, 100, 100, 110.0 / 5.0)))
  }

  test("associationRulesFrame: confidence is directional, lift symmetric, arithmetic exact") {
    val spark0 = spark
    import spark0.implicits._
    // 5 baskets: {1,2} x3, {1,3}, {4}; duplicate line for (10,1) pins the
    // DISTINCT base (a part twice in one order is still one basket hit)
    val li = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L),
      (14L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = RelationalQueries.associationRulesFrame(li)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    // pair (1,2) n=3 survives min-support 2; (1,3) n=1 does not.
    // N=5, n_1=4, n_2=3: conf(1->2)=3/4 lift=(3/4)/(3/5)=1.25;
    // conf(2->1)=1.0 lift=1/(4/5)=1.25 — symmetric lift, directional conf
    assert(got === Seq(
      (2L, 1L, 3L, 3L, 4L, 1.0, 1.0 / (4.0 / 5.0)),
      (1L, 2L, 3L, 4L, 3L, 3.0 / 4.0, (3.0 / 4.0) / (3.0 / 5.0))))
  }

  test("customer_entity_resolution: full plain-Scala replay (corruption, blocking, argmin) agrees") {
    // independent third implementation of the WHOLE pipeline — the engine
    // and the oracle share the rule text, so only an outside replay
    // catches a rule that is consistently wrong on both
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val clean = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val dirty = clean.map { case (k, name, nat) =>
      val h = h60(name)
      val dn = if (h % RelationalQueries.ErDirtyModulus == 0) {
        val p = (h % 9).toInt + 10 // 1-indexed corruption position
        name.substring(0, p - 1) + "x" + name.substring(p)
      } else name
      (k, nat, dn)
    }
    def keys(n: String) = Seq(n.substring(9, 13), "R" + n.substring(13, 18))
    val cleanByKey = clean
      .flatMap { case (k, n, nat) => keys(n).map(bk => (bk, nat) -> (k, n)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val expected = dirty.map { case (tk, nat, dn) =>
      val cands = keys(dn).flatMap(bk => cleanByKey.getOrElse((bk, nat), Array.empty[(Long, String)]))
        .distinct
        .map { case (ck, cn) => (lev(dn, cn), ck) }
        .filter(_._1 <= 1)
      val best = cands.sorted.headOption
      (nat, tk, best)
    }
    val expAgg = expected.groupBy(_._1).map { case (nat, rows) =>
      val matched = rows.flatMap(_._3)
      nat -> (rows.length.toLong, matched.length.toLong,
        matched.count(_._1 == 0).toLong,
        rows.count(r => r._3.exists(_._2 == r._2)).toLong)
    }
    val got = RelationalQueries.entityResolution.frame(spark, sf).collect()
    assert(got.length === expAgg.size)
    got.foreach { r =>
      val nat = r.getInt(0)
      val (nRec, nMatch, nExact, nCorrect) = expAgg(nat)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((nRec, nMatch, nExact, nCorrect)), s"nation $nat drifted")
      if (nMatch == 0) assert(r.isNullAt(5))
      else assert(r.getDouble(5) === nCorrect.toDouble / nMatch)
    }
    // the planted corruption really happened: some records are inexact,
    // and blocking's 1-edit recall guarantee means every record matches
    val total = expAgg.values.map(_._1).sum
    val exact = expAgg.values.map(_._3).sum
    assert(exact < total, "no record was corrupted — the fixture is dead")
    assert(expAgg.values.map(_._2).sum === total,
      "1-edit blocking recall guarantee violated: an unmatched record")
  }

  test("profileFrame: planted nulls/dups/extremes read back exactly per column") {
    import spark.implicits._
    import java.sql.Timestamp
    val rows = Seq(
      (1L, Some(10L), Some("O"), Some(100.5),
        Some(Timestamp.valueOf("2024-01-01 00:00:00")), Some("1-URGENT")),
      (2L, Some(10L), Some("F"), Some(-3.25),
        Some(Timestamp.valueOf("2024-03-01 12:00:00")), Some("1-URGENT")),
      (3L, None, Some("O"), None, None, Some("5-LOW")),
      (4L, Some(20L), None, Some(7.0), None, None))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = graft.relational.RelationalQueries.profileFrame(rows)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(got.keySet.size === 6)
    got.values.foreach(r => assert(r.getAs[Long]("n_rows") === 4L))
    val ok = got("o_orderkey")
    assert(ok.getAs[Long]("n_nulls") === 0L)
    assert(ok.getAs[Long]("n_distinct") === 4L)
    assert(ok.getAs[Double]("min_num") === 1.0)
    assert(ok.getAs[Double]("max_num") === 4.0)
    assert(ok.getAs[Double]("mean_num") === 10.0 / 4.0)
    val ck = got("o_custkey")
    assert(ck.getAs[Long]("n_nulls") === 1L)
    assert(ck.getAs[Long]("n_distinct") === 2L) // dups collapse, null out
    assert(ck.getAs[Double]("mean_num") === 40.0 / 3.0) // non-null mean
    val st = got("o_orderstatus")
    assert(st.getAs[Long]("n_nulls") === 1L)
    assert(st.getAs[String]("min_str") === "F")
    assert(st.getAs[String]("max_str") === "O")
    assert(st.isNullAt(st.fieldIndex("min_num")))
    val tp = got("o_totalprice")
    assert(tp.getAs[Double]("min_num") === -3.25)
    assert(tp.getAs[Double]("max_num") === 100.5)
    // quantized non-null mean: (1005000 - 32500 + 70000)/1e4/3
    assert(tp.getAs[Double]("mean_num") === 1042500L / 1e4 / 3L)
    val dt = got("o_orderdate")
    assert(dt.getAs[Long]("n_nulls") === 2L)
    assert(dt.getAs[Double]("min_num") ===
      Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000.0)
    assert(dt.getAs[Double]("max_num") ===
      Timestamp.valueOf("2024-03-01 12:00:00").getTime * 1000.0)
    assert(dt.isNullAt(dt.fieldIndex("mean_num")))
    val pr = got("o_orderpriority")
    assert(pr.getAs[Long]("n_distinct") === 2L)
    assert(pr.getAs[String]("min_str") === "1-URGENT")
    assert(pr.getAs[String]("max_str") === "5-LOW")
  }

  test("benfordFrame: planted digit counts replay exactly; uniform digits flag nonconformity; zero-count digit kept") {
    import spark.implicits._
    // counts per first digit 1..9 (digit 9 planted ABSENT), zero and
    // negative amounts filtered; value d*1.11 has first cents digit d
    val counts = Seq(30, 18, 12, 10, 8, 7, 6, 5, 0)
    val vals = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((i + 1) * 1.11)
    } ++ Seq(0.0, -3.0)
    val rows = RelationalQueries.benfordFrame(vals.toDF("v"))
      .collect()
    assert(rows.length === 9)
    val n = counts.sum.toLong
    val p = RelationalQueries.BenfordP
    // replay through the engine's shapes
    val devq = counts.zipWithIndex.map { case (c, i) =>
      val share = c.toLong.toDouble / n.toDouble
      math.floor(math.abs(share - p(i)) * 1e9 + 0.5).toLong
    }
    val c2q = counts.zipWithIndex.map { case (c, i) =>
      val e = n.toDouble * p(i)
      math.floor((c.toLong.toDouble - e) * (c.toLong.toDouble - e) / e
        * 1e6 + 0.5).toLong
    }
    val chi2 = c2q.sum.toDouble / 1e6
    val mad = devq.sum.toDouble / 1e9 / 9.0
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("digit") === (i + 1).toLong)
      assert(r.getAs[Long]("n_d") === counts(i).toLong)
      assert(r.getAs[Double]("share") === counts(i).toLong.toDouble / n.toDouble)
      assert(r.getAs[Double]("p_benford") === p(i))
      assert(r.getAs[Double]("abs_dev") === devq(i).toDouble / 1e9)
      assert(r.getAs[Double]("chi2") === chi2)
      assert(r.getAs[Double]("mad") === mad)
    }
    // 100 organic-ish samples sit near Benford but the missing 9s and
    // fat 1s push MAD past 'close'; the verdict must match the replay
    val expectedVerdict =
      if (devq.sum < RelationalQueries.BenfordMadCloseQ9) "close"
      else if (devq.sum < RelationalQueries.BenfordMadAcceptQ9) "acceptable"
      else if (devq.sum < RelationalQueries.BenfordMadMarginQ9) "marginal"
      else "nonconformity"
    assert(rows.head.getAs[String]("conformity") === expectedVerdict)
    // uniform digit distribution: chi2 rejects and MAD says nonconformity
    val uni = RelationalQueries.benfordFrame(
      (1 to 9).flatMap(d => Seq.fill(100)(d * 1.11)).toDF("v"))
      .collect().head
    assert(uni.getAs[Boolean]("chi2_reject_5pct"))
    assert(uni.getAs[String]("conformity") === "nonconformity")
  }

  test("holtFrame: kernel boundary values; weighted-sum replay bit-exact; planted linear trend recovered") {
    import spark.implicits._
    val k = RelationalQueries.HoltKernel
    val a = RelationalQueries.HoltAlpha
    val b = RelationalQueries.HoltBeta
    // lag-0 impulse responses are the smoothing constants themselves
    // (on the kernel's 1e-9 quantization grid)
    def q(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    assert(k.head === ((0, q(a), q(b * a), 1.0, 0.0)))
    // kernel truncates where all four components quantize to zero
    val last = k.last
    assert(last._2 != 0.0 || last._3 != 0.0 || last._4 != 0.0 || last._5 != 0.0)
    assert(k.size > 100 && k.size < 400)
    // planted linear series x_t = 100 + 10t over 40 months
    val xs = (1 to 40).map(t => 100.0 + 10.0 * t)
    val monthly = xs.zipWithIndex.map { case (x, i) =>
      (java.sql.Timestamp.valueOf(f"20${10 + i / 12}%d-${i % 12 + 1}%02d-01 00:00:00"),
        x, i + 1)
    }.toDF("month", "revenue", "t")
    val rows = RelationalQueries.holtFrame(monthly).collect()
    assert(rows.length === 40)
    // bit-exact replay of the quantized-kernel weighted sums
    val byT = rows.sortBy(_.getAs[java.sql.Timestamp]("month").getTime)
    (1 to 40).foreach { t =>
      val lq = (1 to t).map { j =>
        val (_, wl, _, ul, _) = k(t - j)
        math.floor(xs(j - 1) * (if (j == 1) ul else wl) * 1e4 + 0.5).toLong
      }.sum
      val bq = (1 to t).map { j =>
        val (_, _, wb, _, ub) = k(t - j)
        math.floor(xs(j - 1) * (if (j == 1) ub else wb) * 1e4 + 0.5).toLong
      }.sum
      val r = byT(t - 1)
      assert(r.getAs[Double]("level") === lq.toDouble / 1e4)
      assert(r.getAs[Double]("trend") === bq.toDouble / 1e4)
      assert(r.getAs[Double]("forecast_1mo")
        === r.getAs[Double]("level") + r.getAs[Double]("trend"))
    }
    // Holt tracks the planted slope and forecasts the next point;
    // SES-style level alone would lag by ~trend/alpha = 50
    val tail = byT.last
    assert(math.abs(tail.getAs[Double]("trend") - 10.0) < 0.5)
    assert(math.abs(tail.getAs[Double]("forecast_1mo") - (100.0 + 10.0 * 41)) < 5.0)
  }

  test("anovaFrame: hand decomposition replays exactly; zero within-variance gives NULL F") {
    import spark.implicits._
    // groups A = {1,2,3}, B = {4,5,6}: S=21, Q=91, SSB=13.5, SSW=4,
    // F = 13.5/(4/4) = 13.5 >> crit(df1=1) = 3.841459 -> reject
    val r = RelationalQueries.anovaFrame(
      Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
        ("B", 4.0), ("B", 5.0), ("B", 6.0)).toDF("grp", "v"))
      .collect().head
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(r.getAs[Long]("n_total") === 6L)
    assert(r.getAs[Double]("grand_mean") === 21.0 / 6.0)
    assert(r.getAs[Double]("ssb") === 87.0 - 441.0 / 6.0)
    assert(r.getAs[Double]("ssw") === 91.0 - 87.0)
    assert(r.getAs[Long]("df1") === 1L)
    assert(r.getAs[Long]("df2") === 4L)
    assert(r.getAs[Double]("f_stat") === 13.5)
    assert(r.getAs[Double]("f_crit_5pct") === 3.841459)
    assert(r.getAs[Boolean]("anova_reject_5pct"))
    assert(r.getAs[Double]("eta_sq") === (87.0 - 441.0 / 6.0) / (91.0 - 441.0 / 6.0))
    // identical constant groups: SSW = 0 -> F and verdict NULL on both
    // engines (never Inf)
    val z = RelationalQueries.anovaFrame(
      Seq(("A", 2.0), ("A", 2.0), ("B", 2.0), ("B", 2.0)).toDF("grp", "v"))
      .collect().head
    assert(z.isNullAt(z.fieldIndex("f_stat")))
    assert(z.isNullAt(z.fieldIndex("anova_reject_5pct")))
  }

  test("discountElasticityFrame: exact line, independent cloud, and noisy negative slope all replay") {
    import spark.implicits._
    def run(pts: Seq[(Double, Double)]) =
      RelationalQueries.discountElasticityFrame(pts.toDF("x", "y"))
        .collect().head
    def replaySlope(pts: Seq[(Double, Double)]): Double = {
      val n = pts.size.toDouble
      val xq = pts.map(p => math.floor(p._1 * 100.0 + 0.5))
      val yq = pts.map(p => math.floor(p._2 * 1.0 + 0.5))
      val sx = xq.sum / 1e2; val sxx = xq.map(v => v * v).sum / 1e4
      val sy = yq.sum; val sxy = xq.zip(yq).map(t => t._1 * t._2).sum / 1e2
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    // exact line y = 100x + 1: slope ~100 (same double shape as the
    // replay), r2 = 1, z undefined (the perfect-fit NULL path)
    val linePts = (1 to 6).map(i => (i / 100.0, i + 1.0))
    val line = run(linePts)
    assert(line.getAs[Double]("slope") === replaySlope(linePts))
    assert(math.abs(line.getAs[Double]("slope") - 100.0) < 1e-9)
    assert(line.getAs[Double]("r2") === 1.0)
    assert(line.isNullAt(line.fieldIndex("slope_z")))
    // independent symmetric cloud: slope 0, r2 0, z 0, no rejection
    val cloud = run(Seq((0.01, 1.0), (0.01, 2.0), (0.02, 1.0), (0.02, 2.0)))
    assert(cloud.getAs[Double]("slope") === 0.0)
    assert(cloud.getAs[Double]("r2") === 0.0)
    assert(cloud.getAs[Double]("slope_z") === 0.0)
    assert(!cloud.getAs[Boolean]("slope_reject_5pct"))
    // noisy negative slope: replay z through the engine's shapes
    val pts = Seq((0.01, 5.0), (0.02, 4.0), (0.03, 4.0), (0.04, 3.0))
    val r = run(pts)
    val n = 4.0
    val xq = pts.map(p => math.floor(p._1 * 100.0 + 0.5))
    val yq = pts.map(p => math.floor(p._2 * 1.0 + 0.5))
    val sx = xq.sum / 1e2; val sxx = xq.map(v => v * v).sum / 1e4
    val sy = yq.sum; val syy = yq.map(v => v * v).sum
    val sxy = xq.zip(yq).map { case (a, b) => a * b }.sum / 1e2
    val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
    val cov = n * sxy - sx * sy
    assert(r.getAs[Double]("slope") === cov / vx)
    assert(r.getAs[Double]("slope") < 0.0)
    val r2q = math.floor(cov * cov / (vx * vy) * 1e9 + 0.5)
    assert(r.getAs[Double]("r2") === r2q / 1e9)
    val z = math.floor(math.signum(cov / vx) * math.sqrt(r2q / 1e9)
      * math.sqrt((n - 2) / (1.0 - r2q / 1e9)) * 1e9 + 0.5) / 1e9
    assert(r.getAs[Double]("slope_z") === z)
    assert(r.getAs[Boolean]("slope_reject_5pct") === (math.abs(z) >= 1.959963985))
  }

  test("revenueParetoFrame: hand deciles — exact shares, cumulative monotone, whale concentration on top") {
    import spark.implicits._
    // 20 customers: one whale (1000), nine at 100, ten at 10 — total
    // 2000; deciles of 2 by (revenue desc, key)
    val rows = (Seq((1L, 1000.0)) ++ (2L to 10L).map((_, 100.0)) ++
      (11L to 20L).map((_, 10.0))).toDF("k", "v")
    val got = RelationalQueries.revenueParetoFrame(rows).collect()
    assert(got.length === 10)
    assert(got.map(_.getAs[Long]("n_customers")).forall(_ === 2L))
    // decile 1 = whale + one 100-customer = 1100 of 2000
    assert(got.head.getAs[Long]("decile") === 1L)
    assert(got.head.getAs[Double]("revenue") === 1100.0)
    assert(got.head.getAs[Double]("share") === 1100.0 * 1e4 / (2000.0 * 1e4))
    // deciles 2-5 hold two 100s each; 6-10 two 10s each
    assert(got(1).getAs[Double]("revenue") === 200.0)
    assert(got(5).getAs[Double]("revenue") === 20.0)
    // cumulative share is monotone and ends at exactly 1
    val cum = got.map(_.getAs[Double]("cum_share"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last === 1.0)
    // top-10% concentration: the whale decile carries 55%
    assert(cum.head === 0.55)
  }

  test("backlogFrame: hand intervals replay the sweep-line; idle days carry the level; multi-line orders ship at their MIN") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val orders = Seq((1L, ts(1)), (2L, ts(1)), (3L, ts(3)))
      .toDF("o_orderkey", "o_orderdate")
    // order 1 has two lines shipping d4 and d2: first-ship is d2
    val lines = Seq((1L, ts(4)), (1L, ts(2)), (2L, ts(5)), (3L, ts(3)))
      .toDF("l_orderkey", "l_shipdate")
    val rows = RelationalQueries.backlogFrame(orders, lines).collect()
    assert(rows.length === 5) // dense grid d1..d5
    val got = rows.map(r => (r.getAs[java.sql.Date]("day").toString,
      r.getAs[Long]("n_placed"), r.getAs[Long]("n_first_shipped"),
      r.getAs[Long]("backlog")))
    assert(got === Array(
      ("2024-01-01", 2L, 0L, 2L),
      ("2024-01-02", 0L, 1L, 1L),
      ("2024-01-03", 1L, 1L, 1L),
      ("2024-01-04", 0L, 0L, 1L), // zero-activity day holds the level
      ("2024-01-05", 0L, 1L, 0L)))
  }
}
