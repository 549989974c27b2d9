package graft.events

import java.sql.Timestamp
import graft.SparkSpec

/** Hand-fixture pins for the event-family derivations whose registry
  * queries run over the generated corpus: the fixture values are chosen
  * so every expected number is hand-computable AND exact at the 1e-4
  * quantum, so a wrong credit rule can't hide behind rounding.
  */
class EventQueriesSpec extends SparkSpec {

  private def ev(id: Long, ts: String, user: Long, typ: String,
      value: Double) =
    (id, Timestamp.valueOf(ts), user, typ, value, "{}")

  private object EventQueriesSpecKm {
    def rows(df: org.apache.spark.sql.DataFrame)
        : Seq[(Int, Long, Long, Long, Double, Double)] =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
  }

  test("multitouchFrame: U-shaped credit on a hand fixture, window boundaries strict") {
    import spark.implicits._
    val fixture = Seq(
      // user 1: purchase 10.0 with FOUR in-window touches ->
      // first 4.0, last 4.0, two mids 1.0 each
      ev(1, "2024-01-01 09:35:00", 1, "view", 0),
      ev(2, "2024-01-01 09:40:00", 1, "view", 0),
      ev(3, "2024-01-01 09:45:00", 1, "view", 0),
      ev(4, "2024-01-01 09:59:00", 1, "view", 0),
      // boundary exclusions: exactly 30 min before (strict >) and after
      ev(5, "2024-01-01 09:30:00", 1, "view", 0),
      ev(6, "2024-01-01 10:01:00", 1, "view", 0),
      ev(7, "2024-01-01 10:00:00", 1, "purchase", 10.0),
      // user 2: solo touch -> 100% credit
      ev(8, "2024-01-01 11:59:00", 2, "view", 0),
      ev(9, "2024-01-01 12:00:00", 2, "purchase", 5.0),
      // user 3: purchase with no views -> absent from the output
      ev(10, "2024-01-01 13:00:00", 3, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.multitouchFrame(fixture)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSeq
    assert(got === Seq(
      (1L, 1L, 4L, 0.0, 4.0, 4.0, 2.0, 10.0),
      (2L, 1L, 1L, 5.0, 0.0, 0.0, 0.0, 5.0)))
  }

  test("kAnonFrame: planted lattice resolves each class at its own level") {
    import spark.implicits._
    def burst(id0: Long, day: String, typ: String, value: Double, n: Int) =
      (0 until n).map(i => ev(id0 + i, s"$day 10:0${i % 10}:00", 50 + i, typ, value))
    val fixture = (
      // click band 0: 10 rows in ONE day -> anonymous at day grain
      burst(100, "2024-01-05", "click", 10.0, 10) ++
        // click band 1: 5+5 across two days of week 0 -> week grain
        burst(200, "2024-01-02", "click", 60.0, 5) ++
        burst(210, "2024-01-03", "click", 60.0, 5) ++
        // click band 2: 4+3+3 across weeks 0/1/2 of January -> month grain
        burst(300, "2024-01-01", "click", 120.0, 4) ++
        burst(310, "2024-01-08", "click", 120.0, 3) ++
        burst(320, "2024-01-15", "click", 120.0, 3) ++
        // click band 3: 2 rows total -> anonymous nowhere, suppressed
        burst(400, "2024-01-20", "click", 160.0, 2) ++
        // view: a clean single-class type -> row_share exactly 1.0
        burst(500, "2024-01-04", "view", 10.0, 12) ++
        // err band 0, same 7-day bucket SPANNING the month boundary:
        // weeks are anchor-relative buckets, not calendar weeks
        burst(600, "2024-01-31", "err", 10.0, 6) ++
        burst(610, "2024-02-01", "err", 10.0, 6) ++
        // err band 1, different weeks AND different months: the lattice
        // tops out at month -> 5+5 stays suppressed (no year level)
        burst(700, "2024-01-25", "err", 60.0, 5) ++
        burst(710, "2024-02-05", "err", 60.0, 5) ++
        // jan: 5+5 in JANUARY of two different YEARS — a year-blind
        // month(day) key would merge them into one 10-row 'month' class;
        // the months-since-epoch bucket keeps them apart -> suppressed
        burst(800, "2024-01-10", "jan", 10.0, 5) ++
        burst(810, "2025-01-10", "jan", 10.0, 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.kAnonFrame(fixture)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      ("click", "day", 10L, 1L, 10.0 / 32.0),
      ("click", "month", 10L, 3L, 10.0 / 32.0),
      ("click", "suppressed", 2L, 1L, 2.0 / 32.0),
      ("click", "week", 10L, 2L, 10.0 / 32.0),
      ("err", "suppressed", 10L, 2L, 10.0 / 22.0),
      ("err", "week", 12L, 2L, 12.0 / 22.0),
      ("jan", "suppressed", 10L, 2L, 1.0),
      ("view", "day", 12L, 1L, 1.0)))
  }

  test("lDiversityFrame: diversity gate + RESIDUAL coarse classes; kAnonFrame releases what the residual walk suppresses") {
    import spark.implicits._
    // sens bucket s in 0..3 encodes as props.k = s*25 (AnonSensWidth = 25)
    def burst(id0: Long, day: String, typ: String, sens: Int, n: Int) =
      (0 until n).map(i => (id0 + i,
        Timestamp.valueOf(s"$day 10:0${i % 10}:00"), 50L + i, typ, 10.0,
        s"""{"k": ${sens * 25}}"""))
    val fixture = (
      // divok: 12 rows, one day, three sensitive values -> day release
      burst(100, "2024-01-05", "divok", 0, 4) ++
        burst(110, "2024-01-05", "divok", 1, 4) ++
        burst(120, "2024-01-05", "divok", 2, 4) ++
        // mono: day 1 is k-large but SINGLE-valued (the leak kAnonymity
        // misses); day 2 of the same week is small but diverse -> both
        // fail day, the merged week class (20 rows, 3 values) releases
        burst(200, "2024-01-05", "mono", 0, 12) ++
        burst(220, "2024-01-03", "mono", 1, 4) ++
        burst(230, "2024-01-03", "mono", 2, 4) ++
        // mth: 4 rows in each of three DIFFERENT weeks of January, one
        // sensitive value per week -> day and week fail, month releases
        burst(300, "2024-01-02", "mth", 0, 4) ++
        burst(310, "2024-01-10", "mth", 1, 4) ++
        burst(320, "2024-01-17", "mth", 2, 4) ++
        // resid — the ADVICE scenario: day 1 releases (k=10, l=3); day
        // 2's 6 rows fail day, and the RESIDUAL week class holds only
        // those 6 (< k) -> suppressed, even though the FULL week class
        // (16 rows) would clear k — the classic walk's leak
        burst(400, "2024-01-05", "resid", 0, 4) ++
        burst(410, "2024-01-05", "resid", 1, 3) ++
        burst(420, "2024-01-05", "resid", 2, 3) ++
        burst(430, "2024-01-03", "resid", 3, 6))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.lDiversityFrame(fixture)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getDouble(6))).toSeq
    assert(got === Seq(
      ("divok", "day", 12L, 1L, Some(12L), Some(3L), 1.0),
      ("mono", "week", 20L, 1L, Some(20L), Some(3L), 1.0),
      ("mth", "month", 12L, 1L, Some(12L), Some(3L), 1.0),
      ("resid", "day", 10L, 1L, Some(10L), Some(3L), 10.0 / 16.0),
      ("resid", "suppressed", 6L, 1L, None, None, 6.0 / 16.0)))
    // the classic (non-residual) walk on the same rows DOES release
    // resid's 6 leftover rows at week — the full week class counts the
    // 10 already-released day rows toward k
    val ka = EventQueries.kAnonFrame(fixture.filter($"event_type" === "resid"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(ka === Seq(("day", 10L), ("week", 6L)))
  }

  test("contributionCapFrame: first-C-by-time keep rule, event_id tie-break, exact loss") {
    import spark.implicits._
    val fixture = (
      // click/user 1: 8 events, values 1..8 in time order -> keeps 1..5
      (1 to 8).map(i => ev(i, s"2024-01-01 0$i:00:00", 1, "click", i.toDouble)) ++
        // click/user 2: 3 events -> under the cap, all kept
        Seq(ev(21, "2024-01-02 01:00:00", 2, "click", 10.0),
          ev(22, "2024-01-02 02:00:00", 2, "click", 20.0),
          ev(23, "2024-01-02 03:00:00", 2, "click", 30.0)) ++
        // view/user 3: 6 events at the SAME ts -> event_id breaks the tie,
        // ids 31..35 kept, 36 dropped
        (31 to 36).map(i =>
          ev(i, "2024-01-03 12:00:00", 3, "view", (i - 30).toDouble)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.contributionCapFrame(fixture)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSeq
    assert(got === Seq(
      // raw 36+60=96, capped (1+..+5)+60=75, loss 21/96
      ("click", 2L, 1L, 11L, 8L, 96.0, 75.0, 21.0 / 96.0),
      // raw 21, capped 15, loss 6/21
      ("view", 1L, 1L, 6L, 5L, 21.0, 15.0, 6.0 / 21.0)))
  }

  test("events_funnel_ztest: z matches a plain-Scala replay; non-viewers excluded from the population") {
    import spark.implicits._
    def arm(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
    }
    // 8 viewers; 2/4/6 convert view -> click -> purchase (asymmetric
    // across the hash arms so z is nonzero). user 99 purchases WITHOUT
    // viewing: not in the funnel population.
    val converters = Set(2L, 4L, 6L)
    val fixture = ((1L to 8L).flatMap { u =>
      val view = Seq(ev(u * 10, "2024-01-01 10:00:00", u, "view", 0))
      if (converters(u))
        view ++ Seq(ev(u * 10 + 1, "2024-01-01 11:00:00", u, "click", 0),
          ev(u * 10 + 2, "2024-01-01 12:00:00", u, "purchase", 5.0))
      else view
    } :+ ev(990, "2024-01-01 12:00:00", 99, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val Seq(na, nb) = Seq(0L, 1L).map(a => (1L to 8L).count(arm(_) == a).toLong)
    val Seq(ka, kb) = Seq(0L, 1L)
      .map(a => (1L to 8L).count(u => arm(u) == a && converters(u)).toLong)
    val p = (ka + kb).toDouble / (na + nb)
    val se = math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    val row = EventQueries.funnelZtestFrame(fixture).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((na, nb, ka, kb)))
    assert(row.getDouble(4) === ka.toDouble / na)
    assert(row.getDouble(5) === kb.toDouble / nb)
    assert(row.getDouble(6) === (kb.toDouble / nb - ka.toDouble / na) / se)
  }

  test("survivalKmFrame: textbook product-limit values; censored users never count as deaths") {
    import spark.implicits._
    def life(u: Long, firstDay: Int, lastDay: Int) = Seq(
      ev(u * 10, f"2024-01-$firstDay%02d 10:00:00", u, "view", 0),
      ev(u * 10 + 1, f"2024-01-$lastDay%02d 10:00:00", u, "view", 0))
    val fixture = (
      life(1, 30, 30) ++ // duration 0, last seen at obs end -> CENSORED
        life(2, 1, 3) ++ life(3, 1, 3) ++ life(4, 2, 4) ++ // dur 2, churned
        life(5, 1, 6) ++ // dur 5, churned
        life(6, 1, 28)) // dur 27, within 7d of obs end -> CENSORED
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueriesSpecKm.rows(EventQueries.survivalKmFrame(fixture))
    // risk sets walk down: 6 at dur 0, 5 at dur 2, 2 at dur 5, 1 at dur 27
    assert(got.map(r => (r._1, r._2, r._3, r._4)) === Seq(
      (0, 6L, 0L, 1L), (2, 5L, 3L, 0L), (5, 2L, 1L, 0L), (27, 1L, 0L, 1L)))
    // S: 1, 1*(2/5)=0.4, 0.4*(1/2)=0.2, 0.2 (censoring never steps S)
    val surv = got.map(_._5)
    assert(surv.zip(Seq(1.0, 0.4, 0.2, 0.2)).forall {
      case (a, b) => math.abs(a - b) < 2e-6
    }, s"survival drifted: $surv")
    // H: 0, 3/5, 3/5+1/2=1.1, 1.1
    val haz = got.map(_._6)
    assert(haz.zip(Seq(0.0, 0.6, 1.1, 1.1)).forall {
      case (a, b) => math.abs(a - b) < 2e-6
    }, s"hazard drifted: $haz")
    // a naive retention curve would have counted users 1 and 6 as deaths;
    // KM keeps S at 0.2 where naive would end at 0
    assert(surv.last > 0.0)
  }

  test("survivalCohortsFrame: risk sets are cohort-independent; fast cohort's curve drops harder") {
    import spark.implicits._
    def life(u: Long, first: String, last: String) = Seq(
      ev(u * 10, s"$first 10:00:00", u, "view", 0),
      ev(u * 10 + 1, s"$last 10:00:00", u, "view", 0))
    val fixture = (
      // cohort 0 (week of 01-01): 3 of 4 churn at duration 2
      life(1, "2024-01-01", "2024-01-03") ++ life(2, "2024-01-01", "2024-01-03") ++
        life(3, "2024-01-01", "2024-01-03") ++ life(4, "2024-01-01", "2024-01-28") ++
        // cohort 1 (week of 01-08): only 1 of 4 churns at duration 2
        life(5, "2024-01-08", "2024-01-10") ++ life(6, "2024-01-08", "2024-01-28") ++
        life(7, "2024-01-08", "2024-01-28") ++ life(8, "2024-01-08", "2024-01-28") ++
        // observation-end sentinel (cohort 4, censored at duration 0)
        life(99, "2024-01-30", "2024-01-30"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.survivalCohortsFrame(fixture).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    def close(a: Double, b: Double) = math.abs(a - b) < 2e-6
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) === Seq(
      (0L, 2, 4L, 3L, 0L), (0L, 27, 1L, 0L, 1L),
      (1L, 2, 4L, 1L, 0L), (1L, 20, 3L, 0L, 3L),
      (4L, 0, 1L, 0L, 1L)))
    // same duration, cohort-separate risk walks: 1/4 vs 3/4 survive
    assert(close(got(0)._6, 0.25) && close(got(2)._6, 0.75),
      s"stratification leaked across cohorts: $got")
    assert(close(got(1)._6, 0.25) && close(got(3)._6, 0.75))
    assert(got(4)._6 === 1.0)
  }

  test("didFrame: a common shock cancels exactly; a differential effect is recovered exactly") {
    import spark.implicits._
    def arm(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
    }
    // within-arm noise (u % 2) is BALANCED inside each md5 arm
    // ({1,2,5,6} and {3,4,7,8} hold two odds + two evens each), so it
    // adds variance without moving either arm's mean — the estimate
    // stays exact while t stays finite
    def fixture(shock: Double, effect: Double, noisy: Boolean) =
      (1L to 8L).flatMap { u =>
        val pre = 10.0 * u // level differences across users
        val post = pre + 10.0 + (if (noisy) (u % 2).toDouble else 0.0) +
          shock + (if (arm(u) == 1) effect else 0.0)
        Seq(ev(u * 10, "2024-01-05 10:00:00", u, "purchase", pre),
          ev(u * 10 + 1, "2024-01-20 10:00:00", u, "purchase", post))
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def didOf(shock: Double, effect: Double, noisy: Boolean = true) = {
      val r = EventQueries.didFrame(fixture(shock, effect, noisy))
        .collect().head
      (r.getDouble(4), r.getAs[Any]("t_stat"))
    }
    // pure differential effect: recovered exactly at the cents quantum
    val (did1, t1) = didOf(0.0, 50.0)
    assert(did1 === 50.0, s"effect not recovered: $did1")
    assert(t1 != null && t1.asInstanceOf[Double] > 10.0,
      s"strong planted effect should be loudly significant: $t1")
    // a +100 shock hitting BOTH groups' post periods changes nothing —
    // the property DiD exists for
    val (did2, _) = didOf(100.0, 50.0)
    assert(did2 === did1, s"common shock leaked into the estimate: $did2")
    // no effect: estimate exactly 0, t exactly 0
    val (did0, t0) = didOf(0.0, 0.0)
    assert(did0 === 0.0 && t0 === 0.0)
    // degenerate: identical diffs everywhere -> zero variance -> t null
    val (_, tFlat) = didOf(0.0, 0.0, noisy = false)
    assert(tFlat === null, "t must be null when the diffs have zero variance")
  }

  test("abCupedFrame: plain-Scala replay agrees; correlated covariate buys real variance reduction") {
    import spark.implicits._
    def arm(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
    }
    // per user: (pre-period purchase value, post-period value) with post
    // strongly predicted by pre (y ~ 2x) so CUPED has signal to remove
    val users = Seq(
      1L -> (10.0, 21.5), 2L -> (20.0, 39.0), 3L -> (30.0, 62.25),
      4L -> (40.0, 81.0), 5L -> (15.0, 32.0), 6L -> (25.0, 49.5),
      7L -> (35.0, 69.75), 8L -> (45.0, 92.0))
    val fixture = users.zipWithIndex.flatMap { case ((u, (x, y)), i) =>
      Seq(ev(i * 2L, "2024-01-05 10:00:00", u, "purchase", x),
        ev(i * 2L + 1, "2024-01-20 10:00:00", u, "purchase", y))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // replay with the engine's exact expression shapes
    val per = users.map { case (u, (x, y)) =>
      (arm(u), math.floor(x * 100.0 + 0.5).toLong,
        math.floor(y * 100.0 + 0.5).toLong)
    }
    val arms = per.groupBy(_._1).map { case (a, rs) =>
      a -> (rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum,
        rs.map(r => r._2 * r._3).sum, rs.map(r => r._2 * r._2).sum,
        rs.map(r => r._3 * r._3).sum)
    }
    val (pn, psx, psy, psxy, psxx, psyy) = arms.values
      .reduce((l, r) => (l._1 + r._1, l._2 + r._2, l._3 + r._3,
        l._4 + r._4, l._5 + r._5, l._6 + r._6))
    val sc = 100.0
    val xbar = psx / sc / pn
    val cov = (psxy / (sc * sc) - (psx / sc) * (psy / sc) / pn) / (pn - 1)
    val varX = (psxx / (sc * sc) - (psx / sc) * (psx / sc) / pn) / (pn - 1)
    val varY = (psyy / (sc * sc) - (psy / sc) * (psy / sc) / pn) / (pn - 1)
    val theta = cov / varX
    val varYC = varY - theta * cov
    val got = EventQueries.abCupedFrame(fixture).collect()
    assert(got.length === arms.size)
    got.foreach { r =>
      val (n, sx, sy, _, _, _) = arms(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === sx / sc / n) // mean_x
      assert(r.getDouble(3) === sy / sc / n) // mean_y
      assert(r.getDouble(4) === sy / sc / n - theta * (sx / sc / n - xbar))
      assert(r.getDouble(5) === theta)
      assert(r.getDouble(6) === varY)
      assert(r.getDouble(7) === varYC)
      assert(r.getDouble(8) === 1.0 - varYC / varY)
    }
    // the adjustment is real: y ~ 2x leaves little residual variance
    assert(theta > 1.5 && theta < 2.5, s"theta off: $theta")
    assert(1.0 - varYC / varY > 0.9,
      s"variance reduction too weak: ${1.0 - varYC / varY}")
  }

  test("ewmaFrame: planted rate shift crosses the UCL within hours; warm-up never false-alarms") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    // 80 hours at error rate 0.1, then 40 hours at 0.5 (the deploy)
    val fixture = (for {
      i <- 0 until 120
      j <- 0 until 10
    } yield {
      val typ = if (j < (if (i < 80) 1 else 5)) "error" else "click"
      (i * 10L + j, Timestamp.valueOf(t0.plusHours(i.toLong)), 1L, typ, 0.0, "{}")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventQueries.ewmaFrame(fixture).collect()
    assert(rows.length === 120)
    rows.foreach { r =>
      assert(r.getAs[Double]("ucl") > r.getAs[Double]("lcl"))
      assert(!r.getAs[Boolean]("alarm_down"),
        s"spurious low-side alarm at ${r.get(0)}")
    }
    val ups = rows.zipWithIndex.collect {
      case (r, i) if r.getAs[Boolean]("alarm_up") => i
    }
    // the warm-up period and the whole base regime stay silent: the
    // time-varying limits widen exactly as fast as the average warms
    assert(ups.forall(_ >= 80), s"false alarm before the shift: ${ups.take(3).toSeq}")
    // the shifted regime fires within single-digit hours (z converges
    // geometrically: dev >= halfw from ~6 hours after the shift)
    assert(ups.nonEmpty && ups.min < 90,
      s"detector slept through the shift: first=${ups.headOption}")
    // and keeps firing once latched onto the new level
    assert(ups.contains(119))
  }

  test("autocorrFrame: a planted 24-hour cycle peaks at lag 24; zero hours are genuine zeros") {
    import spark.implicits._
    // 10 days of hourly events where hours 0-11 carry 3 events and
    // hours 12-23 carry 1 — a square daily wave; hour 5 of each day is
    // SKIPPED entirely so the dense grid's zero-fill is exercised (an
    // only-observed-rows ACF would alias those gaps)
    val rows = for {
      day <- 0 until 10
      hour <- 0 until 24
      if hour != 5
      k <- 0 until (if (hour < 12) 3 else 1)
    } yield (day.toLong * 100 + hour * 10 + k,
      Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:30:00"),
      1L, "view", 0.0, "{}")
    val fixture = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val acf = EventQueries.autocorrFrame(fixture)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val best = acf.maxBy(_._2)
    assert(best._1 === 24L, s"daily cycle not detected: $acf")
    assert(acf(24L) > 0.8, s"lag-24 ACF too weak: ${acf(24L)}")
    assert(acf(48L) > 0.6, s"harmonic at 48 missing: ${acf(48L)}")
    // the half-period lag is strongly ANTI-correlated on a square wave
    assert(acf(12L) < -0.5, s"half-period anti-correlation missing: ${acf(12L)}")
  }

  test("crosscorrFrame: a planted 3-hour view->purchase lead peaks the CCF at lag 3") {
    import spark.implicits._
    // views follow a 12-on/12-off square day wave; purchases follow the
    // SAME wave shifted +3 hours — the series-level funnel lead
    val rows = for {
      day <- 0 until 10
      hour <- 0 until 24
      (typ, n) <- Seq(
        ("view", if (hour < 12) 4 else 1),
        ("purchase", if (hour >= 3 && hour < 15) 4 else 1))
      k <- 0 until n
    } yield ((day.toLong * 24 + hour) * 100 + (if (typ == "view") 0 else 50) + k,
      Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:20:00"),
      1L, typ, 0.0, "{}")
    val fixture = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ccf = EventQueries.crosscorrFrame(fixture)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val best = ccf.maxBy(_._2)
    assert(best._1 === 3L, s"lead not detected: $ccf")
    assert(ccf(3L) > 0.8, s"lag-3 CCF too weak: ${ccf(3L)}")
    // half-period away the waves oppose
    assert(ccf(15L) < -0.5, s"anti-phase missing: ${ccf(15L)}")
  }

  test("cusumFrame: a planted error-rate level shift alarms after — and only after — the changepoint") {
    import spark.implicits._
    // 10 days, 10 events/hour; days 1-5 carry 1 error (rate 0.1), days
    // 6-10 carry 5 (rate 0.5) — no single hour is a 3-sigma outlier
    // against the global spread, but the LEVEL shifts: CUSUM's regime
    val rows = for {
      day <- 0 until 10
      hour <- 0 until 24
      k <- 0 until 10
    } yield {
      val errs = if (day < 5) 1 else 5
      (day.toLong * 1000 + hour * 10 + k,
        Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:15:00"),
        1L, if (k < errs) "error" else "view", 0.0, "{}")
    }
    val fixture = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.cusumFrame(fixture)
      .select("hour", "alarm_up").collect()
      .map(r => (r.getTimestamp(0), r.getBoolean(1)))
    val shift = Timestamp.valueOf("2024-01-06 00:00:00")
    val upBefore = got.filter(_._1.before(shift)).count(_._2)
    assert(upBefore === 0, s"alarm_up fired $upBefore times before the shift")
    val firstAlarm = got.filter(_._2).map(_._1).minBy(_.getTime)
    assert(!firstAlarm.before(shift), s"first alarm $firstAlarm precedes shift")
    assert(firstAlarm.getTime - shift.getTime <= 24L * 3600 * 1000,
      s"detection latency over a day: $firstAlarm")
  }

  test("stlFrame: deseasonalized CUSUM isolates a shift the raw-series CUSUM buries in daily false alarms") {
    import spark.implicits._
    // 40 days of a 1/10 square daily wave (hod 0-11 -> 1 event, hod
    // 12-23 -> 10); from day 36 every hour gains +6 — a level shift
    // SMALLER than the seasonal swing. Raw-series CUSUM: sigma is
    // swing-inflated (~4.9), yet the 12-hour low phase still drifts
    // 2.7/h against dn_ref -> a false alarm EVERY day from day one.
    // Deseasonalized: sigma ~1.8, the pre-shift drift is negative on
    // both sides (silent), and the +6 shift fires within hours.
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def tsOf(h: Int) = new Timestamp(base + h * 3600L * 1000)
    val nHours = 40 * 24
    val shiftHour = 36 * 24
    def countAt(h: Int): Int =
      (if (h % 24 < 12) 1 else 10) + (if (h >= shiftHour) 6 else 0)
    val rows = for {
      h <- 0 until nHours
      k <- 0 until countAt(h)
    } yield (h.toLong * 100 + k, tsOf(h), 1L, "view", 0.0, "{}")
    val fixture = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.stlFrame(fixture)
      .select("hour", "seasonal", "alarm_up", "alarm_down").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getBoolean(2),
        r.getBoolean(3)))
    val shiftTs = tsOf(shiftHour)
    // the seasonal component recovered the planted wave (amplitude 9,
    // split ±4.5 around the trend)
    val seasByHod = got.groupBy(_._1.toLocalDateTime.getHour)
      .view.mapValues(_.map(_._2).head).toMap
    assert(math.abs(seasByHod(18) - seasByHod(3) - 9.0) < 0.5,
      s"seasonal amplitude off: ${seasByHod(18)} vs ${seasByHod(3)}")
    // silent before the changepoint, fires within a day after it
    assert(got.filter(_._1.before(shiftTs)).forall(r => !r._3 && !r._4),
      "deseasonalized detector alarmed before the shift")
    val ups = got.filter(_._3).map(_._1)
    assert(ups.nonEmpty, "shift never detected")
    assert(ups.minBy(_.getTime).getTime - shiftTs.getTime <=
      24L * 3600 * 1000, "detection latency over a day")
    // the RAW series detector on the SAME counts: swing-driven false
    // alarms long before the shift — the masking stlDecompose removes
    val raw = (0 until nHours).map(h => (tsOf(h), countAt(h).toDouble))
      .toDF("hour", "xv")
    val rawPre = EventQueries.cusumOver(raw, "xv", 6)
      .select("hour", "alarm_up", "alarm_down").collect()
      .filter(_.getTimestamp(0).before(shiftTs))
    assert(rawPre.exists(r => r.getBoolean(1) || r.getBoolean(2)),
      "expected raw-series false alarms before the shift")
  }

  test("forecastBacktestFrame: each of the three models wins its planted regime") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def tsOf(h: Int) = new Timestamp(base + h * 3600L * 1000)
    def wave(hod: Int) = if (hod < 12) 2 else 5
    def build(countAt: Int => Int) = (for {
      h <- 0 until 10 * 24
      k <- 0 until countAt(h)
    } yield (h.toLong * 100 + k, tsOf(h), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // case A: day 8 (the last TRAIN day) is an outlier spike; day 9 (the
    // held-out day) is normal — naive copies the spike and errs ~10/hour,
    // the HW level absorbs ~all of it too (alpha=0.3 hourly adapts within
    // a day), the hod-mean averages it down to ~1.1
    val outlier = build(h =>
      wave(h % 24) + (if (h / 24 == 8) 10 else 0))
    val a = EventQueries.forecastBacktestFrame(outlier)
      .select("winner", "mae_naive", "mae_smean", "mae_hw").head
    assert(a.getString(0) === "seasonal_mean",
      s"outlier day: expected hod-mean win, got ${a.getString(0)} " +
        s"(naive=${a.getDouble(1)} smean=${a.getDouble(2)} hw=${a.getDouble(3)})")
    assert(a.getDouble(1) > a.getDouble(2) * 3)
    assert(a.getDouble(3) > a.getDouble(2) * 3)
    // case B: the series LEVEL shifts +10 for days 8-9 with NO noise —
    // naive copies the recent day exactly (MAE 0); HW is off by the
    // 10*(0.7^24 + kernel dust) its level hasn't fully absorbed; the
    // hod-mean is dragged by the old level
    val shifted = build(h =>
      wave(h % 24) + (if (h / 24 >= 8) 10 else 0))
    val b = EventQueries.forecastBacktestFrame(shifted)
      .select("winner", "mae_naive", "mae_smean", "mae_hw").head
    assert(b.getString(0) === "seasonal_naive",
      s"recent shift: expected naive win, got ${b.getString(0)} " +
        s"(naive=${b.getDouble(1)} smean=${b.getDouble(2)} hw=${b.getDouble(3)})")
    assert(b.getDouble(1) === 0.0)
    assert(b.getDouble(3) > 0.0 && b.getDouble(3) < 0.01,
      s"HW should trail the shift by ~10*0.7^24: ${b.getDouble(3)}")
    // case C — the regime HW exists for: a level shift (days 6-9) UNDER
    // deterministic per-hour jitter. The hod-mean is dragged by the old
    // level (~5.6), naive pays the full jitter difference day-over-day
    // (~2.4), HW tracks the level and smooths the jitter out (~1.3)
    def jitter(h: Int) = (h * 7) % 5 - 2
    val noisyShift = build(h =>
      wave(h % 24) + jitter(h) + (if (h / 24 >= 6) 10 else 0))
    val c = EventQueries.forecastBacktestFrame(noisyShift)
      .select("winner", "mae_naive", "mae_smean", "mae_hw").head
    assert(c.getString(0) === "holt_winters",
      s"shift under jitter: expected HW win, got ${c.getString(0)} " +
        s"(naive=${c.getDouble(1)} smean=${c.getDouble(2)} hw=${c.getDouble(3)})")
    assert(c.getDouble(3) < c.getDouble(1) && c.getDouble(1) < c.getDouble(2))
  }

  test("anomalyMadReadout: flags the moderate anomaly the spike-blinded z-score misses") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def slotTs(i: Int) = new Timestamp(base + i * 600000L)
    // 40 baseline slots alternating 98/102 (43 slots total -> median
    // 102, MAD 4), two 1000 spikes, and ONE moderate 160 slot — the
    // genuine anomaly under test
    def countAt(i: Int) = i match {
      case 40 | 41 => 1000
      case 42 => 160
      case _ => if (i % 2 == 0) 98 else 102
    }
    val fixture = (for {
      i <- 0 until 43
      k <- 0 until countAt(i)
    } yield (i.toLong * 10000 + k, slotTs(i), 1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val madTop = EventQueries.anomalyMadReadout(
        graft.streaming.EventStreams.tumblingCounts(fixture)).collect()
      .map(r => r.getAs[Long]("n") ->
        ((r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Double]("z"), r.getAs[Boolean]("outlier")))).toMap
    // top-3 by |modified z| = the two spikes + the moderate anomaly
    assert(madTop.keySet === Set(1000L, 160L))
    assert(madTop(160L)._1 === 102L && madTop(160L)._2 === 4L)
    // z(160) = 0.6745 * 58 / 4 = 9.78 — flagged (quantized at 1e-9)
    val zExp = math.floor(0.6745 * (58.0 / 4.0) * 1e9 + 0.5) / 1e9
    assert(madTop(160L)._3 === zExp && madTop(160L)._4)
    assert(madTop(1000L)._4)
    // the classic z-score on the SAME slots: the spikes inflate sigma
    // (~192) until the 160 slot scores ~0.09 — BELOW the ordinary
    // baseline wiggle (|z(98)| ~ 0.24), so the blinded detector's top-3
    // ranks baseline slots ABOVE the genuine anomaly and 160 never
    // even surfaces
    val classic = EventQueries.anomalyReadout(
        graft.streaming.EventStreams.tumblingCounts(fixture)).collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Double]("z")).toMap
    assert(!classic.contains(160L),
      s"expected the classic top-3 to miss the 160 slot: $classic")
    assert(madTop(160L)._3 > EventQueries.MadZThreshold)
    // MAD-0 fallback: a constant-majority baseline (41 x 100) puts the
    // median absdev at 0; the meanAD alternative scale still flags the
    // spikes instead of screening the whole type out
    def cAt(i: Int) = if (i >= 41) 1000 else 100
    val flat = (for {
      i <- 0 until 43
      k <- 0 until cAt(i)
    } yield (i.toLong * 10000 + k, slotTs(i), 1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val fb = EventQueries.anomalyMadReadout(
        graft.streaming.EventStreams.tumblingCounts(flat)).collect()
      .map(r => r.getAs[Long]("n") ->
        ((r.getAs[Long]("mad"), r.getAs[Double]("mean_ad"),
          r.getAs[Double]("z"), r.getAs[Boolean]("outlier")))).toMap
    assert(fb.keySet === Set(1000L, 100L)) // 2 spikes + 1 baseline = top 3
    assert(fb(1000L)._1 === 0L)
    assert(fb(1000L)._2 === 1800.0 / 43.0)
    assert(fb(1000L)._4, s"fallback scale failed to flag: ${fb(1000L)}")
    assert(!fb(100L)._4 && fb(100L)._3 === 0.0)
  }

  test("theilSenFrame: recovers the exact slope under planted outliers that wreck OLS") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def tsOf(h: Int) = new Timestamp(base + h * 3600L * 1000)
    val nHours = 72
    // y = 5 + 3t, with 5 hours corrupted by +2000 (7% of points)
    val outliers = Set(10, 25, 40, 55, 70)
    def countAt(h: Int) = 5 + 3 * h + (if (outliers(h)) 2000 else 0)
    val fixture = (for {
      h <- 0 until nHours
      k <- 0 until countAt(h)
    } yield (h.toLong * 10000 + k, tsOf(h), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventQueries.theilSenFrame(fixture).head
    assert(r.getAs[Long]("n_hours") === 72L)
    assert(r.getAs[Long]("n_pairs") === 72L * 71 / 2)
    // the median pairwise slope is EXACTLY the clean slope — outlier
    // pairs are a small minority and the median never sees them
    assert(r.getAs[Double]("slope_theilsen") === 3.0)
    assert(r.getAs[Double]("intercept_theilsen") === 5.0)
    // OLS is dragged hard by the same five points
    assert(math.abs(r.getAs[Double]("slope_ols") - 3.0) > 0.5,
      s"OLS should be wrecked: ${r.getAs[Double]("slope_ols")}")
    // clean series: both agree exactly
    val clean = (for {
      h <- 0 until 24
      k <- 0 until (5 + 3 * h)
    } yield (h.toLong * 10000 + k, tsOf(h), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val c = EventQueries.theilSenFrame(clean).head
    assert(c.getAs[Double]("slope_theilsen") === 3.0)
    assert(c.getAs[Double]("slope_ols") === 3.0)
    assert(c.getAs[Double]("intercept_ols") === 5.0)
  }

  test("abSequentialFrame: plain-Scala replay bit-exact; A/A never rejects; planted effect rejects and p is nonincreasing") {
    import spark.implicits._
    def arm(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val users = (1L to 60L)
    val armA = users.filter(arm(_) == 0).take(10)
    val armB = users.filter(arm(_) == 1).take(10)
    assert(armA.size == 10 && armB.size == 10)
    // 20 days x 10 purchases per arm; deterministic value pattern
    def build(effect: Double) = (for {
      d <- 0 until 20
      (u, i) <- (armA ++ armB).zipWithIndex
    } yield {
      val ts = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
      val v = 10.0 + ((d + i) % 7) + (if (arm(u) == 1) effect else 0.0)
      (d.toLong * 100 + i, ts, u, "purchase", v, "{}")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // A/A: identical per-arm value streams -> delta exactly 0, log L
    // strictly negative, p pinned at 1, never a rejection at any peek
    val aa = EventQueries.abSequentialFrame(build(0.0)).collect()
    assert(aa.length === 20)
    assert(aa.forall(_.getAs[Double]("p_always_valid") === 1.0))
    assert(aa.forall(!_.getAs[Boolean]("reject")))
    // planted +15 effect: replay the full chain in plain Scala
    val got = EventQueries.abSequentialFrame(build(15.0)).collect()
      .map(r => (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("mean_a"), r.getAs[Double]("mean_b"),
        r.getAs[Double]("log_lambda"), r.getAs[Double]("p_always_valid"),
        r.getAs[Boolean]("reject")))
    def q4(x: Double) = math.floor(x * 1e4 + 0.5).toLong
    val tau2 = EventQueries.SeqTauSq
    var (csa, csb, cqa, cqb) = (0L, 0L, 0L, 0L)
    var maxllq = Long.MinValue
    val exp = (0 until 20).map { d =>
      for (i <- 0 until 20) {
        val u = (armA ++ armB)(i)
        val v = 10.0 + ((d + i) % 7) + (if (arm(u) == 1) 15.0 else 0.0)
        if (arm(u) == 0) { csa += q4(v); cqa += q4(v * v) }
        else { csb += q4(v); cqb += q4(v * v) }
      }
      val (na, nb) = ((d + 1) * 10L, (d + 1) * 10L)
      val n = na + nb
      val meanA = csa.toDouble / 1e4 / na.toDouble
      val meanB = csb.toDouble / 1e4 / nb.toDouble
      val sx = (csa + csb).toDouble / 1e4
      val sxx = (cqa + cqb).toDouble / 1e4
      val vp = (sxx - sx * sx / n.toDouble) / (n - 1).toDouble
      val vv = vp * (1.0 / na.toDouble + 1.0 / nb.toDouble)
      val delta = meanB - meanA
      val ll = 0.5 * math.log(vv / (vv + tau2)) +
        delta * delta * tau2 / (2.0 * vv * (vv + tau2))
      val llq = math.floor(ll * 1e9 + 0.5).toLong
      maxllq = math.max(maxllq, llq)
      // StrictMath, not math.exp: Spark's Exp expression evaluates via
      // StrictMath and the Math.exp intrinsic differs in the last ULP
      val p = if (maxllq <= 0) 1.0
        else StrictMath.exp(-(maxllq.toDouble / 1e9))
      (na, nb, meanA, meanB, llq.toDouble / 1e9, p, p <= EventQueries.SeqAlpha)
    }
    got.zip(exp).zipWithIndex.foreach { case ((g, e), d) =>
      assert(g === e, s"day $d diverged") }
    // the always-valid guarantees: p nonincreasing, rejection latches
    assert(got.sliding(2).forall(w => w(1)._6 <= w(0)._6))
    assert(got.last._7, "planted effect never rejected")
    assert(got.indexWhere(_._7) >= 0 &&
      got.drop(got.indexWhere(_._7)).forall(_._7))
  }

  test("forecastConformalFrame: plain-Scala replay bit-exact; q is the finite-sample rank; coverage matches") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def tsOf(h: Int) = new Timestamp(base + h * 3600L * 1000)
    val nHours = 480 // 288h train, 168h calibration, 24h test
    // day-grain jitter with period 5 over days: exchangeable-enough that
    // the finite-sample guarantee is visible on a deterministic fixture
    def jitter(h: Int) = (h / 24 * 3) % 5 - 2
    def countAt(h: Int) = 100 + (if (h % 24 < 12) 2 else 5) + jitter(h)
    val fixture = (for {
      h <- 0 until nHours
      k <- 0 until countAt(h)
    } yield (h.toLong * 1000 + k, tsOf(h), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.forecastConformalFrame(fixture).collect()
      .map(r => ((r.getTimestamp(0).getTime - base) / 3600000L,
        r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getBoolean(7), r.getDouble(8)))
    // independent plain-Scala replay
    val ch = EventQueries.ConformalCalHours
    val bh = EventQueries.BacktestHours
    val calLo = nHours - bh - ch; val testLo = nHours - bh
    val fc = (0 until 24).map { hod =>
      val ys = (hod until calLo by 24).map(countAt)
      hod -> ys.sum.toDouble / ys.size.toDouble
    }.toMap
    val resid = (calLo until testLo)
      .map(h => math.abs(countAt(h).toDouble - fc(h % 24))).sorted
    val k = math.ceil((resid.size + 1) * (1.0 - EventQueries.ConformalAlpha))
      .toInt
    val q = resid(k - 1)
    val covExp = (testLo until nHours).count { h =>
      val y = countAt(h).toDouble
      y >= fc(h % 24) - q && y <= fc(h % 24) + q
    }.toDouble / bh
    assert(got.length === bh)
    got.foreach { case (h, n, f, qc, ncal, lo, hi, cov, covRate) =>
      assert(n === countAt(h.toInt).toLong)
      assert(f === fc(h.toInt % 24), s"fc at $h")
      assert(qc === q, s"conformal radius: got $qc expected $q")
      assert(ncal === ch.toLong)
      assert(lo === f - q && hi === f + q)
      assert(cov === (n.toDouble >= lo && n.toDouble <= hi))
      assert(covRate === covExp)
    }
    // the guarantee holds on this well-behaved series
    assert(covExp >= 1.0 - EventQueries.ConformalAlpha - 0.05, s"$covExp")
  }

  test("ewmaFrozenFrame: a shift over 60% of the window — invisible to the whole-series chart, flagged within hours by the frozen baseline") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def tsOf(h: Int) = new Timestamp(base + h * 3600L * 1000)
    val nHours = 720; val shiftHour = 288 // 60% of the window shifted
    // 100 events/hour; errors 10/12 alternating in-control (mean 0.11,
    // sigma 0.01), 30 after the shift (delta = 0.19 = 19 sigma)
    def errAt(h: Int) = if (h >= shiftHour) 30 else if (h % 2 == 0) 10 else 12
    val fixture = (for {
      h <- 0 until nHours
      k <- 0 until 100
    } yield (h.toLong * 1000 + k, tsOf(h), 1L,
      if (k < errAt(h)) "error" else "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def alarms(df: org.apache.spark.sql.DataFrame) = df
      .select("hour", "alarm_up").collect()
      .map(r => (r.getTimestamp(0).getTime - base) / 3600000L ->
        r.getBoolean(1)).toMap
    // whole-series chart: the shift owns the baseline — mean drifts to
    // ~0.224, sigma inflates to ~0.094, UCL ~0.318 > the 0.30 plateau:
    // the chart never flags the shift UP
    val retro = alarms(EventQueries.ewmaFrame(fixture))
    assert(!retro.values.exists(identity),
      "whole-series chart unexpectedly flagged the majority shift")
    // frozen Phase-I baseline (first 168h, clean): UCL ~0.121 — fires
    // within hours of the changepoint and stays on through the plateau
    val frozen = alarms(EventQueries.ewmaFrozenFrame(fixture))
    assert((0 until shiftHour).forall(h => !frozen(h.toLong)),
      "frozen chart false-alarmed in the in-control region")
    val firstUp = (shiftHour until nHours)
      .find(h => frozen(h.toLong))
    assert(firstUp.exists(_ <= shiftHour + 6),
      s"frozen chart late or silent: first alarm at $firstUp")
    assert((shiftHour + 24 until nHours).forall(h => frozen(h.toLong)),
      "frozen chart dropped the alarm mid-plateau")
  }

  test("targetEncodingFrame: plain-Scala replay bit-exact; flipping a fold's label never moves that fold's encoding") {
    import spark.implicits._
    def fold(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % EventQueries.TeFolds
    }
    def build(rows: Seq[(Long, Long, String)]) = rows
      .map { case (id, u, typ) =>
        ev(id, "2024-01-01 10:00:00", u, typ, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // users 1..4, ~40 events, purchases sprinkled by id parity-ish rule
    val rows = (1L to 40L).map(id =>
      (id, 1L + id % 4, if (id % 3 == 0) "purchase" else "view"))
    val got = EventQueries.targetEncodingFrame(build(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6))).toMap
    // independent plain-Scala replay of the whole encoding table
    val k = EventQueries.TeFolds
    val m = EventQueries.TeSmoothing
    val y = rows.map { case (id, u, t) =>
      (u, fold(id), if (t == "purchase") 1L else 0L) }
    val gs = y.map(_._3).sum; val gn = y.size.toLong
    val cats = y.map(_._1).distinct.sorted
    val expected = (for { c <- cats; f <- 0L until k.toLong } yield {
      val inFold = y.filter(r => r._1 == c && r._2 == f)
      val cAll = y.filter(_._1 == c)
      val fAll = y.filter(_._2 == f)
      val oofCnt = cAll.size.toLong - inFold.size
      val oofSum = cAll.map(_._3).sum - inFold.map(_._3).sum
      val prior = (gs - fAll.map(_._3).sum).toDouble /
        (gn - fAll.size).toDouble
      val enc = (oofSum.toDouble + m * prior) / (oofCnt.toDouble + m)
      (c, f) -> (inFold.size.toLong, oofCnt, oofSum, prior, enc)
    }).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, e) =>
      assert(got(key) === e, s"encoding row $key diverged") }
    // LEAKAGE pin: flip the label of one event; the encodings of ITS OWN
    // (category, fold) cell must not move — no statistic that cell sees
    // was touched — while the category's OTHER folds must move
    val victim = rows.find { case (id, u, _) => u == 1L }.get
    val flipped = rows.map { case r @ (id, u, t) =>
      if (id == victim._1)
        (id, u, if (t == "purchase") "view" else "purchase")
      else r }
    val got2 = EventQueries.targetEncodingFrame(build(flipped)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    val vf = fold(victim._1)
    assert(got2((1L, vf)) === got((1L, vf))._5,
      "own-fold encoding moved on a label flip — leakage")
    val others = (0L until k.toLong).filter(_ != vf)
    assert(others.exists(f => got2((1L, f)) !== got((1L, f))._5),
      "no other fold moved — the flip wasn't applied")
  }

  test("pitTrainingFrame: strictly-before pick; same-instant and later features provably absent; te_user matches the fold's encoding row") {
    import spark.implicits._
    def fold(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % EventQueries.TeFolds
    }
    val fixture = Seq(
      // user 1: one prior view, one SAME-INSTANT view (must not surface
      // — strictly before), one later view (must not surface)
      ev(1, "2024-01-01 09:00:00", 1, "view", 10.0),
      ev(2, "2024-01-01 10:00:00", 1, "view", 20.0),
      ev(3, "2024-01-01 10:00:00", 1, "purchase", 100.0),
      ev(4, "2024-01-01 11:00:00", 1, "view", 30.0),
      // user 2: label with NO history — only an event AFTER label time;
      // feature columns must be NULL, not the later snapshot
      ev(5, "2024-01-01 09:00:00", 2, "purchase", 50.0),
      ev(6, "2024-01-01 09:30:00", 2, "view", 99.0),
      // user 3: two labels — the second sees the first purchase and both
      // views in its history
      ev(7, "2024-01-01 09:00:00", 3, "view", 5.0),
      ev(8, "2024-01-01 10:00:00", 3, "purchase", 40.0),
      ev(9, "2024-01-01 11:00:00", 3, "view", 7.0),
      ev(10, "2024-01-01 12:00:00", 3, "purchase", 60.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.pitTrainingFrame(fixture).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(3L, 5L, 8L, 10L))
    // user 1: the 09:00 view only — the 10:00 view shares the label
    // instant and is leakage under the strict rule
    val l3 = got(3L)
    assert(l3.getAs[Long]("feat_cnt") === 1L)
    assert(l3.getAs[Double]("feat_value_sum") === 10.0)
    assert(l3.getAs[Timestamp]("feat_ts") ===
      Timestamp.valueOf("2024-01-01 09:00:00"))
    assert(l3.getAs[Long]("staleness_us") === 3600L * 1000000L)
    assert(l3.getAs[Double]("label_value") === 100.0)
    // user 2: a feature stamped after label time must be ABSENT — nulls,
    // not the 09:30 snapshot
    val l5 = got(5L)
    assert(l5.isNullAt(l5.fieldIndex("feat_ts")))
    assert(l5.isNullAt(l5.fieldIndex("feat_cnt")))
    assert(l5.isNullAt(l5.fieldIndex("staleness_us")))
    // user 3, second label: history = view(5) + purchase(40) + view(7)
    val l10 = got(10L)
    assert(l10.getAs[Long]("feat_cnt") === 3L)
    assert(l10.getAs[Double]("feat_value_sum") === 52.0)
    assert(l10.getAs[Timestamp]("feat_ts") ===
      Timestamp.valueOf("2024-01-01 11:00:00"))
    // first label of user 3 sees only the 09:00 view
    assert(got(8L).getAs[Long]("feat_cnt") === 1L)
    assert(got(8L).getAs[Double]("feat_value_sum") === 5.0)
    // te_user is the (user, label-fold) row of the encoding table
    val enc = EventQueries.targetEncodingFrame(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    got.foreach { case (id, r) =>
      assert(r.getAs[Double]("te_user") ===
        enc((r.getAs[Long]("user_id"), fold(id))), s"te_user of label $id")
    }
    // fold column is the label's own content hash
    got.foreach { case (id, r) =>
      assert(r.getAs[Long]("fold") === fold(id)) }
  }

  test("dpReleaseFrame: neighboring datasets move capped stats by at most the attested sensitivity; noise replays bit-exact") {
    import spark.implicits._
    def build(rows: Seq[(Long, Long, Double)]) = rows
      .map { case (id, u, v) => ev(id, "2024-01-01 10:00:00", u, "click", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // base: 3 users, few modest events
    val base = Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 2L, 30.0),
      (4L, 3L, 700.0)) // 700 clamps to 500 even in the base release
    // neighbor: + one HOSTILE user with 50 events of a million each —
    // without cap+clamp the release would move by 5e7
    val hostile = (100L to 149L).map(i => (i, 99L, 1e6))
    def release(rows: Seq[(Long, Long, Double)]) =
      EventQueries.dpReleaseFrame(build(rows)).collect().head
    val a = release(base)
    val b = release(base ++ hostile)
    val cap = EventQueries.ContribCap
    val sensSum = cap * EventQueries.DpValueClamp
    assert(a.getAs[Long]("count_capped") === 4L)
    assert(b.getAs[Long]("count_capped") - a.getAs[Long]("count_capped")
      === cap.toLong, "count moved by exactly the cap")
    assert(a.getAs[Double]("sum_clamped") === 10.0 + 20.0 + 30.0 + 500.0)
    assert(b.getAs[Double]("sum_clamped") - a.getAs[Double]("sum_clamped")
      === sensSum, "sum moved by exactly cap x clamp")
    // the attested sensitivities are the bound the construction proves
    assert(a.getAs[Long]("sens_count") === cap.toLong)
    assert(a.getAs[Double]("sens_sum") === sensSum)
    assert(a.getAs[Double]("epsilon_total")
      === 2 * EventQueries.DpEpsilon)
    // plain-Scala replay of the deterministic Laplace (StrictMath — the
    // Spark-side ln evaluates via StrictMath)
    def h60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def lap(tag: String, bScale: Double): Double = {
      val u = (h60(s"dp19:click:$tag") + 1L) / 1152921504606846977.0
      -bScale * math.signum(u - 0.5) *
        StrictMath.log(1.0 - 2.0 * math.abs(u - 0.5))
    }
    val bC = cap.toDouble / EventQueries.DpEpsilon
    val bS = sensSum / EventQueries.DpEpsilon
    assert(a.getAs[Double]("noise_count") === lap("count", bC))
    assert(a.getAs[Double]("noise_sum") === lap("sum", bS))
    assert(a.getAs[Double]("released_count")
      === a.getAs[Long]("count_capped").toDouble + lap("count", bC))
    assert(a.getAs[Double]("released_sum")
      === a.getAs[Double]("sum_clamped") + lap("sum", bS))
    // seed includes the statistic tag: the two draws differ
    assert(a.getAs[Double]("noise_count") !== a.getAs[Double]("noise_sum"))
  }

  test("srmCheckFrame: planted dropped-arm segment pages at 0.1%, balanced segment clean, ALL row on distinct users") {
    import spark.implicits._
    def arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val ids0 = (1L to 400L).filter(arm(_) == 0L)
    val ids1 = (1L to 400L).filter(arm(_) == 1L)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var eid = 0L
    def ev(user: Long, typ: String) = { eid += 1; (eid, ts, user, typ, 0.0, "{}") }
    // 'bal': 8 + 8 users (one user twice — exposure is DISTINCT users);
    // 'drop': 18 arm-0 vs 2 arm-1 (instrumentation dropped an arm)
    val bal0 = ids0.take(8); val bal1 = ids1.take(8)
    val drop0 = ids0.slice(8, 26); val drop1 = ids1.slice(8, 10)
    val rows = bal0.map(ev(_, "bal")) ++ bal1.map(ev(_, "bal")) ++
      Seq(ev(bal0.head, "bal")) ++
      drop0.map(ev(_, "drop")) ++ drop1.map(ev(_, "drop"))
    val r = EventQueries.srmCheckFrame(rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(x => x.getAs[String]("segment") -> x).toMap
    assert(r.keySet === Set("ALL", "bal", "drop"))
    val bal = r("bal")
    assert(bal.getAs[Long]("n_a") === 8L)
    assert(bal.getAs[Long]("n_b") === 8L)
    assert(bal.getAs[Double]("chi2") === 0.0)
    assert(bal.getAs[Double]("share_a") === 0.5)
    assert(!bal.getAs[Boolean]("srm_5pct") && !bal.getAs[Boolean]("srm_1pm"))
    val drop = r("drop")
    assert(drop.getAs[Long]("n_a") === 18L)
    assert(drop.getAs[Long]("n_b") === 2L)
    assert(drop.getAs[Double]("chi2") === 12.8) // 16^2/20
    assert(drop.getAs[Boolean]("srm_5pct") && drop.getAs[Boolean]("srm_1pm"))
    val all = r("ALL")
    assert(all.getAs[Long]("n_users") === 36L)
    assert(all.getAs[Long]("n_a") === 26L)
    // 16^2/36 quantized at 1e-9
    assert(all.getAs[Double]("chi2")
      === math.floor(256.0 / 36.0 * 1e9 + 0.5) / 1e9)
    assert(all.getAs[Boolean]("srm_5pct") && !all.getAs[Boolean]("srm_1pm"))
  }

  test("abPowerFrame: hand-variance fixture — MDE and required-n replay bit-exact") {
    import spark.implicits._
    def arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val ids0 = (1L to 100L).filter(arm(_) == 0L).take(4)
    val ids1 = (1L to 100L).filter(arm(_) == 1L).take(4)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var eid = 0L
    def ev(user: Long, v: Double) = { eid += 1; (eid, ts, user, "view", v, "{}") }
    val rows = ids0.zip(Seq(10.0, 20.0, 30.0, 40.0)).map { case (u, v) => ev(u, v) } ++
      ids1.zip(Seq(12.0, 22.0, 32.0, 42.0)).map { case (u, v) => ev(u, v) }
    val r = EventQueries.abPowerFrame(rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert(r.getAs[Long]("n_a") === 4L)
    assert(r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Double]("mean_a") === 25.0)
    // replay through the engine's exact double shapes (1e4 quanta)
    val sc = 1e4
    def vr(vals: Seq[Double]): Double = {
      val uq = vals.map(v => math.floor(v * sc + 0.5))
      val q = uq.map(x => x * x).sum
      val s0 = uq.sum
      (q / (sc * sc) - (s0 / sc) * (s0 / sc) / 4L) / (4L - 1)
    }
    val va = vr(Seq(10.0, 20.0, 30.0, 40.0))
    val vb = vr(Seq(12.0, 22.0, 32.0, 42.0))
    assert(r.getAs[Double]("var_pooled") === ((4L - 1) * va + (4L - 1) * vb) / (4L + 4L - 2))
    val se2 = va / 4L + vb / 4L
    assert(r.getAs[Double]("se_delta") === math.sqrt(se2))
    val mde = math.floor(EventQueries.PowerZSum * math.sqrt(se2) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("mde_abs") === mde)
    assert(r.getAs[Double]("mde_rel") === mde / 25.0)
    val vp = ((4L - 1) * va + (4L - 1) * vb) / (4L + 4L - 2)
    val d = EventQueries.PowerMdeRel * 25.0
    val nreq = 2.0 * (EventQueries.PowerZSum * EventQueries.PowerZSum) * vp / (d * d)
    assert(r.getAs[Long]("n_req_per_arm_1pct") === math.ceil(nreq).toLong)
  }

  test("bootstrapCiFrame: full plain-Scala replay — Poisson weights, replicate means, nearest-rank CI bit-exact") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val vals = Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0,
      5L -> 50.0, 6L -> 60.0)
    var eid = 0L
    val rows = vals.toSeq.sortBy(_._1).map { case (u, v) =>
      eid += 1; (eid, ts, u, "view", v, "{}")
    }
    val r = EventQueries.bootstrapCiFrame(rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    // independent replay of the whole pipeline
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val cdf = EventQueries.PoissonCdf
    def weight(u: Double): Long = {
      val i = cdf.indexWhere(u < _)
      if (i < 0) cdf.size.toLong else i.toLong
    }
    val uq = vals.map { case (u, v) => u -> math.floor(v * 1e4 + 0.5).toLong }
    val reps = (0 until EventQueries.BootReps).flatMap { b =>
      val ws = uq.toSeq.map { case (user, q) =>
        val u = (hash60(s"boot19:$user:$b") + 1L) / 1152921504606846977.0
        (weight(u), q)
      }
      val sw = ws.map(_._1).sum
      if (sw > 0) {
        val wq = ws.map { case (w, q) => w * q }.sum
        Some((wq.toDouble / 1e4 / sw.toDouble, b))
      } else None
    }.sortBy(identity)
    val bv = reps.size
    val lo = (bv * 5 + 199) / 200
    val hi = (bv * 195 + 199) / 200
    assert(r.getAs[Long]("n_users") === 6L)
    assert(r.getAs[Long]("b_total") === EventQueries.BootReps.toLong)
    assert(r.getAs[Long]("b_valid") === bv.toLong)
    assert(r.getAs[Double]("mean_hat")
      === uq.values.sum.toDouble / 1e4 / 6L.toDouble)
    assert(r.getAs[Double]("ci_lo") === reps(lo - 1)._1)
    assert(r.getAs[Double]("ci_hi") === reps(hi - 1)._1)
    assert(r.getAs[Double]("ci_width") === reps(hi - 1)._1 - reps(lo - 1)._1)
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
    // the interval brackets the point estimate on this fixture
    assert(r.getAs[Boolean]("covered"))
  }

  test("tailHillFrame: hand ratio fixture replays exactly; planted Pareto recovers its tail index") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def mk(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, ts, 1L, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // hand fixture, k=4: top-5 are 160,80,40,20,10 (tie at the threshold
    // broken by event_id), zero/negative filtered out
    val hand = mk(Seq(160.0, 80.0, 40.0, 20.0, 10.0, 10.0, 5.0, 3.0, 1.0,
      0.5, 0.0, -5.0))
    val r = EventQueries.tailHillFrame(hand, 4).collect().head
    assert(r.getAs[Long]("n_events") === 10L)
    assert(r.getAs[Long]("k") === 4L)
    assert(r.getAs[Double]("thr") === 10.0)
    val sq = Seq(16.0, 8.0, 4.0, 2.0)
      .map(x => math.floor(StrictMath.log(x) * 1e9 + 0.5).toLong).sum
    val gamma = sq.toDouble / 1e9 / 4L.toDouble
    assert(r.getAs[Double]("gamma") === gamma)
    assert(r.getAs[Double]("alpha") === 1.0 / gamma)
    // gamma = 2.5 ln2 ~ 1.73 -> alpha ~ 0.58 <= 2: flagged
    assert(r.getAs[Boolean]("infinite_variance"))
    val lq = math.floor(StrictMath.log(4L.toDouble / (10L.toDouble * 1e-4))
      * 1e9 + 0.5).toLong
    assert(r.getAs[Double]("p9999_extrapolated")
      === 10.0 * StrictMath.exp(gamma * (lq.toDouble / 1e9)))
    // planted exact Pareto order statistics x_i = (n/i)^0.6: Hill at
    // k=100 recovers gamma ~ 0.6 and alpha = 1/gamma < 2 flags
    // infinite variance
    val n = 2000
    val pareto = mk((1 to n).map(i =>
      StrictMath.exp(0.6 * StrictMath.log(n.toDouble / i))))
    val p = EventQueries.tailHillFrame(pareto, 100).collect().head
    assert(math.abs(p.getAs[Double]("gamma") - 0.6) < 0.03)
    assert(p.getAs[Boolean]("infinite_variance"))
  }

  test("ksTestFrame: identical arms give D=0; planted location shift rejects with the sup at the last control total") {
    import spark.implicits._
    def arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val ids0 = (1L to 100L).filter(arm(_) == 0L).take(4)
    val ids1 = (1L to 100L).filter(arm(_) == 1L).take(4)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var eid = 0L
    def ev(user: Long, v: Double) = { eid += 1; (eid, ts, user, "view", v, "{}") }
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // identical distributions: D = 0, no rejection, argmax tie -> the
    // smallest total
    val same = ids0.zip(Seq(10.0, 20.0, 30.0, 40.0)).map { case (u, v) => ev(u, v) } ++
      ids1.zip(Seq(10.0, 20.0, 30.0, 40.0)).map { case (u, v) => ev(u, v) }
    val r0 = EventQueries.ksTestFrame(df(same)).collect().head
    assert(r0.getAs[Double]("d_stat") === 0.0)
    assert(!r0.getAs[Boolean]("ks_reject_5pct"))
    assert(r0.getAs[Double]("at_value") === 10.0)
    // disjoint supports: D = 1 attained first at the largest control
    // total; crit = 1.358*sqrt(8/16) ~ 0.96 -> reject
    val shift = ids0.zip(Seq(10.0, 20.0, 30.0, 40.0)).map { case (u, v) => ev(u, v) } ++
      ids1.zip(Seq(110.0, 120.0, 130.0, 140.0)).map { case (u, v) => ev(u, v) }
    val r1 = EventQueries.ksTestFrame(df(shift)).collect().head
    assert(r1.getAs[Long]("n_a") === 4L)
    assert(r1.getAs[Long]("n_b") === 4L)
    assert(r1.getAs[Double]("d_stat") === 1.0)
    assert(r1.getAs[Double]("at_value") === 40.0)
    val crit = math.floor(EventQueries.KsCoeff5
      * math.sqrt(8L.toDouble / 16L.toDouble) * 1e9 + 0.5) / 1e9
    assert(r1.getAs[Double]("d_crit_5pct") === crit)
    assert(r1.getAs[Boolean]("ks_reject_5pct"))
  }

  test("abWinsorizedFrame: planted whale clamps to the pooled p99; winsorized t replays exactly and beats raw") {
    import spark.implicits._
    def arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val ids0 = (1L to 100L).filter(arm(_) == 0L).take(4)
    val ids1 = (1L to 100L).filter(arm(_) == 1L).take(4)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var eid = 0L
    def ev(user: Long, v: Double) = { eid += 1; (eid, ts, user, "view", v, "{}") }
    // the control whale MASKS a real treatment lift and flips the raw
    // sign; pooled cuts over 8 sorted totals: (nn-1)*0.01 -> rank 1
    // (min), (nn-1)*0.99 -> rank 7 = 80
    val a = Seq(10.0, 20.0, 30.0, 100000.0)
    val b = Seq(50.0, 60.0, 70.0, 80.0)
    val rows = ids0.zip(a).map { case (u, v) => ev(u, v) } ++
      ids1.zip(b).map { case (u, v) => ev(u, v) }
    val r = EventQueries.abWinsorizedFrame(rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert(r.getAs[Double]("p_lo") === 10.0)
    assert(r.getAs[Double]("p_hi") === 80.0)
    assert(r.getAs[Long]("n_clamped") === 1L)
    assert(r.getAs[Double]("mean_a_w") === (10.0 + 20.0 + 30.0 + 80.0) / 4L)
    assert(r.getAs[Double]("mean_b_w") === 65.0)
    // replay both t statistics through the engine's exact shapes
    val sc = 1e4
    def stats(vals: Seq[Double]): (Double, Double) = {
      val uq = vals.map(v => math.floor(v * sc + 0.5))
      val s0 = uq.sum; val q = uq.map(x => x * x).sum
      val m = s0 / sc / 4L
      val vr = (q / (sc * sc) - (s0 / sc) * (s0 / sc) / 4L) / (4L - 1)
      (m, vr)
    }
    def t(a0: Seq[Double], b0: Seq[Double]): Double = {
      val (ma, va) = stats(a0); val (mb, vb) = stats(b0)
      val se2 = va / 4L + vb / 4L
      math.floor((mb - ma) / math.sqrt(se2) * 1e6 + 0.5) / 1e6
    }
    val aw = Seq(10.0, 20.0, 30.0, 80.0)
    assert(r.getAs[Double]("t_raw") === t(a, b))
    assert(r.getAs[Double]("t_winsorized") === t(aw, b))
    // the whale flips the raw sign (|t| -> 1 from one outlier); the
    // trimmed statistic recovers the true positive lift, and stronger
    assert(r.getAs[Double]("t_raw") < 0.0)
    assert(r.getAs[Double]("t_winsorized") > 0.0)
    assert(math.abs(r.getAs[Double]("t_winsorized"))
      > math.abs(r.getAs[Double]("t_raw")))
  }

  test("spearmanFrame: monotone-cubic fixture with ties — full midrank replay bit-exact; rho beats Pearson") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var eid = 0L
    // user i: i events of value i^2 (cnt = i, total = i^3 — perfectly
    // monotone but convex), plus two tied users sharing (1 event, 5.0)
    val rows = (1 to 12).flatMap { i =>
      Seq.fill(i) { eid += 1; (eid, ts, i.toLong, "view", (i * i).toDouble, "{}") }
    } ++ Seq(13L, 14L).map { u => eid += 1; (eid, ts, u, "view", 5.0, "{}") }
    val r = EventQueries.spearmanFrame(rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    // plain-Scala replay through the engine's exact shapes
    val per = (1 to 12).map(i => (i.toLong, i.toLong * math.floor(i * i * 1e4 + 0.5).toLong)) ++
      Seq((1L, math.floor(5.0 * 1e4 + 0.5).toLong), (1L, math.floor(5.0 * 1e4 + 0.5).toLong))
    val n = per.size.toLong
    def midranks(vals: Seq[Long]): Map[Long, Long] = {
      val grouped = vals.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      var cum = 0L
      grouped.map { case (v, c) =>
        val r2 = 2L * cum + c + 1L; cum += c; v -> r2
      }.toMap
    }
    val rx = midranks(per.map(_._1)); val ry = midranks(per.map(_._2))
    def q9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    var (sx, sxx, sy, syy, sxy) = (0L, 0L, 0L, 0L, 0L)
    var (pcx, pcxx, pcy, pcyy, pcxy) = (0L, 0L, 0L, 0L, 0L)
    per.foreach { case (c, u) =>
      val ux = rx(c).toDouble / (2.0 * n.toDouble)
      val uy = ry(u).toDouble / (2.0 * n.toDouble)
      sx += q9(ux); sxx += q9(ux * ux); sy += q9(uy); syy += q9(uy * uy)
      sxy += q9(ux * uy)
      pcx += c; pcxx += c * c; pcy += u; pcyy += u * u; pcxy += c * u
    }
    def corr(nd: Double, a: Double, aa: Double, b: Double, bb: Double,
        ab: Double): Double = {
      val vx = nd * aa - a * a; val vy = nd * bb - b * b
      (nd * ab - a * b) / math.sqrt(vx * vy)
    }
    val rho = q9(corr(n.toDouble, sx / 1e9, sxx / 1e9, sy / 1e9,
      syy / 1e9, sxy / 1e9)).toDouble / 1e9
    val pear = q9(corr(n.toDouble, pcx.toDouble, pcxx.toDouble,
      pcy / 1e4, pcyy / 1e8, pcxy / 1e4)).toDouble / 1e9
    assert(r.getAs[Long]("n_users") === n)
    assert(r.getAs[Double]("spearman_rho") === rho)
    assert(r.getAs[Double]("pearson_r") === pear)
    val z = q9(rho * math.sqrt((n - 1).toDouble)).toDouble / 1e9
    assert(r.getAs[Double]("z") === z)
    assert(r.getAs[Boolean]("reject_5pct") === (math.abs(z) >= 1.959963985))
    // the monotone-but-convex relation: rank correlation resolves what
    // the linear one understates
    assert(rho > pear)
    assert(rho > 0.9 && r.getAs[Boolean]("reject_5pct"))
  }

  test("typeDowFrame: exact independence gives chi2=0/V=0; perfect 2x2 association gives V=1 with the top cell") {
    import spark.implicits._
    def tsAt(date: String) = java.sql.Timestamp.valueOf(s"$date 00:00:00")
    def dowOf(date: String): Long =
      java.time.LocalDate.parse(date).toEpochDay % 7
    val d0 = "2024-01-01"; val d1 = "2024-01-02"
    var eid = 0L
    def evs(n: Int, typ: String, date: String) = Seq.fill(n) {
      eid += 1; (eid, tsAt(date), 1L, typ, 0.0, "{}")
    }
    // O_ij = rowshare*colshare*n exactly: A(2,4), B(4,8) -> E = O
    val indep = evs(2, "a", d0) ++ evs(4, "a", d1) ++
      evs(4, "b", d0) ++ evs(8, "b", d1)
    val r0 = EventQueries.typeDowFrame(indep
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert(r0.getAs[Long]("n_events") === 18L)
    assert(r0.getAs[Long]("dof") === 1L)
    assert(r0.getAs[Double]("chi2") === 0.0)
    assert(r0.getAs[Double]("cramers_v") === 0.0)
    // diagonal 2x2: chi2 = n, V = 1 exactly
    eid = 0L
    val dep = evs(10, "a", d0) ++ evs(10, "b", d1)
    val r1 = EventQueries.typeDowFrame(dep
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert(r1.getAs[Double]("chi2") === 20.0)
    assert(r1.getAs[Double]("cramers_v") === 1.0)
    assert(r1.getAs[Long]("n_types") === 2L && r1.getAs[Long]("n_dows") === 2L)
    // all four cells tie at chi2-term 5: the argmax tiebreak picks
    // (type asc, dow asc) — 'a' on d0's dow
    assert(r1.getAs[String]("top_type") === "a")
    assert(r1.getAs[Long]("top_dow") === dowOf(d0))
    assert(r1.getAs[Double]("top_cell_chi2") === 5.0)
    // single-type degenerate: V NULL on both engines
    eid = 0L
    val degen = evs(3, "a", d0) ++ evs(3, "a", d1)
    val r2 = EventQueries.typeDowFrame(degen
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert(r2.isNullAt(r2.fieldIndex("cramers_v")))
  }

  test("powerCurveFrame: staggered-arrival fixture — running MDE replays exactly and shrinks as the audience grows") {
    import spark.implicits._
    def arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val ids0 = (1L to 100L).filter(arm(_) == 0L)
    val ids1 = (1L to 100L).filter(arm(_) == 1L)
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day 10:00:00")
    var eid = 0L
    def ev(u: Long, d: Int, v: Double) = { eid += 1; (eid, ts(d), u, "view", v, "{}") }
    // arrivals: d1 two control + one treatment; d2 one each; d3 one
    // treatment — cumulative (2,1) -> (3,2) -> (3,3)
    val rows = Seq(
      ev(ids0(0), 1, 10.0), ev(ids0(1), 1, 20.0), ev(ids1(0), 1, 30.0),
      ev(ids0(2), 2, 40.0), ev(ids1(1), 2, 50.0),
      ev(ids1(2), 3, 60.0))
    val got = EventQueries.powerCurveFrame(rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect()
    assert(got.length === 3)
    assert(got.map(r => (r.getAs[Long]("users_a"), r.getAs[Long]("users_b")))
      .toSeq === Seq((2L, 1L), (3L, 2L), (3L, 3L)))
    // replay var_pooled and the per-day MDE through the engine's shapes
    val sc = 1e4
    def st(vals: Seq[Double]): (Double, Double) = {
      val uq = vals.map(v => math.floor(v * sc + 0.5))
      val n = vals.size.toLong
      val s0 = uq.sum; val q = uq.map(x => x * x).sum
      (s0 / sc / n,
        (q / (sc * sc) - (s0 / sc) * (s0 / sc) / n) / (n - 1))
    }
    val (meanA, va) = st(Seq(10.0, 20.0, 40.0))
    val (_, vb) = st(Seq(30.0, 50.0, 60.0))
    val vp = ((3L - 1) * va + (3L - 1) * vb) / (3L + 3L - 2)
    def mde(na: Long, nb: Long): Double =
      math.floor(EventQueries.PowerZSum * math.sqrt(vp
        * (1.0 / na.toDouble + 1.0 / nb.toDouble)) * 1e6 + 0.5) / 1e6
    val exp = Seq(mde(2, 1), mde(3, 2), mde(3, 3))
    assert(got.map(_.getAs[Double]("mde_abs")).toSeq === exp)
    assert(got.map(_.getAs[Double]("mde_rel")).toSeq
      === exp.map(_ / meanA))
    // more audience, tighter MDE; a 1% lift stays out of reach at n=3
    assert(exp(0) > exp(1) && exp(1) > exp(2))
    assert(got.forall(!_.getAs[Boolean]("reaches_1pct")))
  }

  test("survivalLogrankFrame: textbook two-arm fixture — O-E, hypergeometric variance, quantized z replay exact") {
    import spark.implicits._
    def arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    // the arm is the user-id content hash, so the fixture SEARCHES ids
    val arm0 = (1L to 200L).filter(arm(_) == 0L)
    val arm1 = (1L to 200L).filter(arm(_) == 1L)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(day: Int) = new java.sql.Timestamp(base + day * 86400000L)
    var eid = 0L
    def life(user: Long, days: Int*) = days.map { d =>
      eid += 1; (eid, at(d), user, "view", 0.0, "{}")
    }
    // arm A: churned at durations 5 and 10; arm B: churned at 5,
    // censored at 15 (last event within the 21d gap of obs day 100),
    // plus the dur-0 censored observer anchoring obs_day
    val rows = life(arm0(0), 0, 5) ++ life(arm0(1), 0, 10) ++
      life(arm1(0), 0, 5) ++ life(arm1(1), 79, 94) ++ life(arm1(2), 100)
    val r = EventQueries.survivalLogrankFrame(rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert(r.getAs[Long]("n_users_a") === 2L)
    assert(r.getAs[Long]("n_users_b") === 3L)
    assert(r.getAs[Long]("n_churn_a") === 2L)
    assert(r.getAs[Long]("n_churn_b") === 1L)
    assert(r.getAs[Long]("n_times") === 2L)
    // hand table: t=5 (n1=2,nt=4,d1=1,dt=2): E=1, V=1/3; t=10
    // (n1=1,nt=2,d1=1,dt=1): E=0.5, V=0.25 — quantized: V sums to
    // 583333333/1e9
    assert(r.getAs[Long]("observed_a") === 2L)
    assert(r.getAs[Double]("expected_a") === 1.5)
    assert(r.getAs[Double]("o_minus_e") === 0.5)
    assert(r.getAs[Double]("var_logrank") === 583333333.0 / 1e9)
    val z = math.floor(0.5 / math.sqrt(583333333.0 / 1e9) * 1e9 + 0.5) / 1e9
    assert(r.getAs[Double]("z") === z)
    assert(r.getAs[Double]("chi2") === z * z)
    assert(!r.getAs[Boolean]("reject_5pct"))
    // textbook value of this fixture's statistic
    assert(math.abs(z - 0.6546536) < 1e-6)
  }

  test("changepointBinsegFrame: planted level shifts located exactly; full greedy replay bit-exact") {
    import spark.implicits._
    // piecewise-constant hourly series: 10/h for 80h, 30/h for 70h,
    // 18/h for 50h — two true changepoints at t=79|80 and t=149|150
    val levels = Vector.fill(80)(10L) ++ Vector.fill(70)(30L) ++
      Vector.fill(50)(18L)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = levels.zipWithIndex.flatMap { case (c, h) =>
      (1L to c).map(j => (h * 1000L + j,
        new java.sql.Timestamp(base + h * 3600000L), 1L, "click", 0.0, "{}"))
    }
    val got = EventQueries.changepointBinsegFrame(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect()
    // plain-Scala replay of the same greedy with the same double shapes
    val k = EventQueries.BinsegK
    val l = EventQueries.BinsegMinSeg
    var bps = List.empty[Int]
    val exp = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Double, Double, Long, Long)]
    for (_ <- 1 to k) {
      val cands = levels.indices.groupBy(t => bps.count(b => t > b)).toSeq
        .flatMap { case (_, ts) =>
          val tsSorted = ts.sorted
          val seg = tsSorted.map(levels)
          val s1 = seg.sum
          val nn = seg.size.toLong
          seg.indices.flatMap { idx =>
            val i = idx + 1L
            if (i >= l && nn - i >= l) {
              val cum = seg.take(idx + 1).sum
              val g = cum.toDouble * cum.toDouble / i.toDouble +
                (s1 - cum).toDouble * (s1 - cum).toDouble /
                  (nn - i).toDouble -
                s1.toDouble * s1.toDouble / nn.toDouble
              Some((tsSorted(idx).toLong,
                math.floor(g * 1e6 + 0.5).toLong,
                cum.toDouble / i.toDouble,
                (s1 - cum).toDouble / (nn - i).toDouble, i, nn - i))
            } else None
          }
        }
      val best = cands.minBy { case (t, gq, _, _, _, _) => (-gq, t) }
      exp += ((best._1, best._2, 0L, best._3, best._4, best._5, best._6))
      bps ::= best._1.toInt
    }
    assert(got.length === k)
    got.zip(exp).zipWithIndex.foreach { case ((r, e), idx) =>
      assert(r.getAs[Long]("rank") === idx + 1L)
      assert(r.getAs[Long]("t") === e._1, s"split ${idx + 1} location")
      assert(r.getAs[Double]("gain") === e._2.toDouble / 1e6)
      assert(r.getAs[Double]("mean_left") === e._4)
      assert(r.getAs[Double]("mean_right") === e._5)
      assert(r.getAs[Long]("n_left") === e._6)
      assert(r.getAs[Long]("n_right") === e._7)
    }
    // the first two greedy splits are exactly the planted boundaries
    assert(got.take(2).map(_.getAs[Long]("t")).toSet === Set(79L, 149L))
    // the third split carves a pure-constant segment: its gain is an
    // order of magnitude below the real shifts'
    assert(got(2).getAs[Double]("gain") <
      got(1).getAs[Double]("gain") / 10.0)
  }

  test("keySkewFrame: planted hot key — shares, Gini, and the salt factor replay exactly") {
    import spark.implicits._
    // one user with 90 events, ten users with 1 each
    val rows = (1 to 90).map(i => ev(i.toLong, "2024-01-01 10:00:00", 99L,
      "click", 0.0)) ++
      (1 to 10).map(i => ev(100L + i, "2024-01-01 10:00:00", i.toLong,
        "click", 0.0))
    val r = EventQueries.keySkewFrame(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert(r.getAs[Long]("n_rows") === 100L)
    assert(r.getAs[Long]("n_keys") === 11L)
    assert(r.getAs[Long]("max_cnt") === 90L)
    assert(r.getAs[Double]("max_share") === 0.9)
    // top-10 keys by count: the hot key + 9 singletons
    assert(r.getAs[Double]("top10_share") === 0.99)
    // ascending counts: ten 1s (ranks 1-10) then 90 (rank 11):
    // s_ic = 55 + 990 = 1045
    assert(r.getAs[Double]("gini")
      === 2.0 * 1045.0 / (11.0 * 100.0) - 12.0 / 11.0)
    assert(r.getAs[Long]("suggested_salt")
      === math.ceil(90.0 * EventQueries.SkewReducers / 100.0).toLong)
    assert(r.getAs[Boolean]("skewed"))
    // uniform control: every key once -> gini 0, salt 1, not skewed
    val flat = (1 to 64).map(i => ev(i.toLong, "2024-01-01 10:00:00",
      i.toLong, "click", 0.0))
    val f = EventQueries.keySkewFrame(
      flat.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().head
    assert(f.getAs[Double]("gini")
      === 2.0 * (64.0 * 65.0 / 2.0) / (64.0 * 64.0) - 65.0 / 64.0)
    assert(math.abs(f.getAs[Double]("gini")) < 1e-12)
    assert(f.getAs[Long]("suggested_salt") === 1L)
    assert(!f.getAs[Boolean]("skewed"))
  }

  test("fdrBhFrame: largest-prefix rule rejects a failing middle rank; diagonal crit == SrmChi2Crit5Q") {
    import spark.implicits._
    // the (m, m) diagonal of the generated grid is the plain 5% critical
    // value the SRM guardrail already pins
    EventQueries.bhCritQ.filter { case (i, m, _) => i == m }.foreach {
      case (_, _, q) => assert(q === EventQueries.SrmChi2Crit5Q)
    }
    // m=4 at alpha=.05: crits ~ [6.239, 5.024, 4.326, 3.841]. Planted
    // chi2s [10, 4.9, 4.35, 3.0]: rank 2 FAILS its line (4.9 < 5.024)
    // but rank 3 passes (4.35 >= 4.326), so BH rejects ranks 1..3 —
    // including the failing rank 2 (the prefix property) — and spares 4.
    val srm = Seq(
      ("seg_a", 100L, 10.0), ("seg_b", 100L, 4.9),
      ("seg_c", 100L, 4.35), ("seg_d", 100L, 3.0),
      ("ALL", 400L, 99.0)) // excluded: not one of the m hypotheses
      .toDF("segment", "n_users", "chi2")
    val got = EventQueries.fdrBhFrame(srm).collect()
    assert(got.length === 4, "ALL row must be excluded")
    assert(got.map(_.getAs[Long]("m_tests")).distinct.toSeq === Seq(4L))
    val byseg = got.map(r => r.getAs[String]("segment") -> r).toMap
    assert(byseg("seg_a").getAs[Boolean]("exceeds_bh_line"))
    assert(!byseg("seg_b").getAs[Boolean]("exceeds_bh_line"))
    assert(byseg("seg_c").getAs[Boolean]("exceeds_bh_line"))
    assert(!byseg("seg_d").getAs[Boolean]("exceeds_bh_line"))
    assert(byseg("seg_a").getAs[Boolean]("rejected_bh"))
    assert(byseg("seg_b").getAs[Boolean]("rejected_bh"),
      "prefix property violated: failing rank inside the prefix must reject")
    assert(byseg("seg_c").getAs[Boolean]("rejected_bh"))
    assert(!byseg("seg_d").getAs[Boolean]("rejected_bh"))
    // all-null case: nothing passes -> nothing rejected
    val calm = Seq(("s1", 10L, 0.5), ("s2", 10L, 0.1))
      .toDF("segment", "n_users", "chi2")
    val calmGot = EventQueries.fdrBhFrame(calm).collect()
    assert(calmGot.forall(!_.getAs[Boolean]("rejected_bh")))
    // corpus surface: balanced hash assignment -> no rejections
    val corpus = EventQueries.srmFdr.frame(spark, sf).collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall(!_.getAs[Boolean]("rejected_bh")))
  }

  test("bradleyTerry: planted transitive dominance recovered; MM sweeps == plain-Scala replay bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 12 users each value the four types alpha > beta > gamma > delta
    // (with user-varying magnitudes so per-user totals differ), so every
    // pairwise comparison points the same way — the known total order
    val rows = (1 to 12).flatMap { u =>
      Seq(("alpha", 40.0 + u), ("beta", 30.0 + u), ("gamma", 20.0 + u),
        ("delta", 10.0 + u)).zipWithIndex.map { case ((t, v), i) =>
        ev((u * 10 + i).toLong, "2024-01-01 10:00:00", u.toLong, t, v)
      }
    }
    val events = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val pairs = EventQueries.btPairsFrame(events)
    val got = EventQueries.btRankFrame(
      EventQueries.btFit(pairs, EventQueries.BtIters)).collect()
    assert(got.map(_.getAs[String]("event_type")).toSeq ===
      Seq("alpha", "beta", "gamma", "delta"))
    assert(got.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L, 4L))
    val s = got.map(r =>
      r.getAs[String]("event_type") -> r.getAs[Double]("strength")).toMap
    assert(s("alpha") > s("beta") && s("beta") > s("gamma") &&
      s("gamma") > s("delta"))
    // alpha wins all 36 of its comparisons (3 opponents x 12 users)
    assert(got.head.getAs[Long]("wins") === 36L)
    assert(got.head.getAs[Long]("n_comps") === 36L)
    // plain-Scala MM replay over the collected pair table: identical
    // quantized sweeps, strength for strength
    val p = pairs.collect().map(r => (r.getAs[String]("ta"),
      r.getAs[String]("tb"), r.getAs[Long]("n"), r.getAs[Long]("wa")))
    val items = p.flatMap(x => Seq(x._1, x._2)).distinct.sorted
    val wins = items.map(i => i -> (
      p.filter(_._1 == i).map(_._4).sum +
        p.filter(_._2 == i).map(x => x._3 - x._4).sum)).toMap
    val comps = p.flatMap(x =>
      Seq((x._1, x._2, x._3), (x._2, x._1, x._3)))
    var sw = items.map(_ -> 1.0).toMap
    def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    for (_ <- 1 to EventQueries.BtIters) {
      val dq = items.map(i => i -> comps.filter(_._1 == i)
        .map { case (_, j, n) =>
          math.floor(n / (sw(i) + sw(j)) * 1e9 + 0.5).toLong }.sum).toMap
      val raw = items.map(i =>
        i -> q9(wins(i) / (dq(i).toDouble / 1e9))).toMap
      val tq = items.map(i =>
        math.floor(raw(i) * 1e9 + 0.5).toLong).sum
      sw = items.map(i => i ->
        q9(raw(i) * (items.length / (tq.toDouble / 1e9)))).toMap
    }
    s.foreach { case (i, v) =>
      assert(v === sw(i), s"strength of $i diverged from the replay")
    }
  }

  test("saltedJoinFrame: planted hot key — rewrite equals the plain join exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum, floor}
    // one user carries 70% of the fact; a long cold tail
    val rows = (1 to 700).map(i => ev(i.toLong, "2024-01-01 10:00:00", 7L,
      "click", i * 0.5)) ++
      (1 to 300).map(i => ev(1000L + i, "2024-01-01 10:00:00",
        (i % 40).toLong, "view", 1.25))
    val events = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val customers = (0 to 60).map(k =>
      (k.toLong, s"c$k", k % 5, 0.0, s"SEG_${k % 3}"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val salted = EventQueries.saltedJoinFrame(events, customers).collect()
    val plain = events.join(customers, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1e4) + lit(0.5))) / lit(1e4))
          .as("sum_value"))
      .orderBy("c_mktsegment").collect()
    assert(salted.toSeq === plain.toSeq)
    // the hot user's segment is present and dominates the event count
    val bySeg = salted.map(r =>
      r.getAs[String]("c_mktsegment") -> r.getAs[Long]("n_events")).toMap
    assert(bySeg("SEG_1") >= 700L) // user 7 -> SEG_1
  }

  test("kpiContributionFrame: contributions sum to the day delta; vanished/appeared segments decompose from zero") {
    import spark.implicits._
    val fixture = Seq(
      ev(1, "2024-01-01 08:00:00", 1, "click", 10.0),
      ev(2, "2024-01-01 09:00:00", 1, "purchase", 20.0),
      ev(3, "2024-01-02 08:00:00", 1, "click", 40.0),
      ev(4, "2024-01-02 09:00:00", 1, "purchase", 10.0),
      // 'error' appears on day 2 only: contributes from zero
      ev(5, "2024-01-02 10:00:00", 1, "error", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.kpiContributionFrame(fixture).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.keySet === Set("click", "purchase", "error"))
    got.values.foreach { r =>
      assert(r.getAs[java.sql.Date]("day").toString === "2024-01-02")
      assert(r.getAs[Double]("day_delta") === 25.0)
    }
    assert(got("click").getAs[Double]("contribution") === 30.0)
    assert(got("purchase").getAs[Double]("contribution") === -10.0)
    assert(got("error").getAs[Double]("contribution") === 5.0)
    assert(got("error").getAs[Double]("prev_value") === 0.0)
    assert(got("click").getAs[Double]("share_of_delta") === 30.0 / 25.0)
    assert(got("purchase").getAs[Double]("share_of_delta") === -10.0 / 25.0)
    // additivity: contributions reconstruct the delta exactly
    assert(got.values.map(_.getAs[Double]("contribution")).sum === 25.0)
    assert(got("click").getAs[Long]("rank_in_day") === 1L)
    assert(got("purchase").getAs[Long]("rank_in_day") === 2L)
    assert(got("error").getAs[Long]("rank_in_day") === 3L)
  }

  test("valueWinsorizeFrame: exact nearest-rank cuts; a 100x outlier moves the raw mean, never the winsorized one") {
    import spark.implicits._
    // 101 values 0..100 -> (n-1)*0.01 = 1 -> p01 = value at rank 2 = 1.0;
    // (n-1)*0.99 = 99 -> p99 = value at rank 100 = 99.0
    def build(top: Double) = ((0 to 99).map(_.toDouble) :+ top)
      .zipWithIndex.map { case (v, i) =>
        ev(i + 1L, "2024-01-01 10:00:00", 1L, "click", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = EventQueries.valueWinsorizeFrame(build(100.0)).head
    assert(a.getAs[Long]("n") === 101L)
    assert(a.getAs[Double]("p_lo") === 1.0)
    assert(a.getAs[Double]("p_hi") === 99.0)
    assert(a.getAs[Long]("n_clamped_lo") === 1L) // the 0
    assert(a.getAs[Long]("n_clamped_hi") === 1L) // the 100
    // winsorized sum: 1 + (1..99 sum) + 99 = 5050 - 0 - 100 + 1 + 99
    assert(a.getAs[Double]("mean_winsorized") === 5050.0 / 101.0)
    assert(a.getAs[Double]("mean_raw") === 5050.0 / 101.0)
    // blow the outlier up 100x: cut points and the winsorized mean are
    // UNCHANGED (the robustness the operator exists for); raw mean moves
    val b = EventQueries.valueWinsorizeFrame(build(10000.0)).head
    assert(b.getAs[Double]("p_lo") === 1.0)
    assert(b.getAs[Double]("p_hi") === 99.0)
    assert(b.getAs[Double]("mean_winsorized")
      === a.getAs[Double]("mean_winsorized"))
    assert(b.getAs[Double]("mean_raw") > a.getAs[Double]("mean_raw") + 90)
    assert(b.getAs[Double]("mean_shift") > 90)
  }

  test("multitouchFrame: two-touch purchase splits 50/50 — no middle pool, value conserved") {
    import spark.implicits._
    // n = 2 has no middles to absorb the 20% pool; a naive 40/40 would
    // LEAK 20% of the value, so the model credits 50/50 (value
    // conservation holds for every n, which the totals column makes
    // visible to the consumer)
    val fixture = Seq(
      ev(1, "2024-01-01 09:50:00", 1, "view", 0),
      ev(2, "2024-01-01 09:55:00", 1, "view", 0),
      ev(3, "2024-01-01 10:00:00", 1, "purchase", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventQueries.multitouchFrame(fixture)
      .collect().map(r => (r.getLong(0), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7))).toSeq
    assert(got === Seq((1L, 5.0, 5.0, 0.0, 10.0)))
  }
}
