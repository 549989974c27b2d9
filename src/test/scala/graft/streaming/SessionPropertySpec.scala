package graft.streaming

import java.sql.Timestamp
import org.scalacheck.Gen
import graft.SparkSpec

/** Property pin of the 6h-gap session semantics against an INDEPENDENT
  * plain-Scala sessionizer — the shared-transform discipline: the engine
  * (session_window), the DuckDB oracle (gaps-and-islands), and
  * TwsSessions all express the same rule, so only a third, trivially
  * auditable implementation catches a wrong RULE that is consistent
  * across them (the round-17 boundary experiment — session_window merges
  * at exactly last + gap where the oracle previously said close — is
  * exactly this bug class). Random minute-resolution event sets produce
  * sub-gap extensions, super-gap closes, same-timestamp ties, AND
  * planted exact-360-minute gaps, so the INCLUSIVE merge boundary is
  * exercised, not just sampled.
  */
class SessionPropertySpec extends SparkSpec {

  private val GapUs = TwsSessions.GapUs

  private def tsUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The reference: inclusive boundary — ts <= last + gap EXTENDS. */
  private def ref(evs: Seq[(Long, Long, Double)]) // (user, us, value)
      : Set[(Long, Long, Long, Long, Double)] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map(e => (e._2, e._3)).sortBy(_._1)
      val out = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Long, Double)]
      var start = 0L; var last = 0L; var n = 0L; var sq = 0L
      def close(): Unit =
        if (n > 0) out += ((u, start, last + GapUs, n, sq / 1e4))
      sorted.foreach { case (us, v) =>
        val q = math.floor(v * 1e4 + 0.5).toLong
        if (n == 0) { start = us; last = us; n = 1; sq = q }
        else if (us > last + GapUs) {
          close(); start = us; last = us; n = 1; sq = q
        } else { last = math.max(last, us); n += 1; sq += q }
      }
      close()
      out
    }.toSet

  test("userSessions == independent sessionizer on random sets incl. exact 6h boundaries") {
    val spark0 = spark
    import spark0.implicits._
    val evGen = for {
      user <- Gen.choose(1L, 6L)
      minute <- Gen.choose(0, 5 * 24 * 60)
      value <- Gen.choose(0, 10000).map(_ / 100.0)
    } yield (user, minute, value)
    val cases = Gen.listOfN(250, evGen)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))
      .getOrElse(sys.error("gen failed"))
    // planted boundary chains: user 9's second event is EXACTLY 6h after
    // the first (inclusive merge) and the third 361 min later (strictly
    // past -> new session); user 10 chains two exact boundaries into ONE
    // session of three
    val planted = Seq((9L, 0, 1.0), (9L, 360, 2.0), (9L, 721, 3.0),
      (10L, 100, 0.5), (10L, 460, 0.5), (10L, 820, 0.5))
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val all = (cases ++ planted).zipWithIndex.map { case ((u, m, v), i) =>
      (i.toLong, new Timestamp(base + m * 60000L), u, "view", v, "{}")
    }
    val df = all
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventStreams.userSessions(df).collect().map(r =>
      (r.getLong(0), tsUs(r.getTimestamp(1)), tsUs(r.getTimestamp(2)),
        r.getLong(3), r.getDouble(4))).toSet
    val want = ref(all.map(e => (e._3, tsUs(e._2), e._5)))
    assert(got === want,
      s"session_window diverged from the reference sessionizer")
    assert(got.count(_._1 == 9L) === 2, "boundary chain for user 9 wrong")
    assert(got.count(_._1 == 10L) === 1, "boundary chain for user 10 wrong")
  }
}
