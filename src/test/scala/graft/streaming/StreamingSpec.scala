package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
  event_type: String, value: Double, props: String)

case class LRow(cell: Long, x: Long, pk: Long)

/** Structured Streaming runs of the shared event transforms
  * ([[EventStreams]]): the SAME logical plan that the batch queries verify
  * against DuckDB, driven here through MemoryStream + watermarks, asserting
  * batch/stream parity on the final result.
  */
class StreamingSpec extends SparkSpec {

  private def events: Seq[Ev] = {
    def t(min: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:$s%02d")
    Seq(
      Ev(1, t(1), 10, "click", 1.5, """{"k": 1}"""),
      Ev(2, t(4), 10, "click", 2.5, """{"k": 2}"""),
      Ev(3, t(11), 11, "view", 3.0, """{"k": 3}"""),
      Ev(4, t(12), 10, "click", 0.5, """{"k": 4}"""),
      Ev(5, t(25), 11, "view", 1.0, """{"k": 5}"""),
      Ev(5, t(25), 11, "view", 1.0, """{"k": 5}""") // duplicate event_id
    )
  }

  test("LayoutStreams.cellStats: streamed skipping index == batch across a mid-stream split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val cellShift =
      1L << (2 * graft.layout.LayoutQueries.DimBits -
        graft.layout.LayoutQueries.FilePrefixBits)
    val rows = graft.layout.LayoutQueries.gridRows(spark, sf)
      .withColumn("cell", expr(s"z div $cellShift"))
      .select("cell", "x", "pk").as[LRow].collect().toSeq
    assert(rows.length > 100)
    // split mid-stream WITHOUT cell alignment: most cells span both
    // batches, so the parity below proves the min/max/count merge, not
    // just per-batch recomputation
    val (a, b) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[LRow]
    stream.addData(a: _*)
    val q = LayoutStreams.cellStats(stream.toDF())
      .writeStream.format("memory").queryName("cellstats_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    stream.addData(b: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cellstats_out")
      .orderBy("cell").collect().map(_.toSeq).toSeq
    val batch = LayoutStreams.cellStats(rows.toDF())
      .orderBy("cell").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the maintained index is the one the batch layout query evaluates:
    // state is one row per cell, bounded by the file-slot space
    assert(streamed.length <=
      (1 << graft.layout.LayoutQueries.FilePrefixBits))
  }

  test("SketchStreams.kmvDistinct: streamed k-min state == batch sketch across a split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val k = graft.relational.RelationalQueries.KmvK
    val rows = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("grp"),
        graft.text.TextFns.hash60(col("o_custkey").cast("string")).as("h"))
      .as[(String, Long)].collect().toSeq
    assert(rows.length > 1000)
    val (a, b) = rows.splitAt(rows.length / 2) // unaligned: groups span both
    val stream = MemoryStream[(String, Long)]
    stream.addData(a: _*)
    val q = SketchStreams.kmvDistinct(
      stream.toDS().toDF("grp", "h"), k)
      .writeStream.format("memory").queryName("kmv_stream_out")
      .outputMode("update").start()
    q.processAllAvailable()
    stream.addData(b: _*)
    q.processAllAvailable()
    q.stop()
    // update-mode memory sink appends per-batch emissions in order: the
    // final state per group is its LAST row
    val finalRows = spark.table("kmv_stream_out").collect()
      .foldLeft(Map.empty[String, org.apache.spark.sql.Row]) {
        (m, r) => m + (r.getAs[String]("grp") -> r)
      }
    // independent plain-Scala reference: exact k smallest distinct hashes
    val expected = rows.groupBy(_._1).map { case (g, gs) =>
      val mins = gs.map(_._2).distinct.sorted.take(k)
      val est =
        if (mins.length >= k) (k - 1).toDouble / (mins(k - 1) / 1152921504606846976.0)
        else mins.length.toDouble
      g -> (mins.length.toLong, est)
    }
    assert(finalRows.keySet === expected.keySet)
    expected.foreach { case (g, (nKept, est)) =>
      val r = finalRows(g)
      assert(r.getAs[Long]("n_kept") === nKept, g)
      assert(r.getAs[Double]("kmv_estimate") === est, g)
    }
    // and the served estimate matches the BATCH query's, bit for bit
    val batch = graft.relational.RelationalQueries.kmvDistinct
      .frame(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        r.getAs[Double]("kmv_estimate")).toMap
    batch.foreach { case (g, est) =>
      assert(finalRows(g).getAs[Double]("kmv_estimate") === est, g)
    }
  }

  test("SketchStreams.bottomkQuantiles: streamed k-min sample == batch sketch estimates across a split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val k = graft.relational.RelationalQueries.QsK
    val rows = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("grp"),
        col("o_orderkey").as("ok"),
        graft.text.TextFns.hash60(col("o_orderkey").cast("string")).as("h"),
        col("o_totalprice").as("v"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows.length > 1000)
    val (a, b) = rows.splitAt(rows.length / 3) // unaligned: groups span both
    val stream = MemoryStream[(String, Long, Long, Double)]
    stream.addData(a: _*)
    val q = SketchStreams.bottomkQuantiles(
      stream.toDS().toDF("grp", "ok", "h", "v"), k)
      .writeStream.format("memory").queryName("bkq_stream_out")
      .outputMode("update").start()
    q.processAllAvailable()
    stream.addData(b: _*)
    q.processAllAvailable()
    q.stop()
    val finalRows = spark.table("bkq_stream_out").collect()
      .foldLeft(Map.empty[String, org.apache.spark.sql.Row]) {
        (m, r) => m + (r.getAs[String]("grp") -> r)
      }
    // the served estimates match the BATCH sketch query's, bit for bit
    val batch = graft.relational.RelationalQueries.bottomkQuantiles
      .frame(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    assert(finalRows.keySet === batch.keySet)
    batch.foreach { case (g, br) =>
      val sr = finalRows(g)
      assert(sr.getAs[Long]("m") === br.getAs[Long]("m"), g)
      Seq("est_p50", "est_p90", "est_p99").foreach { c =>
        assert(sr.getAs[Double](c) === br.getAs[Double](c), s"$g.$c")
      }
      // and the batch-side attestations all held
      Seq("ok_p50", "ok_p90", "ok_p99").foreach { c =>
        assert(br.getAs[Boolean](c), s"$g.$c")
      }
    }
  }

  test("SketchStreams.mgHeavyHitters: k-slot state identical under any micro-batch split; bands hold at the final emission") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    // planted skew per group: 'hot' every 3rd arrival among singleton
    // cold tokens — universe >> k, so decrements fire mid-stream
    val seqs: Map[String, Seq[String]] = Map(
      "g1" -> (1 to 900).map(i => if (i % 3 == 0) "hot" else s"c$i"),
      "g2" -> (1 to 600).map(i => if (i % 4 == 0) "hh" else s"d$i"))
    val arrivals: Seq[(String, String)] = seqs.toSeq.sortBy(_._1)
      .flatMap { case (g, ts) => ts.map(g -> _) }
    def runSplit(cuts: Seq[Int], name: String)
        : Map[String, org.apache.spark.sql.Row] = {
      val stream = MemoryStream[(String, String)]
      val q = SketchStreams.mgHeavyHitters(
        stream.toDS().toDF("grp", "token"), k)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      val bounds = (0 +: cuts) :+ arrivals.length
      bounds.sliding(2).foreach { case Seq(lo, hi) =>
        if (hi > lo) {
          stream.addData(arrivals.slice(lo, hi): _*)
          q.processAllAvailable()
        }
      }
      q.stop()
      // update-mode memory sink appends per-batch emissions in order:
      // the final state per group is its LAST row
      spark.table(name).collect()
        .foldLeft(Map.empty[String, org.apache.spark.sql.Row]) {
          (m, r) => m + (r.getAs[String]("grp") -> r)
        }
    }
    val one = runSplit(Seq.empty, "mg_stream_one")
    val three = runSplit(Seq(400, 1100), "mg_stream_three")
    assert(one.keySet === Set("g1", "g2"))
    // SEQUENTIAL-FOLD split invariance: same arrival sequence, any batch
    // boundaries -> bit-identical state (n, err, slots, counters)
    Seq("g1", "g2").foreach { g =>
      assert(one(g).getAs[Long]("n") === three(g).getAs[Long]("n"), g)
      assert(one(g).getAs[Long]("err") === three(g).getAs[Long]("err"), g)
      assert(one(g).getAs[scala.collection.Seq[String]]("tokens")
        === three(g).getAs[scala.collection.Seq[String]]("tokens"), g)
      assert(one(g).getAs[scala.collection.Seq[Long]]("cnts")
        === three(g).getAs[scala.collection.Seq[Long]]("cnts"), g)
    }
    // the MG contract at the final emission, per group
    seqs.foreach { case (g, ts) =>
      val exact = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = ts.size.toLong
      val r = one(g)
      assert(r.getAs[Long]("n") === n, g)
      val err = r.getAs[Long]("err")
      assert(err > 0L, s"$g expected evictions")
      assert(err * (k + 1) <= n, s"$g err bound")
      val slots = r.getAs[scala.collection.Seq[String]]("tokens")
        .zip(r.getAs[scala.collection.Seq[Long]]("cnts")).toMap
      assert(slots.size <= k, g)
      exact.filter { case (_, f) => f * (k + 1) > n }.keys.foreach { t =>
        assert(slots.contains(t), s"$g lost guaranteed $t") }
      slots.foreach { case (t, c) =>
        assert(c <= exact(t) && c >= exact(t) - err, s"$g band of $t") }
    }
  }

  test("tumblingCounts: streaming result equals batch result on same input") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = EventStreams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("tumbling_out")
      .orderBy("wstart", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventStreams.tumblingCounts(events.toDF())
      .orderBy("wstart", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("slidingCounts: streaming equals batch; every event in 3 windows") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = EventStreams.slidingCounts(stream.toDF())
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sliding_out")
      .orderBy("wstart", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventStreams.slidingCounts(events.toDF())
      .orderBy("wstart", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    // duration/hop = 3: total window-membership count is 3x the events
    val totalN = spark.table("sliding_out")
      .agg(sum("n")).collect()(0).getLong(0)
    assert(totalN === events.length * 3L)
  }

  test("sloBurnHourly + readout: parity with the batch transform across a mid-hour micro-batch split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t(h: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
    val batch1 = Seq(
      Ev(1, t(0, 5), 1, "click", 1.0, "{}"),
      Ev(2, t(0, 10), 2, "error", 1.0, "{}"),
      Ev(3, t(1, 0), 1, "view", 1.0, "{}"),
      Ev(4, t(1, 20), 3, "error", 1.0, "{}"))
    val batch2 = Seq(
      Ev(5, t(1, 40), 2, "error", 1.0, "{}"), // hour 1 spans both batches
      Ev(6, t(1, 55), 1, "click", 1.0, "{}"),
      Ev(7, t(2, 10), 4, "error", 1.0, "{}"),
      Ev(8, t(2, 30), 1, "error", 1.0, "{}"))

    val stream = MemoryStream[Ev]
    val q = EventStreams.sloBurnHourly(stream.toDF())
      .writeStream.format("memory").queryName("slo_out")
      .outputMode("complete").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = graft.events.EventQueries
      .sloBurnReadout(spark.table("slo_out"))
      .orderBy("hour").collect().map(_.toSeq).toSeq
    val batchRes = graft.events.EventQueries.sloBurnReadout(
      (batch1 ++ batch2).toDF()
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_errors")))
      .orderBy("hour").collect().map(_.toSeq).toSeq
    assert(streamed === batchRes)
    assert(streamed.size === 3)
    // hour 1 merged across the split: 4 events / 2 errors, one error per
    // micro-batch — the commutative-merge property under test
    val h1 = streamed(1)
    assert(h1(1) === 4L && h1(2) === 2L)
    // burn/page semantics survived the stream: hour 2 is 2/2 errors ->
    // share 1.0, burn 20x, paging
    val h2 = streamed(2)
    assert(h2(4) === 20.0 && h2(5) === true)
  }

  test("gapfillSlots + readout: parity with the batch transform across a mid-slot micro-batch split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t(h: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
    val batch1 = Seq(
      Ev(1, t(0, 1), 1, "click", 2.0, "{}"),
      Ev(2, t(0, 5), 2, "click", 4.0, "{}"), // slot 00:00 spans the split
      Ev(3, t(0, 2), 1, "view", 1.0, "{}"))
    val batch2 = Seq(
      Ev(4, t(0, 12), 3, "click", 6.0, "{}"), // same 00:00 slot, 2nd batch
      Ev(5, t(1, 3), 1, "click", 8.0, "{}"), // 3 empty click slots between
      Ev(6, t(0, 50), 2, "view", 5.0, "{}"))

    val stream = MemoryStream[Ev]
    val q = EventStreams.gapfillSlots(stream.toDF())
      .writeStream.format("memory").queryName("gapfill_out")
      .outputMode("complete").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = graft.events.EventQueries
      .gapfillReadout(spark.table("gapfill_out"))
      .collect().map(_.toSeq).toSeq
    val batchRes = graft.events.EventQueries
      .gapfillReadout(EventStreams.gapfillSlots((batch1 ++ batch2).toDF()))
      .collect().map(_.toSeq).toSeq
    assert(streamed === batchRes)
    // the split slot merged: 00:00 click = 3 events summing 2+4+6
    val clicks = streamed.filter(_.head == "click")
    assert(clicks.head(2) === 3L)
    // forward fill bridged the empty click slots with the 00:00 mean 4.0
    val gaps = clicks.filter(r => r(4) == true)
    assert(gaps.size === 3 && gaps.forall(_(3) == 4.0))
  }

  test("anomaly readout over streamed tumbling slots equals the batch query tail") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // one spiky 10-min slot per type; slot 20 split across micro-batches
    val batch1 = (1 to 4).map(i => Ev(i, t(i), i, "click", 1.0, "{}")) ++
      Seq(Ev(10, t(11), 1, "click", 1.0, "{}"), Ev(11, t(22), 2, "click", 1.0, "{}"))
    val batch2 = (20 to 26).map(i => Ev(i, t(23), i, "click", 1.0, "{}")) ++
      Seq(Ev(30, t(35), 3, "click", 1.0, "{}"))

    val stream = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("complete").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = graft.events.EventQueries
      .anomalyReadout(spark.table("anom_out"))
      .collect().map(_.toSeq).toSeq
    val batchRes = graft.events.EventQueries
      .anomalyReadout(EventStreams.tumblingCounts((batch1 ++ batch2).toDF()))
      .collect().map(_.toSeq).toSeq
    assert(streamed === batchRes)
    assert(streamed.nonEmpty)
    // the split slot (00:20, 8 events across both batches) is the top
    // anomaly; its count proves the cross-batch merge
    val top = streamed.head
    assert(top(1) === 1 && top(3) === 8L)
  }

  test("cusum readout over the streamed hourly sink equals the batch detector") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 2 is split across micro-batches; hour 1 is all-error so the
    // rate series genuinely varies
    val batch1 = Seq(
      Ev(1, t(0, 5), 1, "view", 0, "{}"), Ev(2, t(0, 40), 2, "view", 0, "{}"),
      Ev(3, t(1, 10), 3, "error", 0, "{}"),
      Ev(4, t(2, 5), 4, "view", 0, "{}"))
    val batch2 = Seq(
      Ev(5, t(2, 50), 5, "error", 0, "{}"),
      Ev(6, t(3, 30), 6, "view", 0, "{}"), Ev(7, t(4, 20), 7, "error", 0, "{}"))
    val stream = MemoryStream[Ev]
    val q = EventStreams.sloBurnHourly(stream.toDF())
      .writeStream.format("memory").queryName("cusum_src")
      .outputMode("complete").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // the readout consumes the model-sized sink, never raw events
    val hourly = spark.table("cusum_src")
      .select(col("hour"), col("n_events").as("n"), col("n_errors").as("ne"))
    val streamed = graft.events.EventQueries.cusumReadout(hourly)
      .collect().map(_.toSeq).toSeq
    val batchRes = graft.events.EventQueries
      .cusumFrame((batch1 ++ batch2).toDF())
      .collect().map(_.toSeq).toSeq
    assert(streamed === batchRes)
    assert(streamed.length === 5) // hours 0..4, dense
    // the split hour merged across batches: rate 1/2, visible in row 2
    assert(streamed(2)(1) === 0.5)
    // the ACF readout consumes the SAME sink (n_events alone)
    val acfStreamed = graft.events.EventQueries
      .acfReadout(spark.table("cusum_src")
        .select(col("hour"), col("n_events").as("hn")))
      .collect().map(_.toSeq).toSeq
    val acfBatch = graft.events.EventQueries
      .autocorrFrame((batch1 ++ batch2).toDF())
      .collect().map(_.toSeq).toSeq
    assert(acfStreamed === acfBatch)
    assert(acfStreamed.nonEmpty)
    // the STL decomposition consumes the SAME sink — trend/seasonal/
    // remainder and the deseasonalized detector all serve continuously
    val stlStreamed = graft.events.EventQueries
      .stlReadout(spark.table("cusum_src")
        .select(col("hour"), col("n_events").as("hn")))
      .collect().map(_.toSeq).toSeq
    val stlBatch = graft.events.EventQueries
      .stlFrame((batch1 ++ batch2).toDF())
      .collect().map(_.toSeq).toSeq
    assert(stlStreamed === stlBatch)
    assert(stlStreamed.length === 5)
    // the EWMA chart consumes the SAME sink (cusumReadout's signature)
    val ewmaStreamed = graft.events.EventQueries
      .ewmaReadout(spark.table("cusum_src")
        .select(col("hour"), col("n_events").as("n"),
          col("n_errors").as("ne")))
      .collect().map(_.toSeq).toSeq
    val ewmaBatch = graft.events.EventQueries
      .ewmaFrame((batch1 ++ batch2).toDF())
      .collect().map(_.toSeq).toSeq
    assert(ewmaStreamed === ewmaBatch)
    assert(ewmaStreamed.length === 5)
  }

  test("funnelStages: keyed-state funnel == batch conditional-min derivation across a mid-journey split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // user 1: full journey SPLIT across batches (view b1; click+purchase
    // b2). user 2: click before any view (must not count) then a valid
    // view. user 3: view+click in b1, no purchase. user 4: purchase
    // before click (must not count).
    val batch1 = Seq(
      Ev(1, t(1), 1, "view", 1.0, "{}"),
      Ev(2, t(2), 2, "click", 1.0, "{}"),
      Ev(3, t(3), 3, "view", 1.0, "{}"),
      Ev(4, t(4), 3, "click", 1.0, "{}"),
      Ev(5, t(5), 4, "view", 1.0, "{}"))
    val batch2 = Seq(
      Ev(6, t(6), 1, "click", 1.0, "{}"),
      Ev(7, t(9), 1, "purchase", 1.0, "{}"),
      Ev(8, t(7), 2, "view", 1.0, "{}"),
      Ev(9, t(8), 4, "purchase", 1.0, "{}"))

    val stream = MemoryStream[Ev]
    val q = EventStreams.funnelStages(stream.toDF())
      .writeStream.format("memory").queryName("funnel_stages")
      .outputMode("append").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamedPerUser = graft.events.EventQueries
      .funnelPerUserFromStages(spark.table("funnel_stages"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val batchPerUser = graft.events.EventQueries
      .funnelPerUser((batch1 ++ batch2).toDF())
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(streamedPerUser === batchPerUser)
    assert(streamedPerUser.size === 4) // every user has a view
    // user 1's cross-batch journey completed; users 2/4 rejected the
    // out-of-order stages exactly like the batch rule
    val rollupS = graft.events.EventQueries.funnelRollup(
      graft.events.EventQueries
        .funnelPerUserFromStages(spark.table("funnel_stages")))
      .collect()(0)
    assert(rollupS.getAs[Long]("n_view") === 4L)
    assert(rollupS.getAs[Long]("n_click") === 2L) // users 1, 3
    assert(rollupS.getAs[Long]("n_purchase") === 1L) // user 1 only
    assert(rollupS.getAs[Double]("avg_lag_s") === 480.0) // 00:01 -> 00:09
    val rollupB = graft.events.EventQueries.funnelRollup(
      graft.events.EventQueries.funnelPerUser((batch1 ++ batch2).toDF()))
      .collect()(0)
    assert(rollupS.toSeq === rollupB.toSeq)
  }

  // The wired production eviction path: with an idle timeout the funnel's
  // keyed state is DROPPED for idle users — proven behaviorally: after the
  // timeout fires, a returning user's view RE-EMITS (fresh state), where
  // retained state would have suppressed it. processAllAvailable can't be
  // used here (ProcessingTimeTimeout schedules timeout-evaluation batches
  // continuously under the unthrottled test trigger), so the sink is
  // polled with a deadline.
  test("funnelStages: wired idle timeout evicts keyed state") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    def rowsNow(): Long =
      try spark.table("funnel_evict").count() catch { case _: Exception => 0L }
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (rowsNow() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(rowsNow() >= n, s"sink never reached $n rows")
    }
    val stream = MemoryStream[Ev]
    val q = EventStreams.funnelStages(stream.toDF(), Some("1 millisecond"))
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("append").start()
    try {
      stream.addData(Ev(1, t(1), 7, "view", 1.0, "{}"))
      awaitRows(1)
      // eviction needs a timeout-evaluation batch AFTER the 1ms expiry —
      // Spark only guarantees 'eventually after the duration', so don't
      // race a fixed sleep against it: wait until the query's batchId has
      // advanced >= 2 beyond the data batch (the continuous empty batches
      // under the unthrottled trigger make this fast; the deadline is the
      // safety net on a stalled host)
      val deadline = System.currentTimeMillis() + 60000
      // the sink row can become visible BEFORE the first progress event is
      // posted, so awaitRows(1) does not guarantee lastProgress != null yet
      while (q.lastProgress == null && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(q.lastProgress != null, "no progress posted within the deadline")
      val bid0 = q.lastProgress.batchId
      while ((q.lastProgress == null || q.lastProgress.batchId < bid0 + 2)
          && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(q.lastProgress.batchId >= bid0 + 2,
        "no timeout-evaluation batch ran within the deadline")
      stream.addData(Ev(2, t(2), 7, "view", 1.0, "{}"))
      // a SECOND view row for the same user proves the state was evicted
      // (retained state ignores repeat views — the batch-parity test pins
      // that); this is the documented re-emission trade of the eviction
      awaitRows(2)
    } finally q.stop()
    val stages = spark.table("funnel_evict")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("stage")))
    assert(stages.count(_ == ((7L, "view"))) === 2)
  }

  test("VecStreams.ingestCodes: arriving vectors coded against the persisted model == batch rebuild") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    // deploy the frozen model (trains on the old split, persists tables)
    graft.sim.SimQueries.ivfpqIncremental.frame(spark, sf).collect()
    // stream a handful of corpus vectors in two micro-batches
    val rows = graft.Tables.embeddings(spark, sf)
      .orderBy("vec_id").limit(7)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toSeq))
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = VecStreams.ingestCodes(stream.toDF().toDF("vec_id", "v"))
      .writeStream.format("memory").queryName("ingest_codes")
      .outputMode("append").start()
    stream.addData(rows.take(3).toSeq: _*)
    q.processAllAvailable()
    stream.addData(rows.drop(3).toSeq: _*)
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("m"),
        r.getAs[Int]("code"), r.getAs[Int]("cell"))
    val streamed = spark.table("ingest_codes").collect().map(key).toSet
    val ids = rows.map(_._1).toSet
    val rebuilt = graft.sim.SimQueries.ivfpqRebuildCodes(spark, sf)
      .collect().map(key).filter(k => ids(k._1)).toSet
    assert(streamed === rebuilt)
    assert(streamed.size === rows.length * SimFnsPqM)
  }

  private val SimFnsPqM = graft.sim.SimFns.PqM

  test("dedupedEvents: duplicate event_id within watermark is dropped") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = EventStreams.dedupedEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup_smoke_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_smoke_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("valueAlerts: flatMapGroupsWithState emits threshold crossings") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Ev]
    // user 10 accumulates 1.5+2.5+0.5 = 4.5 -> no alert at threshold 3.0?
    // thresholds: use 3.0 so user 10 crosses once (4.5/3=1) and user 11
    // crosses once (3.0+1.0+1.0=5.0 -> milestone 1)
    stream.addData(events: _*)
    val q = EventStreams.valueAlerts(stream.toDF(), threshold = 3.0)
      .writeStream.format("memory").queryName("alerts_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("alerts_out")
      .orderBy("user_id", "milestone").collect()
    assert(rows.nonEmpty)
    // each alert's total must be at or past its milestone boundary
    rows.foreach { r =>
      assert(r.getAs[Double]("total_at_alert") >= 3.0 * r.getAs[Long]("milestone"))
    }
    // user 10's first crossing: 1.5+2.5 = 4.0 >= 3.0 at milestone 1
    val u10 = rows.filter(_.getAs[Long]("user_id") == 10L)
    assert(u10.head.getAs[Long]("milestone") === 1L)
  }

  test("valueAlerts: one event jumping several multiples emits every milestone") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(Ev(1, Timestamp.valueOf("2024-01-01 00:00:00"), 7,
      "purchase", 250.0, "{}"))
    val q = EventStreams.valueAlerts(stream.toDF(), threshold = 100.0)
      .writeStream.format("memory").queryName("alerts_jump")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val ms = spark.table("alerts_jump").collect()
      .map(_.getAs[Long]("milestone")).sorted
    assert(ms.toSeq === Seq(1L, 2L)) // 250/100 crosses milestones 1 AND 2
  }

  test("stream-stream interval join: clicks enriched by purchases within 10m") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(
      Ev(1, t(1), 10, "click", 0, "{}"),
      Ev(2, t(30), 10, "click", 0, "{}"), // no purchase within 10m
      Ev(3, t(5), 11, "click", 0, "{}"))
    purchases.addData(
      Ev(90, t(8), 10, "purchase", 42.0, "{}"), // 7m after click 1
      Ev(91, t(50), 10, "purchase", 9.0, "{}"), // too late for click 2
      Ev(92, t(6), 11, "purchase", 7.0, "{}")) // 1m after click 3

    val c = clicks.toDF().withWatermark("ts", "1 hour")
      .selectExpr("event_id AS click_id", "user_id AS cu", "ts AS cts")
    val p = purchases.toDF().withWatermark("ts", "1 hour")
      .selectExpr("user_id AS pu", "ts AS pts", "value AS amount")
    val joined = c.join(p,
      expr("cu = pu AND pts BETWEEN cts AND cts + INTERVAL 10 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssjoin_out")
      .select("click_id", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows === Set((1L, 42.0), (3L, 7.0)))
  }

  test("attribution candidates: stream-stream interval join equals batch bucketed mine") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) =
      Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // the fixture exercises every boundary of the bucketed mine:
    // same-bucket hit, adjacent-bucket hit, the strict lag-=-window
    // exclusion, a view after the click, lag 0, and a viewless user
    val views = Seq(
      Ev(90, t(59), 10, "view", 0, "{}"), // 1m before click 1, bucket+1 copy
      Ev(91, t(31), 10, "view", 0, "{}"), // 29m before: window edge
      Ev(92, t(30), 10, "view", 0, "{}"), // exactly 30m: excluded (strict >)
      Ev(93, t(61), 10, "view", 0, "{}"), // after the click: excluded
      Ev(94, t(44), 11, "view", 0, "{}"), // 1m before click 2, same bucket
      Ev(95, t(20), 13, "view", 0, "{}")) // same instant as click 3: lag 0
    val clicks = Seq(
      Ev(1, t(60), 10, "click", 0, "{}"),
      Ev(2, t(45), 11, "click", 0, "{}"),
      Ev(3, t(20), 13, "click", 0, "{}"),
      Ev(4, t(90), 12, "click", 0, "{}")) // user with no views at all
    val batch = graft.events.EventQueries
      .attributionCandidates((views ++ clicks).toDF())
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 90L), (1L, 91L), (2L, 94L), (3L, 95L)))

    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    vs.addData(views: _*)
    cs.addData(clicks: _*)
    // the production transform's PURE interval predicate — proving the
    // batch side's bucket pruning admits exactly the watermark-join's
    // candidate set
    val joined = EventStreams.attributionJoin(vs.toDF(), cs.toDF())
    val q = joined.writeStream.format("memory").queryName("attr_cand_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_cand_out").select("click_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }

  test("attributionJoin left_outer: outer emission at watermark, late-row drop, state eviction") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) =
      Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    val joined = EventStreams.attributionJoin(vs.toDF(), cs.toDF(),
      delay = "1 minute", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    def pairs(): Set[(Long, Option[Long])] =
      spark.table("attr_outer_out").select("click_id", "view_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    def stateRows(): Long =
      Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        .map(_.numRowsTotal).sum
    try {
      // 1. a matched pair joins immediately (no watermark wait)
      vs.addData(Ev(90, t(10), 10, "view", 0, "{}"))
      cs.addData(Ev(1, t(11), 10, "click", 0, "{}"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, Some(90L))))
      // 2. an unattributed click emits NOTHING until the view watermark
      //    passes it — "no match" is not final while an in-window view
      //    could still arrive
      cs.addData(Ev(2, t(40), 10, "click", 0, "{}"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, Some(90L))))
      val peak = stateRows()
      assert(peak > 0, "join state should buffer both sides")
      // 3. advance BOTH watermarks past the click's window (policy: min
      //    of the two); the second nudge batch applies the watermark the
      //    first one computed — only then is click 2's null row final
      vs.addData(Ev(900, t(120), 98, "view", 0, "{}"))
      cs.addData(Ev(901, t(120), 99, "click", 0, "{}"))
      q.processAllAvailable()
      vs.addData(Ev(902, t(121), 98, "view", 0, "{}"))
      cs.addData(Ev(903, t(121), 99, "click", 0, "{}"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, Some(90L)), (2L, None)))
      // 4. a LATE view (below the watermark) that would have matched
      //    click 2 is dropped at the watermark filter — the already-final
      //    outer row is never contradicted
      vs.addData(Ev(91, t(35), 10, "view", 0, "{}"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, Some(90L)), (2L, None)))
      // 5. state eviction: rows outside (watermark delay + join window)
      //    are dropped, so the store holds only the recent nudge rows,
      //    not the whole history — the O(horizon) bound, not O(stream)
      vs.addData(Ev(904, t(125), 98, "view", 0, "{}"))
      cs.addData(Ev(905, t(125), 99, "click", 0, "{}"))
      q.processAllAvailable()
      val after = stateRows()
      // 9 input rows total; the 3 pre-watermark ones (view 90, clicks
      // 1 and 2) must be evicted, leaving only the 6 nudge rows
      assert(after <= 6,
        s"pre-watermark state not evicted: peak=$peak after=$after")
      assert(spark.table("attr_outer_out")
        .filter(col("view_id") === 91L).isEmpty)
    } finally q.stop()
  }

  test("DocStreams: arriving near-dup flagged against static band index, batch parity") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely unrelated corpus text about maritime navigation rules"))
      .toDF("doc_id", "text")
    val index = DocStreams.bandIndex(corpus).localCheckpoint()

    // doc 200 = exact dup of corpus doc 100 (all bands collide);
    // doc 201 = fresh content (no collisions expected)
    val arriving = Seq(
      (200L, "the quick brown fox jumps over the lazy dog again and again"),
      (201L, "entirely novel document content sharing nothing with the corpus"))

    val stream = MemoryStream[(Long, String)]
    stream.addData(arriving: _*)
    val q = DocStreams.dupCandidates(
      stream.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("docdup_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("docdup_out")
      .orderBy("doc_id", "corpus_doc_id", "b")
      .collect().map(_.toSeq).toSeq
    val batch = DocStreams.dupCandidates(
      arriving.toDF("doc_id", "text"), index)
      .orderBy("doc_id", "corpus_doc_id", "b")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    // the exact dup collides on EVERY band; the fresh doc on none
    val flagged = streamed.map(r => (r(0), r(1)))
    assert(flagged.distinct === Seq((200L, 100L)))
    assert(streamed.length ===
      graft.dedup.DedupQueries.MinhashK / graft.dedup.DedupQueries.BandRows)
  }

  test("incremental screen: streamed candidates + the batch verify = the oracle-checked batch output") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.DedupQueries
    import graft.text.TextFns

    // dedup_incremental_screen (oracle-checked) and the DocStreams ingest
    // path are twins: the batch operator splits the corpus by content hash
    // and probes incoming against the existing side's band index; the
    // stream probes ARRIVING docs against the same index. This test closes
    // the loop frame-level: the streamed candidate pairs, pushed through
    // the SAME exact-Jaccard verify, must reproduce the batch operator's
    // output exactly — so the batch oracle transitively checks the
    // streaming path.
    def bucket(text: String): Long =
      Seq(text).toDF("text")
        .select((TextFns.hash60(TextFns.normText(col("text"))) % 100).as("b"))
        .collect()(0).getLong(0)
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val variants = (0 until 64).map(seed => s"$base tail$seed")
    val existing = variants.find(t =>
      bucket(t) < DedupQueries.IncrementalIncomingBucket).get
    val incoming = variants.find(t =>
      bucket(t) >= DedupQueries.IncrementalIncomingBucket).get
    val noiseEx = (1 to 40).map(i => s"z$i").mkString(" ")
    val fresh = (0 until 64).map(s => (1 to 40).map(i => s"q${i}x$s").mkString(" "))
      .find(t => bucket(t) >= DedupQueries.IncrementalIncomingBucket).get
    val texts = Map(1L -> existing, 2L -> noiseEx, 3L -> incoming, 4L -> fresh)
    val docs = texts.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text")

    val batch = DedupQueries.incrementalScreenFrame(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(batch.map(t => (t._1, t._2)).toSeq === Seq((3L, 1L)),
      s"fixture drifted: batch screen found ${batch.toSeq}")

    // streaming path on the SAME split: existing -> static band index,
    // incoming -> arriving stream
    val index = DocStreams.bandIndex(
      Seq((1L, existing), (2L, noiseEx)).toDF("doc_id", "text")).localCheckpoint()
    val stream = MemoryStream[(Long, String)]
    stream.addData(Seq((3L, incoming), (4L, fresh)): _*)
    val q = DocStreams.dupCandidates(
      stream.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("inc_screen_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamedPairs = spark.table("inc_screen_stream")
      .select("doc_id", "corpus_doc_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // recall parity: every batch-verified match surfaced as a candidate
    batch.foreach { case (d, m, _) =>
      assert(streamedPairs.contains((d, m)),
        s"batch match ($d, $m) missing from streamed candidates $streamedPairs")
    }
    // frame-level parity: same verify (exact Jaccard over distinct 2-gram
    // shingles, J >= ClusterJaccard, best match by (J desc, doc)) over the
    // streamed candidates reproduces the batch rows including J values
    def sh2(t: String): Set[String] =
      t.split(" ").sliding(DedupQueries.MinhashShingleN).map(_.mkString(" ")).toSet
    val verified = streamedPairs.toSeq.map { case (d, m) =>
      val (a, b) = (sh2(texts(d)), sh2(texts(m)))
      (d, m, a.intersect(b).size.toDouble / a.union(b).size)
    }.filter(_._3 >= DedupQueries.ClusterJaccard)
      .groupBy(_._1).map { case (_, cands) => cands.minBy(c => (-c._3, c._2)) }
      .toSeq.sortBy(_._1)
    assert(verified === batch.toSeq,
      "streamed-candidates + batch verify diverged from the batch screen")
  }

  test("StreamSinks.toWarehouse: exactly-once delivery, batch parity, replay no-op") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = StreamSinks.toWarehouse(
      EventStreams.tumblingCounts(stream.toDF()), "stream_windows").start()
    q.processAllAvailable()
    q.stop()

    // the warehouse table equals the batch run of the same transform
    val sunk = spark.table("test.stream_windows")
      .orderBy("wstart", "event_type").collect().map(_.toSeq).toSeq
    val batch = EventStreams.tumblingCounts(events.toDF())
      .orderBy("wstart", "event_type").collect().map(_.toSeq).toSeq
    assert(sunk === batch)
    assert(sunk.nonEmpty)

    // replaying an already-committed batch id must be a no-op (the
    // at-least-once redelivery case), and a NEWER id must land
    val committed = StreamSinks.committedBatchId(spark, "stream_windows")
    assert(committed >= 0L)
    val decoy = Seq((Timestamp.valueOf("2024-01-01 00:00:00"), "poison", 99L))
      .toDF("wstart", "event_type", "n")
    StreamSinks.deliverBatch(decoy, committed, "stream_windows")
    assert(spark.table("test.stream_windows")
      .filter(col("event_type") === "poison").count() === 0L,
      "replayed batch id overwrote committed data")
    StreamSinks.deliverBatch(decoy, committed + 1, "stream_windows")
    assert(spark.table("test.stream_windows").count() === 1L,
      "newer batch id failed to replace the table")
    assert(StreamSinks.committedBatchId(spark, "stream_windows") === committed + 1)
  }

  test("StreamSinks.cdcToWarehouse: keyed merge apply with compaction, deletes, stale-batch skip") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the merge overwrites happen inside foreachBatch's cloned session;
    // this OUTER session's cached file listing for the table goes stale
    // after each micro-batch, so a concurrent reader refreshes first —
    // the standard discipline for readers of non-transactional
    // replace-mode tables
    def table = {
      spark.catalog.refreshTable("test.cdc_sink")
      spark.table("test.cdc_sink")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    }
    val stream = MemoryStream[(Long, String, String, Long)]
    val q = StreamSinks.cdcToWarehouse(
      stream.toDS().toDF("id", "tag", "op", "seq"),
      "cdc_sink", Seq("id"), seqCol = Some("seq")).start()
    try {
      // batch 1: inserts, incl. two changes for id 1 — compaction keeps
      // the higher seq
      stream.addData((1L, "a1", "u", 1L), (1L, "a2", "u", 2L),
        (2L, "b", "u", 3L), (3L, "c", "u", 4L))
      q.processAllAvailable()
      assert(table === Seq((1L, "a2"), (2L, "b"), (3L, "c")))
      // batch 2: update, delete, insert, and an upsert-then-delete pair
      // for id 5 — compaction resolves to the delete, which is a no-op
      // on the absent key
      stream.addData((2L, "B", "u", 5L), (3L, "c", "d", 6L),
        (4L, "d", "u", 7L), (5L, "x", "u", 8L), (5L, "x", "d", 9L))
      q.processAllAvailable()
    } finally q.stop()
    val expected = Seq((1L, "a2"), (2L, "B"), (4L, "d"))
    assert(table === expected)
    // a STALE batch id must not touch the table — a delta apply is not
    // prefix-pure like complete-mode replace, so the guard is semantic
    val committed = StreamSinks.committedBatchId(spark, "cdc_sink")
    assert(committed >= 1L)
    val stale = Seq((9L, "z", "u", 99L)).toDF("id", "tag", "op", "seq")
    StreamSinks.deliverCdcBatch(stale, committed, "cdc_sink", Seq("id"),
      Some("seq"))
    assert(table === expected, "stale batch id mutated the table")
    // the NEXT id lands
    StreamSinks.deliverCdcBatch(stale, committed + 1, "cdc_sink", Seq("id"),
      Some("seq"))
    assert(table === expected :+ ((9L, "z")))
  }

  test("srmGuardrail: streamed segment rows equal the batch srm_check; dedup state spans micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val ids0 = (1L to 200L).filter(arm(_) == 0L)
    val ids1 = (1L to 200L).filter(arm(_) == 1L)
    def t(hr: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:00:00")
    var eid = 0L
    def ev(user: Long, typ: String, hr: Int) = {
      eid += 1; Ev(eid, t(hr), user, typ, 1.0, "{}")
    }
    // 'drop' segment dropped one arm (10 vs 1); 'bal' is 3 vs 3; user
    // ids0(0) appears in 'bal' in BOTH micro-batches — the dedup state
    // must keep it counted once across the boundary
    val batch1 = ids0.take(10).map(ev(_, "drop", 1)) ++
      Seq(ev(ids1.head, "drop", 1)) ++
      ids0.take(3).map(ev(_, "bal", 2)) ++ ids1.take(2).map(ev(_, "bal", 2))
    val batch2 = Seq(ev(ids0.head, "bal", 3), ev(ids1(2), "bal", 3))
    val stream = MemoryStream[Ev]
    stream.addData(batch1: _*)
    val q = EventStreams.srmGuardrail(stream.toDF())
      .writeStream.format("memory").queryName("srm_guardrail_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("srm_guardrail_out")
      .orderBy("segment").collect().map(_.toSeq).toSeq
    // the batch twin is the registry query's frame minus its ALL row
    val batch = graft.events.EventQueries.srmCheckFrame(
      (batch1 ++ batch2).toDF())
      .filter(col("segment") =!= "ALL")
      .orderBy("segment").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    val drop = spark.table("srm_guardrail_out")
      .filter(col("segment") === "drop").collect().head
    assert(drop.getAs[Long]("n_a") === 10L)
    assert(drop.getAs[Long]("n_b") === 1L)
    assert(drop.getAs[Boolean]("srm_5pct")) // chi2 = 81/11 ~ 7.36
    val bal = spark.table("srm_guardrail_out")
      .filter(col("segment") === "bal").collect().head
    assert(bal.getAs[Long]("n_users") === 6L) // cross-batch dup counted once
    assert(!bal.getAs[Boolean]("srm_5pct"))
  }

  test("dailyDistinctUsers: streaming sketch equals batch sketch, and the batch exact") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 days, repeated users within a day — the sketch path must count
    // each day's DISTINCT users whatever micro-batch the rows arrive in
    def t(day: Int, hr: Int) = Timestamp.valueOf(f"2024-01-0$day $hr%02d:00:00")
    val evs = Seq(
      Ev(1, t(1, 1), 10, "view", 1.0, "{}"),
      Ev(2, t(1, 2), 10, "click", 1.0, "{}"),
      Ev(3, t(1, 3), 11, "view", 1.0, "{}"),
      Ev(4, t(2, 1), 10, "view", 1.0, "{}"),
      Ev(5, t(2, 2), 12, "view", 1.0, "{}"),
      Ev(6, t(2, 3), 12, "click", 1.0, "{}"),
      Ev(7, t(3, 1), 13, "view", 1.0, "{}"))
    val stream = MemoryStream[Ev]
    // two separate micro-batches splitting day 2 — the per-day sketch
    // must MERGE across them (HLL registers max commutatively)
    stream.addData(evs.take(5): _*)
    val q = EventStreams.dailyDistinctUsers(stream.toDF())
      .writeStream.format("memory").queryName("daily_distinct_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    stream.addData(evs.drop(5): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("daily_distinct_out")
      .orderBy("day").collect().map(_.toSeq).toSeq
    val batch = EventStreams.dailyDistinctUsers(evs.toDF())
      .orderBy("day").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.length === 3)
    // at these cardinalities HLL++ is in its exact (linear counting)
    // regime — the estimates must equal the true per-day distincts
    val exact = evs.toDF().groupBy(window(col("ts"), "1 day"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .select(col("window.start").as("day"), col("exact"))
      .orderBy("day").collect().map(_.getAs[Long]("exact")).toSeq
    assert(streamed.map(_(2)) === exact)
  }

  test("weeklyDistinctUsers: DataSketches sketch merges across micro-batches, equals batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two Monday-aligned weeks; week 1 split MID-WEEK across micro-batches
    // so its sketch state must merge across the boundary
    def t(day: Int, hr: Int) = Timestamp.valueOf(f"2024-01-$day%02d $hr%02d:00:00")
    val evs = Seq(
      Ev(1, t(1, 1), 10, "view", 1.0, "{}"),   // Mon, week of Jan 1
      Ev(2, t(2, 2), 10, "click", 1.0, "{}"),
      Ev(3, t(3, 3), 11, "view", 1.0, "{}"),
      Ev(4, t(6, 1), 12, "view", 1.0, "{}"),   // Sat, same week
      Ev(5, t(8, 2), 10, "view", 1.0, "{}"),   // Mon, week of Jan 8
      Ev(6, t(9, 3), 13, "click", 1.0, "{}"))
    val stream = MemoryStream[Ev]
    stream.addData(evs.take(3): _*)
    val q = EventStreams.weeklyDistinctUsers(stream.toDF())
      .writeStream.format("memory").queryName("weekly_distinct_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    stream.addData(evs.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("weekly_distinct_out")
      .orderBy("week").collect().map(_.toSeq).toSeq
    val batch = EventStreams.weeklyDistinctUsers(evs.toDF())
      .orderBy("week").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.length === 2)
    // Monday alignment: both window starts are Mondays at midnight
    assert(streamed.map(_(0).toString) ===
      Seq("2024-01-01 00:00:00.0", "2024-01-08 00:00:00.0"))
    // at these cardinalities the HLL estimate is exact: 3 and 2 users
    assert(streamed.map(_(2)) === Seq(3L, 2L))
  }

  test("weekly sketch rollup -> warehouse sink: exactly-once across " +
    "micro-batches, replay no-op, table equals batch") {
    // the composition the two halves only proved separately: the
    // DataSketches weekly rollup MERGING across micro-batches
    // (weeklyDistinctUsers) delivered through the idempotent
    // foreachBatch warehouse sink (StreamSinks) — the full streaming
    // dashboard pipeline, end to end
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(day: Int, hr: Int) = Timestamp.valueOf(f"2024-01-$day%02d $hr%02d:00:00")
    val evs = Seq(
      Ev(1, t(1, 1), 10, "view", 1.0, "{}"),
      Ev(2, t(2, 2), 10, "click", 1.0, "{}"),
      Ev(3, t(3, 3), 11, "view", 1.0, "{}"),
      Ev(4, t(6, 1), 12, "view", 1.0, "{}"),
      Ev(5, t(8, 2), 10, "view", 1.0, "{}"),
      Ev(6, t(9, 3), 13, "click", 1.0, "{}"))
    val stream = MemoryStream[Ev]
    // week 1 split MID-WEEK across micro-batches: the sink's final table
    // is only correct if sketch state merged across the batch boundary
    // BEFORE each complete-mode delivery
    stream.addData(evs.take(3): _*)
    val q = StreamSinks.toWarehouse(
      EventStreams.weeklyDistinctUsers(stream.toDF()),
      "stream_weekly_sketch").start()
    q.processAllAvailable()
    stream.addData(evs.drop(3): _*)
    q.processAllAvailable()
    q.stop()

    val sunk = spark.table("test.stream_weekly_sketch")
      .orderBy("week").collect().map(_.toSeq).toSeq
    val batch = EventStreams.weeklyDistinctUsers(evs.toDF())
      .orderBy("week").collect().map(_.toSeq).toSeq
    assert(sunk === batch, "warehouse table diverged from the batch rollup")
    assert(sunk.length === 2)

    // at least two micro-batches committed, and a replay of the LAST
    // committed id must leave the table untouched
    val committed = StreamSinks.committedBatchId(spark, "stream_weekly_sketch")
    assert(committed >= 1L, s"expected >= 2 committed batches, got $committed")
    val decoy = Seq((Timestamp.valueOf("2024-01-01 00:00:00"), 0L, 99L))
      .toDF("week", "n_events", "users_est")
    StreamSinks.deliverBatch(decoy, committed, "stream_weekly_sketch")
    assert(spark.table("test.stream_weekly_sketch")
      .orderBy("week").collect().map(_.toSeq).toSeq === sunk,
      "replayed batch id mutated the committed sketch rollup")

    // a restart re-delivers the same complete-mode content under a FRESH
    // batch id and must land byte-identical — idempotence by content on
    // top of the id guard (complete mode re-emits the full result, which
    // equals the batch frame)
    StreamSinks.deliverBatch(
      EventStreams.weeklyDistinctUsers(evs.toDF()),
      committed + 1, "stream_weekly_sketch")
    assert(spark.table("test.stream_weekly_sketch")
      .orderBy("week").collect().map(_.toSeq).toSeq === sunk,
      "re-delivered rollup diverged from the original")
  }

  test("scd2Closed: streaming keyed state emits the batch query's closed " +
    "versions across a micro-batch split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // user 10: click -> view (change in batch 1) -> view -> error (change
    // whose OPEN version started in batch 1 and closes in batch 2 — the
    // state carry-over case); user 11: one state only (never closes)
    val evs = Seq(
      Ev(1, t(1), 10, "click", 1.0, "{}"),
      Ev(2, t(2), 10, "view", 1.0, "{}"),
      Ev(3, t(3), 11, "view", 1.0, "{}"),
      Ev(4, t(4), 10, "view", 1.0, "{}"),
      Ev(5, t(5), 10, "error", 1.0, "{}"),
      Ev(6, t(6), 11, "view", 1.0, "{}"))
    val stream = MemoryStream[Ev]
    stream.addData(evs.take(3): _*)
    val q = EventStreams.scd2Closed(stream.toDF())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    q.processAllAvailable()
    stream.addData(evs.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scd2_out")
      .orderBy("user_id", "version").collect().map(_.toSeq).toSeq
    val batchClosed = graft.events.EventQueries.scd2Frame(evs.toDF())
      .filter(col("valid_to").isNotNull)
      .select("user_id", "version", "state", "valid_from", "valid_to")
      .orderBy("user_id", "version").collect().map(_.toSeq).toSeq
    assert(streamed === batchClosed,
      "streaming closed versions diverged from the batch derivation")
    // both change rows for user 10 surfaced; user 11's single open
    // version never emits (append-mode SCD2 only ships finished rows)
    assert(streamed.map(_.head) === Seq(10L, 10L))
  }

  test("userSessions: streaming append emits watermark-closed sessions equal to batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = EventStreams.userSessions(stream.toDF())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // sessions close only when the watermark passes session end + gap:
    // push it with far-future sentinel events (user 99) across two
    // batches — the watermark for batch N derives from batch N-1's max
    stream.addData(Ev(90, t("10:00"), 99, "view", 0.0, "{}"))
    q.processAllAvailable()
    stream.addData(Ev(91, t("10:01"), 99, "view", 0.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_out")
      .filter(col("user_id") =!= 99)
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq).toSeq
    val batch = EventStreams.userSessions(events.toDF())
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.length === 2)
    // the sentinel user's own session is still open — append must NOT
    // have emitted it
    assert(spark.table("sessions_out").filter(col("user_id") === 99).count() === 0)
  }

  test("TwsSessions: transformWithState timers close sessions equal to batch; inline and timer paths") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val fixture = Seq(
      Ev(1, t("2024-01-01 00:00:00"), 7, "view", 1.5, "{}"),
      Ev(2, t("2024-01-01 00:10:00"), 7, "click", 2.5, "{}"),
      Ev(3, t("2024-01-01 10:00:00"), 7, "view", 1.0, "{}"), // > 6h gap
      Ev(4, t("2024-01-01 01:00:00"), 8, "view", 4.0, "{}"))
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    val stream = MemoryStream[Ev]
    val q = TwsSessions.userSessionsTws(stream.toDF())
      .writeStream.format("memory").queryName("tws_sessions_out")
      .outputMode("append").start()
    try {
      // mid-session micro-batch splits: user 7's first session spans
      // batches 1-2; batch 3's event closes it INLINE (gap exceeded)
      stream.addData(fixture(0), fixture(3))
      q.processAllAvailable()
      stream.addData(fixture(1))
      q.processAllAvailable()
      stream.addData(fixture(2))
      q.processAllAvailable()
      // the inline close is final; the 10:00 event itself advances the
      // watermark to 09:00, which may already have fired user 8's 07:00
      // timer — but user 7's open session (expiry 16:00) must not close
      val mid = spark.table("tws_sessions_out").count()
      assert(mid >= 1 && mid <= 2, s"unexpected closes: $mid")
      assert(spark.table("tws_sessions_out")
        .filter(col("user_id") === 7 && col("n") === 2).count() === 1,
        "inline close missing")
      // TIMER path: sentinels push the watermark past last + gap (the
      // watermark for batch N derives from batch N-1's max)
      stream.addData(Ev(90, t("2024-01-03 00:00:00"), 99, "view", 0.0, "{}"))
      q.processAllAvailable()
      stream.addData(Ev(91, t("2024-01-03 00:01:00"), 99, "view", 0.0, "{}"))
      q.processAllAvailable()
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val streamed = spark.table("tws_sessions_out")
      .filter(col("user_id") =!= 99)
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq).toSeq
    val batch = EventStreams.userSessions(fixture.toDF())
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.length === 3)
    // the sentinel's own session is still open: state holds ONLY the
    // active user — closed sessions' state and timers are cleared
    assert(spark.table("tws_sessions_out")
      .filter(col("user_id") === 99).count() === 0)
  }

  test("TwsSessions: cross-batch backward extension and exact-boundary close match batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // user 5: the open session starts at 02:00 in batch 1; batch 2
    // delivers an IN-WATERMARK out-of-order event at 01:30 that PRECEDES
    // the open start — session_start must extend backwards to MIN(ts),
    // exactly as session_window / the batch gaps-and-islands oracle report.
    // user 6: second event at EXACTLY first + 6h — session_window's
    // boundary is INCLUSIVE (the candidate window's start equals the open
    // session's end and they merge), so ONE session; this fixture is the
    // empirical pin the oracle's strict ts > lag + gap rule mirrors.
    val fixture = Seq(
      Ev(1, t("2024-01-01 02:00:00"), 5, "view", 1.0, "{}"),
      Ev(2, t("2024-01-01 01:30:00"), 5, "click", 2.0, "{}"),
      Ev(3, t("2024-01-01 00:00:00"), 6, "view", 3.0, "{}"),
      Ev(4, t("2024-01-01 06:00:00"), 6, "view", 4.0, "{}"))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    val stream = MemoryStream[Ev]
    val q = TwsSessions.userSessionsTws(stream.toDF())
      .writeStream.format("memory").queryName("tws_ooo_out")
      .outputMode("append").start()
    try {
      // batch 1 max = 02:00 -> watermark 01:00 for batch 2, so the 01:30
      // straggler is in-watermark (accepted), not dropped
      stream.addData(fixture(0), fixture(2))
      q.processAllAvailable()
      stream.addData(fixture(1), fixture(3))
      q.processAllAvailable()
      // sentinels close every open session via the timer path
      stream.addData(Ev(90, t("2024-01-03 00:00:00"), 99, "view", 0.0, "{}"))
      q.processAllAvailable()
      stream.addData(Ev(91, t("2024-01-03 00:01:00"), 99, "view", 0.0, "{}"))
      q.processAllAvailable()
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val streamed = spark.table("tws_ooo_out")
      .filter(col("user_id") =!= 99)
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq).toSeq
    val batch = EventStreams.userSessions(fixture.toDF())
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch, "tws diverged from session_window on " +
      "out-of-order backward extension / exact-boundary merge")
    // user 5: ONE session whose start extended backwards to 01:30
    assert(streamed.count(_.head == 5L) === 1)
    assert(streamed.find(_.head == 5L).get(1) ===
      t("2024-01-01 01:30:00"))
    // user 6: ONE merged session — the boundary event extended (inclusive
    // session_window containment), spanning [00:00, 06:00+gap]
    val u6 = streamed.filter(_.head == 6L)
    assert(u6.length === 1)
    assert(u6.head(2) === t("2024-01-01 12:00:00") && u6.head(3) === 2L)
  }

  test("dedupedEvents: replays dropped within watermark, state evicted past it, post-eviction id re-admitted") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val stream = MemoryStream[Ev]
    val q = EventStreams.dedupedEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def ids(): Seq[Long] = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    def stateRows(): Long =
      Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        .map(_.numRowsTotal).sum
    try {
      // same-batch byte-identical replay: kept once
      stream.addData(Ev(1, t("00:00"), 1, "view", 1.0, "{}"),
        Ev(2, t("00:10"), 1, "click", 2.0, "{}"),
        Ev(1, t("00:00"), 1, "view", 1.0, "{}"))
      q.processAllAvailable()
      assert(ids() === Seq(1L, 2L))
      // cross-batch replay while state lives: dropped; the 12:00 row
      // advances the NEXT batch's watermark to 11:00
      stream.addData(Ev(2, t("00:10"), 1, "click", 2.0, "{}"),
        Ev(90, t("12:00"), 9, "view", 0.0, "{}"))
      q.processAllAvailable()
      assert(ids() === Seq(1L, 2L, 90L))
      // the 12:00 row advanced the watermark to 11:00 and the drained
      // follow-up batch ALREADY evicted ids 1 and 2 (expiries
      // 01:00/01:10): only id 90 is live — the bounded-state property
      // plain dropDuplicates cannot give
      assert(stateRows() === 1, s"expected only id 90 live: ${stateRows()}")
      stream.addData(Ev(91, t("12:01"), 9, "view", 0.0, "{}"))
      q.processAllAvailable()
      assert(stateRows() === 2, s"expected ids 90,91 live: ${stateRows()}")
      // the HONEST boundary: id 1 returns with an in-watermark ts after
      // its original's state expired — re-admitted, not deduped
      stream.addData(Ev(1, t("11:30"), 1, "view", 5.0, "{}"))
      q.processAllAvailable()
      assert(ids() === Seq(1L, 1L, 2L, 90L, 91L),
        "post-eviction same-id record must re-admit")
    } finally q.stop()
    // the batch twin applies keep-one-per-id to a byte-identical replay
    val out = EventStreams.dedupedEvents(Seq(
        Ev(1, t("00:00"), 1, "view", 1.0, "{}"),
        Ev(2, t("00:10"), 1, "click", 2.0, "{}"),
        Ev(1, t("00:00"), 1, "view", 1.0, "{}")).toDF())
      .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(out === Seq(1L, 2L))
  }

  test("encodedEvents: streamed feature lookup == batch join across a split; unseen category takes the fold prior") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // offline training corpus: users 1..4, purchases by id % 3
    val train = (1L to 40L).map(id =>
      Ev(id, t((id % 50).toInt), 1 + id % 4,
        if (id % 3 == 0) "purchase" else "view", 0.0, "{}")).toDF()
    val enc = graft.events.EventQueries.targetEncodingFrame(train)
      .localCheckpoint()
    // serving traffic: known users + user 99 the table never saw
    val serve = Seq(
      Ev(100, t(1), 1, "view", 0.0, "{}"),
      Ev(101, t(2), 2, "view", 0.0, "{}"),
      Ev(102, t(3), 99, "view", 0.0, "{}"),
      Ev(103, t(4), 3, "view", 0.0, "{}"),
      Ev(104, t(5), 99, "purchase", 0.0, "{}"))
    val stream = MemoryStream[Ev]
    val q = EventStreams.encodedEvents(stream.toDF(), enc)
      .writeStream.format("memory").queryName("te_serve_out")
      .outputMode("append").start()
    try {
      stream.addData(serve.take(2): _*)
      q.processAllAvailable()
      stream.addData(serve.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "fold", "te_user").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val streamed = rows(spark.table("te_serve_out"))
    val batch = rows(EventStreams.encodedEvents(serve.toDF(), enc))
    assert(streamed === batch)
    assert(streamed.size === serve.size)
    // the unseen category fell back to its fold's out-of-fold prior
    val priors = enc.groupBy("fold")
      .agg(org.apache.spark.sql.functions.max("prior").as("p")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    streamed.filter(_._2 == 99L).foreach { case (_, _, fold, te) =>
      assert(te === priors(fold), s"unseen category fold $fold") }
    // known categories got their exact table rows
    val encMap = enc.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("encoding")).toMap
    streamed.filter(_._2 != 99L).foreach { case (_, u, fold, te) =>
      assert(te === encMap((u, fold))) }
  }

  test("dedupedEvents observability: StreamingQueryProgress carries the runbook metrics (state rows, late drops, batch timing)") {
    // the OPERATIONAL readout a production stream is monitored by — not
    // result parity (the sibling tests pin that) but the
    // StreamingQueryProgress fields an on-call dashboard alarms on:
    // per-batch input rows, state-store size, watermark position,
    // late-row drops, and batch durations
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val stream = MemoryStream[Ev]
    val q = EventStreams.dedupedEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup_obs_out")
      .outputMode("append").start()
    def state() = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    def lateDrops(): Long =
      q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
    try {
      stream.addData(Ev(1, t("00:00"), 1, "view", 1.0, "{}"),
        Ev(2, t("00:10"), 1, "click", 2.0, "{}"),
        Ev(3, t("00:20"), 2, "view", 3.0, "{}"))
      q.processAllAvailable()
      // input accounting: the fed rows all arrived through the source
      val inputRows = q.recentProgress.map(_.numInputRows).sum
      assert(inputRows === 3L, s"numInputRows=$inputRows")
      // state accounting: one dedup operator, one state row per live id
      val ops = state()
      assert(ops.size === 1, s"expected one state operator: $ops")
      assert(ops.head.operatorName.toLowerCase.contains("dedupe"),
        ops.head.operatorName)
      assert(ops.head.numRowsTotal === 3L)
      // timing: the batch reported wall-clock and a positive addBatch leg
      val prog = q.lastProgress
      assert(prog.batchDuration > 0L)
      assert(prog.durationMs.get("addBatch") != null
        && prog.durationMs.get("addBatch") >= 0L)
      // watermark: published in eventTime once computed (trails by one
      // batch; the drain after addData guarantees at least one follow-up)
      stream.addData(Ev(90, t("12:00"), 9, "view", 0.0, "{}"))
      q.processAllAvailable()
      val wm = Option(q.lastProgress.eventTime.get("watermark"))
      assert(wm.exists(_.startsWith("2024-01-01T11:00")),
        s"watermark not published or wrong: $wm")
      assert(lateDrops() === 0L)
      // a row below the watermark is dropped AT THE OPERATOR and the
      // drop is COUNTED — the metric an ingest SLO alarms on (silent
      // late-data loss is the failure mode this readout exists for)
      stream.addData(Ev(50, t("00:30"), 5, "view", 9.0, "{}"))
      q.processAllAvailable()
      assert(lateDrops() === 1L,
        s"late row not counted in numRowsDroppedByWatermark: ${lateDrops()}")
      assert(spark.table("dedup_obs_out")
        .filter(col("event_id") === 50L).isEmpty)
      // and the eviction the watermark bought is visible as state-size
      // decay: ids 1/2/3 (expiries 01:00-01:20) are gone, id 90 lives
      assert(state().head.numRowsTotal === 1L,
        s"state rows after eviction: ${state().head.numRowsTotal}")
    } finally q.stop()
  }

  test("TwsSessions: per-state TTL drops an idle user's state; a post-expiry event starts fresh") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    // Processing-time TTL keeps the trigger loop hot (empty batches
    // re-fire continuously — even AvailableNow never terminates, the
    // ProcessingTimeTimeout gotcha's TWS shape), so neither
    // processAllAvailable nor awaitTermination can gate a step. Each
    // pass instead polls the sink to the expected row count and stops
    // the query; the checkpoint restart carries RocksDB state (and its
    // TTL expirations) across passes — also the production replay shape.
    // (the memory sink refuses checkpoint recovery, so the sink is a
    // foreachBatch into an event-id-keyed map — idempotent under the
    // one uncommitted-batch replay a restart may perform)
    def drain(stream: MemoryStream[Ev], ckpt: String,
        ttl: java.time.Duration,
        buf: java.util.concurrent.ConcurrentHashMap[Long, Long],
        expected: Int): Unit = {
      val q = TwsSessions.userBurstCounts(stream.toDF(), ttl)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => buf.put(r.getLong(1), r.getLong(2)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val deadline = System.currentTimeMillis() + 120000
      while (buf.size < expected && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      q.stop()
    }
    def runsOf(buf: java.util.concurrent.ConcurrentHashMap[Long, Long]) = {
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq.sortBy(_._1).map(_._2)
    }
    try {
      // WARM path: a generous TTL survives micro-batch boundaries — the
      // counter keeps running across passes 1 and 2
      val warmCk = java.nio.file.Files.createTempDirectory("ttlw").toString
      val warmBuf = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val warm = MemoryStream[Ev]
      warm.addData(Ev(1, t("2024-01-01 00:00:00"), 7, "view", 0.0, "{}"),
        Ev(2, t("2024-01-01 00:01:00"), 7, "view", 0.0, "{}"))
      drain(warm, warmCk, java.time.Duration.ofMinutes(10), warmBuf, 2)
      warm.addData(Ev(3, t("2024-01-01 00:02:00"), 7, "view", 0.0, "{}"))
      drain(warm, warmCk, java.time.Duration.ofMinutes(10), warmBuf, 3)
      assert(runsOf(warmBuf) === Seq(1L, 2L, 3L),
        "warm state must survive micro-batch boundaries under a live TTL")
      // EXPIRY path: a sub-second TTL with a real idle gap between passes
      val coldCk = java.nio.file.Files.createTempDirectory("ttlc").toString
      val coldBuf = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val cold = MemoryStream[Ev]
      cold.addData(Ev(1, t("2024-01-01 00:00:00"), 9, "view", 0.0, "{}"),
        Ev(2, t("2024-01-01 00:01:00"), 9, "view", 0.0, "{}"))
      drain(cold, coldCk, java.time.Duration.ofMillis(400), coldBuf, 2)
      Thread.sleep(1500) // idle past the 400ms TTL: the store evicts
      cold.addData(Ev(3, t("2024-01-01 00:02:00"), 9, "view", 0.0, "{}"))
      drain(cold, coldCk, java.time.Duration.ofMillis(400), coldBuf, 3)
      // pass 1 counts 1, 2; the idle gap expires the state, so event 3
      // opens a FRESH run at 1 — no tombstone, no stale carry-over
      assert(runsOf(coldBuf) === Seq(1L, 2L, 1L),
        s"TTL expiry did not reset the run: ${runsOf(coldBuf)}")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("userSessions: batch run sessionizes with the 6h gap rule") {
    val spark0 = spark
    import spark0.implicits._
    val out = EventStreams.userSessions(events.toDF())
      .orderBy("user_id", "session_start").collect()
    // user 10: events at 00:01, 00:04, 00:12 -> one session of 3
    // user 11: 00:11, 00:25 x2 -> one session of 3
    assert(out.length === 2)
    assert(out(0).getAs[Long]("user_id") === 10L)
    assert(out(0).getAs[Long]("n") === 3L)
    assert(out(1).getAs[Long]("n") === 3L)
  }
}
