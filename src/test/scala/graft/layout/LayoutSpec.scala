package graft.layout

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the data-layout family: the generated bit-interleave must BE a
  * Morton code, and the Z-order layout must actually beat the linear one
  * on the 2-D predicate (the entire point of the operator).
  */
class LayoutSpec extends SparkSpec {

  test("interleaveExpr is the Morton interleave (vs plain-Scala reference)") {
    def ref(x: Long, y: Long): Long =
      (0 until LayoutQueries.DimBits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val samples = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (4095L, 4095L), (2498L, 1999L),
      (1L, 4094L), (1365L, 2730L), (517L, 1843L))
    val df = spark.createDataFrame(samples).toDF("x", "y")
      .withColumn("z", expr(
        LayoutQueries.interleaveExpr("x", "y", LayoutQueries.sparkIdiv)))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("z") ===
        ref(r.getAs[Long]("x"), r.getAs[Long]("y")),
        s"x=${r.get(0)} y=${r.get(1)}")
    }
    // Morton locality: a file cell is an ALIGNED 256×256 rectangle — from
    // an aligned corner, every offset inside the rectangle keeps the cell
    // id, so the min/max index the query builds is tight by construction
    val (x0, y0) = (5L << 8, 10L << 8)
    val cell = ref(x0, y0) >> 16
    for (dx <- Seq(0L, 1L, 128L, 255L); dy <- Seq(0L, 1L, 128L, 255L))
      assert(ref(x0 + dx, y0 + dy) >> 16 === cell, s"dx=$dx dy=$dy")
    // ...and crossing the rectangle changes it
    assert(ref(x0 + 256L, y0) >> 16 !== cell)
  }

  test("layout_zorder_pruning: invariants + z-order beats linear on 2-D") {
    val rows = LayoutQueries.zorderPruning.frame(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet === Set("linear", "zorder"))
    val lin = rows("linear"); val z = rows("zorder")
    // the true predicate count is layout-independent
    assert(lin.getAs[Long]("rows_matched") === z.getAs[Long]("rows_matched"))
    assert(lin.getAs[Long]("rows_total") === z.getAs[Long]("rows_total"))
    assert(z.getAs[Long]("rows_matched") > 0L)
    // min/max skipping never loses a match: every matched row is scanned
    assert(z.getAs[Long]("rows_scanned") >= z.getAs[Long]("rows_matched"))
    assert(lin.getAs[Long]("rows_scanned") >= lin.getAs[Long]("rows_matched"))
    // the point of Z-order: the 2-D predicate prunes strictly better than
    // the single-dimension layout
    assert(z.getAs[Double]("read_amp") < lin.getAs[Double]("read_amp"))
    assert(z.getAs[Long]("files_touched") < lin.getAs[Long]("files_touched"))
  }

  test("hilbertStep chain is the Hilbert xy2d transform (vs plain-Scala reference)") {
    // the standard loop (Warren / Wikipedia), independent implementation
    def ref(xIn: Long, yIn: Long): Long = {
      var (x, y, d) = (xIn, yIn, 0L)
      var s = LayoutQueries.DimCells / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) {
            x = LayoutQueries.DimCells - 1 - x
            y = LayoutQueries.DimCells - 1 - y
          }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val samples = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (4095L, 4095L), (2498L, 1999L),
      (1L, 4094L), (1365L, 2730L), (517L, 1843L), (2048L, 2047L))
    var df = spark.createDataFrame(samples).toDF("x0", "y0")
    val terms = (0 until LayoutQueries.DimBits).map { k =>
      val (xN, yN, dT) = LayoutQueries.hilbertStep(k, LayoutQueries.sparkIdiv)
      df = df.withColumn(s"x${k + 1}", expr(xN)).withColumn(s"y${k + 1}", expr(yN))
      dT
    }
    df.withColumn("hd", expr(terms.mkString(" + "))).collect().foreach { r =>
      assert(r.getAs[Long]("hd") ===
        ref(r.getAs[Long]("x0"), r.getAs[Long]("y0")),
        s"x=${r.get(0)} y=${r.get(1)}")
    }
    // Hilbert adjacency: consecutive d are always grid neighbors — the
    // no-jump property Z-order lacks (and the reason unaligned curve
    // ranges have tighter bounding boxes). Invert a stretch of the curve
    // by brute force over a small grid and check each step moves by 1.
    val inv = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield ref(x * 64, y * 64) / (64 * 64) -> (x, y)).toMap
    for (dd <- 0L until 4095L) {
      val (ax, ay) = inv(dd); val (bx, by) = inv(dd + 1)
      assert(math.abs(ax - bx) + math.abs(ay - by) === 1,
        s"jump at d=$dd: ($ax,$ay)->($bx,$by)")
    }
  }

  test("layout_hilbert_pruning: invariants + hilbert beats zorder on unaligned ranges") {
    val rows = LayoutQueries.hilbertPruning.frame(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet === Set("hilbert", "zorder"))
    val h = rows("hilbert"); val z = rows("zorder")
    assert(h.getAs[Long]("rows_matched") === z.getAs[Long]("rows_matched"))
    assert(h.getAs[Long]("rows_total") === z.getAs[Long]("rows_total"))
    assert(h.getAs[Long]("rows_matched") > 0L)
    assert(h.getAs[Long]("rows_scanned") >= h.getAs[Long]("rows_matched"))
    // equal-width UNALIGNED curve ranges: Hilbert's contiguity gives each
    // file a tighter bounding box, so it must not scan more than Z-order
    assert(h.getAs[Double]("read_amp") <= z.getAs[Double]("read_amp"),
      s"hilbert ${h.getAs[Double]("read_amp")} vs zorder ${z.getAs[Double]("read_amp")}")
  }

  test("layout_append_degradation: appends poison skipping; re-clustering restores it") {
    val rows = LayoutQueries.appendDegradation.frame(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet === Set("appended", "clustered"))
    val a = rows("appended"); val c = rows("clustered")
    // same data, same truth
    assert(a.getAs[Long]("rows_matched") === c.getAs[Long]("rows_matched"))
    assert(a.getAs[Long]("rows_total") === c.getAs[Long]("rows_total"))
    // the 'clustered' row IS the compacted state (batch re-assigned to
    // cells) — so this inequality is exactly what compaction buys back
    assert(a.getAs[Double]("read_amp") > c.getAs[Double]("read_amp"))
    // every append file spans the key space, so min/max prunes none of
    // them: files_touched grows by at least the append-file count
    val extraFiles = a.getAs[Long]("n_files") - c.getAs[Long]("n_files")
    assert(extraFiles > 0 && extraFiles <= LayoutQueries.AppendFiles)
    assert(a.getAs[Long]("files_touched") >=
      c.getAs[Long]("files_touched") + extraFiles)
    // the degraded scan pays (at least) the whole ~10% batch on top
    assert(a.getAs[Long]("rows_scanned") >
      c.getAs[Long]("rows_scanned") +
        a.getAs[Long]("rows_total") / 20)
  }

  test("z-clustered WRITE: real parquet files carry the index the query predicts") {
    // the executable version of the scaladoc claim: repartitionByRange on
    // the cell id + write, then rebuild the skipping index from the REAL
    // files (input_file_name) and check it prunes exactly like the
    // simulated one — no matched row ever lands in a skipped file, and
    // the touched set is a small fraction of the files
    val dir = java.nio.file.Files.createTempDirectory("graft-zwrite").toString
    try {
      val cellShift = 1L << (2 * LayoutQueries.DimBits - LayoutQueries.FilePrefixBits)
      val rows = LayoutQueries.gridRows(spark, sf)
        .withColumn("cell", expr(s"z div $cellShift"))
        .select("cell", "x", "pk", "matched", "xlo", "xhi", "plo", "phi")
      val nCells = rows.select("cell").distinct().count().toInt
      rows.repartitionByRange(nCells, col("cell"))
        .sortWithinPartitions(col("cell"))
        .write.mode("overwrite").parquet(dir)
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("file"))
        .agg(min("x").as("min_x"), max("x").as("max_x"),
          min("pk").as("min_pk"), max("pk").as("max_pk"),
          count(lit(1)).as("n_rows"),
          sum(when(col("matched"), 1L).otherwise(0L)).as("n_matched"),
          max("xlo").as("xlo"), max("xhi").as("xhi"),
          max("plo").as("plo"), max("phi").as("phi"))
        .collect()
      def touched(f: org.apache.spark.sql.Row) =
        f.getAs[Long]("max_x") >= f.getAs[Long]("xlo") &&
          f.getAs[Long]("min_x") <= f.getAs[Long]("xhi") &&
          f.getAs[Long]("max_pk") >= f.getAs[Long]("plo") &&
          f.getAs[Long]("min_pk") <= f.getAs[Long]("phi")
      val (t, skipped) = perFile.partition(touched)
      val matchedTotal = perFile.map(_.getAs[Long]("n_matched")).sum
      assert(matchedTotal > 0L)
      // min/max skipping is LOSSLESS on the real files
      assert(skipped.map(_.getAs[Long]("n_matched")).sum === 0L)
      assert(t.map(_.getAs[Long]("n_matched")).sum === matchedTotal)
      // and EFFECTIVE: most files skip, and the touched rows are a small
      // fraction of the table
      assert(t.length < perFile.length / 4,
        s"${t.length} of ${perFile.length} files touched")
      val scanned = t.map(_.getAs[Long]("n_rows")).sum
      val total = perFile.map(_.getAs[Long]("n_rows")).sum
      assert(scanned * 4 <= total, s"scanned $scanned of $total")
    } finally {
      val root = new java.io.File(dir)
      root.listFiles().foreach(_.delete()); root.delete()
    }
  }

  test("layout_optimize_zorder: real-table rewrite wins the recent-window scan, leaves the table clustered") {
    val got = LayoutQueries.optimizeZorder.frame(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(got.keySet === Set("appended", "clustered"))
    val a = got("appended"); val c = got("clustered")
    // same data, same truth, on both sides of the rewrite
    assert(a.getAs[Long]("rows_matched") === c.getAs[Long]("rows_matched"))
    assert(a.getAs[Long]("rows_total") === c.getAs[Long]("rows_total"))
    assert(c.getAs[Long]("rows_matched") > 0L)
    // what OPTIMIZE buys on the recent-window query: strictly less read
    assert(a.getAs[Double]("read_amp") > c.getAs[Double]("read_amp"))
    assert(a.getAs[Long]("rows_scanned") > c.getAs[Long]("rows_scanned"))
    // physical state after OPTIMIZE: the catalog's partition directories
    // ARE the index's file slots, no row is misplaced, append slots gone
    val tbl = s"${graft.sources.Warehouse.Schema}.${LayoutQueries.LayoutTable}"
    val parts = spark.sql(s"SHOW PARTITIONS $tbl").count()
    assert(parts === c.getAs[Long]("n_files"))
    assert(spark.table(tbl)
      .filter(col("file_id") =!= col("zcell")).count() === 0L)
    // a clustered table is a no-op for the maintenance verb
    assert(graft.sources.Warehouse.compactClustered(
      spark, LayoutQueries.LayoutTable, "file_id", "zcell") === 0L)
  }

  test("layout_optimize_zorder is INCREMENTAL: cells outside the ingest stripe keep their files") {
    import graft.sources.Warehouse
    // rebuild the appended state exactly as the query does, then OPTIMIZE
    // by hand so the before-files of an untouched cell can be captured
    val cellShift = 1L << (2 * LayoutQueries.DimBits - LayoutQueries.FilePrefixBits)
    val cellFiles = 1L << LayoutQueries.FilePrefixBits
    val rows = LayoutQueries.gridRows(spark, sf, withIngestKey = true)
      .withColumn("zcell", expr(s"z div $cellShift"))
      .withColumn("xbcut",
        datediff(lit(LayoutQueries.OptimizeSinceDate).cast("timestamp"),
          lit(LayoutQueries.BaseDate).cast("timestamp")).cast("long"))
      .withColumn("file_id", expr(
        s"CASE WHEN x >= xbcut THEN $cellFiles + ihf ELSE zcell END"))
      .select(col("file_id"), col("x"), col("pk"), col("zcell"))
      .repartition(col("file_id"))
    val tbl = "spec_opt_incremental"
    Warehouse.replacePartitioned(rows, tbl, "file_id")
    val q = s"${Warehouse.Schema}.$tbl"
    val batch = spark.table(q)
      .filter(col("file_id") =!= col("zcell")).count()
    assert(batch > 0L)
    // an old-data cell is never a source or destination of the move
    val coldCell = spark.table(q)
      .filter(col("file_id") === col("zcell")
        && col("file_id") < lit(cellFiles))
      .groupBy(col("file_id")).count()
      .orderBy(col("file_id")).head.getAs[Long]("file_id")
    val destCells = spark.table(q)
      .filter(col("file_id") =!= col("zcell"))
      .select(col("zcell")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!destCells.contains(coldCell))
    val coldBefore = spark.table(q)
      .filter(col("file_id") === coldCell).inputFiles.toSet
    val moved = Warehouse.compactClustered(spark, tbl, "file_id", "zcell")
    assert(moved === batch)
    // the move rewrote only the append slots + destination cells: the
    // cold cell's physical files are untouched (same paths, no rewrite)
    assert(spark.table(q)
      .filter(col("file_id") === coldCell).inputFiles.toSet === coldBefore)
    // append slots emptied and dropped
    assert(spark.table(q)
      .filter(col("file_id") >= lit(cellFiles)).count() === 0L)
    assert(spark.sql(s"SHOW PARTITIONS $q").collect()
      .forall(_.getString(0).stripPrefix("file_id=").toLong < cellFiles))
  }

  test("compactClustered: moves only misplaced rows, drops emptied sources, untouched partitions keep their files") {
    import spark.implicits._
    import graft.sources.Warehouse
    val tbl = "spec_opt_clustered"
    val q = s"${Warehouse.Schema}.$tbl"
    // cells 0/1 resident and well-placed; append slot 100 holds rows
    // belonging to cells 1 (two rows) and 2 (one row — a NEW partition)
    val rows = Seq(
      (10L, 0L, 0L), (11L, 0L, 0L),          // cell 0 — untouched
      (20L, 1L, 1L),                          // cell 1 — gains rows
      (90L, 100L, 1L), (91L, 100L, 1L),      // misplaced -> cell 1
      (92L, 100L, 2L))                        // misplaced -> new cell 2
      .toDF("id", "file_id", "zcell")
      .select(col("id"), col("zcell"), col("file_id")) // part col last
    Warehouse.replacePartitioned(rows, tbl, "file_id")
    val cell0Before = spark.table(q).filter(col("file_id") === 0L)
      .inputFiles.toSet
    assert(Warehouse.compactClustered(spark, tbl, "file_id", "zcell") === 3L)
    // every row sits in its cluster cell; content is key-preserved
    val after = spark.table(q).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("file_id"))).sorted
    assert(after === Seq(10L -> 0L, 11L -> 0L, 20L -> 1L, 90L -> 1L,
      91L -> 1L, 92L -> 2L))
    // the emptied append slot is gone from the catalog, not just empty
    val parts = spark.sql(s"SHOW PARTITIONS $q").collect().map(_.getString(0))
    assert(parts.sorted === Seq("file_id=0", "file_id=1", "file_id=2"))
    // the untouched cell's files are byte-identical (same paths — no
    // rewrite happened there)
    assert(spark.table(q).filter(col("file_id") === 0L)
      .inputFiles.toSet === cell0Before)
    // and the verb is idempotent
    assert(Warehouse.compactClustered(spark, tbl, "file_id", "zcell") === 0L)
  }

  test("layout_zorder_pruning: scan reads only the two layout columns") {
    val plan = LayoutQueries.zorderPruning.frame(spark, sf)
      .queryExecution.executedPlan.toString
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq
    assert(reads.nonEmpty)
    reads.foreach { r =>
      assert(!r.contains("l_extendedprice") && !r.contains("l_orderkey"),
        s"unpruned scan: $r")
    }
  }
}
