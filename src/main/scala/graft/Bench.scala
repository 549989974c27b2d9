package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every registry query at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. The line goes to stdout AND to a bare file
  * (SPARK_GRAFT_BENCH_OUT, default ./BENCH.json) so the driver can parse
  * it even when sbt prefixes stdout with "[info] ". Failing queries are
  * recorded in a "failed" list and excluded from the timings — a failure
  * must never masquerade as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (JVM/codegen/parquet-footer caches) so the first
    // measured query doesn't carry ~5s of one-time startup cost
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.loaders.foreach { case (_, load) => load(spark, sfDir).count() }
    // Each query is executed twice (three times when it looks expensive)
    // and the MIN is reported: a single JIT/GC stall can inflate one
    // execution ~4x on an unchanged plan, and back-to-back measurements of
    // 60+ queries in one JVM showed multi-second stalls that span BOTH of
    // two adjacent runs (the same query measured 10.2s and 1.3s across two
    // full bench passes, code unchanged). The third run caps the odds a
    // stall window covers every sample of a slow query; a query only
    // counts as failed if ALL executions throw.
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Release checkpoint/persist blocks AFTER the timer stops: scratch
      // blocks (localCheckpoint posting tables, CC sweeps) must not linger
      // into the next query's run — BENCH_r03 measured 2-3x inflation on
      // unchanged queries that merely ran after the dedup block. The
      // explicit GC then forces the accumulated garbage of the finished
      // run to be collected OUTSIDE the next run's timed region.
      def once(): Option[Double] =
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] $name%-28s run=$sec%6.2f")
          Some(sec)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None
        } finally {
          graft.api.Checkpoints.releaseAll(spark)
          System.gc()
        }
      val two = Seq(once(), once()).flatten
      val runs = if (two.nonEmpty && two.min > 1.0) two ++ once() else two
      (name, if (runs.isEmpty) 0.0 else runs.min, runs.nonEmpty)
    }
    val passed = timed.filter(_._3)
    val qs = passed.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = timed.filterNot(_._3).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = passed.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try Files.writeString(Paths.get(out), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
