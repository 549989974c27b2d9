package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection / profiling harness:
  *   runMain graft.Explain <sfDir> [queryName ...]
  * Prints explain("formatted") and two timed runs (cold, warm) for each
  * named query (default: all registry queries, timing only).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once so timings exclude JVM/codegen cold start
    spark.range(1000).selectExpr("sum(id)").collect()
    val targets =
      if (names.isEmpty) SparkEntry.registry
      else SparkEntry.registry.filter(q => names.contains(q.name))
    targets.foreach { q =>
      if (names.nonEmpty) {
        println(s"\n========== ${q.name} ==========")
        q.frame(spark, sfDir).explain("formatted")
      }
      // same inter-run hygiene as Bench: checkpoint blocks released and
      // garbage collected OUTSIDE the timed region, so one query's scratch
      // never inflates the next measurement
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.frame(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.api.Checkpoints.releaseAll(spark)
        System.gc()
        sec
      }
      println(f"[time] ${q.name}%-28s cold=${t.head}%6.2fs warm=${t.last}%6.2fs")
    }
    spark.stop()
  }
}
