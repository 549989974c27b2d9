package graft

import org.apache.spark.sql.functions._

/** Evidence that AQE is ON and actually re-plans at runtime — the two
  * behaviors the 100 TB story leans on. The registry queries run with AQE
  * defaults but nothing else asserts the machinery works in this build:
  * these pins fail if adaptive execution is disabled (or silently stops
  * re-planning), turning "AQE handles residual skew" from a claim in the
  * scaladoc into a tested property. Thresholds are lowered to make the
  * behaviors observable on KB-scale test frames; the re-plan logic is
  * scale-free (the same code paths fire at 256 MB that fire here at 32 KB).
  */
class AqeSpec extends SparkSpec {

  /** Set session confs for the block, restoring priors after — the shared
    * session must not leak lowered thresholds into other suites.
    */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("AQE is enabled and coalesces post-shuffle partitions of a small aggregate") {
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean,
      "adaptive execution is off — every scale claim that cites AQE is void")
    val df = spark.range(10000).groupBy((col("id") % 7).as("k"))
      .agg(count(lit(1)).as("n"))
    val plan = finalPlan(df)
    // a KB-sized shuffle must collapse below the static partition count:
    // at 100 TB the same rule is what keeps a 32-partition config from
    // producing thousands of near-empty reducers after a selective filter
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"no coalesced AQE shuffle read in:\n$plan")
    assert(plan.contains("isFinalPlan=true"))
  }

  test("AQE splits a skewed join partition at runtime") {
    withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the 256 MB/64 MB defaults down to the test frame so the
      // detector (size > threshold AND > factor * median) can fire
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force the shuffle join skew-split applies to
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // one hot key carrying 500x the rows of its siblings — the shape a
      // boilerplate-document band key or a default-valued join column
      // produces at corpus scale
      val hot = spark.range(50000).select(lit(0L).as("k"), col("id").as("v"))
      val rest = spark.range(100)
        .select((col("id") % 4 + 1).as("k"), col("id").as("v"))
      val right = spark.range(5).select(col("id").as("k"), col("id").as("w"))
      val j = hot.union(rest).join(right, "k")
      val plan = finalPlan(j)
      assert(plan.toLowerCase.contains("skew"),
        s"skewed partition was not split in:\n$plan")
      assert(plan.contains("isFinalPlan=true"))
    }
  }
}
