package graft.api

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for unsplittably-read inputs (guide §2.5
  * "input skew: one huge unsplittable file → repartition immediately
  * after the read").
  */
object Par {

  /** Spread `df` across the session's default parallelism before a
    * CPU-heavy aggregate/per-row pipeline, IF AND ONLY IF the scan
    * yields fewer partitions than that. The driver corpus stores each
    * table as a single parquet row group, so every scan is one task and
    * a heavy partial aggregate runs on one core of local[32]; at
    * cluster scale the same table is thousands of splits and this is a
    * no-op — the exchange exists exactly where the input layout, not
    * the data size, is the parallelism bottleneck.
    *
    * Determinism: round-robin repartition sorts its input first
    * (SPARK-23207, `spark.sql.execution.sortBeforeRepartition` default
    * on), and every consumer is partition-order-agnostic (associative
    * quantized-LONG sums, min/max, exact/HLL distincts), so results are
    * bit-identical at any partition count.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
