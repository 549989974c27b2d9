package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Block-storage lifecycle for `localCheckpoint()`ed frames.
  *
  * `localCheckpoint` pins its materialized partitions in executor block
  * storage and — unlike `persist()` — is NOT tracked by the CacheManager, so
  * `df.unpersist()` cannot free it; release waits on the ContextCleaner's
  * GC-driven best effort. In a long session (the bench run, an iterative
  * algorithm) that retention bleeds memory pressure into every LATER job:
  * BENCH_r03 measured 2-3x inflation on unchanged queries that merely ran
  * after the dedup block. Two remedies, both explicit:
  *
  *   - [[release]]: point release of a single superseded frame — the
  *     iterative-algorithm case ([[graft.dedup.DedupQueries.connectedComponents]]
  *     drops sweep N-1's labels the moment sweep N is materialized).
  *   - [[releaseAll]]: session-wide sweep between independent units of work —
  *     [[graft.Bench]] and [[graft.Verify]] call it after each registry query
  *     so no query's scratch blocks survive into the next one's run.
  *
  * At cluster scale the same discipline holds (blocks live on executors, the
  * unpersist is an RPC); nothing here is local-mode-only.
  */
object Checkpoints {

  /** Unpersist the checkpointed RDDs at the [[LogicalRDD]] leaves of `df`'s
    * plan. After `localCheckpoint()` the plan is cut at a `LogicalRDD`, so a
    * frame derived from one checkpoint releases exactly that checkpoint —
    * never an ancestor (the cut removed it from the plan).
    */
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.logical
      .collect { case lr: LogicalRDD => lr.rdd }
      .foreach(_.unpersist(blocking))

  /** Unpersist every persistent RDD in the session — localCheckpoint scratch
    * plus anything persist()ed. Callers invoke this BETWEEN units of work,
    * after the previous unit's result is fully materialized.
    */
  def releaseAll(spark: SparkSession, blocking: Boolean = true): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking))
}
