package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.sources.Warehouse

/** Exactly-once streaming delivery into the warehouse via `foreachBatch`.
  *
  * Structured Streaming guarantees each micro-batch is delivered AT LEAST
  * once to the sink function (a crash between sink write and offset commit
  * replays the batch on restart). Exactly-once therefore lives in the SINK:
  * the write must be idempotent per (batchId, data). Replace-mode delivery
  * of a COMPLETE-mode aggregate satisfies this structurally — every batch
  * carries the full result, so overwriting the target is a pure function
  * of the input stream's prefix, and a replayed batch rewrites byte-
  * identical content (the same argument that makes the reference's
  * drop-and-recreate Load step safe to re-run; see
  * [[graft.sources.Warehouse.replaceTable]]).
  *
  * The batchId guard on top makes the skip explicit: a replay of an
  * already-committed batch is detected from the table's own committed-batch
  * property — the transactional-sink discipline (sinks that cannot
  * overwrite atomically, e.g. append-mode JDBC, NEED the guard; overwrite
  * sinks get a cheap no-op on replay). The id is stored ON the target
  * catalog entry, so the guard survives session restarts exactly as far as
  * the data itself does — the two cannot diverge.
  */
object StreamSinks {

  private val BatchProp = "graft.committedBatchId"

  /** Committed-batch id recorded on the table, -1 if absent. */
  def committedBatchId(spark: org.apache.spark.sql.SparkSession,
      table: String): Long = {
    val id = org.apache.spark.sql.catalyst.TableIdentifier(
      table, Some(Warehouse.Schema))
    val cat = spark.sessionState.catalog
    if (!cat.tableExists(id)) -1L
    else cat.getTableMetadata(id).properties.get(BatchProp).map(_.toLong)
      .getOrElse(-1L)
  }

  /** One idempotent micro-batch delivery: skip if `batchId` was already
    * committed, else replace the table and record the id.
    */
  def deliverBatch(batch: DataFrame, batchId: Long, table: String): Unit = {
    val spark = batch.sparkSession
    if (committedBatchId(spark, table) >= batchId) {
      System.err.println(
        s"[sink] $table: batch $batchId already committed, skipping replay")
    } else {
      Warehouse.replaceTable(batch, table)
      spark.sql(s"ALTER TABLE ${Warehouse.Schema}.$table " +
        s"SET TBLPROPERTIES ('$BatchProp' = '$batchId')")
    }
  }

  /** writeStream wiring for a complete-mode aggregate -> warehouse table.
    * Caller picks the trigger and starts it.
    */
  def toWarehouse(stream: DataFrame, table: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("complete")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        deliverBatch(batch, batchId, table))

  /** Column naming the change operation in a CDC batch: 'u' upserts the
    * row, 'd' deletes its key.
    */
  val OpCol = "op"

  /** One idempotent CDC micro-batch apply: change rows carrying an
    * [[OpCol]] split into the upsert delta and the delete keys, applied
    * through [[graft.sources.Warehouse.mergeTable]]'s two paths in ONE
    * merge. With `seqCol` set (a CDC sequence/LSN, unique per key within
    * a batch), the batch is COMPACTED first — only each key's latest
    * change applies, the standard changefeed apply; without it the
    * caller promises at most one change per key per batch, and
    * mergeTable's duplicate-key/overlap guards enforce the promise.
    *
    * Exactly-once: a replay of batch N after batch N+1 has applied would
    * REGRESS keys to stale values (unlike [[deliverBatch]]'s
    * complete-mode replace, a delta apply is NOT a pure function of the
    * stream prefix), so the batchId guard here is semantic, not just a
    * cheap skip: stale batch ids never touch the table.
    */
  def deliverCdcBatch(batch: DataFrame, batchId: Long, table: String,
      keys: Seq[String], seqCol: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.{col, desc, row_number}
    val spark = batch.sparkSession
    if (committedBatchId(spark, table) >= batchId) {
      System.err.println(
        s"[sink] $table: batch $batchId already committed, skipping replay")
      return
    }
    val compacted = seqCol.fold(batch) { sc =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*).orderBy(desc(sc))
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    val delta = compacted.filter(col(OpCol) === "u")
      .drop(OpCol).drop(seqCol.toSeq: _*)
    val dels = compacted.filter(col(OpCol) === "d")
      .select(keys.map(col): _*)
    Warehouse.mergeTable(delta, table, keys, Some(dels))
    spark.sql(s"ALTER TABLE ${Warehouse.Schema}.$table " +
      s"SET TBLPROPERTIES ('$BatchProp' = '$batchId')")
  }

  /** writeStream wiring for an append-mode change stream -> warehouse
    * table maintained by keyed merge: the streaming face of the
    * `events_cdc_apply` batch operator. Caller picks the trigger.
    */
  def cdcToWarehouse(stream: DataFrame, table: String, keys: Seq[String],
      seqCol: Option[String] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        deliverCdcBatch(batch, batchId, table, keys, seqCol))
}
