package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming ingest for the PERSISTED vector index — the continuous half
  * of the `ann_ivfpq_incremental` maintenance story: arriving vectors are
  * assigned to the deployed coarse cells and PQ-coded against the
  * deployed codebooks as they arrive, producing the exact rows
  * `Warehouse.appendTable` lands in the cell-partitioned code table.
  *
  * Scale/semantics: the transform is STATELESS — the model (k1 anchors,
  * the grouped sub-centroid table, PqM x PqK codewords) rides broadcast
  * stream-static joins and every arriving vector is coded row-locally,
  * so there is no watermark, no state store, and exactly-once composes
  * through the [[StreamSinks]] idempotent-write discipline. Because the
  * code path IS [[graft.sim.SimQueries.frozenModelCodes]] — the same
  * function the batch rebuild and the incremental batch append run — a
  * vector gets the identical (cell, codes) whether it arrives through
  * the stream, the batch append, or a full rebuild (StreamingSpec
  * asserts it across a micro-batch split).
  */
object VecStreams {

  /** Code an arriving (vec_id, v double[]) stream against the persisted
    * model tables ([[graft.sim.SimQueries.IvfCentroidsTable]] /
    * IvfAnchorsTable / PqCodebooksTable — deploy with
    * `ann_ivfpq_incremental` or `ann_ivfpq_persisted` first).
    * Returns (vec_id, m, code, cell), append-mode ready.
    */
  def ingestCodes(vecs: DataFrame): DataFrame = {
    val s = vecs.sparkSession
    val schema = graft.sources.Warehouse.Schema
    graft.sim.SimQueries.frozenModelCodes(vecs,
      s.table(s"$schema.${graft.sim.SimQueries.IvfCentroidsTable}"),
      s.table(s"$schema.${graft.sim.SimQueries.IvfAnchorsTable}"),
      s.table(s"$schema.${graft.sim.SimQueries.PqCodebooksTable}"))
  }
}
