package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance of the file-skipping index — the ingest-time
  * half of the layout family's story
  * ([[graft.layout.LayoutQueries.zorderPruning]] builds the same index
  * as a batch artifact): as clustered rows arrive, the per-cell
  * min/max/count stats a writer persists next to each file are kept
  * current by a plain streaming aggregation.
  *
  * Scale/semantics: min, max and count all merge COMMUTATIVELY, so the
  * maintained index is exact under any micro-batch split and any
  * arrival order — no watermark, no custom keyed state; the state store
  * holds one small row per cell (the file-slot space, ≤ 2^FilePrefixBits
  * per table), not per ingested row. This is why real lakehouse writers
  * can keep file stats transactionally up to date at any ingest rate:
  * the index is a pure semigroup fold. StreamingSpec asserts batch
  * parity across a mid-stream split.
  */
object LayoutStreams {

  /** Per-cell skipping stats over an arriving (cell, x, pk) row stream:
    * exactly the per-file index the batch layout queries evaluate
    * predicates against, maintained incrementally.
    */
  def cellStats(rows: DataFrame): DataFrame =
    rows.groupBy(col("cell"))
      .agg(
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
        count(lit(1)).as("n_rows"))
}
