package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.GraftQuery

/** Multimodal-column plumbing: image/audio/video as opaque BINARY payloads
  * with a typed metadata struct, plus decode / feature-extract / frame-
  * sample operators.
  *
  * The corpus has no real media, so the payload is the document's UTF-8
  * bytes and the "decode" is a deterministic stand-in (byte histogram) —
  * clearly marked STUB. Everything AROUND the stub is the real design:
  * payloads stay BinaryType end-to-end, metadata lives in a
  * pruned-friendly struct, the stub decode is a native codegen'd
  * expression ([[graft.functions.ByteHistogram]] — rows never cross the
  * encoder boundary; a REAL decoder needing a native lib would swap in
  * as `mapPartitions`/`mapInPandas` at the same column), and frame
  * sampling is a vectorized explode, never a driver loop.
  */
object MultimodalQueries {

  /** The media view: payload BINARY + media_type + typed metadata struct.
    * Spark `cast(string as binary)` = UTF-8 bytes = DuckDB
    * `CAST(text AS BLOB)`, so byte lengths and checksums agree.
    */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("meta", struct(
        (lit(64) + col("doc_id") % 7).cast("int").as("width"),
        (lit(48) + col("doc_id") % 5).cast("int").as("height"),
        (lit(8000) + (col("doc_id") % 3) * 4000).cast("int").as("sample_rate"),
        (col("n_bytes") / lit(100.0)).as("duration_s")))

  /** Catalog projection: struct-field pruning + per-type stats. */
  val catalog: GraftQuery = GraftQuery(
    "multimodal_catalog",
    "binary payload + metadata struct: per-type size/duration rollup",
    MultimodalOracle.catalogSql) { (s, d) =>
    media(s, d)
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("meta.width")).as("min_width"),
        max(col("meta.sample_rate")).as("max_sample_rate"),
        (sum(graft.api.Det.quantize(col("meta.duration_s"))) /
          lit(graft.api.Det.pow10(4))).as("total_duration_s"))
      .orderBy("media_type")
  }

  /** Frame sampling for "video" payloads: every 10th frame of a derived
    * frame count — vectorized explode(sequence), one output row per kept
    * frame, fully distributed.
    */
  val frameSample: GraftQuery = GraftQuery(
    "multimodal_frame_sample",
    "video frame sampling: explode(sequence) every 10th frame + frame ts",
    MultimodalOracle.frameSampleSql) { (s, d) =>
    media(s, d)
      .filter(col("media_type") === "video")
      .withColumn("n_frames", (col("n_bytes") % 96 + lit(5)).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(10))))
      .select(
        col("doc_id"),
        col("n_frames"),
        col("frame_idx"),
        (col("frame_idx") / lit(24.0)).as("frame_ts_s"))
      .orderBy("doc_id", "frame_idx")
  }

  /** STUB DECODER: the native codegen'd [[graft.functions.ByteHistogram]]
    * expression produces a 16-bin byte histogram as the stand-in feature
    * vector — one fused loop per row that stays inside WholeStageCodegen
    * (PlanSpec pins: no DeserializeToObject in this plan). A REAL
    * image/audio decoder (JNI, native lib, Arrow-batched Python UDF) would
    * swap in via `mapPartitions` over iterators at exactly this column —
    * only the bytes->features function is fake; the schema, partitioning,
    * and fixed-length output are the production shape. The stub is
    * deterministic and SQL-expressible, so it carries a full DuckDB
    * oracle: each h_k is count(byte >> 4 == k) / n_bytes, an exact
    * small-integer division that is bit-identical IEEE754 on both engines.
    */
  val features: GraftQuery = GraftQuery(
    "multimodal_features",
    "stub decode via native ByteHistogram expression, flattened h0..h15",
    MultimodalOracle.featuresSql) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    // flatten to scalar columns: the driver's check (pandas) can't hash
    // array cells, and a fixed-width feature vector IS a wide row
    media(s, d)
      .withColumn("features", call_function("byte_histogram", col("payload")))
      .select(col("doc_id") +:
        (0 until 16).map(i => element_at(col("features"), i + 1).as(s"h$i")): _*)
      .orderBy("doc_id")
  }

  /** Perceptual near-dup bucketing over the DECODED features — the
    * multimodal analogue of SimHash banding: each payload's byte histogram
    * (the same native [[graft.functions.ByteHistogram]] decode as
    * `multimodal_features`) is quantized to a coarse 16-digit code
    * (floor(h_k*64+0.5)), payloads sharing a code are near-dup candidates,
    * and candidate generation is a plain groupBy on the code — the pair
    * space is never materialized (same inverted-bucket discipline as every
    * other dedup operator). With a real image decoder the histogram
    * becomes a pHash and the query is byte-for-byte the production
    * perceptual-dedup shape.
    */
  val phashBuckets: GraftQuery = GraftQuery(
    "multimodal_phash_buckets",
    "perceptual dedup: quantized byte-histogram codes, buckets with >1 asset",
    MultimodalOracle.phashBucketsSql) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    media(s, d)
      .withColumn("features", call_function("byte_histogram", col("payload")))
      .withColumn("sig", array_join(
        transform(col("features"),
          h => floor(h * lit(64.0) + lit(0.5)).cast("long").cast("string")),
        "-"))
      .groupBy(col("media_type"), col("sig"))
      .agg(
        count(lit(1)).as("n_assets"),
        min(col("doc_id")).as("keep_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_assets") > 1)
      .orderBy(desc("n_assets"), col("media_type"), col("sig"))
      .limit(20)
  }

  /** Thumbnail crop length (bytes). */
  val ThumbBytes = 256
  /** Thumbnail target width (pixels in the stand-in metadata). */
  val ThumbWidth = 32

  /** Resize stub: crop the payload to [[ThumbBytes]] bytes and rescale the
    * metadata to width [[ThumbWidth]] (aspect-preserving integer height).
    * The byte crop is the deterministic stand-in for a real resampler —
    * the REAL parts are the binary-typed substring (payload bytes never
    * leave BinaryType), the checksum over the derived payload (the
    * provenance a thumbnail cache keys on), and the struct rewrite. One
    * narrow map plan, no shuffle before the presentation sort.
    */
  val thumbnail: GraftQuery = GraftQuery(
    "multimodal_thumbnail",
    s"resize stub: crop payload to $ThumbBytes bytes + scaled metadata + checksum",
    MultimodalOracle.thumbnailSql) { (s, d) =>
    media(s, d)
      .withColumn("thumb", substring(col("payload"), 1, ThumbBytes))
      .select(
        col("doc_id"), col("media_type"),
        col("n_bytes").as("n_bytes_in"),
        length(col("thumb")).cast("long").as("n_bytes_out"),
        md5(col("thumb")).as("checksum"),
        lit(ThumbWidth).as("thumb_width"),
        floor((col("meta.height") * ThumbWidth) / col("meta.width"))
          .cast("int").as("thumb_height"))
      .orderBy("doc_id")
  }

  def all: Seq[GraftQuery] =
    Seq(catalog, frameSample, features, phashBuckets, thumbnail)
}
