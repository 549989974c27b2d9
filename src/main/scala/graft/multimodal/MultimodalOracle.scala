package graft.multimodal

/** DuckDB twins of [[MultimodalQueries]]. `CAST(text AS BLOB)` = UTF-8
  * bytes = Spark `cast(string as binary)`, so octet_length matches.
  * SUM(BIGINT) is HUGEINT in DuckDB -> cast back to BIGINT for dtype
  * parity.
  */
object MultimodalOracle {

  private val mediaCte: String = """
    m AS (
      SELECT doc_id,
        (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
        octet_length(CAST(text AS BLOB)) AS n_bytes,
        CAST(64 + doc_id % 7 AS INTEGER) AS width,
        CAST(48 + doc_id % 5 AS INTEGER) AS height,
        CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        octet_length(CAST(text AS BLOB)) / 100.0 AS duration_s
      FROM documents
    )"""

  val catalogSql: String = s"""
    WITH $mediaCte
    SELECT media_type,
      COUNT(*) AS n,
      CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      MIN(width) AS min_width,
      MAX(sample_rate) AS max_sample_rate,
      SUM(CAST(floor(duration_s * 10000.0 + 0.5) AS BIGINT)) / 10000.0
        AS total_duration_s
    FROM m
    GROUP BY media_type ORDER BY media_type"""

  /** Thumbnail twin: the byte crop re-expressed over `text` characters
    * (pure-ASCII corpus: substring chars == payload bytes, and DuckDB's
    * VARCHAR md5 over the cropped text equals Spark's BINARY md5 over the
    * cropped UTF-8 payload). Height scaling is floor of an exact-int
    * double division on both engines.
    */
  def thumbnailSql: String = {
    import MultimodalQueries.{ThumbBytes, ThumbWidth}
    s"""
    WITH $mediaCte
    SELECT m.doc_id, media_type,
      CAST(n_bytes AS BIGINT) AS n_bytes_in,
      CAST(octet_length(CAST(substring(text, 1, $ThumbBytes) AS BLOB)) AS BIGINT)
        AS n_bytes_out,
      md5(substring(text, 1, $ThumbBytes)) AS checksum,
      $ThumbWidth AS thumb_width,
      CAST(floor((height * $ThumbWidth) / width) AS INTEGER) AS thumb_height
    FROM m JOIN documents d ON m.doc_id = d.doc_id
    ORDER BY m.doc_id"""
  }

  /** Oracle for the stub decoder: the 16-bin byte histogram re-expressed
    * over the characters of `text`. Valid because the corpus is pure ASCII
    * (synthetic single-spaced lowercase latin words), where UTF-8 byte i ==
    * codepoint of character i and octet_length == length — so
    * `ord(substr(text, i, 1)) >> 4` is exactly Spark's `payload(i) >> 4`.
    * Each h_k is a small-int count divided by the byte count: both engines
    * compute the same exact IEEE754 quotient.
    */
  val featuresSql: String = {
    val hs = (0 until 16).map { k =>
      s"len(list_filter(bins, x -> x = $k)) / CAST(greatest(n, 1) AS DOUBLE) AS h$k"
    }.mkString(",\n      ")
    s"""
    WITH t AS (
      SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n FROM documents
    ),
    b AS (
      SELECT doc_id, n,
        list_transform(range(1, CAST(n + 1 AS BIGINT)),
          i -> ord(substr(text, CAST(i AS INTEGER), 1)) >> 4) AS bins
      FROM t
    )
    SELECT doc_id,
      $hs
    FROM b ORDER BY doc_id"""
  }

  /** Perceptual-bucket twin: the features histogram quantized to the same
    * 16-digit code. floor(h*64+0.5) sees identical IEEE754 operands in the
    * same order on both engines (h is an exact small-int quotient), and
    * BIGINT->VARCHAR formatting agrees, so codes match byte-for-byte.
    */
  val phashBucketsSql: String = s"""
    WITH t AS (
      SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n FROM documents
    ),
    b AS (
      SELECT doc_id, n,
        list_transform(range(1, CAST(n + 1 AS BIGINT)),
          i -> ord(substr(text, CAST(i AS INTEGER), 1)) >> 4) AS bins
      FROM t
    ),
    c AS (
      SELECT doc_id,
        (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
          AS media_type,
        array_to_string(list_transform(range(0, 16), k ->
          CAST(CAST(floor(
            len(list_filter(bins, x -> x = k))
              / CAST(greatest(n, 1) AS DOUBLE) * 64.0 + 0.5)
          AS BIGINT) AS VARCHAR)), '-') AS sig
      FROM b
    )
    SELECT media_type, sig, COUNT(*) AS n_assets,
      MIN(doc_id) AS keep_doc, MAX(doc_id) AS last_doc
    FROM c
    GROUP BY media_type, sig
    HAVING COUNT(*) > 1
    ORDER BY n_assets DESC, media_type, sig LIMIT 20"""

  val frameSampleSql: String = s"""
    WITH $mediaCte,
    v AS (
      SELECT doc_id, CAST(n_bytes % 96 + 5 AS INTEGER) AS n_frames
      FROM m WHERE media_type = 'video'
    )
    SELECT doc_id, n_frames,
      CAST(unnest(range(0, n_frames, 10)) AS INTEGER) AS frame_idx,
      CAST(unnest(range(0, n_frames, 10)) AS INTEGER) / 24.0 AS frame_ts_s
    FROM v
    ORDER BY doc_id, frame_idx"""
}
