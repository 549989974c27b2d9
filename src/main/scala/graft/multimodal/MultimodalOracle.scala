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

  /** Decoded-pixel CTE shared by the features and thumbnail twins: the
    * Spark side PARSES these values back out of the PGM header + raster it
    * encoded; the oracle recomputes them from the same formulas over
    * `text` characters. Valid because the corpus is pure ASCII (synthetic
    * single-spaced lowercase latin words): UTF-8 byte i == codepoint of
    * character i, so `ord(substr(text, i, 1))` is exactly the decoded
    * pixel `raster(i) & 0xff`.
    */
  private val pixelCte: String = """
    px AS (
      SELECT doc_id,
        (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
          AS media_type,
        CAST(64 + doc_id % 7 AS INTEGER) AS width,
        CAST(floor(octet_length(CAST(text AS BLOB)) / (64 + doc_id % 7))
          AS INTEGER) AS height,
        CAST(64 + doc_id % 7 AS INTEGER)
          * CAST(floor(octet_length(CAST(text AS BLOB)) / (64 + doc_id % 7))
            AS INTEGER) AS np,
        list_transform(
          range(1, CAST((64 + doc_id % 7)
            * floor(octet_length(CAST(text AS BLOB)) / (64 + doc_id % 7)) + 1
            AS BIGINT)),
          i -> ord(substr(text, CAST(i AS INTEGER), 1))) AS pxs
      FROM documents
    )"""

  /** Blur twin ([[MultimodalQueries.blurScore]]): interior-pixel
    * 4-neighbour Laplacians from the same byte grid, exact BIGINT sums,
    * the (n·Σx² − (Σx)²)/n² variance in one division. A `def` — the
    * threshold constant lives below MultimodalQueries' first query val
    * (the init-order lesson).
    */
  def blurScoreSql: String = {
    val thr = MultimodalQueries.BlurVarThreshold
    s"""
    WITH $pixelCte,
    l AS (
      SELECT doc_id, width, height,
        list_filter(list_transform(range(1, CAST(np + 1 AS BIGINT)),
          i -> CASE WHEN i > width AND i <= width * (height - 1)
                 AND (i - 1) % width <> 0 AND i % width <> 0
               THEN 4 * pxs[CAST(i AS INTEGER)]
                 - pxs[CAST(i - width AS INTEGER)]
                 - pxs[CAST(i + width AS INTEGER)]
                 - pxs[CAST(i - 1 AS INTEGER)]
                 - pxs[CAST(i + 1 AS INTEGER)]
               ELSE NULL END),
          x -> x IS NOT NULL) AS lap
      FROM px
      WHERE media_type = 'image' AND np > 0 AND height >= 3 AND width >= 3
    ),
    v AS (
      SELECT doc_id, width, height,
        CAST(len(lap) AS BIGINT) AS nl,
        CAST(list_aggregate(lap, 'sum') AS BIGINT) AS sl,
        CAST(list_aggregate(list_transform(lap,
          x -> CAST(x AS BIGINT) * x), 'sum') AS BIGINT) AS sll
      FROM l
    )
    SELECT doc_id, width, height, nl AS n_interior,
      CAST(nl * sll - sl * sl AS DOUBLE) / CAST(nl * nl AS DOUBLE)
        AS lap_var,
      CAST(nl * sll - sl * sl AS DOUBLE) / CAST(nl * nl AS DOUBLE)
        < $thr::DOUBLE AS blurry
    FROM v ORDER BY doc_id"""
  }

  /** Features twin: pixel stats over the decoded grid. Sums are exact
    * integer folds (HUGEINT in DuckDB, cast back), every double is one
    * exact IEEE754 division over identical integer operands.
    */
  val featuresSql: String = s"""
    WITH $pixelCte
    SELECT doc_id, media_type, width, height,
      CAST(np AS INTEGER) AS n_pixels,
      CAST(list_aggregate(pxs, 'sum') AS BIGINT) / np AS px_mean,
      CAST(list_aggregate(pxs, 'min') AS INTEGER) AS px_min,
      CAST(list_aggregate(pxs, 'max') AS INTEGER) AS px_max,
      (list_aggregate(pxs, 'max') - list_aggregate(pxs, 'min')) / 255
        AS contrast
    FROM px WHERE np > 0 ORDER BY doc_id"""

  /** Thumbnail twin: the same box-resample bucket boundaries
    * (floor(j*N/W)) and exact integer sums; DuckDB list slices are
    * 1-based inclusive, so bucket j is pxs[lo+1 : hi] — length hi-lo,
    * matching Spark's slice(pixels, lo+1, hi-lo).
    */
  /** Thumbnail near-dup twin: the [[thumbnailSql]] sample columns, the
    * identical coarse band string, window cap, and a parenthesized
    * left-associated |diff| sum matching Spark's ordered fold term for
    * term.
    */
  def thumbnailNeardupSql: String = {
    import MultimodalQueries.{NeardupBandCap, NeardupBandQ, NeardupBandW,
      NeardupMaxDist, ThumbWidth}
    val w = ThumbWidth
    val ts = (0 until w).map { j =>
      val lo = s"CAST(floor((np * $j) / $w.0) AS BIGINT)"
      val hi = s"CAST(floor((np * ${j + 1}) / $w.0) AS BIGINT)"
      s"CAST(list_aggregate(pxs[$lo + 1 : $hi], 'sum') AS BIGINT) / ($hi - $lo) AS t$j"
    }.mkString(",\n      ")
    val band = (0 until NeardupBandW)
      .map(j => s"CAST(CAST(floor(t$j / $NeardupBandQ) AS BIGINT) AS VARCHAR)")
      .mkString(" || '-' || ")
    val l1 = (0 until w).foldLeft("0.0::DOUBLE") {
      case (acc, j) => s"($acc + abs(a.t$j - b.t$j))"
    }
    s"""
    WITH $pixelCte,
    th AS (
      SELECT doc_id, media_type,
      $ts
      FROM px WHERE np >= $w
    ),
    tb AS (SELECT *, $band AS band FROM th),
    cb AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY media_type, band) AS bn
        FROM tb
      ) WHERE bn <= $NeardupBandCap
    ),
    pr AS (
      SELECT a.media_type, a.doc_id AS doc_a, b.doc_id AS doc_b,
        floor($l1 / $w.0 * 1000000000.0 + 0.5) / 1000000000.0
          AS mean_abs_diff
      FROM cb a JOIN cb b
        ON a.media_type = b.media_type AND a.band = b.band
        AND a.doc_id < b.doc_id
    )
    SELECT media_type, doc_a, doc_b, mean_abs_diff
    FROM pr WHERE mean_abs_diff <= $NeardupMaxDist
    ORDER BY mean_abs_diff, doc_a, doc_b LIMIT 20"""
  }

  def thumbnailSql: String = {
    val w = MultimodalQueries.ThumbWidth
    val ts = (0 until w).map { j =>
      val lo = s"CAST(floor((np * $j) / $w.0) AS BIGINT)"
      val hi = s"CAST(floor((np * ${j + 1}) / $w.0) AS BIGINT)"
      s"CAST(list_aggregate(pxs[$lo + 1 : $hi], 'sum') AS BIGINT) / ($hi - $lo) AS t$j"
    }.mkString(",\n      ")
    s"""
    WITH $pixelCte
    SELECT doc_id, media_type, CAST(np AS BIGINT) AS n_pixels_in,
      $ts
    FROM px WHERE np >= $w ORDER BY doc_id"""
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

  /** Gradient twin: the same row-aware neighbor-pair rule over the
    * [[pixelCte]] grid — left-pixel 1-based index i in 1..np-1, excluded
    * when i is a row end (i % width = 0). Integer list folds; each double
    * is one exact division over identical integer operands.
    */
  def gradientsSql: String = {
    val thr = MultimodalQueries.EdgeThreshold
    s"""
    WITH $pixelCte,
    d AS (
      SELECT doc_id, media_type, width, height,
        list_filter(list_transform(range(1, CAST(np AS BIGINT)),
          i -> CASE WHEN i % width = 0 THEN NULL
               ELSE abs(pxs[CAST(i + 1 AS INTEGER)]
                 - pxs[CAST(i AS INTEGER)]) END),
          x -> x IS NOT NULL) AS diffs
      FROM px WHERE np > 0
    )
    SELECT doc_id, media_type, width, height,
      CAST(len(diffs) AS BIGINT) AS n_diffs,
      CAST(list_aggregate(diffs, 'sum') AS BIGINT) / len(diffs) AS mean_grad,
      CAST(list_aggregate(diffs, 'max') AS INTEGER) AS max_grad,
      CAST(len(list_filter(diffs, x -> x >= $thr)) AS BIGINT) / len(diffs)
        AS edge_frac
    FROM d ORDER BY doc_id"""
  }

  /** Audio twin: the same byte stream from [[pixelCte]], centered-int
    * folds, one division / sqrt per output. The midline test mirrors the
    * Spark (p >= 128) boolean exactly.
    */
  def audioFeaturesSql: String = s"""
    WITH $pixelCte
    SELECT doc_id,
      CAST(np AS BIGINT) AS n_samples,
      CAST(len(list_filter(range(1, CAST(np AS BIGINT)),
        i -> (pxs[CAST(i AS INTEGER)] >= 128)
          <> (pxs[CAST(i + 1 AS INTEGER)] >= 128))) AS DOUBLE) / (np - 1)
        AS zcr,
      sqrt(CAST(list_aggregate(list_transform(pxs,
        x -> CAST((x - 128) AS BIGINT) * (x - 128)), 'sum') AS BIGINT) / np)
        AS rms,
      CAST(greatest(list_aggregate(pxs, 'max') - 128,
        128 - list_aggregate(pxs, 'min')) AS INTEGER) AS peak
    FROM px
    WHERE media_type = 'audio' AND np >= 2
    ORDER BY doc_id"""

  /** Segmentation twin: same full-frame cut, exact integer energies, the
    * multiplication-only gate, and the f - row_number islands.
    */
  def audioSegmentsSql: String = {
    val fl = MultimodalQueries.VadFrameLen
    s"""
    WITH $pixelCte,
    au AS (
      SELECT doc_id, np, pxs FROM px
      WHERE media_type = 'audio' AND np >= $fl
    ),
    ex AS (
      SELECT doc_id, np, pxs,
        unnest(range(1, CAST(np + 1 AS BIGINT))) AS i
      FROM au
    ),
    fe AS (
      SELECT doc_id, CAST((i - 1) // $fl AS BIGINT) AS f,
        CAST(SUM(CAST((pxs[CAST(i AS INTEGER)] - 128) AS BIGINT)
          * (pxs[CAST(i AS INTEGER)] - 128)) AS BIGINT) AS e
      FROM ex WHERE (i - 1) // $fl < np // $fl
      GROUP BY 1, 2
    ),
    act AS (
      SELECT doc_id, f, e,
        CAST(COUNT(*) OVER w AS BIGINT) AS n_frames,
        CAST(SUM(e) OVER w AS BIGINT) AS te
      FROM fe WINDOW w AS (PARTITION BY doc_id)
    ),
    ac2 AS (SELECT *, e * n_frames * 2 > te AS active FROM act),
    sg AS (
      SELECT doc_id,
        f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS grp
      FROM ac2 WHERE active
    ),
    sl AS (SELECT doc_id, grp, COUNT(*) AS seg_len FROM sg GROUP BY 1, 2),
    sa AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        CAST(MAX(seg_len) AS BIGINT) AS longest_segment
      FROM sl GROUP BY 1
    ),
    ro AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active
      FROM ac2 GROUP BY 1
    )
    SELECT ro.doc_id, n_frames, n_active,
      n_active / n_frames AS active_frac,
      COALESCE(sa.n_segments, 0) AS n_segments,
      COALESCE(sa.longest_segment, 0) AS longest_segment
    FROM ro LEFT JOIN sa ON ro.doc_id = sa.doc_id
    ORDER BY ro.doc_id"""
  }

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

  /** Scene-cut twin: the same per-row(frame) integer luma sums over the
    * byte stream (DuckDB list slices are 1-based inclusive: row r covers
    * pxs[r*w+1 : r*w+w]), the same exact-integer cut test, one division
    * per reported double.
    */
  def sceneCutsSql: String = {
    val t = MultimodalQueries.CutThreshold
    s"""
    WITH $pixelCte,
    scf AS (
      SELECT doc_id, width, height,
        list_transform(range(0, CAST(height AS BIGINT)),
          r -> CAST(list_aggregate(
            pxs[CAST(r * width + 1 AS INTEGER) : CAST(r * width + width AS INTEGER)],
            'sum') AS BIGINT)) AS rs
      FROM px WHERE media_type = 'video' AND height >= 2
    ),
    scd AS (
      SELECT doc_id, width, height,
        list_transform(range(1, CAST(height AS BIGINT)),
          i -> abs(rs[CAST(i + 1 AS INTEGER)] - rs[CAST(i AS INTEGER)]))
          AS deltas
      FROM scf
    )
    SELECT doc_id, height AS n_frames, width AS frame_width,
      CAST(len(list_filter(deltas, x -> x >= $t * width)) AS BIGINT)
        AS n_cuts,
      CAST(list_aggregate(deltas, 'max') AS BIGINT) / width AS max_delta,
      CAST(list_aggregate(deltas, 'sum') AS BIGINT) / ((height - 1) * width)
        AS mean_abs_delta
    FROM scd ORDER BY doc_id"""
  }

  /** Cross-modal audit twin: composes [[graft.dedup.DedupOracle]]'s
    * DF-capped 3-gram pair CTEs (the `pairs` CTE) with the
    * [[graft.sim.SimOracle]] ordered-fold cosine — cm-prefixed CTE names
    * so neither family's names collide.
    */
  def crossmodalSql: String = {
    import graft.dedup.{DedupOracle, DedupQueries}
    import graft.sim.SimOracle
    val j = s"${DedupQueries.ClusterJaccard}::DOUBLE"
    val c = s"${MultimodalQueries.CrossModalCosine}::DOUBLE"
    s"""
    WITH ${DedupOracle.ngramPairCtes},
    cmv AS (
      SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cmn AS (
      SELECT vec_id, v, sqrt(${SimOracle.dotIdx("v", "v")}) AS nrm FROM cmv
    ),
    cmd AS (
      SELECT p.doc_a, p.doc_b, d.lang AS lang_a
      FROM pairs p JOIN documents d ON p.doc_a = d.doc_id
      WHERE p.jaccard >= $j
    ),
    cmcos AS (
      SELECT p.lang_a,
        ${SimOracle.dotIdx("x.v", "y.v")} / (x.nrm * y.nrm) AS cosine
      FROM cmd p
      JOIN cmn x ON p.doc_a = x.vec_id
      JOIN cmn y ON p.doc_b = y.vec_id
    )
    SELECT * FROM (
      SELECT 'doc_total' AS "check", lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang
      UNION ALL
      SELECT 'doc_no_vec', lang, CAST(COUNT(*) AS BIGINT)
      FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
      GROUP BY lang
      UNION ALL
      SELECT 'vec_no_doc', '(none)', CAST(COUNT(*) AS BIGINT)
      FROM embeddings e
      WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
      UNION ALL
      SELECT 'dup_pair', lang_a, CAST(COUNT(*) AS BIGINT)
      FROM cmd GROUP BY lang_a
      UNION ALL
      SELECT 'dup_pair_disagree', lang_a, CAST(COUNT(*) AS BIGINT)
      FROM cmcos WHERE cosine < $c
      GROUP BY lang_a
    )
    ORDER BY "check", lang"""
  }

  /** Spectral twin: the same thumbnail buckets, then each re/im as the
    * IDENTICAL left-associated 32-term chain of sample x 6-decimal
    * coefficient literal (decimal parsing is correctly rounded, so both
    * engines hold bit-identical coefficient doubles), powers and the
    * dominant-bin CASE in the same shape.
    */
  def spectralSql: String = {
    val w = MultimodalQueries.ThumbWidth
    def lit6(x: Double) =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(x))
    def form(coef: IndexedSeq[Double]): String =
      (0 until w).map(n => s"t$n * ${lit6(coef(n))}").mkString(" + ")
    val ts = (0 until w).map { j =>
      val lo = s"CAST(floor((np * $j) / $w.0) AS BIGINT)"
      val hi = s"CAST(floor((np * ${j + 1}) / $w.0) AS BIGINT)"
      s"CAST(list_aggregate(pxs[$lo + 1 : $hi], 'sum') AS BIGINT) / ($hi - $lo) AS t$j"
    }.mkString(",\n      ")
    val powers = (0 until MultimodalQueries.SpectralBins).map { k =>
      val re = form(MultimodalQueries.SpectralCos(k))
      val im = form(MultimodalQueries.SpectralSin(k))
      s"($re) * ($re) + ($im) * ($im) AS p${k + 1}"
    }.mkString(",\n      ")
    s"""
    WITH $pixelCte,
    t AS (
      SELECT doc_id, $ts
      FROM px WHERE media_type = 'audio' AND np >= $w
    ),
    p AS (
      SELECT doc_id, $powers
      FROM t
    )
    SELECT doc_id, p1, p2, p3, p4,
      CASE WHEN p1 >= p2 AND p1 >= p3 AND p1 >= p4 THEN 1
           WHEN p2 >= p3 AND p2 >= p4 THEN 2
           WHEN p3 >= p4 THEN 3 ELSE 4 END AS dominant_bin
    FROM p ORDER BY doc_id"""
  }

  /** Cross-modal twin: pixels from text characters (the [[pixelCte]]
    * contract), the query histogram recomputed relationally from the
    * literal string (independent of the Spark side's driver projection),
    * LSH bucket/probes as the shared 3-decimal plane literals, cosines
    * as the ordered fold — serve rank, truth rank, and the hit grade all
    * replayed CTE-for-CTE.
    */
  def textToAssetSql: String = {
    import graft.sim.{SimFns, SimOracle}
    val q = MultimodalQueries.XmodalQuery
    val qn = q.getBytes("UTF-8").length
    s"""
    WITH $pixelCte,
    sig AS MATERIALIZED (
      SELECT doc_id, media_type,
        list_transform(range(0, ${SimFns.Dims}), k ->
          len(list_filter(pxs, x -> (x >> 2) = k)) / CAST(np AS DOUBLE))
          AS v
      FROM px WHERE np > 0
    ),
    qh AS (
      SELECT list_transform(range(0, ${SimFns.Dims}), k ->
        len(list_filter(range(1, ${qn + 1}),
          i -> (ord(substr('$q', CAST(i AS INTEGER), 1)) >> 2) = k))
          / CAST($qn AS DOUBLE)) AS qv
    ),
    scored AS MATERIALIZED (
      SELECT doc_id, media_type,
        ${SimOracle.dotIdx("qv", "v")}
          / (sqrt(${SimOracle.dotIdx("qv", "qv")})
             * sqrt(${SimOracle.dotIdx("v", "v")})) AS cosine,
        ${SimOracle.bucketExpr("v")} AS bucket
      FROM sig, qh
    ),
    truth AS (SELECT doc_id FROM scored ORDER BY cosine DESC, doc_id LIMIT 10),
    qb AS (SELECT ${SimOracle.bucketExpr("qv")} AS b FROM qh),
    served AS (
      SELECT s.doc_id, s.media_type, s.cosine,
        ROW_NUMBER() OVER (ORDER BY s.cosine DESC, s.doc_id) AS rn
      FROM scored s, qb
      WHERE list_contains(${SimOracle.probeList("qb.b")}, s.bucket)
    )
    SELECT CAST(rn AS INTEGER) AS rn, doc_id, media_type, cosine,
      EXISTS (SELECT 1 FROM truth t WHERE t.doc_id = served.doc_id) AS hit
    FROM served WHERE rn <= 10 ORDER BY rn"""
  }
}
