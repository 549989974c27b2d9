package graft.events

/** DuckDB twins of [[EventQueries]]. time_bucket's default origin
  * (2000-01-03) and Spark's window origin (1970-01-01) are both multiples
  * of 10 minutes, so bucket starts agree. Session semantics: Spark's
  * session_window merges an event into the open session while
  * ts <= last_ts + gap — INCLUSIVE at the boundary (a session's candidate
  * window [ts, ts+gap] is merged when its start equals the open end;
  * StreamingSpec pins this empirically) — and ends a session gap after
  * its last event; the lag/cumsum SQL mirrors both rules exactly
  * (new session strictly when ts > last_ts + gap).
  */
object EventOracle {

  private val q = "SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) / 10000.0"

  /** events with ts truncated to microseconds (parity with the Spark-side
    * nanos->micros read — see [[graft.Tables.events]]).
    */
  private val evCte =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  val jsonRollupSql: String = s"""
    WITH $evCte
    SELECT event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT))
        / COUNT(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS avg_k,
      $q AS sum_value
    FROM ev
    GROUP BY event_type ORDER BY event_type"""

  val tumblingSql: String = s"""
    WITH $evCte
    SELECT
      time_bucket(INTERVAL '10 minutes', ts) AS wstart,
      time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS wend,
      event_type,
      COUNT(*) AS n,
      $q AS sum_value
    FROM ev
    GROUP BY 1, 2, 3
    ORDER BY wstart, event_type"""

  /** Sliding windows: Spark assigns event t to windows starting at the
    * hop-aligned bucket 0, 1, and 2 hops back (duration/hop = 3 windows).
    * time_bucket's 2000-01-03 origin is hop-aligned, so bucket starts
    * agree with Spark's epoch origin.
    */
  val slidingSql: String = s"""
    WITH $evCte,
    w AS (
      SELECT
        time_bucket(INTERVAL '10 minutes', ts)
          - k.k * INTERVAL '10 minutes' AS wstart,
        event_type, value
      FROM ev CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
    )
    SELECT wstart, wstart + INTERVAL '30 minutes' AS wend, event_type,
      COUNT(*) AS n,
      $q AS sum_value
    FROM w
    GROUP BY 1, 2, 3
    ORDER BY wstart, event_type"""

  val sessionsSql: String = s"""
    WITH $evCte,
    s1 AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR ts > LAG(ts) OVER w + INTERVAL '6 hours' THEN 1
             ELSE 0 END AS new_s
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s2 AS (
      SELECT user_id, ts, value,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM s1
    )
    SELECT user_id,
      MIN(ts) AS session_start,
      MAX(ts) + INTERVAL '6 hours' AS session_end,
      COUNT(*) AS n,
      $q AS sum_value
    FROM s2
    GROUP BY user_id, sid
    ORDER BY user_id, session_start"""

  val asOfJoinSql: String = s"""
    WITH $evCte,
    e2 AS (
      SELECT event_id, user_id,
        DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS as_of_date
      FROM ev
    ),
    o AS (
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        o_totalprice
      FROM orders
    ),
    j AS (
      SELECT e2.event_id, e2.user_id, e2.as_of_date,
        o.o_orderkey, o.o_date, o.o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY e2.event_id
          ORDER BY o.o_date DESC, o.o_orderkey DESC) AS rn
      FROM e2 LEFT JOIN o
        ON e2.user_id = o.o_custkey AND o.o_date <= e2.as_of_date
    )
    SELECT event_id, user_id, as_of_date, o_orderkey, o_date, o_totalprice
    FROM j WHERE rn = 1 ORDER BY event_id"""

  val rangeJoinSql: String = s"""
    WITH $evCte,
    bands AS (
      SELECT * FROM (VALUES
        ('nano', 0.0::DOUBLE, 5.0::DOUBLE),
        ('small', 5.0::DOUBLE, 25.0::DOUBLE),
        ('mid', 25.0::DOUBLE, 100.0::DOUBLE),
        ('large', 100.0::DOUBLE, 250.0::DOUBLE),
        ('huge', 250.0::DOUBLE, 1000000000.0::DOUBLE)) b(band, lo, hi)
    )
    SELECT band, lo, COUNT(*) AS n, $q AS sum_value
    FROM ev JOIN bands ON value >= lo AND value < hi
    GROUP BY band, lo
    ORDER BY lo"""

  /** Oracle for the SALTED two-stage aggregation is the PLAIN single-stage
    * GROUP BY — the rewrite must be exactly semantics-preserving (the
    * quantized-long partials are associative, so it is).
    */
  val saltedRollupSql: String = s"""
    WITH $evCte
    SELECT user_id, COUNT(*) AS n, $q AS sum_value
    FROM ev
    GROUP BY user_id ORDER BY user_id"""

  /** Bradley-Terry twin: replays the pair mining (exact quantized-LONG
    * comparisons, ties filtered) and the FULL MM loop — each unrolled
    * round recomputes the 1e-9-quantized denominators, the re-quantized
    * update, and the re-quantized normalization in the exact expression
    * shapes of EventQueries.btFit, so every sweep's strengths (and the
    * final ranking) reproduce bit-for-bit. A `def` (interpolates
    * BtIters — init-order rule).
    */
  def bradleyTerrySql: String = {
    val rounds = (1 to EventQueries.BtIters).map { k =>
      s"""
    d$k AS (
      SELECT c.item,
        CAST(SUM(CAST(floor(c.n / (si.s + sj.s) * 1e9 + 0.5) AS BIGINT))
          AS BIGINT) AS dq
      FROM comps c
      JOIN s${k - 1} si ON c.item = si.item
      JOIN s${k - 1} sj ON c.opp = sj.item
      GROUP BY c.item
    ),
    r$k AS (
      SELECT w.item,
        CASE WHEN d.dq > 0
          THEN floor(w.wins / (d.dq / 1e9) * 1e9 + 0.5) / 1e9 END AS s
      FROM wins w JOIN d$k d ON w.item = d.item
    ),
    t$k AS (
      SELECT CAST(SUM(CAST(floor(s * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
        AS tq
      FROM r$k
    ),
    s$k AS MATERIALIZED (
      SELECT r.item,
        floor(r.s * (ni.ni / (t.tq / 1e9)) * 1e9 + 0.5) / 1e9 AS s
      FROM r$k r, t$k t, ni
    )"""
    }.mkString(",")
    s"""
    WITH $evCte,
    put AS (
      SELECT user_id, event_type,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS vq
      FROM ev GROUP BY 1, 2
    ),
    prs AS MATERIALIZED (
      SELECT a.event_type AS ta, b.event_type AS tb,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN a.vq > b.vq THEN 1 ELSE 0 END) AS BIGINT) AS wa
      FROM put a JOIN put b ON a.user_id = b.user_id
        AND a.event_type < b.event_type
      WHERE a.vq <> b.vq
      GROUP BY 1, 2
    ),
    comps AS (
      SELECT ta AS item, tb AS opp, n FROM prs
      UNION ALL
      SELECT tb, ta, n FROM prs
    ),
    wins AS (
      SELECT item, CAST(SUM(w) AS BIGINT) AS wins FROM (
        SELECT ta AS item, wa AS w FROM prs
        UNION ALL
        SELECT tb, n - wa FROM prs
      ) GROUP BY item
    ),
    ncomps AS (
      SELECT item, CAST(SUM(n) AS BIGINT) AS n_comps FROM comps
      GROUP BY item
    ),
    ni AS (SELECT CAST(COUNT(*) AS BIGINT) AS ni FROM wins),
    s0 AS MATERIALIZED (SELECT item, 1.0::DOUBLE AS s FROM wins),
    $rounds
    SELECT w.item AS event_type, w.wins, nc.n_comps, s.s AS strength,
      CAST(ROW_NUMBER() OVER (ORDER BY s.s DESC, w.item) AS BIGINT)
        AS rank
    FROM s${EventQueries.BtIters} s
    JOIN wins w ON s.item = w.item
    JOIN ncomps nc ON s.item = nc.item
    ORDER BY rank"""
  }

  /** Salted-join twin: the rewrite is semantics-preserving, so the
    * oracle is the PLAIN equi-join + rollup (the saltedRollup contract).
    */
  def saltedJoinSql: String = s"""
    WITH $evCte
    SELECT c.c_mktsegment, COUNT(*) AS n_events, $q AS sum_value
    FROM ev e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1 ORDER BY 1"""

  val interarrivalSql: String = s"""
    WITH $evCte,
    g AS (
      SELECT user_id,
        date_diff('microsecond',
          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
          AS gap_us
      FROM ev
    )
    SELECT user_id,
      COUNT(*) AS n_events,
      SUM(gap_us) / (1000000.0 * COUNT(gap_us)) AS avg_gap_s,
      MAX(gap_us) / 1000000.0 AS max_gap_s
    FROM g
    GROUP BY user_id ORDER BY user_id"""

  /** Anomaly twin: mean/variance from the same exact integer sums
    * (count, sum n, sum n^2) in the same operation order — never
    * stddev_samp, whose accumulation order varies per engine.
    */
  val anomalySql: String = s"""
    WITH $evCte,
    slots AS (
      SELECT event_type,
        time_bucket(INTERVAL '10 minutes', ts) AS wstart,
        COUNT(*) AS n
      FROM ev GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
        CAST(SUM(n) AS BIGINT) / COUNT(*) AS mean_n,
        sqrt((CAST(SUM(n * n) AS BIGINT)
            - CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS BIGINT) / COUNT(*))
          / (COUNT(*) - 1)) AS sd_n,
        COUNT(*) AS slots
      FROM slots GROUP BY event_type
    ),
    z AS (
      SELECT s.event_type, s.wstart, s.n,
        (s.n - t.mean_n) / t.sd_n AS z
      FROM slots s JOIN stats t ON s.event_type = t.event_type
      WHERE t.slots >= 2 AND t.sd_n > 0
    ),
    r AS (
      SELECT event_type, wstart, n, z,
        CAST(ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY abs(z) DESC, wstart) AS INTEGER) AS rn
      FROM z
    )
    SELECT event_type, rn, wstart, n, z
    FROM r WHERE rn <= 3
    ORDER BY event_type, rn"""

  /** Retention twin: date_trunc('week') is Monday-start on both engines;
    * day diffs between week starts are exact multiples of 7, so the /7
    * division and INT cast agree.
    */
  val retentionSql: String = s"""
    WITH $evCte,
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM ev
    ),
    f AS (
      SELECT user_id, min(aw) AS cohort_week FROM a GROUP BY user_id
    )
    SELECT f.cohort_week,
      CAST(date_diff('day', f.cohort_week, a.aw) / 7 AS INTEGER)
        AS week_offset,
      COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset"""

  /** Funnel twin: the same three conditional-min stages as CTEs; lag stats
    * are exact microsecond longs divided once (identical double division).
    */
  val funnelSql: String = s"""
    WITH $evCte,
    v AS (
      SELECT user_id, min(ts) AS t_view FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT
      COUNT(v.t_view) AS n_view,
      COUNT(c.t_click) AS n_click,
      COUNT(p.t_purchase) AS n_purchase,
      COUNT(p.t_purchase) / COUNT(v.t_view) AS conv_rate,
      SUM(date_diff('microsecond', v.t_view, p.t_purchase))
        / (1000000.0 * COUNT(p.t_purchase)) AS avg_lag_s
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id"""

  /** Funnel-latency twin: same v/c/p chain as [[funnelSql]], exact
    * rank-based quantile picks at ceil(q*n) with q*n forced DOUBLE
    * (decimal-vs-double ceil disagrees at exact multiples).
    */
  val funnelLatencySql: String = {
    def pick(p: String, name: String) =
      s"MAX(CASE WHEN rn = CAST(CEIL($p::DOUBLE * n) AS BIGINT) " +
        s"THEN lat END) AS $name"
    s"""
    WITH $evCte,
    v AS (
      SELECT user_id, min(ts) AS t_view FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT p.user_id,
        epoch_us(p.t_purchase) - epoch_us(v.t_view) AS lat
      FROM p JOIN v ON p.user_id = v.user_id
    ),
    r AS (
      SELECT lat,
        ROW_NUMBER() OVER (ORDER BY lat, user_id) AS rn,
        COUNT(*) OVER () AS n
      FROM lat
    )
    SELECT MAX(n) AS n_converted,
      ${pick("0.25", "p25_micros")},
      ${pick("0.5", "p50_micros")},
      ${pick("0.75", "p75_micros")},
      ${pick("0.9", "p90_micros")},
      CAST(SUM(lat) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mean_micros
    FROM r"""
  }

  /** Conversion-path twin: the funnel chain bounds each converting
    * user's walk; the ordered list aggregation carries the same
    * (ts, event_id) ORDER BY the Spark struct sort encodes; identical
    * 8-step truncation with the explicit truncated flag.
    */
  def conversionPathsSql: String = {
    val k = EventQueries.PathMaxSteps
    s"""
    WITH $evCte,
    v AS (
      SELECT user_id, min(ts) AS t_view FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    ),
    b AS (
      SELECT p.user_id, v.t_view, p.t_purchase
      FROM p JOIN v ON p.user_id = v.user_id
    ),
    wk AS (
      SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_steps,
        array_to_string(
          (list(e.event_type ORDER BY e.ts, e.event_id))[1:$k], '>') AS path
      FROM ev e JOIN b ON e.user_id = b.user_id
        AND e.ts >= b.t_view AND e.ts <= b.t_purchase
      GROUP BY e.user_id
    ),
    bp AS (
      SELECT path, n_steps > $k AS truncated,
        CAST(COUNT(*) AS BIGINT) AS n_users
      FROM wk GROUP BY 1, 2
    )
    SELECT path, truncated, n_users,
      n_users / SUM(n_users) OVER () AS share
    FROM bp ORDER BY n_users DESC, path, truncated LIMIT 20"""
  }

  /** Gap-fill: time_bucket's 2000-01-03 origin and Spark's 1970-01-01
    * window origin are both 15-minute-aligned, so slots agree. The mean is
    * (quantized sum)/count on both sides — identical double division.
    */
  val gapFillSql: String = s"""
    WITH $evCte,
    sa AS (
      SELECT event_type,
        time_bucket(INTERVAL '15 minutes', ts) AS slot,
        COUNT(*) AS n_events,
        $q AS sum_value
      FROM ev GROUP BY 1, 2
    ),
    b AS (SELECT min(slot) AS lo, max(slot) AS hi FROM sa),
    g AS (
      SELECT t.event_type, gs.slot
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL '15 minutes')) AS slot
        FROM b) gs
    )
    SELECT g.event_type, g.slot,
      COALESCE(sa.n_events, 0) AS n_events,
      last_value(sa.sum_value / sa.n_events IGNORE NULLS) OVER (
        PARTITION BY g.event_type ORDER BY g.slot
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
      sa.n_events IS NULL AS is_gap
    FROM g LEFT JOIN sa
      ON g.event_type = sa.event_type AND g.slot = sa.slot
    ORDER BY g.event_type, g.slot"""

  /** Daily-distinct twin: exact counts; the sketch column is an
    * attestation (TRUE expected — the oracle checks the HLL contract
    * held, not the sketch bits, per the approxDistinctSql convention).
    */
  val dailyDistinctSql: String = s"""
    WITH $evCte
    SELECT date_trunc('day', ts) AS day,
      COUNT(*) AS n_events,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      TRUE AS users_est_ok
    FROM ev GROUP BY 1 ORDER BY day"""

  /** Weekly sketch-rollup twin: exact weekly counts; the merged-sketch
    * estimate is attested in-band on the Spark side (the
    * [[dailyDistinctSql]] convention), so the oracle pins TRUE — what it
    * DOES verify exactly is the week/day bucketing, the event totals and
    * the exact weekly cardinality the sketch is graded against.
    */
  val weeklySketchRollupSql: String = s"""
    WITH $evCte
    SELECT date_trunc('week', ts) AS week,
      CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
      COUNT(*) AS n_events,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      TRUE AS merged_est_ok
    FROM ev GROUP BY 1 ORDER BY week"""

  /** Markov twin: same (ts, event_id) lag ordering, bounded matrix,
    * exact-integer probability division.
    */
  val markovTransitionsSql: String = s"""
    WITH $evCte,
    tr AS (
      SELECT prev, event_type, COUNT(*) AS n FROM (
        SELECT event_type,
          LAG(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM ev
      ) WHERE prev IS NOT NULL
      GROUP BY prev, event_type
    ),
    tot AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS tn FROM tr GROUP BY prev)
    SELECT tr.prev, tr.event_type AS next, tr.n, tr.n / t.tn AS p
    FROM tr JOIN tot t USING (prev)
    ORDER BY prev, next"""

  /** Trigram twin: two LEADs under the same user window, |types|³
    * aggregate, global-window share (BIGINT/BIGINT -> one double
    * division on both engines).
    */
  val sequenceTrigramsSql: String = s"""
    WITH $evCte,
    tg AS (
      SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT event_type AS e1,
          LEAD(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS e2,
          LEAD(event_type, 2) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS e3
        FROM ev
      ) WHERE e3 IS NOT NULL
      GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, n,
      n / CAST(SUM(n) OVER () AS BIGINT) AS share
    FROM tg
    ORDER BY n DESC, e1, e2, e3 LIMIT 15"""

  /** Attribution twin: the PURE interval predicate (no bucket pruning —
    * proving the Spark side's bucketed mine is exactly equivalent), then
    * the same (v_tm DESC, view_id DESC) pick and left join back to all
    * clicks. Lags are exact microsecond BIGINTs.
    */
  def attributionSql: String = {
    val w = EventQueries.AttributionWindowMicros
    s"""
    WITH $evCte,
    v AS (
      SELECT event_id AS view_id, user_id, ts AS view_ts, epoch_us(ts) AS v_tm
      FROM ev WHERE event_type = 'view'
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts, epoch_us(ts) AS c_tm
      FROM ev WHERE event_type = 'click'
    ),
    cand AS (
      SELECT c.click_id, v.view_id, v.view_ts, v.v_tm, c.c_tm
      FROM c JOIN v USING (user_id)
      WHERE v.v_tm <= c.c_tm AND v.v_tm > c.c_tm - $w
    ),
    pick AS (
      SELECT click_id, view_id, view_ts, c_tm - v_tm AS lag_micros,
        ROW_NUMBER() OVER (PARTITION BY click_id
          ORDER BY v_tm DESC, view_id DESC) AS rn
      FROM cand
    )
    SELECT c.click_id, c.user_id, c.click_ts, p.view_id, p.view_ts,
      p.lag_micros
    FROM c LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p USING (click_id)
    ORDER BY click_id"""
  }

  /** Stream-stream-join batch-twin oracle: the pure interval left join —
    * every in-window pair plus one null-padded row per unattributed
    * click. Lags are exact microsecond BIGINTs; (click_id, view_id) is a
    * total order (a click never mixes null and non-null view rows).
    */
  def attributionPairsSql: String = {
    val w = EventQueries.AttributionWindowMicros
    s"""
    WITH $evCte,
    v AS (
      SELECT event_id AS view_id, user_id, ts AS view_ts, epoch_us(ts) AS v_tm
      FROM ev WHERE event_type = 'view'
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts, epoch_us(ts) AS c_tm
      FROM ev WHERE event_type = 'click'
    )
    SELECT c.click_id, c.user_id, c.click_ts, v.view_id, v.view_ts,
      c.c_tm - v.v_tm AS lag_micros
    FROM c LEFT JOIN v ON c.user_id = v.user_id
      AND v.v_tm <= c.c_tm AND v.v_tm > c.c_tm - $w
    ORDER BY click_id, view_id"""
  }

  /** Audience-overlap twin: exact per-type distincts, exact pairwise
    * intersections and Jaccard; the sketch attestation pins TRUE (the
    * [[dailyDistinctSql]] convention — bits differ per engine, the band
    * check runs on the Spark side where HLL's sparse regime makes it
    * hard at these cardinalities).
    */
  def audienceOverlapSql: String = s"""
    WITH $evCte,
    du AS (SELECT DISTINCT event_type, user_id FROM ev),
    nd AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd FROM du GROUP BY 1
    ),
    xi AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
        CAST(COUNT(*) AS BIGINT) AS exact_inter
      FROM du x JOIN du y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2
    ),
    pr AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        a.nd AS users_a, b.nd AS users_b
      FROM nd a JOIN nd b ON a.event_type < b.event_type
    )
    SELECT pr.type_a, pr.type_b, pr.users_a, pr.users_b,
      COALESCE(xi.exact_inter, 0) AS exact_inter,
      COALESCE(xi.exact_inter, 0)
        / (pr.users_a + pr.users_b - COALESCE(xi.exact_inter, 0)) AS jaccard,
      TRUE AS est_ok
    FROM pr LEFT JOIN xi
      ON pr.type_a = xi.type_a AND pr.type_b = xi.type_b
    ORDER BY pr.type_a, pr.type_b"""

  /** SLO-burn twin: identical hourly tumbling counts, single exact-LONG
    * share divisions, 1e-6-quantized burn, and the same cumulative
    * window for the running budget.
    */
  def sloBurnSql: String = {
    import EventQueries.{SloPageBurn, SloTarget}
    s"""
    WITH $evCte,
    h AS (
      SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_errors
      FROM ev GROUP BY 1
    ),
    r AS (
      SELECT hour, n_events, n_errors,
        n_errors / n_events AS err_share,
        floor(n_errors / n_events / $SloTarget::DOUBLE * 1000000.0 + 0.5)
          / 1000000.0 AS burn_rate,
        CAST(SUM(n_errors) OVER (ORDER BY hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_err,
        CAST(SUM(n_events) OVER (ORDER BY hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_ev
      FROM h
    )
    SELECT hour, n_events, n_errors, err_share, burn_rate,
      burn_rate >= $SloPageBurn::DOUBLE AS page,
      floor(cum_err / ($SloTarget::DOUBLE * cum_ev) * 1000000.0 + 0.5)
        / 1000000.0 AS budget_consumed
    FROM r ORDER BY hour"""
  }

  /** LTV twin: the retention chain carrying 4dp-quantized value, the
    * same cumulative window over age within a cohort.
    */
  def cohortLtvSql: String = s"""
    WITH $evCte,
    ew AS (
      SELECT user_id, date_trunc('week', ts) AS aw,
        CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vq
      FROM ev
    ),
    fw AS (SELECT user_id, MIN(aw) AS cohort_week FROM ew GROUP BY user_id),
    cs AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM fw GROUP BY 1),
    cells AS (
      SELECT f.cohort_week,
        CAST(date_diff('day', f.cohort_week, e.aw) / 7 AS INTEGER)
          AS age_weeks,
        COUNT(DISTINCT e.user_id) AS n_active,
        CAST(SUM(e.vq) AS BIGINT) AS wq
      FROM ew e JOIN fw f USING (user_id)
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT c.cohort_week, c.age_weeks, s.cohort_size, c.n_active, c.wq,
        CAST(SUM(c.wq) OVER (PARTITION BY c.cohort_week ORDER BY c.age_weeks
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cumq
      FROM cells c JOIN cs s USING (cohort_week)
    )
    SELECT cohort_week, age_weeks, cohort_size, n_active,
      wq / 10000.0 AS week_value,
      cumq / 10000.0 AS cum_value,
      cumq / 10000.0 / cohort_size AS ltv_per_user
    FROM cum ORDER BY cohort_week, age_weeks"""

  /** A/B twin: identical hash60 arm assignment over the stringified
    * user id, exact-LONG per-user totals and sums-of-squares, the same
    * double recompositions for mean/variance/t — including the same
    * explicit degenerate-arm guards (mean n>0, variance n>1, uplift
    * mean_a≠0, t se²>0 — each NULL otherwise; DuckDB's IEEE division
    * would otherwise give ±Inf/NaN where Spark gives NULL) and the same
    * overflow raise when a per-user total's square would exceed BIGINT.
    */
  def abTestSql: String = s"""
    WITH $evCte,
    pu AS (
      SELECT user_id,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS uq,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM ev GROUP BY user_id
    ),
    pq AS (
      SELECT user_id, uq, arm,
        CASE WHEN abs(uq) > 3037000499
          THEN CAST(error('events_ab_test: per-user total overflows the '
            || 'ssq quantum') AS BIGINT)
          ELSE uq * uq END AS uq2
      FROM pu
    ),
    ag AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 0 THEN uq ELSE 0 END) AS BIGINT) AS sa,
        CAST(SUM(CASE WHEN arm = 1 THEN uq ELSE 0 END) AS BIGINT) AS sb,
        CAST(SUM(CASE WHEN arm = 0 THEN uq2 ELSE 0 END) AS BIGINT) AS qa,
        CAST(SUM(CASE WHEN arm = 1 THEN uq2 ELSE 0 END) AS BIGINT) AS qb
      FROM pq
    ),
    st AS (
      SELECT n_a, n_b,
        CASE WHEN n_a > 0 THEN sa / 10000.0 / n_a END AS mean_a,
        CASE WHEN n_b > 0 THEN sb / 10000.0 / n_b END AS mean_b,
        CASE WHEN n_a > 1 THEN
          (qa / 100000000.0 - (sa / 10000.0) * (sa / 10000.0) / n_a)
            / (n_a - 1) END AS var_a,
        CASE WHEN n_b > 1 THEN
          (qb / 100000000.0 - (sb / 10000.0) * (sb / 10000.0) / n_b)
            / (n_b - 1) END AS var_b
      FROM ag
    ),
    se AS (
      SELECT st.*, var_a / n_a + var_b / n_b AS se2 FROM st
    )
    SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
      CASE WHEN mean_a IS NOT NULL AND mean_a <> 0 AND mean_b IS NOT NULL
        THEN (mean_b - mean_a) / mean_a END AS uplift,
      CASE WHEN se2 > 0 THEN
        floor((mean_b - mean_a) / sqrt(se2) * 1000000.0 + 0.5)
          / 1000000.0 END AS t_stat
    FROM se"""

  /** SCD2 twin: the same lag-change-detection + row_number/lead interval
    * chaining over (ts, event_id) ordering.
    */
  /** Relational twin of the [[graft.sources.Warehouse.mergeTable]]-driven
    * SCD2 maintenance ([[EventQueries.scd2Merge]]): the v1 dimension over
    * the non-delta events, the restatement delta (every version of every
    * TOUCHED user, re-derived over the full feed), the upsert algebra
    * (v1 rows whose key the delta doesn't claim, union the delta), and a
    * row-level full-outer comparison against the from-scratch dimension.
    * The Spark side reads its merged rows back from the WAREHOUSE TABLE
    * (the physical attestation); this twin replays the same algebra
    * relationally, so a hash match proves the persisted merge equals the
    * recompute column-for-column.
    */
  def scd2MergeSql: String = {
    val mod = EventQueries.Scd2DeltaMod
    def dim(name: String, src: String) = s"""
    ${name}ch AS (
      SELECT user_id, ts, event_id, event_type,
        LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_type
      FROM $src
    ),
    ${name}cr AS (
      SELECT user_id, ts, event_id, event_type FROM ${name}ch
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    $name AS (
      SELECT user_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS INTEGER) AS version,
        event_type AS state,
        ts AS valid_from,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS valid_to,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          AS is_current
      FROM ${name}cr
    )"""
    s"""
    WITH $evCte,
    evold AS (SELECT * FROM ev WHERE event_id % $mod <> 0),
    ${dim("odim", "evold")},
    ${dim("fdim", "ev")},
    tu AS (
      SELECT DISTINCT user_id FROM ev WHERE event_id % $mod = 0
    ),
    delta AS MATERIALIZED (
      SELECT f.* FROM fdim f JOIN tu USING (user_id)
    ),
    merged AS MATERIALIZED (
      SELECT o.* FROM odim o
      WHERE NOT EXISTS (
        SELECT 1 FROM delta d
        WHERE d.user_id = o.user_id AND d.version = o.version)
      UNION ALL
      SELECT * FROM delta
    ),
    cmp AS (
      SELECT COALESCE(m.user_id, f.user_id) AS uid,
        CASE WHEN m.user_id IS NULL OR f.user_id IS NULL
          OR m.state IS DISTINCT FROM f.state
          OR m.valid_from IS DISTINCT FROM f.valid_from
          OR m.valid_to IS DISTINCT FROM f.valid_to
          OR m.is_current IS DISTINCT FROM f.is_current
        THEN 1 ELSE 0 END AS bad
      FROM merged m
      FULL JOIN fdim f
        ON m.user_id = f.user_id AND m.version = f.version
    ),
    agg AS (
      SELECT user_id, COUNT(*) AS n_versions,
        MAX(CASE WHEN is_current THEN state END) AS current_state
      FROM merged GROUP BY user_id
    ),
    ok AS (
      SELECT uid, SUM(bad) = 0 AS merge_ok FROM cmp GROUP BY uid
    )
    SELECT a.user_id, a.n_versions, a.current_state, ok.merge_ok
    FROM agg a JOIN ok ON ok.uid = a.user_id
    ORDER BY a.user_id"""
  }

  /** Autocorrelation twin: the dense hourly grid (generate_series = the
    * Spark sequence-explode), one exact mean, per-product 1e-6
    * quantization before every sum, ratio quantized to 1e-6 — identical
    * expression shapes throughout.
    */
  def autocorrSql: String = {
    val maxLag = EventQueries.AcfMaxLag
    s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    x AS (
      SELECT epoch_us(g.hour) // 3600000000 AS t, COALESCE(ha.n, 0) AS n
      FROM g LEFT JOIN ha ON g.hour = ha.hour
    ),
    st AS (
      SELECT CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean
      FROM x
    ),
    dv AS MATERIALIZED (
      SELECT t, CAST(n AS DOUBLE) - (SELECT mean FROM st) AS d FROM x
    ),
    dn AS (
      SELECT SUM(CAST(FLOOR(d * d * 1e6 + 0.5) AS BIGINT)) AS den FROM dv
    ),
    lg AS (SELECT unnest(generate_series(1, $maxLag)) AS lag),
    np AS (
      SELECT lg.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        SUM(CAST(FLOOR(a.d * b.d * 1e6 + 0.5) AS BIGINT)) AS num
      FROM lg
      CROSS JOIN dv a
      JOIN dv b ON b.t = a.t + lg.lag
      GROUP BY lg.lag
    )
    SELECT lag, n_pairs,
      CASE WHEN (SELECT den FROM dn) > 0 THEN
        FLOOR(CAST(num AS DOUBLE) / CAST((SELECT den FROM dn) AS DOUBLE)
          * 1e6 + 0.5) / 1e6
      END AS acf
    FROM np ORDER BY lag"""
  }

  /** CCF twin: same dense grid and quantized-product recipe as the ACF
    * twin, two series, denominator = sqrt of the product of both
    * deviation energies.
    */
  def crosscorrSql: String = {
    val maxLag = EventQueries.CcfMaxLag
    s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          AS BIGINT) AS nv,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS np
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    x AS (
      SELECT epoch_us(g.hour) // 3600000000 AS t,
        COALESCE(ha.nv, 0) AS nv, COALESCE(ha.np, 0) AS np
      FROM g LEFT JOIN ha ON g.hour = ha.hour
    ),
    st AS (
      SELECT CAST(SUM(nv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mv,
        CAST(SUM(np) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mp
      FROM x
    ),
    dv AS MATERIALIZED (
      SELECT t,
        CAST(nv AS DOUBLE) - (SELECT mv FROM st) AS dv,
        CAST(np AS DOUBLE) - (SELECT mp FROM st) AS dp
      FROM x
    ),
    dn AS (
      SELECT SUM(CAST(FLOOR(dv * dv * 1e6 + 0.5) AS BIGINT)) AS env,
        SUM(CAST(FLOOR(dp * dp * 1e6 + 0.5) AS BIGINT)) AS enp
      FROM dv
    ),
    lg AS (SELECT unnest(generate_series(0, $maxLag)) AS lag),
    np AS (
      SELECT lg.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        SUM(CAST(FLOOR(a.dv * b.dp * 1e6 + 0.5) AS BIGINT)) AS num
      FROM lg
      CROSS JOIN dv a
      JOIN dv b ON b.t = a.t + lg.lag
      GROUP BY lg.lag
    )
    SELECT lag, n_pairs,
      CASE WHEN (SELECT env FROM dn) > 0 AND (SELECT enp FROM dn) > 0 THEN
        FLOOR(CAST(num AS DOUBLE)
          / SQRT(CAST((SELECT env FROM dn) AS DOUBLE)
            * CAST((SELECT enp FROM dn) AS DOUBLE))
          * 1e6 + 0.5) / 1e6
      END AS ccf
    FROM np ORDER BY lag"""
  }

  /** CUSUM twin: same dense grid, 1e-9 rate quantization, exact-LONG
    * prefix sums and running mins (the max(0,·) recursion unrolled as
    * P - min(0, running min P)), sqrt is IEEE correctly-rounded on both
    * engines.
    */
  def cusumSql: String = {
    val k = EventQueries.CusumSlackSigmas
    val h = EventQueries.CusumThresholdSigmas
    s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          AS BIGINT) AS ne
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    xq AS MATERIALIZED (
      SELECT g.hour, rate,
        CAST(FLOOR(rate * 1e9 + 0.5) AS BIGINT) AS rq
      FROM (
        SELECT g.hour,
          CASE WHEN COALESCE(ha.n, 0) = 0 THEN 0.0::DOUBLE
            ELSE CAST(ha.ne AS DOUBLE) / CAST(ha.n AS DOUBLE) END AS rate
        FROM g LEFT JOIN ha ON g.hour = ha.hour
      ) g
    ),
    st AS (
      SELECT CAST(SUM(rq) AS DOUBLE) / 1e9 / CAST(COUNT(*) AS DOUBLE)
        AS mean, COUNT(*) AS nh
      FROM xq
    ),
    vr AS (
      SELECT SQRT(CAST(SUM(CAST(FLOOR(
          (rate - (SELECT mean FROM st)) * (rate - (SELECT mean FROM st))
          * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e9 / CAST((SELECT nh FROM st) AS DOUBLE)) AS sigma
      FROM xq
    ),
    pr AS (
      SELECT
        CAST(FLOOR(((SELECT mean FROM st) + $k * (SELECT sigma FROM vr))
          * 1e9 + 0.5) AS BIGINT) AS up_ref,
        CAST(FLOOR(((SELECT mean FROM st) - $k * (SELECT sigma FROM vr))
          * 1e9 + 0.5) AS BIGINT) AS dn_ref,
        CAST(FLOOR($h * (SELECT sigma FROM vr) * 1e9 + 0.5) AS BIGINT)
          AS hq
    ),
    c AS (
      SELECT hour, rq,
        SUM(rq - (SELECT up_ref FROM pr)) OVER w AS pu,
        SUM((SELECT dn_ref FROM pr) - rq) OVER w AS pd
      FROM xq
      WINDOW w AS (ORDER BY hour
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    sc AS (
      SELECT hour, rq,
        pu - LEAST(0, MIN(pu) OVER w) AS su,
        pd - LEAST(0, MIN(pd) OVER w) AS sd
      FROM c
      WINDOW w AS (ORDER BY hour
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT hour, rq / 1e9 AS rate, su / 1e9 AS cusum_up,
      sd / 1e9 AS cusum_down,
      su > (SELECT hq FROM pr) AS alarm_up,
      sd > (SELECT hq FROM pr) AS alarm_down
    FROM sc ORDER BY hour"""
  }

  /** STL twin: dense grid, the same 25h centered ROWS frame (shrinking
    * symmetrically at the edges), 1e-6-quantized detrended values before
    * the per-hod seasonal means, and the CUSUM recursion unrolled over
    * the deseasonalized series exactly as [[cusumSql]] — every double is
    * recomposed from exact LONG sums in the same operand order.
    */
  def stlDecomposeSql: String = {
    val w = EventQueries.StlHalfWindow
    val k = EventQueries.CusumSlackSigmas
    val h = EventQueries.CusumThresholdSigmas
    s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    x AS MATERIALIZED (
      SELECT g.hour, COALESCE(ha.n, 0) AS n
      FROM g LEFT JOIN ha ON g.hour = ha.hour
    ),
    t AS MATERIALIZED (
      SELECT hour, n,
        CAST(SUM(n) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE)
          AS trend
      FROM x
      WINDOW w AS (ORDER BY hour
        ROWS BETWEEN $w PRECEDING AND $w FOLLOWING)
    ),
    d AS MATERIALIZED (
      SELECT hour, n, trend,
        CAST(n AS DOUBLE) - trend AS d,
        CAST(FLOOR((CAST(n AS DOUBLE) - trend) * 1e6 + 0.5) AS BIGINT)
          AS dq,
        date_part('hour', hour) AS hod
      FROM t
    ),
    se AS (
      SELECT hod,
        CAST(SUM(dq) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE)
          AS seasonal
      FROM d GROUP BY hod
    ),
    r AS MATERIALIZED (
      SELECT d.hour, d.n, d.trend, se.seasonal,
        CAST(FLOOR((d.d - se.seasonal) * 1e6 + 0.5) AS BIGINT) / 1e6
          AS remainder,
        CAST(d.n AS DOUBLE) - se.seasonal AS xv,
        CAST(FLOOR((CAST(d.n AS DOUBLE) - se.seasonal) * 1e6 + 0.5)
          AS BIGINT) AS xq
      FROM d JOIN se USING (hod)
    ),
    st AS (
      SELECT CAST(SUM(xq) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE)
        AS mean, COUNT(*) AS nh
      FROM r
    ),
    vr AS (
      SELECT SQRT(CAST(SUM(CAST(FLOOR(
          (xv - (SELECT mean FROM st)) * (xv - (SELECT mean FROM st))
          * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e6 / CAST((SELECT nh FROM st) AS DOUBLE)) AS sigma
      FROM r
    ),
    pr AS (
      SELECT
        CAST(FLOOR(((SELECT mean FROM st) + $k * (SELECT sigma FROM vr))
          * 1e6 + 0.5) AS BIGINT) AS up_ref,
        CAST(FLOOR(((SELECT mean FROM st) - $k * (SELECT sigma FROM vr))
          * 1e6 + 0.5) AS BIGINT) AS dn_ref,
        CAST(FLOOR($h * (SELECT sigma FROM vr) * 1e6 + 0.5) AS BIGINT)
          AS hq
    ),
    c AS (
      SELECT hour, n, trend, seasonal, remainder, xq,
        SUM(xq - (SELECT up_ref FROM pr)) OVER w AS pu,
        SUM((SELECT dn_ref FROM pr) - xq) OVER w AS pd
      FROM r
      WINDOW w AS (ORDER BY hour
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    sc AS (
      SELECT hour, n, trend, seasonal, remainder, xq,
        pu - LEAST(0, MIN(pu) OVER w) AS su,
        pd - LEAST(0, MIN(pd) OVER w) AS sd
      FROM c
      WINDOW w AS (ORDER BY hour
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT hour, n, trend, seasonal, remainder,
      xq / 1e6 AS deseason,
      su / 1e6 AS cusum_up, sd / 1e6 AS cusum_down,
      su > (SELECT hq FROM pr) AS alarm_up,
      sd > (SELECT hq FROM pr) AS alarm_down
    FROM sc ORDER BY hour"""
  }

  /** Dedup twin: the same replicated feed, keep-one-per-id replayed as
    * a ROW_NUMBER pick (duplicates are byte-identical, so any pick is
    * the same row), per-type rollups over feed and survivors.
    */
  def streamDedupSql: String = {
    val mod = EventQueries.DedupReplayMod
    s"""
    WITH $evCte,
    feed AS (
      SELECT * FROM ev
      UNION ALL
      SELECT * FROM ev WHERE event_id % $mod = 0
    ),
    fin AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_feed
      FROM feed GROUP BY event_type
    ),
    dd AS (
      SELECT event_type, value FROM (
        SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY event_id) AS rn
        FROM feed
      ) WHERE rn = 1
    ),
    uq AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique,
        $q AS sum_value
      FROM dd GROUP BY event_type
    )
    SELECT f.event_type, f.n_feed, u.n_unique,
      f.n_feed - u.n_unique AS n_dropped, u.sum_value
    FROM fin f JOIN uq u USING (event_type)
    ORDER BY f.event_type"""
  }

  /** Backtest twin: dense grid, the same cut arithmetic, hod models
    * from the train prefix only, the Holt-Winters level as the same
    * truncated 1e-9-quantized SES kernel over the deseasonalized train
    * tail, exact forecasts/errors, MAEs from 1e-6-quantized error sums.
    */
  def forecastBacktestSql: String = {
    val bh = EventQueries.BacktestHours
    val alpha = s"${EventQueries.HwAlpha}::DOUBLE"
    val dec = s"${1.0 - EventQueries.HwAlpha}::DOUBLE"
    val hwCut = EventQueries.HwKernelCut
    s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    x AS MATERIALIZED (
      SELECT g.hour, COALESCE(ha.n, 0) AS n,
        date_part('hour', g.hour) AS hod
      FROM g LEFT JOIN ha ON g.hour = ha.hour
    ),
    ct AS (SELECT max(hour) - INTERVAL '${bh - 1} hours' AS cut FROM x),
    train AS (SELECT x.* FROM x, ct WHERE hour < cut),
    test AS (SELECT x.* FROM x, ct WHERE hour >= cut),
    sm AS (
      SELECT hod,
        CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fc_smean
      FROM train GROUP BY hod
    ),
    nv AS (
      SELECT hod, CAST(n AS DOUBLE) AS fc_naive
      FROM train, ct WHERE hour >= cut - INTERVAL '24 hours'
    ),
    gg AS (
      SELECT CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_g,
        COUNT(*) AS t_train, max(hour) AS tmax
      FROM train
    ),
    lvl AS (
      SELECT gg.mean_g,
        SUM(CAST(FLOOR(
          ((CAST(t.n AS DOUBLE) - (sm.fc_smean - gg.mean_g))
            * (FLOOR(CASE WHEN date_diff('hour', t.hour, gg.tmax)
                  = gg.t_train - 1
                THEN pow($dec, date_diff('hour', t.hour, gg.tmax))
                ELSE $alpha * pow($dec, date_diff('hour', t.hour, gg.tmax))
                END * 1e9 + 0.5) / 1e9))
          * 1e6 + 0.5) AS BIGINT)) / 1e6 AS level
      FROM train t JOIN sm USING (hod) CROSS JOIN gg
      WHERE date_diff('hour', t.hour, gg.tmax) <= $hwCut
      GROUP BY gg.mean_g
    ),
    scored AS MATERIALIZED (
      SELECT t.hour, t.n, nv.fc_naive, sm.fc_smean,
        lvl.level + (sm.fc_smean - lvl.mean_g) AS fc_hw,
        abs(CAST(t.n AS DOUBLE) - nv.fc_naive) AS ae_naive,
        abs(CAST(t.n AS DOUBLE) - sm.fc_smean) AS ae_smean,
        abs(CAST(t.n AS DOUBLE)
          - (lvl.level + (sm.fc_smean - lvl.mean_g))) AS ae_hw
      FROM test t JOIN sm USING (hod) JOIN nv USING (hod) CROSS JOIN lvl
    ),
    mae AS (
      SELECT
        CAST(SUM(CAST(FLOOR(ae_naive * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
          / 1e6 / CAST(COUNT(*) AS DOUBLE) AS mae_naive,
        CAST(SUM(CAST(FLOOR(ae_smean * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
          / 1e6 / CAST(COUNT(*) AS DOUBLE) AS mae_smean,
        CAST(SUM(CAST(FLOOR(ae_hw * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
          / 1e6 / CAST(COUNT(*) AS DOUBLE) AS mae_hw
      FROM scored
    )
    SELECT s.hour, s.n, s.fc_naive, s.fc_smean, s.fc_hw,
      s.ae_naive, s.ae_smean, s.ae_hw,
      m.mae_naive, m.mae_smean, m.mae_hw,
      CASE WHEN m.mae_hw <= m.mae_naive AND m.mae_hw <= m.mae_smean
             THEN 'holt_winters'
           WHEN m.mae_smean <= m.mae_naive THEN 'seasonal_mean'
           ELSE 'seasonal_naive' END AS winner
    FROM scored s, mae m ORDER BY s.hour"""
  }

  /** Conformal twin ([[EventQueries.forecastConformalFrame]]): same
    * dense grid and window cuts, hod-mean model from the train prefix,
    * rank-(ceil((n+1)(1-alpha))) calibration residual as the radius
    * (the product forced ::DOUBLE on both engines), exact interval
    * bounds and coverage.
    */
  def forecastConformalSql: String = {
    val bh = EventQueries.BacktestHours
    val ch = EventQueries.ConformalCalHours
    val keep = s"${1.0 - EventQueries.ConformalAlpha}::DOUBLE"
    s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    x AS MATERIALIZED (
      SELECT g.hour, COALESCE(ha.n, 0) AS n,
        date_part('hour', g.hour) AS hod
      FROM g LEFT JOIN ha ON g.hour = ha.hour
    ),
    ct AS (
      SELECT max(hour) - INTERVAL '${bh - 1} hours' AS test_lo,
        max(hour) - INTERVAL '${bh + ch - 1} hours' AS cal_lo
      FROM x
    ),
    train AS (SELECT x.* FROM x, ct WHERE hour < cal_lo),
    cal AS (SELECT x.* FROM x, ct WHERE hour >= cal_lo AND hour < test_lo),
    test AS (SELECT x.* FROM x, ct WHERE hour >= test_lo),
    sm AS (
      SELECT hod,
        CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fc
      FROM train GROUP BY hod
    ),
    resid AS (
      SELECT abs(CAST(c.n AS DOUBLE) - sm.fc) AS r
      FROM cal c JOIN sm USING (hod)
    ),
    qq AS (
      SELECT r AS q_conf, nc AS n_cal FROM (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rk,
          COUNT(*) OVER () AS nc
        FROM resid
      ) WHERE rk = LEAST(CEIL((nc + 1) * $keep), nc)
    ),
    scored AS MATERIALIZED (
      SELECT t.hour, t.n, sm.fc, qq.q_conf, qq.n_cal,
        sm.fc - qq.q_conf AS lo, sm.fc + qq.q_conf AS hi,
        CAST(t.n AS DOUBLE) >= sm.fc - qq.q_conf
          AND CAST(t.n AS DOUBLE) <= sm.fc + qq.q_conf AS covered
      FROM test t JOIN sm USING (hod) CROSS JOIN qq
    )
    SELECT s.hour, s.n, s.fc, s.q_conf, s.n_cal, s.lo, s.hi, s.covered,
      c.coverage
    FROM scored s CROSS JOIN (
      SELECT CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS coverage
      FROM scored) c
    ORDER BY s.hour"""
  }

  /** Multi-touch twin: the same bucketed mine (UNION ALL replication =
    * the Spark explode), position windows, credit CASE in the identical
    * expression shape, per-touch 1e-4 quantization before the per-user
    * sums.
    */
  def multitouchSql: String = {
    val w = EventQueries.AttributionWindowMicros
    s"""
    WITH $evCte,
    v AS (
      SELECT user_id, event_id AS view_id, epoch_us(ts) AS v_tm,
        epoch_us(ts) // $w AS b0
      FROM ev WHERE event_type = 'view'
    ),
    vb AS (
      SELECT user_id, view_id, v_tm, b0 AS bucket FROM v
      UNION ALL
      SELECT user_id, view_id, v_tm, b0 + 1 AS bucket FROM v
    ),
    b AS (
      SELECT event_id AS buy_id, user_id, value, epoch_us(ts) AS b_tm,
        epoch_us(ts) // $w AS bucket
      FROM ev WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT b.buy_id, b.user_id, b.value, vb.view_id, vb.v_tm
      FROM b JOIN vb ON b.user_id = vb.user_id AND b.bucket = vb.bucket
        AND vb.v_tm <= b.b_tm AND vb.v_tm > b.b_tm - $w
    ),
    c AS (
      SELECT buy_id, user_id, value, view_id, v_tm,
        ROW_NUMBER() OVER (PARTITION BY buy_id
          ORDER BY v_tm, view_id) AS rn,
        COUNT(*) OVER (PARTITION BY buy_id) AS n
      FROM t
    ),
    q AS (
      SELECT user_id, buy_id, rn, n,
        CAST(FLOOR(value * (CASE
          WHEN n = 1 THEN 1.0::DOUBLE
          WHEN n = 2 THEN 0.5::DOUBLE
          WHEN rn = 1 THEN 0.4::DOUBLE
          WHEN rn = n THEN 0.4::DOUBLE
          ELSE 0.2::DOUBLE / CAST(n - 2 AS DOUBLE) END) * 1e4 + 0.5)
          AS BIGINT) AS cq
      FROM c
    )
    SELECT user_id,
      CAST(COUNT(DISTINCT buy_id) AS BIGINT) AS n_purchases,
      CAST(COUNT(*) AS BIGINT) AS n_touches,
      SUM(CASE WHEN n = 1 THEN cq ELSE 0 END) / 1e4 AS credited_solo,
      SUM(CASE WHEN n > 1 AND rn = 1 THEN cq ELSE 0 END) / 1e4
        AS credited_first,
      SUM(CASE WHEN n > 1 AND rn = n THEN cq ELSE 0 END) / 1e4
        AS credited_last,
      SUM(CASE WHEN n > 1 AND rn > 1 AND rn < n THEN cq ELSE 0 END) / 1e4
        AS credited_mid,
      SUM(cq) / 1e4 AS credited_total
    FROM q GROUP BY user_id ORDER BY user_id"""
  }

  /** CDC-apply twin: replays the v1/delta/deletes algebra relationally
    * (the [[scd2MergeSql]] convention) — v1 = on-time latest states minus
    * churned users, touched users' rule re-evaluated over the full feed,
    * upserts unioned in and churns removed — then compares against the
    * plain recompute; cdc_ok is TRUE by that construction, and the Spark
    * side computes it genuinely from the persisted table.
    */
  def cdcApplySql: String = {
    val mod = EventQueries.Scd2DeltaMod
    val b = EventQueries.CdcBuckets
    def latest(name: String, src: String) = s"""
    ${name}rn AS (
      SELECT user_id, event_type, ts,
        ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts DESC, event_id DESC) AS rn
      FROM $src
    ),
    $name AS (
      SELECT user_id, user_id % $b AS u_bucket, event_type AS state, ts
      FROM ${name}rn WHERE rn = 1
    )"""
    s"""
    WITH $evCte,
    evold AS (SELECT * FROM ev WHERE event_id % $mod <> 0),
    ${latest("lold", "evold")},
    ${latest("lfull", "ev")},
    v1 AS (SELECT * FROM lold WHERE state <> 'error'),
    tu AS (SELECT DISTINCT user_id FROM ev WHERE event_id % $mod = 0),
    tf AS MATERIALIZED (SELECT f.* FROM lfull f JOIN tu USING (user_id)),
    delta AS (SELECT * FROM tf WHERE state <> 'error'),
    dels AS (SELECT user_id FROM tf WHERE state = 'error'),
    merged AS MATERIALIZED (
      SELECT v.* FROM v1 v
      WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.user_id = v.user_id)
        AND NOT EXISTS (SELECT 1 FROM dels x WHERE x.user_id = v.user_id)
      UNION ALL
      SELECT * FROM delta
    ),
    want AS (SELECT * FROM lfull WHERE state <> 'error'),
    cmp AS (
      SELECT COALESCE(m.user_id, w.user_id) AS uid,
        CASE WHEN m.user_id IS NULL OR w.user_id IS NULL
          OR m.u_bucket IS DISTINCT FROM w.u_bucket
          OR m.state IS DISTINCT FROM w.state
          OR m.ts IS DISTINCT FROM w.ts THEN 1 ELSE 0 END AS bad
      FROM merged m FULL JOIN want w ON m.user_id = w.user_id
    ),
    ok AS (SELECT uid, SUM(bad) = 0 AS cdc_ok FROM cmp GROUP BY uid)
    SELECT m.user_id, m.u_bucket, m.state, m.ts, ok.cdc_ok
    FROM merged m JOIN ok ON ok.uid = m.user_id
    ORDER BY m.user_id"""
  }

  /** Schema-evolution twin: the logical feed is the SAME rows with k
    * defined only on the evolved slice — the physical widened-metadata
    * reads (old files lack the column entirely; the post-evolution
    * old-schema append carries typed NULLs) must aggregate identically.
    */
  def cdcEvolveSql: String = {
    val lo = EventQueries.EvolveSplitLo
    val hi = EventQueries.EvolveSplitHi
    s"""
    WITH $evCte,
    f AS (
      SELECT event_type, value, CAST(ts AS DATE) AS d,
        CASE WHEN CAST(ts AS DATE) >= DATE '$lo'
              AND CAST(ts AS DATE) < DATE '$hi'
          THEN CAST(json_extract_string(props, '$$.k') AS BIGINT) END AS k
      FROM ev
    )
    SELECT
      CASE WHEN d < DATE '$lo' THEN 'pre'
           WHEN d < DATE '$hi' THEN 'evolved'
           ELSE 'post' END AS slice,
      event_type,
      COUNT(*) AS n,
      COUNT(k) AS n_k,
      CAST(SUM(k) AS BIGINT) AS sum_k,
      $q AS sum_value
    FROM f
    GROUP BY 1, 2
    ORDER BY slice, event_type"""
  }

  /** Snapshot-diff twin: v1/v2 are the on-time/full latest-state
    * derivations (the cdcApply latest rule), classified by the same
    * full-outer CASE; all four classes explicit via a VALUES spine.
    */
  def snapshotDiffSql: String = {
    val mod = EventQueries.Scd2DeltaMod
    def latest(name: String, src: String) = s"""
    ${name}rn AS (
      SELECT user_id, event_type, ts,
        ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts DESC, event_id DESC) AS rn
      FROM $src
    ),
    $name AS (
      SELECT user_id, event_type AS state, ts FROM ${name}rn WHERE rn = 1
    )"""
    s"""
    WITH $evCte,
    evold AS (SELECT * FROM ev WHERE event_id % $mod <> 0),
    ${latest("v1", "evold")},
    ${latest("v2", "ev")},
    cls AS (
      SELECT CASE WHEN a.user_id IS NULL THEN 'added'
                  WHEN b.user_id IS NULL THEN 'removed'
                  WHEN a.state IS DISTINCT FROM b.state
                    OR a.ts IS DISTINCT FROM b.ts THEN 'changed'
                  ELSE 'unchanged' END AS diff_class
      FROM v1 a FULL JOIN v2 b ON a.user_id = b.user_id
    ),
    cnt AS (SELECT diff_class, COUNT(*) AS n0 FROM cls GROUP BY 1)
    SELECT c.diff_class, CAST(COALESCE(cnt.n0, 0) AS BIGINT) AS n_users
    FROM (VALUES ('added'), ('changed'), ('removed'), ('unchanged'))
      c(diff_class)
    LEFT JOIN cnt USING (diff_class)
    ORDER BY diff_class"""
  }

  /** Retention-churn twin: deleting exact (user_id, version) rows of the
    * published dimension IS the retention filter, so the replay is the
    * filter itself over the same SCD2 derivation; churn_ok TRUE by
    * construction, computed genuinely on the Spark side.
    */
  def scd2ChurnSql: String = {
    val cut = EventQueries.Scd2RetentionCutoff
    s"""
    WITH $evCte,
    ch AS (
      SELECT user_id, ts, event_id, event_type,
        LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_type
      FROM ev
    ),
    cr AS (
      SELECT user_id, ts, event_id, event_type FROM ch
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    fdim AS MATERIALIZED (
      SELECT user_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS INTEGER) AS version,
        event_type AS state,
        ts AS valid_from,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS valid_to,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          AS is_current
      FROM cr
    ),
    keep AS (
      SELECT * FROM fdim
      WHERE valid_to IS NULL OR valid_to >= TIMESTAMP '$cut'
    ),
    purged AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purged FROM fdim
      WHERE valid_to IS NOT NULL AND valid_to < TIMESTAMP '$cut'
      GROUP BY user_id
    ),
    agg AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_versions,
        MAX(CASE WHEN is_current THEN state END) AS current_state
      FROM keep GROUP BY user_id
    )
    SELECT a.user_id, a.n_versions,
      COALESCE(p.n_purged, CAST(0 AS BIGINT)) AS n_purged,
      a.current_state, TRUE AS churn_ok
    FROM agg a LEFT JOIN purged p USING (user_id)
    ORDER BY a.user_id"""
  }

  def scd2Sql: String = s"""
    WITH $evCte,
    ch AS (
      SELECT user_id, ts, event_id, event_type,
        LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_type
      FROM ev
    ),
    cr AS (
      SELECT user_id, ts, event_id, event_type FROM ch
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
      CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        AS INTEGER) AS version,
      event_type AS state,
      ts AS valid_from,
      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        AS is_current
    FROM cr
    ORDER BY user_id, version"""

  /** Twin of [[EventQueries.kAnonFrame]]: day-grain class sizes once,
    * week/month lattice levels as window sums over the class table, local
    * recoding by the same CASE order. 50.0 and 7.0 are exact doubles, so
    * both floors agree bit-for-bit; the released share is one BIGINT /
    * BIGINT division.
    */
  def kAnonymitySql: String = {
    val k = EventQueries.AnonK
    s"""
    WITH $evCte,
    dc AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(floor(value / ${EventQueries.AnonBandWidth}) AS BIGINT) AS band,
        COUNT(*) AS n_day
      FROM ev GROUP BY 1, 2, 3
    ),
    keyed AS (
      SELECT *,
        CAST(floor(date_diff('day',
          DATE '${EventQueries.AnonWeekAnchor}', day) / 7.0) AS BIGINT)
          AS week,
        CAST(year(day) * 12 + month(day) AS BIGINT) AS mon
      FROM dc
    ),
    leveled AS (
      SELECT event_type, n_day,
        CASE
          WHEN n_day >= $k THEN 'day'
          WHEN SUM(n_day) OVER (PARTITION BY event_type, week, band) >= $k
            THEN 'week'
          WHEN SUM(n_day) OVER (PARTITION BY event_type, mon, band) >= $k
            THEN 'month'
          ELSE 'suppressed'
        END AS level
      FROM keyed
    ),
    agg AS (
      SELECT event_type, level,
        CAST(SUM(n_day) AS BIGINT) AS n_rows,
        COUNT(*) AS n_day_classes
      FROM leveled GROUP BY 1, 2
    )
    SELECT event_type, level, n_rows, n_day_classes,
      n_rows / CAST(SUM(n_rows) OVER (PARTITION BY event_type) AS BIGINT)
        AS row_share
    FROM agg
    ORDER BY event_type, level"""
  }

  /** Twin of [[EventQueries.anomalyMadReadout]]: same tumbling slots,
    * per-type nearest-rank median and MAD (fractions ::DOUBLE), the
    * modified z in the identical shape, quantized-|z| top-3, exact
    * integer threshold compare.
    */
  def anomalyMadSql: String = {
    val c = s"${EventQueries.MadC}::DOUBLE"
    val fc = s"${EventQueries.MadFallbackC}::DOUBLE"
    val thrQ = (EventQueries.MadZThreshold * 1e9).toLong
    s"""
    WITH $evCte,
    slots AS (
      SELECT event_type, time_bucket(INTERVAL '10 minutes', ts) AS wstart,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, n AS med FROM (
        SELECT event_type, n,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS rk,
          COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM slots
      ) WHERE rk = floor((cnt - 1) * 0.5::DOUBLE) + 1
    ),
    dev AS (
      SELECT s.event_type, s.wstart, s.n, m.med,
        abs(s.n - m.med) AS absdev
      FROM slots s JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, absdev AS mad FROM (
        SELECT event_type, absdev,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY absdev)
            AS rk,
          COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM dev
      ) WHERE rk = floor((cnt - 1) * 0.5::DOUBLE) + 1
    ),
    ma AS (
      SELECT event_type,
        CAST(SUM(absdev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_ad
      FROM dev GROUP BY event_type
    ),
    z AS (
      SELECT d.event_type, d.wstart, d.n, d.med, a.mad, ma.mean_ad,
        CASE WHEN a.mad > 0 THEN
          CAST(FLOOR(($c * CAST(d.n - d.med AS DOUBLE)
            / CAST(a.mad AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        ELSE
          CAST(FLOOR((CAST(d.n - d.med AS DOUBLE)
            / ($fc * ma.mean_ad)) * 1e9 + 0.5) AS BIGINT)
        END AS zq
      FROM dev d JOIN mad a USING (event_type)
        JOIN ma USING (event_type)
      WHERE a.mad > 0 OR ma.mean_ad > 0
    ),
    top3 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        ORDER BY abs(zq) DESC, wstart) AS rk3
      FROM z
    )
    SELECT event_type, wstart, n, med, mad, mean_ad,
      CAST(zq AS DOUBLE) / 1e9 AS z, abs(zq) >= $thrQ AS outlier
    FROM top3 WHERE rk3 <= 3
    ORDER BY event_type, wstart"""
  }

  /** Twin of [[EventQueries.theilSenFrame]]: same dense grid and t
    * index, pairwise-slope join, nearest-rank medians (fraction forced
    * ::DOUBLE), exact-BIGINT OLS sufficient statistics.
    */
  def trendTheilSenSql: String = s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    x AS MATERIALIZED (
      SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY hour) AS BIGINT) - 1 AS t
      FROM (SELECT g.hour, COALESCE(ha.n, 0) AS n
            FROM g LEFT JOIN ha ON g.hour = ha.hour)
    ),
    sl AS (
      SELECT CAST(b.n - a.n AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS sl
      FROM x a JOIN x b ON b.t > a.t
    ),
    bts AS (
      SELECT sl AS slope_theilsen, cnt AS n_pairs FROM (
        SELECT sl, ROW_NUMBER() OVER (ORDER BY sl) AS rk,
          COUNT(*) OVER () AS cnt
        FROM sl
      ) WHERE rk = floor((cnt - 1) * 0.5::DOUBLE) + 1
    ),
    ats AS (
      SELECT ic AS intercept_theilsen FROM (
        SELECT ic, ROW_NUMBER() OVER (ORDER BY ic) AS rk,
          COUNT(*) OVER () AS cnt
        FROM (
          SELECT CAST(n AS DOUBLE)
            - (SELECT slope_theilsen FROM bts) * CAST(t AS DOUBLE) AS ic
          FROM x)
      ) WHERE rk = floor((cnt - 1) * 0.5::DOUBLE) + 1
    ),
    ols AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nh,
        CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(n) AS BIGINT) AS sy,
        CAST(SUM(t * t) AS BIGINT) AS stt,
        CAST(SUM(t * n) AS BIGINT) AS sty
      FROM x
    )
    SELECT ols.nh AS n_hours, bts.n_pairs, bts.slope_theilsen,
      ats.intercept_theilsen,
      CAST(ols.nh * ols.sty - ols.st * ols.sy AS DOUBLE)
        / CAST(ols.nh * ols.stt - ols.st * ols.st AS DOUBLE) AS slope_ols,
      (CAST(ols.sy AS DOUBLE)
        - (CAST(ols.nh * ols.sty - ols.st * ols.sy AS DOUBLE)
            / CAST(ols.nh * ols.stt - ols.st * ols.st AS DOUBLE))
          * CAST(ols.st AS DOUBLE))
        / CAST(ols.nh AS DOUBLE) AS intercept_ols
    FROM ols CROSS JOIN bts CROSS JOIN ats"""

  /** Twin of [[EventQueries.abSequentialFrame]]: identical daily arm
    * sufficient statistics (quantized LONGs), running windows, the mSPRT
    * log-likelihood in the same expression shape, 1e-9-quantized log L
    * running max, and the nonincreasing always-valid p.
    */
  def abSequentialSql: String = {
    val tau2 = s"${EventQueries.SeqTauSq}::DOUBLE"
    val alpha = s"${EventQueries.SeqAlpha}::DOUBLE"
    s"""
    WITH $evCte,
    daily AS (
      SELECT CAST(ts AS DATE) AS day,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        CAST(SUM(CASE WHEN arm = 0 THEN vq ELSE 0 END) AS BIGINT) AS sa,
        CAST(SUM(CASE WHEN arm = 1 THEN vq ELSE 0 END) AS BIGINT) AS sb,
        CAST(SUM(CASE WHEN arm = 0 THEN wq ELSE 0 END) AS BIGINT) AS qa,
        CAST(SUM(CASE WHEN arm = 1 THEN wq ELSE 0 END) AS BIGINT) AS qb
      FROM (
        SELECT ts,
          CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
            AS BIGINT) % 2 AS arm,
          CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vq,
          CAST(floor(value * value * 10000.0 + 0.5) AS BIGINT) AS wq
        FROM ev WHERE event_type = 'purchase'
      ) GROUP BY 1
    ),
    cum AS (
      SELECT day,
        CAST(SUM(na) OVER w AS BIGINT) AS n_a,
        CAST(SUM(nb) OVER w AS BIGINT) AS n_b,
        CAST(SUM(sa) OVER w AS BIGINT) AS csa,
        CAST(SUM(sb) OVER w AS BIGINT) AS csb,
        CAST(SUM(qa) OVER w AS BIGINT) AS cqa,
        CAST(SUM(qb) OVER w AS BIGINT) AS cqb
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        AND CURRENT ROW)
    ),
    ex AS (
      SELECT day, n_a, n_b,
        CASE WHEN n_a > 0 THEN CAST(csa AS DOUBLE) / 1e4
          / CAST(n_a AS DOUBLE) END AS mean_a,
        CASE WHEN n_b > 0 THEN CAST(csb AS DOUBLE) / 1e4
          / CAST(n_b AS DOUBLE) END AS mean_b,
        CAST(csa + csb AS DOUBLE) / 1e4 AS sx,
        CAST(cqa + cqb AS DOUBLE) / 1e4 AS sxx,
        n_a + n_b AS n
      FROM cum
    ),
    vx AS (
      SELECT *,
        CASE WHEN n > 2 THEN (sxx - sx * sx / CAST(n AS DOUBLE))
          / CAST(n - 1 AS DOUBLE) END AS var_pooled
      FROM ex
    ),
    lx AS (
      SELECT *,
        CASE WHEN n_a > 1 AND n_b > 1 AND var_pooled > 0 THEN
          var_pooled * (1.0::DOUBLE / CAST(n_a AS DOUBLE)
            + 1.0::DOUBLE / CAST(n_b AS DOUBLE)) END AS vv,
        mean_b - mean_a AS delta
      FROM vx
    ),
    ll AS (
      SELECT *,
        CAST(FLOOR((0.5::DOUBLE * ln(vv / (vv + $tau2))
          + delta * delta * $tau2
            / (2.0::DOUBLE * vv * (vv + $tau2))) * 1e9 + 0.5) AS BIGINT)
          AS llq
      FROM lx
    ),
    mx AS (
      SELECT *, MAX(llq) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        PRECEDING AND CURRENT ROW) AS maxllq
      FROM ll
    )
    SELECT day, n_a, n_b, mean_a, mean_b, delta, var_pooled,
      CAST(llq AS DOUBLE) / 1e9 AS log_lambda,
      CASE WHEN maxllq IS NULL OR maxllq <= 0 THEN 1.0::DOUBLE
        ELSE exp(-(CAST(maxllq AS DOUBLE) / 1e9)) END AS p_always_valid,
      CASE WHEN maxllq IS NULL OR maxllq <= 0 THEN FALSE
        ELSE exp(-(CAST(maxllq AS DOUBLE) / 1e9)) <= $alpha END AS reject
    FROM mx ORDER BY day"""
  }

  /** Twin of [[EventQueries.targetEncodingFrame]]: identical content-hash
    * fold rule, the cat×fold grid via CROSS JOIN range, and the same
    * exact-integer sufficient statistics with single-division prior and
    * m-estimate encoding.
    */
  def targetEncodingSql: String = {
    val k = EventQueries.TeFolds
    val m = EventQueries.TeSmoothing
    s"""
    WITH $evCte,
    b AS (
      SELECT user_id,
        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % $k AS fold,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS s
      FROM ev GROUP BY 1, 2
    ),
    pc AS (
      SELECT user_id, CAST(SUM(n) AS BIGINT) AS cn,
        CAST(SUM(s) AS BIGINT) AS cs
      FROM b GROUP BY 1
    ),
    pf AS (
      SELECT fold, CAST(SUM(n) AS BIGINT) AS fn,
        CAST(SUM(s) AS BIGINT) AS fs
      FROM b GROUP BY 1
    ),
    g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS gn, CAST(SUM(s) AS BIGINT) AS gs
      FROM b
    ),
    grid AS (
      SELECT pc.user_id, f.fold, pc.cn, pc.cs,
        COALESCE(b.n, 0) AS n_in_fold, COALESCE(b.s, 0) AS s_in_fold
      FROM pc
      CROSS JOIN (SELECT unnest(range(0, $k)) AS fold) f
      LEFT JOIN b ON b.user_id = pc.user_id AND b.fold = f.fold
    )
    SELECT grid.user_id, grid.fold, grid.n_in_fold,
      grid.cn - grid.n_in_fold AS oof_cnt,
      grid.cs - grid.s_in_fold AS oof_sum,
      CAST(g.gs - COALESCE(pf.fs, 0) AS DOUBLE)
        / CAST(g.gn - COALESCE(pf.fn, 0) AS DOUBLE) AS prior,
      (CAST(grid.cs - grid.s_in_fold AS DOUBLE)
        + $m * (CAST(g.gs - COALESCE(pf.fs, 0) AS DOUBLE)
            / CAST(g.gn - COALESCE(pf.fn, 0) AS DOUBLE)))
        / (CAST(grid.cn - grid.n_in_fold AS DOUBLE) + $m) AS encoding
    FROM grid LEFT JOIN pf ON pf.fold = grid.fold CROSS JOIN g
    ORDER BY grid.user_id, grid.fold"""
  }

  /** Twin of [[EventQueries.changepointBinsegFrame]]: the same dense
    * grid, three UNROLLED greedy sweeps (the kcore/pagerank fixed-sweep
    * oracle pattern), the identical first-moment gain shape quantized
    * to 1e-6 before each (gq DESC, t) argmax.
    */
  def changepointBinsegSql: String = {
    val l = EventQueries.BinsegMinSeg
    def cand(xk: String, ck: String, bk: String): String = s"""
    $ck AS (
      SELECT t, hour,
        SUM(n) OVER (PARTITION BY seg ORDER BY t
          ROWS UNBOUNDED PRECEDING) AS cum1,
        CAST(ROW_NUMBER() OVER (PARTITION BY seg ORDER BY t) AS BIGINT)
          AS i,
        CAST(SUM(n) OVER (PARTITION BY seg) AS BIGINT) AS s1,
        CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS nn
      FROM $xk
    ),
    $bk AS MATERIALIZED (
      SELECT t, hour, gq, mean_left, mean_right, n_left, n_right FROM (
        SELECT t, hour,
          CAST(FLOOR((
            CAST(cum1 AS DOUBLE) * CAST(cum1 AS DOUBLE)
              / CAST(i AS DOUBLE)
            + CAST(s1 - cum1 AS DOUBLE) * CAST(s1 - cum1 AS DOUBLE)
              / CAST(nn - i AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(nn AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS gq,
          CAST(cum1 AS DOUBLE) / CAST(i AS DOUBLE) AS mean_left,
          CAST(s1 - cum1 AS DOUBLE) / CAST(nn - i AS DOUBLE)
            AS mean_right,
          i AS n_left, CAST(nn - i AS BIGINT) AS n_right
        FROM $ck WHERE i >= $l AND nn - i >= $l
      ) ORDER BY gq DESC, t LIMIT 1
    )"""
    s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    x AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY g.hour) AS BIGINT) - 1 AS t,
        g.hour, COALESCE(ha.n, 0) AS n
      FROM g LEFT JOIN ha ON g.hour = ha.hour
    ),
    x1 AS (SELECT t, hour, n, 0 AS seg FROM x),
    ${cand("x1", "c1", "b1")},
    x2 AS (
      SELECT x.t, x.hour, x.n,
        CASE WHEN x.t > b1.t THEN 1 ELSE 0 END AS seg
      FROM x CROSS JOIN b1
    ),
    ${cand("x2", "c2", "b2")},
    x3 AS (
      SELECT x.t, x.hour, x.n,
        (CASE WHEN x.t > b1.t THEN 1 ELSE 0 END)
          + (CASE WHEN x.t > b2.t THEN 1 ELSE 0 END) AS seg
      FROM x CROSS JOIN b1 CROSS JOIN b2
    ),
    ${cand("x3", "c3", "b3")}
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS rank, t, hour,
        CAST(gq AS DOUBLE) / 1e6 AS gain, mean_left, mean_right,
        n_left, n_right FROM b1
      UNION ALL
      SELECT CAST(2 AS BIGINT), t, hour, CAST(gq AS DOUBLE) / 1e6,
        mean_left, mean_right, n_left, n_right FROM b2
      UNION ALL
      SELECT CAST(3 AS BIGINT), t, hour, CAST(gq AS DOUBLE) / 1e6,
        mean_left, mean_right, n_left, n_right FROM b3
    ) ORDER BY rank"""
  }

  /** Twin of [[EventQueries.kpiContributionFrame]]: identical
    * days x types grid, lag over observed days, exact quantized
    * contributions, and the |contrib| rank with the type tie-break.
    */
  def kpiContributionSql: String = s"""
    WITH $evCte,
    daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS vq
      FROM ev GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.day, t.event_type, COALESCE(daily.vq, 0) AS vq
      FROM (SELECT DISTINCT day FROM daily) d
      CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
      LEFT JOIN daily ON daily.day = d.day
        AND daily.event_type = t.event_type
    ),
    lagged AS (
      SELECT day, event_type, vq,
        LAG(vq) OVER (PARTITION BY event_type ORDER BY day) AS pvq
      FROM grid
    ),
    contrib AS (
      SELECT day, event_type, vq, pvq, vq - pvq AS contrib_q,
        CAST(SUM(vq - pvq) OVER (PARTITION BY day) AS BIGINT) AS delta_q
      FROM lagged WHERE pvq IS NOT NULL
    )
    SELECT day, event_type,
      vq / 10000.0 AS value,
      pvq / 10000.0 AS prev_value,
      contrib_q / 10000.0 AS contribution,
      delta_q / 10000.0 AS day_delta,
      CASE WHEN delta_q <> 0
        THEN CAST(contrib_q AS DOUBLE) / CAST(delta_q AS DOUBLE)
      END AS share_of_delta,
      CAST(ROW_NUMBER() OVER (PARTITION BY day
        ORDER BY abs(contrib_q) DESC, event_type) AS BIGINT) AS rank_in_day
    FROM contrib
    ORDER BY day, event_type"""

  /** Twin of [[EventQueries.keySkewFrame]]: identical rank windows over
    * the key-count frame, Gini/share/salt arithmetic shape-for-shape
    * (ceil cast to BIGINT to match Spark's LONG ceil).
    */
  def keySkewSql: String = {
    val p = EventQueries.SkewReducers
    s"""
    WITH $evCte,
    counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM ev GROUP BY user_id
    ),
    ranked AS (
      SELECT c,
        CAST(ROW_NUMBER() OVER (ORDER BY c, user_id) AS BIGINT) AS rk,
        CAST(ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS rkd
      FROM counts
    ),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS n_keys,
        CAST(MAX(c) AS BIGINT) AS max_cnt,
        CAST(SUM(rk * c) AS BIGINT) AS s_ic,
        CAST(SUM(CASE WHEN rkd <= 10 THEN c ELSE 0 END) AS BIGINT) AS top10
      FROM ranked
    )
    SELECT 'user_id' AS key_col, n_rows, n_keys, max_cnt,
      CAST(max_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS max_share,
      CAST(top10 AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top10_share,
      2.0::DOUBLE * CAST(s_ic AS DOUBLE)
        / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
        - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE) AS gini,
      CAST(n_rows AS DOUBLE) / $p.0::DOUBLE AS avg_per_reducer,
      CAST(CEIL(CAST(max_cnt AS DOUBLE) * $p.0::DOUBLE
        / CAST(n_rows AS DOUBLE)) AS BIGINT) AS suggested_salt,
      CAST(max_cnt AS DOUBLE) > 2.0::DOUBLE
        * (CAST(n_rows AS DOUBLE) / $p.0::DOUBLE) AS skewed
    FROM agg"""
  }

  /** Twin of [[EventQueries.dpReleaseFrame]]: identical cap/clamp chain,
    * the same seeded hash60 uniform and inverse-CDF Laplace in matching
    * expression shapes (sign/ln/abs are single IEEE calls both sides).
    */
  def dpReleaseSql: String = {
    val cap = EventQueries.ContribCap
    val eps = EventQueries.DpEpsilon
    val clamp = EventQueries.DpValueClamp
    val bC = cap.toDouble / eps
    val bS = cap * clamp / eps
    def lap(tag: String, b: Double): String = {
      val u = s"""((CAST(('0x' || substr(md5('dp19:' || event_type ||
        ':$tag'), 1, 15))::UBIGINT AS BIGINT) + 1)
        / 1152921504606846977.0)"""
      s"""(-($b::DOUBLE) * sign($u - 0.5::DOUBLE)
        * ln(1.0::DOUBLE - 2.0::DOUBLE * abs($u - 0.5::DOUBLE)))"""
    }
    s"""
    WITH $evCte,
    ranked AS (
      SELECT event_type, user_id,
        CAST(floor(GREATEST(LEAST(value, $clamp::DOUBLE), 0.0::DOUBLE)
          * 10000.0 + 0.5) AS BIGINT) AS cq,
        ROW_NUMBER() OVER (PARTITION BY event_type, user_id
          ORDER BY ts, event_id) AS rn
      FROM ev
    ),
    agg AS (
      SELECT event_type,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        CAST(COUNT(*) AS BIGINT) AS count_capped,
        CAST(SUM(cq) AS BIGINT) AS sq
      FROM ranked WHERE rn <= $cap GROUP BY event_type
    )
    SELECT event_type, n_users, count_capped,
      sq / 10000.0 AS sum_clamped,
      $eps::DOUBLE AS epsilon_each,
      ${2 * eps}::DOUBLE AS epsilon_total,
      CAST($cap AS BIGINT) AS sens_count,
      ${cap * clamp}::DOUBLE AS sens_sum,
      ${lap("count", bC)} AS noise_count,
      CAST(count_capped AS DOUBLE) + ${lap("count", bC)}
        AS released_count,
      ${lap("sum", bS)} AS noise_sum,
      sq / 10000.0 + ${lap("sum", bS)} AS released_sum
    FROM agg
    ORDER BY event_type"""
  }

  /** Twin of [[EventQueries.pitTrainingFrame]]: running snapshots under
    * the identical (ts, event_id) total order, the strictly-before
    * as-of pick with the same tie-break, the identical hash60 fold, and
    * the target-encoding chain re-derived for the te_user join.
    */
  def pitTrainingSql: String = {
    val k = EventQueries.TeFolds
    val m = EventQueries.TeSmoothing
    s"""
    WITH $evCte,
    evq AS (
      SELECT event_id, user_id, ts, event_type,
        CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vq
      FROM ev
    ),
    feats AS (
      SELECT user_id AS f_user, ts AS f_ts, event_id AS f_event_id,
        CAST(COUNT(*) OVER w AS BIGINT) AS f_cnt,
        CAST(SUM(vq) OVER w AS BIGINT) AS f_vq
      FROM evq
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    labels AS (
      SELECT event_id AS label_id, user_id, ts AS label_ts,
        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % $k AS fold,
        CAST(vq AS DOUBLE) / 10000.0 AS label_value
      FROM evq WHERE event_type = 'purchase'
    ),
    pit AS (
      SELECT * FROM (
        SELECT l.*, f.f_ts, f.f_cnt, f.f_vq,
          ROW_NUMBER() OVER (PARTITION BY l.label_id
            ORDER BY f.f_ts DESC, f.f_event_id DESC) AS rn
        FROM labels l
        LEFT JOIN feats f
          ON f.f_user = l.user_id AND f.f_ts < l.label_ts
      ) WHERE rn = 1
    ),
    b AS (
      SELECT user_id,
        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % $k AS fold,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS s
      FROM ev GROUP BY 1, 2
    ),
    pc AS (
      SELECT user_id, CAST(SUM(n) AS BIGINT) AS cn,
        CAST(SUM(s) AS BIGINT) AS cs
      FROM b GROUP BY 1
    ),
    pf AS (
      SELECT fold, CAST(SUM(n) AS BIGINT) AS fn,
        CAST(SUM(s) AS BIGINT) AS fs
      FROM b GROUP BY 1
    ),
    g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS gn, CAST(SUM(s) AS BIGINT) AS gs
      FROM b
    ),
    enc AS (
      SELECT pc.user_id, f.fold,
        (CAST(pc.cs - COALESCE(b.s, 0) AS DOUBLE)
          + $m * (CAST(g.gs - COALESCE(pf.fs, 0) AS DOUBLE)
              / CAST(g.gn - COALESCE(pf.fn, 0) AS DOUBLE)))
          / (CAST(pc.cn - COALESCE(b.n, 0) AS DOUBLE) + $m) AS te_user
      FROM pc
      CROSS JOIN (SELECT unnest(range(0, $k)) AS fold) f
      LEFT JOIN b ON b.user_id = pc.user_id AND b.fold = f.fold
      LEFT JOIN pf ON pf.fold = f.fold
      CROSS JOIN g
    )
    SELECT p.label_id, p.user_id, p.label_ts, p.fold, p.label_value,
      p.f_ts AS feat_ts, p.f_cnt AS feat_cnt,
      CAST(p.f_vq AS DOUBLE) / 10000.0 AS feat_value_sum,
      epoch_us(p.label_ts) - epoch_us(p.f_ts) AS staleness_us,
      e.te_user
    FROM pit p
    LEFT JOIN enc e ON e.user_id = p.user_id AND e.fold = p.fold
    ORDER BY p.label_id"""
  }

  /** Twin of [[EventQueries.valueWinsorizeFrame]]: same rank window,
    * nearest-rank cut points (percentile fractions forced ::DOUBLE — the
    * DECIMAL-literal floor divergence at exact multiples), clamp, and
    * 1e-4-quantized means.
    */
  def valueWinsorizeSql: String = {
    val lo = s"${EventQueries.WinsLoPct}::DOUBLE"
    val hi = s"${EventQueries.WinsHiPct}::DOUBLE"
    s"""
    WITH $evCte,
    ranked AS (
      SELECT event_type, value,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rk,
        COUNT(*) OVER (PARTITION BY event_type) AS nn
      FROM ev
    ),
    cuts AS (
      SELECT event_type,
        MAX(CASE WHEN rk = floor((nn - 1) * $lo) + 1 THEN value END) AS p_lo,
        MAX(CASE WHEN rk = floor((nn - 1) * $hi) + 1 THEN value END) AS p_hi
      FROM ranked GROUP BY event_type
    )
    SELECT e.event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      MAX(c.p_lo) AS p_lo, MAX(c.p_hi) AS p_hi,
      CAST(SUM(CASE WHEN e.value < c.p_lo THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clamped_lo,
      CAST(SUM(CASE WHEN e.value > c.p_hi THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clamped_hi,
      CAST(SUM(CAST(floor(e.value * 1e4 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e4 / CAST(COUNT(*) AS DOUBLE) AS mean_raw,
      CAST(SUM(CAST(floor(LEAST(GREATEST(e.value, c.p_lo), c.p_hi)
          * 1e4 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e4 / CAST(COUNT(*) AS DOUBLE) AS mean_winsorized,
      CAST(SUM(CAST(floor(e.value * 1e4 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e4 / CAST(COUNT(*) AS DOUBLE)
      - CAST(SUM(CAST(floor(LEAST(GREATEST(e.value, c.p_lo), c.p_hi)
          * 1e4 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e4 / CAST(COUNT(*) AS DOUBLE) AS mean_shift
    FROM ev e JOIN cuts c USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type"""
  }

  /** Twin of [[EventQueries.lDiversityFrame]]: the same residual chain —
    * (class, sens) base, day stats, week stats over day-failed rows only,
    * month stats over week-failed rows only — CTE for CTE, all counts
    * exact BIGINTs, the share one BIGINT/BIGINT division.
    */
  def lDiversitySql: String = {
    val k = EventQueries.AnonK
    val l = EventQueries.AnonL
    s"""
    WITH $evCte,
    b0 AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(floor(value / ${EventQueries.AnonBandWidth}) AS BIGINT) AS band,
        COALESCE(CAST(floor(
          CAST(json_extract_string(props, '$$.k') AS BIGINT)
            / ${EventQueries.AnonSensWidth}.0) AS BIGINT), -1) AS sens,
        COUNT(*) AS n
      FROM ev GROUP BY 1, 2, 3, 4
    ),
    b AS (
      SELECT *,
        CAST(floor(date_diff('day',
          DATE '${EventQueries.AnonWeekAnchor}', day) / 7.0) AS BIGINT)
          AS week,
        CAST(year(day) * 12 + month(day) AS BIGINT) AS mon
      FROM b0
    ),
    cd AS (
      SELECT event_type, day, band, CAST(SUM(n) AS BIGINT) AS n_day,
        COUNT(DISTINCT sens) AS l_day
      FROM b GROUP BY 1, 2, 3
    ),
    u1 AS (
      SELECT b.* FROM b JOIN cd USING (event_type, day, band)
      WHERE NOT (cd.n_day >= $k AND cd.l_day >= $l)
    ),
    cw AS (
      SELECT event_type, week, band, CAST(SUM(n) AS BIGINT) AS n_week,
        COUNT(DISTINCT sens) AS l_week
      FROM u1 GROUP BY 1, 2, 3
    ),
    u2 AS (
      SELECT u1.* FROM u1 JOIN cw USING (event_type, week, band)
      WHERE NOT (cw.n_week >= $k AND cw.l_week >= $l)
    ),
    cm AS (
      SELECT event_type, mon, band, CAST(SUM(n) AS BIGINT) AS n_mon,
        COUNT(DISTINCT sens) AS l_mon
      FROM u2 GROUP BY 1, 2, 3
    ),
    u3 AS (
      SELECT u2.* FROM u2 JOIN cm USING (event_type, mon, band)
      WHERE NOT (cm.n_mon >= $k AND cm.l_mon >= $l)
    ),
    lv AS (
      SELECT event_type, 'day' AS level, CAST(SUM(n_day) AS BIGINT) AS n_rows,
        COUNT(*) AS n_classes, MIN(n_day) AS min_k, MIN(l_day) AS min_l
      FROM cd WHERE n_day >= $k AND l_day >= $l GROUP BY 1
      UNION ALL
      SELECT event_type, 'week', CAST(SUM(n_week) AS BIGINT),
        COUNT(*), MIN(n_week), MIN(l_week)
      FROM cw WHERE n_week >= $k AND l_week >= $l GROUP BY 1
      UNION ALL
      SELECT event_type, 'month', CAST(SUM(n_mon) AS BIGINT),
        COUNT(*), MIN(n_mon), MIN(l_mon)
      FROM cm WHERE n_mon >= $k AND l_mon >= $l GROUP BY 1
      UNION ALL
      SELECT event_type, 'suppressed', CAST(SUM(n) AS BIGINT),
        COUNT(DISTINCT (day, band)), CAST(NULL AS BIGINT),
        CAST(NULL AS BIGINT)
      FROM u3 GROUP BY 1
    )
    SELECT event_type, level, n_rows, n_classes, min_k, min_l,
      n_rows / CAST(SUM(n_rows) OVER (PARTITION BY event_type) AS BIGINT)
        AS row_share
    FROM lv
    ORDER BY event_type, level"""
  }

  /** Twin of [[EventQueries.survivalCohortsFrame]]: the survivalKmSql
    * chain with the anchor-relative cohort week threaded through and
    * every window partitioned by it.
    */
  def survivalCohortsSql: String = {
    val gap = EventQueries.KmChurnGapDays
    val zq = EventQueries.KmZeroLnQ
    s"""
    WITH $evCte,
    pu AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM ev GROUP BY 1
    ),
    cls AS (
      SELECT
        CAST(floor(date_diff('day',
          DATE '${EventQueries.AnonWeekAnchor}',
          CAST(first_ts AS DATE)) / 7.0) AS BIGINT) AS cohort,
        CAST(date_diff('day', CAST(first_ts AS DATE),
          CAST(last_ts AS DATE)) AS INTEGER) AS dur,
        CAST(last_ts AS DATE) AS last_day, COUNT(*) AS nu
      FROM pu GROUP BY 1, 2, 3
    ),
    obs AS (SELECT max(last_day) AS obs_day FROM cls),
    pd AS (
      SELECT cohort, dur,
        CAST(SUM(CASE WHEN last_day < (SELECT obs_day FROM obs) - $gap
          THEN nu ELSE 0 END) AS BIGINT) AS n_events,
        CAST(SUM(CASE WHEN last_day < (SELECT obs_day FROM obs) - $gap
          THEN 0 ELSE nu END) AS BIGINT) AS n_censored
      FROM cls GROUP BY 1, 2
    ),
    rk AS (
      SELECT cohort, dur, n_events, n_censored,
        CAST(SUM(n_events + n_censored) OVER (PARTITION BY cohort
          ORDER BY dur DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS n_risk
      FROM pd
    ),
    lq AS (
      SELECT cohort, dur, n_risk, n_events, n_censored,
        CASE WHEN n_events = 0 THEN 0
          WHEN n_events < n_risk THEN
            CAST(FLOOR(ln((n_risk - n_events) / n_risk) * 1e9 + 0.5)
              AS BIGINT)
          ELSE $zq END AS lnq
      FROM rk
    )
    SELECT cohort, dur, n_risk, n_events, n_censored,
      FLOOR(exp(SUM(lnq) OVER wa / 1e9) * 1e6 + 0.5) / 1e6 AS survival
    FROM lq
    WINDOW wa AS (PARTITION BY cohort ORDER BY dur
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY cohort, dur"""
  }

  /** Twin of [[EventQueries.didFrame]]: per-user post-minus-pre exact
    * LONG diffs, guarded squares, per-arm sufficient stats, and the
    * abTestSql mean/variance shapes at the cents quantum.
    */
  def didSql: String = {
    val b = s"TIMESTAMP '${EventQueries.CupedBoundary} 00:00:00'"
    s"""
    WITH $evCte,
    pu AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN ts >= $b
            THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
          - SUM(CASE WHEN ts < $b
            THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS dq,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM ev WHERE event_type = 'purchase' GROUP BY user_id
    ),
    pq AS (
      SELECT arm, dq,
        CASE WHEN abs(dq) > 3037000499
          THEN CAST(error('events_did: per-user diff overflows the ssq '
            || 'quantum') AS BIGINT)
          ELSE dq * dq END AS dq2
      FROM pu
    ),
    ag AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 0 THEN dq ELSE 0 END) AS BIGINT) AS sa,
        CAST(SUM(CASE WHEN arm = 1 THEN dq ELSE 0 END) AS BIGINT) AS sb,
        CAST(SUM(CASE WHEN arm = 0 THEN dq2 ELSE 0 END) AS BIGINT) AS qa,
        CAST(SUM(CASE WHEN arm = 1 THEN dq2 ELSE 0 END) AS BIGINT) AS qb
      FROM pq
    ),
    st AS (
      SELECT n_a, n_b,
        CASE WHEN n_a > 0 THEN sa / 100.0 / n_a END AS mean_d_a,
        CASE WHEN n_b > 0 THEN sb / 100.0 / n_b END AS mean_d_b,
        CASE WHEN n_a > 1 THEN
          (qa / 10000.0 - (sa / 100.0) * (sa / 100.0) / n_a)
            / (n_a - 1) END AS var_d_a,
        CASE WHEN n_b > 1 THEN
          (qb / 10000.0 - (sb / 100.0) * (sb / 100.0) / n_b)
            / (n_b - 1) END AS var_d_b
      FROM ag
    ),
    fin AS (
      SELECT st.*, mean_d_b - mean_d_a AS did,
        SQRT(var_d_a / n_a + var_d_b / n_b) AS sev
      FROM st
    )
    SELECT n_a, n_b, mean_d_a, mean_d_b, did,
      CASE WHEN sev > 0 THEN did / sev END AS t_stat
    FROM fin"""
  }

  /** Twin of [[EventQueries.funnelZtest]]: the funnelSql v/c/p chain, the
    * md5 arm rule, guarded rate divisions, the pooled-null z in the same
    * expression shape (1.0 forced DOUBLE before the 1/n terms).
    */
  def funnelZtestSql: String = s"""
    WITH $evCte,
    v AS (
      SELECT user_id, min(ts) AS t_view FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    ),
    base AS (
      SELECT v.user_id, p.t_purchase,
        CAST(('0x' || substr(md5(CAST(v.user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM v LEFT JOIN p ON v.user_id = p.user_id
    ),
    ag AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 0 AND t_purchase IS NOT NULL THEN 1
          ELSE 0 END) AS BIGINT) AS k_a,
        CAST(SUM(CASE WHEN arm = 1 AND t_purchase IS NOT NULL THEN 1
          ELSE 0 END) AS BIGINT) AS k_b
      FROM base
    ),
    st AS (
      SELECT n_a, n_b, k_a, k_b,
        CASE WHEN n_a > 0 THEN k_a / n_a END AS rate_a,
        CASE WHEN n_b > 0 THEN k_b / n_b END AS rate_b,
        CASE WHEN n_a + n_b > 0 THEN (k_a + k_b) / (n_a + n_b) END AS p_pool
      FROM ag
    ),
    se AS (
      SELECT st.*,
        SQRT(p_pool * (1.0::DOUBLE - p_pool)
          * (1.0::DOUBLE / n_a + 1.0::DOUBLE / n_b)) AS sev
      FROM st
    )
    SELECT n_a, n_b, k_a, k_b, rate_a, rate_b,
      CASE WHEN sev > 0 THEN (rate_b - rate_a) / sev END AS z_score
    FROM se"""

  /** Twin of [[EventQueries.survivalKmFrame]]: same lifetime classes,
    * censor rule, descending at-risk window, 1e-9 ln/ratio quantization,
    * and the exp-of-exact-prefix-sum survival recomposition.
    */
  /** Twin of [[EventQueries.survivalLogrankFrame]]: the KM lifetime
    * chain split by the hash60 arm, the identical event-time grid joins,
    * per-term 1e-9 quantization of E1/V1 in matching shapes, and the
    * same quantized-z rejection literal.
    */
  def survivalLogrankSql: String = {
    val gap = EventQueries.KmChurnGapDays
    val zc = EventQueries.LogrankZCritQ
    s"""
    WITH $evCte,
    pu AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM ev GROUP BY 1
    ),
    cls AS (
      SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::UBIGINT
          AS BIGINT) % 2 AS grp,
        CAST(date_diff('day', CAST(first_ts AS DATE),
          CAST(last_ts AS DATE)) AS INTEGER) AS dur,
        CAST(last_ts AS DATE) AS last_day, COUNT(*) AS nu
      FROM pu GROUP BY 1, 2, 3
    ),
    obs AS (SELECT max(last_day) AS obs_day FROM cls),
    base AS MATERIALIZED (
      SELECT grp, dur,
        CAST(SUM(CASE WHEN last_day < (SELECT obs_day FROM obs) - $gap
          THEN nu ELSE 0 END) AS BIGINT) AS n_events,
        CAST(SUM(nu) AS BIGINT) AS n_total
      FROM cls GROUP BY 1, 2
    ),
    times AS (SELECT DISTINCT dur AS t FROM base WHERE n_events > 0),
    risk AS (
      SELECT t,
        CAST(SUM(CASE WHEN grp = 0 THEN n_total ELSE 0 END) AS BIGINT)
          AS n1,
        CAST(SUM(n_total) AS BIGINT) AS nt
      FROM times JOIN base ON dur >= t GROUP BY t
    ),
    deaths AS (
      SELECT t,
        CAST(SUM(CASE WHEN grp = 0 THEN n_events ELSE 0 END) AS BIGINT)
          AS d1,
        CAST(SUM(n_events) AS BIGINT) AS dt
      FROM times JOIN base ON dur = t GROUP BY t
    ),
    terms AS (
      SELECT d1,
        CAST(floor(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
          / CAST(nt AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS eq,
        CAST(floor((CASE WHEN nt > 1 THEN
          CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
            * (1.0::DOUBLE - CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
            * (CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE))
          ELSE 0.0::DOUBLE END) * 1e9 + 0.5) AS BIGINT) AS vq
      FROM risk JOIN deaths USING (t)
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
        CAST(SUM(d1) AS BIGINT) AS o1,
        CAST(SUM(eq) AS BIGINT) AS eqs, CAST(SUM(vq) AS BIGINT) AS vqs
      FROM terms
    ),
    tot AS (
      SELECT
        CAST(SUM(CASE WHEN grp = 0 THEN n_total ELSE 0 END) AS BIGINT)
          AS n_users_a,
        CAST(SUM(CASE WHEN grp = 1 THEN n_total ELSE 0 END) AS BIGINT)
          AS n_users_b,
        CAST(SUM(CASE WHEN grp = 0 THEN n_events ELSE 0 END) AS BIGINT)
          AS n_churn_a,
        CAST(SUM(CASE WHEN grp = 1 THEN n_events ELSE 0 END) AS BIGINT)
          AS n_churn_b
      FROM base
    ),
    fin AS (
      SELECT tot.*, agg.n_times, agg.o1,
        CAST(agg.eqs AS DOUBLE) / 1e9 AS e1,
        CAST(agg.vqs AS DOUBLE) / 1e9 AS v1,
        CAST(agg.o1 AS DOUBLE) - CAST(agg.eqs AS DOUBLE) / 1e9 AS ome,
        CASE WHEN agg.vqs > 0 THEN
          CAST(floor((CAST(agg.o1 AS DOUBLE)
            - CAST(agg.eqs AS DOUBLE) / 1e9)
            / sqrt(CAST(agg.vqs AS DOUBLE) / 1e9) * 1e9 + 0.5) AS BIGINT)
        END AS zq
      FROM tot CROSS JOIN agg
    )
    SELECT n_users_a, n_users_b, n_churn_a, n_churn_b, n_times,
      o1 AS observed_a, e1 AS expected_a, ome AS o_minus_e,
      v1 AS var_logrank,
      CAST(zq AS DOUBLE) / 1e9 AS z,
      CAST(zq AS DOUBLE) / 1e9 * (CAST(zq AS DOUBLE) / 1e9) AS chi2,
      abs(zq) >= $zc AS reject_5pct
    FROM fin"""
  }

  def survivalKmSql: String = {
    val gap = EventQueries.KmChurnGapDays
    val zq = EventQueries.KmZeroLnQ
    s"""
    WITH $evCte,
    pu AS (
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM ev GROUP BY 1
    ),
    cls AS (
      SELECT CAST(date_diff('day', CAST(first_ts AS DATE),
          CAST(last_ts AS DATE)) AS INTEGER) AS dur,
        CAST(last_ts AS DATE) AS last_day, COUNT(*) AS nu
      FROM pu GROUP BY 1, 2
    ),
    obs AS (SELECT max(last_day) AS obs_day FROM cls),
    pd AS (
      SELECT dur,
        CAST(SUM(CASE WHEN last_day < (SELECT obs_day FROM obs) - $gap
          THEN nu ELSE 0 END) AS BIGINT) AS n_events,
        CAST(SUM(CASE WHEN last_day < (SELECT obs_day FROM obs) - $gap
          THEN 0 ELSE nu END) AS BIGINT) AS n_censored
      FROM cls GROUP BY 1
    ),
    rk AS (
      SELECT dur, n_events, n_censored,
        CAST(SUM(n_events + n_censored) OVER (ORDER BY dur DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS n_risk
      FROM pd
    ),
    lq AS (
      SELECT dur, n_risk, n_events, n_censored,
        CASE WHEN n_events = 0 THEN 0
          WHEN n_events < n_risk THEN
            CAST(FLOOR(ln((n_risk - n_events) / n_risk) * 1e9 + 0.5)
              AS BIGINT)
          ELSE $zq END AS lnq,
        CAST(FLOOR(n_events / n_risk * 1e9 + 0.5) AS BIGINT) AS hq
      FROM rk
    )
    SELECT dur, n_risk, n_events, n_censored,
      FLOOR(exp(SUM(lnq) OVER wa / 1e9) * 1e6 + 0.5) / 1e6 AS survival,
      SUM(hq) OVER wa / 1e9 AS cum_hazard
    FROM lq
    WINDOW wa AS (ORDER BY dur
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY dur"""
  }

  /** Twin of [[EventQueries.abCupedFrame]]: same cents-quantized per-user
    * (x, y) sums, the overflow-guarded cross-products, per-arm sufficient
    * stats, pooled = sums of the 2 arm rows, and the abTestSql division
    * shapes (sc*sc folds to the 10000.0 literal).
    */
  def abCupedSql: String = {
    val b = s"TIMESTAMP '${EventQueries.CupedBoundary} 00:00:00'"
    s"""
    WITH $evCte,
    pu AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN ts < $b
          THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS xq,
        CAST(SUM(CASE WHEN ts >= $b
          THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS yq,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM ev WHERE event_type = 'purchase' GROUP BY user_id
    ),
    pg AS (
      SELECT arm, xq, yq,
        CASE WHEN abs(xq) > 3037000499 OR abs(yq) > 3037000499
          THEN CAST(error('events_ab_cuped: per-user sum overflows the '
            || 'cross-product quantum') AS BIGINT)
          ELSE xq * yq END AS xy,
        xq * xq AS xx, yq * yq AS yy
      FROM pu
    ),
    pa AS MATERIALIZED (
      SELECT arm, COUNT(*) AS n,
        CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
        CAST(SUM(xy) AS BIGINT) AS sxy, CAST(SUM(xx) AS BIGINT) AS sxx,
        CAST(SUM(yy) AS BIGINT) AS syy
      FROM pg GROUP BY arm
    ),
    pool AS (
      SELECT CAST(SUM(n) AS BIGINT) AS pn, CAST(SUM(sx) AS BIGINT) AS psx,
        CAST(SUM(sy) AS BIGINT) AS psy, CAST(SUM(sxy) AS BIGINT) AS psxy,
        CAST(SUM(sxx) AS BIGINT) AS psxx, CAST(SUM(syy) AS BIGINT) AS psyy
      FROM pa
    ),
    gl AS (
      SELECT psx / 100.0 / pn AS xbar,
        (psxy / 10000.0 - (psx / 100.0) * (psy / 100.0) / pn) / (pn - 1)
          AS cov_xy,
        (psxx / 10000.0 - (psx / 100.0) * (psx / 100.0) / pn) / (pn - 1)
          AS var_x,
        (psyy / 10000.0 - (psy / 100.0) * (psy / 100.0) / pn) / (pn - 1)
          AS var_y
      FROM pool
    ),
    th AS (
      SELECT xbar, var_y, cov_xy / var_x AS theta,
        var_y - (cov_xy / var_x) * cov_xy AS var_y_cuped
      FROM gl
    )
    SELECT arm, n AS n_users,
      sx / 100.0 / n AS mean_x,
      sy / 100.0 / n AS mean_y,
      sy / 100.0 / n - theta * (sx / 100.0 / n - xbar) AS mean_y_cuped,
      theta, var_y, var_y_cuped,
      1.0::DOUBLE - var_y_cuped / var_y AS var_reduction
    FROM pa CROSS JOIN th
    ORDER BY arm"""
  }

  /** Twin of [[EventQueries.ewmaReadout]]: the cusumSql dense-grid/stats
    * CTEs, then the banded kernel join (exact at the 1e-9 quantum past
    * the cut — scaladoc at EwmaKernelCut), weights quantized right after
    * their one pow, each term re-quantized before the exact LONG sum,
    * limits quantized so the alarm compares are integer-exact.
    */
  def ewmaChartSql: String = ewmaSqlWith(None)

  /** Frozen-baseline twin ([[EventQueries.ewmaFrozen]]): identical chart
    * arithmetic, (mean, sigma) and the warm-up seed from only the first
    * [[EventQueries.EwmaPhase1Hours]] grid hours.
    */
  def ewmaFrozenSql: String =
    ewmaSqlWith(Some(EventQueries.EwmaPhase1Hours))

  private def ewmaSqlWith(baselineHours: Option[Int]): String = {
    val lam = s"${EventQueries.EwmaLambda}::DOUBLE"
    val dec = s"${1.0 - EventQueries.EwmaLambda}::DOUBLE"
    val den = s"${EventQueries.EwmaDenom}::DOUBLE"
    val ll = s"${EventQueries.EwmaL}::DOUBLE"
    val cut = EventQueries.EwmaKernelCut
    val basePred = baselineHours.fold("")(n => s" WHERE t <= $n")
    s"""
    WITH $evCte,
    ha AS (
      SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          AS BIGINT) AS ne
      FROM ev GROUP BY 1
    ),
    bnd AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ha),
    g AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
      FROM bnd
    ),
    xq AS MATERIALIZED (
      SELECT g.hour, rate,
        CAST(FLOOR(rate * 1e9 + 0.5) AS BIGINT) AS rq
      FROM (
        SELECT g.hour,
          CASE WHEN COALESCE(ha.n, 0) = 0 THEN 0.0::DOUBLE
            ELSE CAST(ha.ne AS DOUBLE) / CAST(ha.n AS DOUBLE) END AS rate
        FROM g LEFT JOIN ha ON g.hour = ha.hour
      ) g
    ),
    xt AS MATERIALIZED (
      SELECT hour, rate, rq,
        CAST(ROW_NUMBER() OVER (ORDER BY hour) AS BIGINT) AS t
      FROM xq
    ),
    xb AS (SELECT rate, rq FROM xt$basePred),
    st AS (
      SELECT CAST(SUM(rq) AS DOUBLE) / 1e9 / CAST(COUNT(*) AS DOUBLE)
        AS mean, COUNT(*) AS nh
      FROM xb
    ),
    vr AS (
      SELECT SQRT(CAST(SUM(CAST(FLOOR(
          (rate - (SELECT mean FROM st)) * (rate - (SELECT mean FROM st))
          * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e9 / CAST((SELECT nh FROM st) AS DOUBLE)) AS sigma
      FROM xb
    ),
    terms AS (
      SELECT a.hour, a.t, a.rq,
        CAST(FLOOR(b.rate
          * (FLOOR($lam * pow($dec, a.t - b.t) * 1e9 + 0.5) / 1e9)
          * 1e9 + 0.5) AS BIGINT) AS tq
      FROM xt a JOIN xt b ON b.t <= a.t AND b.t >= a.t - $cut
    ),
    zs AS (
      SELECT hour, t, rq, CAST(SUM(tq) AS BIGINT) AS zq0
      FROM terms GROUP BY 1, 2, 3
    ),
    z AS (
      SELECT hour, rq,
        zq0 + CASE WHEN t <= $cut THEN
          CAST(FLOOR((SELECT mean FROM st)
            * (FLOOR(pow($dec, t) * 1e9 + 0.5) / 1e9)
            * 1e9 + 0.5) AS BIGINT)
          ELSE 0 END AS zq,
        CASE WHEN t * 2 <= $cut THEN
          1.0::DOUBLE - FLOOR(pow($dec, t * 2) * 1e9 + 0.5) / 1e9
          ELSE 1.0::DOUBLE END AS varfac
      FROM zs
    ),
    lim AS (
      SELECT hour, rq, zq,
        CAST(FLOOR(((SELECT mean FROM st)
          + SQRT($lam / $den * varfac) * (SELECT sigma FROM vr) * $ll)
          * 1e9 + 0.5) AS BIGINT) AS uclq,
        CAST(FLOOR(((SELECT mean FROM st)
          - SQRT($lam / $den * varfac) * (SELECT sigma FROM vr) * $ll)
          * 1e9 + 0.5) AS BIGINT) AS lclq
      FROM z
    )
    SELECT hour, rq / 1e9 AS rate, zq / 1e9 AS ewma,
      uclq / 1e9 AS ucl, lclq / 1e9 AS lcl,
      zq > uclq AS alarm_up, zq < lclq AS alarm_down
    FROM lim ORDER BY hour"""
  }

  /** Twin of [[EventQueries.contributionCapFrame]]: same (ts, event_id)
    * keep rank, same conditional quantized-LONG sums, loss share divides
    * the two exact LONGs.
    */
  def contributionCapSql: String = {
    val c = EventQueries.ContribCap
    s"""
    WITH $evCte,
    r AS (
      SELECT event_type, user_id,
        CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vq,
        ROW_NUMBER() OVER (PARTITION BY event_type, user_id
          ORDER BY ts, event_id) AS rn
      FROM ev
    ),
    a AS (
      SELECT event_type,
        COUNT(DISTINCT user_id) AS n_users,
        COUNT(DISTINCT CASE WHEN rn > $c THEN user_id END) AS n_capped_users,
        COUNT(*) AS n_events_raw,
        CAST(SUM(CASE WHEN rn <= $c THEN 1 ELSE 0 END) AS BIGINT)
          AS n_events_capped,
        CAST(SUM(vq) AS BIGINT) AS sq_raw,
        CAST(SUM(CASE WHEN rn <= $c THEN vq ELSE 0 END) AS BIGINT)
          AS sq_capped
      FROM r GROUP BY 1
    )
    SELECT event_type, n_users, n_capped_users, n_events_raw,
      n_events_capped,
      sq_raw / 10000.0 AS sum_value_raw,
      sq_capped / 10000.0 AS sum_value_capped,
      CASE WHEN sq_raw = 0 THEN NULL
        ELSE (sq_raw - sq_capped) / sq_raw END AS loss_share
    FROM a
    ORDER BY event_type"""
  }

  /** Twin of [[EventQueries.srmCheckFrame]]: identical distinct exposure
    * grains, hash60 arms, 1e-9-quantized chi² compared against the same
    * pre-quantized critical literals.
    */
  def srmCheckSql: String = s"""
    WITH $evCte,
    tu AS (
      SELECT event_type, user_id,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM (SELECT DISTINCT event_type, user_id FROM ev)
    ),
    seg AS (
      SELECT event_type AS segment,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM tu GROUP BY 1
    ),
    allr AS (
      SELECT 'ALL' AS segment,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM (SELECT DISTINCT user_id, arm FROM tu)
    ),
    u AS (SELECT * FROM seg UNION ALL SELECT * FROM allr),
    st AS (
      SELECT segment, n_a, n_b, n_a + n_b AS n_users,
        CASE WHEN n_a + n_b > 0 THEN CAST(floor(
          CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
            / CAST(n_a + n_b AS DOUBLE) * 1e9 + 0.5) AS BIGINT) END
          AS chi2q
      FROM u
    )
    SELECT segment, n_a, n_b, n_users,
      CASE WHEN n_users > 0 THEN
        CAST(n_a AS DOUBLE) / CAST(n_users AS DOUBLE) END AS share_a,
      CAST(chi2q AS DOUBLE) / 1e9 AS chi2,
      chi2q >= ${EventQueries.SrmChi2Crit5Q} AS srm_5pct,
      chi2q >= ${EventQueries.SrmChi2Crit1PmQ} AS srm_1pm
    FROM st ORDER BY segment"""

  /** BH-FDR twin: the srmCheckSql per-segment chain (no ALL row), the
    * same rank/count windows, the shared [[EventQueries.bhCritQ]]
    * literal grid as a VALUES table, and the largest-prefix rule via a
    * scalar MAX. A `def` (interpolates the generated grid).
    */
  def srmFdrSql: String = {
    val critRows = EventQueries.bhCritQ.map { case (i, m, q) =>
      s"($i, $m, CAST($q AS BIGINT))"
    }.mkString(", ")
    s"""
    WITH $evCte,
    tu AS (
      SELECT event_type, user_id,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM (SELECT DISTINCT event_type, user_id FROM ev)
    ),
    seg AS (
      SELECT event_type AS segment,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM tu GROUP BY 1
    ),
    st AS (
      SELECT segment, n_a + n_b AS n_users,
        CAST(floor(
          CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
            / CAST(n_a + n_b AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS chi2q
      FROM seg
    ),
    ranked AS (
      SELECT segment, n_users, chi2q,
        CAST(ROW_NUMBER() OVER (ORDER BY chi2q DESC, segment) AS INTEGER)
          AS i,
        CAST(COUNT(*) OVER () AS INTEGER) AS m
      FROM st
    ),
    crit(i, m, critq) AS (VALUES $critRows),
    flagged AS (
      SELECT r.segment, r.n_users, r.chi2q, r.i, r.m, c.critq,
        r.chi2q >= c.critq AS pass
      FROM ranked r JOIN crit c ON r.i = c.i AND r.m = c.m
    ),
    istar AS (SELECT MAX(CASE WHEN pass THEN i END) AS ist FROM flagged)
    SELECT segment, n_users, CAST(chi2q AS DOUBLE) / 1e9 AS chi2,
      CAST(i AS BIGINT) AS bh_rank, CAST(m AS BIGINT) AS m_tests,
      CAST(critq AS DOUBLE) / 1e9 AS bh_crit,
      pass AS exceeds_bh_line,
      (istar.ist IS NOT NULL AND i <= istar.ist) AS rejected_bh
    FROM flagged, istar
    ORDER BY bh_rank"""
  }

  /** Twin of [[EventQueries.abPower]]: the abTestSql sufficient-statistic
    * chain, then the same MDE/required-n recompositions — mde quantized
    * to 1e-6 before the relative form, n_req's double guarded below the
    * BIGINT ceiling before ceil.
    */
  def abPowerSql: String = s"""
    WITH $evCte,
    pu AS (
      SELECT user_id,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS uq,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM ev GROUP BY user_id
    ),
    pq AS (
      SELECT user_id, uq, arm,
        CASE WHEN abs(uq) > 3037000499
          THEN CAST(error('events_ab_power: per-user total overflows the '
            || 'ssq quantum') AS BIGINT)
          ELSE uq * uq END AS uq2
      FROM pu
    ),
    ag AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 0 THEN uq ELSE 0 END) AS BIGINT) AS sa,
        CAST(SUM(CASE WHEN arm = 1 THEN uq ELSE 0 END) AS BIGINT) AS sb,
        CAST(SUM(CASE WHEN arm = 0 THEN uq2 ELSE 0 END) AS BIGINT) AS qa,
        CAST(SUM(CASE WHEN arm = 1 THEN uq2 ELSE 0 END) AS BIGINT) AS qb
      FROM pq
    ),
    st AS (
      SELECT n_a, n_b,
        CASE WHEN n_a > 0 THEN sa / 10000.0 / n_a END AS mean_a,
        CASE WHEN n_a > 1 THEN
          (qa / 100000000.0 - (sa / 10000.0) * (sa / 10000.0) / n_a)
            / (n_a - 1) END AS var_a,
        CASE WHEN n_b > 1 THEN
          (qb / 100000000.0 - (sb / 10000.0) * (sb / 10000.0) / n_b)
            / (n_b - 1) END AS var_b
      FROM ag
    ),
    se AS (
      SELECT st.*, var_a / n_a + var_b / n_b AS se2,
        CASE WHEN n_a > 1 AND n_b > 1 THEN
          ((n_a - 1) * var_a + (n_b - 1) * var_b) / (n_a + n_b - 2) END
          AS var_pooled
      FROM st
    ),
    md AS (
      SELECT se.*,
        CASE WHEN se2 > 0 THEN
          floor(${EventQueries.PowerZSum}::DOUBLE * sqrt(se2) * 1e6 + 0.5)
            / 1e6 END AS mde_abs,
        CASE WHEN mean_a IS NOT NULL AND mean_a <> 0 THEN
          ${EventQueries.PowerMdeRel}::DOUBLE * mean_a END AS delta_1pct
      FROM se
    ),
    nr AS (
      SELECT md.*,
        2.0::DOUBLE * (${EventQueries.PowerZSum}::DOUBLE
          * ${EventQueries.PowerZSum}::DOUBLE) * var_pooled
          / (delta_1pct * delta_1pct) AS nreq_d
      FROM md
    )
    SELECT n_a, n_b, mean_a, var_pooled,
      sqrt(se2) AS se_delta, mde_abs,
      mde_abs / mean_a AS mde_rel,
      CASE WHEN nreq_d < 9e18::DOUBLE THEN
        CAST(ceil(nreq_d) AS BIGINT) END AS n_req_per_arm_1pct
    FROM nr"""

  /** Twin of [[EventQueries.bootstrapCiFrame]]: the same hash60-seeded
    * Poisson(1) inverse-CDF weights over shared CDF literals, exact-LONG
    * weighted sums per replicate, the (mean, b) rank order, and the
    * integer-ceiling nearest-rank cuts over the valid-replicate count.
    */
  def bootstrapCiSql: String = {
    val b = EventQueries.BootReps
    val cdf = EventQueries.PoissonCdf
    val wCase = cdf.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t::DOUBLE THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${cdf.size} END")
    s"""
    WITH $evCte,
    pu AS (
      SELECT user_id,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS uq
      FROM ev GROUP BY user_id
    ),
    reps AS (
      SELECT user_id, uq, unnest(generate_series(0, ${b - 1})) AS b
      FROM pu
    ),
    us AS (
      SELECT uq, b,
        (CAST(('0x' || substr(md5('boot19:' || CAST(user_id AS VARCHAR)
          || ':' || CAST(b AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) + 1)
          / 1152921504606846977.0 AS u
      FROM reps
    ),
    wt AS (SELECT b, uq, $wCase AS w FROM us),
    ag AS (
      SELECT b,
        CAST(SUM(w * uq) AS BIGINT) AS wq,
        CAST(SUM(w) AS BIGINT) AS sw,
        CAST(SUM(uq) AS BIGINT) AS tq,
        CAST(COUNT(*) AS BIGINT) AS nu
      FROM wt GROUP BY b
    ),
    valid AS (
      SELECT *, CAST(wq AS DOUBLE) / 10000.0 / CAST(sw AS DOUBLE)
        AS mean_b
      FROM ag WHERE sw > 0
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rk,
        CAST(COUNT(*) OVER () AS BIGINT) AS bv
      FROM valid
    ),
    fin AS (
      SELECT CAST(MIN(nu) AS BIGINT) AS n_users,
        CAST(MIN(tq) AS BIGINT) AS tq,
        CAST(MIN(bv) AS BIGINT) AS b_valid,
        MIN(CASE WHEN rk = (bv * 5 + 199) // 200 THEN mean_b END) AS ci_lo,
        MIN(CASE WHEN rk = (bv * 195 + 199) // 200 THEN mean_b END) AS ci_hi
      FROM rk
    ),
    f2 AS (
      SELECT n_users,
        CAST(tq AS DOUBLE) / 10000.0 / CAST(n_users AS DOUBLE) AS mean_hat,
        CAST($b AS BIGINT) AS b_total, b_valid, ci_lo, ci_hi,
        ci_hi - ci_lo AS ci_width
      FROM fin
    )
    SELECT f2.*,
      mean_hat >= ci_lo AND mean_hat <= ci_hi AS covered
    FROM f2"""
  }

  /** Twin of [[EventQueries.ksTestFrame]]: identical per-user totals and
    * hash arms, per-distinct-total cumulative counts, 1e-9-quantized CDF
    * gaps, the (gap desc, total) argmax, and the quantized asymptotic
    * critical value.
    */
  def ksTestSql: String = s"""
    WITH $evCte,
    pu AS (
      SELECT user_id,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS uq,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM ev GROUP BY user_id
    ),
    c AS (
      SELECT uq,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM pu GROUP BY uq
    ),
    g AS (
      SELECT uq,
        CAST(SUM(ca) OVER (ORDER BY uq ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS cuma,
        CAST(SUM(cb) OVER (ORDER BY uq ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS cumb,
        CAST(SUM(ca) OVER () AS BIGINT) AS na,
        CAST(SUM(cb) OVER () AS BIGINT) AS nb
      FROM c
    ),
    q AS (
      SELECT *,
        CAST(floor(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
          - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE)) * 1e9 + 0.5)
          AS BIGINT) AS gapq
      FROM g
    ),
    top AS (
      SELECT na, nb, gapq, CAST(uq AS DOUBLE) / 10000.0 AS at_value
      FROM q ORDER BY gapq DESC, uq LIMIT 1
    ),
    f AS (
      SELECT *,
        CAST(floor(${EventQueries.KsCoeff5}::DOUBLE
          * sqrt(CAST(na + nb AS DOUBLE) / CAST(na * nb AS DOUBLE))
          * 1e9 + 0.5) AS BIGINT) AS critq
      FROM top
    )
    SELECT na AS n_a, nb AS n_b,
      CAST(gapq AS DOUBLE) / 1e9 AS d_stat,
      CAST(critq AS DOUBLE) / 1e9 AS d_crit_5pct,
      gapq >= critq AS ks_reject_5pct,
      at_value
    FROM f"""

  /** Twin of [[EventQueries.typeDowFrame]]: epoch-day dow, identical
    * margin windows over the cell frame, 1e-6-quantized chi² terms, the
    * (term desc, type, dow) top cell, and the 1e-9-quantized V.
    */
  def typeDowAssociationSql: String = s"""
    WITH $evCte,
    obs AS (
      SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
          AS BIGINT) AS dow,
        CAST(COUNT(*) AS BIGINT) AS o
      FROM ev GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, d.dow
      FROM (SELECT DISTINCT event_type FROM obs) t
      CROSS JOIN (SELECT DISTINCT dow FROM obs) d
    ),
    cells AS (
      SELECT g.event_type, g.dow, COALESCE(o.o, 0) AS o
      FROM grid g LEFT JOIN obs o
        ON g.event_type = o.event_type AND g.dow = o.dow
    ),
    m AS (
      SELECT *,
        CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
        CAST(SUM(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
        CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM cells
    ),
    q AS (
      SELECT *,
        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS e,
        CAST(floor(
          (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
            / CAST(n AS DOUBLE))
          * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
            / CAST(n AS DOUBLE))
          / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
          * 1e6 + 0.5) AS BIGINT) AS c2q
      FROM m
    ),
    s AS (
      SELECT CAST(MIN(n) AS BIGINT) AS n_events,
        CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
        CAST(COUNT(DISTINCT dow) AS BIGINT) AS c,
        CAST(SUM(c2q) AS BIGINT) AS chi2q
      FROM q
    ),
    top AS (
      SELECT event_type AS top_type, dow AS top_dow,
        CAST(c2q AS DOUBLE) / 1e6 AS top_cell_chi2
      FROM q ORDER BY c2q DESC, event_type, dow LIMIT 1
    ),
    f AS (
      SELECT s.*, top.*,
        (r - 1) * (c - 1) AS dof,
        CASE WHEN r - 1 <= c - 1 THEN r - 1 ELSE c - 1 END AS mind
      FROM s CROSS JOIN top
    )
    SELECT n_events, r AS n_types, c AS n_dows, dof,
      CAST(chi2q AS DOUBLE) / 1e6 AS chi2,
      CAST(CASE WHEN mind > 0 THEN
        CAST(floor(sqrt((CAST(chi2q AS DOUBLE) / 1e6)
          / (CAST(n_events AS DOUBLE) * CAST(mind AS DOUBLE)))
          * 1e9 + 0.5) AS BIGINT) END AS DOUBLE) / 1e9 AS cramers_v,
      top_type, top_dow, top_cell_chi2
    FROM f"""

  /** Twin of [[EventQueries.powerCurveFrame]]: the same per-user
    * (first-day, arm, total) base, abPowerSql variance recomposition,
    * calendar cumulative enrollment, and 1e-6-quantized running MDE.
    */
  def powerCurveSql: String = s"""
    WITH $evCte,
    pu AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS uq,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM ev GROUP BY user_id
    ),
    pq AS (
      SELECT pu.*,
        CASE WHEN abs(uq) > 3037000499
          THEN CAST(error('events_power_curve: per-user total overflows '
            || 'the ssq quantum') AS BIGINT)
          ELSE uq * uq END AS uq2
      FROM pu
    ),
    ag AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 0 THEN uq ELSE 0 END) AS BIGINT) AS sa,
        CAST(SUM(CASE WHEN arm = 0 THEN uq2 ELSE 0 END) AS BIGINT) AS qa,
        CAST(SUM(CASE WHEN arm = 1 THEN uq ELSE 0 END) AS BIGINT) AS sb,
        CAST(SUM(CASE WHEN arm = 1 THEN uq2 ELSE 0 END) AS BIGINT) AS qb
      FROM pq
    ),
    st AS (
      SELECT
        CASE WHEN n_a > 0 THEN sa / 10000.0 / n_a END AS mean_a,
        CASE WHEN n_a > 1 AND n_b > 1 THEN
          ((n_a - 1) * (CASE WHEN n_a > 1 THEN
            (qa / 100000000.0 - (sa / 10000.0) * (sa / 10000.0) / n_a)
              / (n_a - 1) END)
          + (n_b - 1) * (CASE WHEN n_b > 1 THEN
            (qb / 100000000.0 - (sb / 10000.0) * (sb / 10000.0) / n_b)
              / (n_b - 1) END)) / (n_a + n_b - 2) END AS var_pooled
      FROM ag
    ),
    daily AS (
      SELECT first_day,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS da,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS db
      FROM pu GROUP BY 1
    ),
    cum AS (
      SELECT first_day,
        CAST(SUM(da) OVER (ORDER BY first_day ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) AS users_a,
        CAST(SUM(db) OVER (ORDER BY first_day ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) AS users_b
      FROM daily
    ),
    m AS (
      SELECT c.*, st.mean_a, st.var_pooled,
        CASE WHEN users_a > 0 AND users_b > 0 AND var_pooled > 0 THEN
          CAST(floor(${EventQueries.PowerZSum}::DOUBLE
            * sqrt(var_pooled * (1.0::DOUBLE / CAST(users_a AS DOUBLE)
              + 1.0::DOUBLE / CAST(users_b AS DOUBLE)))
            * 1e6 + 0.5) AS BIGINT) END AS mdeq
      FROM cum c CROSS JOIN st
    )
    SELECT first_day AS day, users_a, users_b,
      CAST(mdeq AS DOUBLE) / 1e6 AS mde_abs,
      CAST(mdeq AS DOUBLE) / 1e6 / mean_a AS mde_rel,
      CAST(mdeq AS DOUBLE) / 1e6
        <= ${EventQueries.PowerMdeRel}::DOUBLE * mean_a AS reaches_1pct
    FROM m ORDER BY day"""

  /** Twin of [[EventQueries.spearmanFrame]]: the same doubled-midrank
    * frames per metric, normalized-rank 1e-9 moment quanta, exact-LONG
    * raw-Pearson statistics, and the shared correlation/z shapes.
    */
  def spearmanSql: String = s"""
    WITH $evCte,
    pu AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS uq
      FROM ev GROUP BY user_id
    ),
    na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pu),
    rx AS (
      SELECT cnt, CAST(2 * (cum - c) + c + 1 AS BIGINT) AS r2_cnt FROM (
        SELECT cnt, c, CAST(SUM(c) OVER (ORDER BY cnt ROWS BETWEEN
          UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS c FROM pu GROUP BY 1)
      )
    ),
    ry AS (
      SELECT uq, CAST(2 * (cum - c) + c + 1 AS BIGINT) AS r2_uq FROM (
        SELECT uq, c, CAST(SUM(c) OVER (ORDER BY uq ROWS BETWEEN
          UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM (SELECT uq, CAST(COUNT(*) AS BIGINT) AS c FROM pu GROUP BY 1)
      )
    ),
    j AS (
      SELECT pu.cnt, pu.uq,
        CAST(r2_cnt AS DOUBLE) / (2.0::DOUBLE * CAST(n AS DOUBLE)) AS ux,
        CAST(r2_uq AS DOUBLE) / (2.0::DOUBLE * CAST(n AS DOUBLE)) AS uy,
        CASE WHEN abs(pu.uq) > 3037000499
          THEN CAST(error('events_spearman: per-user total overflows the '
            || 'ssq quantum') AS BIGINT)
          ELSE pu.uq * pu.uq END AS uq2
      FROM pu JOIN rx USING (cnt) JOIN ry USING (uq) CROSS JOIN na
    ),
    ag AS (
      SELECT CAST(MIN(n) AS BIGINT) AS n,
        CAST(SUM(CAST(floor(ux * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
        CAST(SUM(CAST(floor(ux * ux * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
          AS sxx,
        CAST(SUM(CAST(floor(uy * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
        CAST(SUM(CAST(floor(uy * uy * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
          AS syy,
        CAST(SUM(CAST(floor(ux * uy * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
          AS sxy,
        CAST(SUM(cnt) AS BIGINT) AS pcx,
        CAST(SUM(cnt * cnt) AS BIGINT) AS pcxx,
        CAST(SUM(uq) AS BIGINT) AS pcy,
        CAST(SUM(uq2) AS BIGINT) AS pcyy,
        CAST(SUM(cnt * uq) AS BIGINT) AS pcxy
      FROM (SELECT j.*, n FROM j CROSS JOIN na)
    ),
    co AS (
      SELECT ag.*,
        CASE WHEN CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
            - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9) > 0
          AND CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE) / 1e9)
            - (CAST(sy AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9) > 0
        THEN CAST(floor(
          (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
            - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
          / sqrt((CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
            - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9))
            * (CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE) / 1e9)
            - (CAST(sy AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9)))
          * 1e9 + 0.5) AS BIGINT) END AS rhoq,
        CASE WHEN CAST(n AS DOUBLE) * CAST(pcxx AS DOUBLE)
            - CAST(pcx AS DOUBLE) * CAST(pcx AS DOUBLE) > 0
          AND CAST(n AS DOUBLE) * (CAST(pcyy AS DOUBLE) / 1e8)
            - (CAST(pcy AS DOUBLE) / 1e4) * (CAST(pcy AS DOUBLE) / 1e4) > 0
        THEN CAST(floor(
          (CAST(n AS DOUBLE) * (CAST(pcxy AS DOUBLE) / 1e4)
            - CAST(pcx AS DOUBLE) * (CAST(pcy AS DOUBLE) / 1e4))
          / sqrt((CAST(n AS DOUBLE) * CAST(pcxx AS DOUBLE)
            - CAST(pcx AS DOUBLE) * CAST(pcx AS DOUBLE))
            * (CAST(n AS DOUBLE) * (CAST(pcyy AS DOUBLE) / 1e8)
            - (CAST(pcy AS DOUBLE) / 1e4) * (CAST(pcy AS DOUBLE) / 1e4)))
          * 1e9 + 0.5) AS BIGINT) END AS pearsonq
      FROM ag
    ),
    z AS (
      SELECT co.*,
        CASE WHEN n > 1 THEN CAST(floor(
          (CAST(rhoq AS DOUBLE) / 1e9)
            * sqrt(CAST(n - 1 AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) END
          AS zq
      FROM co
    )
    SELECT n AS n_users,
      CAST(rhoq AS DOUBLE) / 1e9 AS spearman_rho,
      CAST(pearsonq AS DOUBLE) / 1e9 AS pearson_r,
      CAST(zq AS DOUBLE) / 1e9 AS z,
      abs(zq) >= ${EventQueries.LogrankZCritQ} AS reject_5pct
    FROM z"""

  /** Twin of [[EventQueries.abWinsorizedFrame]]: identical per-user
    * totals/arms, the pooled global nearest-rank cuts, integer clamping,
    * and the abTestSql Welch recompositions for both the raw and the
    * winsorized statistic.
    */
  def abWinsorizedSql: String = {
    val lo = s"${EventQueries.WinsLoPct}::DOUBLE"
    val hi = s"${EventQueries.WinsHiPct}::DOUBLE"
    s"""
    WITH $evCte,
    pu AS (
      SELECT user_id,
        CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS uq,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) % 2 AS arm
      FROM ev GROUP BY user_id
    ),
    ranked AS (
      SELECT uq,
        ROW_NUMBER() OVER (ORDER BY uq) AS rk,
        COUNT(*) OVER () AS nn
      FROM pu
    ),
    cuts AS (
      SELECT
        MAX(CASE WHEN rk = floor((nn - 1) * $lo) + 1 THEN uq END) AS lo,
        MAX(CASE WHEN rk = floor((nn - 1) * $hi) + 1 THEN uq END) AS hi
      FROM ranked
    ),
    j AS (
      SELECT pu.*, c.lo, c.hi,
        LEAST(GREATEST(uq, c.lo), c.hi) AS w,
        CASE WHEN abs(uq) > 3037000499
          THEN CAST(error('events_ab_winsorized: total overflows the '
            || 'ssq quantum') AS BIGINT)
          ELSE uq * uq END AS uq2,
        CASE WHEN abs(LEAST(GREATEST(uq, c.lo), c.hi)) > 3037000499
          THEN CAST(error('events_ab_winsorized: total overflows the '
            || 'ssq quantum') AS BIGINT)
          ELSE LEAST(GREATEST(uq, c.lo), c.hi)
            * LEAST(GREATEST(uq, c.lo), c.hi) END AS w2
      FROM pu CROSS JOIN cuts c
    ),
    ag AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(MIN(lo) AS BIGINT) AS lo, CAST(MIN(hi) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN uq <> w THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clamped,
        CAST(SUM(CASE WHEN arm = 0 THEN uq ELSE 0 END) AS BIGINT) AS sa,
        CAST(SUM(CASE WHEN arm = 1 THEN uq ELSE 0 END) AS BIGINT) AS sb,
        CAST(SUM(CASE WHEN arm = 0 THEN uq2 ELSE 0 END) AS BIGINT) AS qa,
        CAST(SUM(CASE WHEN arm = 1 THEN uq2 ELSE 0 END) AS BIGINT) AS qb,
        CAST(SUM(CASE WHEN arm = 0 THEN w ELSE 0 END) AS BIGINT) AS swa,
        CAST(SUM(CASE WHEN arm = 1 THEN w ELSE 0 END) AS BIGINT) AS swb,
        CAST(SUM(CASE WHEN arm = 0 THEN w2 ELSE 0 END) AS BIGINT) AS qwa,
        CAST(SUM(CASE WHEN arm = 1 THEN w2 ELSE 0 END) AS BIGINT) AS qwb
      FROM j
    ),
    st AS (
      SELECT ag.*,
        CASE WHEN n_a > 0 THEN sa / 10000.0 / n_a END AS mean_a_raw,
        CASE WHEN n_b > 0 THEN sb / 10000.0 / n_b END AS mean_b_raw,
        CASE WHEN n_a > 1 THEN
          (qa / 100000000.0 - (sa / 10000.0) * (sa / 10000.0) / n_a)
            / (n_a - 1) END AS var_a_raw,
        CASE WHEN n_b > 1 THEN
          (qb / 100000000.0 - (sb / 10000.0) * (sb / 10000.0) / n_b)
            / (n_b - 1) END AS var_b_raw,
        CASE WHEN n_a > 0 THEN swa / 10000.0 / n_a END AS mean_a_w,
        CASE WHEN n_b > 0 THEN swb / 10000.0 / n_b END AS mean_b_w,
        CASE WHEN n_a > 1 THEN
          (qwa / 100000000.0 - (swa / 10000.0) * (swa / 10000.0) / n_a)
            / (n_a - 1) END AS var_a_w,
        CASE WHEN n_b > 1 THEN
          (qwb / 100000000.0 - (swb / 10000.0) * (swb / 10000.0) / n_b)
            / (n_b - 1) END AS var_b_w
      FROM ag
    ),
    se AS (
      SELECT st.*,
        var_a_raw / n_a + var_b_raw / n_b AS se2_raw,
        var_a_w / n_a + var_b_w / n_b AS se2_w
      FROM st
    )
    SELECT n_a, n_b,
      CAST(lo AS DOUBLE) / 10000.0 AS p_lo,
      CAST(hi AS DOUBLE) / 10000.0 AS p_hi,
      n_clamped, mean_a_w, mean_b_w,
      CASE WHEN mean_a_w IS NOT NULL AND mean_a_w <> 0
          AND mean_b_w IS NOT NULL
        THEN (mean_b_w - mean_a_w) / mean_a_w END AS uplift_w,
      CASE WHEN se2_raw > 0 THEN
        floor((mean_b_raw - mean_a_raw) / sqrt(se2_raw) * 1000000.0 + 0.5)
          / 1000000.0 END AS t_raw,
      CASE WHEN se2_w > 0 THEN
        floor((mean_b_w - mean_a_w) / sqrt(se2_w) * 1000000.0 + 0.5)
          / 1000000.0 END AS t_winsorized
    FROM se"""
  }

  /** Twin of [[EventQueries.tailHillFrame]] at k = [[EventQueries.TailK]]:
    * the same (value desc, event_id) top-(k+1) cut, 1e-9-quantized ln
    * ratios summed exactly, and the quantized-ln extrapolation so exp
    * sees identical doubles.
    */
  def tailHillSql: String = {
    val k = EventQueries.TailK
    s"""
    WITH $evCte,
    pos AS (SELECT value, event_id FROM ev WHERE value > 0.0::DOUBLE),
    na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events FROM pos),
    top AS (
      SELECT value,
        ROW_NUMBER() OVER (ORDER BY value DESC, event_id) AS rn
      FROM pos QUALIFY rn <= ${k + 1}
    ),
    thr AS (SELECT value AS thr FROM top WHERE rn = ${k + 1}),
    ta AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(CAST(floor(ln(t.value / thr.thr) * 1e9 + 0.5) AS BIGINT))
          AS BIGINT) AS sq
      FROM top t CROSS JOIN thr WHERE t.rn <= $k
    ),
    g AS (
      SELECT n_events, k, thr,
        CASE WHEN k > 0 THEN CAST(sq AS DOUBLE) / 1e9 / CAST(k AS DOUBLE)
          END AS gamma,
        CAST(floor(ln(CAST(k AS DOUBLE)
          / (CAST(n_events AS DOUBLE) * 1e-4)) * 1e9 + 0.5) AS BIGINT)
          AS lq
      FROM na CROSS JOIN ta CROSS JOIN thr
    )
    SELECT n_events, k, thr, gamma,
      CASE WHEN gamma > 0 THEN 1.0::DOUBLE / gamma END AS alpha,
      CASE WHEN gamma > 0 THEN 1.0::DOUBLE / gamma <= 2.0::DOUBLE END
        AS infinite_variance,
      CASE WHEN gamma > 0 THEN
        thr * exp(gamma * (CAST(lq AS DOUBLE) / 1e9)) END
        AS p9999_extrapolated
    FROM g"""
  }
}
