package graft.oracle

import graft.operators.Events

/** DuckDB oracle SQL for the batch event-time family. DuckDB reads
  * the parquet TIMESTAMP(NANOS) natively; `epoch_ns` recovers the
  * exact bigint nanos Spark sees under `nanosAsLong`, so both
  * engines bucket and aggregate identical integers. Cents use the
  * same `round(value * 100)` double op on identical doubles.
  */
object EventOracle {

  def tumblingHourlySql: String =
    s"""WITH e AS (
    -- Spark's window() DROPS null event-times (no place on any
    -- timeline exists); mirror the door, not a NULL-window group
    SELECT epoch_ns(ts) AS tns, event_type, user_id,
      CASE WHEN isfinite(value) AND abs(value) < ${Events.MaxCentsValue}
        THEN CAST(round(value * 100) AS BIGINT) END AS vc
    FROM events WHERE ts IS NOT NULL
  )
SELECT (tns // ${Events.NanosPerHour}) * 3600 AS window_start_s, event_type,
  count(*) AS n, CAST(sum(vc) AS BIGINT) AS value_cents,
  count(DISTINCT user_id) AS n_users
FROM e GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Sliding windows derived arithmetically: an event at `tns`
    * belongs to the two 30-minute-aligned hour windows with start
    * `((tns - i*30min) // 1h)*1h + i*30min`, i in {0, 1} — the
    * independent formulation of Spark's native slide assignment.
    */
  def slidingHourlySql: String = {
    val nanos30 = Events.NanosPerHour / 2
    s"""WITH e AS (
    SELECT epoch_ns(ts) AS tns, event_type,
      CASE WHEN isfinite(value) AND abs(value) < ${Events.MaxCentsValue}
        THEN CAST(round(value * 100) AS BIGINT) END AS vc
    FROM events WHERE ts IS NOT NULL
  ),
  g AS (
    SELECT ((tns - i * $nanos30) // ${Events.NanosPerHour}) * 3600 + i * 1800 AS window_start_s,
      event_type, vc
    FROM e, range(0, 2) t(i)
  )
SELECT window_start_s, event_type, count(*) AS n,
  CAST(sum(vc) AS BIGINT) AS value_cents
FROM g GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** DuckDB's native ASOF LEFT JOIN — an independent implementation
    * of the point-in-time semantics [[Events.asofLatestOrder]]
    * expresses with the union-window trick. Orders pre-deduped to
    * max(o_orderkey) per (customer, date) in both engines so date
    * ties resolve identically.
    */
  def asofLatestOrderSql: String =
    s"""WITH e AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
  ),
  o AS (
    SELECT o_custkey, epoch_us(o_orderdate) AS order_us,
      max(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2
  ),
  matched AS (
    SELECT e.event_id, e.user_id, e.ts_us, o.o_orderkey, o.order_us,
      e.ts_us - o.order_us AS staleness_us
    FROM e ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts_us >= o.order_us
    WHERE e.ts_us IS NOT NULL
  )
SELECT * FROM matched
UNION ALL
-- a NULL-timestamp probe has NO point in time, hence NO as-of match
-- (the engine's inequality is simply never satisfied); DuckDB's
-- native ASOF instead pairs a NULL probe with the LATEST entry —
-- carve those probes out and emit them unmatched
SELECT event_id, user_id, ts_us,
  NULL AS o_orderkey, NULL AS order_us, NULL AS staleness_us
FROM e WHERE ts_us IS NULL
ORDER BY event_id"""

  /** Lag-form sessions under the native operator's STRICT boundary
    * (new session when diff >= gap — `session_window`'s `[ts,
    * ts+gap)` span), emitting window starts (mirrors
    * `Events.sessionizeNative`).
    */
  def sessionizeNativeSql(gapUs: Long = Events.DefaultGapUs): String =
    s"""WITH e AS (
    -- Spark's session_window drops null event-times (window() door)
    SELECT user_id, event_id, epoch_us(ts) AS tus,
      CASE WHEN isfinite(value) AND abs(value) < ${Events.MaxCentsValue}
        THEN CAST(round(value * 100) AS BIGINT) END AS vc
    FROM events WHERE ts IS NOT NULL
  ),
  flagged AS (
    SELECT *, CASE WHEN tus - lag(tus) OVER w >= $gapUs OR lag(tus) OVER w IS NULL
      THEN 1 ELSE 0 END AS new_sess
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
  ),
  numbered AS (
    SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_ix
    FROM flagged
  )
SELECT user_id, min(tus) AS start_us, count(*) AS n_events,
  CAST(sum(vc) AS BIGINT) AS value_cents
FROM numbered GROUP BY user_id, session_ix ORDER BY user_id, start_us"""

  def sessionizeSql(gapUs: Long = Events.DefaultGapUs): String =
    s"""WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS tus,
      CASE WHEN isfinite(value) AND abs(value) < ${Events.MaxCentsValue}
        THEN CAST(round(value * 100) AS BIGINT) END AS vc
    FROM events
  ),
  flagged AS (
    SELECT *, CASE WHEN tus - lag(tus) OVER w > $gapUs OR lag(tus) OVER w IS NULL
      THEN 1 ELSE 0 END AS new_sess
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
  ),
  numbered AS (
    SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_ix
    FROM flagged
  )
SELECT user_id, session_ix, count(*) AS n_events,
  min(tus) AS start_us, max(tus) AS end_us, max(tus) - min(tus) AS duration_us,
  CAST(sum(vc) AS BIGINT) AS value_cents
FROM numbered GROUP BY user_id, session_ix ORDER BY user_id, session_ix"""

  /** [[Events.funnel]]: the identical staged-min chain on micros. */
  def funnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
  u AS (SELECT DISTINCT user_id FROM e),
  v AS (SELECT user_id, min(tus) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY user_id),
  c AS (SELECT e.user_id, min(e.tus) AS t2 FROM e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.tus > v.t1 GROUP BY e.user_id),
  p AS (SELECT e.user_id, min(e.tus) AS t3 FROM e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.tus > c.t2 GROUP BY e.user_id)
SELECT u.user_id,
  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached_stage,
  CAST(coalesce(v.t1, 0) AS BIGINT) AS t1_us,
  CAST(coalesce(c.t2, 0) AS BIGINT) AS t2_us,
  CAST(coalesce(p.t3, 0) AS BIGINT) AS t3_us
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
  LEFT JOIN p USING (user_id)
ORDER BY u.user_id"""

  /** [[Events.attribution]]: the same banded self-join on micros. */
  def attributionSql(windowUs: Long = Events.DefaultAttributionUs): String =
    s"""WITH e AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events
  ),
  c AS (SELECT user_id, event_id AS click_id, tus AS click_us FROM e
        WHERE event_type = 'click'),
  p AS (SELECT user_id, event_id AS purchase_id, tus AS purchase_us FROM e
        WHERE event_type = 'purchase')
SELECT c.user_id, c.click_id, p.purchase_id,
  CAST(p.purchase_us - c.click_us AS BIGINT) AS lag_us
FROM c JOIN p ON c.user_id = p.user_id
  AND p.purchase_us > c.click_us
  AND p.purchase_us <= c.click_us + $windowUs
ORDER BY c.click_id, p.purchase_id"""

  /** [[Events.hourlyDeviation]]: identical hour bucketing, trailing
    * row-frame window, rational basis points.
    */
  def hourlyDeviationSql(trail: Int = 24): String =
    s"""WITH e AS (
    SELECT (epoch_ns(ts) // ${Events.NanosPerHour}) * 3600 AS hour_s, event_type
    FROM events
  ),
  h AS (SELECT hour_s, event_type, count(*) AS n FROM e GROUP BY 1, 2),
  t AS (
    SELECT hour_s, event_type, n,
      coalesce(sum(n) OVER w, 0) AS trail_sum,
      count(*) OVER w AS trail_n
    FROM h
    WINDOW w AS (PARTITION BY event_type ORDER BY hour_s
      ROWS BETWEEN $trail PRECEDING AND 1 PRECEDING)
  )
SELECT hour_s, event_type, n, CAST(trail_n AS BIGINT) AS trail_n,
  CAST(CASE WHEN trail_sum > 0 THEN (n * trail_n * 10000) // trail_sum
       ELSE 10000 END AS BIGINT) AS dev_bp
FROM t ORDER BY hour_s, event_type"""

  /** [[Events.rollingPeaks]]: DuckDB's native RANGE frame over the
    * same nanos, same closed `[ts - window, ts]` interval — hash
    * equality pins that both engines' value-based frames agree on
    * endpoint inclusivity and peer handling.
    */
  def rollingPeaksSql(windowNs: Long = Events.NanosPerDay): String =
    s"""WITH e AS (
    SELECT user_id, epoch_ns(ts) AS tsn,
      CASE WHEN isfinite(value) AND abs(value) < ${Events.MaxCentsValue}
        THEN CAST(round(value * 100) AS BIGINT) END AS vc
    FROM events
  ),
  r AS (
    SELECT user_id,
      count(*) OVER w AS n_roll,
      CAST(sum(vc) OVER w AS BIGINT) AS cents_roll
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY tsn
      RANGE BETWEEN $windowNs PRECEDING AND CURRENT ROW)
  )
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
  CAST(max(n_roll) AS BIGINT) AS peak_n_24h,
  CAST(max(cents_roll) AS BIGINT) AS peak_cents_24h
FROM r GROUP BY user_id ORDER BY user_id"""

  /** [[Events.retention]]: identical epoch-week integer bucketing;
    * cell counts are plain count(*) over the (user, week) distinct —
    * the same no-second-DISTINCT argument.
    */
  def retentionSql: String =
    s"""WITH uw AS (
    SELECT DISTINCT user_id, epoch_us(ts) // ${Events.MicrosPerWeek} AS week
    FROM events
  ),
  cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id),
  cells AS (
    SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
      count(*) AS n_users
    FROM uw JOIN cohort c USING (user_id) GROUP BY 1, 2
  ),
  sizes AS (SELECT cohort_week, n_users AS cohort_size FROM cells
            WHERE week_offset = 0)
SELECT cohort_week, week_offset, n_users,
  CAST(cohort_size AS BIGINT) AS cohort_size,
  CAST((n_users * 10000) // cohort_size AS BIGINT) AS retention_bp
FROM cells JOIN sizes USING (cohort_week)
ORDER BY cohort_week, week_offset"""

  /** Morton interleave replayed with multiply/add arithmetic (the
    * Spark side uses shift/or — independent formulation, same
    * integers): bit i of ub contributes 2^(2i), bit i of hb
    * contributes 2^(2i+1). DuckDB's `//` floors, matching the Spark
    * side's portable floor division of the hour index.
    */
  def zorderMapSql: String = {
    val mask = (1L << graft.operators.ZOrder.Bits) - 1
    val terms = (0 until graft.operators.ZOrder.Bits).map { i =>
      s"((un >> $i) & 1) * ${1L << (2 * i)} + ((hn >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" +\n    ")
    s"""WITH e AS (
  SELECT event_id, user_id & $mask AS ub,
    (epoch_ns(ts) // ${Events.NanosPerHour}) & $mask AS hb
  FROM events
),
s AS (SELECT min(ub) AS xlo, max(ub) AS xhi,
             min(hb) AS ylo, max(hb) AS yhi FROM e),
n AS (
  SELECT event_id, ub, hb,
    ((ub - xlo) * $mask) // greatest(xhi - xlo, 1) AS un,
    ((hb - ylo) * $mask) // greatest(yhi - ylo, 1) AS hn
  FROM e, s
)
SELECT event_id, ub, hb,
  CAST($terms AS BIGINT) AS z
FROM n ORDER BY event_id"""
  }
}
