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
    SELECT epoch_ns(ts) AS tns, event_type, user_id,
      CAST(round(value * 100) AS BIGINT) AS vc
    FROM events
  )
SELECT (tns // ${Events.NanosPerHour}) * 3600 AS window_start_s, event_type,
  count(*) AS n, CAST(sum(vc) AS BIGINT) AS value_cents,
  count(DISTINCT user_id) AS n_users
FROM e GROUP BY 1, 2 ORDER BY 1, 2"""

  def sessionizeSql(gapUs: Long = Events.DefaultGapUs): String =
    s"""WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS tus,
      CAST(round(value * 100) AS BIGINT) AS vc
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
}
