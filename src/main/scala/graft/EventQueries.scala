package graft

import graft.operators.Events
import graft.oracle.EventOracle

/** Registered queries for the batch event-time family (SURVEY §2.11
  * extension; streaming twins in [[graft.streaming.EventStream]]).
  */
object EventQueries {

  val all: Seq[Q] = Seq(
    Q("events_tumbling_hourly",
      (s, dir) => Events.tumblingHourly(s, dir),
      Some(EventOracle.tumblingHourlySql)),
    Q("events_sliding_hourly",
      (s, dir) => Events.slidingHourly(s, dir),
      Some(EventOracle.slidingHourlySql)),
    Q("events_sessionized",
      (s, dir) => Events.sessionize(s, dir),
      Some(EventOracle.sessionizeSql())),
    Q("events_session_window_native",
      (s, dir) => Events.sessionizeNative(s, dir),
      Some(EventOracle.sessionizeNativeSql())),
    Q("events_asof_order",
      (s, dir) => Events.asofLatestOrder(s, dir),
      Some(EventOracle.asofLatestOrderSql)),
    Q("events_asof_catalyst",
      (s, dir) => Events.asofLatestOrderCatalyst(s, dir),
      Some(EventOracle.asofLatestOrderSql)),
    // ordered view -> click -> purchase conversion funnel.
    Q("events_funnel",
      (s, dir) => Events.funnel(s, dir),
      Some(EventOracle.funnelSql)),
    // interval join: click -> purchase pairs within the window.
    Q("events_attribution",
      (s, dir) => Events.attribution(s, dir),
      Some(EventOracle.attributionSql())),
    // cohort retention matrix: first-seen-week cohorts x activity
    // week offset, exact integer weeks and basis points.
    Q("events_retention",
      (s, dir) => Events.retention(s, dir),
      Some(EventOracle.retentionSql)),
    // monitoring rung: hourly counts vs the trailing 24 observed
    // buckets per type, exact rational basis points.
    Q("events_hourly_deviation",
      (s, dir) => Events.hourlyDeviation(s, dir),
      Some(EventOracle.hourlyDeviationSql())),
    // RANGE-frame rolling window: per-user trailing-24h burst peaks
    // over the raw event timeline (value-based frame, one shuffle).
    Q("events_rolling_peaks",
      (s, dir) => Events.rollingPeaks(s, dir),
      Some(EventOracle.rollingPeaksSql())),
    // z-order (Morton) bucket map: the 2-D lake-layout key that
    // makes per-user AND per-time box predicates skip row groups
    // (layout proof on real parquet footers in ZOrderSpec).
    Q("events_zorder_map",
      (s, dir) => operators.ZOrder.zMap(s, dir),
      Some(EventOracle.zorderMapSql)))
}
