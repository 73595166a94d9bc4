package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-time analytics over the `events` table (SURVEY §2.11's
  * streaming-shaped extension): tumbling-window aggregation via the
  * real `window()` operator and gap-based sessionization. The
  * streaming formulations of the same computations live in
  * [[graft.streaming.EventStream]]; these batch twins are the
  * oracle-checkable surface.
  *
  * `events.parquet` stores TIMESTAMP(NANOS), which Spark reads as
  * bigint nanos under `spark.sql.legacy.parquet.nanosAsLong` — the
  * session-wide setting. Windowing converts to a real timestamp
  * (micros — hour boundaries are integral micros, so bucketing is
  * unaffected) to exercise the native operator; outputs carry epoch
  * seconds / micros as exact bigints for oracle parity (micros is
  * the precision DuckDB's TIMESTAMP retains from parquet nanos).
  *
  * Scale posture: one scan; the tumbling agg shuffles once on the
  * (window, event_type) grouping with map-side partials. The
  * sessionization's lag window, running sum, and per-session re-agg
  * all cluster on `user_id` — the two windows share one sort, and
  * the final groupBy's (user_id, session_ix) clustering is satisfied
  * by the existing user_id hash partitioning, so the whole
  * sessionize is ONE shuffle end to end.
  */
object Events {

  /** Floor division as a SQL fragment: Spark's `div` truncates toward
    * zero while the DuckDB oracle's `//` floors, so pre-epoch
    * (negative) timestamps would bucket one unit apart under plain
    * `div`. `(a - pmod(a, b)) div b` is exact floor division in pure
    * integer arithmetic (pmod is non-negative, the difference is
    * divisible by b) — engine-portable for ANY ts sign, closing the
    * round-7 ADVICE caveat that the integer-division claim held only
    * for non-negative ts.
    */
  private def floorDivSql(a: String, b: Long): String =
    s"(($a) - pmod($a, ${b}L)) div ${b}L"

  val NanosPerHour: Long = 3600L * 1000L * 1000L * 1000L

  val MicrosPerHour: Long = 3600L * 1000L * 1000L

  /** Default session gap: 6 hours (the synthetic corpus averages
    * ~11 h between events per user, so this yields a real mix of
    * session lengths). Session timestamps are MICROSECONDS: DuckDB's
    * TIMESTAMP truncates the parquet nanos to micros, so the oracle
    * can only see micro precision — both engines therefore compute
    * on `ts div 1000` and emit `_us` columns.
    */
  val DefaultGapUs: Long = 6 * MicrosPerHour

  private def raw(spark: SparkSession, dir: String): DataFrame =
    nanos(spark, dir)

  /** `value` -> exact integer cents, TOTAL over crawl-grade inputs:
    * a non-finite value (NaN/±Inf) OR a finite one whose cents
    * exceed Long range (a corrupted meter / float-serialization
    * artifact is as likely to be 1e200 as NaN — round-12 review) is
    * junk and behaves as SQL NULL (excluded from sums, like a null
    * value), where the raw `round(v*100).cast(long)` is an ANSI
    * CAST_OVERFLOW crash — one bad row aborting every windowed
    * aggregation over the feed, and in streaming a poison pill
    * (found by `DegenerateLakeSpec`/`StreamDegenerateSpec`). The
    * bound is conservative (9.2e16 < Long.MaxValue/100, so the
    * rounded product can never overflow); real corpora carry no
    * such values, so oracle hashes are unchanged.
    */
  private[graft] val MaxCentsValue: Double = 9.2e16

  private[graft] def cents(c: Column): Column =
    when(!isnan(c) && abs(c) < lit(MaxCentsValue),
      round(c * 100, 0).cast("long"))

  /** Driver-side scalar twin of [[cents]] for TYPED streaming state
    * (the sessionizer's +Long accumulator cannot evaluate a Column):
    * the same HALF_UP away-from-zero rounding Spark's `round` codegen
    * performs (`java.math.BigDecimal.valueOf(v*100).setScale(0,
    * HALF_UP)`) — `math.round` is half-up toward +Infinity and
    * diverged from the batch contract on negative exact half-cents
    * (-0.125 -> -12 where batch says -13; round-12 ADVICE). Junk
    * (null / non-finite / beyond [[MaxCentsValue]]) is ZERO cents
    * here where the Column twin yields SQL NULL: typed Long state
    * cannot express null — the one documented divergence, visible
    * only on an all-junk session. `EventStreamSpec` pins scalar ==
    * Column equality over a sign/half-cent/random grid.
    */
  private[graft] def centsScalar(v: java.lang.Double): Long =
    if (v == null || !java.lang.Double.isFinite(v) ||
      math.abs(v) >= MaxCentsValue) 0L
    else java.math.BigDecimal.valueOf(v * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Adaptive events scan: the corpus has shipped `ts` both as
    * TIMESTAMP(NANOS) parquet (read as bigint nanos under the
    * session's `nanosAsLong`) and as TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ). Every downstream formulation computes in ONE
    * integer time domain — epoch nanos — so normalize at the scan
    * edge instead of branching in each operator. The NTZ→LTZ cast is
    * an identity on the stored micros under the session's UTC
    * timezone, which is also how the DuckDB oracle reads the column
    * (`epoch_ns` on a naive TIMESTAMP), so both engines keep seeing
    * the same integers. Column-level map only: pushdown/pruning on
    * the other columns is unaffected.
    */
  def nanos(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  /** Tumbling 1-hour windows per event type: event count, exact cents
    * sum, distinct users. Uses the native `window()` operator over
    * the nanos-derived timestamp.
    */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    raw(spark, dir)
      .select(timestamp_micros(expr(floorDivSql("ts", 1000))).as("ts_t"),
        col("event_type"), col("user_id"),
        cents(col("value")).as("vc"))
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum("vc").cast("long").as("value_cents"),
        countDistinct("user_id").as("n_users"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n"), col("value_cents"), col("n_users"))
      .orderBy("window_start_s", "event_type")

  /** Sliding 1-hour windows every 30 minutes per event type: the
    * overlapping-window kind ([[tumblingHourly]] and the session
    * forms cover the other two). The native `window()` with a slide
    * replicates each event into the (size/slide)=2 windows containing
    * it BEFORE the aggregation — map-side, no self-join — then one
    * (window, event_type) shuffle with partial aggregation exactly
    * like the tumbling form, at 2× the pre-combine row volume. The
    * oracle derives the same two window starts arithmetically per
    * event, so hash equality pins the native operator's assignment
    * rule.
    */
  def slidingHourly(spark: SparkSession, dir: String): DataFrame =
    raw(spark, dir)
      .select(timestamp_micros(expr(floorDivSql("ts", 1000))).as("ts_t"),
        col("event_type"),
        cents(col("value")).as("vc"))
      .groupBy(window(col("ts_t"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("vc").cast("long").as("value_cents"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n"), col("value_cents"))
      .orderBy("window_start_s", "event_type")

  /** Gap-based sessionization: a session breaks when a user is idle
    * longer than `gapNs`. Batch formulation of the classic
    * lag -> new-session flag -> running sum -> per-session rollup.
    */
  def sessionize(spark: SparkSession, dir: String,
      gapUs: Long = DefaultGapUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    raw(spark, dir)
      .select(col("user_id"), col("event_id"), expr(floorDivSql("ts", 1000)).as("tus"),
        cents(col("value")).as("vc"))
      .withColumn("prev", lag("tus", 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_ix",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy("user_id", "session_ix")
      .agg(count(lit(1)).as("n_events"),
        min("tus").as("start_us"), max("tus").as("end_us"),
        (max("tus") - min("tus")).as("duration_us"),
        sum("vc").cast("long").as("value_cents"))
      .orderBy("user_id", "session_ix")
  }

  /** As-of join: each event picks the latest order of the same
    * customer at-or-before the event time (the point-in-time lookup
    * every feature/training pipeline needs — "state as of then", no
    * leakage from the future).
    *
    * Spark has no asof operator; the naive range join
    * (`e.user = o.cust AND o.date <= e.ts` + max-per-event) explodes
    * to Ω(events x orders-per-user) before aggregating. This is the
    * scale-correct union-window formulation instead: tag order rows 0
    * and event rows 1, union, and take the running
    * `last(order, ignoreNulls)` over (user, time, tag) — ONE shuffle
    * on user_id, one sort, output exactly |events|. Orders sort
    * before events at the same instant, so "at-or-before" includes
    * equality; orders are pre-deduped to max(o_orderkey) per
    * (customer, date) so the pick is deterministic under date ties.
    * The DuckDB oracle is its native ASOF LEFT JOIN over the same
    * deduped orders — an independent implementation of the same
    * semantics.
    *
    * Timestamps are micros (`_us`), the established events-family
    * precision contract (DuckDB sees parquet nanos as micros).
    */
  def asofLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    val ev = raw(spark, dir)
      .select(col("user_id").as("key"), expr(floorDivSql("ts", 1000)).as("tus"),
        lit(1).as("tag"), col("event_id"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("long").as("order_us"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("o_orderkey"))
      .select(col("o_custkey").as("key"), expr("unix_micros(cast(o_orderdate as timestamp))").as("tus"),
        lit(0).as("tag"), lit(null).cast("long").as("event_id"),
        col("o_orderkey"), expr("unix_micros(cast(o_orderdate as timestamp))").as("order_us"))
    val w = Window.partitionBy("key").orderBy("tus", "tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("asof_orderkey", last("o_orderkey", ignoreNulls = true).over(w))
      .withColumn("asof_order_us", last("order_us", ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col("event_id"), col("key").as("user_id"), col("tus").as("ts_us"),
        col("asof_orderkey").as("o_orderkey"),
        col("asof_order_us").as("order_us"),
        (col("tus") - col("asof_order_us")).as("staleness_us"))
      .orderBy("event_id")
  }

  /** Sessionization through the NATIVE `session_window` operator —
    * the same grouping the lag formulation computes, via Spark's
    * built-in merging session windows (one shuffle; also the exact
    * shape Structured Streaming's session windows use, so batch and
    * stream share the operator). Boundary semantics differ from the
    * lag form at exactly-gap spacing: a session window spans
    * `[ts, ts + gap)`, so an event landing exactly `gap` after the
    * previous one starts a NEW session (strict <), where the lag
    * form's `diff > gap` test keeps it (inclusive). The oracle
    * mirrors the strict semantics explicitly.
    */
  def sessionizeNative(spark: SparkSession, dir: String,
      gapUs: Long = DefaultGapUs): DataFrame =
    raw(spark, dir)
      .select(col("user_id"), timestamp_micros(expr(floorDivSql("ts", 1000))).as("ts_t"),
        cents(col("value")).as("vc"))
      .groupBy(col("user_id"),
        session_window(col("ts_t"), s"$gapUs microseconds").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("vc").cast("long").as("value_cents"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        col("n_events"), col("value_cents"))
      .orderBy("user_id", "start_us")

  /** [[asofLatestOrder]] through the custom Catalyst operator
    * ([[graft.plans.AsOfJoin]]) instead of the union-window
    * composition — same semantics, same oracle, different planner
    * path (preference-ladder (c) vs (a)); registered as a
    * cross-check of the custom operator against DuckDB's native
    * ASOF JOIN.
    */
  def asofLatestOrderCatalyst(spark: SparkSession, dir: String): DataFrame = {
    val ev = raw(spark, dir)
      .select(col("event_id"), col("user_id"), expr(floorDivSql("ts", 1000)).as("ts_us"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("o_orderkey"))
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("order_us"),
        col("o_orderkey"))
    graft.plans.AsOfJoin.joinLatest(ev, "user_id", "ts_us", ord, "o_custkey", "order_us")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("o_orderkey"), col("order_us"),
        (col("ts_us") - col("order_us")).as("staleness_us"))
      .orderBy("event_id")
  }

  /** Ordered conversion funnel (view -> click -> purchase): per user,
    * the earliest `view`, the earliest `click` STRICTLY after it, and
    * the earliest `purchase` strictly after that — the sequential
    * pattern product analytics means by "funnel", which a plain
    * per-type min cannot express (a click before any view must not
    * count). Every user emits a row with the stage reached (0-3) and
    * the nano timestamps of each completed stage (0 when absent), so
    * drop-off per stage is a trivial rollup of this frame.
    *
    * Timestamps are microseconds (`ts div 1000`): DuckDB's TIMESTAMP
    * reads the parquet nanos at micro precision, so micros are the
    * finest engine-portable unit — both engines compare and emit the
    * identical bigints.
    *
    * Scale posture (100 TB): three user-keyed aggregations, each with
    * map-side partial `min`; every join is a user_id equi-join whose
    * right side shrinks stage over stage (users-who-viewed ⊇
    * users-who-clicked-after ⊇ ...). AQE handles the shrink; no
    * window over the full event stream, no per-user event collection
    * — state per user is three longs, the streaming-friendly shape.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = raw(spark, dir)
      .select(col("user_id"), col("event_type"), expr(floorDivSql("ts", 1000)).as("tus"))
    val u = e.select("user_id").distinct()
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("tus").as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id")).where(col("tus") > col("t1"))
      .groupBy("user_id").agg(min("tus").as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, Seq("user_id")).where(col("tus") > col("t2"))
      .groupBy("user_id").agg(min("tus").as("t3"))
    u.join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("reached_stage",
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L)
          .otherwise(0L))
      .select(col("user_id"), col("reached_stage"),
        coalesce(col("t1"), lit(0L)).as("t1_us"),
        coalesce(col("t2"), lit(0L)).as("t2_us"),
        coalesce(col("t3"), lit(0L)).as("t3_us"))
      .orderBy("user_id")
  }

  /** Default attribution window: 24 h (the synthetic corpus averages
    * ~11 h between events per user, so day-scale windows produce a
    * real pair population).
    */
  val DefaultAttributionUs: Long = 24 * MicrosPerHour

  /** Click->purchase attribution pairs: every (click, purchase) of
    * the same user with the purchase STRICTLY after the click and
    * within `windowUs` — the interval-join kind (vs [[funnel]]'s
    * sequential-min and [[asofLatestOrder]]'s point-in-time kinds).
    * Emits the pair ids and the exact lag so downstream attribution
    * models (last-touch, time-decay) are rollups of this frame.
    *
    * Scale posture (100 TB): a user_id EQUI-join carries the time
    * band as a residual predicate — the pair blowup is bounded by
    * per-user window density, never |clicks| x |purchases| globally.
    * A hot user (bot traffic) concentrates its pairs on one task;
    * the fix at scale is banding the equi-key by coarse time bucket
    * (click day d joins purchase days {d, d+1}) — same output, key
    * cardinality x days — which is exactly the shape the streaming
    * twin's watermarked state takes for free. Streaming twin:
    * [[graft.streaming.EventStream.attribution]], spec-proven
    * batch-equal.
    */
  def attribution(spark: SparkSession, dir: String,
      windowUs: Long = DefaultAttributionUs): DataFrame = {
    val e = raw(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr(floorDivSql("ts", 1000)).as("tus"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("tus").as("click_us"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("tus").as("purchase_us"))
    c.join(p, Seq("user_id"))
      .where(col("purchase_us") > col("click_us") &&
        col("purchase_us") <= col("click_us") + windowUs)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_us") - col("click_us")).as("lag_us"))
      .orderBy("click_id", "purchase_id")
  }

  /** Epoch week length in microseconds (weeks indexed from the epoch,
    * not calendar-aligned — pure integer division, engine-portable).
    */
  val MicrosPerWeek: Long = 7L * 24 * MicrosPerHour

  /** Hourly volume deviation — the monitoring rung over the window
    * family: each (hour, event_type) bucket's count against the
    * trailing `trail` OBSERVED buckets of the same type (row-frame,
    * deliberately: empty hours emit no bucket, so the baseline is
    * "recent observed traffic", robust to idle gaps), in exact basis
    * points via the rational form `n * trail_n * 10000 div
    * trail_sum`. Buckets with no history report the 10000 baseline
    * (`trail_n` says how much history backs each number — 0 marks
    * the convention rows).
    *
    * Scale posture (100 TB): one scan -> row-local hour bucketing ->
    * one (hour, type) aggregation with map-side partials; the
    * trailing window partitions by event_type — each partition is
    * one type's hour SERIES (corpus-volume-independent: ~9k rows per
    * type per decade), the legitimate single-partition series case,
    * and the bucketed two-pass (shardPacking's) is the escape if a
    * type's span ever outgrows it.
    */
  def hourlyDeviation(spark: SparkSession, dir: String,
      trail: Int = 24): DataFrame = {
    val hourly = raw(spark, dir)
      .select(expr(s"(${floorDivSql("ts", NanosPerHour)}) * 3600").as("hour_s"),
        col("event_type"))
      .groupBy("hour_s", "event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour_s")
      .rowsBetween(-trail, -1)
    hourly
      .withColumn("trail_sum", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("trail_n", count(lit(1)).over(w))
      .select(col("hour_s"), col("event_type"), col("n"), col("trail_n"),
        expr("""cast(case when trail_sum > 0
                then (n * trail_n * 10000) div trail_sum
                else 10000 end as bigint)""").as("dev_bp"))
      .orderBy("hour_s", "event_type")
  }

  val NanosPerDay: Long = 24L * NanosPerHour

  /** Per-user trailing-24h activity peaks — the RANGE-frame window
    * kind ([[hourlyDeviation]] is the row-frame kind): for every
    * event, the count and exact cents sum of that user's events in
    * the closed interval `[ts - window, ts]` via
    * `Window.rangeBetween` over the raw nanos — a value-based frame
    * the bucketed forms cannot express (an event 23h59m before
    * another lands in its frame; hour buckets would split them).
    * Collapsed to per-user peaks (max rolling count / max rolling
    * cents — independent maxima, each its own burst) plus the total
    * event count, so the output is |users|-bounded while the frame
    * computation still runs over every event.
    *
    * Frame semantics pinned by the oracle: both engines treat RANGE
    * frames as value-inclusive on both endpoints and include ALL
    * peer rows of a tied `ts`, so duplicate timestamps cannot
    * diverge.
    *
    * Scale posture (100 TB): one scan; the window partitions by
    * `user_id` — per-user series, corpus-volume-independent — and
    * Spark's range-frame executor keeps only the rows inside the
    * sliding frame buffered (bounded by one user's 24h burst, not
    * their history). The final per-user groupBy clusters on the
    * SAME key, so the window's hash partitioning satisfies it: one
    * data shuffle end to end (spec-pinned; the trailing orderBy adds
    * only the presentation sort's range exchange over |users| rows).
    */
  def rollingPeaks(spark: SparkSession, dir: String,
      windowNs: Long = NanosPerDay): DataFrame =
    rollingPeaksOf(raw(spark, dir), windowNs)

  /** [[rollingPeaks]] over an arbitrary events frame (fixture seam:
    * needs `user_id`, `ts` nanos, `value`). */
  def rollingPeaksOf(events: DataFrame, windowNs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rangeBetween(-windowNs, 0)
    events
      .select(col("user_id"), col("ts"),
        cents(col("value")).as("vc"))
      .withColumn("n_roll", count(lit(1)).over(w))
      .withColumn("cents_roll", sum("vc").over(w).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max("n_roll").as("peak_n_24h"),
        max("cents_roll").as("peak_cents_24h"))
      .orderBy("user_id")
  }

  /** Cohort retention matrix: users bucketed by first-seen epoch week
    * (their cohort), counted in each later week they were active —
    * the third classic event-analytics kind beside [[funnel]]
    * (sequential) and [[attribution]] (interval). Emits
    * `(cohort_week, week_offset, n_users, cohort_size, retention_bp)`
    * per (cohort, offset) cell; offset 0 is the cohort itself, so
    * `n_users = cohort_size` there and retention_bp = 10000.
    *
    * Exactness: after the (user, week) distinct, a user contributes
    * at most one row per (cohort, offset) cell, so the cell count is
    * a plain `count(*)` — no second DISTINCT. All arithmetic is
    * integer (epoch-week floor division, basis points via div).
    *
    * Scale posture (100 TB): one scan -> (user, week) distinct (the
    * only event-volume shuffle, with map-side partials); cohorts are
    * a user-keyed aggregation of that already-small frame; the join
    * back is a user-keyed equi-join (AQE broadcasts the cohort side
    * when small, shuffles when not — no hint, the drop-list rule);
    * the cell rollup and the offset-0 self-join both operate on
    * O(users x active-weeks) rows, orders below event volume.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val uw = raw(spark, dir)
      .select(col("user_id"),
        expr(floorDivSql("ts", 1000L * MicrosPerWeek)).as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    val cells = uw.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells.where(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(sizes, Seq("cohort_week"))
      .withColumn("retention_bp",
        expr("cast((n_users * 10000) div cohort_size as bigint)"))
      .orderBy("cohort_week", "week_offset")
  }
}
