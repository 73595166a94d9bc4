package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming formulations of the event-time analytics
  * whose batch twins live in [[graft.operators.Events]]: watermarked
  * tumbling-window aggregation, and gap-based sessionization as
  * custom state via `flatMapGroupsWithState`.
  *
  * Both transforms take an input Dataset/DataFrame rather than a
  * path, so the identical pipeline runs from `readStream` (file /
  * Kafka / rate source) in production and from `MemoryStream` in the
  * spec. At cluster scale the stateful operators shard by the
  * grouping key across executors with checkpointed state — exactly
  * the sharding the batch twins express with their one user_id
  * shuffle.
  */
object EventStream {

  /** One event on the wire. `ts` is a real event-time timestamp (the
    * streaming source's responsibility — e.g.
    * `timestamp_micros(nanos div 1000)` for the parquet-nanos
    * encoding used by the batch corpus).
    */
  final case class Event(ts: Timestamp, userId: Long, eventType: String,
      // boxed, deliberately: a primitive Double cannot REPRESENT the
      // null-value rows a real feed carries, so typed deserialization
      // would poison-pill the sessionizer before any in-function
      // guard could run (round-12 review). Null behaves as junk
      // (zero cents), like the batch cents contract.
      value: java.lang.Double)

  /** A closed session emitted by the sessionizer. */
  final case class Session(userId: Long, startMs: Long, endMs: Long,
      nEvents: Long, valueCents: Long)

  /** Open-session state carried between micro-batches. */
  final case class SessionState(startMs: Long, endMs: Long,
      nEvents: Long, valueCents: Long)

  /** Watermarked tumbling 1-hour counts per event type. Streaming
    * disallows exact count-distinct (state would be unbounded), so
    * the user count is the HLL sketch `approx_count_distinct` — the
    * scale answer on a real cluster too.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // the batch cents contract (graft.operators.Events.cents):
      // a non-finite value behaves as SQL NULL. The raw cast was a
      // streaming POISON PILL — the query dies on one NaN row and
      // the checkpoint replays the same batch on every restart
      // (StreamDegenerateSpec).
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.Events.cents(col("value"))).cast("long")
          .as("value_cents"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_cents"), col("approx_users"))

  /** Watermarked SLIDING 1-hour counts every 30 minutes — the
    * overlapping-window kind, completing the tumbling/sliding/session
    * streaming trio. Identical operator mechanics to
    * [[tumblingCounts]]: each event replicates map-side into its two
    * containing windows; state per open window finalizes as the
    * watermark passes window end. The batch twin is
    * [[graft.operators.Events.slidingHourly]] (oracle-green), and the
    * spec runs THIS transform in batch mode against it.
    */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      // NaN-safe cents — the tumblingCounts poison-pill rationale.
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.Events.cents(col("value"))).cast("long")
          .as("value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** Stream-STREAM interval join — the attribution twin of
    * [[graft.operators.Events.attribution]]: clicks and purchases
    * arrive as two independent streams; each purchase joins every
    * click of the same user strictly before it and at most
    * `windowExpr` older. This is the canonical watermarked interval
    * join: the time bound in the join condition plus both watermarks
    * lets the engine EVICT buffered clicks once the purchase-side
    * watermark passes `click_ts + window` (and vice versa), so
    * per-executor state is bounded by window x arrival rate — the
    * unbounded-state trap of a pure equi-join stream-stream join is
    * structurally avoided. Inputs carry prefixed columns
    * (`click_ts`/`purchase_ts`) because both sides must keep their
    * own event-time column through the join.
    *
    * At cluster scale the join shards by `user_id` across executors
    * with checkpointed buffered state — the streaming realization of
    * the batch twin's banded equi-join. The spec proves batch
    * agreement on identical rows and eviction via late-click drop.
    */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      windowExpr: String = "24 hours",
      watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("click_ts", watermark)
    val p = purchases.withWatermark("purchase_ts", watermark)
    c.join(p,
      expr(s"""click_user = purchase_user AND
               purchase_ts > click_ts AND
               purchase_ts <= click_ts + interval $windowExpr"""))
      .select(col("click_user").as("user_id"), col("click_id"),
        col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  /** Gap-based sessionization with explicit state: events group by
    * user; each invocation folds the (unordered) new events into the
    * open session, emitting every session that closes (next event
    * further than `gapMs` away). An event-time timeout at
    * `end + gapMs` flushes the final open session once the watermark
    * passes it — state is bounded by (users with an open session).
    *
    * Semantics note (documented divergence from the batch twin):
    * events older than the current open session's start are treated
    * as late and folded by timestamp order within the delivered
    * batch; events later than the watermark allowance should be
    * dropped upstream by `withWatermark`.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      // an event with NO event time has no place on any timeline —
      // dropped at the transform door (contract). Unfiltered, the
      // state function's ts.getTime is a POISON PILL: the query dies
      // and the checkpoint replays the same null row on every
      // restart (StreamDegenerateSpec).
      .filter((e: Event) => e.ts != null)
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed end + gap: the open session is final.
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startMs, s.endMs, s.nEvents, s.valueCents))
          } else {
            // the shared batch/stream cents contract in +Long state
            // form ([[graft.operators.Events.centsScalar]] — HALF_UP
            // away from zero like Spark's round, junk-as-zero; an
            // inline math.round here both saturated huge finites to
            // Long.MaxValue, wrapping later sums negative, and
            // rounded negative half-cents toward +Infinity, off the
            // batch contract by one — round-12 review + ADVICE).
            // Divergence note: an ALL-junk session reports 0 where
            // the batch twin's sum-of-nulls reports NULL — the typed
            // Long state cannot express null, documented.
            def centsOf(e: Event): Long =
              graft.operators.Events.centsScalar(e.value)
            // String.valueOf: a null event_type must order totally,
            // not NPE the sort comparator.
            val sorted = batch.toSeq.sortBy(e =>
              (e.ts.getTime, String.valueOf(e.eventType), centsOf(e)))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              val cents = centsOf(e)
              open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  open = Some(SessionState(s.startMs, math.max(s.endMs, t),
                    s.nEvents + 1, s.valueCents + cents))
                case Some(s) =>
                  closed += Session(userId, s.startMs, s.endMs, s.nEvents, s.valueCents)
                  open = Some(SessionState(t, t, 1, cents))
                case None =>
                  open = Some(SessionState(t, t, 1, cents))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
