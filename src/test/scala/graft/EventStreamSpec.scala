package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

/** Drives the Structured-Streaming pipelines end to end through
  * MemoryStream micro-batches, and checks the streaming tumbling agg
  * agrees with its batch twin on the same data.
  */
class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  // Base offset of 100 hours: rows at event-time <= the initial
  // watermark (epoch 0) would be dropped as late by the stateful
  // operators, so the scenario must live well past it.
  private val BaseMin = 6000L

  private def ev(minute: Long, user: Long, typ: String, value: Double): Event =
    Event(new Timestamp((BaseMin + minute) * 60000L), user, typ, value)

  private def hourStartS(minute: Long): Long = ((BaseMin + minute) / 60) * 3600

  private def ms(minute: Long): Long = (BaseMin + minute) * 60000L

  test("watermarked tumbling counts match the batch window aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStream.tumblingCounts(
        in.toDF().select(col("ts"), col("eventType").as("event_type"),
          col("userId").as("user_id"), col("value")))
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 1, "click", 1.0), ev(2, 2, "click", 2.5),
        ev(61, 1, "error", 0.5))
      q.processAllAvailable()
      // watermark (2h) far past the first hour -> both windows finalize
      in.addData(ev(300, 3, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .select(unix_timestamp(col("window_start")).as("ws"), col("event_type"),
          col("n"), col("value_cents"))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got.contains((hourStartS(1), "click", 2L, 350L)), s"hour-0 clicks: $got")
      assert(got.contains((hourStartS(61), "error", 1L, 50L)), s"hour-1 errors: $got")
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions on gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // 10-minute gap
    val q = EventStream.sessionize(in.toDS(), gapMs = 10 * 60000L, watermark = "5 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 1 min apart -> one open session
      in.addData(ev(0, 1, "click", 1.0), ev(1, 1, "click", 2.0))
      q.processAllAvailable()
      // user 1 again 30 min later -> closes the first session
      in.addData(ev(31, 1, "click", 4.0))
      q.processAllAvailable()
      val afterGap = spark.table("sessions").as[Session].collect()
      assert(afterGap.toSet == Set(Session(1L, ms(0), ms(1), 2L, 300L)), afterGap.toSeq)
      // advance the watermark far past user 1's open session + gap
      // -> event-time timeout flushes it without new data for user 1
      in.addData(ev(600, 2, "click", 1.0))
      q.processAllAvailable()
      in.addData(ev(1200, 2, "click", 1.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("sessions").as[Session].collect()
      assert(afterTimeout.exists(s => s.userId == 1L && s.startMs == ms(31)
        && s.nEvents == 1L && s.valueCents == 400L), afterTimeout.toSeq)
    } finally q.stop()
  }

  test("streaming parquet file sink: finalized windows land as files") {
    implicit val sqlCtx = spark.sqlContext
    val base = s"${sys.props("java.io.tmpdir")}/graft-stream-sink-${System.nanoTime()}"
    val in = MemoryStream[Event]
    val q = EventStream.tumblingCounts(
        in.toDF().select(col("ts"), col("eventType").as("event_type"),
          col("userId").as("user_id"), col("value")))
      .writeStream.format("parquet")
      .option("path", s"$base/data")
      .option("checkpointLocation", s"$base/chk")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 1, "click", 1.0), ev(2, 2, "click", 2.5))
      q.processAllAvailable()
      // advance watermark far past the first hour so its window flushes
      in.addData(ev(400, 3, "click", 1.0))
      q.processAllAvailable()
      in.addData(ev(800, 3, "click", 1.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/data")
        .select(unix_timestamp(col("window_start")).as("ws"), col("event_type"),
          col("n"), col("value_cents"))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(out.contains((hourStartS(1), "click", 2L, 350L)), s"sinked: $out")
    } finally q.stop()
  }

  test("watermarked sliding counts finalize both containing windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStream.slidingCounts(
        in.toDF().select(col("ts"), col("eventType").as("event_type"),
          col("userId").as("user_id"), col("value")))
      .writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    try {
      // minute 40 of its hour: containing windows start at :00 and :30
      in.addData(ev(40, 1, "click", 1.0))
      q.processAllAvailable()
      in.addData(ev(400, 2, "click", 1.0)) // advance watermark far past
      q.processAllAvailable()
      val got = spark.table("sliding")
        .select(unix_timestamp(col("window_start")).as("ws"), col("event_type"),
          col("n"), col("value_cents"))
        .as[(Long, String, Long, Long)].collect().toSet
      val hourStart = hourStartS(40)
      assert(got.contains((hourStart, "click", 1L, 100L)), s"aligned window: $got")
      assert(got.contains((hourStart + 1800, "click", 1L, 100L)), s"offset window: $got")
    } finally q.stop()
  }

  test("batch sliding agrees with the streaming transform on the parquet corpus") {
    val batch = Events.slidingHourly(spark, sf0001)
      .select("window_start_s", "event_type", "n", "value_cents")
      .as[(Long, String, Long, Long)].collect().toSet
    val viaStreamTransform = {
      val e = Events.nanos(spark, sf0001)
        .select(timestamp_micros(expr("ts div 1000")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
      EventStream.slidingCounts(e)
        .select(unix_timestamp(col("window_start")).as("ws"), col("event_type"),
          col("n"), col("value_cents"))
        .as[(Long, String, Long, Long)].collect().toSet
    }
    assert(batch == viaStreamTransform)
    assert(batch.nonEmpty)
  }

  test("stream-stream interval join emits pairs across micro-batches and drops out-of-window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventStreamSpec.Click]
    val purchases = MemoryStream[EventStreamSpec.Purchase]
    val q = EventStream.attribution(clicks.toDF(), purchases.toDF(),
        windowExpr = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    def click(minute: Long, user: Long, id: Long) =
      EventStreamSpec.Click(new Timestamp((BaseMin + minute) * 60000L), user, id)
    def purchase(minute: Long, user: Long, id: Long) =
      EventStreamSpec.Purchase(new Timestamp((BaseMin + minute) * 60000L), user, id)
    try {
      // click in batch 1; its purchase only arrives in batch 2 —
      // the join must buffer the click as state across batches.
      clicks.addData(click(0, 1, 100), click(5, 2, 101))
      q.processAllAvailable()
      purchases.addData(purchase(10, 1, 200))
      q.processAllAvailable()
      // same-user purchase OUTSIDE the 30-min window: no pair.
      purchases.addData(purchase(45, 2, 201))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user_id", "click_id", "purchase_id", "lag_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 100L, 200L, 10L * 60000000L)), got)
    } finally q.stop()
  }

  test("streaming attribution transform agrees with the batch twin on the parquet corpus") {
    val batch = Events.attribution(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    val e = Events.nanos(spark, sf0001)
      .select(timestamp_micros(expr("ts div 1000")).as("ts"),
        col("event_id"), col("user_id"), col("event_type"))
    val viaStreamTransform = EventStream.attribution(
        e.where(col("event_type") === "click")
          .select(col("ts").as("click_ts"), col("user_id").as("click_user"),
            col("event_id").as("click_id")),
        e.where(col("event_type") === "purchase")
          .select(col("ts").as("purchase_ts"), col("user_id").as("purchase_user"),
            col("event_id").as("purchase_id")))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch == viaStreamTransform)
    assert(batch.nonEmpty)
  }

  test("batch tumbling agrees with streaming on the parquet corpus") {
    // batch twin over sf0.001, vs the streaming transform run in
    // batch mode on the same converted input (Spark executes batch
    // DataFrames through the same window operator).
    val batch = Events.tumblingHourly(spark, sf0001)
      .select("window_start_s", "event_type", "n", "value_cents")
      .as[(Long, String, Long, Long)].collect().toSet
    val viaStreamTransform = {
      val e = Events.nanos(spark, sf0001)
        .select(timestamp_micros(expr("ts div 1000")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
      EventStream.tumblingCounts(e)
        .select(unix_timestamp(col("window_start")).as("ws"), col("event_type"),
          col("n"), col("value_cents"))
        .as[(Long, String, Long, Long)].collect().toSet
    }
    assert(batch == viaStreamTransform)
  }

  test("scalar cents contract equals the batch Column contract on every admissible value") {
    // round-12 ADVICE: the sessionizer's math.round rounded negative
    // exact half-cents toward +Infinity (-0.125 -> -12) where the
    // batch round(v*100, 0) is HALF_UP away from zero (-13). Pin
    // scalar == Column over the sign/half-cent corners and a random
    // grid; junk values (the Column's NULL rows) pin to scalar 0.
    val corners = Seq(-0.125, 0.125, -0.115, 0.115, -0.005, 0.005,
      -1.005, 1.005, 0.0, -0.0, 2.675, -2.675, 1e12 + 0.005, -(1e12 + 0.005))
    val rnd = new scala.util.Random(7)
    val randoms = Seq.fill(500)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(8)))
    val vals = corners ++ randoms
    val viaColumn = vals.toDF("v")
      .select(expr("round(v * 100, 0)").cast("long")).as[Long].collect()
    val viaScalar = vals.map(v => Events.centsScalar(v))
    assert(viaScalar.toSeq === viaColumn.toSeq)
    for (junk <- Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 1e17, -1e17, 9.3e16))
      assert(Events.centsScalar(junk) === 0L, s"junk $junk")
    assert(Events.centsScalar(null) === 0L)
  }
}

object EventStreamSpec {
  /** Wire types for the two attribution input streams (prefixed
    * columns: each side keeps its own event-time through the join).
    */
  final case class Click(click_ts: java.sql.Timestamp, click_user: Long, click_id: Long)
  final case class Purchase(purchase_ts: java.sql.Timestamp, purchase_user: Long, purchase_id: Long)
}
