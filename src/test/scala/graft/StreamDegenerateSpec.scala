package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{DedupStream, EventStream, SearchStream, SimStream, TextStream}

/** The degenerate-corpus discipline extended to the STREAMING paths
  * (the [[DegenerateLakeSpec]] lens, streaming half): in batch, a
  * poison row aborts one job; in streaming it KILLS the query and the
  * checkpoint REPLAYS the same micro-batch on restart — the classic
  * poison-pill loop, where one malformed record halts ingest forever.
  * Every maintainer / transform below must process a micro-batch
  * carrying the degenerate shapes (null event times, NaN values, null
  * text/source, negative ids, junk vectors) and continue.
  */
class StreamDegenerateSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(minute: Long): Timestamp = new Timestamp(6000L * 60000L + minute * 60000L)

  final case class DocRow(ts: Timestamp, doc_id: Long, text: String,
      lang: String, source: String)

  final case class Chg(doc_id: Long, seq: java.lang.Long, op: String,
      text: String, lang: String, source: String)

  private def degenerateDocs(b: Int): Seq[DocRow] = Seq(
    DocRow(ts(b * 10), b * 100 + 1, "", "en", "srcA"),
    DocRow(ts(b * 10 + 1), b * 100 + 2, null, "en", "srcA"),
    DocRow(ts(b * 10 + 2), b * 100 + 3, "a b", null, null),
    DocRow(ts(b * 10 + 3), -(b * 100 + 4), "x y z w v u t s r q p o", "en", "srcB"),
    DocRow(ts(b * 10 + 4), b * 100 + 5,
      (1 to 20).map(i => s"m$i").mkString(" "), "en", "srcC"))

  test("every text-family maintainer survives degenerate micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val starts: Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.streaming.StreamingQuery)] = Seq(
      ("positional", df => TextStream.maintainPositional(
        df, tmp("sdeg-pos-delta"), tmp("sdeg-pos-ck"))),
      ("histogram", df => TextStream.maintain(
        df, tmp("sdeg-hist-delta"), tmp("sdeg-hist-ck"))),
      ("sketch", df => TextStream.maintainTermSketch(
        df, tmp("sdeg-sk-delta"), tmp("sdeg-sk-ck"))),
      ("winnow", df => TextStream.maintainWinnowSketch(
        df, tmp("sdeg-win-delta"), tmp("sdeg-win-ck"))),
      ("linecounts", df => TextStream.maintainLineCounts(
        df, tmp("sdeg-lc-delta"), tmp("sdeg-lc-ck"))))
    val failures = starts.flatMap { case (name, start) =>
      val in = MemoryStream[DocRow]
      in.addData(degenerateDocs(0): _*)
      try {
        val q = start(in.toDF().drop("ts"))
        try { q.processAllAvailable(); None } finally q.stop()
      } catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", "\n"))
  }

  test("streaming event windows survive null timestamps and NaN values") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import EventStream.Event
    val rows = Seq(
      Event(ts(0), 1L, "view", 1.0),
      Event(ts(1), 1L, "click", Double.NaN),   // NaN value
      Event(null, 2L, "view", 2.0),            // null event time
      Event(ts(2), -3L, null, 3.0),            // negative id, null type
      Event(ts(3), 2L, "purchase", Double.PositiveInfinity),
      Event(ts(4), 4L, "error", 1e17),         // finite, cents overflow Long
      Event(ts(5), 5L, "signup", null))        // null value
    for ((name, mk) <- Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)](
      ("tumbling", df => EventStream.tumblingCounts(df)),
      ("sliding", df => EventStream.slidingCounts(df)))) {
      val in = MemoryStream[Event]
      in.addData(rows: _*)
      val q = mk(in.toDF().withColumnRenamed("eventType", "event_type")
          .withColumnRenamed("userId", "user_id"))
        .writeStream.format("memory").queryName(s"sdeg_$name")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // advance the watermark so the degenerate windows finalize.
        in.addData(Event(ts(600), 9L, "view", 1.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"sdeg_$name")
      // the NaN / huge-finite / null-value events' windows finalized
      // WITH the events counted and their cents excluded (the batch
      // cents contract, streamed); a sliding event lands in its two
      // containing windows. An unguarded round(1e17*100).cast(long)
      // would have killed the query (CAST_OVERFLOW poison pill).
      val expectRows = if (name == "sliding") 2 else 1
      for (etype <- Seq("click", "error", "signup")) {
        val rows = got.where(col("event_type") === etype).collect()
        assert(rows.length === expectRows &&
          rows.forall(r => r.getLong(2) === 1L && r.isNullAt(3)),
          s"$name/$etype: ${rows.mkString}")
      }
    }
  }

  test("stateful sessionization survives null timestamps and NaN values") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import EventStream.{Event, Session}
    val in = MemoryStream[Event]
    in.addData(
      Event(ts(0), 1L, "view", 1.0),
      Event(ts(1), 1L, "click", Double.NaN),
      Event(null, 1L, "view", 2.0),
      Event(ts(2), 1L, "view", null),  // null value: zero cents
      Event(ts(3), 1L, "view", 1e17),  // huge finite: zero cents, no
                                       // Long.MaxValue saturation wrap
      Event(ts(2), -3L, "view", 4.0))
    val q = EventStream.sessionize(in.toDS(), gapMs = 5 * 60000L)
      .writeStream.format("memory").queryName("sdeg_sess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      in.addData(Event(ts(600), 9L, "view", 1.0)) // push the watermark
      q.processAllAvailable()
      in.addData(Event(ts(1200), 9L, "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("sdeg_sess").as[Session].collect()
    // user 1's session closed with every timestamped event (the
    // null-ts event has no place on any timeline — dropped); NaN,
    // null and cents-overflow values each contribute ZERO cents
    // (never a saturated Long.MaxValue wrapping later sums); the
    // negative-id user sessionizes.
    val u1 = sessions.filter(_.userId == 1L)
    assert(u1.length === 1 && u1.head.nEvents === 4L && u1.head.valueCents === 100L,
      sessions.mkString(", "))
    assert(sessions.exists(_.userId == -3L), sessions.mkString(", "))
  }

  test("stream-stream attribution join survives null timestamps") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    final case class Click(click_ts: Timestamp, click_user: Long, click_id: Long)
    final case class Purchase(purchase_ts: Timestamp, purchase_user: Long, purchase_id: Long)
    val c = MemoryStream[(Timestamp, Long, Long)]
    val p = MemoryStream[(Timestamp, Long, Long)]
    c.addData((ts(0), 1L, 10L), (null, 1L, 11L), (ts(1), -2L, 12L))
    p.addData((ts(2), 1L, 20L), (null, 1L, 21L), (ts(3), -2L, 22L))
    val q = EventStream.attribution(
        c.toDF().toDF("click_ts", "click_user", "click_id"),
        p.toDF().toDF("purchase_ts", "purchase_user", "purchase_id"))
      .writeStream.format("memory").queryName("sdeg_attr")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("sdeg_attr").collect()
    // null-ts rows join nothing (no order exists against them); the
    // timestamped pairs attribute, negative ids included.
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSet
      === Set((10L, 20L), (12L, 22L)), got.mkString(", "))
  }

  test("streaming dedup and search-serving survive degenerate rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // exact + near dedup over null/empty/NBSP text.
    val in = MemoryStream[DocRow]
    in.addData(degenerateDocs(0): _*)
    val q1 = DedupStream.dedupNearSignature(
        in.toDF().select(col("ts"), col("doc_id"), col("text")), "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdeg_near")
      .outputMode("append").start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.table("sdeg_near").count() >= 4L) // nulls pass through

    // search serving over a degenerate query batch (null / NBSP /
    // empty attributes; includes an all-null row prepareInput drops).
    val idx = sources.IndexBuilder.cached(spark, sf0001)
    val queries = MemoryStream[(String, String)]
    queries.addData((null, null), ("", ""), (" ", "BUILDING"),
      ("Customer one", null))
    var served = 0L
    val q2 = SearchStream.serve(idx,
      queries.toDF().toDF("c_name", "c_mktsegment"),
      Seq("c_name", "c_mktsegment"), tmp("sdeg-serve-ck"),
      (df, _) => { served += df.count() })
    try { q2.processAllAvailable() } finally q2.stop()
    assert(served >= 0L) // completed; result size is data-dependent

    // vector ingest door on a degenerate vector batch (already
    // admission-guarded — pinned here as the streaming contract).
    val vecs = MemoryStream[(Long, Seq[Float])]
    vecs.addData((1L, null), (2L, Seq.empty[Float]),
      (3L, Seq.fill(64)(Float.NaN)), (4L, (0 until 64).map(_.toFloat / 64)))
    val routed = SimStream.routeCells(
      vecs.toDF().toDF("vec_id", "embedding"),
      graft.operators.Similarity.ivfCodebook(spark, sf0001))
    val q3 = routed.writeStream.format("memory").queryName("sdeg_vec")
      .outputMode("append").start()
    try { q3.processAllAvailable() } finally q3.stop()
    assert(spark.table("sdeg_vec").select("vec_id").as[Long].collect().toSet
      === Set(4L))
  }

  test("vector serving answers junk requests with empty results, not a dead query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reqs = MemoryStream[(Long, Seq[Float])]
    reqs.addData(
      (1L, null),                              // null request vector
      (2L, (0 until 63).map(_.toFloat)),       // wrong dimension
      (3L, Seq.fill(64)(Float.NaN)),           // NaN components
      (4L, Seq.fill(64)(0.0f)),                // zero-norm
      (5L, (0 until 64).map(i => math.sin(i).toFloat))) // well-formed
    var byQid = Map.empty[Long, Long]
    val q = SimStream.serveVectors(spark, sf0001,
      reqs.toDF().toDF("qid", "embedding"), tmp("sdeg-vecserve-ck"),
      (df, _) => {
        byQid = df.groupBy("qid").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }, k = 5)
    try { q.processAllAvailable() } finally q.stop()
    // junk requests (the REQUEST door's admission) answer EMPTY; the
    // well-formed one ranks k neighbors. An unguarded NaN/wrong-dim
    // request was a poison pill killing the serving query itself.
    assert(byQid.keySet === Set(5L) && byQid(5L) === 5L, byQid.toString)
  }

  test("CDC fold and quality admission survive degenerate feeds") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // CDC: null op / null text / unknown op code / null seq /
    // negative keys in one change batch, folded onto a tiny base.
    val base = Seq((1L, "alpha text", "en", "srcA"),
        (2L, "beta text", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val feed = MemoryStream[Chg]
    feed.addData(
      Chg(1L, 1L, "U", "alpha v2", "en", "srcA"),
      Chg(2L, 1L, null, null, null, null),       // null op + payload
      Chg(3L, 1L, "X", "mystery", "en", "srcB"), // unknown op code
      Chg(-4L, 1L, "I", "negative insert", "en", "srcB"),
      Chg(5L, null, "I", "null seq", "en", "srcB"))
    val snapDir = tmp("sdeg-cdc-snap")
    val q = graft.streaming.CdcStream.applyFeed(
      feed.toDF(), base, snapDir, tmp("sdeg-cdc-ck"))
    try { q.processAllAvailable() } finally q.stop()
    val v1 = spark.read.parquet(
      graft.streaming.CdcStream.versionPath(snapDir, 1L))
    // the well-formed ops applied (update + both inserts); the
    // degenerate rows neither crashed the fold nor deleted anything.
    val byId = v1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) === "alpha v2" && byId(-4L) === "negative insert"
      && byId.contains(5L), byId.toString)

    // quality admission: degenerate docs at the door — the gate must
    // decide (admit or reject), never crash, and land its batch
    // histogram for the next batch's cutoffs.
    val docs = MemoryStream[DocRow]
    docs.addData(degenerateDocs(0): _*)
    val (deltaDir, keptDir) = (tmp("sdeg-admit-delta"), tmp("sdeg-admit-kept"))
    val q2 = graft.streaming.PrepStream.admit(
      docs.toDF(), sf0001, deltaDir, keptDir, tmp("sdeg-admit-ck"))
    try { q2.processAllAvailable() } finally q2.stop()
    // the histogram delta landed (the maintainer's own obligation) …
    assert(graft.streaming.DeltaLog.liveParts(spark, deltaDir).nonEmpty)
    // … and the kept dir exists with a decided subset (possibly
    // empty — degenerate docs may all fail quality, but deciding is
    // not crashing).
    assert(new java.io.File(keptDir).exists())
  }
}
