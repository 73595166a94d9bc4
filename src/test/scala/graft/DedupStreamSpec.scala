package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DedupStream

/** Streaming ingest dedup end to end: in-window content replicas are
  * dropped across micro-batches, distinct content passes, and state
  * expiry re-admits content once the watermark has moved past its
  * window — the documented semantic bound of the stream stage.
  */
object DedupStreamSpec {
  final case class Doc(ts: Timestamp, docId: Long, text: String)
}

class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._
  import DedupStreamSpec.Doc

  // well past the initial epoch-0 watermark (same rationale as
  // EventStreamSpec)
  private val BaseMin = 6000L
  private def doc(minute: Long, id: Long, text: String): Doc =
    Doc(new Timestamp((BaseMin + minute) * 60000L), id, text)

  test("in-window replicas drop; expiry re-admits content past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DedupStream.dedupExact(
        in.toDF().select(col("ts"), col("docId").as("doc_id"), col("text")),
        "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // batch 1: two replicas of 'alpha' plus a distinct 'beta'
      in.addData(doc(0, 1, "alpha"), doc(1, 2, "alpha"), doc(1, 3, "beta"))
      q.processAllAvailable()
      // batch 2: another in-window 'alpha' replica -> dropped
      in.addData(doc(2, 4, "alpha"))
      q.processAllAvailable()
      val mid = spark.table("dedup_stream").select("text").as[String]
        .collect().toSeq
      assert(mid.sorted == Seq("alpha", "beta"), s"got $mid")
      // batch 3: advance the watermark far past alpha's expiry ...
      in.addData(doc(60, 5, "gamma"))
      q.processAllAvailable()
      // batch 4: ... so a late re-crawl of 'alpha' is NEW state
      in.addData(doc(100, 6, "alpha"))
      q.processAllAvailable()
      val texts = spark.table("dedup_stream").select("text").as[String]
        .collect().toSeq
      assert(texts.sorted == Seq("alpha", "alpha", "beta", "gamma"), s"got $texts")
      // every emitted row carries the row-local hash
      assert(spark.table("dedup_stream").where(length(col("content_hash")) === 32)
        .count() == 4L)
    } finally q.stop()
  }

  test("null-text documents all pass through instead of collapsing to one") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DedupStream.dedupExact(
        in.toDF().select(col("ts"), col("docId").as("doc_id"), col("text")),
        "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream_null")
      .outputMode("append").start()
    try {
      // md5(NULL) is NULL and dropDuplicatesWithinWatermark treats
      // NULL keys as equal — without the per-row fallback hash these
      // three would collapse to one survivor.
      in.addData(doc(0, 1, null), doc(1, 2, null), doc(1, 3, "alpha"))
      q.processAllAvailable()
      in.addData(doc(2, 4, null))
      q.processAllAvailable()
      val got = spark.table("dedup_stream_null")
        .select(col("doc_id")).as[Long].collect().toSeq.sorted
      assert(got == Seq(1L, 2L, 3L, 4L), s"got $got")
      // null-text rows carry the marked fallback hash, never NULL
      assert(spark.table("dedup_stream_null")
        .where(col("content_hash").isNull).count() == 0L)
      assert(spark.table("dedup_stream_null")
        .where(col("content_hash").startsWith("null-text:")).count() == 3L)
    } finally q.stop()
  }

  test("row-local minhash signature equals the batch minhash family") {
    // the streaming signature must be the batch numbers joined with
    // '|' — proven against Dedup.minhash over the sf0.001 corpus.
    val sig = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        DedupStream.minhashSignature(col("text")).as("sig"))
      .where(!col("sig").startsWith("no-shingle:"))
    val batch = graft.operators.Dedup.minhash(spark, sf0001)
      .groupBy("doc_id")
      .agg(concat_ws("|", (0 until 8).map(i =>
        max(when(col("seed") === i, col("mh")))): _*).as("sig"))
    assert(sig.count() > 0)
    assert(sig.join(batch, Seq("doc_id", "sig"), "left_anti").count() == 0L,
      "every streaming signature matches its batch counterpart")
    assert(sig.count() == batch.count(), "same covered documents")
  }

  test("near-dup stream: shingle-identical edits collapse, real edits pass") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DedupStream.dedupNearSignature(
        in.toDF().select(col("ts"), col("docId").as("doc_id"), col("text")),
        "ts", "10 minutes")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      val base = "alpha beta gamma delta epsilon"
      // doc 2 differs from doc 1 only in case + whitespace: raw bytes
      // differ (dedupExact would keep both) but cleaned shingles are
      // identical -> dropped. doc 3 has one word edited -> signature
      // differs -> kept. doc 4 is too short for shingles -> kept.
      in.addData(doc(0, 1, base), doc(1, 2, "Alpha  BETA gamma   delta epsilon"),
        doc(1, 3, "alpha beta gamma delta zeta"), doc(1, 4, "tiny text"))
      q.processAllAvailable()
      in.addData(doc(2, 5, base)) // in-window verbatim re-crawl -> dropped
      q.processAllAvailable()
      val got = spark.table("neardup_stream").select("doc_id").as[Long]
        .collect().toSeq.sorted
      assert(got == Seq(1L, 3L, 4L), s"got $got")
      assert(spark.table("neardup_stream")
        .where(col("minhash_sig").isNull).count() == 0L)
    } finally q.stop()
  }
}
