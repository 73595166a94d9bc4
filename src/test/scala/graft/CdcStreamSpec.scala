package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.streaming.CdcStream

/** Streaming CDC apply ([[CdcStream]]): the change feed replayed as
  * micro-batches (with a checkpointed restart between them) must land
  * the SAME final snapshot as one batch merge of the whole feed —
  * the composition law exercised end to end through the versioned
  * snapshot chain.
  */
object CdcStreamSpec {
  final case class FRow(doc_id: Long, seq: Long, op: String,
      text: String, lang: String, source: String)
}

class CdcStreamSpec extends SparkTestBase {
  import spark.implicits._
  import CdcStreamSpec.FRow

  test("micro-batched feed + restart == one batch merge; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    val feed = Cdc.changeFeed(spark, sf0001)
      .as[(Long, Long, String, String, String, String)].collect()
      .map(r => FRow(r._1, r._2, r._3, r._4, r._5, r._6))
    // batch 1: first-round updates + takedowns; batch 2: second-round
    // updates + discoveries — per-key seq order across batches, the
    // change-log contract.
    val b1 = feed.filter(r => r.op == "D" || (r.op == "U" && r.seq == 1L))
    val b2 = feed.filter(r => r.op == "I" || (r.op == "U" && r.seq == 2L))
    assert(b1.nonEmpty && b2.nonEmpty && b1.length + b2.length == feed.length)

    val snap = Files.createTempDirectory("graft-cdc-snap").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val in = MemoryStream[FRow]

    in.addData(b1.toIndexedSeq)
    val q1 = CdcStream.applyFeed(in.toDF(), base, snap, ckpt)
    q1.processAllAvailable(); q1.stop()

    in.addData(b2.toIndexedSeq)
    val q2 = CdcStream.applyFeed(in.toDF(), base, snap, ckpt)
    q2.processAllAvailable(); q2.stop()

    val cols = Seq("doc_id", "text", "lang", "source")
    val streamed = spark.read.parquet(CdcStream.versionPath(snap, 2))
      .select(cols.map(col): _*)
    val batch = Cdc.mergeSnapshot(base, Cdc.changeFeed(spark, sf0001))
      .select(cols.map(col): _*)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed snapshot chain must equal the one-shot batch merge")

    // the version chain: v=1 (after takedowns/updates) and v=2 exist;
    // v=1 reflects ONLY batch 1 (deleted keys gone, no inserts yet).
    val v1 = spark.read.parquet(CdcStream.versionPath(snap, 1))
    assert(v1.where(col("doc_id") % 10 === 7).count() == 0,
      "takedowns must be applied in v=1")
    assert(v1.where(col("doc_id") >= Cdc.InsertOffset).count() == 0,
      "inserts must NOT be in v=1")

    // replay idempotence: a crashed-and-redelivered batch re-reads
    // the SAME input version and must reproduce v=2 row for row —
    // the property that makes version-by-batch-id exactly-once.
    val replayed = Cdc.mergeSnapshot(v1, b2.toSeq.toDF()).drop("origin")
      .select(cols.map(col): _*)
    assert(replayed.exceptAll(streamed).isEmpty &&
      streamed.exceptAll(replayed).isEmpty,
      "replaying batch 1 against v=1 must reproduce v=2")
  }
}
