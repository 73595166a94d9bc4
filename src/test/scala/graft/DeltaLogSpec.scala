package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{DeltaLog, IndexStream, TextStream}

/** The shared delta-manifest convention ([[DeltaLog]], round-10
  * verdict #3/#4): every delta family resolves its live part set
  * from ONE versioned manifest file (listing races gone as a class),
  * an un-committed part dir is invisible to every live view until
  * its commit, and legacy dirs without a manifest fall back to the
  * `_SUCCESS`-gated, stray-tolerant listing.
  */
class DeltaLogSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-deltalog-$tag").toString

  test("commit/liveParts: parts appear exactly at commit, in one consistent set") {
    val dd = tmp("basic")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dd/batch=0")
    // legacy dir (no manifest): the gated listing serves it.
    assert(DeltaLog.liveParts(spark, dd) === Seq(s"$dd/batch=0"))
    // first commit seeds the manifest FROM that listing, so
    // pre-manifest parts are never orphaned.
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$dd/batch=1")
    DeltaLog.commit(spark, dd, "batch=1")
    assert(DeltaLog.liveParts(spark, dd).map(_.split('/').last).sorted
      === Seq("batch=0", "batch=1"))
    // once a manifest exists, an UN-committed dir is invisible —
    // even with its _SUCCESS present (a crash between part write and
    // commit; the checkpoint replays it).
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$dd/batch=2")
    assert(DeltaLog.liveParts(spark, dd).map(_.split('/').last).sorted
      === Seq("batch=0", "batch=1"))
    DeltaLog.commit(spark, dd, "batch=2")
    assert(DeltaLog.liveParts(spark, dd).map(_.split('/').last).sorted
      === Seq("batch=0", "batch=1", "batch=2"))
    // replay re-commit is idempotent.
    DeltaLog.commit(spark, dd, "batch=2")
    assert(DeltaLog.liveParts(spark, dd).map(_.split('/').last).sorted
      === Seq("batch=0", "batch=1", "batch=2"))
  }

  test("fallback listing: no _SUCCESS or a stray suffix means invisible, never an error") {
    val dd = tmp("gate")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dd/batch=0")
    // a crash-partial dir: parquet present, no _SUCCESS marker.
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$dd/batch=1")
    Files.delete(java.nio.file.Paths.get(s"$dd/batch=1/_SUCCESS"))
    // strays: a non-numeric suffix and a non-part dir (the round-10
    // ADVICE NumberFormatException shape) — skipped, not thrown on.
    Files.createDirectories(java.nio.file.Paths.get(s"$dd/batch=tmp"))
    Files.createDirectories(java.nio.file.Paths.get(s"$dd/_spark_metadata"))
    assert(DeltaLog.liveParts(spark, dd) === Seq(s"$dd/batch=0"))
  }

  test("replace: the fold's swap is one atomic publish and late commits survive it") {
    val dd = tmp("swap")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dd/batch=0")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$dd/batch=1")
    DeltaLog.commit(spark, dd, "batch=0")
    DeltaLog.commit(spark, dd, "batch=1")
    // a batch lands (and commits) while the fold is running...
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$dd/batch=2")
    DeltaLog.commit(spark, dd, "batch=2")
    // ...the fold's swap removes only what it folded: the late
    // arrival survives in the same published version.
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dd/compacted=1")
    DeltaLog.replace(spark, dd, Set("batch=0", "batch=1"), Seq("compacted=1"))
    assert(DeltaLog.liveParts(spark, dd, prefix = "").map(_.split('/').last)
      .sorted === Seq("batch=2", "compacted=1"))
    // superseded dirs are still on disk (deferred deletion) but are
    // exactly the unreferenced set below the consolidation's id.
    assert(DeltaLog.unreferencedParts(spark, dd, 1L).map(_.split('/').last)
      .sorted === Seq("batch=0", "batch=1"))
  }

  test("every live view ignores an un-committed delta and serves it after commit") {
    val dir = sf0001
    // --- positional index family -------------------------------
    val pdd = tmp("pos")
    val doc = Seq((9100001L, "zzqqxx zzqqyy zzqqxx")).toDF("doc_id", "text")
    graft.operators.TextAnalysis.positionalPostings(doc)
      .write.parquet(s"$pdd/batch=0")
    DeltaLog.commit(spark, pdd, "batch=0")
    // committed batch serves...
    assert(graft.operators.TextAnalysis
      .positionalIndexWithDeltas(spark, dir, pdd)
      .where(col("doc_id") === 9100001L).count() === 3L)
    assert(graft.operators.TextAnalysis
      .docLengthsWithDeltas(spark, dir, pdd)
      .where(col("doc_id") === 9100001L).select("dl").head().getLong(0) === 3L)
    // ...an un-committed one does not (manifest exists, so the dir
    // alone is not membership), then does after commit.
    val doc2 = Seq((9100002L, "zzqqaa zzqqbb")).toDF("doc_id", "text")
    graft.operators.TextAnalysis.positionalPostings(doc2)
      .write.parquet(s"$pdd/batch=1")
    assert(graft.operators.TextAnalysis
      .positionalIndexWithDeltas(spark, dir, pdd)
      .where(col("doc_id") === 9100002L).count() === 0L)
    DeltaLog.commit(spark, pdd, "batch=1")
    assert(graft.operators.TextAnalysis
      .positionalIndexWithDeltas(spark, dir, pdd)
      .where(col("doc_id") === 9100002L).count() === 2L)
    // --- inverted-index postings family ------------------------
    val idd = tmp("idx")
    Seq(("zzkey9", 9, 9, 9L))
      .toDF("key", "table_id", "column_id", "row_id")
      .write.parquet(s"$idd/batch=0")
    DeltaLog.commit(spark, idd, "batch=0")
    assert(IndexStream.loadWithDeltas(spark, dir, idd)
      .where(col("key") === "zzkey9").count() === 1L)
    assert(IndexStream.keyStatsWithDeltas(spark, dir, idd)
      .where(col("key") === "zzkey9").count() === 1L)
    Seq(("zzkey10", 9, 9, 10L))
      .toDF("key", "table_id", "column_id", "row_id")
      .write.parquet(s"$idd/batch=1")
    assert(IndexStream.loadWithDeltas(spark, dir, idd)
      .where(col("key") === "zzkey10").count() === 0L,
      "un-committed index delta served")
    DeltaLog.commit(spark, idd, "batch=1")
    assert(IndexStream.loadWithDeltas(spark, dir, idd)
      .where(col("key") === "zzkey10").count() === 1L)
    // --- histogram (quality-cutoff) family ---------------------
    val hdd = tmp("hist")
    Seq(("srcZZ", 40L, 5L)).toDF("source", "n_ws_tokens", "c")
      .write.parquet(s"$hdd/batch=0")
    DeltaLog.commit(spark, hdd, "batch=0")
    assert(TextStream.cutoffsWithDeltas(spark, dir, hdd)
      .where(col("source") === "srcZZ").count() === 1L)
    Seq(("srcYY", 50L, 5L)).toDF("source", "n_ws_tokens", "c")
      .write.parquet(s"$hdd/batch=1")
    assert(TextStream.cutoffsWithDeltas(spark, dir, hdd)
      .where(col("source") === "srcYY").count() === 0L,
      "un-committed histogram delta served")
    DeltaLog.commit(spark, hdd, "batch=1")
    assert(TextStream.cutoffsWithDeltas(spark, dir, hdd)
      .where(col("source") === "srcYY").count() === 1L)
  }
}
