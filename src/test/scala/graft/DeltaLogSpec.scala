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

  test("foldBelow compaction folds only watermarked parts; later batches stay per-batch") {
    val dd = tmp("bound")
    (0 to 4).foreach { i =>
      Seq((i.toLong, 1L)).toDF("id", "v").write.parquet(s"$dd/batch=$i")
      DeltaLog.commit(spark, dd, s"batch=$i")
    }
    // watermark 3: folds exactly batches 0..2 into compacted=2.
    assert(DeltaLog.compactLive(spark, dd, foldBelow = 3L)(_.distinct()) === 3)
    assert(DeltaLog.liveParts(spark, dd, prefix = "").map(_.split('/').last).sorted
      === Seq("batch=3", "batch=4", "compacted=2"))
    // content preserved exactly.
    assert(spark.read.parquet(DeltaLog.liveParts(spark, dd, prefix = ""): _*)
      .select("id").as[Long].collect().sorted.toSeq === (0L to 4L))
    // a second bounded fold needs a folded-batch id above compacted=2
    // (the target-id rule): watermark 4 folds {compacted=2, batch=3}.
    assert(DeltaLog.compactLive(spark, dd, foldBelow = 4L)(_.distinct()) === 2)
    assert(DeltaLog.liveParts(spark, dd, prefix = "").map(_.split('/').last).sorted
      === Seq("batch=4", "compacted=3"))
    // watermark at or below every unfolded batch id: nothing to do.
    assert(DeltaLog.compactLive(spark, dd, foldBelow = 4L)(_.distinct()) === 0)
    assert(spark.read.parquet(DeltaLog.liveParts(spark, dd, prefix = ""): _*)
      .select("id").as[Long].collect().sorted.toSeq === (0L to 4L))
  }

  test("readers need no lock: resolve is never torn under concurrent commit + compactLive") {
    // round-11 verdict #7: the publish mutex serializes WRITERS (one
    // maintenance driver per dir); readers are lock-free by contract.
    // Hammer resolve while a writer commits 30 batches and a
    // compactor folds repeatedly: every resolved set must be a
    // CONSISTENT snapshot — batch ids contiguous from 0 once
    // consolidations are expanded (compacted=c covers 0..c), no
    // half-published manifests, no exceptions.
    val dd = tmp("hammer")
    Seq((0L, 1L)).toDF("id", "v").write.parquet(s"$dd/batch=0")
    DeltaLog.commit(spark, dd, "batch=0")
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val writerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => try {
      (1 to 30).foreach { i =>
        Seq((i.toLong, 1L)).toDF("id", "v").write.parquet(s"$dd/batch=$i")
        DeltaLog.commit(spark, dd, s"batch=$i")
      }
    } catch { case t: Throwable => failures.add(s"writer: $t") }
    finally writerDone.set(true))
    val compactor = new Thread(() => try {
      while (!writerDone.get()) DeltaLog.compactLive(spark, dd)(_.distinct())
    } catch { case t: Throwable => failures.add(s"compactor: $t") })
    val readers = (1 to 3).map(r => new Thread(() => try {
      var reads = 0
      while (!writerDone.get() || reads < 50) {
        val names = DeltaLog.liveParts(spark, dd, prefix = "")
          .map(_.split('/').last)
        val covered = names.flatMap { n =>
          val id = DeltaLog.idOf(n).get
          if (n.startsWith("compacted=")) 0L to id else Seq(id)
        }.toSet
        if (covered.nonEmpty) {
          val max = covered.max
          if (covered != (0L to max).toSet)
            failures.add(s"reader$r: torn set $names -> $covered")
        } else failures.add(s"reader$r: empty resolve")
        reads += 1
      }
    } catch { case t: Throwable => failures.add(s"reader$r: $t") }))
    (readers :+ writer :+ compactor).foreach(_.start())
    (readers :+ writer :+ compactor).foreach(_.join(120000))
    assert(failures.isEmpty, failures.toArray.mkString("\n"))
    // quiesced: one more fold then exact content equality.
    DeltaLog.compactLive(spark, dd)(_.distinct())
    assert(spark.read.parquet(DeltaLog.liveParts(spark, dd, prefix = ""): _*)
      .select("id").as[Long].collect().sorted.toSeq === (0L to 30L))
  }
}
