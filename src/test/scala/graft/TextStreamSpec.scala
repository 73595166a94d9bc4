package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.TextStream

/** Live adaptive-quality cutoffs: streamed document batches land as
  * per-batch histograms (checkpointed restart between them), the
  * merged cutoffs equal a full recompute over base ∪ deltas, and the
  * stale base-only cutoff misfilters a drifted source — the failure
  * mode the merge path exists to prevent.
  */
object TextStreamSpec {
  final case class DRow(doc_id: Long, text: String, source: String)
}

class TextStreamSpec extends SparkTestBase {
  import spark.implicits._
  import TextStreamSpec.DRow

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def cutoffMap(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("median_tokens")).toMap

  test("merged cutoffs equal recompute over base + deltas; restart is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val (delta, ckpt) = (tmp("graft-tqdelta"), tmp("graft-tqckpt"))
    val in = MemoryStream[DRow]

    // batch 0: a long-document wave into src0 (drifts its
    // median up); batch 1 (after restart): short docs elsewhere.
    def longText(n: Int): String = Seq.fill(n)("w").mkString(" ")
    in.addData((0 until 40).map(i =>
      DRow(1000000L + i, longText(500 + i), "src0")): _*)
    val q1 = TextStream.maintain(in.toDF(), delta, ckpt)
    q1.processAllAvailable(); q1.stop()

    in.addData((0 until 10).map(i =>
      DRow(2000000L + i, longText(3), "src1")): _*)
    val q2 = TextStream.maintain(in.toDF(), delta, ckpt)
    q2.processAllAvailable(); q2.stop()

    val dirs = new java.io.File(delta).list().filter(_.startsWith("batch=")).toSet
    assert(dirs == Set("batch=0", "batch=1"), s"delta dirs: $dirs")

    val merged = cutoffMap(TextStream.cutoffsWithDeltas(spark, sf0001, delta))

    // ground truth: full recompute from PER-DOC rows (base corpus +
    // every delta doc) through one un-merged histogram — additivity
    // is the claim under test, so the reference path must not use it.
    val deltaDocs = ((0 until 40).map(i => (1000000L + i, 500L + i, "src0")) ++
      (0 until 10).map(i => (2000000L + i, 3L, "src1")))
      .toDF("doc_id", "n_ws_tokens", "source")
    val basePerDoc = TextAnalysis.stats(spark, sf0001)
      .select(col("doc_id"), col("n_ws_tokens"))
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .select("doc_id", "n_ws_tokens", "source")
    val full = TextAnalysis.cutoffsFromHistogram(
      TextAnalysis.sourceTokenHistogramOf(basePerDoc.unionByName(deltaDocs)))
    assert(merged === cutoffMap(full))

    // the failure mode: base-only cutoffs are stale for the drifted
    // source (the long-doc wave moved src0's median up).
    val baseOnly = cutoffMap(
      TextAnalysis.cutoffsFromHistogram(TextStream.baseHistogram(spark, sf0001)))
    assert(merged("src0") > baseOnly("src0"),
      s"drift invisible: merged=${merged("src0")} base=${baseOnly("src0")}")
    // undrifted sources are untouched by the merge.
    assert(merged.filterNot(kv => Set("src0", "src1")(kv._1)) ===
      baseOnly.filterNot(kv => Set("src0", "src1")(kv._1)))
  }

  test("histogram fold at the checkpoint watermark: replay determinism survives, part count bounded") {
    import graft.streaming.DeltaLog
    val delta = tmp("graft-tqfold")
    def land(i: Int): Unit = {
      Seq((s"srcF$i", 10L + i, 3L), ("srcF0", 20L + i, 1L))
        .toDF("source", "n_ws_tokens", "c")
        .write.parquet(s"$delta/batch=$i")
      DeltaLog.commit(spark, delta, s"batch=$i")
    }
    (0 to 5).foreach(land)
    val fullBefore = cutoffMap(TextStream.cutoffsWithDeltas(spark, sf0001, delta))
    val replay3Before = cutoffMap(TextStream.cutoffsWithDeltas(spark, sf0001, delta, 3L))
    // fold at watermark 3 (batches 0..2 committed, never re-executed).
    assert(TextStream.compactHistogramDeltas(spark, delta, watermark = 3L) === 3)
    assert(DeltaLog.liveParts(spark, delta, prefix = "").map(_.split('/').last).sorted
      === Seq("batch=3", "batch=4", "batch=5", "compacted=2"))
    // serving view and every still-possible replay are bit-identical.
    assert(cutoffMap(TextStream.cutoffsWithDeltas(spark, sf0001, delta)) === fullBefore)
    assert(cutoffMap(TextStream.cutoffsWithDeltas(spark, sf0001, delta, 3L)) === replay3Before)
    // a replay BELOW the watermark is a fold-contract violation the
    // reader refuses loudly (silently wrong cutoffs are the round-10
    // crash class's quieter sibling).
    val e = intercept[IllegalArgumentException] {
      TextStream.cutoffsWithDeltas(spark, sf0001, delta, 2L).collect()
    }
    assert(e.getMessage.contains("compacted"))
    // sustained ingest with periodic watermark folds: the live part
    // count stays bounded by the fold cadence, never grows with total
    // batches — the round-10 "unbounded until base rebuild" gap.
    (6 to 17).foreach { i =>
      land(i)
      if (i % 4 == 0)
        TextStream.compactHistogramDeltas(spark, delta, watermark = i.toLong)
    }
    val live = DeltaLog.liveParts(spark, delta, prefix = "").map(_.split('/').last)
    assert(live.count(_.startsWith("batch=")) <= 4 + 1,
      s"part count not bounded: $live")
    assert(live.count(_.startsWith("compacted=")) === 1)
    // and the serving view still equals the per-batch ground truth.
    assert(cutoffMap(TextStream.cutoffsWithDeltas(spark, sf0001, delta))
      === cutoffMap(TextAnalysis.cutoffsFromHistogram(
        TextStream.baseHistogram(spark, sf0001).unionByName(
          (0 to 17).map(i => Seq((s"srcF$i", 10L + i, 3L), ("srcF0", 20L + i, 1L))
            .toDF("source", "n_ws_tokens", "c")).reduce(_ unionByName _)))))
  }

  test("live winnow sketch: delta-arrived contamination screens out; stale base misses it; fold preserves") {
    import graft.operators.TextAnalysis
    import graft.streaming.DeltaLog
    implicit val sqlCtx = spark.sqlContext
    val (delta, ckpt) = (tmp("graft-winnowdelta"), tmp("graft-winnowckpt"))
    // a corpus document long enough to fingerprint, re-crawled
    // verbatim under a fresh id as the DELTA arrival.
    val victim = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy(length(col("text")).desc, col("doc_id")).limit(1)
      .select("doc_id", "text").head()
    val in = MemoryStream[DRow]
    in.addData(DRow(8800001L, victim.getString(1), "crawl"))
    val q1 = TextStream.maintainWinnowSketch(in.toDF(), delta, ckpt)
    q1.processAllAvailable(); q1.stop()
    // restart + second wave (replay idempotence rides batch=<id>).
    in.addData(DRow(8800002L, (1 to 40).map(i => s"wv$i").mkString(" "), "crawl"))
    val q2 = TextStream.maintainWinnowSketch(in.toDF(), delta, ckpt)
    q2.processAllAvailable(); q2.stop()

    // a LATER crawl batch screens against the live view: the delta
    // arrival (itself a near-dup source) must surface...
    val probe = Seq((8900001L, victim.getString(1))).toDF("doc_id", "text")
    val live = TextAnalysis.winnowScreenOf(probe,
      TextStream.winnowSketchWithDeltas(spark, sf0001, delta)).collect()
    assert(live.exists(r => r.getLong(1) == 8800001L),
      s"delta-arrived near-dup invisible to the live view: ${live.mkString(", ")}")
    assert(live.exists(r => r.getLong(1) == victim.getLong(0)),
      "the base corpus original must surface too")
    // ...while the STALE base-only sketch misses the delta arrival —
    // the failure mode the live view exists to prevent.
    val stale = TextAnalysis.winnowScreenOf(probe,
      TextAnalysis.loadOrBuildWinnowSketch(spark, sf0001)).collect()
    assert(!stale.exists(r => r.getLong(1) == 8800001L))
    // the live view equals recompute over base ∪ delta docs.
    val recomputed = TextAnalysis.winnowFingerprints(spark, sf0001)
      .select("doc_id", "fp").distinct()
      .unionByName(TextAnalysis
        .winnowOf(Seq(
          (8800001L, victim.getString(1)),
          (8800002L, (1 to 40).map(i => s"wv$i").mkString(" "))).toDF("doc_id", "text"), 4, 5)
        .select("doc_id", "fp").distinct())
    val liveView = TextStream.winnowSketchWithDeltas(spark, sf0001, delta)
    assert(liveView.exceptAll(recomputed).count() === 0L)
    assert(recomputed.exceptAll(liveView).count() === 0L)
    // in-dir fold: serving identical through the consolidation.
    assert(TextStream.compactWinnowDeltas(spark, delta) === 2)
    assert(DeltaLog.liveParts(spark, delta, prefix = "").map(_.split('/').last)
      === Seq("compacted=1"))
    val folded = TextStream.winnowSketchWithDeltas(spark, sf0001, delta)
    assert(folded.exceptAll(recomputed).count() === 0L)
    assert(recomputed.exceptAll(folded).count() === 0L)
  }

  test("live line counts: delta-arrived template crosses the threshold; fold respects the watermark") {
    import graft.streaming.DeltaLog
    implicit val sqlCtx = spark.sqlContext
    val (delta, ckpt) = (tmp("graft-linedelta"), tmp("graft-lineckpt"))
    val in = MemoryStream[DRow]
    in.addData((0 until 7).map(i =>
      DRow(7700000L + i, s"delta body a$i", "crawl")): _*)
    val q1 = TextStream.maintainLineCounts(in.toDF(), delta, ckpt)
    q1.processAllAvailable(); q1.stop()
    // restart + second wave: the crawl source reaches 12 documents.
    in.addData((7 until 12).map(i =>
      DRow(7700000L + i, s"delta body b$i", "crawl")): _*)
    val q2 = TextStream.maintainLineCounts(in.toDF(), delta, ckpt)
    q2.processAllAvailable(); q2.stop()

    // ground truth: ONE un-merged aggregation over base ∪ delta docs
    // — additivity of the partials is the claim under test, so the
    // reference path must not use it.
    val deltaDocs =
      (0 until 7).map(i => (7700000L + i, s"delta body a$i", "crawl")) ++
        (7 until 12).map(i => (7700000L + i, s"delta body b$i", "crawl"))
    val union = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "source")
      .unionByName(deltaDocs.toDF("doc_id", "text", "source"))
    val truth = TextAnalysis.lineCountsOf(TextAnalysis.pagedOf(union))
    val live = TextStream.lineCountsWithDeltas(spark, sf0001, delta)
    assert(live.exceptAll(truth).count() === 0L)
    assert(truth.exceptAll(live).count() === 0L)

    // the crawl source's template lines (12 delta docs) cross
    // minDocs=10 ONLY in the live view — the stale base artifact
    // cannot see a threshold crossing driven by delta arrivals.
    val liveBp = live.where(col("n_docs") >= 10)
      .collect().map(_.getString(0)).toSet
    assert(liveBp.contains("subscribe to the crawl newsletter"), liveBp)
    assert(liveBp.contains("copyright crawl"))
    val staleBp = TextAnalysis.loadOrBuildLineCounts(spark, sf0001)
      .where(col("n_docs") >= 10)
      .collect().map(_.getString(0)).toSet
    assert(!staleBp.contains("subscribe to the crawl newsletter"))

    // watermark fold: counts are additive, NOT replay-idempotent, so
    // only batches strictly below the committed watermark fold; the
    // serving view is bit-identical through the consolidation.
    assert(TextStream.compactLineCountDeltas(spark, delta, watermark = 2L) === 2)
    assert(DeltaLog.liveParts(spark, delta, prefix = "").map(_.split('/').last)
      === Seq("compacted=1"))
    val folded = TextStream.lineCountsWithDeltas(spark, sf0001, delta)
    assert(folded.exceptAll(truth).count() === 0L)
    assert(truth.exceptAll(folded).count() === 0L)
  }

  test("door scoring under the frozen weights equals the batch apply; OOV contributes nothing") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("graft-tqscore")
    // one in-vocabulary doc (corpus text verbatim) and one with alien
    // vocabulary padding: the frozen classifier must score the known
    // words only and have no opinion on the rest.
    val known = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy("doc_id").limit(1).head().getString(1)
    val in = MemoryStream[DRow]
    in.addData(
      DRow(5000000L, known, "srcQ"),
      DRow(5000001L, "zzqx wwvk " + known, "srcQ"),
      DRow(5000002L, "zzqx wwvk yyab", "srcQ"))
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long, Long)]]
    val q = TextStream.scoreQuality(spark, sf0001, in.toDF(), ckpt,
      (df, _) => got += df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSeq)
    q.processAllAvailable(); q.stop()
    val rows = got.flatten.sortBy(_._1)
    // batch ground truth through the SAME apply.
    val batchDocs = Seq(
      (5000000L, known), (5000001L, "zzqx wwvk " + known),
      (5000002L, "zzqx wwvk yyab")).toDF("doc_id", "text")
    val want = TextAnalysis.qualityScoreOf(batchDocs,
        TextAnalysis.loadOrBuildQualityWeights(spark, sf0001))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(rows === want)
    // OOV padding changed nothing: same trained-term count and score
    // as the verbatim doc; the all-OOV doc scores 0 / fails.
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(5000001L)._2 === byId(5000000L)._2)
    assert(byId(5000001L)._3 === byId(5000000L)._3)
    assert(byId(5000002L) === ((5000002L, 0L, 0L, 0L)))
    assert(byId(5000000L)._2 > 0L)
  }
}
