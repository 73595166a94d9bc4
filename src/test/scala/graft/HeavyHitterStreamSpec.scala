package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.TextStream

/** Streaming heavy-hitter sketch maintenance: bucket totals are an
  * ADDITIVE summary, so per-batch partials merge into the base
  * artifact without base rescans; the merged-sketch serving path
  * equals a full recompute; and — the load-bearing negative — a
  * STALE base-only sketch can certify a silently wrong top-k,
  * because the certificate's proof requires the sketch to describe
  * the corpus the recount scans.
  */
object HeavyHitterStreamSpec {
  final case class HRow(doc_id: Long, text: String, source: String)
}

class HeavyHitterStreamSpec extends SparkTestBase {
  import spark.implicits._
  import HeavyHitterStreamSpec.HRow

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def terms(df: DataFrame): Seq[(String, Long, Long)] =
    df.orderBy("rank").collect().toSeq.map(r =>
      (r.getAs[String]("term"), r.getAs[Long]("cnt"),
        r.getAs[Long]("certified")))

  test("stale base-only sketch certifies a WRONG top-k; merged sketch restores the proof") {
    val B = 64
    // base vocabulary is exactly {alpha, beta} — TWO hot words, so
    // the stale candidate set can fill a k=2 result (the round-8
    // certificate fix also requires n_top == k; with only one base
    // word the shortfall check would catch the staleness before the
    // wrongness could certify).
    val base = ((0 until 60)
      .map(i => (i.toLong, Seq.fill(10)("alpha").mkString(" "))) ++
      (0 until 40)
        .map(i => (100L + i, Seq.fill(10)("beta").mkString(" "))))
      .toDF("doc_id", "text")
    // the delta wave is all gamma — crc32 lands it in a bucket the
    // stale sketch calls cold (distinctness checked below), with a
    // count between alpha's and beta's so it belongs at rank 2.
    val delta = (0 until 50)
      .map(i => (1000L + i, Seq.fill(10)("gamma").mkString(" ")))
      .toDF("doc_id", "text")
    val sep = spark.range(1).select(
      (pmod(crc32(lit("alpha")), lit(B.toLong)) =!=
        pmod(crc32(lit("gamma")), lit(B.toLong))).as("ag"),
      (pmod(crc32(lit("beta")), lit(B.toLong)) =!=
        pmod(crc32(lit("gamma")), lit(B.toLong))).as("bg")).head()
    assert(sep.getBoolean(0) && sep.getBoolean(1),
      "fixture words must hash to distinct buckets")

    val union = base.unionByName(delta)
    val stale = terms(
      TextAnalysis.heavyHittersFromSketch(
        union, TextAnalysis.bucketTotalsOf(base, B), k = 2, buckets = B))
    // gamma (500 occurrences — rank 2 in truth) is INVISIBLE to the
    // stale sketch; beta (400) takes its place and the result still
    // certifies: the silent-wrong outcome the merge exists to
    // prevent.
    assert(stale.map(_._1) === Seq("alpha", "beta"))
    assert(stale.forall(_._3 == 1L), s"stale result should certify: $stale")

    val merged = terms(
      TextAnalysis.heavyHittersFromSketch(
        union, TextAnalysis.bucketTotalsOf(union, B), k = 2, buckets = B))
    assert(merged === Seq(("alpha", 600L, 1L), ("gamma", 500L, 1L)))
  }

  test("fresh sketch with a candidate SHORTFALL refuses to certify (round-8 fix)") {
    val B = 4096
    // one dominant word alone in its bucket plus a sub-theta tail
    // spread thin: candidates = {alpha} only, so a k=3 result has
    // n_top = 1 — before the fix this certified while silently
    // omitting the true ranks 2..3.
    val docsDf = ((0 until 50)
      .map(i => (i.toLong, Seq.fill(10)("alpha").mkString(" "))) ++
      (0 until 30).map(i => (1000L + i, s"tail$i")))
      .toDF("doc_id", "text")
    val out = terms(TextAnalysis.heavyHittersFromSketch(
      docsDf, TextAnalysis.bucketTotalsOf(docsDf, B), k = 3, buckets = B))
    // tail-bucket collisions may add sub-theta candidates (then the
    // min >= theta leg refuses instead) — either way the certificate
    // must decline, never certify the truncated/diluted result.
    assert(out.exists(_._1 == "alpha"))
    assert(out.size < 3 || out.exists(_._2 < 2L))
    assert(out.forall(_._3 == 0L),
      s"a shortfall result must NOT certify: $out")
  }

  test("maintained delta partials + base artifact serve the exact union top-k") {
    implicit val sqlCtx = spark.sqlContext
    val (deltaDir, ckpt) = (tmp("graft-hhdelta"), tmp("graft-hhckpt"))
    val in = MemoryStream[HRow]

    // two waves, with a checkpointed restart between them (replay
    // idempotence rides the batch=<id> overwrite convention).
    // enough zephyr mass to outrank every organic corpus term (the
    // sf0.001 corpus is ~50k tokens, so 10k zephyrs top the list).
    val wave0 = (0 until 1000).map(i =>
      HRow(3000000L + i, Seq.fill(9)("zephyr").mkString(" ") + " quartz", "crawl"))
    val wave1 = (0 until 200).map(i =>
      HRow(4000000L + i, "zephyr quartz quartz", "crawl"))
    in.addData(wave0: _*)
    val q1 = TextStream.maintainTermSketch(in.toDF(), deltaDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    in.addData(wave1: _*)
    val q2 = TextStream.maintainTermSketch(in.toDF(), deltaDir, ckpt)
    q2.processAllAvailable(); q2.stop()

    val dirs = new java.io.File(deltaDir).list().filter(_.startsWith("batch=")).toSet
    assert(dirs == Set("batch=0", "batch=1"), s"delta dirs: $dirs")

    // merged sketch == recomputed sketch over base ∪ delta docs
    // (additivity is the claim; the reference path must not use it).
    val deltaDocs = (wave0 ++ wave1).toDF()
      .select(col("doc_id"), col("text"))
    val baseDocs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val recomputedSketch = TextAnalysis
      .bucketTotalsOf(baseDocs.unionByName(deltaDocs))
      .orderBy("b").collect().toSeq
    val mergedSketch = TextStream
      .bucketSketchWithDeltas(spark, sf0001, deltaDir)
      .orderBy("b").collect().toSeq
    assert(mergedSketch === recomputedSketch)

    // live serving == full batch recompute over the union corpus.
    val live = terms(TextStream.heavyHittersWithDeltas(
      spark, sf0001, deltaDocs, deltaDir, k = 10))
    val truth = terms(TextAnalysis.heavyHittersFromSketch(
      baseDocs.unionByName(deltaDocs),
      TextAnalysis.bucketTotalsOf(baseDocs.unionByName(deltaDocs)), k = 10))
    assert(live === truth)
    assert(live.exists(_._1 == "zephyr"),
      "the streamed wave must surface in the live top-k")
    assert(live.forall(_._3 == 1L))

    // round-11: fold both landed partials at the committed watermark
    // (batch 1 is in the checkpoint — a restart replays nothing below
    // 2) and re-serve: the merged sketch, the live top-k, and its
    // certificate must be bit-identical through the consolidation.
    assert(TextStream.compactSketchDeltas(spark, deltaDir, watermark = 2L) === 2)
    assert(graft.streaming.DeltaLog
      .liveParts(spark, deltaDir, prefix = "").map(_.split('/').last)
      === Seq("compacted=1"))
    assert(TextStream.bucketSketchWithDeltas(spark, sf0001, deltaDir)
      .orderBy("b").collect().toSeq === recomputedSketch)
    assert(terms(TextStream.heavyHittersWithDeltas(
      spark, sf0001, deltaDocs, deltaDir, k = 10)) === truth)
  }
}
