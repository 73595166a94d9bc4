package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Live adaptive-quality cutoffs over a streaming document ingest —
  * the streaming rung of [[TextAnalysis.adaptiveQuality]], built on
  * the histogram's ADDITIVITY: per-source token histograms merge by
  * summing counts, so serving folds the base corpus's histogram with
  * tiny per-batch delta histograms and NEVER rescans the base. This
  * is the same base-artifact + delta-merge obligation as
  * [[IndexStream.keyStatsWithDeltas]], applied to quality filtering:
  * a pipeline admitting crawled documents against per-source cutoffs
  * must move those cutoffs as the distribution drifts — a stale
  * base-only cutoff misfilters every source whose length profile the
  * new crawl shifted (the spec pins both the equality and the
  * failure mode).
  *
  * Scale posture: each micro-batch reduces to its (source, value)
  * histogram BEFORE landing — bounded by |sources| x |distinct
  * lengths| regardless of batch row count — and the merge pass
  * touches only histograms, so refresh cost is independent of corpus
  * size.
  */
object TextStream {

  /** Row-local per-doc view of a (streaming or batch) raw documents
    * frame: the whitespace token count [[TextAnalysis.stats]] uses,
    * computable without any aggregation (streaming-safe).
    */
  def perDoc(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
      col("source"))

  /** Start the histogram maintainer: every micro-batch of documents
    * collapses to its per-source histogram and lands as
    * `deltaDir/batch=<id>` (idempotently overwritten on replay — the
    * batch id keys the path, so restart-and-replay rewrites the same
    * directory instead of double-counting).
    */
  def maintain(docs: DataFrame, deltaDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    maintainReduced(perDoc(docs), deltaDir, checkpointDir, trigger)(
      TextAnalysis.sourceTokenHistogramOf)

  /** Positional-index delta maintenance (round-9 verdict #3): every
    * micro-batch of newly arrived documents derives its positional
    * postings ([[TextAnalysis.positionalPostings]] — row-local, so
    * the stream stays stateless and arbitrarily shardable) and lands
    * term-clustered as `deltaDir/batch=<id>` in the durable index's
    * own physical form, idempotently overwritten on replay. Serving
    * reads [[TextAnalysis.positionalIndexWithDeltas]]; postings are
    * per-document-local, so base ∪ deltas IS the grown corpus's
    * index (no merge arithmetic — the one-sidedness argument is
    * about SERVING the view, pinned by `PositionalDeltaSpec`).
    * Compaction is [[TextAnalysis.compactPositionalIndex]].
    */
  def maintainPositional(docs: DataFrame, deltaDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        TextAnalysis.positionalPostings(batch.toDF())
          .repartition(col("term"))
          .write.mode("overwrite").parquet(s"$deltaDir/batch=$batchId")
        DeltaLog.commit(batch.sparkSession, deltaDir, s"batch=$batchId")
        ()
      }
      .start()

  /** Quality scoring AT THE DOOR: every micro-batch of arriving
    * documents scores under the FROZEN durable weight table
    * ([[TextAnalysis.loadOrBuildQualityWeights]] — trained once per
    * crawl) and hands `(doc_id, n_terms, score_bp, prior_bp,
    * model_pass)` to the caller's sink. Unseen-vocabulary terms
    * contribute nothing (a frozen classifier has no opinion on
    * words it never saw), so scoring is a broadcast join + one
    * batch-local aggregation — no streaming state, no corpus touch.
    * The batch/stream agreement rides on [[TextAnalysis
    * .qualityScoreOf]] being the ONE apply for both
    * (`TextStreamSpec`).
    */
  def scoreQuality(spark: SparkSession, dir: String, docs: DataFrame,
      checkpointDir: String, onResult: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val weights = TextAnalysis.loadOrBuildQualityWeights(spark, dir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onResult(TextAnalysis.qualityScoreOf(batch.toDF(), weights), batchId)
        ()
      }
      .start()
  }

  /** The one writer both maintainers share: each micro-batch passes
    * through `reduce` (its bounded summary) and lands as
    * `deltaDir/batch=<id>`, idempotently overwritten on replay — the
    * batch id keys the path, so restart-and-replay rewrites the same
    * directory instead of double-counting. Any future change to the
    * landing convention (e.g. replay gating) lives HERE once
    * (round-8 self-review finding).
    */
  private def maintainReduced(rows: DataFrame, deltaDir: String,
      checkpointDir: String, trigger: Trigger)(
      reduce: DataFrame => DataFrame): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        reduce(batch.toDF())
          .write.mode("overwrite").parquet(s"$deltaDir/batch=$batchId")
        DeltaLog.commit(batch.sparkSession, deltaDir, s"batch=$batchId")
        ()
      }
      .start()

  /** The committed delta histogram/sketch dirs — the one [[DeltaLog]]
    * resolution (manifest when present, `_SUCCESS`-gated listing for
    * legacy/fixture dirs), shared with every other delta family
    * instead of a private listing variant (round-10 verdict #4).
    * Both `batch=` and `compacted=` parts serve (round-11 — this
    * family was the last without in-dir compaction, so part counts
    * grew unboundedly under sustained ingest until a full base
    * rebuild): a consolidation carries id = max folded batch id, so
    * [[cutoffsWithDeltas]]' replay-determinism filter "parts with
    * id < beforeBatch" stays EXACT as long as folds respect the
    * checkpoint watermark ([[compactHistogramDeltas]]). A
    * consolidation whose id is >= beforeBatch would make the
    * question unanswerable (it mixes batches the replay must and
    * must not see) — that is a fold-contract violation and fails
    * LOUDLY here rather than serving silently wrong cutoffs.
    */
  private def deltaBatches(spark: SparkSession, deltaDir: String,
      beforeBatch: Long = Long.MaxValue): Seq[String] = {
    val live = DeltaLog.liveParts(spark, deltaDir, prefix = "")
    def id(p: String): Long =
      DeltaLog.idOf(p.substring(p.lastIndexOf('/') + 1)).getOrElse(Long.MinValue)
    val offending = live.filter(p =>
      p.substring(p.lastIndexOf('/') + 1).startsWith("compacted=") &&
        id(p) >= beforeBatch)
    require(offending.isEmpty,
      s"delta consolidation(s) ${offending.mkString(", ")} fold batches at or " +
        s"above replay bound $beforeBatch — the compactor violated the " +
        "checkpoint-watermark contract (compactHistogramDeltas scaladoc)")
    live.filter(id(_) < beforeBatch)
  }

  /** In-dir compaction for the histogram family (round-11, the last
    * un-compacted delta family): fold every part with id strictly
    * below `watermark` — the maintaining stream's COMMITTED batch id
    * (`query.lastProgress.batchId` once that batch's commit is in
    * the checkpoint; committed batches never re-execute, so every
    * future replay's `beforeBatch` is >= the watermark and the
    * consolidation answers its id filter exactly). Histograms are
    * additive, so the fold is re-summing (source, value) cells —
    * the consolidation is at most |sources| x |distinct values|
    * rows no matter how many batches it folds.
    */
  def compactHistogramDeltas(spark: SparkSession, deltaDir: String,
      watermark: Long): Int =
    DeltaLog.compactLive(spark, deltaDir, foldBelow = watermark)(
      _.groupBy("source", "n_ws_tokens").agg(sum(col("c")).as("c")))

  /** [[compactHistogramDeltas]] for the term-sketch family: bucket
    * totals are additive, so the fold re-sums the <= `buckets`-row
    * cells.
    */
  def compactSketchDeltas(spark: SparkSession, deltaDir: String,
      watermark: Long): Int =
    DeltaLog.compactLive(spark, deltaDir, foldBelow = watermark)(
      _.groupBy("b").agg(sum(col("bt")).as("bt")))

  /** Live per-source cutoffs: the base corpus's histogram merged
    * with all accumulated delta histograms. Row-for-row equal to
    * recomputing [[TextAnalysis.cutoffsFromHistogram]] over base ∪
    * delta documents (TextStreamSpec proves it) — union-of-histograms
    * IS histogram-of-union, so the merge is a plain unionByName into
    * the shared cutoff derivation.
    */
  def cutoffsWithDeltas(spark: SparkSession, dir: String,
      deltaDir: String): DataFrame =
    cutoffsWithDeltas(spark, dir, deltaDir, Long.MaxValue)

  /** [[cutoffsWithDeltas]] restricted to delta batches with id <
    * `beforeBatch` — the REPLAY-DETERMINISM form
    * [[PrepStream.admitBatch]] needs: a restarted batch i must admit
    * against exactly the deltas 0..i-1, even when a failed earlier
    * attempt already landed `batch=i`'s own histogram (otherwise the
    * replay sees a cutoff its first attempt did not, and the same
    * batch admits a different document set on each try).
    */
  def cutoffsWithDeltas(spark: SparkSession, dir: String,
      deltaDir: String, beforeBatch: Long): DataFrame =
    TextAnalysis.cutoffsFromHistogram(
      baseWithDeltas(spark, baseHistogram(spark, dir), deltaDir, beforeBatch))

  /** The one base+deltas union both merge paths share: the base
    * summary frame unioned with every committed delta batch below
    * `beforeBatch` (replay-determinism gate — a restarted batch i
    * must see exactly deltas 0..i-1).
    */
  private def baseWithDeltas(spark: SparkSession, base: DataFrame,
      deltaDir: String, beforeBatch: Long = Long.MaxValue): DataFrame = {
    val batches = deltaBatches(spark, deltaDir, beforeBatch)
    if (batches.isEmpty) base
    else base.unionByName(spark.read.parquet(batches: _*))
  }

  /** The base corpus's per-source histogram (from the persisted
    * [[TextAnalysis.stats]] lineage — shared with every batch text
    * query in the session).
    */
  def baseHistogram(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceTokenHistogramOf(
      TextAnalysis.stats(spark, dir).select(col("doc_id"), col("n_ws_tokens"))
        .join(spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source")), Seq("doc_id")))

  /** Start the heavy-hitter sketch maintainer: every micro-batch of
    * arriving documents collapses to its ≤ `buckets`-row bucket-total
    * partial before landing (`deltaDir/batch=<id>`, idempotently
    * overwritten on replay — the [[maintain]] convention). The
    * landed partial is the WHOLE per-batch obligation: bucket totals
    * are additive, so serving never re-reads batch documents for the
    * sketch.
    */
  def maintainTermSketch(docs: DataFrame, deltaDir: String,
      checkpointDir: String, buckets: Int = 4096,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    maintainReduced(docs, deltaDir, checkpointDir, trigger)(
      TextAnalysis.bucketTotalsOf(_, buckets))

  /** Winnow-sketch maintainer (round-11, completing the screening
    * family's live path): every micro-batch of arriving documents
    * collapses to its distinct `(doc_id, fp)` winnow selections —
    * row-local arithmetic plus one batch-local dedupe — and lands as
    * `deltaDir/batch=<id>` (the [[maintain]] convention: idempotent
    * replay overwrite, manifest commit). The landed rows are the
    * WHOLE per-doc obligation: selections are per-document-local, so
    * base ∪ deltas IS the sketch of the grown corpus.
    */
  def maintainWinnowSketch(docs: DataFrame, deltaDir: String,
      checkpointDir: String, k: Int = 4, w: Int = 5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    maintainReduced(docs, deltaDir, checkpointDir, trigger)(
      TextAnalysis.winnowOf(_, k, w).select("doc_id", "fp").distinct())

  /** The LIVE winnow sketch: durable artifact ∪ accumulated deltas —
    * what [[graft.operators.TextAnalysis.winnowScreenOf]] must read
    * over a live corpus (a contaminating document that arrived via
    * deltas is invisible to the stale base until the corpus parquet
    * lands it — the positional-index one-sidedness argument). The
    * family is doc-keyed, not replay-id-filtered, so consolidations
    * serve directly and [[compactWinnowDeltas]] may fold everything.
    */
  def winnowSketchWithDeltas(spark: SparkSession, dir: String,
      deltaDir: String, k: Int = 4, w: Int = 5): DataFrame = {
    val base = TextAnalysis.loadOrBuildWinnowSketch(spark, dir, k, w)
    val parts = DeltaLog.liveParts(spark, deltaDir, prefix = "")
    if (parts.isEmpty) base
    else base.unionByName(spark.read.parquet(parts: _*))
  }

  /** In-dir compaction for the winnow delta family: selections are
    * per-document rows, so the fold is a plain distinct — bounded
    * part counts under sustained ingest, the [[DeltaLog.compactLive]]
    * crash/cleanup contract.
    */
  def compactWinnowDeltas(spark: SparkSession, deltaDir: String): Int =
    DeltaLog.compactLive(spark, deltaDir)(_.distinct())

  /** Line-count maintainer (the boilerplate family's live path):
    * every micro-batch of arriving documents collapses to its
    * per-line distinct-doc counts over the planted page view
    * ([[TextAnalysis.lineCountsOf]] — the in-doc distinct is
    * row-local, so the partial is one batch-local aggregation) and
    * lands as `deltaDir/batch=<id>` (the [[maintain]] convention).
    * Counts are ADDITIVE over disjoint doc sets, so base ∪ deltas
    * re-summed IS the line accounting of the grown corpus.
    */
  def maintainLineCounts(docs: DataFrame, deltaDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    maintainReduced(docs, deltaDir, checkpointDir, trigger)(b =>
      TextAnalysis.lineCountsOf(TextAnalysis.pagedOf(b)))

  /** The LIVE per-line document counts: durable artifact ∪
    * accumulated delta partials, re-summed — what a live boilerplate
    * screen must read (a template line crossing the minDocs
    * threshold via delta-arrived documents is invisible to the stale
    * base artifact). Additive-family serving cost: the merge touches
    * only line-count frames, never batch documents.
    */
  def lineCountsWithDeltas(spark: SparkSession, dir: String,
      deltaDir: String): DataFrame =
    baseWithDeltas(spark,
      TextAnalysis.loadOrBuildLineCounts(spark, dir), deltaDir)
      .groupBy("line").agg(sum(col("n_docs")).cast("long").as("n_docs"))

  /** In-dir compaction for the line-count family: counts are
    * additive (NOT idempotent under batch replay, unlike the
    * winnow family's distinct), so the fold respects the
    * checkpoint-watermark contract — fold only parts with id
    * strictly below the maintaining stream's committed batch id
    * ([[compactHistogramDeltas]] scaladoc).
    */
  def compactLineCountDeltas(spark: SparkSession, deltaDir: String,
      watermark: Long): Int =
    DeltaLog.compactLive(spark, deltaDir, foldBelow = watermark)(
      _.groupBy("line").agg(sum(col("n_docs")).cast("long").as("n_docs")))

  /** The live bucket sketch: the base corpus's durable sketch
    * artifact merged with all accumulated delta partials —
    * sum-of-partials IS sketch-of-union (bucket totals are additive),
    * so the refresh touches only B-row frames, never the base corpus.
    */
  def bucketSketchWithDeltas(spark: SparkSession, dir: String,
      deltaDir: String, buckets: Int = 4096): DataFrame =
    baseWithDeltas(spark,
      TextAnalysis.loadOrBuildBucketSketch(spark, dir, buckets), deltaDir)
      .groupBy("b").agg(sum("bt").as("bt"))

  /** Live heavy hitters over base + arrived deltas: the MERGED sketch
    * routes the hot-bucket recount over the union corpus, so the
    * exactness certificate's premise (sketch describes the recounted
    * corpus) holds and `certified = 1` keeps its proof. Serving a
    * STALE base-only sketch here is not a perf bug but a correctness
    * one — a delta-heavy term can hide in a bucket the stale sketch
    * calls cold while the result still certifies (spec-pinned) —
    * which is what makes the delta merge load-bearing. The sketch
    * refresh is B-row work; the recount pass over the union is the
    * batch algorithm's own second pass, proportional to hot-bucket
    * mass.
    */
  def heavyHittersWithDeltas(spark: SparkSession, dir: String,
      deltaDocs: DataFrame, deltaSketchDir: String,
      k: Int = 20, buckets: Int = 4096): DataFrame = {
    val union = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .unionByName(deltaDocs.select("doc_id", "text"))
    TextAnalysis.heavyHittersFromSketch(union,
      bucketSketchWithDeltas(spark, dir, deltaSketchDir, buckets), k, buckets)
  }
}
