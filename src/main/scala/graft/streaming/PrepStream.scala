package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** The live ingestion path of a training-corpus factory: one
  * streaming pipeline composing the engine's admission stages over a
  * raw document feed —
  *
  *   1. exact dedup ([[DedupStream.dedupExact]]): byte-identical
  *      re-crawls drop inside the watermark window;
  *   2. near dedup ([[DedupStream.dedupNearSignature]]):
  *      identical-MinHash-signature replicas (whitespace / case /
  *      boilerplate edits) drop — the over-KEEP-biased streaming
  *      rung; the batch LSH pass stays the global guarantee;
  *   3. quality gate: per-source ADAPTIVE token cutoffs served from
  *      the base histogram + accumulated deltas
  *      ([[TextStream.cutoffsWithDeltas]]) — the cutoff a document
  *      faces moves as the crawl's own distribution drifts;
  *   4. landing: admitted documents append as `kept/batch=<id>`,
  *      and the batch's per-source histogram lands as a delta so
  *      FUTURE batches are judged against a distribution that
  *      includes this one.
  *
  * Exactly-once without a transaction log (the [[CdcStream]]
  * argument): every landed path is keyed by the micro-batch id and
  * written `overwrite`, so a replayed batch rewrites its own
  * directories instead of double-counting. Replay DETERMINISM needs
  * one extra care: admission reads cutoffs from deltas with id
  * strictly BELOW the current batch (a failed attempt's own
  * histogram must not move the cutoff its retry admits against).
  *
  * Histograms fold from the POST-DEDUP, PRE-QUALITY batch:
  * duplicates are not new evidence about the crawl, but rejected
  * short documents ARE — a survivorship-fed histogram would ratchet
  * the cutoff upward forever (each batch's median computed only
  * over survivors of the last), while the crawl-fed histogram
  * converges to the true distribution.
  *
  * Scale posture: both stateful stages key O(1) state per distinct
  * content inside the watermark; the per-batch join is |sources|
  * rows broadcast; landed deltas are histogram-sized. Nothing in
  * the per-batch work scales with the base corpus.
  */
object PrepStream {

  /** Start the admission pipeline over a streaming documents frame
    * carrying `(ts, doc_id, text, source)`. `dir` is the base
    * corpus; `deltaDir`/`keptDir` receive `batch=<id>` datasets.
    */
  def admit(docs: DataFrame, dir: String, deltaDir: String,
      keptDir: String, checkpointDir: String,
      delay: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    DedupStream.withSignature(DedupStream.dedupExact(docs, "ts", delay))
      .dropDuplicatesWithinWatermark("minhash_sig")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        admitBatch(batch.toDF(), batchId, dir, deltaDir, keptDir)
        ()
      }
      .start()

  /** One micro-batch's admission: quality-gate against the
    * cutoffs-as-of-arrival, land survivors and the batch histogram.
    * Unknown sources (no base or delta history) admit — a cutoff
    * nobody has evidence for must not silently reject a new domain's
    * first crawl.
    */
  def admitBatch(batch: DataFrame, batchId: Long, dir: String,
      deltaDir: String, keptDir: String): Unit = {
    val spark = batch.sparkSession
    val enriched = batch
      .withColumn("n_ws_tokens", size(split(col("text"), " ")).cast("long"))
      .persist()
    try {
      val cutoffs =
        TextStream.cutoffsWithDeltas(spark, dir, deltaDir, batchId)
      enriched
        .join(broadcast(cutoffs), Seq("source"), "left")
        .where(col("median_tokens").isNull ||
          col("n_ws_tokens") >= col("median_tokens"))
        // drop the pipeline-internal columns before landing: the
        // dedup stages' null-text/no-shingle fallbacks are per-row
        // uuid(), so keeping them would make a crash-replayed batch
        // rewrite its directory with DIFFERENT bytes — membership
        // was replay-stable but content was not (round-8 self-review
        // finding).
        .drop("median_tokens", "content_hash", "minhash_sig")
        .write.mode("overwrite").parquet(s"$keptDir/batch=$batchId")
      TextAnalysis.sourceTokenHistogramOf(
          enriched.select("doc_id", "n_ws_tokens", "source"))
        .write.mode("overwrite").parquet(s"$deltaDir/batch=$batchId")
      DeltaLog.commit(spark, deltaDir, s"batch=$batchId")
    } finally { enriched.unpersist(); () }
  }
}
