package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Cdc

/** Streaming CDC apply: the change feed arrives as a STREAM (a
  * crawler's recrawl/takedown/discovery events) and folds into a
  * durable snapshot as it lands — the lakehouse `MERGE INTO` loop,
  * built from [[Cdc.mergeSnapshot]] + `foreachBatch`. The batch
  * composition law pinned by `CdcSpec` (sequential merges == one
  * merged feed) is exactly what licenses this: applying each
  * micro-batch as it arrives yields the same snapshot as one batch
  * merge of the whole feed.
  *
  * Snapshots are VERSIONED, keyed by the micro-batch id:
  * processing batch `k` reads version `k` (version 0 is the base
  * corpus) and writes version `k+1`. This gives exactly-once effects
  * on at-least-once foreachBatch delivery for free — a replayed
  * batch `k` after a crash re-reads the SAME input version `k` and
  * overwrites the SAME output version `k+1`, so the rewrite is
  * byte-idempotent rather than double-applied; no transaction log is
  * needed beyond the checkpoint's batch ids. (Reading `v=k` while
  * writing `v=k+1` also never overwrites its own input — the
  * self-overwrite hazard of a single snapshot path.) A compactor
  * can garbage-collect versions `<= k-1` at leisure; the latest
  * version is always a complete snapshot, not a delta chain.
  *
  * Scale posture: each micro-batch pays one [[Cdc.mergeSnapshot]] —
  * a full-outer sort-merge join of snapshot × batch. At 100 TB one
  * does NOT run this per minute; the stream's role is to land feed
  * batches durably, and the merge cadence (the trigger) is the
  * rewrite-amortization knob, same as any lakehouse MERGE. The
  * composition law is what makes batching feeds before a merge
  * exact.
  */
object CdcStream {

  /** Where version `v` of the snapshot lives. */
  def versionPath(snapDir: String, v: Long): String = s"$snapDir/v=$v"

  /** The input snapshot for micro-batch `id`: the base corpus for
    * batch 0, else the previous batch's output.
    */
  private def snapshotFor(spark: SparkSession, base: DataFrame,
      snapDir: String, id: Long): DataFrame =
    if (id == 0) base
    else spark.read.parquet(versionPath(snapDir, id))

  /** Start folding the streaming change `feed` (the
    * [[Cdc.changeFeed]] schema: doc_id, seq, op, text, lang, source)
    * into versioned snapshots under `snapDir`, beginning from
    * `base`. Feed batches must arrive in per-key seq order (the
    * change-log contract); ops within one batch compact by seq as in
    * the batch merge.
    */
  def applyFeed(feed: DataFrame, base: DataFrame, snapDir: String,
      checkpoint: String): StreamingQuery =
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val cur = snapshotFor(batch.sparkSession, base, snapDir, id)
        Cdc.mergeSnapshot(cur, batch)
          .drop("origin")
          .write.mode("overwrite")
          .parquet(versionPath(snapDir, id + 1))
      }
      .start()
}
