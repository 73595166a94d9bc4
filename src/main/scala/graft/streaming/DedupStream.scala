package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest deduplication: drop exact-duplicate documents as
  * they arrive, BEFORE they reach storage — the streaming half of
  * [[graft.operators.Dedup.exact]], and the shape a production
  * crawl/ingest pipeline actually needs (batch dedup after landing
  * pays the write + rescan for rows that were never going to be
  * kept).
  *
  * Formulation: content hash -> watermark ->
  * `dropDuplicatesWithinWatermark`. First arrival wins; any replica
  * arriving while the first is inside the watermark window is
  * dropped. This is Spark's bounded-state dedup operator: state
  * holds one entry per distinct hash and EXPIRES at the watermark —
  * a plain streaming `dropDuplicates` would pin every hash ever seen
  * and grow without bound, which at crawl scale is the job's OOM.
  * The window is therefore an explicit semantic knob: replicas
  * separated by more than `delay` both survive, and the downstream
  * batch pass ([[graft.operators.Dedup.exact]] over the landed
  * corpus) remains the global guarantee; the stream stage exists to
  * cut the overwhelmingly-common near-in-time duplicates (re-crawls,
  * retry storms) at the door.
  *
  * Scale posture: the hash is computed row-locally (codegen'd md5,
  * no UDF); state is hash-partitioned across executors by the dedup
  * key, so the operator shards like any keyed aggregation; RocksDB
  * state store + changelog checkpointing is configuration, not code.
  */
object DedupStream {

  /** Distinct-by-content view of a streaming `documents` frame.
    * `docs` must carry `text` and an event-time column `eventTimeCol`
    * (TimestampType). Emits the input columns plus `content_hash`.
    *
    * Null-text rows have no content to deduplicate on — md5(NULL) is
    * NULL, and `dropDuplicatesWithinWatermark` treats NULL keys as
    * EQUAL, which would silently collapse every null-text document
    * inside the watermark to one survivor. They get a per-row unique
    * hash instead, so each passes through; rejecting them is the
    * caller's policy, not this operator's.
    */
  def dedupExact(docs: DataFrame, eventTimeCol: String,
      delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash",
        coalesce(md5(col("text").cast("binary")), concat(lit("null-text:"), uuid())))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
}
