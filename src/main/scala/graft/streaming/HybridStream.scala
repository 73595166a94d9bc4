package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Hybrid

/** Hybrid-retrieval-as-a-service: requests `(req_id, qtext,
  * embedding)` arrive as a stream — the raw form a serving endpoint
  * receives, text AND vector per request — and every micro-batch is
  * answered in one fused pass ([[Hybrid.rrfTopKRequests]]): one
  * shared BM25 postings lineage for the batch's union term set, one
  * probe-set broadcast on the vector tower, exact-integer RRF per
  * request. Same foreachBatch rationale as [[SearchStream.serve]]
  * and [[SimStream.serveVectors]] — a batch boundary IS the query
  * boundary, and both towers' corpus-side frames are session-
  * persisted, never rescanned per batch.
  */
object HybridStream {

  /** Start serving: `onResult(fused, batchId)` receives
    * `(probe_id, rank, doc_id, rrf_score, rank_text, rank_vec)` for
    * each arriving request batch.
    */
  def serve(spark: SparkSession, dir: String, requests: DataFrame,
      checkpointDir: String, onResult: (DataFrame, Long) => Unit,
      k: Int = 20, kCand: Int = 50, qTerms: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    requests.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onResult(
          Hybrid.rrfTopKRequests(spark, dir, batch.toDF(), k, kCand, qTerms),
          batchId)
        ()
      }
      .start()
}
