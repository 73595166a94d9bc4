package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.JoinSearch

/** Search-as-a-service on Structured Streaming: query tables arrive
  * as a stream (file drop, Kafka topic of search requests); every
  * micro-batch runs the full multi-attribute search — the same
  * anchored pipeline, unchanged — against the static, session-cached
  * index, and hands the ranked result to the caller's sink.
  *
  * Why foreachBatch rather than a streaming join: the search is a
  * multi-stage aggregation (dedup, conjunction, scoring, ranking)
  * whose semantics are PER REQUEST BATCH, not over an unbounded
  * stream — a batch boundary IS the query boundary. foreachBatch
  * gives each request batch the complete batch planner (windows,
  * multi-aggregations, broadcasts — all of which Append-mode
  * streaming plans restrict) while the stream supplies ordering,
  * checkpointed exactly-once batch ids, and backpressure.
  *
  * Scale posture: the index side is the session-persisted
  * (cluster: bucketed) snapshot — never rescanned per request; the
  * query side is tiny per batch, so every join in the pipeline stays
  * broadcast exactly as in the batch engine. Pairs with
  * [[IndexStream]]: maintenance keeps the index fresh, serve() keeps
  * answering against it.
  */
object SearchStream {

  /** Start serving: `onResult(ranked, batchId)` receives the ranked
    * table scores for each arriving query batch.
    */
  def serve(index: DataFrame, queries: DataFrame, cols: Seq[String],
      checkpointDir: String, onResult: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onResult(JoinSearch.searchTables(index, batch.toDF(), cols), batchId)
        ()
      }
      .start()

  /** Phrase-search-as-a-service: requests `(req_id, phrase)` arrive
    * as a stream of RAW strings; every micro-batch tokenizes them
    * with the engine's one cleaning function and answers the whole
    * batch in ONE pass over the durable positional index
    * ([[graft.operators.TextAnalysis.phraseTopKBatch]] — shared
    * probe, shared per-doc position map, per-request anchors). The
    * per-batch request collect is metadata-sized (request strings,
    * not corpus data) — the same altitude as the batch's own
    * foreachBatch closure. Results land at `onResult(df, batchId)`
    * as `(req_id, doc_id, n_hits)` ranked per request.
    */
  def servePhrases(spark: org.apache.spark.sql.SparkSession, dir: String,
      requests: DataFrame, checkpointDir: String,
      onResult: (DataFrame, Long) => Unit, k: Int = 20,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    requests.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import org.apache.spark.sql.functions._
        val reqs = batch.toDF()
          .select(col("req_id").cast("string"),
            split(graft.functions.Tokenize.clean(col("phrase")), " ")
              .as("ts"))
          .collect()
          .map(r => r.getString(0) ->
            r.getSeq[String](1).filter(_.nonEmpty).toSeq)
          .toSeq
        if (reqs.nonEmpty)
          onResult(
            graft.operators.TextAnalysis.phraseTopKBatch(spark, dir, reqs, k),
            batchId)
        ()
      }
      .start()
}
