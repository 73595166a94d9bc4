package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorMath
import graft.operators.Similarity

/** Streaming similarity ingest: embeddings arriving from an encoder
  * are routed to their IVF cell AT THE DOOR, so the vector index and
  * its routing statistics stay live between codebook retrainings —
  * the streaming half of [[Similarity.ivfCells]], completing the
  * family's batch/stream pairing (index deltas, search service,
  * event windows, ingest dedup already have theirs).
  *
  * Formulation: the trained codebook (a numCents-row static frame)
  * folds into ONE array row, stream-static-cross-joined onto the
  * stream; the nearest-centroid argmax then runs as a row-local
  * higher-order-function fold. This makes routing STATELESS — no
  * shuffle, no streaming state, arbitrarily shardable — because the
  * decision per vector depends only on the (small) codebook, exactly
  * like the batch form's broadcast. Per-cell occupancy is the one
  * stateful stage: a numCents-row keyed count, the bounded-state
  * shape Spark's streaming aggregation is built for.
  *
  * Quantization, dot, cosine, and tie-break replicate
  * [[Similarity]]'s exact-bigint semantics term for term, so a
  * vector routed by the stream lands in the SAME cell the batch
  * assignment would give it — pinned by `SimStreamSpec` over the
  * real corpus replayed as micro-batches.
  */
object SimStream {

  /** Nearest-centroid routing of a streaming `(vec_id, embedding)`
    * frame against a trained static codebook `(cent_id, cq)`
    * ([[Similarity.ivfCodebook]]'s schema). Emits `(vec_id,
    * cell_id)` rows, append-mode, stateless.
    *
    * The argmax mirrors the batch `max(struct(cosd, -cent_id))`
    * exactly: higher cosine wins, ties break to the LOWER cent_id;
    * cosines are the same doubles (one cast of the exact-bigint dot
    * and norms), so comparisons agree bit for bit with the batch
    * assignment.
    */
  def routeCells(stream: DataFrame, codebook: DataFrame): DataFrame =
    routeCellsFull(stream, codebook).select("vec_id", "cell_id")

  /** [[routeCells]] keeping the quantized payload: `(vec_id, q, nq,
    * cell_id)` — the full row a searchable vector DELTA lands with
    * ([[maintainVectors]]), so serving never re-quantizes.
    */
  def routeCellsFull(stream: DataFrame, codebook: DataFrame): DataFrame = {
    val book = codebook
      .withColumn("cnq", VectorMath.dotLong(col("cq"), col("cq")))
      .agg(collect_list(struct(col("cent_id"), col("cq"), col("cnq")))
        .as("book"))
    val cos = s"""cast(aggregate(zip_with(q, b.cq, (x, y) -> x * y),
      0L, (a, v) -> a + v) as double)
      / (sqrt(cast(nq as double)) * sqrt(cast(b.cnq as double)))"""
    stream
      // the batch door's admission predicate, applied at the stream
      // door too ([[Similarity.admissibleVector]]): a null / truncated
      // / NaN arrival must be dropped HERE, not crash the quantization
      // cast of a whole micro-batch — and must stay invisible to
      // serving exactly as the batch path would keep it. CASE-guarded
      // AT the quantization (the request-door convention): total by
      // construction, immune to a downstream filter's pushdown
      // substituting the raw cast below any admission `.where`.
      .select(col("vec_id"),
        when(Similarity.admissibleVector,
          expr(s"transform(embedding, x -> cast(round(cast(x as double) * ${Similarity.QuantScale}) as bigint))"))
          .as("q"))
      .where(col("q").isNotNull)
      .withColumn("nq", VectorMath.dotLong(col("q"), col("q")))
      .crossJoin(book)
      .withColumn("scored",
        expr(s"transform(book, b -> named_struct('c', $cos, 'id', cast(b.cent_id as bigint)))"))
      // zero-norm arrival (nq = 0): every cosine is 0/0 = NaN, which
      // this fold's `>` comparisons would leave at the sentinel cell
      // -1 — while the batch assignment's max(struct(cosd, ...))
      // orders NaN equal-greatest and tie-breaks to the MINIMUM
      // cent_id. Route the degenerate case to that same minimum
      // explicitly so stream and batch agree on every input, not
      // just well-formed ones (round-9 self-review finding; the
      // trained book itself never contains zero-norm centroids, so
      // nq = 0 is the only NaN source).
      .withColumn("cell_id", when(col("nq") === 0L,
          expr("array_min(transform(book, b -> cast(b.cent_id as bigint)))"))
        .otherwise(expr(
          """aggregate(scored,
             named_struct('c', cast(-2.0 as double), 'id', cast(-1 as bigint)),
             (acc, s) -> CASE WHEN s.c > acc.c
                              OR (s.c = acc.c AND s.id < acc.id)
                         THEN s ELSE acc END).id""")))
      .select("vec_id", "q", "nq", "cell_id")
  }

  /** Searchable-vector delta maintenance (the round-9 positional-
    * delta pattern on the vector side): every micro-batch of
    * arriving `(vec_id, embedding)` rows quantizes and routes
    * against the DURABLE codebook and lands as
    * `vecDeltaDir/batch=<id>` with its full serving row `(vec_id,
    * q, nq, cell_id)` — idempotently overwritten on replay. Serving
    * reads [[Similarity.quantizedWithDeltas]] /
    * [[Similarity.ivfCellsWithDeltas]]: a vector is a LIVE search
    * candidate the moment its batch lands, instead of invisible
    * until the next corpus re-encode (`VectorDeltaSpec` pins the
    * failure and the fix). Routing is stateless (broadcast-sized
    * folded book), so the stream shards arbitrarily; the delta dir
    * is the ONE canonical per-corpus location — the landed cell_id
    * records the maintenance book's routing, and a serving path on a
    * different book re-derives cells from the quantized payload
    * ([[Similarity.ivfCellsWithDeltas]]), so deltas can never be
    * silently invisible to a consumer that didn't thread the
    * maintenance-time k (round-9 review).
    */
  def maintainVectors(spark: org.apache.spark.sql.SparkSession,
      dir: String, stream: DataFrame, checkpointDir: String,
      numCents: Int = 8,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val book = Similarity.ivfCodebook(spark, dir, numCents)
    val deltaDir = Similarity.vecDeltaDir(dir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        routeCellsFull(batch.toDF(), book)
          .write.mode("overwrite").parquet(s"$deltaDir/batch=$batchId")
        DeltaLog.commit(batch.sparkSession, deltaDir, s"batch=$batchId")
        ()
      }
      .start()
  }

  /** [[routeCells]] against the corpus's DURABLE trained codebook
    * ([[Similarity.ivfCodebook]] — the content-fingerprint-gated
    * artifact beside the snapshot): a restarted ingest resumes
    * routing from the persisted book instead of retraining it, so
    * stream routing and the batch assignment artifact stay aligned
    * across sessions by construction (same book, same exact-bigint
    * argmax).
    */
  def routeCellsDurable(spark: org.apache.spark.sql.SparkSession,
      dir: String, stream: DataFrame): DataFrame =
    routeCells(stream, Similarity.ivfCodebook(spark, dir))

  /** Live per-cell occupancy: the streaming aggregation whose state
    * is exactly numCents rows — what the balance sampler
    * ([[Similarity.clusterBalance]]) and a cell-skew monitor read
    * between retrainings. Update-mode sink.
    */
  def cellCounts(routed: DataFrame): DataFrame =
    routed.groupBy("cell_id").agg(count(lit(1)).as("n_members"))

  /** Vector-search-as-a-service: probe requests `(qid, embedding)`
    * arrive as a stream; every micro-batch scores THE WHOLE REQUEST
    * BATCH against the static session-persisted corpus through the
    * bounded TopK aggregator ([[Similarity.cosineTopKAggProbes]] —
    * one probe-set broadcast per batch, O(k) state per probe) and
    * hands the ranked neighbors to the caller's sink. Same
    * foreachBatch rationale as [[SearchStream.serve]]: a batch
    * boundary IS the query boundary, and the corpus side is never
    * rescanned — it is the quantized persisted frame every batch
    * consumer shares. No self-exclusion: request ids live in request
    * space (an external query equal to a corpus vector legitimately
    * retrieves it at cos = 1).
    */
  def serveVectors(spark: org.apache.spark.sql.SparkSession, dir: String,
      requests: DataFrame, checkpointDir: String,
      onResult: (DataFrame, Long) => Unit, k: Int = 10,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    requests.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        // LIVE corpus (round 9): a request can retrieve a vector
        // that itself arrived by stream — base + routed deltas,
        // zero-norm arrivals excluded from scoring.
        onResult(Similarity.cosineTopKAggProbesLive(spark, dir, batch.toDF(), k),
          batchId)
        ()
      }
      .start()
}
