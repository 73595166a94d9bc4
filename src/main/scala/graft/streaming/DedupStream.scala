package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Tokenize

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

  /** The full MinHash signature of a text column, computed entirely
    * row-locally: distinct word 3-gram shingles (the exact
    * [[graft.operators.Dedup.shingles]] formula, inlined as array
    * expressions instead of an explode+groupBy) and, per seed `i`,
    * the lexicographic minimum of `md5(i|shingle)` — the exact
    * [[graft.operators.Dedup.minhash]] value — joined with `|`.
    * Identical numbers to the batch family by construction
    * (spec-proven), but with NO aggregation: legal and cheap inside a
    * streaming micro-batch. Texts with fewer than 3 cleaned words
    * have no shingles and get a per-row unique marker (the null-text
    * rationale: signatureless rows must never collapse onto each
    * other).
    */
  def minhashSignature(text: Column, numSeeds: Int = 8): Column = {
    val w = split(Tokenize.clean(text), " ")
    // total shingle expression: guarded HERE (not only by the outer
    // `when`) so a <3-word text can never hit the descending
    // `sequence(1, -1)` even if a rewrite evaluates `sh` eagerly —
    // totality convention ([[graft.functions.Tokenize.windowedSql]]).
    val sh = array_distinct(
      when(size(w) >= 3,
        transform(sequence(lit(1), size(w) - 2),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
            element_at(w, i + 2))))
        .otherwise(array().cast("array<string>")))
    val mins = (0 until numSeeds).map(i =>
      array_min(transform(sh, x => md5(concat(lit(s"$i|"), x).cast("binary")))))
    when(text.isNotNull && size(w) >= 3, concat_ws("|", mins: _*))
      .otherwise(concat(lit("no-shingle:"), uuid()))
  }

  /** Streaming NEAR-duplicate suppression: drop documents whose full
    * MinHash signature was already admitted inside the watermark
    * window — the streaming counterpart of
    * [[graft.operators.Dedup.minhashLsh]], with deliberately
    * asymmetric semantics forced by the state operator:
    * `dropDuplicatesWithinWatermark` keys state on ONE value per row,
    * so banded any-band-matches candidacy (an OR across bands, then a
    * verify join) cannot be expressed without a stateful join per
    * band feeding a destructive decision. The stream therefore keys
    * on the WHOLE signature: a false drop needs all `numSeeds`
    * minhashes to collide, probability ~ J^numSeeds for true Jaccard
    * J (< 1% even at J = 0.5, n = 8) — biased to over-KEEP, the safe
    * side of a destructive operator. Identical-shingle-set replicas
    * (re-crawls with boilerplate/whitespace/case edits — the dominant
    * in-stream dup class, which [[dedupExact]]'s raw-byte hash
    * misses) collapse at the door; lightly-edited near-dups pass
    * through to the batch LSH pass, which remains the global
    * guarantee. State: one row per distinct signature, expired at the
    * watermark, sharded by signature hash.
    */
  def dedupNearSignature(docs: DataFrame, eventTimeCol: String,
      delay: String = "10 minutes", numSeeds: Int = 8): DataFrame =
    withSignature(docs, numSeeds)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("minhash_sig")

  /** The signature column without the watermark/drop — the seam a
    * COMPOSED pipeline needs ([[PrepStream.admit]] chains this after
    * [[dedupExact]], whose watermark already governs the stream:
    * redefining a watermark mid-stream is illegal, so each stage
    * past the first drops on the inherited one).
    */
  def withSignature(docs: DataFrame, numSeeds: Int = 8): DataFrame =
    docs.withColumn("minhash_sig", minhashSignature(col("text"), numSeeds))
}
