package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Multimodal
import graft.sources.BlobSource

/** Streaming media-catalog maintenance: blobs landing in a bucket
  * directory flow through the binaryFile STREAM source
  * ([[BlobSource.readMediaStream]]), normalize into the media
  * schema, and append their row-local metadata projection to a
  * parquet catalog — the live twin of the batch `mm_metadata` /
  * `blob_source_metadata` view, so a media lake's catalog stays
  * current without re-listing history.
  *
  * Exactly-once comes from BOTH ends being the engine's own file
  * machinery: the file SOURCE records processed files in the
  * checkpoint (a blob is read in exactly one micro-batch, ever), and
  * the parquet file SINK commits batches through its transaction
  * log — restart replays nothing and loses nothing (spec-pinned
  * across a stop/start boundary).
  *
  * Scale posture: the projection is entirely row-local (codegen'd
  * hashing on payload bytes; no shuffle, no state store), so a
  * micro-batch costs exactly its own blobs' bytes. The catalog
  * carries hashes and dimensions, never payloads — downstream dedup
  * and rollups read the catalog, not the bucket.
  */
object MmStream {

  def catalog(spark: SparkSession, blobDir: String, outDir: String,
      checkpointDir: String, maxBytes: Long = 64L << 20,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Multimodal.metadataProjection(
        BlobSource.readMediaStream(spark, blobDir, maxBytes))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
