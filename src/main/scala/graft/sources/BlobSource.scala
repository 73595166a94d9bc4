package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Raw-blob media ingress: a DIRECTORY of opaque files (the shape a
  * crawler or an object-store media bucket actually delivers) read
  * through Spark's `binaryFile` source and normalized into the
  * engine's media schema ([[Multimodal.withMeta]]), so every
  * downstream media operator (metadata, frames, dedup, perceptual
  * near-dup) runs unchanged whether payloads arrived inside parquet
  * columns or as loose files.
  *
  * Scale posture (100 TB of media):
  *  - `binaryFile` splits by FILE (one row per blob) and lists the
  *    directory tree distributed — no driver-side enumeration of
  *    blob contents;
  *  - the `length <= maxBytes` guard is a binaryFile PUSHED filter
  *    (the source supports pushdown on path/length/modificationTime):
  *    oversized blobs are skipped at the file index, their bytes
  *    never read — the spec asserts the filter reaches the scan.
  *    Spark additionally hard-caps a single row's content at
  *    `spark.sql.sources.binaryFile.maxLength` (Int.MaxValue);
  *    blob-store-scale media should stay well under it per object;
  *  - `pathGlobFilter` prunes non-media files during listing, so a
  *    mixed directory (sidecar manifests, checksums) costs nothing.
  *
  * Identity travels in the FILENAME (`doc_<id>.<ext>`), the blob
  * store's only metadata channel; the extension maps to the
  * modality. Files that do not parse (foreign names, unknown
  * extensions) surface as null doc_id/media_type rows rather than
  * being silently dropped — callers choose to assert or filter.
  */
object BlobSource {

  private val TypeByExt =
    Seq("jpg" -> "image", "wav" -> "audio", "mp4" -> "video")

  private def extFor(docId: Long): String = (docId % 3) match {
    case 0 => "jpg"; case 1 => "wav"; case _ => "mp4"
  }

  /** Executor-side blob export (fixture writer for the roundtrip
    * query and specs): each partition writes its own documents as
    * `doc_<id>.<ext>` files — the distributed write shape a real
    * blob sink uses (no driver collect) — then the driver drops a
    * `_SUCCESS` marker for [[graft.Queries]]-style write-once gating.
    * The extension follows the same `doc_id mod 3` modality rule as
    * [[Multimodal.media]], so the roundtrip is comparable row-for-row.
    */
  def writeBlobs(documents: DataFrame, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    documents.select(col("doc_id"), col("text"))
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach { r =>
          val id = r.getLong(0)
          Files.write(Paths.get(outDir, s"doc_$id.${extFor(id)}"),
            r.getString(1).getBytes(StandardCharsets.UTF_8))
        }
      }
    Files.write(Paths.get(outDir, "_SUCCESS"), Array.emptyByteArray)
  }

  /** Read a blob directory as the engine's media frame
    * `(doc_id, media_type, payload, meta)`. */
  def readMedia(spark: SparkSession, blobDir: String,
      maxBytes: Long = 64L << 20): DataFrame =
    normalize(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", "doc_*.*")
        .load(blobDir),
      maxBytes)

  /** The binaryFile row schema (a STREAMING read must declare it;
    * the batch read infers the same four columns).
    */
  private val BinaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** [[readMedia]] as a STREAM: blobs appearing in the directory
    * arrive as micro-batch rows through the file source's
    * exactly-once discovery (each file processed in exactly one
    * batch, tracked in the checkpoint — a re-listed old blob is
    * never re-emitted). The ingestion face of
    * [[graft.streaming.MmStream.catalog]].
    */
  def readMediaStream(spark: SparkSession, blobDir: String,
      maxBytes: Long = 64L << 20): DataFrame =
    normalize(
      spark.readStream.format("binaryFile")
        .schema(BinaryFileSchema)
        .option("pathGlobFilter", "doc_*.*")
        .load(blobDir),
      maxBytes)

  /** The shared normalization: filename identity, extension
    * modality, payload, metadata struct — one definition for the
    * batch and streaming reads.
    */
  private def normalize(raw: DataFrame, maxBytes: Long): DataFrame = {
    // try_element_at: under ANSI mode a plain element_at THROWS on a
    // missing map key, so one stray unknown-extension file in a blob
    // landing zone would abort the whole ingest. Unknown extensions
    // instead surface as media_type = null (quarantine rows, visible
    // downstream) — totality convention
    // ([[graft.functions.Tokenize.windowedSql]] scaladoc).
    val typeByExt = try_element_at(
      map(TypeByExt.flatMap { case (e, t) => Seq(lit(e), lit(t)) }: _*),
      regexp_extract(col("path"), "\\.([a-z0-9]+)$", 1))
    Multimodal.withMeta(
      raw
        .where(col("length") <= maxBytes)
        .select(
          nullif(regexp_extract(col("path"), "doc_(\\d+)\\.[a-z0-9]+$", 1),
            lit("")).cast("long").as("doc_id"),
          typeByExt.as("media_type"),
          col("content").as("payload")))
  }
}
