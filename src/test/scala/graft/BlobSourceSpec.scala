package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.BlobSource

/** [[BlobSource]]: the raw-blob media ingress. Pins (1) the
  * roundtrip — blobs written from documents and read back through
  * binaryFile yield byte-identical media metadata to the
  * parquet-derived table; (2) directory hygiene — glob-pruned
  * sidecars and null-surfaced foreign names; (3) the scale contract
  * — the length guard is a PUSHED binaryFile filter, so oversized
  * blobs are skipped at the file index.
  */
class BlobSourceSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-blobs").toString
    BlobSource.writeBlobs(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .where(col("doc_id") % 10 === 0).select("doc_id", "text"),
      d)
    // sidecar noise a real bucket carries: must be glob-pruned.
    Files.write(Paths.get(d, "manifest.txt"),
      "not media".getBytes(StandardCharsets.UTF_8))
    d
  }

  test("roundtrip: blob-read metadata == parquet-derived metadata") {
    val fromBlobs = Multimodal.metadataOf(BlobSource.readMedia(spark, dir))
      .orderBy("doc_id").collect()
    val fromParquet = Multimodal.metadata(spark, sf0001)
      .where(col("doc_id") % 10 === 0).collect()
    assert(fromBlobs.length == fromParquet.length && fromBlobs.nonEmpty)
    assert(fromBlobs.sameElements(fromParquet))
  }

  test("foreign filenames surface as null identity, never dropped") {
    Files.write(Paths.get(dir, "doc_oops.jpg"),
      "unparseable id".getBytes(StandardCharsets.UTF_8))
    try {
      val rows = BlobSource.readMedia(spark, dir)
        .where(col("doc_id").isNull).collect()
      assert(rows.length == 1 && rows.head.getAs[String]("media_type") == "image")
    } finally Files.delete(Paths.get(dir, "doc_oops.jpg"))
  }

  test("the length guard reaches the scan as a pushed filter") {
    val plan = BlobSource.readMedia(spark, dir, maxBytes = 128)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("LessThanOrEqual(length,128"),
      s"length filter not pushed to the binaryFile scan:\n$plan")
    // and it is not just advisory: oversized blobs are absent.
    val maxLen = BlobSource.readMedia(spark, dir, maxBytes = 128)
      .agg(max(col("meta.n_bytes"))).head().getLong(0)
    assert(maxLen <= 128)
  }
}
