package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.BlobSource
import graft.streaming.MmStream

/** [[MmStream.catalog]]: blobs arriving across two waves (with a
  * full query restart between them) are cataloged exactly once each,
  * and the streamed catalog is row-identical to the batch
  * [[Multimodal.metadataOf]] over the same directory.
  */
class MmStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("two waves across a restart: exactly-once, batch-identical") {
    val root = Files.createTempDirectory("graft-mmstream").toString
    val (blobs, out, ckpt) = (s"$root/bucket", s"$root/catalog", s"$root/ckpt")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")

    // wave 1: 25 blobs land, the catalog run drains them
    BlobSource.writeBlobs(
      docs.where(col("doc_id") % 20 === 0).select("doc_id", "text"), blobs)
    MmStream.catalog(spark, blobs, out, ckpt).awaitTermination()
    val after1 = spark.read.parquet(out).count()
    assert(after1 == 25L, s"wave 1 must catalog 25 blobs, got $after1")

    // wave 2: 25 MORE blobs land; a fresh query on the same
    // checkpoint must pick up only the new files
    BlobSource.writeBlobs(
      docs.where(col("doc_id") % 20 === 10).select("doc_id", "text"), blobs)
    MmStream.catalog(spark, blobs, out, ckpt).awaitTermination()

    val catalog = spark.read.parquet(out)
    assert(catalog.count() == 50L, "wave 2 adds exactly the new 25")
    assert(catalog.select("doc_id").distinct().count() == 50L,
      "no blob cataloged twice across the restart")
    // the streamed catalog is row-identical to the batch view
    val batch = Multimodal.metadataOf(BlobSource.readMedia(spark, blobs))
      .collect()
    val streamed = catalog.orderBy("doc_id").collect()
    assert(streamed.sameElements(batch))
  }
}
