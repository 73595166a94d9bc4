package graft

import org.apache.spark.sql.functions._

import graft.operators.{ImageCodec, Multimodal}
import graft.operators.ImageCodec.ImageIoCodec

/** The REAL decoder behind the Codec seam (round-15 verdict #4):
  * javax.imageio pixel reads pinned on crafted images with known
  * grids, seam-contract parity with the fake codec's pipeline, and
  * the banded near-dup collapse verified on real pixels.
  */
class ImageCodecSpec extends SparkTestBase {

  /** Encode a w x h image from an (x, y) => gray function. */
  private def png(w: Int, h: Int)(gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decode: real dimensions, one frame, undecodable payload yields no frames") {
    val p = png(36, 16)((x, _) => x * 7)
    val (frames, w, h) = ImageIoCodec.decode(p)
    assert((w, h) === (36L, 16L))
    assert(frames.length === 1 && frames.head.length === 32)
    // decode is a function of the PIXELS, not the container bytes:
    // re-encoding the same image must hash identically
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    assert(ImageIoCodec.decode(out.toByteArray)._1 === frames)
    // garbage payload: no frames, zero dims, no throw
    assert(ImageIoCodec.decode("not a png".getBytes) === (Seq.empty, 0L, 0L))
    assert(ImageIoCodec.lumaGrid("not a png".getBytes) === Seq.fill(72)(0))
  }

  test("lumaGrid: known pixels produce the known 8x9 grid and dHash gradient") {
    // flat gray 100 everywhere -> every cell 100, no gradients
    val flat = ImageIoCodec.lumaGrid(png(27, 24)((_, _) => 100))
    assert(flat === Seq.fill(72)(100))
    // columns brighten left to right in 9 even bands -> EVERY
    // left-to-right gradient bit fires (luma(c+1) > luma(c))
    val ramp = ImageIoCodec.lumaGrid(png(27, 24)((x, _) => (x / 3) * 20))
    assert(ramp === (0 until 8).flatMap(_ => (0 until 9).map(_ * 20)))
    val spark0 = spark
    import spark0.implicits._
    val grids = Seq((1L, "image", ramp), (2L, "image", flat))
      .toDF("doc_id", "media_type", "luma")
    val dh = Multimodal.dhashOf(grids).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dhash_lo"), r.getAs[Long]("dhash_hi"))).toMap
    assert(dh(1L) === ((0xffffffffL, 0xffffffffL)), "all 64 gradients fire on the ramp")
    assert(dh(2L) === ((0L, 0L)), "no gradient fires on flat gray")
  }

  test("seam parity: the full phash/near-dup pipeline runs on REAL pixels; " +
      "re-encode twins collapse where content-hash is blind") {
    val spark0 = spark
    import spark0.implicits._
    // base image + a near-twin (3 pixels brightened inside one cell)
    // + a structurally different image. Content hashes all differ;
    // the twin must land within Hamming 3, the different one far.
    val base = png(27, 24)((x, y) => ((x / 3) ^ (y / 3)) * 25)
    val twin = png(27, 24)((x, y) =>
      if (x < 3 && y < 3 && x == y) ((x / 3) ^ (y / 3)) * 25 + 6
      else ((x / 3) ^ (y / 3)) * 25)
    val other = png(27, 24)((x, y) => (if ((x / 3 + y / 3) % 2 == 0) 220 else 10))
    val media = Multimodal.withMeta(
      Seq((1L, "image", base), (2L, "image", twin), (3L, "image", other))
        .toDF("doc_id", "media_type", "payload"))
    // content hashes all distinct (dedupMedia's rung is blind here)
    assert(media.select(countDistinct(col("meta.payload_md5"))).head.getLong(0) === 3L)
    val hashes = Multimodal.dhashOf(Multimodal.lumaGrids(media, ImageIoCodec))
    val pairs = Multimodal.neardupFromHashes(hashes, maxHam = 3)
      .select("doc_x", "doc_y").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "the re-encoded twin must collapse onto base")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "a structurally different image must not collapse")
  }

  test("rendered PNG fixture: deterministic bytes, real decode, locality") {
    val a = ImageCodec.renderPng("some document text for the png fixture")
    assert(a sameElements ImageCodec.renderPng("some document text for the png fixture"))
    val (frames, w, h) = ImageIoCodec.decode(a)
    assert((w, h) === (ImageCodec.W.toLong, ImageCodec.H.toLong) && frames.nonEmpty)
    // locality: a one-char edit moves few grid cells (the re-encode
    // near-dup contract the fake codec also honors)
    val b = ImageCodec.renderPng("some document text for the png fixturX")
    val ga = ImageIoCodec.lumaGrid(a); val gb = ImageIoCodec.lumaGrid(b)
    // one edited byte owns a contiguous run of ~648/len pixels (~16
    // here), spanning at most ceil(16/3)+1 = 7 of the 72 cells
    val moved = ga.zip(gb).count { case (x, y) => x != y }
    assert(moved >= 1 && moved <= 8, s"a local edit moved $moved of 72 cells")
    // empty text renders and decodes (all-black)
    assert(ImageIoCodec.lumaGrid(ImageCodec.renderPng("")) === Seq.fill(72)(0))
  }

  test("registered query: dHashes from the durable real-grid artifact, stamped and stable") {
    val out = ImageCodec.phashImageIo(spark, sf0001).collect()
    assert(out.nonEmpty)
    // every non-null-text doc has exactly one hash row
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("text").isNotNull).count()
    assert(out.length.toLong === nDocs)
    // artifact committed under the versioned gate (stamped v= dir)
    val served = graft.sources.Artifacts.servedPathLocal(
      ImageCodec.gridsPath(sf0001))
    assert(served.contains("v="), s"grid artifact not versioned: $served")
    // a second resolve serves the same artifact without rebuilding
    val again = ImageCodec.phashImageIo(spark, sf0001).collect()
    assert(again.map(_.toString).sorted.toSeq === out.map(_.toString).sorted.toSeq)
  }

  test("bad-blob contract rides the registered query: the fixture provably " +
      "contains undecodable payloads and their rows survive as zero-hash") {
    // (round-16 verdict #8) the planted slices must actually be
    // undecodable in the fixture the query consumes...
    val media = ImageCodec.pngMedia(spark, sf0001).collect()
    val corrupt = media.filter { r =>
      val id = r.getAs[Long]("doc_id")
      id % 97 == ImageCodec.TruncatedMod || id % 97 == ImageCodec.NotImageMod
    }
    assert(corrupt.nonEmpty, "fixture must carry planted corrupt slices")
    corrupt.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      assert(ImageIoCodec.decode(payload) === ((Seq.empty, 0L, 0L)),
        s"doc ${r.getAs[Long]("doc_id")} payload unexpectedly decoded")
      assert(ImageIoCodec.lumaGrid(payload) === Seq.fill(72)(0))
    }
    // ...and both corruption shapes are present: a truncated PNG
    // (reader engages then fails) and a not-an-image payload.
    assert(corrupt.exists(_.getAs[Long]("doc_id") % 97 == ImageCodec.TruncatedMod))
    assert(corrupt.exists(_.getAs[Long]("doc_id") % 97 == ImageCodec.NotImageMod))
    // the query output still carries one row per doc — a corrupt blob
    // yields the all-zero grid's dhash (0, 0), never a dropped row or
    // a thrown task.
    val out = ImageCodec.phashImageIo(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dhash_lo"), r.getAs[Long]("dhash_hi"))).toMap
    corrupt.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(out(id) === ((0L, 0L)), s"corrupt doc $id should hash as all-zero")
    }
    // and decodable neighbors don't collapse to zero (the planted
    // slices are the exception, not the rule)
    val zeroes = out.values.count(_ == ((0L, 0L)))
    assert(zeroes < out.size / 2, s"$zeroes of ${out.size} rows zero-hashed")
  }
}
