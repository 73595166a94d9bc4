package graft

import org.apache.spark.sql.types.{BinaryType, StructType}

import graft.operators.Multimodal

/** Plumbing + determinism checks for the multimodal family (oracle
  * parity is the driver's gate).
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media table: binary payload + typed metadata struct") {
    val m = Multimodal.media(spark, sf0001)
    assert(m.schema("payload").dataType == BinaryType)
    val meta = m.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("n_bytes", "payload_md5", "header_hex"))
    assert(m.select("media_type").distinct().count() == 3)
  }

  test("decode: frame arity tracks n_bytes mod 3; dims agree with metadata") {
    val frames = Multimodal.frames(spark, sf0001)
      .as[(Long, String, Long, String, Long, Long)].collect()
    val metaRows = Multimodal.metadata(spark, sf0001)
      .as[(Long, String, Long, String, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val byDoc = frames.groupBy(_._1)
    assert(byDoc.size == metaRows.size)
    for ((docId, fs) <- byDoc) {
      val meta = metaRows(docId)
      assert(fs.length == 1 + (meta._3 % 3).toInt, s"doc $docId arity")
      assert(fs.forall(f => f._5 == meta._6 && f._6 == meta._7), s"doc $docId dims")
      assert(fs.map(_._3).sorted.toSeq == (0L until fs.length).toSeq)
      assert(fs.map(_._4).distinct.length == fs.length, "frame hashes distinct")
    }
  }

  test("decode is deterministic across runs and codec is swappable") {
    val a = Multimodal.frames(spark, sf0001).collect().toSeq
    val b = Multimodal.frames(spark, sf0001).collect().toSeq
    assert(a == b)
    // a custom codec flows through the same seam
    object OneFrame extends Multimodal.Codec {
      def decode(payload: Array[Byte]): (Seq[String], Long, Long) =
        (Seq("x" * 32), payload.length.toLong, 1L)
      def lumaGrid(payload: Array[Byte]): Seq[Int] = Seq.fill(72)(0)
    }
    val c = Multimodal.decodeFrames(spark, sf0001, OneFrame).collect()
    assert(c.forall(f => f.frame_md5 == "x" * 32 && f.frame_ix == 0L))
  }

  test("perceptual near-dup: re-encoded copies collapse, distinct media separate") {
    import java.nio.charset.StandardCharsets.UTF_8
    import org.apache.spark.sql.functions.col
    // deterministic "media": ~720-char payloads, one char per future
    // luma cell region. A "re-encode" is a same-length perturbation —
    // bytes (and so the content hash) change, pixels barely do.
    def text(seed: Int): String =
      (0 until 720).map(i => ('a' + ((i * 31 + seed * 17) % 26)).toChar).mkString
    val original = text(1)
    // re-encode stand-in: 2 changed chars -> 2 luma cells -> <= 3
    // gradient bits. Well inside the banded maxHam=3 contract.
    val reencoded = original.updated(5, 'Z').updated(400, 'Q')
    val distinct1 = text(2)
    val media = Seq(
      (1L, "image", original), (2L, "image", reencoded),
      (3L, "image", distinct1))
      .toDF("doc_id", "media_type", "txt")
      .select(col("doc_id"), col("media_type"),
        col("txt").cast("binary").as("payload"))
    // content-hash rung is blind: all three payloads hash apart.
    val md5s = media.select(org.apache.spark.sql.functions.md5(col("payload")))
      .as[String].collect().toSet
    assert(md5s.size == 3)
    val pairs = Multimodal.neardupFromHashes(
        Multimodal.dhashOf(Multimodal.lumaGrids(media)), maxHam = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"expected only the re-encoded pair, got $pairs")
    assert(pairs.head._3 <= 3L)

    // and the Scala codec agrees with itself on locality: the two
    // grids differ in exactly the touched cells.
    val g1 = Multimodal.FakeCodec.lumaGrid(original.getBytes(UTF_8))
    val g2 = Multimodal.FakeCodec.lumaGrid(reencoded.getBytes(UTF_8))
    val diff = g1.zip(g2).count { case (a, b) => a != b }
    assert(diff >= 1 && diff <= 2, s"locality lost: $diff cells differ")
  }

  test("planted re-encode twins all collapse onto their originals") {
    import org.apache.spark.sql.functions.{col, length}
    val planted = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") % 5 === 0 && length(col("text")) > 0)
      .select("doc_id").as[Long].collect().toSet
    assert(planted.nonEmpty)
    val pairs = Multimodal.neardupReencoded(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    val found = pairs.collect {
      case (x, y, ham) if y == x + 1000000L => (x, ham)
    }.toMap
    assert(found.keySet == planted,
      s"missing twins: ${planted -- found.keySet}")
    // one spliced cell touches at most two gradient bits.
    assert(found.values.forall(_ <= 2L), s"twin hamming too high: $found")
  }

  test("dhash halves are 32-bit non-negative and deterministic") {
    val a = Multimodal.perceptualHashes(spark, sf0001)
      .as[(Long, String, Long, Long)].collect().toSeq
    val b = Multimodal.perceptualHashes(spark, sf0001)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.forall(r => r._3 >= 0L && r._3 < (1L << 32) &&
      r._4 >= 0L && r._4 < (1L << 32)))
  }
}
