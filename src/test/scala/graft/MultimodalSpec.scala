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
    }
    val c = Multimodal.decodeFrames(spark, sf0001, OneFrame).collect()
    assert(c.forall(f => f.frame_md5 == "x" * 32 && f.frame_ix == 0L))
  }
}
