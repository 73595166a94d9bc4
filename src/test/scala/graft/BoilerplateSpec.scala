package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Cross-document repeated-line boilerplate removal
  * ([[TextAnalysis.boilerplateLinesOf]] / [[boilerplateRemovedOf]]):
  * threshold boundary, original-order rebuild, all-template and
  * null-page contracts, and the planted-page fixture semantics.
  */
class BoilerplateSpec extends SparkTestBase {

  private def pages(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("page", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("minDocs is an inclusive threshold over distinct documents") {
    // "nav" in 3 docs (= minDocs, twice in doc 1 — in-doc repeats
    // count once); "semi" in 2 docs (< minDocs).
    val p = pages(
      1L -> "nav\nbody one\nsemi\nnav",
      2L -> "nav\nbody two\nsemi",
      3L -> "nav\nbody three")
    val b = TextAnalysis.boilerplateLinesOf(p, minDocs = 3).collect()
    assert(b.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq("nav" -> 3L))
  }

  test("removal keeps original order, counts occurrences, and nulls the all-template doc") {
    val p = pages(
      1L -> "nav\nkeep a\nnav\nkeep b", // boilerplate twice -> both occurrences dropped
      2L -> "nav\nkeep c",
      3L -> "nav",                      // nothing survives -> null md5
      4L -> "nav\n\nkeep d",            // empty line dropped before counting
      5L -> null)                       // null page -> absent
    val out = TextAnalysis.boilerplateRemovedOf(p, minDocs = 3).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val byDoc = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(byDoc(1L) === ((4L, 2L, Some(md5Hex("keep a\nkeep b")))))
    assert(byDoc(2L) === ((2L, 1L, Some(md5Hex("keep c")))))
    assert(byDoc(3L) === ((1L, 1L, None)))
    assert(byDoc(4L) === ((2L, 1L, Some(md5Hex("keep d")))))
  }

  test("line-quality signals: terminal punctuation, short lines, within-doc duplicates") {
    val p = pages(
      1L -> "this line ends with a period.\nno terminal punctuation here\ntiny\ntiny",
      2L -> null,          // null page -> absent
      3L -> "a b\n\na b")  // empty line dropped before the metrics
    val out = TextAnalysis.lineQualityOf(p).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.keySet === Set(1L, 3L))
    // doc 1: 4 lines; 1 punct-terminated; 2 short (< 4 tokens); 1 dup.
    assert(out(1L) === ((4L, 2500L, 5000L, 2500L)))
    // doc 3: 2 lines (empty dropped); 0 punct; both short; 1 dup.
    assert(out(3L) === ((2L, 0L, 10000L, 5000L)))
  }

  test("planted page view: universal + per-source lines are template, body and ref are content") {
    val d = java.nio.file.Files.createTempDirectory("graft-boiler").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = true)))
    val rows = (0L until 12L).map(i =>
      Row(i, s"unique body $i", "en", s"src${i % 2}", 10L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // minDocs=10: only the universal nav line (12 docs) qualifies;
    // the per-source lines sit at 6 docs each.
    val b10 = TextAnalysis.boilerplateLines(spark, d, minDocs = 10).collect()
    assert(b10.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq("home | about | contact" -> 12L))

    // minDocs=6 additionally catches the per-source template lines.
    val b6 = TextAnalysis.boilerplateLines(spark, d, minDocs = 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(b6 === Set(
      "home | about | contact" -> 12L,
      "subscribe to the src0 newsletter" -> 6L,
      "subscribe to the src1 newsletter" -> 6L,
      "copyright src0" -> 6L,
      "copyright src1" -> 6L))

    // Removal at minDocs=6 keeps exactly body + ref per doc.
    val r6 = TextAnalysis.boilerplateRemoved(spark, d, minDocs = 6).collect()
    assert(r6.length === 12)
    r6.foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(1), r.getLong(2)) === ((5L, 3L)))
      assert(r.getString(3) === md5Hex(s"unique body $id\nref $id"))
    }

    // The artifact-served twin is row-identical to the derived form
    // at BOTH thresholds — one minDocs-free artifact serves every
    // query-time filter.
    Seq(6, 10).foreach { m =>
      val derived = TextAnalysis.boilerplateRemoved(spark, d, minDocs = m)
        .collect().toSeq
      val indexed = TextAnalysis.boilerplateRemovedIndexed(spark, d, minDocs = m)
        .collect().toSeq
      assert(indexed === derived, s"indexed != derived at minDocs=$m")
    }
  }
}
