package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** [[Dedup.containment]] vs [[Dedup.ngramJaccard]] on a planted
  * doc-in-doc fixture: a short document fully quoted inside a much
  * longer one. Containment (inter / min-size) must flag the pair at
  * ~100%; symmetric Jaccard must NOT (the long side's size inflates
  * the union far past the 50% threshold) — the discrimination the
  * asymmetric rung exists to add.
  */
class DedupContainmentSpec extends SparkTestBase {

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-contain").toString
    // distinct word vocabularies so candidate shingles cannot
    // cross-match between the unrelated docs.
    val longWords = (0 until 120).map(i => s"alpha$i")
    val short = longWords.slice(40, 70) // 30-word contiguous quote
    val other = (0 until 60).map(i => s"beta$i")
    import spark.implicits._
    Seq(
      (1L, longWords.mkString(" "), "en", "src0"),
      (2L, short.mkString(" "), "en", "src0"),
      (3L, other.mkString(" "), "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("containment flags the quoted doc; Jaccard's union hides it") {
    val dir = fixture()
    val cont = Dedup.containment(spark, dir).collect()
    assert(cont.length == 1, s"expected exactly the planted pair, got ${cont.toSeq}")
    val row = cont.head
    assert(row.getAs[Long]("doc_x") == 1L && row.getAs[Long]("doc_y") == 2L)
    // every shingle of the 30-word quote (28 trigrams) appears in the
    // long doc: containment is exactly 100%.
    assert(row.getAs[Long]("cont_bp") == 10000L,
      s"quote is fully contained, got ${row.getAs[Long]("cont_bp")} bp")
    assert(row.getAs[Long]("min_n") == 28L)

    // same corpus, same candidates — the symmetric score stays far
    // under its 50% bar: jac = 28 / (118 + 28 - 28) = ~23.7%.
    val jac = Dedup.ngramJaccard(spark, dir).collect()
    assert(jac.isEmpty, s"Jaccard should miss the doc-in-doc pair, got ${jac.toSeq}")
  }
}
