package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusPrep

/** [[CorpusPrep.chunks]] coverage contract on the real sf0.001
  * corpus: chunk offsets tile every document exactly — concatenating
  * each non-last chunk's first `stride` characters plus the last
  * chunk reconstructs the original text byte-for-byte, and the last
  * window always reaches the end. Also pins the quality-resample
  * rollup as a partition of the corpus and the bigram-familiarity
  * floor (every bigram's corpus frequency is at least its own count,
  * so the centi-mean can never dip under 100).
  */
class ChunkSpec extends SparkTestBase {

  private val window = 400
  private val stride = 300

  test("chunks tile each document; reconstruction is byte-exact") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = CorpusPrep.chunks(spark, sf0001, window, stride)
      .select("doc_id", "chunk_id", "start", "chunk")
      .collect()
      .groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.filter(_._2.nonEmpty).keySet,
      "every non-empty doc chunks; empty docs emit nothing")
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // contiguous ids from 0, starts on the stride grid.
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i)
        assert(r.getLong(2) == i.toLong * stride + 1)
      }
      val text = docs(id)
      val rebuilt = sorted.init.map(_.getString(3).take(stride)).mkString +
        sorted.last.getString(3)
      assert(rebuilt == text, s"doc $id reconstruction mismatch")
      // the last window reaches the end of the text.
      val last = sorted.last
      assert(last.getLong(2) + last.getString(3).length - 1 == text.length.toLong)
    }
  }

  test("quality resample partitions the corpus; bigram mean floor holds") {
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val roll = CorpusPrep.qualityResample(spark, sf0001).collect()
    assert(roll.map(_.getAs[Long]("n_total")).sum == total,
      "tiers x langs must partition the corpus")
    assert(roll.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total")))
    val rates = roll.map(r =>
      r.getAs[String]("tier") -> r.getAs[Long]("rate_pct")).toMap
    assert(rates.get("high").forall(_ == 100L) &&
      rates.get("mid").forall(_ == 60L) && rates.get("low").forall(_ == 10L))

    val floorViolations = operators.TextAnalysis.bigramSurprise(spark, sf0001)
      .where(col("mean_freq_c") < 100).count()
    assert(floorViolations == 0,
      "corpus frequency >= own tf implies centi-mean >= 100")
  }
}
