package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Adaptive per-source quality cutoffs: the histogram-median operator
  * is re-derived in plain Scala (sort-based percentile_disc(0.5) per
  * source — a deliberately different algorithm from the engine's
  * cumulative-histogram form), and the kept rollup is checked
  * against a direct filter count.
  */
class AdaptiveQualitySpec extends SparkTestBase {

  test("histogram median equals sort-based percentile_disc per source") {
    val perDoc = TextAnalysis.stats(spark, sf0001)
      .select(col("doc_id"), col("n_ws_tokens"))
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_ws_tokens")))
    val bySource = perDoc.groupBy(_._1).map { case (src, rows) =>
      val vals = rows.map(_._2).sorted
      val cut = vals(((vals.length + 1) / 2) - 1) // percentile_disc(0.5)
      val kept = vals.filter(_ >= cut)
      (src, (vals.length.toLong, cut, kept.length.toLong, kept.sum))
    }
    val got = TextAnalysis.adaptiveQuality(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("median_tokens"),
          r.getAs[Long]("n_kept"), r.getAs[Long]("kept_tokens"))))
      .toMap
    assert(got === bySource)
    assert(got.nonEmpty)
  }

  test("even- and odd-sized groups pick percentile_disc(0.5) exactly") {
    import spark.implicits._
    // odd group: median of (1,5,9) = 5; even group: (2,4,6,8) picks
    // the LOWER middle 4 (rank (4+1) div 2 = 2), ties group: all 7s.
    val base = Seq(
      (1L, 1L, "odd"), (2L, 5L, "odd"), (3L, 9L, "odd"),
      (4L, 2L, "even"), (5L, 4L, "even"), (6L, 6L, "even"), (7L, 8L, "even"),
      (8L, 7L, "ties"), (9L, 7L, "ties"))
      .toDF("doc_id", "n_ws_tokens", "source")
    val got = TextAnalysis.adaptiveQualityOf(base).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      "odd" -> (3L, 5L, 2L, 14L),
      "even" -> (4L, 4L, 3L, 18L),
      "ties" -> (2L, 7L, 2L, 14L)))
  }

  test("every source keeps at least half its docs, never all of them") {
    val rows = TextAnalysis.adaptiveQuality(spark, sf0001).collect()
    rows.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept * 2 >= n, s"source ${r.getString(0)}: kept $kept of $n")
    }
    // the cutoff binds somewhere (a corpus where every source keeps
    // everything would mean the filter is vacuous on this data).
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")))
  }
}
