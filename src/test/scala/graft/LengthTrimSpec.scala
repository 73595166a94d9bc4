package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Length-tail trimming and the cluster histogram: each re-derived
  * through an independent plain-Scala path, plus a fixture pinning
  * the percentile-rank arithmetic at its edge cases.
  */
class LengthTrimSpec extends SparkTestBase {

  test("P10/P90 bounds equal sort-based percentile_disc per source") {
    val perDoc = TextAnalysis.stats(spark, sf0001)
      .select(col("doc_id"), col("n_ws_tokens"))
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_ws_tokens")))
    def disc(sorted: IndexedSeq[Long], pBp: Int): Long =
      sorted(((pBp.toLong * sorted.length + 9999) / 10000).toInt - 1)
    val expected = perDoc.groupBy(_._1).map { case (src, rows) =>
      val vals = rows.map(_._2).sorted.toIndexedSeq
      val (lo, hi) = (disc(vals, 1000), disc(vals, 9000))
      val kept = vals.filter(v => v >= lo && v <= hi)
      (src, (vals.length.toLong, lo, hi, kept.length.toLong, kept.sum))
    }
    val got = TextAnalysis.lengthTrim(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("lo_tokens"),
          r.getAs[Long]("hi_tokens"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("kept_tokens"))))
      .toMap
    assert(got === expected)
    // the trim binds on both sides somewhere.
    assert(got.values.exists { case (n, _, _, kept, _) => kept < n })
  }

  test("percentile ranks hit the disc edges on a tiny fixture") {
    import spark.implicits._
    // 10 values 1..10: P10 -> ceil(0.1*10)=1st = 1; P90 -> 9th = 9;
    // P100 -> 10th = 10; P50 -> 5th = 5 (even-n lower middle).
    val hist = (1L to 10L).map(v => ("s", v, 1L))
      .toDF("source", "n_ws_tokens", "c")
    def bounds(lo: Int, hi: Int): (Long, Long) = {
      val r = TextAnalysis.percentileBoundsFromHistogram(hist, lo, hi).head()
      (r.getAs[Long]("lo_tokens"), r.getAs[Long]("hi_tokens"))
    }
    assert(bounds(1000, 9000) === ((1L, 9L)))
    assert(bounds(5000, 10000) === ((5L, 10L)))
    assert(bounds(1, 10000) === ((1L, 10L))) // pBp=1 still needs >= 1 row
  }

  test("cluster histogram ties out against the per-doc cluster frame") {
    val docs = Dedup.clusters(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("is_keeper")))
    val expected = docs.filter(_._3 == 1L).groupBy(_._2).map { case (sz, ks) =>
      (sz, (ks.length.toLong, (sz - 1) * ks.length))
    }
    val got = Dedup.clusterHistogram(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("n_members"),
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_dropped"))))
      .toMap
    assert(got === expected)
    // total dropped docs == non-keeper rows in the cluster frame.
    assert(got.values.map(_._2).sum === docs.count(_._3 == 0L).toLong)
  }
}
