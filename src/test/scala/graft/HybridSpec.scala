package graft

import graft.operators.Hybrid

/** Hybrid RRF retrieval: the fused result is re-derived in plain
  * Scala from the two tower outputs (an independent second
  * implementation of the fusion arithmetic), the self-exclusion
  * contract is pinned, and the fusion handles a doc present in only
  * one list (the full-outer seam) on a synthetic disjoint fixture.
  */
class HybridSpec extends SparkTestBase {

  private val K = 20
  private val KCand = 50

  /** Plain-Scala RRF — the independent second implementation both
    * fused variants are checked against.
    */
  private def fuseScala(text: Map[Long, Long], vec: Map[Long, Long]) = {
    def contrib(r: Option[Long]): Long =
      r.map(rr => Hybrid.RrfScale / (Hybrid.RrfK + rr)).getOrElse(0L)
    (text.keySet ++ vec.keySet).toSeq
      .map { id =>
        (id, contrib(text.get(id)) + contrib(vec.get(id)),
          text.getOrElse(id, 0L), vec.getOrElse(id, 0L))
      }
      .sortBy { case (id, score, _, _) => (-score, id) }
      .take(K)
      .zipWithIndex
      .map { case ((id, score, rt, rv), i) => (id, (i + 1).toLong, score, rt, rv) }
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fusedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("fused ranking equals a plain-Scala RRF over the tower outputs") {
    val expected = fuseScala(
      ranksOf(Hybrid.bm25Ranked(spark, sf0001, KCand, 8)),
      ranksOf(Hybrid.cosineRanked(spark, sf0001, KCand)))
    val got = fusedRows(Hybrid.rrfTopK(spark, sf0001, K, KCand))
    assert(got === expected)
    assert(got.size === K)
  }

  test("IVF twin fuses its own (cell-routed) vector tower the same way") {
    val vec = ranksOf(Hybrid.cosineRankedIvf(spark, sf0001, KCand))
    val expected = fuseScala(
      ranksOf(Hybrid.bm25Ranked(spark, sf0001, KCand, 8)), vec)
    val got = fusedRows(Hybrid.rrfTopKIvf(spark, sf0001, K, KCand))
    assert(got === expected)
    // every vector-tower candidate lives in the probe's routed cell
    // (the corpus-SCALED codebook the IVF tower now routes with).
    val cells = graft.operators.Similarity.ivfCells(spark, sf0001,
        graft.operators.Similarity.autoCents(spark, sf0001)).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell_id")).toMap
    val probeCell = cells(0L)
    vec.keys.foreach(id => assert(cells(id) === probeCell))
    // and the routing actually restricts: the exact tower must differ
    // (if the whole corpus sat in one cell, the twin proves nothing).
    assert(vec !== ranksOf(Hybrid.cosineRanked(spark, sf0001, KCand)))
  }

  test("the query document never retrieves itself, from either tower") {
    val got = Hybrid.rrfTopK(spark, sf0001, 1000, KCand).collect()
    assert(!got.exists(_.getLong(0) == 0L))
    // both towers actually contributed (docs with a nonzero rank on
    // each side exist) — otherwise the fusion test is one-legged.
    assert(got.exists(_.getLong(3) > 0L))
    assert(got.exists(_.getLong(4) > 0L))
    // and at least one doc was found by BOTH towers at sf0.001 (the
    // corpus plants near-duplicates of doc 0's content family), so
    // the sum path — not just the single-list path — is exercised.
    assert(got.exists(r => r.getLong(3) > 0L && r.getLong(4) > 0L))
  }

  test("batch fusion serves each probe exactly its single-probe answer") {
    val batch = Hybrid.rrfTopKBatch(spark, sf0001, K, KCand).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
    val byProbe = batch.groupBy(_._1)
    assert(byProbe.keySet === Hybrid.BatchProbes.toSet)
    // probe 0's rows are the single fusion's rows, column for column.
    val single = fusedRows(Hybrid.rrfTopK(spark, sf0001, K, KCand))
      .map { case (id, rank, score, rt, rv) => (rank, id, score, rt, rv) }
    assert(byProbe(0L).map(_._2).toSeq === single)
    // every probe got a full page of fused results.
    Hybrid.BatchProbes.foreach(p => assert(byProbe(p).length === K, s"probe $p"))
  }

  test("rrfFuse: disjoint lists fuse through the full-outer seam") {
    import spark.implicits._
    val text = Seq((10L, 1L), (11L, 2L)).toDF("doc_id", "rank_text")
    val vec = Seq((20L, 1L), (21L, 2L)).toDF("doc_id", "rank_vec")
    val got = Hybrid.rrfFuse(text, vec, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val c1 = Hybrid.RrfScale / (Hybrid.RrfK + 1)
    val c2 = Hybrid.RrfScale / (Hybrid.RrfK + 2)
    // rank-1 docs tie on score; doc_id breaks the tie ascending.
    assert(got === Seq(
      (10L, 1L, c1, 1L, 0L), (20L, 2L, c1, 0L, 1L),
      (11L, 3L, c2, 2L, 0L), (21L, 4L, c2, 0L, 2L)))
  }

  test("a doc ranked by both towers outranks equal single-tower ranks") {
    import spark.implicits._
    val text = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank_text")
    val vec = Seq((1L, 2L), (3L, 1L)).toDF("doc_id", "rank_vec")
    val got = Hybrid.rrfFuse(text, vec, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1: 1/(K+1) + 1/(K+2) beats doc 3's 1/(K+1) and doc 2's 1/(K+2).
    assert(got === Seq((1L, 1L), (3L, 2L), (2L, 3L)))
  }
}
