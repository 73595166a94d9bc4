package graft

import graft.operators.{Dedup, Similarity}

/** SemDeDup cell-scoped dedup: the decision view is re-derived from
  * the pair structure, and the cell-scoped candidate structure is
  * compared against the LSH buckets — same exact scoring where they
  * overlap, genuinely different candidate sets (the reason both
  * rungs exist).
  */
class SemanticCellsSpec extends SparkTestBase {

  private val MinCos = 3000

  test("decision view ties out against the within-cell pairs") {
    // semanticCells routes at the corpus-SCALED codebook (round-9
    // sizing rule) — tie out against pairs at the same k.
    val pairs = Similarity.cellNearPairs(spark, sf0001, MinCos,
        Similarity.autoCents(spark, sf0001)).collect()
      .map(r => (r.getAs[Long]("vec_x"), r.getAs[Long]("vec_y"), r.getAs[Long]("cos_bp")))
    val byY = pairs.groupBy(_._2)
    val got = Dedup.semanticCells(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("is_dup"), r.getAs[Long]("n_dups"), r.getAs[Long]("max_cos_bp"))))
      .toMap
    assert(got.size === 500) // every embedded doc gets a decision row
    got.foreach { case (id, (isDup, nDups, maxCos)) =>
      val expected = byY.get(id).map(ps => (1L, ps.length.toLong, ps.map(_._3).max))
        .getOrElse((0L, 0L, 0L))
      assert((isDup, nDups, maxCos) === expected, s"doc $id")
    }
    // the threshold actually splits the corpus (both classes present).
    assert(got.values.exists(_._1 == 1L) && got.values.exists(_._1 == 0L))
  }

  test("cell-scoped and LSH-bucketed candidates differ but score identically") {
    val cell = Similarity.cellNearPairs(spark, sf0001, MinCos).collect()
      .map(r => (r.getAs[Long]("vec_x"), r.getAs[Long]("vec_y")) -> r.getAs[Long]("cos_bp"))
      .toMap
    val lsh = Similarity.lshPairs(spark, sf0001, MinCos).collect()
      .map(r => (r.getAs[Long]("vec_x"), r.getAs[Long]("vec_y")) -> r.getAs[Long]("cos_bp"))
      .toMap
    val shared = cell.keySet intersect lsh.keySet
    assert(shared.nonEmpty, "no overlap at all — scoring comparison is vacuous")
    shared.foreach(k => assert(cell(k) === lsh(k), s"pair $k scores diverge"))
    // each structure finds pairs the other misses: the cell scope
    // drops cross-cell LSH collisions; exhaustive within-cell pairs
    // include bucket-missed neighbors.
    assert((lsh.keySet -- cell.keySet).nonEmpty, "cell scope dropped nothing")
    assert((cell.keySet -- lsh.keySet).nonEmpty, "within-cell exhaustion added nothing")
  }
}
