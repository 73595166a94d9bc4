package graft

import graft.operators.Similarity

/** Pins both routes of the ANN dispatcher: the default threshold at
  * test scale serves the exact bounded-top-k rows, and a zero
  * threshold forces the IVF-PQ route (row-for-row its projection) —
  * so the dispatch changes WHICH plan serves, never silently a third
  * formulation.
  */
class SimSearchAutoSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("default threshold routes to the exact scan at test scale") {
    val auto = rows(Similarity.searchAuto(spark, sf0001))
    val exact = rows(Similarity.cosineTopKAgg(spark, sf0001)
      .select("qid", "rank", "vec_id", "cos_bp"))
    assert(auto === exact)
    assert(auto.nonEmpty)
  }

  test("zero threshold forces the IVF-PQ route") {
    val auto = rows(Similarity.searchAuto(spark, sf0001, bruteBytes = 0L))
    // the big-corpus route serves at the CORPUS-SCALED codebook
    // (round-9 sizing rule) — compare at the same k.
    val ivfpq = rows(Similarity.ivfPqTopK(spark, sf0001,
        numCents = Similarity.autoCents(spark, sf0001))
      .select("qid", "rank", "vec_id", "cos_bp"))
    assert(auto === ivfpq)
    // the two routes must actually differ on this corpus (recall < 1
    // for IVF-PQ here) — otherwise the route assertion proves nothing.
    val exact = rows(Similarity.cosineTopKAgg(spark, sf0001)
      .select("qid", "rank", "vec_id", "cos_bp"))
    assert(auto !== exact, "fixture too easy: routes indistinguishable")
  }
}
