package graft

import graft.operators.TopK
import graft.operators.TopK.Scored

/** Unit semantics of the bounded top-k state (the Dataset-level
  * equivalence with the window form is oracle-proven by
  * the default sim_cosine_topk sharing the windowed twin's oracle).
  */
class TopKSpec extends SparkTestBase {

  private def agg(k: Int) = new TopK.TopKAggregator(k)

  private def s(score: Double, id: Long) = Scored(1L, score, id, 0L)

  test("reduce keeps at most k, sorted (score desc, id asc)") {
    val a = agg(3)
    val buf = Seq(5.0 -> 1L, 1.0 -> 2L, 3.0 -> 3L, 4.0 -> 4L, 2.0 -> 5L)
      .foldLeft(a.zero) { case (b, (sc, id)) => a.reduce(b, s(sc, id)) }
    assert(buf.map(x => (x.score, x.id)) == Seq((5.0, 1L), (4.0, 4L), (3.0, 3L)))
  }

  test("ties break by id asc; equal entries never evict better ids") {
    val a = agg(2)
    val buf = Seq(s(1.0, 9), s(1.0, 3), s(1.0, 7))
      .foldLeft(a.zero)(a.reduce)
    assert(buf.map(_.id) == Seq(3L, 7L))
  }

  test("merge of partial states equals reduce over the union") {
    val a = agg(4)
    val xs = (1 to 10).map(i => s(i * 1.5 % 7, i.toLong))
    val (l, r) = xs.splitAt(5)
    val merged = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
    val direct = xs.foldLeft(a.zero)(a.reduce)
    assert(merged == direct)
  }

  test("underfull state returns everything it saw") {
    val a = agg(10)
    val buf = Seq(s(2.0, 1), s(1.0, 2)).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf).size == 2)
  }
}
