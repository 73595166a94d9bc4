package graft

import graft.operators.Dedup

/** Cluster resolution over hand-built pair graphs: transitive chains
  * collapse to one cluster (even across pairs that were never
  * candidates together), disjoint components stay separate, keeper =
  * min doc_id. The sf0.01 oracle run cross-checks the full pipeline
  * against an independent recursive-CTE implementation; this pins the
  * graph semantics in isolation.
  */
class DedupClustersSpec extends SparkTestBase {
  import spark.implicits._

  test("label propagation resolves transitive chains and disjoint components") {
    // chain 1-2, 2-3, 3-4 (diameter 3: needs >1 round) + island 10-11.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_x", "doc_y")
    val got = Dedup.clustersFromPairs(pairs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 4L, 1L), (2L, 1L, 4L, 0L), (3L, 1L, 4L, 0L), (4L, 1L, 4L, 0L),
      (10L, 10L, 2L, 1L), (11L, 10L, 2L, 0L)))
  }

  test("empty pair set yields an empty result, not a crash") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_x", "doc_y")
    assert(Dedup.clustersFromPairs(pairs).count() == 0)
  }

  test("reversed-order chain converges to the same min label") {
    val pairs = Seq((8L, 9L), (7L, 8L), (6L, 7L), (5L, 6L))
      .toDF("doc_x", "doc_y")
    val got = Dedup.clustersFromPairs(pairs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).distinct == Seq(5L))
    assert(got.filter(_._4 == 1L).map(_._1) == Seq(5L))
  }

  test("star contraction matches label propagation on every fixture shape") {
    val fixtures = Seq(
      // transitive chain + island (the existing label-prop fixture)
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)),
      // reversed chain
      Seq((8L, 9L), (7L, 8L), (6L, 7L), (5L, 6L)),
      // clique + pendant + separate pair
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (20L, 30L)),
      // star already
      Seq((1L, 5L), (1L, 6L), (1L, 7L)),
      // empty
      Seq.empty[(Long, Long)])
    fixtures.foreach { fx =>
      val pairs = fx.toDF("doc_x", "doc_y")
      val star = Dedup.clustersFromPairsStar(pairs)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val prop = Dedup.clustersFromPairs(pairs)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(star == prop, s"divergence on $fx: $star vs $prop")
    }
  }

  test("star contraction rounds are logarithmic on a path graph") {
    // the adversarial shape for label propagation: a 64-doc chain of
    // pairwise near-dups (A~B~C~...), diameter 63. Label prop needs
    // O(diameter) rounds; star contraction must stay within
    // ~2*log2(n) + slack.
    val n = 64
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_x", "doc_y")
    val (labels, rounds) = Dedup.starComponents(pairs)
    val bound = 2 * (math.log(n) / math.log(2)).ceil.toInt + 2
    assert(rounds <= bound, s"$rounds rounds > bound $bound on a $n-path")
    // and the labels are the component minimum for every vertex.
    val got = labels.as[(Long, Long)].collect().toSet
    assert(got == (0 until n).map(i => (i.toLong, 0L)).toSet)
  }

  test("star contraction equals label propagation on random graphs (seed 7)") {
    // the JoinSearchPropertySpec convention: random geometry covers
    // the shapes hand fixtures miss (bridges between cliques,
    // multiple chains, self-pairs, duplicate edges, isolated pairs);
    // fixed seed so failures reproduce. Node ids drawn from a small
    // domain force dense collision structure.
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 8) {
      val n = 6 + rnd.nextInt(25)
      // the candidate join's contract: doc_x != doc_y (LSH pairs are
      // strictly cross-document), duplicates allowed.
      val pairs = Seq.fill(3 + rnd.nextInt(40)) {
        val a = rnd.nextInt(n)
        val b = (a + 1 + rnd.nextInt(n - 1)) % n
        (a.toLong, b.toLong)
      }.toDF("doc_x", "doc_y")
      val star = Dedup.clustersFromPairsStar(pairs)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val prop = Dedup.clustersFromPairs(pairs)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(star == prop, s"round $round diverged")
    }
  }

  test("incremental flags derive from the whole-corpus verified pairs") {
    import org.apache.spark.sql.functions.col
    // Same bands, same verify threshold — so a delta doc is flagged
    // iff the whole-corpus pair set (doc_x < doc_y) contains a pair
    // where it must defer: any pair with a BASE partner, or a
    // delta-delta pair in which it is the larger id.
    val mod = 11
    def isDelta(id: Long) = id % mod == 0
    val pairs = Dedup.minhashLsh(spark, sf0001)
      .select("doc_x", "doc_y").as[(Long, Long)].collect().toSeq
    val expected =
      pairs.collect { case (_, y) if isDelta(y) => y }.toSet ++
      pairs.collect { case (x, y) if isDelta(x) && !isDelta(y) => x }.toSet
    val got = Dedup.incrementalNearDups(spark, sf0001, mod)
      .where(col("is_dup") === 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected)
  }
}
