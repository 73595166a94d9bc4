package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Pins [[Similarity.cosineTopKDiverse]]'s contract: the result list
  * never contains two members of one embedding near-dup cluster, the
  * filter genuinely FIRES on the corpus (candidates do collapse —
  * near neighbors of a probe are often near each other), and the
  * output is exactly the greedy best-rank-per-cluster filter of the
  * non-diverse candidate list (so diversity never invents, reorders,
  * or rescores a result).
  */
class SimDiverseSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 10
  private val KCand = 30

  private lazy val diverse =
    Similarity.cosineTopKDiverse(spark, sf0001, K, KCand).collect()

  test("no probe's results contain two members of one cluster") {
    val perProbe = diverse.groupBy(_.getLong(0))
    assert(perProbe.nonEmpty)
    perProbe.foreach { case (qid, rows) =>
      val clusters = rows.map(_.getLong(3))
      assert(clusters.distinct.length == clusters.length,
        s"probe $qid repeats a cluster: ${clusters.mkString(",")}")
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length),
        s"probe $qid ranks not dense: ${ranks.mkString(",")}")
    }
  }

  test("the cluster filter fires: some candidate list collapsed") {
    val cands = Similarity.cosineTopKAggWhere(
      spark, sf0001, KCand, col("vec_id") % 50 === 0)
    val labels = Dedup.clustersFromPairsStar(
      Similarity.lshPairs(spark, sf0001, 3000)
        .select(col("vec_x").as("doc_x"), col("vec_y").as("doc_y")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    val dupInCands = cands.join(labels, Seq("vec_id"))
      .groupBy("qid", "cluster_id").count()
      .where(col("count") > 1).count()
    assert(dupInCands > 0,
      "fixture corpus has no same-cluster candidates — the diversity " +
        "filter would be vacuous; widen kCand or lower minCosBp")
  }

  test("diverse == greedy best-rank-per-cluster over the candidates") {
    val cands = Similarity.cosineTopKAggWhere(
      spark, sf0001, KCand, col("vec_id") % 50 === 0)
      .select("qid", "rank", "vec_id", "cos_bp")
      .as[(Long, Long, Long, Long)].collect()
    val labels = Dedup.clustersFromPairsStar(
      Similarity.lshPairs(spark, sf0001, 3000)
        .select(col("vec_x").as("doc_x"), col("vec_y").as("doc_y")))
      .select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    val expected = cands.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val seen = scala.collection.mutable.Set.empty[Long]
      rows.sortBy(_._2).flatMap { case (_, _, vid, bp) =>
        val grp = labels.getOrElse(vid, vid)
        if (seen.add(grp)) Some((qid, vid, grp, bp)) else None
      }.take(K).zipWithIndex.map { case ((q, v, g, bp), i) =>
        (q, (i + 1).toLong, v, g, bp)
      }
    }.toSet
    val got = diverse.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
  }
}
