package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Invariant checks for the similarity family on sf0.001 (the DuckDB
  * oracle parity is the driver's correctness gate; these cover the
  * structural properties the oracle cannot see).
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("codebook sizing rule: k ~ sqrt(n), clamped to [8, 65536]") {
    assert(Similarity.numCentsFor(0) === 8)
    assert(Similarity.numCentsFor(63) === 8)   // sqrt(63) = 7.9 -> floor 7 -> clamp
    assert(Similarity.numCentsFor(64) === 8)
    assert(Similarity.numCentsFor(500) === 22)
    assert(Similarity.numCentsFor(1000000) === 1000)
    assert(Similarity.numCentsFor(Long.MaxValue) === 65536)
    // the derived k for the fixture corpus = the rule over its count.
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(Similarity.autoCents(spark, sf0001) === Similarity.numCentsFor(n))
  }

  test("cosine top-k: k rows per probe, rank-monotone scores, no self") {
    val tk = Similarity.cosineTopK(spark, sf0001, k = 5, probeMod = 100)
      .as[(Long, Long, Long, Long, Long)].collect()
    val byQ = tk.groupBy(_._1)
    assert(byQ.nonEmpty)
    for ((q, rows) <- byQ) {
      assert(rows.length == 5)
      assert(rows.forall(_._3 != q), "probe must not match itself")
      val ranked = rows.sortBy(_._2)
      assert(ranked.map(_._2).toSeq == (1L to 5L), "ranks dense from 1")
      // cos_bp non-increasing with rank
      assert(ranked.map(_._5).toSeq == ranked.map(_._5).sortBy(-_).toSeq)
    }
  }

  test("lsh pairs are verified above threshold and candidate-sound") {
    val pairs = Similarity.lshPairs(spark, sf0001, minCosBp = 3000)
      .as[(Long, Long, Long, Long)].collect()
    assert(pairs.forall(_._4 >= 3000))
    assert(pairs.forall(p => p._1 < p._2), "canonical (x < y) orientation")
    // every emitted pair must actually share a sign band (soundness)
    val bands = Similarity.signBands(spark, sf0001)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(b => (b._2, b._3)).toSet).toMap
    assert(pairs.forall(p => bands(p._1).intersect(bands(p._2)).nonEmpty))
  }

  test("default cosine search carries no full-corpus window (plan shape)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: SparkPlan): Seq[SparkPlan] = p match {
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    // the default (TopK-aggregator) form: zero window operators —
    // per-probe top-k state is bounded per partition BEFORE any
    // exchange, the round-7 verdict #5 requirement.
    val agg = Similarity.cosineTopKAgg(spark, sf0001, k = 5, probeMod = 100)
    assert(windows(agg.queryExecution.sparkPlan).isEmpty,
      s"default cosine plan ranks through a window:\n${agg.queryExecution.sparkPlan}")
    // the registered cross-check twin IS the window form.
    val win = Similarity.cosineTopK(spark, sf0001, k = 5, probeMod = 100)
    assert(windows(win.queryExecution.sparkPlan).nonEmpty)
    // and the two are row-identical.
    val a = agg.as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val w = win.as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(a == w)
  }

  test("ivf: every vector lands in exactly one cell; probe stays in-cell") {
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val cells = Similarity.ivfCells(spark, sf0001)
    assert(cells.count() == n)
    assert(cells.select("vec_id").distinct().count() == n)
    val cellOf = cells.as[(Long, Long)].collect().toMap
    val probe = Similarity.ivfProbe(spark, sf0001, k = 3, probeMod = 100)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(probe.nonEmpty)
    assert(probe.forall(r => cellOf(r._1) == r._2 && cellOf(r._4) == r._2),
      "probe and hit share the probe's cell")
  }
}
