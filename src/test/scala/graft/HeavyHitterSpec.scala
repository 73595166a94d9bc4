package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Dedup, TextAnalysis}

/** Round-8 additions: the sketch-then-verify heavy hitters (its
  * exactness certificate and its failure mode), the vocabulary
  * coverage curve's invariants, the longest-member keep policy, and
  * the CDC as-of replay's relationship to the full merge.
  */
class HeavyHitterSpec extends SparkTestBase {

  import spark.implicits._

  test("certified sketch equals the exact top-k, certificate = 1") {
    val hh = TextAnalysis.heavyHitters(spark, sf0001, k = 20).collect()
    assert(hh.nonEmpty)
    assert(hh.forall(_.getAs[Long]("certified") == 1L),
      "default bucket count must certify on the fixture corpus")
    // independent exact computation: full vocabulary aggregation.
    val exact = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(graft.functions.Tokenize.clean(col("text")), " "))
        .as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(20)
      .as[(String, Long)].collect().toSeq
    val sketched = hh.toSeq.map(r =>
      (r.getAs[String]("term"), r.getAs[Long]("cnt")))
    assert(sketched === exact)
  }

  test("degenerate bucket count defeats the sketch VISIBLY, never silently") {
    // buckets = 1: theta = 2N, no bucket can reach it -> no candidates
    // -> empty result (the honest signal), OR — if a pathological
    // corpus put all mass in range — certified = 0. Either way the
    // failure is observable; a silent wrong top-k is the one
    // impossible outcome (certificate arithmetic).
    val out = TextAnalysis.heavyHitters(spark, sf0001, k = 5, buckets = 1)
      .collect()
    assert(out.isEmpty || out.forall(_.getAs[Long]("certified") == 0L))
  }

  test("vocab coverage: levels nest and bound total vocabulary") {
    val rows = TextAnalysis.vocabCoverage(spark, sf0001)
      .orderBy("pct_bp").collect()
    assert(rows.map(_.getAs[Long]("pct_bp")).toSeq === Seq(5000L, 9000L, 9900L))
    val sizes = rows.map(_.getAs[Long]("vocab_size"))
    assert(sizes.sameElements(sizes.sorted), "higher coverage needs more vocab")
    rows.foreach { r =>
      val covered = r.getAs[Long]("covered_tokens")
      val total = r.getAs[Long]("total_tokens")
      assert(covered * 10000 >= r.getAs[Long]("pct_bp") * total)
      assert(r.getAs[Long]("vocab_size") <= r.getAs[Long]("vocab_total"))
      // minimality: one fewer vocabulary entry must NOT reach the
      // level — pinned indirectly by min(rank) + the oracle hash; here
      // we at least pin covered <= total.
      assert(covered <= total)
    }
  }

  test("vocab coverage: the cumulative window runs over the count " +
      "HISTOGRAM, never vocabulary(term) rows") {
    // round-15 verdict #3: the old plan's Window.orderBy over the full
    // term table moved the whole vocabulary to one partition. The
    // counts-of-counts re-plan must feed every WindowExec from the
    // histogram (columns cnt/terms) — a `term` string column reaching
    // any window input means the collapse regressed.
    // non-adaptive executed plan (the PlanGoldenSpec convention):
    // under AQE the WindowExec hides inside stage leaves collect
    // cannot descend.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try TextAnalysis.vocabCoverage(spark, sf0001).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the cumulative window in the plan")
    windows.foreach { w =>
      val childCols = w.child.output.map(_.name).toSet
      assert(!childCols.contains("term"),
        s"vocabulary-sized window input detected: $childCols")
    }
  }

  test("keep-best picks the longest member, min id on ties") {
    val clusters = Seq(
      (10L, 1L), (11L, 1L), (12L, 1L), // cluster 1
      (20L, 2L), (21L, 2L)) // cluster 2: tie on length
      .toDF("doc_id", "cluster_id")
    val docs = Seq(
      (10L, 5L), (11L, 9L), (12L, 7L),
      (20L, 4L), (21L, 4L))
      .toDF("doc_id", "n_chars")
    val out = Dedup.keepBest(clusters, docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 11L, 9L), (2L, 2L, 20L, 4L)))
  }

  test("applied keep-best corpus diverges from min-id kept corpus, same size") {
    val minId = Dedup.keptCorpus(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val best = Dedup.keptCorpusBest(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    // one survivor per cluster under either policy -> same cardinality
    assert(best.size === minId.size)
    // ...but the POLICY is visible: some clusters keep a different doc
    assert((best -- minId).nonEmpty,
      "longest-member policy should pick at least one non-min-id keeper")
  }

  test("as-of replay: cut beyond the feed equals the full merge; cut 1 differs on doubly-updated keys") {
    val dir = sf0001
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val feed = Cdc.changeFeed(spark, dir)
    val full = Cdc.mergeSnapshot(base, feed)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val asOfAll = Cdc.asOfSnapshot(base, feed, cut = 99L)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(asOfAll === full)
    val asOf1 = Cdc.asOfSnapshot(base, feed, cut = 1L)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // doubly-updated keys (doc_id % 20 == 3) show the seq-1 text
    val doubly = full.keys.filter(_ % 20 == 3)
    assert(doubly.nonEmpty)
    doubly.foreach { id =>
      assert(full(id).startsWith("RECRAWL2 "))
      assert(asOf1(id).startsWith("RECRAWL ") && !asOf1(id).startsWith("RECRAWL2 "))
    }
    // keys untouched by seq-2 agree across cuts
    assert(asOf1.view.filterKeys(_ % 20 != 3).toMap ===
      full.view.filterKeys(_ % 20 != 3).toMap)
  }
}
