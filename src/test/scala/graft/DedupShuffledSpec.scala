package graft

import graft.operators.{CorpusPrep, Dedup}

/** The 100 TB degradation path for the dedup drop-list anti-joins:
  * at web-crawl dup-rates (30-50% near-dup) the drop list is
  * corpus-proportional, so [[Dedup.keptCorpus]] and
  * [[CorpusPrep.trainingCorpus]] must NOT force a broadcast of it.
  * This suite disables auto-broadcast entirely and proves both
  * queries (a) still plan — with zero broadcast joins anywhere in
  * the final plan — and (b) return exactly the rows the
  * default-threshold plan returns. The searchTablesShuffled pattern
  * (JoinSearchSpec) applied to dedup, per the round-6 verdict.
  */
class DedupShuffledSpec extends SparkTestBase {
  import spark.implicits._

  private val key = "spark.sql.autoBroadcastJoinThreshold"

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  private def assertBroadcastFree(df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    // sparkPlan, not executedPlan: AQE wraps stages into leaves that
    // collect can't descend, and runtime SMJ->BHJ conversion respects
    // the disabled threshold anyway.
    val bad = df.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b
      case n: BroadcastNestedLoopJoinExec => n
    }
    assert(bad.isEmpty,
      s"drop-list path still plans broadcasts under a disabled threshold:\n${df.queryExecution.sparkPlan}")
  }

  test("keptCorpus completes broadcast-free and hash-equal under a disabled threshold") {
    val base = Dedup.keptCorpus(spark, sf0001)
      .as[(Long, String, String, Long)].collect().toSeq
    withNoBroadcast {
      val df = Dedup.keptCorpus(spark, sf0001)
      assertBroadcastFree(df)
      val got = df.as[(Long, String, String, Long)].collect().toSeq
      assert(got == base, "shuffled kept-corpus diverged from the broadcast plan")
    }
  }

  test("trainingCorpus completes broadcast-free and hash-equal under a disabled threshold") {
    val base = CorpusPrep.trainingCorpus(spark, sf0001)
      .as[(Long, String, String, Long)].collect().toSeq
    withNoBroadcast {
      val df = CorpusPrep.trainingCorpus(spark, sf0001)
      assertBroadcastFree(df)
      val got = df.as[(Long, String, String, Long)].collect().toSeq
      assert(got == base, "shuffled training-corpus diverged from the broadcast plan")
    }
  }

  test("winnowScreen completes broadcast-free and row-equal under a disabled threshold") {
    // round-11: the screening join is likewise hint-free — a
    // corpus-sized crawl batch must degrade to a shuffled fp-keyed
    // join (never a forced broadcast OOM), bit-identically.
    import graft.operators.TextAnalysis
    val base = TextAnalysis.winnowScreen(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    withNoBroadcast {
      val df = TextAnalysis.winnowScreen(spark, sf0001)
      assertBroadcastFree(df)
      assert(df.as[(Long, Long, Long)].collect().toSeq == base,
        "shuffled screening diverged from the broadcast plan")
    }
  }

  test("split percentage misconfiguration fails loudly, not silently") {
    intercept[IllegalArgumentException] {
      CorpusPrep.splitAssign(spark, sf0001, pctTrain = 95, pctVal = 10)
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.splitAssign(spark, sf0001, pctTrain = -1, pctVal = 10)
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.trainingCorpus(spark, sf0001, pctTrain = 101)
    }
  }
}
