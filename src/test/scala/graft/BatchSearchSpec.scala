package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

import graft.operators.JoinSearch
import graft.sources.IndexBuilder

/** The batched multi-query search must (1) return exactly what the
  * one-at-a-time searches return, per query, and (2) actually share
  * the postings-side work in ONE physical plan — the whole point of
  * batching: the per-(table,row) key aggregation's exchanges appear
  * once and every other query branch consumes them via ReusedExchange.
  */
class BatchSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def queryTriples(dir: String) = Seq(
    ("customer", Queries.customerQuery(spark, dir), Queries.customerCols),
    ("orders", Queries.ordersQuery(spark, dir), Queries.ordersCols),
    ("part", Queries.partQuery(spark, dir), Queries.partCols))

  test("batch search equals the one-at-a-time searches per query") {
    val idx = IndexBuilder.cached(spark, sf0001)
    val got = JoinSearch.searchTablesBatch(idx, queryTriples(sf0001))
      .as[(String, Int, Long)].collect().toSeq
    val expected = queryTriples(sf0001).flatMap { case (qid, q, cols) =>
      JoinSearch.searchTables(idx, q, cols)
        .as[(Int, Long)].collect().toSeq.map { case (t, s) => (qid, t, s) }
    }.sortBy { case (qid, t, s) => (qid, -s, t) }
    assert(got == expected)
    assert(got.map(_._1).distinct.sorted == Seq("customer", "orders", "part"))
  }

  test("the batched plan shares the postings aggregation via exchange reuse") {
    // ReuseExchange is a physical-prep rule visible in executedPlan
    // only outside AQE (adaptive reuse happens at stage
    // materialization, inside opaque query-stage leaves) — assert on
    // the non-adaptive plan, where the shared subtree is explicit.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = JoinSearch.searchTablesBatch(
        IndexBuilder.cached(spark, sf0001), queryTriples(sf0001))
      val reused = df.queryExecution.executedPlan.collect {
        case r: ReusedExchangeExec => r
      }
      assert(reused.nonEmpty,
        s"no ReusedExchange in the batched plan:\n${df.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("the pruned batch keeps exchange reuse AND the partition filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = JoinSearch.searchTablesBatchPartitionPruned(
        IndexBuilder.loadOrSnapshotPartitioned(spark, sf0001),
        IndexBuilder.loadOrBuildTableSketch(spark, sf0001),
        IndexBuilder.loadOrBuildKeyStats(spark, sf0001),
        queryTriples(sf0001))
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case r: ReusedExchangeExec => r }.nonEmpty,
        s"pruned batch lost exchange reuse:\n$plan")
      val scans = plan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains("-bytable")) => f
      }
      assert(scans.nonEmpty &&
        scans.forall(_.partitionFilters.exists(
          _.references.exists(_.name == "table_id"))),
        s"pruned batch lost the partition predicate:\n$plan")
      // and per-query parity with the plain batch.
      val got = df.as[(String, Int, Long)].collect().toSeq
      val base = JoinSearch.searchTablesBatch(
          IndexBuilder.cached(spark, sf0001), queryTriples(sf0001))
        .as[(String, Int, Long)].collect().toSeq
      assert(got == base)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("AQE also reuses the shared stages at runtime") {
    // adaptive reuse happens at stage materialization: after
    // execution, the final plan references the same ShuffleQueryStage
    // id from multiple branches (and renders ReusedExchange nodes).
    val df = JoinSearch.searchTablesBatch(
      IndexBuilder.cached(spark, sf0001), queryTriples(sf0001))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val stageIds = "ShuffleQueryStage (\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(stageIds.size > stageIds.distinct.size,
      s"no shuffle stage referenced twice in the adaptive plan:\n${plan.take(3000)}")
  }
}
