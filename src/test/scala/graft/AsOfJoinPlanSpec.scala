package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.plans.AsOfJoin
import graft.operators.Events

/** The custom Catalyst as-of operator: plans through the injected
  * strategy (AsOfJoinExec in the physical plan), merges correctly on
  * a hand-built corpus (latest at-or-before, inclusive instant,
  * left-null for no match), and agrees with the union-window
  * composition on the real sf0.001 corpus.
  */
class AsOfJoinPlanSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 50L), (1L, 100L), (1L, 250L), (2L, 300L))
    .toDF("k", "t")
  private def right = Seq(
    (1L, 100L, 10L), (1L, 200L, 12L), (3L, 1L, 99L))
    .toDF("rk", "rt", "payload")

  test("planner strategy produces AsOfJoinExec") {
    val df = AsOfJoin.joinLatest(left, "k", "t", right, "rk", "rt")
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val found = unwrapped.collect { case e: AsOfJoin.AsOfJoinExec => e }
    assert(found.nonEmpty, s"no AsOfJoinExec in:\n$plan")
  }

  test("merge semantics: latest at-or-before, inclusive, left-null otherwise") {
    val got = AsOfJoin.joinLatest(left, "k", "t", right, "rk", "rt")
      .select("k", "t", "payload")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 50L, None),        // before any right row
      (1L, 100L, Some(10L)),  // exact instant inclusive
      (1L, 250L, Some(12L)),  // latest of the two
      (2L, 300L, None)))      // key with no right rows
  }

  test("null-keyed left rows emit with the null right side (true left-outer)") {
    val nl = Seq((Option(1L), Option(100L)), (None, Option(7L)),
      (Option(1L), None)).toDF("k", "t")
    val got = AsOfJoin.joinLatest(nl, "k", "t", right, "rk", "rt")
      .select("k", "t", "payload")
      .as[(Option[Long], Option[Long], Option[Long])].collect().toSet
    // the null-keyed/null-timed rows survive with null match columns —
    // same rows the composition and the ASOF LEFT JOIN oracle emit —
    // while the valid row still matches.
    assert(got == Set(
      (Some(1L), Some(100L), Some(10L)),
      (None, Some(7L), None),
      (Some(1L), None, None)))
  }

  test("null-keyed RIGHT rows never match (nothing is at-or-before unknown)") {
    val nr = Seq((Option(1L), Option(100L), Option(10L)),
      (None, Option(1L), Option(55L)), (Option(1L), None, Option(66L)))
      .toDF("rk", "rt", "payload")
    val got = AsOfJoin.joinLatest(left, "k", "t", nr, "rk", "rt")
      .select("k", "t", "payload")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 50L, None), (1L, 100L, Some(10L)), (1L, 250L, Some(10L)),
      (2L, 300L, None)))
  }

  test("agrees with the union-window composition on sf0.001") {
    val a = Events.asofLatestOrder(spark, sf0001)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    val c = Events.asofLatestOrderCatalyst(spark, sf0001)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(a == c)
    assert(a.nonEmpty)
  }
}
