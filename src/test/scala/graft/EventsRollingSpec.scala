package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Pins [[Events.rollingPeaks]]'s RANGE-frame semantics on a
  * hand-computed fixture — the three edge behaviors a value-based
  * frame must get right — and the one-shuffle plan contract (the
  * window's user_id partitioning must satisfy the final per-user
  * groupBy, so no second exchange appears).
  */
class EventsRollingSpec extends SparkTestBase {
  import spark.implicits._

  // window = 100 ns for the fixture: frame at ts is [ts - 100, ts].
  private val W = 100L

  private def fixture = Seq(
    // u1: boundary INCLUSION — ts 100's frame [0, 100] holds ts 0;
    // ts 201's frame [101, 201] does not hold ts 100. The two peaks
    // come from DIFFERENT events (peak count at ts 100, peak cents
    // at ts 201) — the documented independent-maxima semantics.
    (1L, 0L, 0.01), (1L, 100L, 0.02), (1L, 201L, 0.04),
    // u2: tied timestamps — RANGE frames include ALL peer rows, so
    // every one of the three ties sees n_roll = 3.
    (2L, 50L, 0.01), (2L, 50L, 0.01), (2L, 50L, 0.01),
    // u3: boundary EXCLUSION — ts 101's frame [1, 101] misses ts 0.
    (3L, 0L, 0.05), (3L, 101L, 0.01)
  ).toDF("user_id", "ts", "value")

  test("range-frame edges: inclusion, peers, exclusion") {
    val got = Events.rollingPeaksOf(fixture, W)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 2L, 4L), // peak_n at ts 100 (2 events), peak_cents at ts 201 (4)
      (2L, 3L, 3L, 3L), // all three ties in every frame
      (3L, 2L, 1L, 5L)  // ts 0 outside ts 101's frame; cents peak is ts 0's own
    ))
  }

  test("the window's partitioning satisfies the groupBy: one hash shuffle") {
    // restore the PRE-TEST value, not a hard-coded "true" — the
    // session is shared across suites in this JVM (round-8
    // self-review finding).
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Events.rollingPeaksOf(fixture, W).queryExecution.executedPlan
      val ex = p.collect { case s: ShuffleExchangeExec => s.outputPartitioning }
      // one hashpartitioning(user_id) feeding window AND groupBy; the
      // only other exchange is the presentation orderBy's range
      // partitioning (inherent to the ordered-output contract).
      val (hash, range) = ex.partition(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
      assert(hash.size == 1 && range.size == 1,
        s"expected 1 hash + 1 presentation-sort exchange, got $ex:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("corpus run matches an independent per-user brute force") {
    val peaks = Events.rollingPeaks(spark, sf0001)
    val ev = Events.nanos(spark, sf0001)
      .select(col("user_id"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("vc"))
      .as[(Long, Long, Long)].collect().toSeq
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val roll = rows.map { case (_, t, _) =>
        val in = rows.filter { case (_, t2, _) => t2 >= t - Events.NanosPerDay && t2 <= t }
        (in.size.toLong, in.map(_._3).sum)
      }
      u -> (rows.size.toLong, roll.map(_._1).max, roll.map(_._2).max)
    }
    val got = peaks.as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === expected)
  }
}
