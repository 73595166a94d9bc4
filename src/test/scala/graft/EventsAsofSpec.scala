package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Events

/** Edge semantics of the as-of join on a hand-built corpus: events
  * before any order (left-null), at the exact order instant
  * (inclusive), and under same-date order ties (deterministic
  * max-orderkey pick). The sf0.01 oracle run covers the bulk path;
  * this pins the edges the synthetic data never hits.
  */
class EventsAsofSpec extends SparkTestBase {
  import spark.implicits._

  test("asof picks latest at-or-before order; earlier events get null") {
    val dir = Files.createTempDirectory("graft-asof").toString
    val us = 1000000L
    // orders: user 1 at t=100s and (two, same date) at t=200s; user 2 none.
    Seq((10L, 1L, "o", 1.0, new java.sql.Timestamp(100 * 1000), "p"),
        (11L, 1L, "o", 1.0, new java.sql.Timestamp(200 * 1000), "p"),
        (12L, 1L, "o", 1.0, new java.sql.Timestamp(200 * 1000), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
      .write.parquet(s"$dir/orders.parquet")
    // events (ts in nanos-as-long): user 1 at 50s, 100s, 250s; user 2 at 300s.
    Seq((1L, 50L * us * 1000, 1L, "e", 0.0, "{}"),
        (2L, 100L * us * 1000, 1L, "e", 0.0, "{}"),
        (3L, 250L * us * 1000, 1L, "e", 0.0, "{}"),
        (4L, 300L * us * 1000, 2L, "e", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = Events.asofLatestOrder(spark, dir)
      .select("event_id", "o_orderkey", "staleness_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, None, None),                    // before any order
      (2L, Some(10L), Some(0L)),           // exact instant is inclusive
      (3L, Some(12L), Some(50L * us)),     // date tie -> max orderkey
      (4L, None, None)))                   // user with no orders
  }
}
