package graft

import org.apache.spark.sql.functions._

import graft.sources.{IndexBuilder, PostingsPack}

/** Pins the delta-varint accounting: the CASE-ladder byte count
  * equals a reference LEB128 encoder at every boundary (128^k ± 1),
  * and the gap encoding is lossless on the real corpus — prefix sums
  * of the windowed gaps reproduce each list's sorted row ids exactly
  * (list-materializing formulation, test-scale only; the operator
  * itself never builds lists).
  */
class PostingsPackSpec extends SparkTestBase {

  private def leb128Bytes(v: Long): Int = {
    require(v >= 0)
    var x = v >>> 7; var n = 1
    while (x != 0) { x >>>= 7; n += 1 }
    n
  }

  test("byte ladder matches reference LEB128 at boundaries") {
    import spark.implicits._
    val boundary = (1 to 8).flatMap { k =>
      val b = 1L << (7 * k); Seq(b - 1, b, b + 1)
    } ++ Seq(0L, 1L, Long.MaxValue)
    val got = boundary.toDF("d")
      .select(col("d"), PostingsPack.varintBytes(col("d")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    boundary.foreach { v =>
      assert(got(v) === leb128Bytes(v).toLong, s"ladder diverges at $v")
    }
  }

  test("gap encoding is lossless over the sf0.001 index") {
    // reconstruct each list from its gaps (prefix sums over the
    // sorted collect_list — fine at spec scale) and compare with the
    // original ids, all lists at once.
    val lists = IndexBuilder.cached(spark, sf0001)
      .groupBy("table_id", "column_id", "key")
      .agg(sort_array(collect_list(col("row_id"))).as("ids"))
      .withColumn("gaps", expr(
        "transform(ids, (v, i) -> v - if(i = 0, 0L, ids[i - 1]))"))
      .withColumn("rebuilt", expr(
        // prefix sums via a running aggregate over the gaps array
        "reverse(aggregate(gaps, array(cast(0 as bigint)), " +
          "(acc, g) -> concat(array(acc[0] + g), acc)))"))
      .withColumn("rebuilt", expr("slice(rebuilt, 2, size(rebuilt) - 1)"))
    val broken = lists.where(not(col("rebuilt") === col("ids"))).count()
    assert(broken === 0L, "some list failed the prefix-sum reconstruction")
    assert(lists.count() > 500L, "fixture must exercise many lists")
  }

  test("accounting totals are self-consistent and compressive") {
    val stats = PostingsPack.packStats(IndexBuilder.cached(spark, sf0001))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (n, raw, packed) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw === n * 8)
      assert(packed >= n, "at least one byte per posting")
      assert(packed <= raw, "varints never exceed the fixed layout")
    }
  }
}
