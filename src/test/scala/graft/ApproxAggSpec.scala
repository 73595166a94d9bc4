package graft

import org.apache.spark.sql.functions._

import graft.sources.IndexBuilder

/** Approximate aggregates (the §2.4 "absent in reference" category):
  * HyperLogLog++ distinct counts and quantile sketches are the
  * 100 TB form of COUNT(DISTINCT)/exact-median — O(1) state per
  * group instead of a distinct shuffle. Not oracle-expressible
  * (DuckDB's sketches differ bit-wise), so the contract checked here
  * is the error bound against the exact answer on the real corpus —
  * which is the contract a user of these operators actually relies
  * on. Exact twins exist as oracle-green queries (`idx_key_df_salted`
  * counts, `text_token_median_by_lang` median).
  */
class ApproxAggSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct tracks exact distinct keys within 5%") {
    val idx = IndexBuilder.loadOrSnapshot(spark, sf0001)
    val (approx, exact) = idx
      .agg(approx_count_distinct("key", 0.02), countDistinct("key"))
      .as[(Long, Long)].head()
    assert(exact > 0)
    assert(math.abs(approx - exact) <= 0.05 * exact,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile brackets the exact token-count median") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
    val approx = toks.agg(expr("approx_percentile(n, 0.5, 1000)"))
      .as[Long].head()
    val sorted = toks.as[Long].collect().sorted
    val (lo, hi) = (sorted((sorted.length - 1) / 2), sorted(sorted.length / 2))
    // accuracy 1000 on this corpus size -> the sketch must land on a
    // true middle value
    assert(approx >= lo && approx <= hi, s"approx $approx not in [$lo, $hi]")
  }
}
