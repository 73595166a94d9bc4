package graft

import graft.operators.CorpusPrep

/** The two-pass distributed running sum behind shard packing must
  * equal the sequential prefix sum exactly — checked against a
  * driver-computed expectation on randomized doc sizes, including
  * doc_id gaps (sparse buckets) and empty leading buckets.
  */
class CorpusPrepSpec extends SparkTestBase {
  import spark.implicits._

  test("shard packing equals the sequential prefix sum on random sparse ids") {
    val rng = new scala.util.Random(7)
    // sparse, gappy ids: some buckets empty, some dense
    val rows = (0 until 400)
      .map(i => (i * rng.nextInt(3).toLong + i, rng.nextInt(200) + 1L))
      .distinctBy(_._1).sortBy(_._1)
    val budget = 1000L
    var before = 0L
    val expected = rows.map { case (id, n) =>
      val shard = before / budget; before += n; (id, n, shard)
    }
    val got = CorpusPrep.shardPackingOf(
        rows.toDF("doc_id", "n_tokens"), budget, bucketSize = 50L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // shards fill to the budget: every shard boundary is crossed by
    // exactly the doc that straddles it (greedy rule)
    assert(got.map(_._3).distinct.sorted == got.map(_._3).distinct)
  }
}
