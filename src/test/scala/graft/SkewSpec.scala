package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted aggregation: result-invariance + actual shard spread. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key with 2000 rows, a long tail of singletons
    val hot = (1 to 2000).map(i => ("hot", i.toLong))
    val tail = (1 to 50).map(i => (s"k$i", i.toLong))
    (hot ++ tail).toDF("key", "row_id").withColumn("table_id", lit(1))
  }

  test("salted count equals the direct groupBy count") {
    val direct = skewed.groupBy("key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, Seq("key"), Seq("table_id", "row_id"))
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
    assert(salted("hot") == 2000L)
  }

  test("the hot key really spreads across salt shards") {
    val shards = skewed
      .withColumn("s", pmod(hash(col("key"), col("table_id"), col("row_id")), lit(16)))
      .where(col("key") === "hot")
      .select("s").distinct().count()
    assert(shards == 16L, s"hot key used $shards of 16 shards")
  }
}
