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

  test("AQE skew-join splitting actually engages on a skewed shuffle join") {
    // The session contract claims AQE skew handling; this proves the
    // config path ENGAGES Spark's splitter rather than assuming it:
    // with sort-merge forced (no broadcast escape) and the skew
    // thresholds lowered to the fixture's scale, the final adaptive
    // plan must mark the join's skewed side as split (isSkew=true
    // partitions render as "skew=true" in the SMJ node).
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = (1 to 20000).map(i =>
        (if (i % 10 != 0) "hot" else s"k$i", i.toLong))
        .toDF("key", "v")
      val dim = (Seq("hot") ++ (1 to 20000).map(i => s"k$i"))
        .map((_, 1L)).toDF("key", "w")
      val joined = big.join(dim, Seq("key"))
      // execute THIS frame's QueryExecution (count() would plan a
      // separate aggregate query and leave this one un-finalized).
      assert(joined.collect().length == 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
