package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.IndexBuilder

/** Proves the cluster-scale claim in IndexBuilder's scaladoc: a
  * bucketed index snapshot makes key-equi-joins exchange-free on the
  * big side (both inputs arrive pre-hashed on `key`).
  */
class BucketedIndexSpec extends SparkTestBase {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size
  }

  test("bucketed self-join on key plans zero shuffle exchanges") {
    val table = IndexBuilder.writeBucketed(spark, sf0001, numBuckets = 8,
      table = "graft_index_bucketed_spec")
    try {
      val idx = spark.table(table)
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val selfJoin = idx.as("a").join(idx.as("b"), Seq("key"))
          .groupBy(col("key")).count()
        assert(shuffles(selfJoin) == 0,
          s"expected bucket-co-located join, got:\n${selfJoin.queryExecution.executedPlan}")
        // sanity: the same join over the unbucketed snapshot shuffles
        val plain = IndexBuilder.loadOrSnapshot(spark, sf0001)
        val unbucketed = plain.as("a").join(plain.as("b"), Seq("key"))
          .groupBy(col("key")).count()
        assert(shuffles(unbucketed) > 0, "control: unbucketed join must shuffle")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      // and the bucketed table holds the same postings as the build
      assert(spark.table(table).count() == IndexBuilder.build(spark, sf0001).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_index_bucketed_spec")
    }
  }
}
