package graft

import org.apache.spark.sql.functions._

/** Spark's runtime bloom-filter injection, proven engaged on this
  * engine's join class: a selective dimension filter materializes a
  * bloom filter that prunes the FACT side before its shuffle — at
  * 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the matching slice (the decontaminate /
  * kept-corpus anti-join shape pays exactly this). The default
  * application-side threshold (10 GB scan) is sized for real
  * clusters, so the spec lowers it to exhibit the plan at test scale
  * — the assertion is the INJECTION (might_contain on the fact
  * side), plus the negative control that turning the rule off
  * removes it (the plan-regression pattern).
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConfs(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("selective dim filter injects might_contain into the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val dim = spark.read.parquet(s"$sf0001/orders.parquet")
        .where(col("o_orderkey") < 100)
      def join() = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = join().queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom runtime filter injected:\n$plan")
      assert(join().count() > 0, "fixture join must produce rows")
      withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val off = join().queryExecution.optimizedPlan.toString
        assert(!off.contains("might_contain"),
          "negative control: rule off must remove the filter")
      }
    }
  }
}
