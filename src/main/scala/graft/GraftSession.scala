package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session contract, used by [[Bench]],
  * [[Verify]], the specs, and library users:
  *  - shuffle partitions sized to the core count (the 200 default is
  *    wrong for local mode; on a cluster, size to executors);
  *  - UTC session timezone (oracle parity and sane timestamps);
  *  - `nanosAsLong` for the corpus's TIMESTAMP(NANOS) parquet;
  *  - AQE on (runtime coalescing + skew-join splitting).
  *
  * PARTITION-GEOMETRY WARNING (round-14, found by the x100 stress
  * drill): partitions-=-cores is right for the sf-scale corpora this
  * helper serves, and WRONG for data that outgrows them — a fixed
  * partition count turns a 100x corpus into ~6M-row sort partitions
  * that OOM a constrained heap in the sorter's pointer-array doubling
  * before spill can help. AQE coalesces an over-partitioned shuffle
  * DOWN at runtime but can never split an under-partitioned one, so
  * when pointing a local session at substantially more data, pass
  * `extra = Map("spark.sql.shuffle.partitions" -> <scaled>,
  * "spark.sql.files.maxPartitionBytes" -> <smaller>)` — the exact
  * geometry [[Stress]] applies and [[cluster]]'s scaladoc prescribes
  * (partitions 2-3x total cores, erring HIGH).
  */
object GraftSession {

  def local(cores: Int, extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      // engine extensions: the as-of planner strategy (custom
      // LogicalPlan -> custom SparkPlan; graft.plans.AsOfJoin).
      .withExtensions(_.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfStrategy))
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  /** Cluster-mode builder: the same engine contract with deployment
    * left to spark-submit (master, executors, memory). Differences
    * from [[local]] that matter at scale, encoded here so a library
    * user gets them by default:
    *  - shuffle partitions ~2-3x total executor cores (pass via
    *    `extra`; AQE coalesces down at runtime, so erring high is
    *    cheap — the 32 hardwired locally would throttle a real
    *    cluster);
    *  - `spark.sql.files.maxPartitionBytes` left at 128m (right for
    *    the corpus parquet; lower it only for heavily-computed
    *    narrow scans);
    *  - the index snapshot should be the `bucketBy(key)` catalog
    *    table ([[graft.sources.IndexBuilder.writeBucketed]]) so probe
    *    equi-joins skip the big-side exchange;
    *  - same extensions (as-of strategy), UTC, nanos handling, AQE
    *    (incl. skew-join splitting) as local.
    */
  def cluster(extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .withExtensions(_.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfStrategy))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    extra.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }
}
