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

  /** The packaged engine jar, shipped to standalone executors. The
    * classes DIRECTORY (what local mode runs off) is not shippable as
    * `spark.jars`, so standalone sessions require `sbt package` first
    * — fail fast with that message rather than a mid-query
    * ClassNotFoundException on an executor.
    */
  private[graft] def engineJar: String =
    sys.env.get("SPARK_GRAFT_JAR").getOrElse {
      val dir = new java.io.File(s"${sys.props("user.dir")}/target/scala-2.13")
      Option(dir.listFiles()).toSeq.flatten
        .filter(f => f.getName.endsWith(".jar") &&
          !f.getName.endsWith("-tests.jar") && !f.getName.contains("-sources"))
        .sortBy(-_.lastModified())
        .headOption
        .map(_.getAbsolutePath)
        .getOrElse(sys.error(
          s"no engine jar under $dir — run `sbt package` (or set " +
            "SPARK_GRAFT_JAR) before connecting to a standalone master"))
    }

  /** Session against a REAL standalone cluster (`spark://` master) —
    * executor processes, netty shuffle/broadcast transport, closure
    * serialization: everything local[*] structurally cannot exercise
    * (round-14 verdict #1). Same engine contract as [[local]]; code
    * reaches executors BOTH ways a deployment would:
    *  - `spark.jars` — the driver's file server ships the packaged
    *    jar, the path every multi-host cluster needs;
    *  - `spark.executor.extraClassPath` — same-box absolute path, so
    *    executor-side class loading never depends on fetch timing.
    */
  def standalone(master: String, shufflePartitions: Int,
      extra: Map[String, String] = Map.empty): SparkSession = {
    val jar = engineJar
    val b = SparkSession.builder()
      .master(master)
      .withExtensions(_.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfStrategy))
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.jars", jar)
      .config("spark.executor.extraClassPath", jar)
      // standalone's 1g executor default is a toy; size like the
      // drill cluster unless the caller overrides.
      .config("spark.executor.memory",
        sys.env.getOrElse("GRAFT_EXECUTOR_MEM", "4g"))
      .config("spark.executor.cores", "8")
    extra.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  /** [[local]] unless `SPARK_GRAFT_MASTER` names a `spark://` master
    * — the seam that lets [[Verify]] and [[Bench]] run their exact
    * batteries against real executor processes ([[ClusterDrill]]
    * stands the cluster up).
    */
  def fromEnv(cores: Int, extra: Map[String, String] = Map.empty): SparkSession =
    sys.env.get("SPARK_GRAFT_MASTER") match {
      case Some(m) if m.nonEmpty =>
        // shuffle partitions: the env core count is per-executor
        // sizing on the cluster path; total parallelism is what the
        // master granted, so default to 2x the local request (erring
        // high — AQE coalesces down), overridable via `extra`.
        standalone(m, 2 * cores, extra)
      case _ => local(cores, extra)
    }
}
