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

  /** Corpus-aware scan-split clamp (round-16 verdict: the x100 run
    * proved `sim_pq_topk`'s ADC scan degenerates to file-count
    * parallelism unless `maxPartitionBytes` is hand-lowered — an
    * accepted geometry rule nothing machine-enforced). This computes
    * the conf overrides a corpus NEEDS so a Verify/Bench at factor
    * >= 100 runs clean without the hand-set knob.
    *
    * Rule: estimate the partition count Spark's own split formula
    * (`maxSplit = min(128m, max(4m, (bytes + files*openCost)/
    * parallelism))`) yields for each top-level table; if the largest
    * table is big enough to matter (>= 32 MiB — sf0.1's whole corpus
    * sits below this, so committed bench geometry is untouched) and
    * ANY such table lands under 2x the core count, clamp
    * `maxPartitionBytes`/`openCostInBytes` to the FINEST need
    * (`bytes / 2*cores`, floored at 1 MiB). The finest-need table is
    * exactly the degenerate case: few compressed bytes, heavy CPU
    * per row (a 52 MB x100 embeddings table hiding a 36-minute
    * 2-task ADC scan). Over-splitting the big tables in exchange is
    * cheap: scan tasks are short and AQE coalesces after shuffles.
    *
    * An explicit `-Dspark.sql.files.maxPartitionBytes=...` (the
    * documented deployment knob) wins: the clamp backs off entirely.
    */
  def scanGeometry(sfDir: String, cores: Int): Map[String, String] = {
    if (sys.props.contains("spark.sql.files.maxPartitionBytes"))
      return Map.empty
    val tables = Option(new java.io.File(sfDir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        if (f.isDirectory) {
          val parts = Option(f.listFiles()).toSeq.flatten
            .filter(_.getName.endsWith(".parquet"))
          (f.getName, parts.map(_.length()).sum, parts.size.toLong)
        } else (f.getName, f.length(), 1L)
      }
      .filter(_._2 > 0)
    val clamps = tables.flatMap { case (name, bytes, files) =>
      scanClamp(bytes, files, cores).map(name -> _)
    }
    if (clamps.isEmpty) Map.empty
    else {
      val (who, v) = clamps.minBy(_._2)
      System.err.println(
        s"[graft] scan-geometry clamp: $who in $sfDir would scan with " +
          s"sub-CPU parallelism at default splits; setting " +
          s"maxPartitionBytes/openCostInBytes=$v (override with " +
          s"-Dspark.sql.files.maxPartitionBytes=...)")
      Map("spark.sql.files.maxPartitionBytes" -> v.toString,
        "spark.sql.files.openCostInBytes" -> v.toString)
    }
  }

  /** The pure rule behind [[scanGeometry]]: Some(clampBytes) iff a
    * table of `bytes` over `files` parquet files would scan with
    * fewer than 2x`cores` partitions under Spark's default split
    * sizing AND is big enough (>= 32 MiB) for that to matter.
    */
  private[graft] def scanClamp(bytes: Long, files: Long, cores: Int): Option[Long] = {
    val defMax = 128L << 20
    val defOpen = 4L << 20
    val target = 2L * math.max(1, cores)
    val costed = bytes + files * defOpen
    val maxSplit = math.min(defMax, math.max(defOpen, costed / math.max(1, cores)))
    val estParts = math.max(1L, costed / maxSplit)
    if (bytes >= (32L << 20) && estParts < target)
      Some(math.max(1L << 20, bytes / target))
    else None
  }

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
