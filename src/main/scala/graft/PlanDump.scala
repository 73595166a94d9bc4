package graft

import java.nio.file.{Files, Paths}

/** Round-17 deliverable helper (not part of the library surface):
  * dumps `.explain("formatted")` of named registered queries to
  * `plans/<tag>/<query>_<suffix>.txt`, so before/after plan evidence
  * for the optimization rounds is committed verbatim.
  *
  * `runMain graft.PlanDump <tag> <suffix> q1 q2 ...` (empty query
  * list = a default hot set). AQE stays ON — these are the plans the
  * bench actually runs (`AdaptiveSparkPlan isFinalPlan=false` shows
  * the initial shape; exchange/join structure is what is diffed).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = args.headOption.getOrElse("r17")
    val suffix = args.drop(1).headOption.getOrElse("before")
    val names = args.drop(2).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    sources.IndexBuilder.cached(spark, sfDir).count()
    val outDir = Paths.get(sys.props("user.dir"), "plans", tag)
    Files.createDirectories(outDir)
    val sel = SparkEntry.orderedQueries
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    sel.foreach { case (name, fn) =>
      try {
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"dumped $name")
      } catch {
        case e: Throwable => println(s"FAILED $name: $e")
      }
    }
    spark.stop()
  }
}
