package graft

/** Child-process main for `CrashDrillSpec` (NOT a test): runs ONE
  * maintenance/publish operation so the spec can SIGKILL this JVM at
  * a randomized point inside it and assert restart convergence.
  * Modes (args):
  *
  *   fold <deltaDir> <marker>            — DeltaLog.compactLive
  *   build <artifactRoot> <upstream> <marker>   — Artifacts.loadOrBuild
  *   publish <artifactRoot> <upstream> <marker> — Artifacts.publish
  *
  * The marker file is written immediately BEFORE the drilled call
  * (after session startup), so the parent's randomized kill delay
  * spans the operation itself, not JVM/Spark boot. Each operation
  * carries a deliberate mid-work sleep to widen the vulnerable
  * windows (manifest read -> fold write -> swap -> deferred deletes;
  * temp build -> stamp -> rename-commit).
  */
object CrashDrillMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(2)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def mark(p: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "started")
    args(0) match {
      case "fold" =>
        // optional 4th arg picks the fold-transform shape: "distinct"
        // (row dedup — the default) or "recluster" (key re-cluster,
        // the postings families' shape). Optional 5th arg is a
        // go-file to await AFTER marking ready — lets a spec start
        // two folders within milliseconds of each other (the
        // two-real-compactors lease race).
        val Array(_, dd, marker) = args.take(3)
        val transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          args.lift(3) match {
            case Some("recluster") => df => {
              Thread.sleep(1500); df.repartition(col("key"))
            }
            case _ => df => { Thread.sleep(1500); df.distinct() }
          }
        mark(marker)
        args.lift(4).foreach { go =>
          val deadline = System.currentTimeMillis() + 120000
          while (!java.nio.file.Files.exists(java.nio.file.Paths.get(go))) {
            require(System.currentTimeMillis() < deadline, "go-file wait timed out")
            Thread.sleep(20)
          }
        }
        graft.streaming.DeltaLog.compactLive(spark, dd)(transform)
      case "build" =>
        val Array(_, root, upstream, marker) = args.take(4)
        mark(marker)
        graft.sources.Artifacts.loadOrBuild(spark, root, Seq(upstream),
          "drill-sem") { t =>
          val df = spark.read.parquet(upstream)
            .withColumn("doubled", col("id") * 2).repartition(2)
          Thread.sleep(1500)
          df.write.parquet(t)
        }.count()
      case "publish" =>
        val Array(_, root, upstream, marker) = args.take(4)
        mark(marker)
        graft.sources.Artifacts.publish(spark, root, Seq(upstream),
          "drill-sem") { t =>
          val df = spark.read.parquet(upstream)
            .withColumn("doubled", col("id") * 2).repartition(2)
          Thread.sleep(1500)
          df.write.parquet(t)
        }
    }
    spark.stop()
    sys.exit(0)
  }
}
