package graft

/** Scratch profiling main (not part of the library surface): times a
  * named subset of registered queries, repeated, against
  * `SPARK_GRAFT_SF_DIR`. `runMain graft.Prof q1 q2 ...`
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    sources.IndexBuilder.cached(spark, sfDir).count()
    val sel = SparkEntry.orderedQueries.filter { case (n, _) => args.contains(n) }
    for (r <- 1 to reps; (name, fn) <- sel) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"PROF rep$r $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
