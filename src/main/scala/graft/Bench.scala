package graft


/** Benchmark main: runs every registered query in deterministic
  * registration order against `SPARK_GRAFT_SF_DIR` and prints ONE JSON
  * line `{"metric","value","unit","queries",...}`.
  *
  * Hygiene (VERDICT r1): the index is forced (snapshot + persist +
  * count) before timing and reported separately as `index_build`, so
  * no query absorbs the one-time materialization; failures are NOT
  * swallowed — a failing query times as -1 and lands in `errors`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      try { f; ((System.nanoTime() - t0) / 1e9, None) }
      catch { case e: Throwable =>
        (-1.0, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }

    val (tIndex, indexErr) =
      timed { sources.IndexBuilder.cached(spark, sfDir).count() }

    val results = SparkEntry.orderedQueries.map { case (name, fn) =>
      val (t, err) = timed { fn(spark, sfDir).count() }
      (name, t, err)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val errs = (indexErr.map("index_build" -> _).toSeq ++
      results.collect { case (k, _, Some(e)) => k -> e })
      .map { case (k, e) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + math.max(tIndex, 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","index_build":$tIndex,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
