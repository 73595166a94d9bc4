package graft

/** Child-process main for `ArtifactRaceSpec` (NOT a test): race one
  * `Artifacts.loadOrBuild` against another JVM running this same
  * main on the same artifact root. Args: artifact root, upstream
  * parquet path, output file. Writes `<servedPath>\n<rowCount>\n
  * <contentHash>` to the output file and exits 0; any exception
  * escapes (non-zero exit) so the spec sees a failed racer loudly.
  *
  * The build sleeps mid-write to hold both racers inside the
  * build-temp window at once — the exact interleaving the pre-round-14
  * gate turned into a torn `v=<n>` (two JVMs computing the same next
  * version and writing part files into the same directory).
  */
object ArtifactRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, upstream, outFile) = args.take(3)
    val spark = GraftSession.local(2)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    // Ready/go handshake with the spec: signal this session is up,
    // then wait for the spec's `go` file — both racers enter
    // loadOrBuild within milliseconds of each other, so BOTH resolve
    // "no fresh version" and BOTH build (the race is exercised every
    // run, not just when JVM startups happen to align).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile + ".ready"), "ready")
    val go = java.nio.file.Paths.get(
      java.nio.file.Paths.get(outFile).getParent.toString, "go")
    val deadline = System.currentTimeMillis() + 120000
    while (!java.nio.file.Files.exists(go)) {
      require(System.currentTimeMillis() < deadline, "go-file wait timed out")
      Thread.sleep(20)
    }
    var built = false
    val served = graft.sources.Artifacts.loadOrBuild(
      spark, root, Seq(upstream),
      graft.sources.Artifacts.classFingerprint(ArtifactRaceMain.getClass)) { t =>
      built = true
      val df = spark.read.parquet(upstream)
        .withColumn("doubled", col("id") * 2)
        .repartition(4)
      Thread.sleep(2000) // widen the concurrent-build window
      df.write.parquet(t)
    }
    val rows = served.select("id", "doubled")
      .collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}")
      .sorted
    val hash = scala.util.hashing.MurmurHash3.orderedHash(rows.toSeq).toHexString
    // the path actually served: re-resolve (loadOrBuild returned the
    // DataFrame; the spec wants the version dir identity too)
    val path = graft.sources.Artifacts.servedPathLocal(root)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      s"$path\n${rows.length}\n$hash\n$built\n")
    spark.stop()
    sys.exit(0)
  }
}
