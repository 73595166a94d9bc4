package graft

/** ONE definition of "spawn a sibling JVM from this build" for every
  * cross-process drill and spec (round-14 review: the classpath
  * assembly + ProcessBuilder boilerplate had grown four private
  * copies — `ServeDrill`, `ArtifactRaceSpec`, `CrashDrillSpec`,
  * `LeaseSpec` — so a layout change would fail only at runtime in
  * whichever drill ran last).
  *
  * The classpath is this build's classes (and test-classes when
  * present — harmless otherwise) plus the Spark jar directory; the
  * child's stdout+stderr land in `logFile` so a failed drill is
  * diagnosable after the fact.
  */
object JvmSpawn {

  def classpath: String = {
    val base = s"${sys.props("user.dir")}/target/scala-2.13"
    Seq(s"$base/test-classes", s"$base/classes", "/opt/spark/jars/*")
      .mkString(java.io.File.pathSeparator)
  }

  def spawn(mainClass: String, args: Seq[String],
      logFile: java.io.File, xmx: String = "1g"): Process = {
    val pb = new ProcessBuilder(
      (Seq(s"${sys.props("java.home")}/bin/java", s"-Xmx$xmx",
        "-cp", classpath, mainClass) ++ args): _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile)
    pb.start()
  }

  /** Spawn with a throwaway temp log (the spec-default shape). */
  def spawn(mainClass: String, args: String*): Process =
    spawn(mainClass, args.toSeq,
      java.io.File.createTempFile(
        mainClass.split('.').last.toLowerCase, ".log"))
}
