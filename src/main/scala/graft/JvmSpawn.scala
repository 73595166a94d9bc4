package graft

/** ONE definition of "spawn a sibling JVM from this build" for every
  * cross-process drill and spec (round-14 review: the classpath
  * assembly + ProcessBuilder boilerplate had grown four private
  * copies — `ServeDrill`, `ArtifactRaceSpec`, `CrashDrillSpec`,
  * `LeaseSpec` — so a layout change would fail only at runtime in
  * whichever drill ran last).
  *
  * The classpath (round-14 ADVICE: no hard-coded layout) is derived
  * from THIS JVM's `java.class.path` — the build's classes /
  * test-classes directories plus the directory holding the Spark
  * jars — with a `GRAFT_SPAWN_CP` env override for unusual layouts,
  * and a fail-fast require so a Scala version bump or a moved Spark
  * install breaks at this named seam with a clear message, not as a
  * ClassNotFoundException in whichever drill runs last. The child's
  * stdout+stderr land in `logFile` so a failed drill is diagnosable
  * after the fact.
  */
object JvmSpawn {

  private val sep = java.io.File.pathSeparator

  /** The Spark jar directory this JVM runs off, located from a loaded
    * spark-core jar on `java.class.path` (falling back to the image's
    * conventional install) — [[classpath]] appends the jar glob, and
    * [[ClusterDrill]] derives `SPARK_HOME` from its parent for the
    * worker JVMs it spawns.
    */
  def sparkJarDir: Option[String] = {
    // a valid jar dir holds the WHOLE distribution, not just the jar
    // we located it from (sbt's forked run re-homes each classpath
    // jar into its own bg-jobs hash directory, so spark-core's parent
    // can hold exactly one jar — reject it).
    def whole(d: String): Boolean =
      Option(new java.io.File(d).list()).exists(ls =>
        ls.exists(_.startsWith("spark-core_")) &&
          ls.exists(_.startsWith("spark-sql_")))
    sys.props.getOrElse("java.class.path", "")
      .split(java.io.File.pathSeparatorChar).toSeq.filter(_.nonEmpty)
      .find(e => new java.io.File(e).getName.startsWith("spark-core_"))
      .map(e => new java.io.File(e).getParent)
      .filter(whole)
      .orElse(Some("/opt/spark/jars").filter(whole))
  }

  def classpath: String = sys.env.getOrElse("GRAFT_SPAWN_CP", {
    val entries = sys.props.getOrElse("java.class.path", "")
      .split(java.io.File.pathSeparatorChar).toSeq.filter(_.nonEmpty)
    // this build's class directories, as the running JVM sees them
    // (sbt test/run puts both on the classpath); fall back to the
    // conventional sbt layout when launched some other way (e.g. a
    // drill child spawning a grandchild runs off a bare `-cp`).
    val classDirs = entries
      .filter(e => new java.io.File(e).isDirectory &&
        (e.endsWith("classes") || e.endsWith("test-classes")))
    val fallbackBase = s"${sys.props("user.dir")}/target/scala-2.13"
    val dirs =
      if (classDirs.nonEmpty) classDirs
      else Seq(s"$fallbackBase/test-classes", s"$fallbackBase/classes")
        .filter(new java.io.File(_).isDirectory)
    require(dirs.exists(_.endsWith("classes")),
      "JvmSpawn: no compiled classes directory on java.class.path and " +
        s"none under $fallbackBase — run from sbt (compile first) or set " +
        "GRAFT_SPAWN_CP to the full child classpath")
    // the Spark jar directory, located from a loaded Spark jar rather
    // than hard-coded (a different install parents the same way)
    require(sparkJarDir.isDefined,
      "JvmSpawn: cannot locate the Spark jar directory (no spark-core_* " +
        "on java.class.path, none under /opt/spark/jars) — set " +
        "GRAFT_SPAWN_CP to the full child classpath")
    (dirs :+ s"${sparkJarDir.get}/*").mkString(sep)
  })

  def spawn(mainClass: String, args: Seq[String],
      logFile: java.io.File, xmx: String = "1g",
      env: Map[String, String] = Map.empty,
      sysProps: Map[String, String] = Map.empty): Process = {
    val props = sysProps.map { case (k, v) => s"-D$k=$v" }.toSeq
    val pb = new ProcessBuilder(
      (Seq(s"${sys.props("java.home")}/bin/java", s"-Xmx$xmx") ++ props ++
        Seq("-cp", classpath, mainClass) ++ args): _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
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
