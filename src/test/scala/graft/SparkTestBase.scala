package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazily built). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkTestBase.sweepStaleTmp()
    GraftSession.local(4)
  }

  def sf0001 = "/root/testdata/sf0.001"
}

object SparkTestBase {

  /** Part files under an artifact root, RECURSIVE, as root-relative
    * paths (round-13 versioned layout: parts live in `v=<n>/`
    * subdirs, so a rebuild into v=N+1 reads as a part-name change
    * exactly like the old in-place overwrite did). ONE definition for
    * every staleness spec — four private copies drifting is how two
    * specs end up disagreeing about what "a rebuild happened" means.
    */
  def partNames(path: String): Set[String] = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(root)) Set.empty
    else {
      val walk = java.nio.file.Files.walk(root)
      try {
        val b = Set.newBuilder[String]
        walk.forEach(p => if (p.getFileName.toString.startsWith("part-"))
          b += root.relativize(p).toString)
        b.result()
      } finally walk.close()
    }
  }

  @volatile private var swept = false

  /** Best-effort sweep of stale `graft-*` fixture dirs under the JVM
    * tmpdir: every suite creates throwaway corpora/checkpoints there
    * and (deliberately) never deletes mid-run — streaming restarts
    * re-open them — so long-lived sandboxes accumulate one batch of
    * dirs per gate run. Deleting only entries older than 2 h can
    * never race a concurrently running suite; failures are ignored.
    */
  private def sweepStaleTmp(): Unit = if (!swept) synchronized {
    if (swept) return
    swept = true
    val cutoff = System.currentTimeMillis() - 2 * 3600 * 1000L
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft-") && f.lastModified() < cutoff)
      .foreach(deleteQuietly)
    // same sweep for the ARTIFACT root: every throwaway fixture
    // corpus (a `graft-*` temp-dir name) leaves snapshots/companions
    // keyed by its unique name under target/graft-index — ~30 dirs
    // per gate run that can serve no one once the corpus is gone
    // (round-13 hygiene; 4k+ had accumulated). Real corpora
    // (sf0.001/sf0.1/lake-*/…) never match the prefix.
    val artifactRoot = new java.io.File(sys.env.getOrElse(
      "GRAFT_INDEX_DIR", s"${sys.props("user.dir")}/target/graft-index"))
    Option(artifactRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft-") && f.lastModified() < cutoff)
      .foreach(deleteQuietly)
  }

  private def deleteQuietly(f: java.io.File): Unit =
    try {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteQuietly)
      f.delete(): Unit
    } catch { case _: Throwable => () }
}
