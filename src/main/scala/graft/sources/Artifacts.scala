package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-fingerprinted staleness gate for durable build artifacts
  * (index snapshot companions, doc signatures).
  *
  * The earlier gate compared `_SUCCESS` mtimes, which silently serves
  * a stale artifact when the upstream is rewritten within the same
  * filesystem timestamp tick (coarse-mtime object stores make that
  * likely — round-7 ADVICE). This gate fingerprints the upstream's
  * CONTENT LISTING instead: the sorted (file name, length) set of the
  * upstream dataset. Every Spark overwrite emits fresh random
  * `part-<uuid>` names, so any rewrite — same tick or not, same bytes
  * or not — changes the fingerprint and invalidates dependents.
  *
  * The fingerprint observed AFTER a build is stored as a one-line
  * `_graft_src_fp` file inside the artifact directory (written after
  * the parquet commit, so an overwrite that wiped the directory also
  * wiped the stale fingerprint). An artifact is fresh iff its
  * `_SUCCESS` exists and the stored fingerprint equals the upstream's
  * current one.
  */
object Artifacts {

  private val FpFile = "_graft_src_fp"

  /** Fingerprint of one upstream dataset directory (or file):
    * `<count>:<hash of sorted name:length lines>`; `"absent"` when
    * the path does not exist. Listing is recursive, so nested layouts
    * (hive partitions, `batch=` deltas) fingerprint their leaves.
    */
  def fingerprint(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val s = it.next()
        entries += s"${s.getPath.toUri.getPath}:${s.getLen}"
      }
      val h = scala.util.hashing.MurmurHash3.orderedHash(entries.sorted)
      s"${entries.size}:${h.toHexString}"
    }
  }

  /** Load the artifact at `artifactPath`, rebuilding via `build`
    * whenever it is missing or its stored upstream fingerprint no
    * longer matches `upstreamPaths`' current listing. `build` must
    * leave a committed parquet dataset at `artifactPath`; the gate
    * then stamps the fingerprint it observes (post-build, so a build
    * that CREATES its upstream — e.g. a companion whose build also
    * writes the snapshot — stamps the created state, not "absent").
    */
  def loadOrBuild(spark: SparkSession, artifactPath: String,
      upstreamPaths: Seq[String])(build: => Unit): DataFrame = {
    val fs = new Path(artifactPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new Path(s"$artifactPath/_SUCCESS")
    val fpPath = new Path(s"$artifactPath/$FpFile")
    def currentFp: String =
      upstreamPaths.map(fingerprint(spark, _)).mkString("|")
    val fresh = fs.isFile(success) && fs.isFile(fpPath) && {
      val in = fs.open(fpPath)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      stored == currentFp
    }
    if (!fresh) {
      // An upstream mismatch means the source was rewritten (or never
      // built): session lineages cached from the old source must not
      // feed the rebuild, or the artifact would carry stale frames
      // under the fresh fingerprint — permanently, since every later
      // session would see fingerprint-match and serve it.
      DfCache.invalidateDerived(spark, upstreamPaths)
      build
      val out = fs.create(fpPath, true)
      try out.write(currentFp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    spark.read.parquet(artifactPath)
  }
}
