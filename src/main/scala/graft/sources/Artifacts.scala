package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staleness gate + atomic publish for durable build artifacts
  * (index snapshots and their companions, doc signatures, ANN
  * codebooks, trained tokenizers, …).
  *
  * An artifact is stale when EITHER of two fingerprints moved:
  *
  *  1. **Source fingerprint** — the upstream's CONTENT LISTING (the
  *     sorted (file name, length) set; every Spark overwrite emits
  *     fresh random `part-<uuid>` names, so any rewrite — same
  *     mtime tick or not, same bytes or not — invalidates). Mtime
  *     comparison was dropped in round 7 (coarse-mtime object
  *     stores silently served stale artifacts).
  *  2. **Semantics fingerprint** — a fingerprint of the artifact's
  *     GENERATING COMPUTATION, passed by the builder (round-12
  *     verdict #1): [[classFingerprint]] over the classfile bytes of
  *     the objects whose code defines what the artifact CONTAINS
  *     (the builder object plus the function objects it computes
  *     with). This replaces the manual `FormatVersion` bump
  *     convention, whose failure mode round 12 itself demonstrated:
  *     an ingest-door + seeding change altered what ANN artifacts
  *     contain while the embeddings source stayed byte-identical —
  *     only a self-review remembered the bump. A forgotten bump
  *     serves a STALE artifact under a fresh source fingerprint
  *     forever; with the code fingerprint, any change to the
  *     builder's bytecode (a seeding constant, an admission
  *     predicate, a new normalization step) auto-invalidates. The
  *     key is deliberately conservative: an unrelated edit in the
  *     same object (even a line-number shift) also rebuilds — a
  *     spurious rebuild costs seconds once per deployment, a missed
  *     invalidation is the silently-wrong-results class this repo
  *     eliminates everywhere else.
  *
  * **Versioned layout + atomic swap** (round-12 verdict #8): builds
  * land in `<root>/v=<n>/` — never over the files a concurrent
  * reader resolved. The commit point is the `_graft_fp` stamp
  * written INTO the version dir after the parquet commit; readers
  * resolve "highest stamped version", so a crash mid-build leaves an
  * unstamped dir no reader ever saw (cleaned by the next successful
  * build). A rebuild keeps the previously-served version on disk for
  * one full rebuild interval (the [[graft.streaming.DeltaLog]]
  * deferred-deletion rule applied to base artifacts) and deletes
  * anything older. Single-builder contract per artifact root
  * (in-JVM builds serialize on a per-root lock; two JVMs building
  * the same root concurrently are out of contract, exactly as for
  * delta-dir maintenance — see `DeltaLog.compactLive`'s lease).
  *
  * Legacy pre-versioned dirs (parquet + `_graft_src_fp` directly in
  * the root) are treated as stale — the semantics key did not exist
  * when they were stamped — and their root-level files are removed
  * after the first versioned build supersedes them.
  */
object Artifacts {

  private val FpFile = "_graft_fp"
  private val LegacyFpFile = "_graft_src_fp"

  /** Fingerprint of one upstream dataset directory (or file):
    * `<count>:<hash of sorted name:length lines>`; `"absent"` when
    * the path does not exist. Listing is recursive, so nested layouts
    * (hive partitions, `batch=` deltas, `v=` artifact versions)
    * fingerprint their leaves.
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

  /** SHA-256 (hex) of named byte blobs — the raw form of
    * [[classFingerprint]], public so a spec can fingerprint
    * dynamically-compiled class bytes and prove that changing ONE
    * constant in a builder changes the key (`ArtifactSemanticsSpec`).
    */
  def bytesFingerprint(named: Seq[(String, Array[Byte])]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    named.sortBy(_._1).foreach { case (n, bs) =>
      md.update(n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
      md.update(bs)
      md.update(1.toByte)
    }
    md.digest().take(12).map(b => f"$b%02x").mkString
  }

  /** Fingerprint of the GENERATING COMPUTATION: the classfile bytes
    * of `classes` and their nested/companion classfiles (`Foo$…` —
    * Scala compiles anonymous classes and inner objects to sibling
    * files; lambda bodies are methods of the object class itself, so
    * they are covered by the object's own bytes). The SAME family is
    * enumerated from a code-source DIRECTORY (the sbt/cluster
    * `classes` layout) or from a code-source JAR's entries — both
    * layouts cover nested classes, so a semantics change confined to
    * `Foo$Inner` moves the key in deployment too.
    *
    * Pass the builder object's class plus the function objects whose
    * code determines artifact CONTENT, e.g.
    * `classFingerprint(Similarity.getClass, VectorMath.getClass)`.
    * Memoized per JVM (keyed by the class set) — classfile bytes
    * cannot change under a running JVM.
    */
  def classFingerprint(classes: Class[_]*): String = {
    val key = classes.map(_.getName).sorted.mkString(",")
    fpCache.computeIfAbsent(key, _ => computeClassFp(classes))
  }

  private val fpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** Does `name` (a bare classfile name, no package, no `.class`)
    * belong to `stem`'s compilation family? The object class itself
    * (`Stem` / `Stem$`) plus every nested/anonymous sibling
    * (`Stem$Inner`, `Stem$$anon$1`, `Stem$$typecreator1$1`, …).
    */
  private def inFamily(name: String, stem: String): Boolean =
    name == stem || name == stem + "$" || name.startsWith(stem + "$")

  private def computeClassFp(classes: Seq[Class[_]]): String = {
    val blobs = classes.flatMap { c =>
      val bin = c.getName // e.g. graft.operators.Similarity$
      val pkg = bin.take(math.max(bin.lastIndexOf('.'), 0)).replace('.', '/')
      val stem = bin.drop(bin.lastIndexOf('.') + 1).stripSuffix("$")
      val src = Option(c.getProtectionDomain)
        .flatMap(d => Option(d.getCodeSource))
        .map(s => new java.io.File(s.getLocation.toURI))
      val family: Seq[(String, Array[Byte])] = src match {
        case Some(root) if root.isDirectory => // sbt/cluster classes dir
          val pkgDir = new java.io.File(root, pkg)
          Option(pkgDir.listFiles()).toSeq.flatten
            .filter(f => f.getName.endsWith(".class") &&
              inFamily(f.getName.stripSuffix(".class"), stem))
            .sortBy(_.getName)
            .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath))
        case Some(jar) if jar.isFile => // jar deployment: enumerate
          // the SAME family from the jar entries — hashing only the
          // named classfile would miss nested classes (Corpus$Table,
          // $anon, $typecreator siblings), recreating exactly the
          // forgotten-bump staleness this key exists to kill
          // (round-13 review). NOTE dev classes-dir and jar layouts
          // may order/compile identically but are not guaranteed
          // byte-identical — a layout switch costs at most one
          // spurious rebuild, never a stale serve.
          val jf = new java.util.jar.JarFile(jar)
          try {
            import scala.jdk.CollectionConverters._
            jf.entries().asScala
              .filter { e =>
                val n = e.getName
                n.startsWith(if (pkg.isEmpty) "" else pkg + "/") &&
                n.endsWith(".class") && !n.stripPrefix(pkg + "/").contains("/") &&
                inFamily(n.drop(if (pkg.isEmpty) 0 else pkg.length + 1)
                  .stripSuffix(".class"), stem)
              }
              .toSeq.sortBy(_.getName)
              .map { e =>
                val in = jf.getInputStream(e)
                try e.getName.split('/').last -> in.readAllBytes()
                finally in.close()
              }
          } finally jf.close()
        case _ => Seq.empty
      }
      if (family.nonEmpty) family
      else { // unknown code source (e.g. a module image): the named
        // classfile alone — better than nothing, and loud when even
        // that is unresolvable.
        val in = c.getResourceAsStream("/" + bin.replace('.', '/') + ".class")
        require(in != null, s"classfile resource not found for $bin")
        try Seq(bin -> in.readAllBytes()) finally in.close()
      }
    }
    require(blobs.nonEmpty, "no classfile bytes resolved")
    bytesFingerprint(blobs)
  }

  // ---------------------------------------------------------------
  // versioned layout
  // ---------------------------------------------------------------

  /** In-JVM per-root build serialization (two threads racing the
    * same artifact would both target the same next version).
    */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  private def lockFor(root: String): Object =
    buildLocks.computeIfAbsent(
      new Path(root).toUri.normalize.toString, _ => new Object)

  private def idOf(name: String): Option[Long] =
    if (!name.startsWith("v=")) None
    else scala.util.Try(name.substring(2).toLong).toOption

  private def versionDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toIndexedSeq
      .filter(_.isDirectory)
      .flatMap(s => idOf(s.getPath.getName).map(_ -> s.getPath))
      .sortBy(_._1)

  private def readStamp(fs: org.apache.hadoop.fs.FileSystem,
      vdir: Path): Option[String] = {
    val p = new Path(vdir, FpFile)
    if (!fs.isFile(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** The currently-served version dir of a versioned artifact root
    * (highest stamped `v=` child), or None when no committed version
    * exists. Public for readers that must resolve OUTSIDE a Spark
    * read (the DuckDB oracle's `read_parquet` globs).
    */
  def servedVersion(spark: SparkSession, root: String): Option[String] = {
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versionDirs(fs, rp).reverse
      .find { case (_, p) => readStamp(fs, p).isDefined }
      .map(_._2.toString)
  }

  /** [[servedVersion]] on the LOCAL filesystem without a session —
    * for oracle-SQL construction (DuckDB reads the same artifact the
    * engine serves). Falls back to `root` itself when no versioned
    * build exists (legacy layout, or the artifact builds during the
    * query run that precedes the oracle run).
    */
  def servedPathLocal(root: String): String = {
    val d = new java.io.File(root)
    val vs = Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && idOf(f.getName).isDefined &&
        new java.io.File(f, FpFile).isFile)
      .sortBy(f => idOf(f.getName).get)
    vs.lastOption.map(_.toString).getOrElse(root)
  }

  /** Load the artifact rooted at `artifactPath`, rebuilding whenever
    * no committed version matches the CURRENT (semantics, upstream
    * content) fingerprint pair. `build(target)` must leave a
    * committed parquet dataset at `target` (a fresh `v=<n>` dir the
    * gate chooses — never the files a concurrent reader resolved);
    * the gate then stamps the fingerprint it observes (post-build,
    * so a build that CREATES its upstream — e.g. a companion whose
    * build also writes the snapshot — stamps the created state, not
    * "absent") and defers deletion of the superseded version to the
    * NEXT rebuild.
    *
    * `semantics`: [[classFingerprint]] of the builder's semantic
    * closure — REQUIRED, so no family can silently opt out of
    * computation-keyed invalidation (the round-12 FormatVersion
    * near-miss).
    */
  def loadOrBuild(spark: SparkSession, artifactPath: String,
      upstreamPaths: Seq[String], semantics: String)(
      build: String => Unit): DataFrame =
    loadOrBuildWith(spark, artifactPath, upstreamPaths, semantics)(build)(
      p => spark.read.parquet(p))

  /** [[loadOrBuild]] with an explicit `read` (e.g. the partitioned
    * snapshot's explicit-schema read — an empty partitionBy write
    * emits no files, so inference fails on a day-one deployment).
    */
  def loadOrBuildWith(spark: SparkSession, artifactPath: String,
      upstreamPaths: Seq[String], semantics: String)(
      build: String => Unit)(read: String => DataFrame): DataFrame =
    lockFor(artifactPath).synchronized {
      val root = new Path(artifactPath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def currentFp: String =
        semantics + "§" +
          upstreamPaths.map(fingerprint(spark, _)).mkString("|")
      val served = versionDirs(fs, root).reverse.find { case (_, p) =>
        readStamp(fs, p).isDefined
      }
      val fresh = served.filter { case (_, p) =>
        readStamp(fs, p).contains(currentFp)
      }
      fresh match {
        case Some((_, p)) => read(p.toString)
        case None =>
          read(publishLocked(spark, root, fs, upstreamPaths, semantics)(build))
      }
    }

  /** Publish externally-produced content as the NEXT served version
    * of a versioned artifact (the streaming-compaction / swap path,
    * replacing the old "overwrite the artifact path in place"):
    * `build(target)` writes into a fresh `v=<n>` dir, the stamp —
    * with the CURRENT (semantics, upstream) fingerprint, so the gate
    * serves this version until the upstream or the build code
    * actually move — commits it, and the superseded version's files
    * survive one more publish for in-flight readers. Returns the
    * published version dir.
    */
  def publish(spark: SparkSession, artifactPath: String,
      upstreamPaths: Seq[String], semantics: String)(
      build: String => Unit): String =
    lockFor(artifactPath).synchronized {
      val root = new Path(artifactPath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      publishLocked(spark, root, fs, upstreamPaths, semantics)(build)
    }

  /** The build-into-next-version machinery; call under [[lockFor]]. */
  private def publishLocked(spark: SparkSession, root: Path,
      fs: org.apache.hadoop.fs.FileSystem, upstreamPaths: Seq[String],
      semantics: String)(build: String => Unit): String = {
    // Session lineages cached from the superseded source/version must
    // not feed the rebuild, or the artifact would carry stale frames
    // under the fresh fingerprint — permanently, since every later
    // session would see fingerprint-match and serve it.
    DfCache.invalidateDerived(spark, upstreamPaths)
    val versions = versionDirs(fs, root)
    val served = versions.reverse.find { case (_, p) =>
      readStamp(fs, p).isDefined
    }
    val next = versions.map(_._1).maxOption.getOrElse(-1L) + 1
    val target = new Path(root, s"v=$next")
    build(target.toString)
    val fp = semantics + "§" +
      upstreamPaths.map(fingerprint(spark, _)).mkString("|")
    val out = fs.create(new Path(target, FpFile), true)
    try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // deferred cleanup: keep the new build and the one a concurrent
    // reader may still hold (the previously-served version); drop
    // everything older plus unstamped strays (crashed builds below
    // `next` — no reader ever saw them).
    val keep = Set(next) ++ served.map(_._1)
    versions.filterNot { case (id, _) => keep(id) }
      .foreach { case (_, p) => fs.delete(p, true) }
    // legacy pre-versioned layout: root-level data files are
    // superseded by the first versioned build.
    if (fs.isFile(new Path(root, LegacyFpFile))) {
      fs.listStatus(root).toIndexedSeq
        .filter(s => s.isFile || idOf(s.getPath.getName).isEmpty)
        .foreach(s => fs.delete(s.getPath, true))
    }
    target.toString
  }
}
