package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.sources.Artifacts

/** The round-13 artifact gate: SEMANTICS-KEYED invalidation (a
  * fingerprint of the generating computation composed with the source
  * fingerprint — replacing the manual FormatVersion bump that
  * round 12's own review proved forgettable) and the VERSIONED
  * layout's atomic swap (builds land in `v=<n>`, the stamp is the
  * commit point, superseded versions survive one rebuild interval).
  *
  * The headline property — "changing an artifact-affecting constant,
  * WITHOUT touching any version number, rebuilds the artifact at the
  * FS level" — is proven in two composable halves:
  *   1. constant change ⇒ key change: two variants of a builder class
  *     compiled AT TEST TIME differing in exactly one constant have
  *     different [[Artifacts.bytesFingerprint]]s;
  *   2. key change ⇒ FS-level rebuild: the gate, fed a different
  *     semantics under an unchanged upstream, builds a new version
  *     (observed via part paths) while an unchanged key serves as-is.
  */
class ArtifactSemanticsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(s"graft-sem-$p").toString

  private def files(root: String): Set[String] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Set.empty
    else {
      val walk = Files.walk(r)
      try {
        val b = Set.newBuilder[String]
        walk.forEach(p => if (Files.isRegularFile(p)) b += r.relativize(p).toString)
        b.result()
      } finally walk.close()
    }
  }

  private def writeUpstream(dir: String, n: Int): Unit =
    (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .write.mode("overwrite").parquet(s"$dir/up.parquet")

  test("changing one constant in a builder class changes its code fingerprint") {
    // the mechanism FormatVersion could not give: the key derives
    // from the bytecode, so the "forgot to bump" state cannot exist.
    def compile(seed: Long): Array[Byte] = {
      val src = Files.createTempDirectory("graft-javac")
      val out = Files.createTempDirectory("graft-javac-out")
      val f = src.resolve("TinyBuilder.java")
      Files.writeString(f,
        s"public class TinyBuilder { static final long SEED = ${seed}L; " +
          "public long f() { return SEED * 31; } }")
      val javac = javax.tools.ToolProvider.getSystemJavaCompiler
      assert(javac != null, "JDK compiler unavailable")
      val rc = javac.run(null, null, null,
        "-d", out.toString, f.toString)
      assert(rc === 0, "javac failed")
      Files.readAllBytes(out.resolve("TinyBuilder.class"))
    }
    val a = Artifacts.bytesFingerprint(Seq("TinyBuilder" -> compile(1L)))
    val a2 = Artifacts.bytesFingerprint(Seq("TinyBuilder" -> compile(1L)))
    val b = Artifacts.bytesFingerprint(Seq("TinyBuilder" -> compile(2L)))
    assert(a === a2, "fingerprint not deterministic for identical code")
    assert(a !== b, "a one-constant change did not change the fingerprint")
  }

  test("classFingerprint is stable, distinct per builder, and resolves real classfiles") {
    import graft.operators.{Dedup, Similarity}
    val sim = Artifacts.classFingerprint(Similarity.getClass)
    assert(sim === Artifacts.classFingerprint(Similarity.getClass))
    assert(sim !== Artifacts.classFingerprint(Dedup.getClass))
    // composition is order-insensitive at the blob level (sorted)
    assert(Artifacts.classFingerprint(Similarity.getClass, Dedup.getClass)
      === Artifacts.classFingerprint(Dedup.getClass, Similarity.getClass))
  }

  test("a semantics change alone rebuilds at the FS level; an unchanged key serves as-is") {
    val up = tmp("up")
    val art = tmp("art") + "/artifact"
    writeUpstream(up, 5)
    def load(sem: String): Set[Long] =
      Artifacts.loadOrBuild(spark, art, Seq(s"$up/up.parquet"), sem) { t =>
        spark.read.parquet(s"$up/up.parquet").select(col("id"))
          .write.mode("overwrite").parquet(t)
      }.as[Long].collect().toSet

    assert(load("semA") === (1L to 5L).toSet)
    val v0 = files(art)
    assert(v0.exists(_.startsWith("v=0/")), s"not versioned: $v0")
    // same key, same upstream: served as-is (identical file set)
    assert(load("semA") === (1L to 5L).toSet)
    assert(files(art) === v0, "rebuilt although semantics and source unchanged")
    // changed key, unchanged upstream: REBUILD — the FormatVersion
    // near-miss class (content-identical source, changed computation)
    assert(load("semB") === (1L to 5L).toSet)
    val v1 = files(art)
    assert(v1.exists(_.startsWith("v=1/")), s"no new version: $v1")
    // deferred deletion: the superseded version survives this rebuild
    assert(v1.exists(_.startsWith("v=0/")), "previous version deleted too early")
    // ... and is gone after the NEXT rebuild (retention = one interval)
    assert(load("semC") === (1L to 5L).toSet)
    val v2 = files(art)
    assert(v2.exists(_.startsWith("v=2/")) && v2.exists(_.startsWith("v=1/")))
    assert(!v2.exists(_.startsWith("v=0/")), "v=0 not cleaned after two rebuilds")
  }

  test("a source rewrite under an unchanged key also rebuilds (both gates compose)") {
    val up = tmp("up2")
    val art = tmp("art2") + "/artifact"
    writeUpstream(up, 3)
    def load(): Set[Long] =
      Artifacts.loadOrBuild(spark, art, Seq(s"$up/up.parquet"), "sem") { t =>
        spark.read.parquet(s"$up/up.parquet").select(col("id"))
          .write.mode("overwrite").parquet(t)
      }.as[Long].collect().toSet
    assert(load() === (1L to 3L).toSet)
    writeUpstream(up, 4)
    assert(load() === (1L to 4L).toSet, "source rewrite not detected")
  }

  test("atomic swap: a reader that resolved the old version keeps reading it through a rebuild") {
    val up = tmp("up3")
    val art = tmp("art3") + "/artifact"
    writeUpstream(up, 4)
    def load(sem: String) =
      Artifacts.loadOrBuild(spark, art, Seq(s"$up/up.parquet"), sem) { t =>
        spark.read.parquet(s"$up/up.parquet").select(col("id"))
          .write.mode("overwrite").parquet(t)
      }
    load("semA").count()
    // the reader: resolves NOW (v=0), reads LATER (after the rebuild)
    val resolved = Artifacts.servedVersion(spark, art).get
    val held = spark.read.parquet(resolved)
    load("semB").count() // rebuild into v=1; v=0 must survive
    assert(held.as[Long].collect().toSet === (1L to 4L).toSet,
      "in-flight reader lost its version mid-rebuild")
    assert(Artifacts.servedVersion(spark, art).get !== resolved)
  }

  test("an unstamped version dir (crashed build) is invisible and cleaned by the next build") {
    val up = tmp("up4")
    val art = tmp("art4") + "/artifact"
    writeUpstream(up, 2)
    def load(sem: String) =
      Artifacts.loadOrBuild(spark, art, Seq(s"$up/up.parquet"), sem) { t =>
        spark.read.parquet(s"$up/up.parquet").select(col("id"))
          .write.mode("overwrite").parquet(t)
      }
    load("semA").count()
    // a crashed build: parquet landed, stamp never written
    Seq(99L).toDF("id").write.parquet(s"$art/v=7")
    assert(Artifacts.servedVersion(spark, art).get.endsWith("v=0"),
      "unstamped dir must not be served")
    assert(load("semA").as[Long].collect().toSet === Set(1L, 2L),
      "crashed build leaked into a fresh read")
    // next rebuild targets ABOVE the stray and cleans it
    load("semB").count()
    val fs = files(art)
    assert(fs.exists(_.startsWith("v=8/")), s"build did not clear the stray id: $fs")
    assert(!fs.exists(_.startsWith("v=7/")), "crashed-build dir not cleaned")
  }

  test("servedPathLocal resolves the stamped version without a session") {
    val up = tmp("up5")
    val art = tmp("art5") + "/artifact"
    writeUpstream(up, 2)
    assert(Artifacts.servedPathLocal(art) === art, "no-version fallback")
    Artifacts.loadOrBuild(spark, art, Seq(s"$up/up.parquet"), "sem") { t =>
      spark.read.parquet(s"$up/up.parquet").write.mode("overwrite").parquet(t)
    }.count()
    assert(Artifacts.servedPathLocal(art).endsWith("v=0"))
  }

  test("legacy pre-versioned dirs rebuild once and their root files are superseded") {
    val up = tmp("up6")
    val art = tmp("art6") + "/artifact"
    writeUpstream(up, 3)
    // hand-build the legacy layout: parquet + _graft_src_fp in the root
    Seq(7L).toDF("id").write.mode("overwrite").parquet(art)
    Files.writeString(Paths.get(art, "_graft_src_fp"), "old-format")
    val got = Artifacts.loadOrBuild(spark, art, Seq(s"$up/up.parquet"), "sem") { t =>
      spark.read.parquet(s"$up/up.parquet").select(col("id"))
        .write.mode("overwrite").parquet(t)
    }.as[Long].collect().toSet
    assert(got === (1L to 3L).toSet, "legacy content served as fresh")
    val fs = files(art)
    assert(fs.exists(_.startsWith("v=0/")))
    assert(!fs.exists(n => n.startsWith("part-")),
      s"legacy root data files not superseded: $fs")
  }
}
