package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

/** Round-13 verdict #1: the versioned durable-artifact gate must be
  * CROSS-PROCESS safe. The pre-round-14 gate built directly into
  * `v=<next>` and stamped with overwrite=true under an in-JVM-only
  * lock: two JVMs racing `loadOrBuild` on one root both computed the
  * same `next`, wrote part files into the SAME directory, and one
  * stamped the mixed result — a torn artifact served under a valid
  * fingerprint, permanently. The gate now builds into a private
  * `.build-<uuid>` temp dir and commits via atomic no-overwrite
  * rename (`Artifacts.publishLocked`); this spec races TWO REAL JVMS
  * ([[ArtifactRaceMain]] — full Spark sessions, builds overlapped by
  * a mid-build sleep) on one artifact root and asserts the protocol's
  * invariants on the survivors.
  */
class ArtifactRaceSpec extends SparkTestBase {

  private def spawn(root: String, upstream: String, out: String): Process =
    JvmSpawn.spawn("graft.ArtifactRaceMain", root, upstream, out)

  test("TWO REAL JVMS racing loadOrBuild serve ONE consistent version — no torn artifact") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-artrace").toString
    val upstream = s"$base/upstream.parquet"
    val root = s"$base/artifact"
    (1L to 500L).toDF("id").repartition(3).write.parquet(upstream)
    val expected = (1L to 500L).map(i => s"$i:${i * 2}").sorted
    val expectedHash =
      scala.util.hashing.MurmurHash3.orderedHash(expected).toHexString

    val outA = s"$base/a.out"; val outB = s"$base/b.out"
    val pA = spawn(root, upstream, outA)
    val pB = spawn(root, upstream, outB)
    // ready/go handshake: wait until BOTH sessions are up, then start
    // them together — both resolve "no fresh version" and both build,
    // so the concurrent-build window is exercised every run.
    val deadline = System.currentTimeMillis() + 120000
    while (!(Files.exists(Paths.get(s"$outA.ready")) &&
             Files.exists(Paths.get(s"$outB.ready")))) {
      assert(System.currentTimeMillis() < deadline, "racers never became ready")
      Thread.sleep(50)
    }
    Files.writeString(Paths.get(s"$base/go"), "go")
    assert(pA.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "racer A hung")
    assert(pB.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "racer B hung")
    assert(pA.exitValue() === 0, "racer A failed — see its temp log")
    assert(pB.exitValue() === 0, "racer B failed — see its temp log")

    // both racers served the SAME, CORRECT content — and both BUILT
    // (the race was real, not a fresh-serve after the other's commit)
    for (out <- Seq(outA, outB)) {
      val Array(_, n, h, built) = Files.readString(Paths.get(out)).trim.split("\n")
      assert(n.toInt === 500, s"racer served wrong row count from $out")
      assert(h === expectedHash, s"racer served wrong content from $out")
      assert(built === "true", s"racer from $out never entered its build — " +
        "the concurrent-build window was not exercised")
    }

    // FS invariants: every visible version is stamped and internally
    // consistent; identical fingerprints dedupe to exactly one
    // version; no temp-build strays survive.
    val children = Option(new java.io.File(root).listFiles()).toSeq.flatten
    val vdirs = children.filter(f => f.isDirectory && f.getName.startsWith("v="))
    val strays = children.filter(_.getName.startsWith(".build-"))
    assert(strays.isEmpty, s"temp build dirs leaked: ${strays.map(_.getName)}")
    assert(vdirs.length === 1,
      s"same-fingerprint racers must dedupe to ONE version: ${vdirs.map(_.getName)}")
    for (v <- vdirs) {
      assert(new java.io.File(v, "_graft_fp").isFile,
        s"visible version ${v.getName} is unstamped — rename-commit broken")
      val rows = spark.read.parquet(v.toString)
        .select(col("id"), col("doubled")).collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").sorted.toSeq
      assert(rows.length === 500, s"${v.getName} torn: ${rows.length} rows")
      assert(scala.util.hashing.MurmurHash3.orderedHash(rows).toHexString
        === expectedHash, s"${v.getName} content corrupted")
    }
    // and a fresh in-process load serves it without rebuilding
    // (fingerprint match): bit-stable across the race
    val again = graft.sources.Artifacts.servedPathLocal(root)
    assert(again.contains("v="), s"no served version resolved: $again")
  }
}
