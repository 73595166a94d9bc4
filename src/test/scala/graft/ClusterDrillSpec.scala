package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Scaled-down [[ClusterDrill]] in the sbt gate (round-14 verdict #1):
  * a REAL standalone cluster — master + two worker JVMs + executor
  * processes — runs a cross-family parity battery, builds a durable
  * artifact with executor tasks, folds deltas under the lease, and
  * survives an executor SIGKILL, every case exit-code-gated. The full
  * battery (15 queries at sf0.01) runs as `runMain graft.ClusterDrill`
  * and is a SCALE.md row; the full-REGISTRY compare.py gate under
  * `spark://` runs via `SPARK_GRAFT_MASTER` + Verify (ditto).
  *
  * No Spark session here: the whole drill (including its driver) runs
  * in child JVMs — a `spark://` driver cannot share this suite JVM
  * with the other suites' `local[*]` context.
  */
class ClusterDrillSpec extends AnyFunSuite {

  test("standalone cluster drill: parity, artifact, maintain, executor-loss (real processes)") {
    val base = Files.createTempDirectory("graft-clusterdrill-spec").toString
    val log = new java.io.File(s"$base/drill.log")
    val p = JvmSpawn.spawn("graft.ClusterDrill", Seq.empty, log, xmx = "4g",
      env = Map(
        "GRAFT_CLUSTER_BATTERY" -> Seq(
          "search_customer_tables", "events_asof_catalyst",
          "text_bm25_topk_indexed", "dedup_minhash_lsh",
          "prep_shard_packing").mkString(","),
        "GRAFT_CLUSTER_SF" -> "/root/testdata/sf0.001",
        "GRAFT_CLUSTERDRILL_BASE" -> s"$base/scratch",
        // off the default port so a dev cluster parked via `up` and
        // this gate never collide.
        "GRAFT_MASTER_PORT" -> "7203"))
    var passed = false
    try {
      assert(p.waitFor(9, java.util.concurrent.TimeUnit.MINUTES),
        s"drill timed out (see $log)")
      val out = Files.readString(log.toPath)
      val verdicts = out.linesIterator.filter(_.startsWith("""{"case":""")).toSeq
      assert(p.exitValue() == 0,
        s"drill exit ${p.exitValue()}; cases: ${verdicts.mkString(" | ")} (see $log)")
      assert(verdicts.size == 4 && verdicts.forall(_.contains(""""ok":true""")),
        s"expected 4 ok cases, got: ${verdicts.mkString(" | ")}")
      passed = true
    } finally {
      if (p.isAlive) p.destroyForcibly()
      // the drill sweeps its own scratch + artifacts; the spec dir
      // (log + scratch parent) goes here — kept on failure for
      // diagnosis.
      if (passed) try {
        val walk = Files.walk(Paths.get(base))
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(x => Files.deleteIfExists(x))
        finally walk.close()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  test("soak: sustained land/fold/serve on the cluster — bounded parts, " +
      "stable latency, zero lease violations (cas commit path)") {
    // a scaled-down run of the round-15-verdict-#6 soak mode (the
    // 30-60 min run is `runMain graft.ClusterDrill soak` — a SCALE.md
    // row); exit-code-gated on ALL soak invariants: folds happened,
    // live part count bounded by the cadence, manifest retention
    // bounded, zero lease violations / strays / value mismatches,
    // last-third serve latency within 3x of the first third.
    // GRAFT_SOAK_COMMIT=cas runs it on the object-store commit
    // protocol (conditional-create manifests, claim+stamp-last fold
    // dirs, tombstone lease release) so BOTH strategies sit in the
    // gate: rename via the 4-case drill above, cas here.
    val base = Files.createTempDirectory("graft-clusterdrill-soak").toString
    val log = new java.io.File(s"$base/soak.log")
    val p = JvmSpawn.spawn("graft.ClusterDrill",
      Seq("soak", "0.4", "4", "9"), log, xmx = "4g",
      env = Map(
        "GRAFT_CLUSTERDRILL_BASE" -> s"$base/scratch",
        "GRAFT_SOAK_COMMIT" -> "cas",
        "GRAFT_MASTER_PORT" -> "7204"))
    var passed = false
    try {
      assert(p.waitFor(9, java.util.concurrent.TimeUnit.MINUTES),
        s"soak timed out (see $log)")
      val out = Files.readString(log.toPath)
      val line = out.linesIterator.find(_.startsWith("""{"case":"soak"""))
      assert(p.exitValue() == 0 && line.exists(_.contains(""""ok":true""")),
        s"soak failed (exit ${p.exitValue()}): ${line.getOrElse("<no report>")} (see $log)")
      assert(line.exists(_.contains(""""strategy":"cas"""")),
        s"soak did not run the cas commit path: ${line.getOrElse("<no report>")}")
      passed = true
    } finally {
      if (p.isAlive) p.destroyForcibly()
      if (passed) try {
        val walk = Files.walk(Paths.get(base))
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(x => Files.deleteIfExists(x))
        finally walk.close()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
