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
}
