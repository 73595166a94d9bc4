package graft

/** The [[Maintain]] lifecycle driver IN the gate: one full
  * cross-family maintenance cycle (interleaved lands -> live serve ->
  * watermark fold -> deferred cleanup -> late batch) must hold every
  * family's three properties — fold-stability, cleanup-stability, and
  * late-batch liveness — exactly as the runnable main requires them.
  * This is the cross-family interleaving no per-family spec runs.
  */
class MaintainSpec extends SparkTestBase {

  private def scratchDirs(): Set[String] = {
    val tmp = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val ls = java.nio.file.Files.list(tmp)
    try {
      val b = Set.newBuilder[String]
      ls.forEach(p => if (p.getFileName.toString.startsWith("graft-maintain-"))
        b += p.toString)
      b.result()
    } finally ls.close()
  }

  test("one maintenance cycle holds every family's lifecycle contract") {
    val before = scratchDirs()
    val reports = Maintain.run(spark, sf0001)
    assert(reports.size === 7)
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, s"families violating the lifecycle contract:\n$bad")
    // folding really folded (3 landed batches each), not a no-op.
    assert(reports.forall(_.foldedParts === 3), reports)
    // the cycle cleans up after itself (round-12 ADVICE: a corpus
    // copy + ~13 delta/checkpoint dirs leaked per invocation — any
    // repeated cadence accumulates unbounded /tmp state).
    assert(scratchDirs() === before,
      "maintenance scratch dirs leaked past the run")
  }

  test("the cycle holds over the DEGENERATE lake too") {
    // maintenance on a junk-bearing corpus (null/NaN/negative-id
    // rows in every base table — the DegenerateLakeSpec shapes): the
    // base artifacts the live views merge INTO must build, serve,
    // fold and stay bit-stable exactly as on a clean corpus.
    val reports = Maintain.run(spark, DegenLake.writeMixedLake(spark))
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, s"families violating the contract on the junk corpus:\n$bad")
  }

  test("a SIGKILLED run's stale scratch is swept by the next run; live scratch is not") {
    // round-14: the in-run finally cleans a HEALTHY cycle, but a
    // kill -9 mid-cycle skips it — without a startup sweep, every
    // crashed cycle leaks a corpus-sized copy forever.
    import java.nio.file.{Files, Paths}
    val tmpRoot = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val idxRoot = s"${sys.props("user.dir")}/target/graft-index"
    Files.createDirectories(Paths.get(idxRoot))
    def plant(parent: String, name: String, ageMs: Long): String = {
      val d = Paths.get(parent, name)
      Files.createDirectories(d)
      Files.writeString(d.resolve("leftover.parquet"), "x")
      Files.setLastModifiedTime(d, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - ageMs))
      d.toString
    }
    val staleTmp = plant(tmpRoot, "graft-maintain-corpus-crashed1", 7200000)
    val staleArt = plant(idxRoot, "graft-maintain-corpus-crashed1-ab12cd", 7200000)
    val liveTmp = plant(tmpRoot, "graft-maintain-corpus-live1", 1000)
    val swept = Maintain.sweepStaleScratch(ttlMs = 3600000)
    assert(swept.contains(staleTmp) && swept.contains(staleArt),
      s"stale scratch not swept: $swept")
    assert(!Files.exists(Paths.get(staleTmp)) && !Files.exists(Paths.get(staleArt)))
    assert(Files.exists(Paths.get(liveTmp)),
      "a CONCURRENT live cycle's scratch must never be touched")
    Maintain.sweepStaleScratch(ttlMs = 0) // cleanup the live plant too
    assert(!Files.exists(Paths.get(liveTmp)))
  }
}
