package graft

import java.nio.file.Files

/** The cross-JVM serve-while-maintain drill in the sbt gate
  * (round-13 verdict #4), scaled down: a REAL reader JVM loops
  * prefix-oracle-validated live reads while this JVM lands
  * micro-batches and compacts under the maintenance lease. The full
  * cadence (24 batches/family, compaction every 4) runs via
  * `runMain graft.ServeDrill` and is recorded in SCALE.md.
  */
class ServeDrillSpec extends SparkTestBase {

  test("a second-JVM reader sees zero torn reads / zero drift through landings + compactions") {
    val base = Files.createTempDirectory("graft-servedrill-spec").toString
    try {
      val reports = ServeDrill.run(spark, base, nBatches = 10, compactEvery = 3)
      assert(reports.map(_.family) === Seq("A", "B", "C"),
        "all three families (two fold shapes + the REAL indexed text path) must report")
      for (r <- reports) {
        assert(r.violations === 0, s"${r.family}: torn reads/drift: $r")
        assert(r.finalIndexReached, s"${r.family}: reader never saw the final state")
      }
      assert(reports.head.reads >= ServeDrill.MinReads,
        s"reader too slow to matter: ${reports.head.reads} reads")
    } finally {
      val walk = Files.walk(java.nio.file.Paths.get(base))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
