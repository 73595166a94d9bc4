package graft

/** The [[Maintain]] lifecycle driver IN the gate: one full
  * cross-family maintenance cycle (interleaved lands -> live serve ->
  * watermark fold -> deferred cleanup -> late batch) must hold every
  * family's three properties — fold-stability, cleanup-stability, and
  * late-batch liveness — exactly as the runnable main requires them.
  * This is the cross-family interleaving no per-family spec runs.
  */
class MaintainSpec extends SparkTestBase {

  test("one maintenance cycle holds every family's lifecycle contract") {
    val reports = Maintain.run(spark, sf0001)
    assert(reports.size === 7)
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, s"families violating the lifecycle contract:\n$bad")
    // folding really folded (3 landed batches each), not a no-op.
    assert(reports.forall(_.foldedParts === 3), reports)
  }

  test("the cycle holds over the DEGENERATE lake too") {
    // maintenance on a junk-bearing corpus (null/NaN/negative-id
    // rows in every base table — the DegenerateLakeSpec shapes): the
    // base artifacts the live views merge INTO must build, serve,
    // fold and stay bit-stable exactly as on a clean corpus.
    val reports = Maintain.run(spark, DegenerateLakeSpec.writeMixedLake(spark))
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, s"families violating the contract on the junk corpus:\n$bad")
  }
}
