package graft

import org.scalatest.funsuite.AnyFunSuite

/** Feeds [[Bench.benchGate]] synthetic prior/current maps (round-14
  * verdict #3: the gate itself must be spec-pinned, not only wired).
  */
class BenchGateSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private def prior(qs: (String, Double)*)(value: Double) =
    Some((sf, qs.toMap, value))

  test("no prior artifact -> verdict none") {
    val (v, flags) = Bench.benchGate(None, sf, Map("a" -> 1.0), 1.0)
    assert(v == "none" && flags.exists(_.contains("no prior")))
  }

  test("prior from a different corpus dir -> none, not a false fail") {
    val p = Some(("/root/testdata/sf0.01", Map("a" -> 0.1), 10.0))
    val (v, _) = Bench.benchGate(p, sf, Map("a" -> 5.0), 50.0)
    assert(v == "none")
  }

  test("steady within noise -> ok") {
    val p = prior("a" -> 1.0, "b" -> 2.0)(3.0)
    val (v, flags) = Bench.benchGate(p, sf, Map("a" -> 1.1, "b" -> 1.8), 3.1)
    assert(v == "ok" && flags.isEmpty)
  }

  test("a silent single-query 2x regression inside a stable composite fails") {
    val p = prior("a" -> 1.0, "b" -> 5.0)(6.0)
    // composite moves +8% (inside band) but query a tripled
    val (v, flags) = Bench.benchGate(p, sf, Map("a" -> 3.0, "b" -> 3.5), 6.5)
    assert(v == "fail")
    assert(flags.exists(f => f.startsWith("a:") && f.contains(">2x")))
    assert(!flags.exists(_.startsWith("composite")))
  }

  test("sub-half-second blips stay under the floors (per-query and composite)") {
    val p = prior("a" -> 0.05)(0.05)
    val (v, _) = Bench.benchGate(p, sf, Map("a" -> 0.3), 0.3)
    assert(v == "ok") // 6x but below the 0.5 s / 5 s absolute floors
  }

  test("composite beyond +25% fails even with no single query over 2x") {
    val p = prior("a" -> 10.0, "b" -> 10.0)(20.0)
    val (v, flags) = Bench.benchGate(p, sf, Map("a" -> 13.0, "b" -> 13.0), 26.0)
    assert(v == "fail" && flags.exists(_.startsWith("composite")))
  }

  test("new queries absent from the prior are not flagged") {
    val p = prior("a" -> 1.0)(1.0)
    val (v, _) = Bench.benchGate(p, sf, Map("a" -> 1.0, "brand_new" -> 9.0), 10.0)
    // composite includes the new query's cost: not comparable blame,
    // but the composite rule still applies — 10x here fails.
    assert(v == "fail")
    val (v2, _) = Bench.benchGate(p, sf, Map("a" -> 1.0, "brand_new" -> 0.2), 1.2)
    assert(v2 == "ok")
  }

  test("resolvePrior prefers the highest committed BENCH_FULL_r<N>.json over target/") {
    val dir = java.nio.file.Files.createTempDirectory("benchgate")
    def write(rel: String, value: Double): Unit = {
      val p = dir.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p,
        s"""{"sf":"/d","queries":{"a":1.0},"value":$value}""")
    }
    write("target/bench_full.json", 10.0)
    // no committed prior -> falls back to the ephemeral target artifact
    val (p0, l0) = Bench.resolvePrior(dir)
    assert(p0.exists(_._3 == 10.0) && l0 == "target/bench_full.json")
    // committed priors win, highest round number wins among them
    write("BENCH_FULL_r9.json", 9.0)
    write("BENCH_FULL_r15.json", 15.0)
    val (p1, l1) = Bench.resolvePrior(dir)
    assert(p1.exists(_._3 == 15.0) && l1 == "BENCH_FULL_r15.json")
    // a corrupt newest committed file degrades to the next round back
    java.nio.file.Files.writeString(dir.resolve("BENCH_FULL_r16.json"), "{junk")
    val (p2, l2) = Bench.resolvePrior(dir)
    assert(p2.exists(_._3 == 15.0) && l2 == "BENCH_FULL_r15.json")
  }

  test("parsePrior round-trips the bench line shape and rejects junk") {
    val line = """{"metric":"total","sf":"/d","queries":{"a":1.5,"b":2},"value":3.5}"""
    assert(Bench.parsePrior(line).contains(("/d", Map("a" -> 1.5, "b" -> 2.0), 3.5)))
    assert(Bench.parsePrior("{not json").isEmpty)
    assert(Bench.parsePrior("""{"sf":"/d"}""").isEmpty)
  }
}
