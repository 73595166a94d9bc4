package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{ConcurrentMaintenanceException, DeltaLog}

/** The dir-level maintenance lease (round-12 verdict #3): the
  * one-compactor-per-delta-dir contract is ENFORCED, not documented.
  * The cross-JVM half runs a REAL second JVM ([[graft.streaming
  * .LeaseProbe]] — plain Hadoop FS, no Spark, so it starts in
  * milliseconds) against a lease held by this test's JVM.
  */
class LeaseSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = spark.sparkContext.hadoopConfiguration

  private def tmp(): String =
    Files.createTempDirectory("graft-lease").toString + "/delta"

  test("a held lease refuses a second in-process maintainer; release frees it") {
    val dd = tmp()
    DeltaLog.acquireLease(conf, dd, owner = "maintainer-1")
    val e = intercept[ConcurrentMaintenanceException] {
      DeltaLog.acquireLease(conf, dd, owner = "maintainer-2")
    }
    assert(e.getMessage.contains("maintainer-1"))
    DeltaLog.releaseLease(conf, dd, owner = "maintainer-1")
    DeltaLog.acquireLease(conf, dd, owner = "maintainer-2")
    DeltaLog.releaseLease(conf, dd, owner = "maintainer-2")
  }

  test("compactLive refuses while another maintainer holds the dir") {
    val dd = tmp()
    Seq((1L, 1L), (2L, 1L)).toDF("id", "v").write.parquet(s"$dd/batch=0")
    DeltaLog.commit(spark, dd, "batch=0")
    Seq((3L, 1L)).toDF("id", "v").write.parquet(s"$dd/batch=1")
    DeltaLog.commit(spark, dd, "batch=1")
    DeltaLog.acquireLease(conf, dd, owner = "other-jvm")
    intercept[ConcurrentMaintenanceException] {
      DeltaLog.compactLive(spark, dd)(_.distinct())
    }
    DeltaLog.releaseLease(conf, dd, owner = "other-jvm")
    // freed: the fold proceeds and serves the same content
    assert(DeltaLog.compactLive(spark, dd)(_.distinct()) === 2)
    assert(spark.read.parquet(DeltaLog.liveParts(spark, dd, prefix = ""): _*)
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("stale .beat-tmp-* strays (holder crashed mid-beat) are swept by the next acquire") {
    val dd = tmp()
    val mdir = DeltaLog.manifestDir(dd)
    Files.createDirectories(Paths.get(mdir))
    val stale = Paths.get(s"$mdir/.beat-tmp-crashed")
    Files.writeString(stale, "crashed-holder\nts=0")
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    val fresh = Paths.get(s"$mdir/.beat-tmp-live")
    Files.writeString(fresh, "live-holder\nts=0")
    DeltaLog.acquireLease(conf, dd, ttlMs = 1000, owner = "sweeper")
    assert(!Files.exists(stale), "a TTL-stale beat temp must be swept")
    assert(Files.exists(fresh), "a fresh beat temp (a live holder's in-flight rename) must survive")
    DeltaLog.releaseLease(conf, dd, owner = "sweeper")
  }

  test("a stale lease (crashed maintainer) is taken over after the TTL") {
    val dd = tmp()
    DeltaLog.acquireLease(conf, dd, owner = "crashed")
    // age every staleness signal past the TTL (payload stamp governs
    // since round 15; mtime is the legacy fallback)
    DeltaLog.ageLease(conf, dd, 10000)
    DeltaLog.acquireLease(conf, dd, ttlMs = 1000, owner = "successor")
    // the takeover replaced the holder; the crashed owner's release
    // must NOT delete the successor's lease
    DeltaLog.releaseLease(conf, dd, owner = "crashed")
    intercept[ConcurrentMaintenanceException] {
      DeltaLog.acquireLease(conf, dd, owner = "third")
    }
    DeltaLog.releaseLease(conf, dd, owner = "successor")
  }

  test("staleness is judged in the maintainer clock domain, not the FS's (skewed mtime)") {
    // round-14 verdict #7: an NFS/object-store server stamps mtimes
    // from ITS clock. A lease whose FILE looks ancient but whose
    // payload stamp (holder clock) is fresh must be REFUSED — the
    // mtime-only rule would steal a healthy hold under a
    // backwards-skewed FS clock.
    val dd = tmp()
    DeltaLog.acquireLease(conf, dd, owner = "healthy-holder")
    Files.setLastModifiedTime(Paths.get(DeltaLog.leasePath(dd)),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600000)) // FS clock an hour behind
    val e = intercept[ConcurrentMaintenanceException] {
      DeltaLog.acquireLease(conf, dd, ttlMs = 60000, owner = "usurper")
    }
    assert(e.getMessage.contains("healthy-holder"))
    DeltaLog.releaseLease(conf, dd, owner = "healthy-holder")

    // and the converse: a FORWARD-skewed FS clock (file looks fresh)
    // must not shield a crashed holder whose payload stamp is ancient.
    DeltaLog.acquireLease(conf, dd, owner = "crashed-2")
    DeltaLog.ageLease(conf, dd, 120000)
    Files.setLastModifiedTime(Paths.get(DeltaLog.leasePath(dd)),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 3600000)) // FS clock an hour ahead
    DeltaLog.acquireLease(conf, dd, ttlMs = 60000, owner = "recoverer")
    DeltaLog.releaseLease(conf, dd, owner = "recoverer")
  }

  test("legacy lease without a payload stamp still expires by mtime") {
    val dd = tmp()
    // hand-land a pre-round-15 lease shape: bare owner id, no ts line
    val lease = Paths.get(DeltaLog.leasePath(dd))
    Files.createDirectories(lease.getParent)
    Files.writeString(lease, "legacy-holder")
    Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    DeltaLog.acquireLease(conf, dd, ttlMs = 1000, owner = "successor")
    DeltaLog.releaseLease(conf, dd, owner = "successor")
  }

  test("the heartbeat keeps a long-running hold from being stolen as stale") {
    // round-13 review: the first cut set the lease mtime once at
    // acquire, so any fold longer than the TTL was silently taken
    // over by the staleness branch and two maintainers interleaved.
    // Hold via withMaintenanceLease at a 3 s TTL for 4.5 s (longer
    // than the TTL, so a beat at ttl/3 MUST have refreshed the
    // mtime), observing mid-hold that a would-be successor at the
    // same TTL is refused — exactly what the pre-heartbeat code
    // failed.
    val dd = tmp()
    val t0 = System.currentTimeMillis()
    DeltaLog.withMaintenanceLease(spark, dd, ttlMs = 3000) {
      Thread.sleep(4500)
      val age = System.currentTimeMillis() -
        Files.getLastModifiedTime(Paths.get(DeltaLog.leasePath(dd))).toMillis
      assert(age < 3000, s"heartbeat never refreshed the lease (age ${age}ms)")
      // the maintainer-domain signal too: the beat sidecar must carry
      // a fresh holder-clock stamp (round-15: this is what the
      // takeover branch prefers).
      val beat = Paths.get(DeltaLog.leaseBeatPath(dd))
      assert(Files.exists(beat), "heartbeat never wrote the beat sidecar")
      val beatAge = System.currentTimeMillis() -
        DeltaLog.leaseTs(Files.readString(beat)).getOrElse(0L)
      assert(beatAge < 3000, s"beat stamp stale (${beatAge}ms)")
      intercept[ConcurrentMaintenanceException] {
        DeltaLog.acquireLease(conf, dd, ttlMs = 3000, owner = "successor")
      }
    }
    assert(System.currentTimeMillis() - t0 >= 4500)
    // released on exit: free again
    DeltaLog.acquireLease(conf, dd, owner = "after")
    DeltaLog.releaseLease(conf, dd, owner = "after")
  }

  test("TWO REAL JVMS: the probe reports held-with-owner, then free — without mutating") {
    val dd = tmp()
    // No Spark session starts in the probe (pure Hadoop-FS), so the
    // spawn is sub-second.
    def probe(): (Int, String) = {
      val log = java.io.File.createTempFile("leaseprobe", ".log")
      val p = JvmSpawn.spawn("graft.streaming.LeaseProbe", Seq(dd), log)
      val done = p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
      val out = java.nio.file.Files.readString(log.toPath)
      assert(done, s"probe hung:\n$out")
      (p.exitValue(), out)
    }
    DeltaLog.acquireLease(conf, dd, owner = "this-jvm")
    val mtimeBefore =
      Files.getLastModifiedTime(Paths.get(DeltaLog.leasePath(dd)))
    val (rcHeld, outHeld) = probe()
    assert(rcHeld === 2, s"probe should report held:\n$outHeld")
    assert(outHeld.contains("held") && outHeld.contains("this-jvm"))
    // observational: the probe touched nothing — the lease file is
    // intact with an unchanged mtime, and this holder can release it.
    assert(Files.getLastModifiedTime(Paths.get(DeltaLog.leasePath(dd)))
      === mtimeBefore, "a health check must not mutate the lease")
    DeltaLog.releaseLease(conf, dd, owner = "this-jvm")
    val (rcFree, outFree) = probe()
    assert(rcFree === 0, s"probe should report free once released:\n$outFree")
    assert(outFree.contains("free"))
    assert(!Files.exists(Paths.get(DeltaLog.leasePath(dd))),
      "a free-dir probe must not create the lease it reports on")
    DeltaLog.acquireLease(conf, dd, owner = "this-jvm")
    DeltaLog.releaseLease(conf, dd, owner = "this-jvm")
  }

  test("stale-lease takeover is single-winner under concurrent waiters (rename, not delete)") {
    // round-13 ADVICE (medium): with delete-based takeover, two
    // waiters that both observe the expired lease each remove it —
    // the slower delete kills the faster waiter's freshly-acquired
    // lease and BOTH hold the dir. The tombstone-rename takeover
    // admits exactly one winner per stale lease. Race N threads
    // against one aged lease, repeatedly.
    // ttl 10s >> the waiters' 20ms spin cadence: with a 1s ttl, a
    // loser thread descheduled past 1s would judge the WINNER's fresh
    // lease stale and legitimately take it over — a test flake, not a
    // product bug (round-14 review #4).
    val ttl = 10000L
    for (round <- 1 to 5) {
      val dd = tmp()
      DeltaLog.acquireLease(conf, dd, owner = "crashed")
      DeltaLog.ageLease(conf, dd, 3 * ttl)
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 8).map { i =>
        val t = new Thread(() => {
          start.await()
          try {
            DeltaLog.acquireLease(conf, dd, ttlMs = ttl, owner = s"waiter-$i-r$round")
            winners.incrementAndGet()
          } catch { case _: ConcurrentMaintenanceException => () }
        })
        t.start(); t
      }
      start.countDown()
      threads.foreach(_.join(30000))
      assert(winners.get === 1,
        s"round $round: expected exactly one takeover winner, got ${winners.get}")
      // the winning waiter holds a healthy lease; clean up via a
      // fresh takeover after aging it (owner ids are per-thread).
      DeltaLog.ageLease(conf, dd, 3 * ttl)
      DeltaLog.acquireLease(conf, dd, ttlMs = ttl, owner = "cleanup")
      DeltaLog.releaseLease(conf, dd, owner = "cleanup")
    }
  }

  test("TWO REAL COMPACTORS race one dir: exactly one folds, the other is refused, content intact") {
    // LeaseSpec proved cross-process REFUSAL with an observational
    // probe; this races two REAL maintainer JVMs both actually
    // calling compactLive (1.5 s mid-fold sleep; ready/go handshake
    // so both acquire within milliseconds) — the enforced
    // one-compactor-per-dir contract at full fidelity.
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lease-race").toString
    val dd = s"$base/delta"
    val expected = (0 until 3).flatMap(b => (b * 10) until (b * 10 + 10))
    for (b <- 0 until 3) {
      ((b * 10L) until (b * 10L + 10L)).toDF("id").write.parquet(s"$dd/batch=$b")
      DeltaLog.commit(spark, dd, s"batch=$b")
    }
    val logs = Seq("a", "b").map(n => new java.io.File(s"$base/fold-$n.log"))
    val ps = Seq("a", "b").zip(logs).map { case (n, log) =>
      JvmSpawn.spawn("graft.CrashDrillMain",
        Seq("fold", dd, s"$base/fold-$n.marker", "distinct", s"$base/go"),
        log)
    }
    val deadline = System.currentTimeMillis() + 120000
    while (!Seq("a", "b").forall(n =>
        Files.exists(Paths.get(s"$base/fold-$n.marker")))) {
      assert(System.currentTimeMillis() < deadline, "folders never ready")
      assert(ps.forall(_.isAlive), "a folder died before the race")
      Thread.sleep(20)
    }
    Files.writeString(Paths.get(s"$base/go"), "go")
    ps.foreach(p => assert(
      p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "folder hung"))
    val exits = ps.map(_.exitValue())
    assert(exits.count(_ == 0) === 1,
      s"exactly one compactor must win the lease; exits=$exits")
    val loserLog = java.nio.file.Files.readString(
      logs(exits.indexWhere(_ != 0)).toPath)
    assert(loserLog.contains("ConcurrentMaintenanceException") ||
      loserLog.contains("is being maintained by"),
      s"loser must fail with the loud lease refusal, not something else:\n" +
        loserLog.takeRight(500))
    // content intact and the dir is serviceable after the race
    val got = spark.read.parquet(DeltaLog.liveParts(spark, dd, prefix = ""): _*)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === expected.map(_.toLong))
    DeltaLog.compactLive(spark, dd)(_.distinct())
  }

  test("release restores a successor's lease it raced (rename-verify, not read-then-delete)") {
    // round-13 ADVICE: the read-then-delete TOCTOU — a takeover
    // landing between release's ownership read and its removal used
    // to DELETE the successor's lease. Simulate the takeover landing
    // inside that gap (precheck = false jumps straight to the rename
    // with the successor's file already in place): the displaced
    // release must put the successor's lease BACK, not delete it.
    val dd = tmp()
    DeltaLog.acquireLease(conf, dd, owner = "successor")
    DeltaLog.releaseLease(conf, dd, owner = "crashed", precheck = false)
    val e = intercept[ConcurrentMaintenanceException] {
      DeltaLog.acquireLease(conf, dd, owner = "third")
    }
    assert(e.getMessage.contains("successor"),
      "the successor's lease must survive a displaced release")
    DeltaLog.releaseLease(conf, dd, owner = "successor")
    DeltaLog.acquireLease(conf, dd, owner = "third")
    DeltaLog.releaseLease(conf, dd, owner = "third")
  }
}
