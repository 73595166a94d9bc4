package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path

import graft.sources.Commit
import graft.streaming.DeltaLog

/** Unit surface of the [[graft.sources.Commit]] strategy seam
  * (round-15 verdict #1) and the adversarial `advfs://` model it is
  * proven against. Process-level drills live in
  * [[ObjectStoreDrillSpec]].
  */
class CommitSeamSpec extends SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def advTmp(prefix: String): (String, String) = {
    val local = Files.createTempDirectory(prefix).toString
    (s"advfs://$local", local)
  }

  test("strategy resolution: rename for POSIX/HDFS schemes, cas elsewhere, conf override wins") {
    import java.net.URI
    assert(Commit.strategyFor(conf, new URI("file:///x")) === Commit.Rename)
    assert(Commit.strategyFor(conf, new URI("hdfs://nn/x")) === Commit.Rename)
    assert(Commit.strategyFor(conf, new URI("s3a://bucket/x")) === Commit.Cas)
    assert(Commit.strategyFor(conf, new URI("gs://bucket/x")) === Commit.Cas)
    assert(Commit.strategyFor(conf, new URI("advfs:///x")) === Commit.Cas)
    // unknown schemes default to the weaker (portable) assumption
    assert(Commit.strategyFor(conf, new URI("weirdstore://x/y")) === Commit.Cas)
    val c2 = new org.apache.hadoop.conf.Configuration(conf)
    c2.set("graft.commit.strategy.file", "cas")
    c2.set("graft.commit.strategy.s3a", "rename")
    assert(Commit.strategyFor(c2, new URI("file:///x")) === Commit.Cas)
    assert(Commit.strategyFor(c2, new URI("s3a://b/x")) === Commit.Rename)
  }

  test("the adversary is adversarial: FileContext Rename.NONE silently overwrites on advfs") {
    val (adv, local) = advTmp("graft-advfs-rename")
    val fctx = org.apache.hadoop.fs.FileContext.getFileContext(
      new java.net.URI(adv), conf)
    Files.writeString(Paths.get(s"$local/a"), "first")
    Files.writeString(Paths.get(s"$local/b"), "second")
    // Rename.NONE must be a no-op guard here — the object-store model
    fctx.rename(new Path(s"$adv/b"), new Path(s"$adv/a"),
      org.apache.hadoop.fs.Options.Rename.NONE)
    assert(Files.readString(Paths.get(s"$local/a")) === "second",
      "advfs must model overwriting renames, or the drills prove nothing")
    assert(!Files.exists(Paths.get(s"$local/b")))
  }

  test("cas createExclusive is single-winner under 8 racing threads on advfs") {
    for (round <- 1 to 5) {
      val (adv, local) = advTmp(s"graft-casx-$round")
      val target = new Path(s"$adv/token")
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val ts = (1 to 8).map { i =>
        val t = new Thread(() => {
          start.await()
          if (Commit.createExclusive(conf, target, s"writer-$i".getBytes("UTF-8")))
            wins.incrementAndGet()
        })
        t.start(); t
      }
      start.countDown()
      ts.foreach(_.join(20000))
      assert(wins.get === 1, s"round $round: expected one winner")
      // and the committed content is the winner's, intact
      assert(Files.readString(Paths.get(s"$local/token")).startsWith("writer-"))
    }
  }

  test("cas commitDir: claim + stamp-last; a lost id leaves tmp intact for retry") {
    val (adv, local) = advTmp("graft-casdir")
    val fs = new Path(adv).getFileSystem(conf)
    def mkTmp(name: String, payload: String): Path = {
      val t = new Path(s"$adv/root/.build-$name")
      fs.mkdirs(t)
      val out = fs.create(new Path(t, "part-0.parquet"), true)
      try out.write(payload.getBytes("UTF-8")) finally out.close()
      t
    }
    val t1 = mkTmp("one", "payload-one")
    val target = new Path(s"$adv/root/v=0")
    assert(Commit.commitDir(conf, t1, target, "_graft_fp", "fp-one".getBytes))
    assert(Files.readString(Paths.get(s"$local/root/v=0/_graft_fp")) === "fp-one")
    assert(Files.readString(Paths.get(s"$local/root/v=0/part-0.parquet"))
      === "payload-one")
    assert(!Files.exists(Paths.get(s"$local/root/.build-one")), "tmp consumed on win")
    // second committer targeting the SAME id loses and keeps its tmp
    val t2 = mkTmp("two", "payload-two")
    assert(!Commit.commitDir(conf, t2, target, "_graft_fp", "fp-two".getBytes))
    assert(Files.exists(Paths.get(s"$local/root/.build-two/part-0.parquet")),
      "a lost commit must leave the build intact for the next-id retry")
    assert(Files.readString(Paths.get(s"$local/root/v=0/_graft_fp")) === "fp-one",
      "the winner's stamp must survive the lost commit")
  }

  test("manifest completeness trailer: torn newest falls back; legacy untrailered accepted") {
    import spark.implicits._
    val dd = Files.createTempDirectory("graft-trailer").toString + "/delta"
    Seq(1L, 2L).toDF("id").write.parquet(s"$dd/batch=0")
    DeltaLog.commit(spark, dd, "batch=0")
    Seq(3L).toDF("id").write.parquet(s"$dd/batch=1")
    DeltaLog.commit(spark, dd, "batch=1")
    val mdir = Paths.get(DeltaLog.manifestDir(dd))
    val vs = Files.list(mdir).iterator()
    var maxV = -1L
    while (vs.hasNext) {
      val n = vs.next().getFileName.toString
      if (n.startsWith("v=")) maxV = math.max(maxV, n.drop(2).toLong)
    }
    assert(DeltaLog.liveParts(spark, dd).map(_.split('/').last).sorted
      === Seq("batch=0", "batch=1"))
    // an in-flight (trailerless, torn) newer version must NOT be served
    Files.writeString(mdir.resolve(s"v=${maxV + 1}"), "batch=0\n")
    assert(DeltaLog.liveParts(spark, dd).map(_.split('/').last).sorted
      === Seq("batch=0", "batch=1"),
      "a torn newest manifest must fall back to the newest committed one")
    // a dir written ENTIRELY by pre-trailer code (no version has a
    // trailer) serves its newest version as-is
    val legacy = Files.createTempDirectory("graft-trailer-legacy").toString + "/delta"
    val lm = Paths.get(DeltaLog.manifestDir(legacy))
    Files.createDirectories(lm)
    Files.writeString(lm.resolve("v=0"), "batch=0\n")
    Files.writeString(lm.resolve("v=1"), "batch=0\nbatch=1\n")
    assert(DeltaLog.liveParts(spark, legacy).map(_.split('/').last).sorted
      === Seq("batch=0", "batch=1"))
  }

  test("rename strategy on the local FS is unchanged: single-winner, no strays") {
    val dir = Files.createTempDirectory("graft-renx").toString
    val target = new Path(s"file:$dir/token")
    assert(Commit.createExclusive(conf, target, "a".getBytes))
    assert(!Commit.createExclusive(conf, target, "b".getBytes))
    assert(Files.readString(Paths.get(s"$dir/token")) === "a")
    val strays = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith(".tmp-"))
    assert(strays.isEmpty, "lost rename must clean its temp")
  }
}
