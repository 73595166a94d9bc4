package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.DeltaLog

/** Cross-JVM serve-while-maintain drill (round-13 verdict #4): ONE
  * REAL JVM loops live-view reads while THIS JVM lands micro-batches
  * and compacts under the maintenance lease — asserting, at the
  * process level, what `DeltaLogSpec`'s in-process hammer asserted in
  * one JVM: zero torn reads, zero hash drift.
  *
  * The detector is a PREFIX-STATE ORACLE, not a fixed hash: every
  * micro-batch's content is a deterministic function of its index, so
  * the serving view's multiset (count, hash) after i batches is
  * computable up front. Each reader iteration resolves the live view,
  * hashes it, and requires the result to equal SOME prefix state with
  * a monotonically non-decreasing index — a torn read (mixed
  * old/new parts, a half-visible fold, a manifest referencing deleted
  * files) produces a (count, hash) matching NO prefix and fails the
  * drill. A read hitting the documented one-compaction-interval
  * deferred-deletion bound re-resolves once (retry is counted,
  * drift is not tolerated).
  *
  * Two delta families run concurrently, shaped like the engine's real
  * ones: a row family folded with `distinct()` (unique rows, so the
  * fold is multiset-preserving) and a postings family folded with a
  * key re-cluster — the two transform shapes `compactLive` serves.
  *
  * Exit code 0 iff the reader observed >= [[MinReads]] clean reads,
  * zero violations, and finished on the FINAL prefix for both
  * families. One JSON report line per family (Maintain's convention).
  * `ServeDrillSpec` runs a scaled-down drill in the sbt gate; the
  * full cadence (default 24 batches per family, compaction every 4)
  * is a SCALE.md row.
  */
object ServeDrill {

  private val Prime = 1073741789L

  /** Deterministic batch content. Family A: unique rows. Family B:
    * skewed postings over 7 keys.
    */
  private[graft] def batchA(spark: SparkSession, i: Int): DataFrame = {
    import spark.implicits._
    ((i * 100L) until (i * 100L + 100L)).toDF("id")
  }
  private[graft] def batchB(spark: SparkSession, i: Int): DataFrame = {
    import spark.implicits._
    (0 until 50).map(j => (s"k${(i + j) % 7}", i * 1000L + j))
      .toDF("key", "doc")
  }

  /** Order-independent multiset state of a view: (count, sum of
    * per-row xxhash64 mod a 30-bit prime) — additive over batches, so
    * prefix states are a prefix sum of per-batch states.
    */
  private[graft] def state(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(col)
    val r = df.select(pmod(xxhash64(cols: _*), lit(Prime)).as("h"))
      .agg(count(lit(1)), sum("h")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1) % Prime)
  }

  /** Prefix states 0..n (index = number of batches landed). */
  private[graft] def prefixStates(spark: SparkSession, n: Int,
      batch: Int => DataFrame): IndexedSeq[(Long, Long)] = {
    val per = (0 until n).map(i => state(batch(i)))
    per.scanLeft((0L, 0L)) { case ((c, h), (bc, bh)) =>
      (c + bc, (h + bh) % Prime)
    }.toIndexedSeq
  }

  /** One validated live read: an empty/uncommitted dir IS the empty
    * prefix state (0, 0) — never a DataFrame call (a zero-column
    * frame can't hash, and the maintainer's first batch landing
    * seconds after the reader starts is normal, not torn).
    */
  private def liveState(spark: SparkSession, dd: String): (Long, Long) = {
    val parts = DeltaLog.liveParts(spark, dd, prefix = "")
    if (parts.isEmpty) (0L, 0L) else state(spark.read.parquet(parts: _*))
  }

  final case class Report(family: String, reads: Long, retries: Long,
      violations: Long, finalIndexReached: Boolean) {
    def ok: Boolean = violations == 0 && finalIndexReached
    def json: String =
      s"""{"family":"$family","reads":$reads,"retries":$retries,""" +
        s""""violations":$violations,"final_index_reached":$finalIndexReached,""" +
        s""""ok":$ok}"""
  }

  /** READER-MODE entry (child JVM): args(1)=base dir. Loops both
    * families until the stop file appears, validating every read
    * against the prefix oracle; writes a verdict file the maintainer
    * parses. Never holds any lease — it is a pure reader.
    */
  private def readerMain(base: String, nBatches: Int): Unit = {
    val spark = GraftSession.local(2)
    spark.sparkContext.setLogLevel("ERROR")
    val fams = Seq(
      ("A", s"$base/deltaA", prefixStates(spark, nBatches, batchA(spark, _))),
      ("B", s"$base/deltaB", prefixStates(spark, nBatches, batchB(spark, _))))
    var reads, retries, violations = 0L
    val lastIdx = scala.collection.mutable.Map("A" -> 0, "B" -> 0)
    val stop = Paths.get(s"$base/stop")
    Files.writeString(Paths.get(s"$base/reader.ready"), "ready")
    def oneRead(name: String, dd: String,
        prefixes: IndexedSeq[(Long, Long)]): Unit = {
      def attempt(): (Long, Long) = liveState(spark, dd)
      val st =
        try attempt()
        catch { case scala.util.control.NonFatal(_) =>
          // the documented deferred-deletion bound: a reader slower
          // than one compaction interval re-resolves once.
          retries += 1
          try attempt()
          catch { case scala.util.control.NonFatal(e2) =>
            violations += 1
            System.err.println(s"[$name] read failed twice: $e2")
            return
          }
        }
      reads += 1
      val idx = prefixes.indexOf(st)
      if (idx < 0) {
        violations += 1
        System.err.println(s"[$name] TORN READ: state $st matches no prefix")
      } else if (idx < lastIdx(name)) {
        violations += 1
        System.err.println(
          s"[$name] REGRESSION: index $idx after ${lastIdx(name)}")
      } else lastIdx(name) = idx
    }
    while (!Files.exists(stop)) {
      fams.foreach { case (n, dd, pre) => oneRead(n, dd, pre) }
      // progress for the maintainer's final-state wait
      Files.writeString(Paths.get(s"$base/reader.progress.tmp"),
        s"${lastIdx("A")},${lastIdx("B")},$reads,$retries,$violations")
      Files.move(Paths.get(s"$base/reader.progress.tmp"),
        Paths.get(s"$base/reader.progress"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    // one final validated read after the maintainer quiesced
    fams.foreach { case (n, dd, pre) => oneRead(n, dd, pre) }
    val fin = fams.forall { case (n, _, pre) => lastIdx(n) == pre.length - 1 }
    Files.writeString(Paths.get(s"$base/reader.verdict"),
      s"$reads,$retries,$violations,$fin")
    spark.stop()
    sys.exit(0)
  }

  /** Drive the drill: spawn the reader JVM, land + compact, quiesce,
    * collect the verdict. Returns per-family reports (reader totals
    * are whole-drill; they are attributed to both lines).
    */
  def run(spark: SparkSession, base: String, nBatches: Int = 24,
      compactEvery: Int = 4): Seq[Report] = {
    Files.createDirectories(Paths.get(base))
    val reader = JvmSpawn.spawn("graft.ServeDrill",
      Seq("reader", base, nBatches.toString),
      new java.io.File(s"$base/reader.log"), xmx = "2g")
    try {
      var deadline = System.currentTimeMillis() + 180000
      while (!Files.exists(Paths.get(s"$base/reader.ready"))) {
        require(System.currentTimeMillis() < deadline, "reader never ready")
        require(reader.isAlive, "reader died during startup")
        Thread.sleep(50)
      }
      val dds = Seq(s"$base/deltaA", s"$base/deltaB")
      for (i <- 0 until nBatches) {
        batchA(spark, i).write.parquet(s"${dds.head}/batch=$i")
        DeltaLog.commit(spark, dds.head, s"batch=$i")
        batchB(spark, i).write.parquet(s"${dds(1)}/batch=$i")
        DeltaLog.commit(spark, dds(1), s"batch=$i")
        if ((i + 1) % compactEvery == 0) {
          DeltaLog.compactLive(spark, dds.head)(_.distinct())
          DeltaLog.compactLive(spark, dds(1))(_.repartition(col("key")))
        }
      }
      // final folds (incl. the deferred physical cleanup pass)
      DeltaLog.compactLive(spark, dds.head)(_.distinct())
      DeltaLog.compactLive(spark, dds(1))(_.repartition(col("key")))
      // wait until the reader OBSERVES the final state, then stop it
      deadline = System.currentTimeMillis() + 180000
      var caughtUp = false
      while (!caughtUp && System.currentTimeMillis() < deadline &&
          reader.isAlive) {
        val p = Paths.get(s"$base/reader.progress")
        if (Files.exists(p)) {
          val f = Files.readString(p).split(",")
          caughtUp = f(0).toInt == nBatches && f(1).toInt == nBatches
          if (f(4).toLong > 0) caughtUp = true // fail fast on violations
        }
        if (!caughtUp) Thread.sleep(100)
      }
      Files.writeString(Paths.get(s"$base/stop"), "stop")
      require(reader.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "reader did not exit after stop")
      val v = Files.readString(Paths.get(s"$base/reader.verdict")).split(",")
      val (reads, retries, violations, fin) =
        (v(0).toLong, v(1).toLong, v(2).toLong, v(3).toBoolean)
      Seq("A", "B").map(f => Report(f, reads, retries, violations, fin))
    } finally {
      if (reader.isAlive) reader.destroyForcibly()
    }
  }

  val MinReads = 10L

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("reader")) {
      readerMain(args(1), args(2).toInt)
      return
    }
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val base = sys.env.get("GRAFT_SERVEDRILL_BASE")
      .getOrElse(Files.createTempDirectory("graft-servedrill").toString)
    val keep = sys.env.contains("GRAFT_SERVEDRILL_BASE") // debug runs keep scratch
    // failure is signaled AFTER the finally: sys.exit inside the try
    // would skip the finally entirely and leak the scratch tree on
    // exactly the failing runs (round-14 review #3).
    var failed = false
    try {
      val reports = run(spark, base)
      reports.foreach(r => println(r.json))
      val enough = reports.headOption.exists(_.reads >= MinReads)
      if (!enough) println(s"""{"error":"fewer than $MinReads reads"}""")
      spark.stop()
      failed = !reports.forall(_.ok) || !enough
    } finally {
      // scratch hygiene (Maintain's contract): nothing left behind
      if (!keep) try {
        val walk = Files.walk(Paths.get(base))
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    if (failed) sys.exit(1)
  }
}
