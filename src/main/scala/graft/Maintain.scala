package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextAnalysis}
import graft.streaming.{IndexStream, SimStream, TextStream}

/** The maintenance ENTRY POINT the delta architecture implies
  * (round-11 verdict #2): every delta family has a writer, a live
  * serving view, and an in-dir compactor — this main DRIVES the full
  * lifecycle for all six families as one runnable ops cycle, instead
  * of leaving the cadence implicit in per-family specs:
  *
  *   land N micro-batches (interleaved ACROSS families — the
  *   cross-family schedule a real maintenance window runs)
  *     -> serve the live view
  *     -> fold at the checkpoint watermark ([[graft.streaming
  *        .DeltaLog.compactLive]]; watermark-bounded for the
  *        replay-id-filtered families)
  *     -> re-serve and require BIT-STABLE results
  *     -> run the compactor again (the deferred physical cleanup)
  *        and require stability again
  *     -> land a LATE batch and require the serving view to MOVE
  *        (compaction must never freeze a family).
  *
  * Exit code 0 iff every family satisfies all three properties; the
  * per-family report prints as one JSON line each. `MaintainSpec`
  * runs the same [[run]] in the gate.
  *
  * The corpus is COPIED into a scratch dir first: delta dirs and
  * durable artifacts key on the corpus path, so a maintenance
  * exercise must never mutate the live serving state of a real
  * corpus dir ([[graft.streaming.DeltaLog.compactLive]]'s
  * one-checkpoint-per-delta-dir invariant is also why a scratch
  * cycle must not touch production checkpoints).
  */
object Maintain {

  final case class DocRow(doc_id: Long, text: String, lang: String, source: String)
  final case class VecRow(vec_id: Long, embedding: Seq[Float])
  final case class CustRow(c_name: String, c_mktsegment: String, c_custkey: Long)

  final case class Report(family: String, foldedParts: Int,
      stableAfterFold: Boolean, stableAfterCleanup: Boolean,
      lateBatchServes: Boolean) {
    def ok: Boolean = foldedParts >= 2 && stableAfterFold &&
      stableAfterCleanup && lateBatchServes
  }

  /** One delta family's lifecycle handles. */
  private final case class Family(name: String,
      land: Int => Unit, serve: () => DataFrame, compact: Long => Int)

  /** Order-independent MULTISET content hash of a serving view:
    * (row count, sum of per-row xxhash64 mod a 30-bit prime — the
    * mod keeps the bigint sum exact far beyond any corpus size here,
    * and summing, unlike xor, sees duplicate-row multiplicity).
    */
  private def contentHash(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(col)
    val r = df.select(pmod(xxhash64(cols: _*), lit(1073741789L)).as("h"))
      .agg(count(lit(1)), sum("h")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Drive the full cycle against a scratch COPY of `srcDir`'s
    * corpus; returns one report per family. All scratch state (the
    * corpus copy, ~13 delta/checkpoint dirs) is deleted on the way
    * out — a maintenance exercise that leaves a corpus-sized copy
    * per invocation accumulates unbounded /tmp state under any
    * repeated cadence (round-12 ADVICE).
    *
    * A SIGKILLED cycle's `finally` never runs (round-14, found while
    * building the crash drills), so each run also SWEEPS prior runs'
    * stale leftovers first: `graft-maintain-*` temp dirs and their
    * artifact siblings under the index root, older than
    * [[ScratchTtlMs]] (age-guarded so a concurrent live cycle's
    * minutes-old scratch is never touched). Crash recovery of the
    * scratch is thereby the NEXT run's first act, matching the
    * artifact gate's stray-sweep discipline.
    */
  def run(spark: SparkSession, srcDir: String): Seq[Report] = {
    sweepStaleScratch()
    val scratch = scala.collection.mutable.ArrayBuffer.empty[String]
    try runInScratch(spark, srcDir, scratch)
    finally scratch.foreach(deleteTree)
  }

  /** Stale-scratch bound: a healthy cycle is minutes; anything
    * `graft-maintain-*` older than this is a crashed run's leftover.
    */
  private[graft] val ScratchTtlMs: Long =
    sys.env.get("GRAFT_MAINTAIN_SCRATCH_TTL_MS").map(_.toLong)
      .getOrElse(6L * 3600 * 1000)

  private[graft] def sweepStaleScratch(
      ttlMs: Long = ScratchTtlMs): Seq[String] = {
    val now = System.currentTimeMillis()
    val swept = scala.collection.mutable.ArrayBuffer.empty[String]
    def sweepDir(root: java.io.File, prefix: String): Unit = {
      Option(root.listFiles()).toSeq.flatten
        .filter(f => f.getName.startsWith(prefix) &&
          now - f.lastModified() > ttlMs)
        .foreach { f => swept += f.toString; deleteTree(f.toString) }
    }
    sweepDir(new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft-maintain-")
    sweepDir(new java.io.File(sys.env.getOrElse("GRAFT_INDEX_DIR",
      s"${sys.props("user.dir")}/target/graft-index")),
      "graft-maintain-corpus")
    swept.toSeq
  }

  /** Best-effort recursive delete (cleanup must never mask the
    * cycle's own failure). NonFatal, not just IOException: the
    * Files.walk stream surfaces traversal races as
    * UncheckedIOException, which would otherwise escape a finally
    * and REPLACE the cycle's real result (round-13 review).
    */
  private def deleteTree(d: String): Unit =
    try {
      val root = Paths.get(d)
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  private def runInScratch(spark: SparkSession, srcDir: String,
      scratch: scala.collection.mutable.ArrayBuffer[String]): Seq[Report] = {
    val dir = Files.createTempDirectory("graft-maintain-corpus").toString
    scratch += dir
    // RECURSIVE copy with the walk stream closed (round-12 review): a
    // flat Files.list copy leaks the directory handle and copies a
    // directory-valued table (the Spark-written .parquet layout every
    // compactor in this engine itself produces) as an EMPTY dir —
    // the cycle would run green against a corpus it never exercised.
    val src = Paths.get(srcDir)
    val walk = Files.walk(src)
    try walk.forEach { p =>
      val t = Paths.get(dir).resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    } finally walk.close()
    // durable snapshots/artifacts the cycle builds FOR the scratch
    // corpus land as `<snapshotPath(dir)><suffix>` siblings under the
    // artifact root (keyed by the unique temp name, so they can serve
    // no one after this run) — register whatever actually got built,
    // exception path included, by listing the prefix family at exit.
    def registerArtifactSiblings(): Unit = {
      val stem = Paths.get(graft.sources.IndexBuilder.snapshotPath(dir))
      val root = stem.getParent
      val prefix = stem.getFileName.toString
      if (root != null && Files.isDirectory(root)) {
        val ls = Files.list(root)
        try ls.forEach { p =>
          if (p.getFileName.toString.startsWith(prefix)) scratch += p.toString
        } finally ls.close()
      }
    }
    try runFamilies(spark, dir, scratch)
    finally registerArtifactSiblings()
  }

  private def runFamilies(spark: SparkSession, dir: String,
      scratch: scala.collection.mutable.ArrayBuffer[String]): Seq[Report] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(prefix: String): String = {
      val d = Files.createTempDirectory(s"graft-maintain-$prefix").toString
      scratch += d
      d
    }

    // ---- batch generators: batch 3 (the LATE one) carries a NEW
    // source and fresh ids so every family's serving view must move.
    def docsOf(b: Int): Seq[DocRow] = (0 until 30).map { j =>
      val id = 9100000L + b * 1000 + j
      val words = (0 until 14).map(w => s"mword${(b * 7 + j + w) % 23}")
      DocRow(id, words.mkString(" "), "en",
        if (b >= 3) "srcLate" else s"src${b % 2}")
    }
    def vecsOf(b: Int): Seq[VecRow] = (0 until 10).map { j =>
      VecRow(9200000L + b * 1000 + j,
        (0 until Similarity.Dim).map(i => math.sin(b * 31 + j * 7 + i).toFloat))
    }
    def custOf(b: Int): Seq[CustRow] = (0 until 10).map { j =>
      CustRow(s"maint name${b}x$j", s"seg${b % 3}", 9300000L + b * 1000 + j)
    }

    // ---- the six families, each with its canonical dirs.
    val customer = graft.sources.Corpus.byName("customer")
    val postingsDelta = tmp("postings-delta")
    val inCust = MemoryStream[CustRow]
    val ckCust = tmp("postings-ckpt")

    val posDelta = TextAnalysis.positionalDeltaDir(dir)
    val inPos = MemoryStream[DocRow]
    val ckPos = tmp("positional-ckpt")

    val histDelta = tmp("hist-delta")
    val inHist = MemoryStream[DocRow]
    val ckHist = tmp("hist-ckpt")

    val sketchDelta = tmp("sketch-delta")
    val inSketch = MemoryStream[DocRow]
    val ckSketch = tmp("sketch-ckpt")

    val winnowDelta = tmp("winnow-delta")
    val inWinnow = MemoryStream[DocRow]
    val ckWinnow = tmp("winnow-ckpt")

    val lineDelta = tmp("line-delta")
    val inLine = MemoryStream[DocRow]
    val ckLine = tmp("line-ckpt")

    val inVec = MemoryStream[VecRow]
    val ckVec = tmp("vec-ckpt")

    def drive[T](in: MemoryStream[T], data: Seq[T])(
        start: DataFrame => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      in.addData(data: _*)
      val q = start(in.toDF())
      q.processAllAvailable(); q.stop()
    }

    val families = Seq(
      Family("postings",
        b => drive(inCust, custOf(b))(df => IndexStream.maintain(
          IndexStream.postings(df, customer), postingsDelta, ckCust)),
        () => IndexStream.loadWithDeltas(spark, dir, postingsDelta),
        _ => IndexStream.compactDeltasInPlace(spark, postingsDelta)),
      Family("positional",
        b => drive(inPos, docsOf(b))(df =>
          TextStream.maintainPositional(df, posDelta, ckPos)),
        () => TextAnalysis.positionalIndexWithDeltas(spark, dir, posDelta),
        _ => TextAnalysis.compactPositionalDeltas(spark, dir, posDelta)),
      Family("histogram",
        b => drive(inHist, docsOf(b))(df =>
          TextStream.maintain(df, histDelta, ckHist)),
        () => TextStream.cutoffsWithDeltas(spark, dir, histDelta),
        wm => TextStream.compactHistogramDeltas(spark, histDelta, wm)),
      Family("term-sketch",
        b => drive(inSketch, docsOf(b))(df =>
          TextStream.maintainTermSketch(df, sketchDelta, ckSketch)),
        () => TextStream.bucketSketchWithDeltas(spark, dir, sketchDelta),
        wm => TextStream.compactSketchDeltas(spark, sketchDelta, wm)),
      Family("winnow",
        b => drive(inWinnow, docsOf(b))(df =>
          TextStream.maintainWinnowSketch(df, winnowDelta, ckWinnow)),
        () => TextStream.winnowSketchWithDeltas(spark, dir, winnowDelta),
        _ => TextStream.compactWinnowDeltas(spark, winnowDelta)),
      Family("line-counts",
        b => drive(inLine, docsOf(b))(df =>
          TextStream.maintainLineCounts(df, lineDelta, ckLine)),
        () => TextStream.lineCountsWithDeltas(spark, dir, lineDelta),
        wm => TextStream.compactLineCountDeltas(spark, lineDelta, wm)),
      Family("vectors",
        b => drive(inVec, vecsOf(b))(df =>
          SimStream.maintainVectors(spark, dir, df, ckVec)),
        () => Similarity.quantizedWithDeltas(spark, dir),
        _ => Similarity.compactVectorDeltas(spark, dir)))

    // ---- the cycle: interleave lands ACROSS families (the schedule
    // a shared maintenance window actually runs).
    for (b <- 0 until 3; f <- families) f.land(b)
    val before = families.map(f => f.name -> contentHash(f.serve())).toMap
    // watermark = last committed batch id + 1: committed batches
    // never re-execute, so every future replay bound is >= 3.
    val folded = families.map(f => f.name -> f.compact(3L)).toMap
    val afterFold = families.map(f => f.name -> contentHash(f.serve())).toMap
    families.foreach(_.compact(3L)) // deferred-cleanup invocation
    val afterClean = families.map(f => f.name -> contentHash(f.serve())).toMap
    for (f <- families) f.land(3)
    val afterLate = families.map(f => f.name -> contentHash(f.serve())).toMap

    families.map { f =>
      Report(f.name, folded(f.name),
        stableAfterFold = afterFold(f.name) == before(f.name),
        stableAfterCleanup = afterClean(f.name) == before(f.name),
        lateBatchServes = afterLate(f.name) != before(f.name))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val reports = run(spark, sfDir)
    reports.foreach { r =>
      println(s"""{"family":"${r.family}","folded_parts":${r.foldedParts},""" +
        s""""stable_after_fold":${r.stableAfterFold},""" +
        s""""stable_after_cleanup":${r.stableAfterCleanup},""" +
        s""""late_batch_serves":${r.lateBatchServes},"ok":${r.ok}}""")
    }
    spark.stop()
    if (!reports.forall(_.ok)) sys.exit(1)
  }
}
