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

  /** Additive state combine (the multiset union of two views). */
  private[graft] def addState(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, (a._2 + b._2) % Prime)

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

  /** Family C plants this term (absent from every base corpus) once
    * per delta document, so the live positional index's posting count
    * for it — and the indexed-BM25 scored-doc count — are ADDITIVE in
    * landed batches: the prefix oracle applies to the REAL serving
    * path (round-13 verdict #4 named "indexed phrase / search over
    * base ∪ deltas" — families A/B cover the two fold-transform
    * shapes on raw delta dirs; C reads through
    * `positionalIndexWithDeltas` + `bm25ScoresForTermsIndexed`, i.e.
    * durable artifact ∪ deltas with the literal-pushdown probe).
    */
  private[graft] val PlantedTerm = "zqxaardvarkz"
  private[graft] val DocsPerBatchC = 5

  private[graft] def batchCDocs(spark: SparkSession, i: Int): DataFrame = {
    import spark.implicits._
    (0 until DocsPerBatchC).map { j =>
      (900000000L + i.toLong * DocsPerBatchC + j,
        s"$PlantedTerm arrived with batch $i doc $j filler words")
    }.toDF("doc_id", "text")
  }

  /** READER-MODE entry (child JVM): args(1)=base dir. Loops all
    * families until the stop file appears, validating every read
    * against its prefix oracle; writes a verdict file the maintainer
    * parses. Never holds any lease — it is a pure reader.
    */
  private def readerMain(base: String, nBatches: Int): Unit = {
    val spark = GraftSession.local(2)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.TextAnalysis
    val preA = prefixStates(spark, nBatches, batchA(spark, _))
    val preB = prefixStates(spark, nBatches, batchB(spark, _))
    def byState(dd: String, pre: IndexedSeq[(Long, Long)])(): Option[Int] = {
      val i = pre.indexOf(liveState(spark, dd))
      if (i < 0) None else Some(i)
    }
    val corpus = s"$base/servedrill-corpus"
    val cdd = TextAnalysis.positionalDeltaDir(corpus)
    val probeFrame = Seq((0L, PlantedTerm)).toDF("probe_id", "term")
    def observeC(): Option[Int] = {
      // two sequential observations over a LIVE view: batches can land
      // between them, so the later (bm25) count may legitimately run
      // AHEAD of the earlier (postings) count — each must be a whole
      // number of batches and the later must never be BEHIND; the
      // prefix index reported for monotonicity is the earlier read's.
      val cnt = TextAnalysis.positionalIndexWithDeltas(spark, corpus, cdd)
        .where(col("term") === PlantedTerm).count()
      val scored =
        TextAnalysis.bm25ScoresForTermsIndexed(spark, corpus, probeFrame).count()
      if (cnt % DocsPerBatchC == 0 && scored % DocsPerBatchC == 0 &&
          scored >= cnt && scored / DocsPerBatchC <= nBatches)
        Some((cnt / DocsPerBatchC).toInt)
      else {
        System.err.println(
          s"[C] inconsistent live view: postings=$cnt bm25_docs=$scored")
        None
      }
    }
    val fams: Seq[(String, () => Option[Int])] = Seq(
      ("A", byState(s"$base/deltaA", preA) _),
      ("B", byState(s"$base/deltaB", preB) _),
      ("C", () => observeC()))
    var reads, retries, violations = 0L
    val lastIdx = scala.collection.mutable.Map(fams.map(_._1 -> 0): _*)
    val stop = Paths.get(s"$base/stop")
    Files.writeString(Paths.get(s"$base/reader.ready"), "ready")
    def oneRead(name: String, observe: () => Option[Int]): Unit = {
      val st =
        try observe()
        catch { case scala.util.control.NonFatal(_) =>
          // the documented deferred-deletion bound: a reader slower
          // than one compaction interval re-resolves once.
          retries += 1
          try observe()
          catch { case scala.util.control.NonFatal(e2) =>
            violations += 1
            System.err.println(s"[$name] read failed twice: $e2")
            return
          }
        }
      reads += 1
      st match {
        case None =>
          violations += 1
          System.err.println(s"[$name] TORN READ: state matches no prefix")
        case Some(idx) if idx < lastIdx(name) =>
          violations += 1
          System.err.println(
            s"[$name] REGRESSION: index $idx after ${lastIdx(name)}")
        case Some(idx) => lastIdx(name) = idx
      }
    }
    def progress(): String =
      fams.map(f => lastIdx(f._1)).mkString(",") +
        s",$reads,$retries,$violations"
    while (!Files.exists(stop)) {
      fams.foreach { case (n, ob) => oneRead(n, ob) }
      // progress for the maintainer's final-state wait
      Files.writeString(Paths.get(s"$base/reader.progress.tmp"), progress())
      Files.move(Paths.get(s"$base/reader.progress.tmp"),
        Paths.get(s"$base/reader.progress"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    // one final validated read after the maintainer quiesced
    fams.foreach { case (n, ob) => oneRead(n, ob) }
    val fin = fams.forall { case (n, _) => lastIdx(n) == nBatches }
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
      compactEvery: Int = 4,
      srcDir: String = "/root/testdata/sf0.001"): Seq[Report] = {
    Files.createDirectories(Paths.get(base))
    // family C's scratch corpus (documents only): the positional
    // index + doc-length artifacts key on this path; prebuilt HERE so
    // the reader serves the committed version from its first read
    // (two JVMs racing the build would also be safe — the round-14
    // gate — just slower and less deterministic for the drill).
    val corpus = s"$base/servedrill-corpus"
    spark.read.parquet(s"$srcDir/documents.parquet")
      .write.parquet(s"$corpus/documents.parquet")
    graft.operators.TextAnalysis.loadOrBuildPositionalIndex(spark, corpus).count()
    graft.operators.TextAnalysis.loadOrBuildDocLengths(spark, corpus).count()
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
      val cdd = graft.operators.TextAnalysis.positionalDeltaDir(
        s"$base/servedrill-corpus")
      for (i <- 0 until nBatches) {
        batchA(spark, i).write.parquet(s"${dds.head}/batch=$i")
        DeltaLog.commit(spark, dds.head, s"batch=$i")
        batchB(spark, i).write.parquet(s"${dds(1)}/batch=$i")
        DeltaLog.commit(spark, dds(1), s"batch=$i")
        // family C: REAL positional-postings deltas, exactly the
        // frame TextStream.maintainPositional lands per batch.
        graft.operators.TextAnalysis.positionalPostings(batchCDocs(spark, i))
          .repartition(col("term"))
          .write.parquet(s"$cdd/batch=$i")
        DeltaLog.commit(spark, cdd, s"batch=$i")
        if ((i + 1) % compactEvery == 0) {
          DeltaLog.compactLive(spark, dds.head)(_.distinct())
          DeltaLog.compactLive(spark, dds(1))(_.repartition(col("key")))
          graft.operators.TextAnalysis.compactPositionalDeltas(spark,
            s"$base/servedrill-corpus", cdd)
        }
      }
      // final folds (incl. the deferred physical cleanup pass)
      DeltaLog.compactLive(spark, dds.head)(_.distinct())
      DeltaLog.compactLive(spark, dds(1))(_.repartition(col("key")))
      graft.operators.TextAnalysis.compactPositionalDeltas(spark,
        s"$base/servedrill-corpus", cdd)
      // wait until the reader OBSERVES the final state, then stop it
      deadline = System.currentTimeMillis() + 180000
      var caughtUp = false
      while (!caughtUp && System.currentTimeMillis() < deadline &&
          reader.isAlive) {
        val p = Paths.get(s"$base/reader.progress")
        if (Files.exists(p)) {
          val f = Files.readString(p).split(",")
          caughtUp = (0 to 2).forall(f(_).toInt == nBatches)
          if (f(5).toLong > 0) caughtUp = true // fail fast on violations
        }
        if (!caughtUp) Thread.sleep(100)
      }
      Files.writeString(Paths.get(s"$base/stop"), "stop")
      require(reader.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "reader did not exit after stop")
      val v = Files.readString(Paths.get(s"$base/reader.verdict")).split(",")
      val (reads, retries, violations, fin) =
        (v(0).toLong, v(1).toLong, v(2).toLong, v(3).toBoolean)
      Seq("A", "B", "C").map(f => Report(f, reads, retries, violations, fin))
    } finally {
      if (reader.isAlive) reader.destroyForcibly()
      // family C's durable artifacts key on the scratch corpus path
      // and live under the INDEX root, not `base` — sweep them so a
      // drill run leaves nothing behind anywhere.
      val idxRoot = new java.io.File(sys.env.getOrElse("GRAFT_INDEX_DIR",
        s"${sys.props("user.dir")}/target/graft-index"))
      Option(idxRoot.listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("servedrill-corpus"))
        .foreach { f =>
          try {
            val walk = Files.walk(f.toPath)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
            finally walk.close()
          } catch { case scala.util.control.NonFatal(_) => () }
        }
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
