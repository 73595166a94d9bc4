package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.TextStream

/** Positional-index delta merge (round-9 verdict #3): streamed
  * document batches land as term-clustered positional deltas, the
  * live view (base artifact ∪ deltas) serves fresh phrase results,
  * and the STALE base alone is blind to phrases that arrived via
  * deltas — the correctness failure the live view exists to prevent
  * (the table-sketch one-sidedness argument, applied to phrase
  * retrieval). Restart replays idempotently; compaction folds the
  * deltas into a fresh index equal to the live view.
  */
object PositionalDeltaSpec {
  final case class DRow(doc_id: Long, text: String, source: String)
}

class PositionalDeltaSpec extends SparkTestBase {
  import spark.implicits._
  import PositionalDeltaSpec.DRow

  private def isolatedCorpus(): String = {
    val dir = Files.createTempDirectory("graft-posdelta")
    Files.list(Paths.get(sf0001)).forEach { p =>
      Files.copy(p, dir.resolve(p.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  // a phrase that exists NOWHERE in the synthetic corpus (nonsense
  // tokens that survive Tokenize.clean unchanged).
  private val Phrase = Seq("zqxval", "qzvbet", "xvqgam")

  test("delta phrases are invisible to the stale base, served by the live view; restart + compaction") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val deltaDir = TextAnalysis.positionalDeltaDir(dir)
    val ckpt = Files.createTempDirectory("graft-posdelta-ckpt").toString

    // before any delta: the planted phrase matches nothing.
    def hits(): Seq[(Long, Long)] =
      TextAnalysis.phraseTopKBatch(spark, dir, Seq(("r1", Phrase)))
        .select("doc_id", "n_hits").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits().isEmpty)

    // batch 0: two fresh docs carry the phrase (doc 9000001 twice).
    val in = MemoryStream[DRow]
    val p = Phrase.mkString(" ")
    in.addData(
      DRow(9000000L, s"alpha $p omega", "srcX"),
      DRow(9000001L, s"$p filler words $p", "srcX"))
    val q1 = TextStream.maintainPositional(in.toDF(), deltaDir, ckpt)
    q1.processAllAvailable(); q1.stop()

    // the STALE base artifact alone has never heard of these terms —
    // the failure mode: serving it would silently miss the new docs.
    val baseTerms = TextAnalysis.loadOrBuildPositionalIndex(spark, dir)
      .where(col("term").isin(Phrase: _*)).count()
    assert(baseTerms === 0L)

    // the live view finds both docs, occurrence counts exact.
    assert(hits() === Seq((9000001L, 2L), (9000000L, 1L)))

    // the live view IS the index of the grown corpus: row-set equal
    // to recomputing positional postings over base ∪ delta docs.
    val live = TextAnalysis.positionalIndexWithDeltas(spark, dir, deltaDir)
      .collect().map(_.toString).sorted
    val deltaDocs = Seq(
      (9000000L, s"alpha $p omega", "srcX"),
      (9000001L, s"$p filler words $p", "srcX"))
      .toDF("doc_id", "text", "source")
    val full = TextAnalysis.positionalPostings(
        spark.read.parquet(s"$dir/documents.parquet").unionByName(deltaDocs, true))
      .collect().map(_.toString).sorted
    assert(live.toSeq === full.toSeq)

    // restart: a second maintainer on the same checkpoint replays
    // nothing and a new batch lands beside, not over, the first.
    in.addData(DRow(9000002L, s"coda $p", "srcX"))
    val q2 = TextStream.maintainPositional(in.toDF(), deltaDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    val dirs = new java.io.File(deltaDir).list().filter(_.startsWith("batch=")).toSet
    assert(dirs === Set("batch=0", "batch=1"), s"delta dirs: $dirs")
    assert(hits() === Seq((9000001L, 2L), (9000000L, 1L), (9000002L, 1L)))

    // delta docs are BM25-scoreable too: the live doc-length table
    // carries their exact lengths (no freshness gap between the
    // phrase path and the BM25 normalizer).
    val dls = TextAnalysis.docLengthsWithDeltas(spark, dir, deltaDir)
      .where(col("doc_id") >= 9000000L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dls === Map(9000000L -> 5L, 9000001L -> 8L, 9000002L -> 4L))

    // compaction: base + deltas folded into a fresh index that
    // row-set-equals the live view (zero-downtime swap target).
    val target = Files.createTempDirectory("graft-posdelta-compact").toString + "/ix"
    TextAnalysis.compactPositionalIndex(spark, dir, deltaDir, target)
    val compacted = spark.read.parquet(target).collect().map(_.toString).sorted
    val live2 = TextAnalysis.positionalIndexWithDeltas(spark, dir, deltaDir)
      .collect().map(_.toString).sorted
    assert(compacted.toSeq === live2.toSeq)

    // IN-DIR consolidation (round-10, the vector family's compactor
    // generalized): the two batch parts fold into one compacted part
    // WITHOUT touching the base artifact; phrase results, BM25
    // lengths, and the full live row set are unchanged through the
    // swap and through the deferred cleanup on the next invocation.
    val before = live2.toSeq
    assert(TextAnalysis.compactPositionalDeltas(spark, dir) === 2)
    assert(hits() === Seq((9000001L, 2L), (9000000L, 1L), (9000002L, 1L)))
    assert(TextAnalysis.positionalIndexWithDeltas(spark, dir, deltaDir)
      .collect().map(_.toString).sorted.toSeq === before)
    assert(TextAnalysis.docLengthsWithDeltas(spark, dir, deltaDir)
      .where(col("doc_id") >= 9000000L).count() === 3L)
    // nothing new to fold -> pure cleanup; originals gone, serving same.
    assert(TextAnalysis.compactPositionalDeltas(spark, dir) === 0)
    val partNames = new java.io.File(deltaDir).list()
      .filter(n => n.startsWith("batch=") || n.startsWith("compacted=")).toSet
    assert(partNames === Set("compacted=1"), s"parts: $partNames")
    assert(TextAnalysis.positionalIndexWithDeltas(spark, dir, deltaDir)
      .collect().map(_.toString).sorted.toSeq === before)
    // a post-fold arrival lands above the consolidation and serves.
    in.addData(DRow(9000003L, s"postfold $p", "srcX"))
    val q3 = TextStream.maintainPositional(in.toDF(), deltaDir, ckpt)
    q3.processAllAvailable(); q3.stop()
    assert(hits().toMap ===
      Map(9000001L -> 2L, 9000000L -> 1L, 9000002L -> 1L, 9000003L -> 1L))
  }

  test("indexed phrase/proximity queries serve through the live view with no deltas unchanged") {
    val dir = isolatedCorpus()
    // no delta dir exists: the live-view default must degrade to the
    // base artifact exactly (the registered queries' serving path).
    val viaLive = TextAnalysis.phraseTopKIndexed(spark, dir)
      .collect().map(_.toString).toSeq
    val derived = TextAnalysis.phraseTopK(spark, dir)
      .collect().map(_.toString).toSeq
    assert(viaLive === derived)
    val proxLive = TextAnalysis.proximityTopKIndexed(spark, dir)
      .collect().map(_.toString).toSeq
    val proxDerived = TextAnalysis.proximityTopK(spark, dir)
      .collect().map(_.toString).toSeq
    assert(proxLive === proxDerived)
  }
}
