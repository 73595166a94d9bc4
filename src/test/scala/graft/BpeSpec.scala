package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Pins the BPE trainer's semantics on hand-computed fixtures: the
  * exact merge sequence across generations (merged symbols
  * re-merging), greedy left-to-right non-overlap of the literal
  * replace (the framing-delimiter argument), the deterministic
  * count-then-lexicographic tie-break, and vocabulary-exhaustion
  * passthrough (rounds past exhaustion emit no merge row and leave
  * the vocab intact).
  */
class BpeSpec extends SparkTestBase {

  private def docsOf(texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def uniq(name: String) = s"spec:$name:${System.nanoTime()}"

  test("merge sequence across generations is the hand-computed one") {
    // words: aaab x4, ab x2.
    // r1: (a,a)=8 beats (a,b)=6 -> aa.  aaab => [aa, a, b] (greedy).
    // r2: (a,b)=6 beats (aa,a)=4 -> ab.  aaab => [aa, ab].
    // r3: (aa,ab)=4 -> aaab (a 3rd-generation symbol from two merged ones).
    // r4+: single-symbol words only -> no pairs, no rows.
    val docs = docsOf("aaab aaab ab", "aaab aaab ab")
    val m = Bpe.mergesOf(spark, docs, n = 5, tag = uniq("gen"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq === Seq(
      (1L, "a", "a", "aa", 8L),
      (2L, "a", "b", "ab", 6L),
      (3L, "aa", "ab", "aaab", 4L)))
  }

  test("greedy left-to-right: bbbb collapses to two bb, not three") {
    // one word bbbb: (b,b) counted 3 times, but the merge applies
    // left-to-right non-overlapping: [bb, bb].
    val docs = docsOf("bbbb")
    val v = Bpe.vocabOf(spark, docs, n = 1, tag = uniq("greedy"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(v.toSeq === Seq(("bbbb", 2L)))
  }

  test("tie-break is lexicographic on (a, b) at equal count") {
    // ab and cd each once: (a,b)=1 ties (c,d)=1 -> (a,b) wins round 1.
    val docs = docsOf("ab cd")
    val m = Bpe.mergesOf(spark, docs, n = 1, tag = uniq("tie"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(m.toSeq === Seq(("a", "b")))
  }

  test("exhaustion passthrough: token counts survive extra rounds") {
    // after 'ab' merges (round 1), vocab is single-symbol; rounds 2-4
    // must change nothing (the left-join-on-true guard) rather than
    // annihilate the vocab through an empty cross join.
    val docs = docsOf("ab ab")
    val v = Bpe.vocabOf(spark, docs, n = 4, tag = uniq("exhaust"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.toSeq === Seq(("ab", 2L, 1L)))
  }

  test("doc token accounting matches per-word counts") {
    // 'aaab ab' after 3 merges: aaab -> 1 token, ab -> 1 token.
    // With n=1 (only aa trained): aaab = [aa, a, b] = 3, ab = [a, b] = 2.
    val docs = docsOf("aaab aaab ab", "aaab aaab ab")
    val tag = uniq("tok")
    val vocab = Bpe.vocabOf(spark, docs, n = 1, tag = tag).drop("wc")
    val toks = docs
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .join(vocab, Seq("word"))
      .groupBy("doc_id").agg(sum("n_tok").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(toks === Map(0L -> 8L, 1L -> 8L)) // 3 + 3 + 2 per doc
  }

  test("segmentations concatenate back to their word; ids are a lexicographic bijection") {
    val docs = docsOf("aaab aaab ab", "aaab aaab ab")
    val segs = Bpe.segmentsOf(spark, docs, n = 1, tag = uniq("seg"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    // n=1 trains only 'aa': aaab -> [aa, a, b], ab -> [a, b]
    assert(segs === Map("aaab" -> Seq("aa", "a", "b"), "ab" -> Seq("a", "b")))
    // lossless: symbols rebuild the exact word (no chars dropped or
    // invented by the framing/unframing round trip)
    segs.foreach { case (w, ss) => assert(ss.mkString === w) }
  }

  test("row-local replace chain segments OOV words the join path cannot see") {
    // trained merges: [(a,a)] (n=1 on the aaab/ab fixture). An
    // unseen word must segment by the same rule — aa pairs collapse,
    // everything else stays characters.
    val out = spark.range(1).select(
      Bpe.segmentExpr(lit("aazaa"), Seq(("a", "a"))).as("syms"),
      Bpe.segmentExpr(lit("zqx"), Seq(("a", "a"))).as("untouched"),
      Bpe.segmentExpr(lit("aaab"), Seq(("a", "a"))).as("corpus"))
      .head()
    assert(out.getSeq[String](0) === Seq("aa", "z", "aa"))
    assert(out.getSeq[String](1) === Seq("z", "q", "x"))
    // matches the trainer's own segmentation of a corpus word
    assert(out.getSeq[String](2) === Seq("aa", "a", "b"))
  }

  test("runtime twin equals the vocabulary-join path row for row") {
    val a = Bpe.tokenIds(spark, sf0001, docMod = 125).collect().toSeq
    val b = Bpe.tokenIdsRowLocal(spark, sf0001, docMod = 125).collect().toSeq
    assert(a === b)
  }

  test("packed static-call segmentation equals the expression chain, incl. OOV and at large merge counts") {
    import spark.implicits._
    val merges = Seq(("a", "a"), ("aa", "b"), ("c", "d"))
    val words = Seq("aaab", "ab", "aazaa", "zq", "cdcd", "aacd", "x")
      .toDF("word")
    val both = words.select(
      col("word"),
      Bpe.segmentExpr(col("word"), merges).as("chain"),
      Bpe.segmentExprPacked(col("word"), merges).as("packed"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"chain != packed for ${r.getString(0)}")
    }
    // a merge list at a size the chain form could never plan: the
    // packed call stays one node and still applies rank order.
    val big = (0 until 20000).map(i => (s"q$i", s"q$i")) :+ ("a", "a")
    val out = spark.range(1)
      .select(Bpe.segmentExprPacked(lit("aab"), big).as("s")).head()
    assert(out.getSeq[String](0) === Seq("aa", "b"))
  }

  test("runtime token ids keep OOV symbols at the reserved unk id, positions intact") {
    // corpus text has no 'q' or 'x' single-char symbols guaranteed?
    // build the assertion from data: find a symbol absent from the
    // trained table and synthesize via the same pipeline pieces.
    import spark.implicits._
    val ids = Bpe.tokenIdTable(spark, sf0001)
    val m = Bpe.mergePairs(spark, sf0001)
    val probe = Seq((1L, "zzzzqqqq kxj")).toDF("doc_id", "text")
    val out = probe
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .as(Seq("wpos", "word")))
      .withColumn("syms", Bpe.segmentExprPacked(col("word"), m))
      .select(col("doc_id"), col("wpos"),
        posexplode(col("syms")).as(Seq("spos", "symbol")))
      .join(broadcast(ids), Seq("symbol"), "left")
      .select(col("wpos"), col("spos"), col("symbol"),
        coalesce(col("tok_id"), lit(Bpe.UnkId)).as("tok_id"))
      .collect()
    // every emitted symbol keeps its position row — nothing vanishes
    val byWord = out.groupBy(_.getAs[Int]("wpos"))
    byWord.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("spos")).sorted.toSeq === (0 until rs.length))
    }
    // at least one symbol of this alien text is OOV -> unk id, and
    // unk never collides with a trained id
    val unks = out.filter(_.getAs[Long]("tok_id") == Bpe.UnkId)
    assert(out.nonEmpty)
    assert(ids.where(col("tok_id") === Bpe.UnkId).count() === 0L)
    assert(unks.nonEmpty || out.forall(_.getAs[Long]("tok_id") > 0L))
  }

  test("segmentExpr tokenizes a live stream row-locally, no corpus join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val tokenized = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .as(Seq("wpos", "word")))
      .withColumn("syms", Bpe.segmentExpr(col("word"), Seq(("a", "a"))))
    // stateless select — streamable as-is; OOV words ("zz") segment
    // by the same shipped-merges rule with no lookup anywhere.
    val q = tokenized.writeStream.format("memory")
      .queryName(s"bpetok${System.nanoTime()}").outputMode("append").start()
    in.addData((1L, "aaab zz"))
    q.processAllAvailable()
    val name = q.name
    q.stop()
    val out = spark.table(name).orderBy("wpos").collect()
      .map(r => (r.getAs[String]("word"), r.getSeq[String](3))).toSeq
    assert(out === Seq(("aaab", Seq("aa", "a", "b")), ("zz", Seq("z", "z"))))
  }

  test("token-id sequences are the trained segmentation in document order") {
    val out = Bpe.tokenIds(spark, sf0001, docMod = 125)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // positions are dense and ordered per (doc, word)
    val byDocWord = rows.groupBy(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("wpos")))
    byDocWord.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("spos")).sorted.toSeq ===
        (0L until rs.length).toSeq)
    }
    // id assignment is injective and consistent symbol<->id
    val pairs = rows.map(r =>
      (r.getAs[String]("symbol"), r.getAs[Long]("tok_id"))).distinct
    assert(pairs.map(_._1).distinct.length === pairs.length)
    assert(pairs.map(_._2).distinct.length === pairs.length)
    // reassembling a word's symbols reproduces a corpus word (spot:
    // every (doc, word) concat appears in the raw pretokenized text)
    val sample = byDocWord.take(5)
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "regexp_extract_all(lower(text), '[a-z]+', 0) as ws")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    sample.foreach { case ((d, wp), rs) =>
      val word = rs.sortBy(_.getAs[Long]("spos")).map(_.getAs[String]("symbol")).mkString
      assert(raw(d)(wp.toInt) === word)
    }
  }
}
