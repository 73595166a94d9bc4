package graft

import graft.operators.TextAnalysis

/** Invariant checks for the text-analysis family on sf0.001 (oracle
  * parity is the driver's gate; these cover structural properties).
  */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("stats: ratios bounded, counts consistent") {
    val s = TextAnalysis.stats(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(s.nonEmpty)
    for ((_, nChars, nWs, nRe, nClean, nAlpha, nDigit, swHits, swBp) <- s) {
      assert(swBp >= 0 && swBp <= 10000)
      assert(swHits <= nWs)
      assert(nAlpha + nDigit <= nChars)
      assert(nRe >= nWs - 1, "regex tokens at least cover the words")
      assert(nClean <= nWs, "cleaning never adds tokens")
    }
  }

  test("quality_pass is the conjunction of its flags") {
    val f = TextAnalysis.qualityFlags(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(f.forall { case (_, a, b, c, p) => p == a * b * c })
    assert(f.exists(_._5 == 1L) && f.exists(_._5 == 0L), "thresholds split the corpus")
  }

  test("top terms: k per lang, df non-increasing") {
    val t = TextAnalysis.topTerms(spark, sf0001, k = 5)
      .as[(String, Long, String, Long)].collect()
    val byLang = t.groupBy(_._1)
    assert(byLang.nonEmpty)
    for ((_, rows) <- byLang) {
      assert(rows.length == 5)
      val ranked = rows.sortBy(_._2)
      assert(ranked.map(_._4).toSeq == ranked.map(_._4).sortBy(-_).toSeq)
    }
  }

  test("repetition: exact gram fractions on a hand-built doc") {
    // cleaned tokens: x y x y z (x/y/z survive the stopword pass)
    val d = Seq((1L, "x y x y z"), (2L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionOf(d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 2-grams: {x y: 2, y x: 1, y z: 1} -> top 2/4, dup 2/4
    // 3-grams: all 3 distinct -> top 1/3, dup 0
    // doc 2: a single token -> no rows at all
    assert(got == Seq(
      (1L, 2L, 4L, 2L, 2L, 5000L, 5000L),
      (1L, 3L, 3L, 1L, 0L, 3333L, 0L)), s"got $got")
  }

  test("fingerprints: one per doc with >= 1 shingle, fixed arity") {
    val fp = TextAnalysis.fingerprints(spark, sf0001).as[(Long, String)].collect()
    assert(fp.nonEmpty)
    assert(fp.map(_._1).distinct.length == fp.length)
    // 4 hashes of 32 hex chars + 3 separators, when the doc has >= 4 shingles
    assert(fp.count(_._2.length == 4 * 32 + 3) > fp.length / 2)
  }

  test("bm25: tf raises and length-normalization lowers the rank") {
    // query doc (min doc_id) supplies the terms: apple banana cherry
    val d = Seq(
      (0L, "apple banana cherry"),
      (1L, "apple apple apple banana cherry pear plum"),  // tf(apple)=3, dl=7
      (2L, "apple banana cherry pear plum fig date"),     // tf=1 each,  dl=7
      (3L, "apple banana cherry " + Seq.fill(20)("noise").mkString(" ")), // dl=23
      (4L, "noise words only"))                           // no query term
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopKOf(d, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val score = got.map(g => g._1 -> g._3).toMap
    // doc 4 matches no term and is absent; the others match all 3
    assert(got.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    assert(got.filter(_._1 != 4L).forall(_._2 == 3L))
    assert(score.values.forall(_ > 0L))
    // same dl, higher tf wins; same tf, shorter dl wins
    assert(score(1L) > score(2L), s"tf saturation: $score")
    assert(score(2L) > score(3L), s"length normalization: $score")
    // output is rank-ordered (score desc, doc_id asc)
    assert(got == got.sortBy(g => (-g._3, g._1)))
  }

  test("phrase: exact adjacency, overlap counting, repeated-term phrases") {
    // query doc (min doc_id) supplies the phrase: "red fox runs"
    val d = Seq(
      (0L, "red fox runs"),
      (1L, "the red fox runs far and red fox runs again"), // 2 hits
      (2L, "red fox walks then red fox runs"),             // 1 hit (first is not the phrase)
      (3L, "fox red runs"),                                // right terms, wrong order
      (4L, "red fox"),                                     // truncated phrase
      (5L, "runs red and fox elsewhere"))                  // terms never adjacent
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseTopKOf(d, n = 3, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (0L, 1L), (2L, 1L)), s"got $got")

    // a phrase with a REPEATED term ("ho ho hey"): the anchor dedup
    // and the per-offset verify must not confuse the two 'ho's.
    val r = Seq(
      (0L, "ho ho hey"),
      (1L, "ho hey ho ho hey"),   // one hit at position 3
      (2L, "ho hey ho hey"))      // no hit
      .toDF("doc_id", "text")
    val got2 = TextAnalysis.phraseTopKOf(r, n = 3, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got2 == Seq((0L, 1L), (1L, 1L)), s"got $got2")

    // self-overlapping phrase occurrences count per start position:
    // "ab ab ab ab" contains "ab ab" at 3 starts.
    val o = Seq((0L, "ab ab"), (1L, "ab ab ab ab"))
      .toDF("doc_id", "text")
    val got3 = TextAnalysis.phraseTopKOf(o, n = 2, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got3 == Seq((1L, 3L), (0L, 1L)), s"got $got3")
  }

  test("indexed phrase probe pushes the term literals into the parquet scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = TextAnalysis.phraseTopKIndexed(spark, sf0001)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("-positional")) => f
    }
    assert(scans.nonEmpty, "no scan of the positional index found")
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("In(term"),
      s"phrase terms not pushed into the scan: $pushed")
    // and the indexed form is row-identical to the derived form.
    val a = df.as[(Long, Long)].collect().toSeq
    val b = TextAnalysis.phraseTopK(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("pii redaction: emails before ips, globals, clean text untouched") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (0L, "mail a@b.co and c.d+x@e-f.org twice"),     // 2 emails
      (1L, "hosts 10.0.0.1 and 192.168.255.3 here"),   // 2 ips
      (2L, "mixed u@h.io at 8.8.8.8"),                 // one of each
      (3L, "nothing sensitive at all"))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(0L) == "mail <EMAIL> and <EMAIL> twice")
    assert(got(1L) == "hosts <IP> and <IP> here")
    assert(got(2L) == "mixed <EMAIL> at <IP>")
    assert(got(3L) == "nothing sensitive at all")
  }

  test("proximity: window gating, min distance, density ranking") {
    // query terms from doc 0: "red" and "fox" (first two distinct).
    // Fillers avoid the cleaner's stopword list — cleaning DROPS
    // stopwords, so positions are post-clean token positions.
    val d = Seq(
      (0L, "red fox red fox"),                    // min 1, dense
      (1L, "red gap1 gap2 gap3 fox"),             // dist 4 <= 5 -> kept
      (2L, "red g1 g2 g3 g4 g5 fox"),             // dist 6 > 5 -> dropped
      (3L, "fox later comes red"),                // dist 3, order-insensitive
      (4L, "red only here"),                      // one term -> dropped
      (5L, "nothing relevant"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.proximityTopKOf(d, window = 5, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // doc0: pa=[1,3], pb=[2,4] -> dists {1,3,1,1(?)}: |1-2|=1,|1-4|=3,
    // |3-2|=1,|3-4|=1 -> min 1, n_within 4.
    assert(got.map(_._1) == Seq(0L, 3L, 1L), s"got $got")
    assert(got.head == (0L, 1L, 4L), s"got ${got.head}")
    assert(got.find(_._1 == 1L).get._2 == 4L)
    assert(got.find(_._1 == 3L).get._2 == 3L)

    // the engine must agree with itself about cleaning: a stopword
    // between the terms does NOT add distance (it never survives
    // into the positional postings).
    val s = Seq((0L, "red fox"), (1L, "red of the and fox"))
      .toDF("doc_id", "text")
    val got2 = TextAnalysis.proximityTopKOf(s, window = 1, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got2.map(_._1).toSet == Set(0L, 1L), s"got $got2")
  }
}
