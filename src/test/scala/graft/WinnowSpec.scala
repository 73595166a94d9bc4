package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Winnowing fingerprints: the paper's two guarantees pinned —
  * (1) DETECTION: documents sharing a token run of length >= w+k-1
  * share at least one selected fingerprint hash; (2) DENSITY: the
  * selection is a strict subset of grams, bounded by the window
  * count; plus the rightmost-tie rule on an all-equal-grams doc.
  */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private val (k, w) = (4, 5)

  test("a shared run of w+k-1 tokens guarantees a shared fingerprint") {
    // 8 = w+k-1 shared tokens embedded in otherwise-disjoint salads.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three four five six $shared red blue green"),
      (2L, s"cat dog bird fish $shared pink teal lime brown aqua"),
      (3L, "only unrelated words appear here nothing matches anything else at all"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowOf(docs, k, w)
      .select("doc_id", "fp").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert((fp(1L) intersect fp(2L)).nonEmpty,
      "w+k-1 shared tokens must yield a shared fingerprint")
    assert((fp(1L) intersect fp(3L)).isEmpty)
    assert((fp(2L) intersect fp(3L)).isEmpty)
  }

  test("density: selections are a strict, bounded subset of grams") {
    val sel = TextAnalysis.winnowFingerprints(spark, sf0001, k, w)
      .groupBy("doc_id").agg(count(lit(1)).as("n_fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sel.nonEmpty)
    val grams = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        (size(split(graft.functions.Tokenize.clean(col("text")), " ")) - k + 1)
          .cast("long").as("m"))
      .where(col("m") - w + 1 >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sel.foreach { case (d, n) =>
      val windows = grams(d) - w + 1
      assert(n <= windows, s"doc $d selected $n > $windows windows")
      assert(n < grams(d), s"doc $d selected every gram — no compression")
    }
    // aggregate density lands in the ~2/(w+1) regime (loose x2 band:
    // word-salad hash order is effectively random).
    val density = sel.values.sum.toDouble /
      sel.keys.toSeq.map(grams).sum.toDouble
    assert(density > 1.0 / (w + 1) / 2 && density < 4.0 / (w + 1),
      s"density $density out of regime for w=$w")
  }

  test("sub-w-gram docs survive the full registered pipeline (InferFiltersFromGenerate hoist)") {
    // Round-10 bench crash: explode(sel) lets Catalyst infer
    // `size(sel) > 0` and copy the inlined sel expression BELOW the
    // `.where` guard, where codegen evaluates it eagerly on short
    // docs (sequence(1, 0) flips descending -> element_at OOB under
    // ANSI). Exercise docs of 0 / <k / 1 / w-1 / w grams through the
    // REGISTERED queries (winnowOf called directly does not reproduce
    // the hoist on all paths) — the expressions must be total.
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-short").toString
    def words(n: Int) = (1 to n).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, ""),                      // 0 tokens
      (2L, words(k - 1)),            // < k tokens: gram count "negative"
      (3L, words(k)),                // exactly 1 gram
      (4L, words(k + w - 3)),        // w-2 grams
      (5L, words(k + w - 2)),        // w-1 grams: the sf0.1 crash shape
      (6L, words(k + w - 1)),        // w grams: exactly one window
      (7L, words(3 * (k + w))))      // a doc long enough to select
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = SparkEntry.queries("text_winnow_fingerprints")(spark, dir).collect()
    val perDoc = fp.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // docs 1..5 are below the w-window floor -> contribute nothing;
    // doc 6 has exactly one window -> exactly one selection.
    (1L to 5L).foreach(d => assert(!perDoc.contains(d), s"doc $d must select nothing"))
    assert(perDoc(6L) === 1)
    assert(perDoc(7L) >= 1)
    // the overlap query runs the same lineage through a self-join.
    SparkEntry.queries("text_winnow_overlap")(spark, dir).collect()
  }

  test("durable winnow sketch: incremental screening, artifact equality, staleness rebuild") {
    import org.apache.spark.sql.functions.{length => slen}
    // isolated corpus copy: the staleness rung rewrites documents.parquet.
    val d = java.nio.file.Files.createTempDirectory("graft-winnow-sketch")
    java.nio.file.Files.list(java.nio.file.Paths.get(sf0001)).forEach { p =>
      java.nio.file.Files.copy(p, d.resolve(p.getFileName.toString),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val dir = d.toString
    val sketch = TextAnalysis.loadOrBuildWinnowSketch(spark, dir)
    // the artifact is exactly the derived distinct (doc_id, fp) set.
    val derived = TextAnalysis.winnowFingerprints(spark, dir, k, w)
      .select("doc_id", "fp").distinct()
    assert(sketch.exceptAll(derived).count() === 0L)
    assert(derived.exceptAll(sketch).count() === 0L)
    // a FRESH-id crawl doc re-crawling a corpus doc's text verbatim
    // surfaces against the sketch; a same-length word salad does not.
    val victim = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy(slen(col("text")).desc, col("doc_id")).limit(1)
      .select("doc_id", "text").head()
    val crawl = Seq(
      (9900001L, victim.getString(1)),
      (9900002L, (1 to 40).map(i => s"zqx$i").mkString(" ")))
      .toDF("doc_id", "text")
    val hits = TextAnalysis.winnowScreenOf(crawl, sketch).collect()
    assert(hits.exists(r => r.getLong(0) == 9900001L &&
      r.getLong(1) == victim.getLong(0) && r.getLong(2) >= 3L),
      s"verbatim re-crawl must screen out: ${hits.mkString(", ")}")
    assert(!hits.exists(_.getLong(0) == 9900002L),
      "word salad must share nothing")
    // the registered artifact-served demo equals the artifact-free
    // derivation (what the DuckDB oracle recomputes).
    val served = SparkEntry.queries("text_winnow_screen")(spark, dir).collect().toSeq
    val free = TextAnalysis.winnowScreenOf(
      spark.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 20 === 7), derived).collect().toSeq
    assert(served === free)
    // staleness: rewriting the documents source invalidates the
    // content fingerprint; the sketch rebuild sees the new doc.
    val grown = spark.read.parquet(s"$dir/documents.parquet")
      .unionByName(Seq((777777L, (1 to 30).map(i => s"fresh$i").mkString(" "),
        "en", "srcW", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(grown.toSeq),
        spark.read.parquet(s"$dir/documents.parquet").schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rebuilt = TextAnalysis.loadOrBuildWinnowSketch(spark, dir)
    assert(rebuilt.where(col("doc_id") === 777777L).count() > 0L,
      "stale sketch served after the corpus was rewritten")
  }

  test("rightmost tie rule: an all-equal-grams doc selects each window's last slot") {
    val docs = Seq((9L, Seq.fill(12)("same").mkString(" "))).toDF("doc_id", "text")
    // 12 tokens, k=4 -> 9 identical grams; windows j=1..5 all tie ->
    // rightmost = j+w-1 -> positions 5..9 exactly.
    val pos = TextAnalysis.winnowOf(docs, k, w)
      .select("pos").as[Long].collect().sorted.toSeq
    assert(pos === Seq(5L, 6L, 7L, 8L, 9L))
  }
}
