package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Totality of the registered text/dedup/prep pipelines on a
  * DEGENERATE corpus. The round-10 winnow crash survived the oracle
  * gate because the sf0.01 corpus contains no document in the failing
  * shape — CORRECTNESS proves value equality on the corpus it runs,
  * not totality on the corpus a 100 TB crawl will contain. This
  * suite is the missing half for every site the round-11 totality
  * refactor touched (and its neighbors): run the FULL registered
  * queries — explode pipelines, InferFiltersFromGenerate and all —
  * over documents that are empty, null, single-token, sub-k-gram,
  * NBSP-only, punctuation-only, and single-char-vocabulary, and
  * require completion. One crash here is one odd document aborting a
  * whole-corpus job in production.
  */
class DegenerateCorpusSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-degenerate").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = true)))
    def normal(tag: String, n: Int): String =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    val rows = Seq(
      Row(1L, "", "en", "srcA", 0L),                   // empty
      Row(2L, null, "en", "srcA", 0L),                 // null text
      Row(3L, "a", "en", "srcA", 1L),                  // one single-char token
      Row(4L, "a b", "en", "srcA", 3L),                // two tokens < every n
      Row(5L, "x y z", "en", "srcB", 5L),              // 3 tokens (= shingle floor)
      Row(6L, normal("d", 4), "en", "srcB", 10L),      // exactly k tokens
      Row(7L, normal("e", 7), "en", "srcB", 20L),      // the sf0.1 winnow crash shape
      Row(8L, "   ", "en", "srcC", 3L),      // NBSP-only
      Row(9L, "!!! ... ;;; ___", "en", "srcC", 15L),   // cleans to empty
      Row(10L, normal("w", 60), "en", "srcC", 200L),   // normal doc
      Row(11L, normal("w", 60) + " tail word", "en", "srcC", 210L)) // near-dup of 10
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  // every registered query below reads ONLY the documents table and
  // exercises at least one higher-order array pipeline (or sits
  // directly downstream of one of the round-11 refactored sites).
  private val queries = Seq(
    "f1_clean_documents",     // Tokenize.clean on null/NBSP/punct rows
    "text_stats",
    "text_repetition",        // grams k=2,3 (refactored site)
    "text_bigram_surprise",   // bigrams (refactored site)
    "text_fingerprint",       // shingle min-sampling (when-guarded site)
    "text_langid",
    "dedup_exact",
    "dedup_minhash_lsh",      // shingles + banding
    "dedup_span_coverage",    // docSpans n=4 (refactored site)
    "dedup_span_removed",     // docSpans n=4 (refactored site)
    "prep_decontaminate",     // ngramsOf n=5 (refactored site)
    "prep_chunks",
    "text_bpe_tokens",        // pairCounts adjacent pairs (refactored site)
    "text_winnow_fingerprints",
    "text_winnow_overlap",
    "text_winnow_screen",     // artifact build + screen on this corpus
    "text_boilerplate_lines",   // planted-page line explode on null/empty text
    "text_boilerplate_removed", // left join + per-doc rebuild on same
    "text_boilerplate_removed_indexed", // line-count artifact build on same
    "text_line_quality")      // list-function metrics on null/empty pages

  test("registered pipelines complete on empty/null/short/NBSP/punct documents") {
    val failures = queries.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", "\n"))
  }

  test("degenerate rows contribute exactly nothing where contracts say so") {
    import org.apache.spark.sql.functions.col
    // winnow: only the normal pair fingerprints (docs 1-9 are all
    // below the w-window floor).
    val fp = SparkEntry.queries("text_winnow_fingerprints")(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(fp === Set(10L, 11L))
    // the near-dup pair surfaces through the overlap sketch.
    val ov = SparkEntry.queries("text_winnow_overlap")(spark, dir).collect()
    assert(ov.exists(r => r.getLong(0) == 10L && r.getLong(1) == 11L))
    // spans: docs under n=4 cleaned tokens carry zero coverage rows
    // with n_kept == 0 conventions intact (frame stays total).
    val cov = SparkEntry.queries("dedup_span_coverage")(spark, dir)
      .where(col("doc_id") === 2L).collect()
    assert(cov.length === 1, "null-text doc must still emit its row")
  }
}
