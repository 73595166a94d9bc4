package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Span removal vs span coverage ([[Dedup.spanRemoved]] /
  * [[Dedup.spanCoverage]]): the two views derive from one persisted
  * span lineage and must agree exactly — the number of tokens the
  * removal cuts from a doc IS the coverage view's interval-union
  * `covered_tokens`, and removal never invents or reorders text.
  */
class DedupSpanSpec extends SparkTestBase {

  test("removed token mass == coverage interval union; clean docs keep their text") {
    val cov = Dedup.spanCoverage(spark, sf0001)
      .select("doc_id", "n_tokens", "covered_tokens")
    val rem = Dedup.spanRemoved(spark, sf0001)
    val joined = cov.join(rem.withColumnRenamed("n_tokens", "nt2"),
      Seq("doc_id")).cache()

    val bad = joined
      .where(col("n_tokens") - col("n_kept") =!= col("covered_tokens"))
      .count()
    assert(bad == 0, s"$bad docs where removal mass != coverage union")

    // a doc with zero coverage must come back verbatim (cleaned ==
    // the tokenizer's view of the original text).
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        graft.functions.Tokenize.clean(col("text")).as("orig"))
    val cleanDocs = joined.where(col("covered_tokens") === 0)
      .join(docs, Seq("doc_id"))
    val verbatim = cleanDocs.where(
      col("cleaned") =!= col("orig") && col("n_tokens") > 0).count()
    assert(verbatim == 0, s"$verbatim untouched docs altered by removal")
    assert(cleanDocs.count() > 0, "fixture needs some clean docs")
    joined.unpersist()
  }
}
