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

  test("rightmost tie rule: an all-equal-grams doc selects each window's last slot") {
    val docs = Seq((9L, Seq.fill(12)("same").mkString(" "))).toDF("doc_id", "text")
    // 12 tokens, k=4 -> 9 identical grams; windows j=1..5 all tie ->
    // rightmost = j+w-1 -> positions 5..9 exactly.
    val pos = TextAnalysis.winnowOf(docs, k, w)
      .select("pos").as[Long].collect().sorted.toSeq
    assert(pos === Seq(5L, 6L, 7L, 8L, 9L))
  }
}
