package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusPrep, Similarity}

/** Plants an eval/train near-identical embedding pair and an
  * orthogonal control in a temp corpus: the identical train doc must
  * flag with max_cos_bp at the quantization ceiling, the orthogonal
  * one must pass clean with the -10000 sentinel — and the candidate
  * join must stay train-vs-eval (no train x train pair can flag).
  */
class SemanticDecontamSpec extends SparkTestBase {

  test("planted eval twin flags; orthogonal control passes") {
    import spark.implicits._
    val dim = Similarity.Dim
    def unit(axis: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)
    // vec 0: eval (0 % 23 == 0). vec 24: its verbatim train twin.
    // vec 25: train, orthogonal to every eval vector.
    // vec 26: train, equal to ANOTHER TRAIN vector (27) — must not
    // flag (train x train is not contamination).
    val rows = Seq(
      (0L, unit(0)), (24L, unit(0)), (25L, unit(1)),
      (26L, unit(2)), (27L, unit(2)))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-semdecon").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")

    val out = CorpusPrep.semanticDecontaminate(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set(24L, 25L, 26L, 27L))
    assert(out(24L) === ((1L, 10000L, 1L)), "verbatim twin must flag at ceiling")
    assert(out(25L) === ((0L, -10000L, 0L)), "orthogonal control must pass")
    assert(out(26L)._3 === 0L && out(27L)._3 === 0L,
      "train-train duplicates are not contamination")
  }
}
