package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product-quantization contracts ([[Similarity.pqCodebook]] /
  * [[Similarity.pqCodes]] / [[Similarity.pqTopK]]): the compressed
  * representation is exactly M codes per vector into a live
  * codebook, and the pipeline's EMITTED scores are exact — the
  * approximation is allowed to cost recall (what `sim_pq_recall`
  * measures), never to corrupt a returned score.
  */
class PqSpec extends SparkTestBase {

  test("every vector carries exactly M codes, each into a live centroid") {
    val codes = Similarity.pqCodes(spark, sf0001)
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(codes.count() == n * Similarity.PqSubspaces)
    val perVec = codes.groupBy("vec_id").agg(countDistinct("m").as("nm"))
      .where(col("nm") =!= Similarity.PqSubspaces).count()
    assert(perVec == 0, "a vector missing a subspace code")
    // referential integrity: every (m, code) resolves in the codebook.
    val book = Similarity.pqCodebook(spark, sf0001)
      .select(col("m"), col("cent_id").as("code"))
    val dangling = codes.join(book, Seq("m", "code"), "left_anti").count()
    assert(dangling == 0, "code points at a dropped/unknown centroid")
    // K is an upper bound, not a promise: empty cells drop.
    assert(book.count() <= Similarity.PqSubspaces.toLong * Similarity.PqCents)
  }

  test("emitted top-k scores are exact (re-rank uses true vectors)") {
    val got = Similarity.pqTopK(spark, sf0001, k = 5)
      .select("qid", "vec_id", "dot_q", "cos_bp")
    // recompute each returned pair's score from the raw vectors via
    // the independent HOF dot product formulation.
    val base = Similarity.quantized(spark, sf0001)
    val mismatches = got
      .join(base.select(col("vec_id").as("qid"), col("q").as("pq"), col("nq").as("pnq")), Seq("qid"))
      .join(base, Seq("vec_id"))
      .withColumn("dot2", expr(
        "aggregate(zip_with(pq, q, (x, y) -> x * y), 0L, (a, v) -> a + v)"))
      .withColumn("cos2", floor(lit(Similarity.QuantScale) *
        col("dot2").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("pnq").cast("double"))))
        .cast("long"))
      .where(col("dot2") =!= col("dot_q") || col("cos2") =!= col("cos_bp"))
      .count()
    assert(mismatches == 0, s"$mismatches pairs with non-exact emitted scores")
  }
}
