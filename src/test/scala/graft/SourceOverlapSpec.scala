package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Cross-source overlap matrix: re-derived in plain Scala from the
  * shingle lineage (set intersections over collected shingle sets —
  * a different algorithm from the engine's shingle-keyed join), plus
  * the algebraic invariants of the ratios.
  */
class SourceOverlapSpec extends SparkTestBase {

  private lazy val got =
    Dedup.sourceOverlap(spark, sf0001).collect().map { r =>
      ((r.getAs[String]("source_a"), r.getAs[String]("source_b")),
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("jaccard_bp"), r.getAs[Long]("contain_a_bp"),
          r.getAs[Long]("contain_b_bp")))
    }

  test("matrix equals set-intersection over the collected shingle sets") {
    val bySrc = Dedup.shingles(spark, sf0001)
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .select("source", "s").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (src, rows) => src -> rows.map(_._2).toSet }
    val srcs = bySrc.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (a, b) = (srcs(i), srcs(j))
      (sa, sb) = (bySrc(a), bySrc(b))
      shared = (sa intersect sb).size.toLong
      if shared > 0
    } yield ((a, b), (sa.size.toLong, sb.size.toLong, shared,
      10000 * shared / (sa.size + sb.size - shared),
      10000 * shared / sa.size, 10000 * shared / sb.size))).toMap
    assert(got.toMap === expected)
    assert(got.nonEmpty)
  }

  test("ratio invariants: containment bounds Jaccard, triangle order holds") {
    got.foreach { case ((a, b), (nA, nB, shared, jac, cA, cB)) =>
      assert(a < b, s"pair ($a, $b) not upper-triangle")
      assert(shared <= math.min(nA, nB))
      assert(jac <= math.min(cA, cB),
        s"($a, $b): jaccard $jac exceeds a containment ($cA, $cB)")
      assert(cA <= 10000 && cB <= 10000)
    }
  }
}
