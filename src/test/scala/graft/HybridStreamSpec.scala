package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Hybrid
import graft.streaming.HybridStream

/** Hybrid serving for external requests: streamed answers equal the
  * batch request form; a request built from a corpus document's own
  * text and embedding retrieves that document first (both towers
  * agree, no self-exclusion for external requests); an all-OOV text
  * degrades to vector-only fusion instead of erroring.
  */
object HybridStreamSpec {
  final case class Req(req_id: Long, qtext: String, embedding: Seq[Float])
}

class HybridStreamSpec extends SparkTestBase {
  import spark.implicits._
  import HybridStreamSpec.Req

  private def fusedRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("streamed hybrid serving equals the batch request form") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hybserve").toString
    val doc3 = spark.read.parquet(s"$sf0001/documents.parquet")
      .where($"doc_id" === 3L).select("text").as[String].head()
    val emb3 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .where($"vec_id" === 3L).select("embedding").as[Seq[Float]].head()
    val synth = (0 until 64).map(i => if (i % 5 == 0) 0.9f else -0.2f)
    val reqs = Seq(
      Req(900L, doc3, emb3),                       // a corpus doc as a request
      Req(901L, "zzqx qqzv xxqq", synth))          // all-OOV text, live vector

    val in = MemoryStream[Req]
    in.addData(reqs.toIndexedSeq)
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long)]
    val q = HybridStream.serve(spark, sf0001, in.toDF(), ckpt,
      (df, _) => results ++= fusedRows(df))
    try { q.processAllAvailable() } finally { q.stop() }

    val want = fusedRows(Hybrid.rrfTopKRequests(spark, sf0001, reqs.toDF()))
    assert(results.toSeq === want)

    // the corpus-doc request exercises BOTH towers (rows fused from
    // text and vector ranks together), and its vector tower ranks
    // doc 3 itself first — external requests see no self-exclusion,
    // so the verbatim embedding copy hits its original at cos = 1.
    // (No such claim for the fused rank-1: BM25's length
    // normalization legitimately ranks short same-term docs above
    // the long query document itself.)
    val r900 = results.filter(_._1 == 900L)
    assert(r900.size === 20)
    assert(r900.exists(r => r._5 > 0L && r._6 > 0L))
    val vecTop = graft.operators.Similarity.cosineTopKAggProbes(spark, sf0001,
        reqs.toDF("req_id", "qtext", "embedding")
          .select($"req_id".as("qid"), $"embedding"), 10)
      .where($"qid" === 900L && $"rank" === 1L)
      .select("vec_id", "cos_bp").as[(Long, Long)].head()
    assert(vecTop === ((3L, 10000L)), s"got $vecTop")

    // the OOV request still gets a full vector-only page: every row
    // has rank_text = 0 and a live vector rank.
    val r901 = results.filter(_._1 == 901L)
    assert(r901.size === 20)
    assert(r901.forall(r => r._5 == 0L && r._6 > 0L))
  }
}
