package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Similarity
import graft.streaming.SimStream

/** Streaming IVF routing ([[SimStream]]): the corpus replayed as
  * micro-batches must land every vector in the SAME cell as the
  * batch assignment ([[Similarity.ivfCells]]), and the live
  * occupancy aggregation must converge to the batch counts.
  */
object SimStreamSpec {
  final case class ERow(vec_id: Long, embedding: Seq[Float])
}

class SimStreamSpec extends SparkTestBase {
  import spark.implicits._
  import SimStreamSpec.ERow

  test("streamed routing == batch IVF assignment; occupancy converges") {
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val (first, second) = rows.splitAt(rows.length / 2)

    val in = MemoryStream[ERow]
    val codebook = Similarity.ivfCodebook(spark, sf0001)
    val routed = SimStream.routeCells(in.toDF(), codebook)

    val route = routed.writeStream.format("memory")
      .queryName("sim_route").outputMode("append").start()
    val counts = SimStream.cellCounts(routed).writeStream.format("memory")
      .queryName("sim_counts").outputMode("complete").start()
    try {
      in.addData(first.map(r => ERow(r._1, r._2)).toIndexedSeq)
      route.processAllAvailable(); counts.processAllAvailable()
      in.addData(second.map(r => ERow(r._1, r._2)).toIndexedSeq)
      route.processAllAvailable(); counts.processAllAvailable()
    } finally { route.stop(); counts.stop() }

    val got = spark.table("sim_route").as[(Long, Long)].collect().toMap
    val want = Similarity.ivfCells(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got.size == rows.length, s"routed ${got.size} of ${rows.length}")
    assert(got == want, {
      val diff = got.collect {
        case (id, c) if want.get(id) != Some(c) => (id, c, want.get(id))
      }.take(5)
      s"stream/batch cell divergence (first 5): $diff"
    })

    val gotCounts = spark.table("sim_counts")
      .as[(Long, Long)].collect().toMap
    val wantCounts = want.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(gotCounts == wantCounts,
      s"occupancy $gotCounts != batch $wantCounts")
  }

  test("serveVectors answers streamed probes exactly like the batch form") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-simserve").toString
    // request 900: a verbatim copy of corpus vector 3 (must retrieve
    // vec 3 itself at cos = 1 — external queries see no
    // self-exclusion); request 901: a synthetic direction.
    val v3 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .where($"vec_id" === 3L).select("embedding")
      .as[Seq[Float]].head()
    val synth = (0 until 64).map(i => if (i % 7 == 0) 1.0f else -0.25f)
    val reqs = Seq(ERow(900L, v3), ERow(901L, synth))

    val in = MemoryStream[ERow]
    in.addData(reqs.toIndexedSeq)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = SimStream.serveVectors(spark, sf0001,
      in.toDF().withColumnRenamed("vec_id", "qid"), ckpt,
      (df, _) => results ++= df.as[(Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3, r._5)))
    try { q.processAllAvailable() } finally { q.stop() }

    val want = Similarity.cosineTopKAggProbes(spark, sf0001,
      reqs.toDF("qid", "embedding"), 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._5)).toSeq
    assert(results.toSeq.sorted === want.sorted)
    // the identical-copy probe finds its original first, at cos 10000.
    val top900 = results.find(r => r._1 == 900L && r._2 == 1L).get
    assert(top900._3 === 3L && top900._4 === 10000L, s"got $top900")
    assert(results.count(_._1 == 901L) === 10)
  }
}
