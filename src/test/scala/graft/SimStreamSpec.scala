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
}
