package graft

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.JoinSearch
import graft.sources.IndexBuilder
import graft.streaming.SearchStream

/** Streaming search service end to end: two request batches arrive
  * over MemoryStream; each batch's ranked result must equal the batch
  * engine's answer for the same query table over the same index.
  */
class SearchStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("per-batch streaming results equal the batch engine's") {
    implicit val sqlCtx = spark.sqlContext
    val cols = Seq("c_name", "c_mktsegment")
    val index = IndexBuilder.cached(spark, sf0001)
    val batch1 = Seq(("Customer#000000004", "MACHINERY"))
    val batch2 = Seq(("Customer#000000007", "AUTOMOBILE"),
      ("no such name", "nope"))

    val results = TrieMap.empty[Long, Seq[(Int, Long)]]
    val in = MemoryStream[(String, String)]
    def run(): Unit = {
      val q = SearchStream.serve(
        index, in.toDF().toDF(cols: _*), cols,
        Files.createTempDirectory("graft-ss-ckpt").toString + "/c",
        (df, id) => { results.put(id, df.as[(Int, Long)].collect().toSeq); () })
      q.processAllAvailable(); q.stop()
    }
    // two AvailableNow runs over one checkpoint is two batches; but a
    // fresh checkpoint per run keeps batch ids 0-based per request —
    // here each run uses its own checkpoint dir, so ids are 0 then 0;
    // disambiguate by draining one batch per run into the map key.
    in.addData(batch1: _*)
    run()
    val r1 = results.remove(0L).get
    in.addData(batch2: _*)
    run()
    val r2 = results.remove(0L).get

    def expected(rows: Seq[(String, String)]) =
      JoinSearch.searchTables(index, rows.toDF(cols: _*), cols)
        .as[(Int, Long)].collect().toSeq
    assert(r1 == expected(batch1))
    // second run re-reads ALL available data (fresh checkpoint):
    assert(r2 == expected(batch1 ++ batch2))
    assert(r1.nonEmpty && r2.nonEmpty)
  }
}
