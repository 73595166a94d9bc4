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

  test("batched phrase requests answer in one pass; absent terms stay empty") {
    import graft.operators.TextAnalysis
    // per-request parity with the single-phrase pipeline: the batch
    // shares the probe + position map, results must not change.
    val single = TextAnalysis.phraseTopK(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    val phraseTerms = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy("doc_id").limit(1)
      .select(org.apache.spark.sql.functions.split(
        graft.functions.Tokenize.clean(
          org.apache.spark.sql.functions.col("text")), " "))
      .as[Seq[String]].head().take(3)
    val got = TextAnalysis.phraseTopKBatch(spark, sf0001, Seq(
      "a" -> phraseTerms,
      "b" -> Seq("zzzznotaword", phraseTerms.head),
      "c" -> phraseTerms.take(2)))
      .as[(String, Long, Long)].collect().toSeq
    assert(got.filter(_._1 == "a").map(t => (t._2, t._3)) == single)
    // a request containing a zero-posting term matches NOTHING (the
    // absent term anchors: dropping it instead would over-match).
    assert(!got.exists(_._1 == "b"))
    assert(got.exists(_._1 == "c"))
  }

  test("streaming phrase service equals the batch pipeline per request") {
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val phrase = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy("doc_id").limit(1)
      .select(org.apache.spark.sql.functions.split(
        graft.functions.Tokenize.clean(
          org.apache.spark.sql.functions.col("text")), " "))
      .as[Seq[String]].head().take(3)

    val results = TrieMap.empty[Long, Seq[(String, Long, Long)]]
    val in = MemoryStream[(String, String)]
    in.addData(("q1", phrase.mkString(" ")), ("q2", "zzzznotaword never"))
    val q = graft.streaming.SearchStream.servePhrases(spark, sf0001,
      in.toDF().toDF("req_id", "phrase"),
      Files.createTempDirectory("graft-ps-ckpt").toString + "/c",
      (df, id) => {
        results.put(id, df.as[(String, Long, Long)].collect().toSeq); ()
      })
    q.processAllAvailable(); q.stop()
    val got = results(0L)
    val expected = TextAnalysis.phraseTopKBatch(spark, sf0001, Seq(
        "q1" -> phrase, "q2" -> Seq("zzzznotaword", "never")))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected && got.exists(_._1 == "q1") && !got.exists(_._1 == "q2"))
  }
}
