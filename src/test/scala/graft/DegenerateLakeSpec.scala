package graft

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** [[DegenerateCorpusSpec]] generalized beyond the documents table
  * (round-11 verdict #1): the round-10 winnow crash survived the
  * oracle gate because the synthetic corpus contains no document in
  * the failing shape — and the same blind spot covers every OTHER
  * table family. This suite runs EVERY registered query over two
  * adversarial lakes:
  *
  *  - a MIXED lake where every table carries the shapes a real crawl
  *    will contain — null event timestamps/values/types, malformed
  *    props JSON, duplicate event ids, null/zero-norm/empty/NaN
  *    embedding vectors, null names and segments in the catalog
  *    tables, orphan foreign keys, duplicate query-table rows, the
  *    degenerate document shapes (which also feed the synthesized
  *    media blobs: null text means null payloads at the codec seam) —
  *    plus a minimal normal core so joins and aggregations stay
  *    exercised;
  *  - an EMPTY lake (all ten tables, zero rows, exact schemas) — the
  *    day-one deployment / empty-partition shape.
  *
  * Every query must COMPLETE (the totality contract), except the
  * pinned loud refusals below. One crash here is one odd row aborting
  * a whole-corpus job in production.
  */
class DegenerateLakeSpec extends SparkTestBase {

  import DegenLake._

  private lazy val dirMixed: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-deglake-mixed").toString
    DegenLake.writeLake(spark, d, mixed = true)
    d
  }

  private lazy val dirEmpty: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-deglake-empty").toString
    DegenLake.writeLake(spark, d, mixed = false)
    d
  }


  /** Queries whose DOCUMENTED contract legitimately refuses one of
    * these lakes, pinned with a required message fragment so the
    * refusal stays LOUD and diagnostic (a silent wrong answer or an
    * opaque internal error would not match). Keyed (lake, query).
    */
  private val expectedRefusals: Map[(String, String), String] = Map.empty

  private def runAll(lake: String, dir: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch {
          case e: Throwable =>
            val msg = causeChain(e)
            expectedRefusals.get((lake, name)) match {
              case Some(frag) if msg.contains(frag) => None
              case _ => Some(s"$name: ${msg.take(300)}")
            }
        }
    }
    assert(failures.isEmpty,
      s"\n$lake lake failures:\n" + failures.mkString("\n") + "\n")
  }

  private def causeChain(e: Throwable): String = {
    val parts = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .take(4).map(t => s"${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage)}")
    parts.mkString(" <- ")
  }

  test("every registered query completes on the mixed degenerate lake") {
    runAll("mixed", dirMixed)
  }

  test("every registered query completes on the empty lake") {
    runAll("empty", dirEmpty)
  }

  test("degenerate rows land exactly where the contracts say") {
    import org.apache.spark.sql.functions.col
    // vector ingest door: of the 26 corpus rows, exactly the 22
    // finite 64-dim nonzero vectors are admitted; zero-norm, null,
    // empty-array and NaN rows are dropped at the door.
    val admitted = graft.operators.Similarity.quantized(spark, dirMixed)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(admitted === ((0L to 21L).toSet + -5L))
    // events: the NaN value behaves as null — its (window, type)
    // group still counts the events but sums no cents (2024-01-04
    // 00:00 UTC holds exactly the duplicated NaN 'view' event pair).
    val tumb = SparkEntry.queries("events_tumbling_hourly")(spark, dirMixed)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r)
      .toMap
    val nanRow = tumb((1704326400L, "view"))
    assert(nanRow.getLong(2) === 2L && nanRow.isNullAt(3))
    // ... while a clean hour sums exactly (10:00 purchase = 9900c).
    val okRow = tumb((1704103200L, "purchase"))
    assert(okRow.getLong(2) === 1L && okRow.getLong(3) === 9900L)
    // media decode: the null-payload doc (null text) yields NO frames.
    val frameDocs = SparkEntry.queries("mm_frames")(spark, dirMixed)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!frameDocs.contains(2L) && frameDocs.contains(1L))
    // hybrid fusion over the EMPTY corpus: an empty frame with the
    // registered schema, not a crash and not a fabricated query doc.
    val fusedEmpty = SparkEntry.queries("search_hybrid_rrf")(spark, dirEmpty)
    assert(fusedEmpty.collect().isEmpty && fusedEmpty.columns.nonEmpty)
  }

  test("a wrong-dimension vector is dropped at both ingest doors") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, (0 until 63).map(_.toFloat / 64), 0), // truncated
        Row(101L, (0 until 65).map(_.toFloat / 64), 1), // overlong
        Row(102L, (0 until 64).map(i => (i + 1).toFloat / 64), 2)), 1),
      DegenLake.embeddingsSchema)
    // stream door: only the well-formed 64-dim arrival routes.
    val routed = graft.streaming.SimStream.routeCells(
        junk.withColumnRenamed("vec_id", "vec_id"),
        graft.operators.Similarity.ivfCodebook(spark, dirMixed))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(routed === Set(102L))
  }
}

