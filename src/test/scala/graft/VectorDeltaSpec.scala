package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.SimStream

/** Searchable-vector deltas (the positional-delta pattern on the
  * vector side): streamed embeddings quantize + route against the
  * durable codebook and land as full serving rows, the live views
  * (quantized/cells + deltas) make them candidates immediately, and
  * the STALE base path is blind to them until the next corpus
  * re-encode — the failure the live view exists to prevent. Replay
  * is idempotent (batch-keyed overwrite).
  */
object VectorDeltaSpec {
  final case class VRow(vec_id: Long, embedding: Seq[Float])
}

class VectorDeltaSpec extends SparkTestBase {
  import spark.implicits._
  import VectorDeltaSpec.VRow

  private def isolatedCorpus(): String = {
    val dir = Files.createTempDirectory("graft-vecdelta")
    Files.list(Paths.get(sf0001)).forEach { p =>
      Files.copy(p, dir.resolve(p.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  test("streamed vectors become live candidates; the stale base path misses them") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val ckpt = Files.createTempDirectory("graft-vecdelta-ckpt").toString

    // a delta vector CLONING corpus vector 7's embedding: its nearest
    // neighbor is unambiguous (cos = 1) and it must join vector 7's
    // cell by routing determinism.
    val clone = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") === 7L).head().getSeq[Float](1)
    val in = MemoryStream[VRow]
    in.addData(VRow(9000007L, clone))
    val q = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q.processAllAvailable(); q.stop()

    // the stale base path serves WITHOUT the arrival (the failure
    // mode: a probe in vector 7's cell never sees the clone)...
    val baseIds = Similarity.ivfProbe(spark, dir, k = 500, probeMod = 7)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!baseIds.contains(9000007L))

    // ...while the live path retrieves it at exact cos = 1, ranked
    // first for probe 7 (tie-break favors no lower-id perfect match).
    val live = Similarity.ivfProbeLive(spark, dir, k = 3, probeMod = 7)
      .where(col("qid") === 7L).collect()
    assert(live.head.getAs[Long]("vec_id") === 9000007L,
      s"clone not first: ${live.toSeq}")
    assert(live.head.getAs[Long]("cos_bp") === 10000L)

    // the delta row's routed cell equals the batch assignment of the
    // SAME embedding (vector 7's cell — routing determinism).
    val cell7 = Similarity.ivfCells(spark, dir)
      .where(col("vec_id") === 7L).head().getLong(1)
    val cellClone = Similarity.ivfCellsWithDeltas(spark, dir)
      .where(col("vec_id") === 9000007L).head().getLong(1)
    assert(cellClone === cell7)

    // replay idempotence: a restarted maintainer adds batch=1 beside
    // batch=0; the live view holds exactly ONE row for the clone.
    in.addData(VRow(9000008L, clone.map(x => -x)))
    val q2 = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q2.processAllAvailable(); q2.stop()
    val dirs = new java.io.File(Similarity.vecDeltaDir(dir))
      .list().filter(_.startsWith("batch=")).toSet
    assert(dirs === Set("batch=0", "batch=1"), s"delta dirs: $dirs")
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") >= 9000000L).count() === 2L)
  }

  test("zero-norm arrival routes to the batch rule's cell, not the sentinel") {
    // nq = 0 makes every cosine NaN: the fold's `>` comparisons
    // would strand it at cell -1 while the batch max(struct) orders
    // NaN equal-greatest and tie-breaks to the MINIMUM cent_id — the
    // router must implement that same rule (round-9 self-review).
    val dir = isolatedCorpus()
    val book = Similarity.ivfCodebook(spark, dir)
    val zero = Seq((9000009L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val routed = SimStream.routeCells(zero, book).collect()
    val minCent = book.agg(min(col("cent_id"))).head().getLong(0)
    assert(routed.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((9000009L, minCent)))
  }

  test("a landed zero-norm vector never surfaces in live probe results") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val ckpt = Files.createTempDirectory("graft-vecdelta-zn").toString
    val in = MemoryStream[VRow]
    in.addData(VRow(9000010L, Seq.fill(64)(0.0f)))
    val q = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q.processAllAvailable(); q.stop()
    // stored (ingest is storage)...
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") === 9000010L).count() === 1L)
    // ...but never scored: no NaN-ranked rows, results equal the
    // base probe's (the arrival has no defined cosine to anything).
    val live = Similarity.ivfProbeLive(spark, dir, k = 3, probeMod = 100)
      .collect().map(_.toString).toSeq
    val basep = Similarity.ivfProbe(spark, dir, k = 3, probeMod = 100)
      .collect().map(_.toString).toSeq
    assert(live === basep)
  }

  test("a streamed request retrieves a streamed candidate (serveVectors live view)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val ckpt = Files.createTempDirectory("graft-vecdelta-srv").toString
    val clone = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") === 3L).head().getSeq[Float](1)
    val in = MemoryStream[VRow]
    in.addData(VRow(9000003L, clone))
    val q = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q.processAllAvailable(); q.stop()
    // an external request equal to the arrival retrieves BOTH the
    // arrival and corpus vector 3, each at exact cos = 1.
    val req = Seq((1L, clone)).toDF("qid", "embedding")
    val got = Similarity.cosineTopKAggProbesLive(spark, dir, req, k = 2)
      .collect().map(r => (r.getLong(2), r.getLong(4))).toSet
    assert(got === Set((3L, 10000L), (9000003L, 10000L)), s"got $got")
    // the base form (no live view) cannot see the arrival.
    val baseGot = Similarity.cosineTopKAggProbes(spark, dir, req, k = 2)
      .collect().map(_.getLong(2)).toSet
    assert(!baseGot.contains(9000003L))
  }

  test("deltas maintained under a scaled book serve under any book") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val ckpt = Files.createTempDirectory("graft-vecdelta-xbook").toString
    // maintain at the corpus-SCALED codebook (the sizing rule a real
    // deployment follows) — NOT the serving default 8.
    val kMaint = Similarity.autoCents(spark, dir)
    assert(kMaint !== 8, "fixture too small to distinguish books")
    val clone = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") === 7L).head().getSeq[Float](1)
    val in = MemoryStream[VRow]
    in.addData(VRow(9000077L, clone))
    val q = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt,
      numCents = kMaint)
    q.processAllAvailable(); q.stop()
    // serving under the DEFAULT book still sees the arrival: the
    // delta dir is canonical (not book-keyed), and the delta's cell
    // under the serving book re-derives from its quantized payload.
    // Under the old book-keyed dir this probe silently read an empty
    // dir and the streamed vector was never retrievable (round-9
    // review).
    val live = Similarity.ivfProbeLive(spark, dir, k = 3, probeMod = 7)
      .where(col("qid") === 7L).collect()
    assert(live.head.getAs[Long]("vec_id") === 9000077L,
      s"cross-book delta invisible: ${live.toSeq}")
    // and the re-derived cell equals vector 7's under the serving
    // book (identical embedding, identical assignment).
    val cell7 = Similarity.ivfCells(spark, dir)
      .where(col("vec_id") === 7L).head().getLong(1)
    val cellClone = Similarity.ivfCellsWithDeltas(spark, dir)
      .where(col("vec_id") === 9000077L).head().getLong(1)
    assert(cellClone === cell7)
  }

  test("the registered hybrid fusion's vector tower serves the live corpus") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val ckpt = Files.createTempDirectory("graft-vecdelta-hyb").toString
    val qid = spark.read.parquet(s"$dir/documents.parquet")
      .agg(min(col("doc_id"))).head().getLong(0)
    val qEmb = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") === qid).head().getSeq[Float](1)
    val in = MemoryStream[VRow]
    in.addData(VRow(9000042L, qEmb))
    val q = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q.processAllAvailable(); q.stop()
    // the streamed clone of the query embedding is the vector
    // tower's #1 candidate (cos = 1; the query doc itself is
    // excluded), so the fused list carries it with rank_vec = 1 —
    // one fused query, one freshness level: the text tower already
    // reads positional deltas, and a doc visible to one tower but
    // not the other skews every fusion (round-9 review).
    val fused = graft.operators.Hybrid.rrfTopK(spark, dir, k = 60)
      .where(col("doc_id") === 9000042L).collect()
    assert(fused.nonEmpty, "streamed vector invisible to the fused query")
    assert(fused.head.getAs[Long]("rank_vec") === 1L)
  }

  test("delta compaction folds parts, preserves serving, and keeps later arrivals live") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val ckpt = Files.createTempDirectory("graft-vecdelta-cmp").toString
    def emb(id: Long) = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") === id).head().getSeq[Float](1)
    def parts() = new java.io.File(Similarity.vecDeltaDir(dir))
      .list().filter(n => n.startsWith("batch=") || n.startsWith("compacted="))
      .toSet
    // two micro-batches land as two delta dirs.
    val in = MemoryStream[VRow]
    in.addData(VRow(9000011L, emb(11)))
    val q1 = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q1.processAllAvailable(); q1.stop()
    in.addData(VRow(9000012L, emb(12)))
    val q2 = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(parts() === Set("batch=0", "batch=1"))
    val before = Similarity.ivfProbeLive(spark, dir, k = 3, probeMod = 100)
      .collect().map(_.toString).toSeq
    // fold: one consolidated part at the max folded id. Deletion is
    // DEFERRED one invocation (readers keep their listed files for a
    // full compaction interval), so the originals remain beside it
    // and the read-side vec_id dedupe hides the double-listing.
    assert(Similarity.compactVectorDeltas(spark, dir) === 2)
    assert(parts() === Set("batch=0", "batch=1", "compacted=1"),
      s"parts: ${parts()}")
    val after = Similarity.ivfProbeLive(spark, dir, k = 3, probeMod = 100)
      .collect().map(_.toString).toSeq
    assert(after === before)
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") >= 9000000L).count() === 2L)
    // the NEXT invocation deletes the folded residue (nothing new to
    // fold, so it returns 0 — pure cleanup).
    assert(Similarity.compactVectorDeltas(spark, dir) === 0)
    assert(parts() === Set("compacted=1"), s"parts: ${parts()}")
    assert(Similarity.ivfProbeLive(spark, dir, k = 3, probeMod = 100)
      .collect().map(_.toString).toSeq === before)
    // arrivals after the fold land above it and stay live...
    in.addData(VRow(9000013L, emb(13)))
    val q3 = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q3.processAllAvailable(); q3.stop()
    assert(parts() === Set("compacted=1", "batch=2"))
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") >= 9000000L).count() === 3L)
    // ...and the next fold consolidates consolidation + newcomers,
    // with its own deferred cleanup on the invocation after.
    assert(Similarity.compactVectorDeltas(spark, dir) === 2)
    assert(parts() === Set("compacted=1", "batch=2", "compacted=2"))
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") >= 9000000L).count() === 3L)
    assert(Similarity.compactVectorDeltas(spark, dir) === 0)
    assert(parts() === Set("compacted=2"))
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") >= 9000000L).count() === 3L)
  }

  test("an un-manifested (in-flight) micro-batch is invisible, never folded, never deleted") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val ckpt = Files.createTempDirectory("graft-vecdelta-unc").toString
    def emb(id: Long) = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") === id).head().getSeq[Float](1)
    val in = MemoryStream[VRow]
    in.addData(VRow(9000021L, emb(21)))
    val q1 = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q1.processAllAvailable(); q1.stop()
    // simulate a crash mid-write of batch=1: the part dir exists on
    // disk (fully written here — the content is irrelevant) but the
    // manifest commit never happened. The checkpoint would replay it
    // in full on restart; until then serving must not read it and
    // the fold must not touch it — folding it and later deleting its
    // replay as "residue" would lose rows forever.
    val book = Similarity.ivfCodebook(spark, dir)
    SimStream.routeCellsFull(
        Seq((9000022L, emb(22))).toDF("vec_id", "embedding"), book)
      .write.parquet(s"${Similarity.vecDeltaDir(dir)}/batch=1")
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") === 9000022L).count() === 0L,
      "un-manifested batch served")
    assert(Similarity.compactVectorDeltas(spark, dir) === 0,
      "folded with only one committed batch")
    val names = new java.io.File(Similarity.vecDeltaDir(dir)).list().toSet
    assert(names.contains("batch=1"), "un-manifested batch deleted")
    assert(!names.exists(_.startsWith("compacted=")))
    // ...and the moment the replay commits it, it serves.
    graft.streaming.DeltaLog.commit(spark,
      Similarity.vecDeltaDir(dir), "batch=1")
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") === 9000022L).count() === 1L)
  }

  test("the compaction crash window (fold written, swap not) double-lists no row and converges") {
    implicit val sqlCtx = spark.sqlContext
    val dir = isolatedCorpus()
    val ckpt = Files.createTempDirectory("graft-vecdelta-crash").toString
    val clone = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") === 5L).head().getSeq[Float](1)
    val in = MemoryStream[VRow]
    in.addData(VRow(9000055L, clone))
    val q = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q.processAllAvailable(); q.stop()
    in.addData(VRow(9000056L, clone.map(x => -x)))
    val q2 = SimStream.maintainVectors(spark, dir, in.toDF(), ckpt)
    q2.processAllAvailable(); q2.stop()
    // simulate the crash window: the fold WROTE its consolidation
    // (compacted=1 = a byte copy of batch=0; wrong content on
    // purpose — it must never be served) but crashed before the
    // manifest swap. Readers resolve the manifest, which still lists
    // the originals only — the orphan is invisible, so nothing
    // double-lists and nothing is missing.
    val dd = Paths.get(Similarity.vecDeltaDir(dir))
    Files.walk(dd.resolve("batch=0")).forEach { p =>
      val t = dd.resolve("compacted=1")
        .resolve(dd.resolve("batch=0").relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") >= 9000000L).count() === 2L)
    // re-run converges: the fold rewrites the orphan target from the
    // still-referenced originals and swaps it in — both arrivals
    // survive (the orphan's missing row is NOT lost).
    assert(Similarity.compactVectorDeltas(spark, dir) === 2)
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") >= 9000000L).count() === 2L)
    // deferred cleanup on the next invocation; serving unchanged.
    assert(Similarity.compactVectorDeltas(spark, dir) === 0)
    val names = new java.io.File(Similarity.vecDeltaDir(dir)).list().toSet
    assert(!names.contains("batch=0") && names.contains("compacted=1"))
    assert(Similarity.quantizedWithDeltas(spark, dir)
      .where(col("vec_id") >= 9000000L).count() === 2L)
  }

  test("live probe with no deltas equals the base probe row for row") {
    val dir = isolatedCorpus()
    val base = Similarity.ivfProbe(spark, dir, k = 3, probeMod = 100)
      .collect().map(_.toString).toSeq
    val live = Similarity.ivfProbeLive(spark, dir, k = 3, probeMod = 100)
      .collect().map(_.toString).toSeq
    assert(live === base)
    assert(base.nonEmpty)
  }
}
