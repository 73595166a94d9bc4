package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{PrepStream, TextStream}

/** The composed streaming admission pipeline ([[PrepStream]]):
  * exact dedup -> near dedup -> live adaptive quality gate ->
  * idempotent landing. Pins (1) each stage's decision on one planted
  * batch, (2) cutoff MOVEMENT — a document admitted under the base
  * distribution is rejected once the accumulated deltas shift its
  * source's cutoff, (3) replay determinism — a batch's own
  * (pre-landed) delta histogram never feeds its own admission.
  *
  * Batch IDS are discovered, never assumed: the engine interleaves
  * data batches with empty watermark-bookkeeping batches whose
  * positions are timing-dependent (the debug trace showed data in
  * batches 0/2/4 with empties between), so assertions key on batch
  * CONTENT.
  */
object PrepStreamSpec {
  final case class PDoc(ts: Timestamp, doc_id: Long, text: String,
      source: String)
}

class PrepStreamSpec extends SparkTestBase {
  import spark.implicits._
  import PrepStreamSpec.PDoc

  private val BaseMin = 6000L
  private def doc(minute: Long, id: Long, text: String,
      source: String = "src0"): PDoc =
    PDoc(new Timestamp((BaseMin + minute) * 60000L), id, text, source)

  private def words(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  /** batch id -> kept doc ids, for every landed batch (empties too). */
  private def keptByBatch(keptDir: String): Map[Long, Seq[Long]] =
    new java.io.File(keptDir).listFiles()
      .filter(_.getName.startsWith("batch=")).map { d =>
        d.getName.drop(6).toLong ->
          spark.read.parquet(d.toString).select("doc_id")
            .as[Long].collect().toSeq.sorted
      }.toMap

  test("admission: dedup stages and the live quality gate each fire") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-prepstream").toString
    val in = MemoryStream[PDoc]
    // a live (processing-time) trigger: the default AvailableNow
    // snapshots availability at start and stops — it cannot see data
    // added across the test's rounds.
    val q = PrepStream.admit(in.toDF(), sf0001, s"$root/delta",
      s"$root/kept", s"$root/ckpt", trigger = Trigger.ProcessingTime(0))
    try {
      val good = words(60, "w") // == src0's base median -> admitted
      // d2: byte-identical re-crawl (exact stage). d3: case+space
      // edit, identical cleaned shingles (near stage). d4: below the
      // src0 cutoff (quality stage). d5: unknown source -> admitted
      // even though short (no evidence, no rejection).
      in.addData(
        doc(0, 1, good),
        doc(1, 2, good),
        doc(1, 3, good.replace("w1 w2", "W1  W2")),
        doc(1, 4, words(5, "s")),
        doc(2, 5, "x y z", source = "srcNEW"))
      q.processAllAvailable()
      assert(keptByBatch(s"$root/kept").values.flatten.toSeq.sorted
        == Seq(1L, 5L))
      // the landed delta histograms are POST-dedup, PRE-quality:
      // d1, d4, d5 contribute; the dropped replicas d2/d3 do not.
      val delta = spark.read
        .parquet(s"$root/delta/batch=*")
        .groupBy("source", "n_ws_tokens").agg(sum("c").cast("long").as("c"))
        .as[(String, Long, Long)].collect().toSet
      assert(delta == Set(("src0", 60L, 1L), ("src0", 5L, 1L),
        ("srcNEW", 3L, 1L)))
    } finally q.stop()
  }

  test("cutoff movement: accumulated deltas reject what base admitted") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-prepstream").toString
    val in = MemoryStream[PDoc]
    // a live (processing-time) trigger: the default AvailableNow
    // snapshots availability at start and stops — it cannot see data
    // added across the test's rounds.
    val q = PrepStream.admit(in.toDF(), sf0001, s"$root/delta",
      s"$root/kept", s"$root/ckpt", trigger = Trigger.ProcessingTime(0))
    try {
      // round 1: a 70-token src0 document against the BASE cutoff
      in.addData(doc(0, 10, words(70, "a")))
      q.processAllAvailable()
      // round 2: a flood of long src0 documents moves the histogram
      in.addData((1 to 30).map(i => doc(5 + i, 100 + i, words(90, s"f$i"))): _*)
      q.processAllAvailable()
      // round 3: the SAME length round 1 admitted
      in.addData(doc(40, 11, words(70, "b")))
      q.processAllAvailable()

      val kept = keptByBatch(s"$root/kept")
      assert(kept.values.flatten.toSet.contains(10L), "admitted under base")
      assert(!kept.values.flatten.toSet.contains(11L),
        "doc 11 must be rejected under the moved cutoff")
      // the cutoff itself moved: excluding the flood's delta it
      // admits 70-token docs, including it it does not.
      val floodBatch = spark.read.parquet(s"$root/delta/batch=*")
        .where(col("n_ws_tokens") === 90).count()
      assert(floodBatch == 1L, "flood collapses to one histogram row")
      val cutBefore = TextStream
        .cutoffsWithDeltas(spark, sf0001, s"$root/delta", 0)
        .where(col("source") === "src0").select("median_tokens")
        .as[Long].head()
      val cutAfter = TextStream
        .cutoffsWithDeltas(spark, sf0001, s"$root/delta", Long.MaxValue)
        .where(col("source") === "src0").select("median_tokens")
        .as[Long].head()
      assert(cutBefore <= 70 && cutAfter > 70,
        s"flood must move src0's cutoff past 70: base=$cutBefore merged=$cutAfter")
    } finally q.stop()
  }

  test("a watermark fold between batches changes no admission decision; illegal replays refuse") {
    // round-11: admitBatch is the real consumer of the
    // replay-determinism bound — run the SAME batch sequence with and
    // without a mid-stream histogram fold and require identical
    // admissions, then pin that a post-fold crash-replay of a
    // FOLDED-PAST batch fails loudly instead of admitting against a
    // cutoff its first attempt could not have seen.
    val ts = new Timestamp(BaseMin * 60000L)
    def frame(rows: Seq[(Long, String, String)]) =
      rows.map { case (id, text, src) => (ts, id, text, src) }
        .toDF("ts", "doc_id", "text", "source")
    val waves = Seq(
      frame((1 to 30).map(i => (100L + i, words(90, s"f$i"), "src0"))),  // 0
      frame((1 to 10).map(i => (200L + i, words(85, s"g$i"), "src0"))),  // 1
      frame(Seq((301L, words(70, "b"), "src0"),                          // 2
        (302L, words(95, "c"), "src0"))),
      frame(Seq((401L, words(70, "d"), "src0"),                          // 3
        (402L, words(90, "e"), "src0"))))
    val (fold, ctrl) = (
      Files.createTempDirectory("graft-prepfold").toString,
      Files.createTempDirectory("graft-prepctrl").toString)
    waves.zipWithIndex.foreach { case (w, i) =>
      if (i == 2) {
        // batches 0 and 1 are committed (never re-executed): fold them.
        assert(TextStream.compactHistogramDeltas(spark, s"$fold/delta",
          watermark = 2L) === 2)
      }
      PrepStream.admitBatch(w, i.toLong, sf0001, s"$fold/delta", s"$fold/kept")
      PrepStream.admitBatch(w, i.toLong, sf0001, s"$ctrl/delta", s"$ctrl/kept")
    }
    assert(keptByBatch(s"$fold/kept") === keptByBatch(s"$ctrl/kept"))
    // the moved cutoff really decided batch 2 (the fold-read path was
    // load-bearing, not vacuous): 70 tokens admits under the base
    // distribution but not under the accumulated flood.
    assert(!keptByBatch(s"$fold/kept").values.flatten.toSet.contains(301L))
    assert(keptByBatch(s"$fold/kept").values.flatten.toSet.contains(302L))
    // delta dir shape: the fold consolidated 0..1, later batches per-batch.
    assert(graft.streaming.DeltaLog
      .liveParts(spark, s"$fold/delta", prefix = "").map(_.split('/').last).sorted
      === Seq("batch=2", "batch=3", "compacted=1"))
    // a crash-replay of batch 2 AFTER the fold is legal (compacted=1
    // < 2) and bit-stable.
    PrepStream.admitBatch(waves(2), 2L, sf0001, s"$fold/delta", s"$fold/kept")
    assert(keptByBatch(s"$fold/kept") === keptByBatch(s"$ctrl/kept"))
    // a replay of batch 1 would need "deltas < 1", which the fold
    // destroyed — by contract it cannot happen (batch 1 was committed
    // before the watermark-2 fold); if it does, refuse loudly.
    val e = intercept[IllegalArgumentException] {
      PrepStream.admitBatch(waves(1), 1L, sf0001, s"$fold/delta", s"$fold/kept")
    }
    assert(e.getMessage.contains("compacted"))
  }

  test("replay determinism: a batch's own delta never feeds itself") {
    val root = Files.createTempDirectory("graft-prepstream").toString
    // a failed earlier attempt already landed batch 3's histogram —
    // poisoned so that, if (wrongly) consulted, it would reject the
    // 60-token document below.
    Seq(("src0", 1000L, 1000L)).toDF("source", "n_ws_tokens", "c")
      .write.parquet(s"$root/delta/batch=3")
    val batch = Seq((new Timestamp(BaseMin * 60000L), 1L, words(60, "w"), "src0"))
      .toDF("ts", "doc_id", "text", "source")
    PrepStream.admitBatch(batch, 3L, sf0001, s"$root/delta", s"$root/kept")
    assert(spark.read.parquet(s"$root/kept/batch=3").select("doc_id")
      .as[Long].collect().toSeq == Seq(1L),
      "replayed batch 3 must admit against deltas < 3 only (the base)")
    // and the retry overwrote the stale attempt's histogram
    val delta = spark.read.parquet(s"$root/delta/batch=3")
      .as[(String, Long, Long)].collect().toSet
    assert(delta == Set(("src0", 60L, 1L)))
  }
}
