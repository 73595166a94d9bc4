package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CorpusPrep, Dedup, JoinSearch, TextAnalysis}
import graft.sources.IndexBuilder

/** Memory-pressure scale-stress (round-7 verdict #3 — the regime
  * SCALE.md could not show): run the flagship families over the
  * scaled corpus under a DELIBERATELY small heap (set
  * `SPARK_DRIVER_MEM=4g`) so sorts/aggregations must spill, and
  * prove three things per family:
  *
  *  - it completes (no OOM) — the plans degrade to spilling instead
  *    of dying, which is what "works at 100 TB" actually requires of
  *    a local run;
  *  - it really spilled (task-metrics memory/disk spill bytes from a
  *    listener — a run that never spilled proves nothing);
  *  - the answers don't change: an order-independent checksum
  *    (sum of xxhash64 over all columns) per family, compared
  *    against the same main run under a roomy heap. Spilling is a
  *    pure execution-layer concern; any checksum drift is a bug.
  *
  * Usage: `SPARK_DRIVER_MEM=4g runMain graft.Stress [baseDir]
  * [factor]` (after `graft.Scale` generated the scaled corpus), then
  * once more with a 16g heap; compare the two JSON lines. Committed
  * numbers live in SCALE.md.
  */
object Stress {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Constrained-heap geometry (round-14, found by the x100 drill):
    // GraftSession.local sizes shuffle partitions to the CORE count —
    // right for the sf-scale corpora it serves, but a FIXED partition
    // count is exactly what breaks when the data grows 100x under a
    // small heap (6M-row sort partitions into a 4 GiB/8-core heap
    // OOM'd in the sorter's pointer-array doubling before spill could
    // help). This harness's whole point is the constrained regime, so
    // it applies the engine's own cluster guidance (partitions 2-3x
    // cores scaled WITH the data, erring high — AQE coalesces the
    // small stages back down) and drops scan splits one tier
    // (128 MiB -> 32 MiB at factor >= 100) so scan-side explodes
    // stay heap-bounded too.
    val parts = math.max(cpus, cpus * factor / 8)
    val splitBytes = if (factor >= 100) 32L << 20 else 128L << 20
    val spark = GraftSession.local(cpus, Map(
      "spark.sql.shuffle.partitions" -> parts.toString,
      "spark.sql.files.maxPartitionBytes" -> splitBytes.toString))
    spark.sparkContext.setLogLevel("WARN")
    val workDir = s"${sys.props("user.dir")}/target/graft-scale/" +
      s"${new java.io.File(baseDir).getName}-x$factor"
    require(new java.io.File(s"$workDir/supplier.parquet/_SUCCESS").exists(),
      s"scaled corpus missing at $workDir — run graft.Scale first")

    val memSpilled = new AtomicLong
    val diskSpilled = new AtomicLong
    val peakExec = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          peakExec.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
        }
      }
    })

    val custQ = Queries.customerQuery(spark, baseDir)
    val allFamilies: Seq[(String, String => DataFrame)] = Seq(
      "search_customer" -> (d =>
        JoinSearch.searchTables(IndexBuilder.cached(spark, d), custQ, Queries.customerCols)),
      "dedup_minhash_lsh" -> (d => Dedup.minhashLsh(spark, d)),
      "dedup_clusters" -> (d => Dedup.clusters(spark, d)),
      "dedup_kept_corpus" -> (d => Dedup.keptCorpus(spark, d)),
      "dedup_span_coverage" -> (d => Dedup.spanCoverage(spark, d)),
      "prep_decontaminate" -> (d => CorpusPrep.decontaminate(spark, d)),
      "prep_training_corpus" -> (d => CorpusPrep.trainingCorpus(spark, d)),
      "text_bm25_topk" -> (d => TextAnalysis.bm25TopK(spark, d)),
      // round-8e heavies: the compound keep-best apply (the round's
      // worst 10x ratio — the one most worth proving spill-safe) and
      // the certified sketch's two corpus passes.
      "dedup_kept_corpus_best" -> (d => Dedup.keptCorpusBest(spark, d)),
      "text_heavy_hitters" -> (d => TextAnalysis.heavyHitters(spark, d)),
      // round-14 (verdict #5): shard packing joins the flagship set
      // for the x100 trend point.
      "prep_shard_packing" -> (d => CorpusPrep.shardPacking(spark, d)))

    // GRAFT_STRESS_FAMILIES=a,b,c restricts the run (the x100 trend
    // point measures the flagship subset; saturation-by-design
    // worst cases like span coverage are 10x-bounded on purpose —
    // verbatim x100 replication makes their input quadratic in the
    // factor, which measures the generator, not the operator).
    val families = sys.env.get("GRAFT_STRESS_FAMILIES") match {
      case Some(list) =>
        val want = list.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val missing = want -- allFamilies.map(_._1).toSet
        require(missing.isEmpty, s"unknown stress families: $missing")
        allFamilies.filter { case (n, _) => want(n) }
      case None => allFamilies
    }

    def drain(): Unit = Thread.sleep(300) // listener events are async

    val rows = families.map { case (name, fn) =>
      val (m0, d0) = (memSpilled.get(), diskSpilled.get())
      val t0 = System.nanoTime()
      val df = fn(workDir)
      // order-independent exact checksum over every output cell
      // (decimal accumulator: a LONG sum of 64-bit hashes overflows
      // under ANSI within ~2 rows).
      val chk = df
        .select(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))
          .cast("string").as("chk"),
          count(lit(1)).as("n"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      val spillMem = memSpilled.get() - m0
      val spillDisk = diskSpilled.get() - d0
      f""""$name":{"wall_s":$wall%.3f,"rows":${chk.getLong(1)},""" +
        s""""checksum":"${Option(chk.getString(0)).getOrElse("0")}",""" +
        s""""spill_mem_mb":${spillMem / (1 << 20)},"spill_disk_mb":${spillDisk / (1 << 20)}}"""
    }.mkString("{", ",", "}")

    println(s"""{"metric":"stress","heap":"${Runtime.getRuntime.maxMemory() / (1 << 20)}m",""" +
      s""""cpus":$cpus,"factor":$factor,"families":$rows,""" +
      s""""spill_mem_mb_total":${memSpilled.get() / (1 << 20)},""" +
      s""""spill_disk_mb_total":${diskSpilled.get() / (1 << 20)},""" +
      s""""peak_task_exec_mb":${peakExec.get() / (1 << 20)}}""")
    spark.stop()
  }
}
