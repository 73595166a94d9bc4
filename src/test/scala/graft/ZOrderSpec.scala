package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout ([[ZOrder]]): the bit math pinned on known
  * values, and the row-group-skipping claim proven on REAL parquet
  * footers — the same min/max statistics a lake engine consults —
  * rather than on plan shape: a per-user box query must overlap
  * strictly fewer row groups under the z layout than under the
  * arrival-order (time-sorted) layout that an event log naturally
  * has.
  */
class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  test("morton interleave: known values") {
    // x=3 (bits 0,1), y=5 (bits 0,2) -> z bits 0,1,2,5 = 39
    val got = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect.toSeq
    // x occupies even bits (0x55555555), y odd bits (0xAAAAAAAA)
    assert(got === Seq(39L, 0L, 0x55555555L, 0xAAAAAAAAL))
  }

  /** Per row group: (min, max) of each long column, straight from
    * the footer statistics.
    */
  private def rowGroups(dir: String): Seq[Map[String, (Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).toSeq.flatMap { f =>
        val in = HadoopInputFile.fromPath(
          new Path(f.getAbsolutePath), new Configuration())
        val r = ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          b.getColumns.asScala.flatMap { c =>
            (c.getStatistics.genericGetMin, c.getStatistics.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                Some(c.getPath.toDotString -> (mn.toLong, mx.toLong))
              case _ => None
            }
          }.toMap
        } finally r.close()
      }
  }

  private def overlapping(groups: Seq[Map[String, (Long, Long)]],
      col: String, lo: Long, hi: Long): Int =
    groups.count { g =>
      val (mn, mx) = g(col)
      mx >= lo && mn <= hi
    }

  test("per-user box query skips row groups under z layout, none under time layout") {
    val sf001 = "/root/testdata/sf0.01"
    val df = ZOrder.zMap(spark, sf001).select("event_id", "ub", "hb")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val zDir = s"$base/z"
    val tDir = s"$base/t"
    // file-level granularity (24 range tiles, default-size blocks →
    // one row group per file): file boundaries come from the exact
    // range partitioning, where sub-file row-group boundaries are a
    // parquet-writer heuristic that parquet-mr's MemoryManager
    // SHRINKS when parallel suites hold many open writers — the
    // under-load flake this spec must not have.
    ZOrder.zOrderedWrite(df, "ub", "hb", zDir, partitions = 24,
      blockBytes = 128 * 1024 * 1024)
    ZOrder.linearWrite(df, "hb", tDir, partitions = 24,
      blockBytes = 128 * 1024 * 1024)

    val zGroups = rowGroups(zDir)
    val tGroups = rowGroups(tDir)
    assert(zGroups.size >= 8 && tGroups.size >= 8,
      s"need row-group resolution for the claim: z=${zGroups.size} t=${tGroups.size}")

    // the box: one-eighth of the user space, ALL of time — the
    // "this user's events, ever" shape a time-ordered log is worst at.
    val maxUb = df.agg(max("ub")).head.getLong(0)
    val (uLo, uHi) = (0L, maxUb / 8)
    val zHit = overlapping(zGroups, "ub", uLo, uHi)
    val tHit = overlapping(tGroups, "ub", uLo, uHi)

    assert(tHit == tGroups.size,
      s"time layout scatters users across every group ($tHit/${tGroups.size})")
    assert(zHit * 2 <= zGroups.size,
      s"z layout must skip at least half the groups: $zHit/${zGroups.size}")

    // counter-shape: a narrow time slice still prunes under z (time
    // bits are interleaved, not lost) — z is a both-dimensions
    // compromise, not a user-only index.
    val maxHb = df.agg(max("hb")).head.getLong(0)
    val minHb = df.agg(min("hb")).head.getLong(0)
    val hMid = minHb + (maxHb - minHb) / 2
    val zTimeHit = overlapping(zGroups, "hb", minHb, hMid)
    assert(zTimeHit < zGroups.size,
      s"z layout should prune some groups on a half-time slice: $zTimeHit/${zGroups.size}")

    // and SPARK'S OWN SCAN exploits it: under parquet filter
    // pushdown the row-group skip shows up as rows never read — the
    // scan's numOutputRows under the z layout must be a fraction of
    // the time layout's for the same per-user predicate (the time
    // layout reads ~everything because every group's ub range spans
    // the box).
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .where(col("ub") >= uLo && col("ub") <= uHi)
      q.collect() // execute so metrics populate
      val scans = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a parquet scan")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zRead = scanRows(zDir)
    val tRead = scanRows(tDir)
    assert(zRead * 2 <= tRead,
      s"z scan must read at most half the time layout's rows: z=$zRead t=$tRead")
  }
}
