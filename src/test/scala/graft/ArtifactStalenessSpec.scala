package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.operators.JoinSearch
import graft.sources.IndexBuilder

/** The snapshot-companion staleness gate, exercised at the FS level:
  * both durable artifacts (key stats, table sketch) must rebuild when
  * the snapshot's `_SUCCESS` becomes newer — a compaction or forced
  * re-snapshot at the same path invalidates companions automatically.
  * Runs against an isolated copy of the corpus so the shared sf0.001
  * snapshot other suites read stays untouched.
  */
class ArtifactStalenessSpec extends SparkTestBase {

  private def isolatedCorpus(): String = {
    val dir = Files.createTempDirectory("graft-stale-corpus")
    Files.list(Paths.get(sf0001)).forEach { p =>
      Files.copy(p, dir.resolve(p.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  test("companion artifacts rebuild when the snapshot becomes newer") {
    val dir = isolatedCorpus()
    // first touch builds snapshot + both companions.
    IndexBuilder.loadOrBuildKeyStats(spark, dir).count()
    IndexBuilder.loadOrBuildTableSketch(spark, dir).count()
    val statsMarker = new java.io.File(
      s"${IndexBuilder.keyStatsPath(dir)}/_SUCCESS")
    val sketchMarker = new java.io.File(
      s"${IndexBuilder.tableSketchPath(dir)}/_SUCCESS")
    val snapMarker = new java.io.File(
      s"${IndexBuilder.snapshotPath(dir)}/_SUCCESS")
    assert(statsMarker.isFile && sketchMarker.isFile && snapMarker.isFile)

    // back-date the ARTIFACTS below the snapshot (what a compaction /
    // re-snapshot at the same path looks like to the gate): both must
    // rebuild, landing at-or-after the snapshot's mtime again.
    val snapT = snapMarker.lastModified()
    assert(statsMarker.setLastModified(snapT - 60000))
    assert(sketchMarker.setLastModified(snapT - 60000))
    IndexBuilder.loadOrBuildKeyStats(spark, dir).count()
    IndexBuilder.loadOrBuildTableSketch(spark, dir).count()
    assert(statsMarker.lastModified() >= snapT,
      s"key stats not rebuilt: ${statsMarker.lastModified()} < $snapT")
    assert(sketchMarker.lastModified() >= snapT,
      s"sketch not rebuilt: ${sketchMarker.lastModified()} < $snapT")

    // and the rebuilt artifacts still equal the live computation.
    val art = IndexBuilder.loadOrBuildTableSketch(spark, dir)
      .collect().toSet
    val live = JoinSearch.tableKeySketch(
      IndexBuilder.loadOrSnapshot(spark, dir)).collect().toSet
    assert(art == live)

    // fresh artifacts with an OLDER snapshot are served as-is (no
    // gratuitous rebuild): mtimes unchanged on a third touch.
    val m1 = (statsMarker.lastModified(), sketchMarker.lastModified())
    IndexBuilder.loadOrBuildKeyStats(spark, dir).count()
    IndexBuilder.loadOrBuildTableSketch(spark, dir).count()
    assert((statsMarker.lastModified(), sketchMarker.lastModified()) == m1,
      "artifacts rebuilt although fresh")
  }

  test("doc-signature artifact rebuilds when the documents source is newer") {
    import graft.operators.Dedup
    val dir = isolatedCorpus()
    // first touch builds; artifact equals the live band computation.
    val art0 = Dedup.loadOrBuildSignatures(spark, dir)
      .collect().map(_.toString).toSet
    val live = Dedup.bands(spark, dir).collect().map(_.toString).toSet
    assert(art0 == live && art0.nonEmpty)
    val marker = new java.io.File(s"${Dedup.signaturePath(dir)}/_SUCCESS")
    assert(marker.isFile)

    // back-date the ARTIFACT below the source (what a re-crawled
    // corpus landing at the same path looks like to the gate): it
    // must rebuild, landing at-or-after the source's mtime again.
    val src = new java.io.File(s"$dir/documents.parquet")
    assert(marker.setLastModified(src.lastModified() - 60000))
    Dedup.loadOrBuildSignatures(spark, dir).count()
    assert(marker.lastModified() >= src.lastModified(),
      "signatures not rebuilt after falling behind the source")

    // fresh artifact with an older source: served as-is.
    val m1 = marker.lastModified()
    Dedup.loadOrBuildSignatures(spark, dir).count()
    assert(marker.lastModified() == m1, "signatures rebuilt although fresh")
  }
}
