package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.sources.Artifacts

/** The `.build-*` stray sweep judges liveness by the newest mtime
  * found RECURSIVELY inside the temp dir (round-14 ADVICE): a Spark
  * job writing under `_temporary/` bumps the top-level dir only at
  * job start and commit, so a LIVE build longer than the TTL looked
  * stale for its whole middle under the old top-level-mtime rule —
  * and a concurrent publish would sweep it mid-write.
  */
class ArtifactStraySpec extends SparkTestBase {
  import spark.implicits._

  private def age(p: String, byMs: Long): Unit =
    Files.setLastModifiedTime(Paths.get(p),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - byMs))

  test("a mid-build stray with an old top mtime but fresh inner files survives the sweep") {
    val base = Files.createTempDirectory("graft-stray").toString
    val upstream = s"$base/up.parquet"
    (1L to 10L).toDF("id").write.parquet(upstream)
    val root = s"$base/artifact"
    def publishOnce(): Unit =
      Artifacts.publish(spark, root, Seq(upstream), "stray-sem") { t =>
        spark.read.parquet(upstream).withColumn("d", col("id") * 2)
          .write.parquet(t)
      }
    publishOnce()
    // craft the long-running-build shape: top-level dir mtime frozen
    // at "job start" (2h ago), one task file landed seconds ago.
    val stray = s"$root/.build-simulated-live"
    Files.createDirectories(Paths.get(s"$stray/_temporary/0"))
    Files.writeString(Paths.get(s"$stray/_temporary/0/task-file"), "fresh")
    age(s"$stray/_temporary/0", 2 * 3600 * 1000)
    age(s"$stray/_temporary", 2 * 3600 * 1000)
    age(stray, 2 * 3600 * 1000)
    publishOnce()
    assert(Files.exists(Paths.get(stray)),
      "sweep killed a live build whose inner files were fresh")
    // once EVERY file inside is past the TTL it is a true crash stray
    age(s"$stray/_temporary/0/task-file", 2 * 3600 * 1000)
    publishOnce()
    assert(!Files.exists(Paths.get(stray)),
      "a fully-stale crashed-builder stray must be swept")
  }
}
