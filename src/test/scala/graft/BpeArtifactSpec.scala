package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** The durable tokenizer artifact at the FS level (the
  * ArtifactStalenessSpec discipline): first touch trains and
  * persists; a rewritten documents source invalidates BOTH datasets
  * through the content fingerprint AND the retrained vocabulary
  * reflects the new corpus; an unchanged source is served as-is
  * (part names stable — no gratuitous retrain).
  */
class BpeArtifactSpec extends SparkTestBase {

  private def isolatedCorpus(): String = {
    val dir = Files.createTempDirectory("graft-bpe-corpus")
    Files.list(Paths.get(sf0001)).forEach { p =>
      Files.copy(p, dir.resolve(p.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  private def partNames(path: String): Set[String] =
    SparkTestBase.partNames(path)

  test("tokenizer artifact trains once, rebuilds on source rewrite") {
    val dir = isolatedCorpus()
    val (m0, v0) = Bpe.loadOrTrain(spark, dir)
    val nMerges0 = m0.count()
    // the synthetic corpus has a small closed vocabulary; corpus
    // changes surface in the WEIGHTS (sum of word counts), which the
    // rewrite assertion below uses.
    val mass0 = v0.agg(sum("wc")).head().getLong(0)
    assert(nMerges0 === Bpe.Merges.toLong && v0.count() > 10L)
    val mp = Bpe.mergesPath(dir)
    val vp = Bpe.vocabPath(dir)
    val mParts0 = partNames(mp)
    val vParts0 = partNames(vp)

    // unchanged source: served as-is, no retrain.
    Bpe.loadOrTrain(spark, dir)
    assert(partNames(mp) === mParts0 && partNames(vp) === vParts0,
      "artifact retrained although the source is unchanged")

    // rewrite documents to the odd-doc half: new part names flip the
    // fingerprint, and the retrained weights must reflect the
    // smaller corpus (the closed template vocabulary keeps its word
    // SET, so the word MASS is the observable).
    val half = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 2 === 1)
      .localCheckpoint(true) // sever lineage before overwriting the source
    half.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (m1, v1) = Bpe.loadOrTrain(spark, dir)
    assert(partNames(mp) !== mParts0, "merges not rebuilt after rewrite")
    assert(partNames(vp) !== vParts0, "vocab not rebuilt after rewrite")
    val mass1 = v1.agg(sum("wc")).head().getLong(0)
    assert(mass1 < mass0, s"retrained weights must shrink: $mass0 -> $mass1")
    assert(m1.count() === Bpe.Merges.toLong)
  }
}
