package graft

import graft.operators.Multimodal
import graft.oracle.MmOracle

/** Registered queries for the multimodal family (LLM-pipeline
  * extension beyond the reference surface — SURVEY §7.2 step 7).
  */
object MmQueries {

  /** Every 25th document becomes a loose blob file — enough files to
    * exercise distributed listing without turning the fixture dir
    * into a small-file stress test. (Defined BEFORE `all`: the
    * registration below captures it during object init.)
    */
  private val BlobMod = 25L

  val all: Seq[Q] = Seq(
    Q("mm_metadata",
      (s, dir) => Multimodal.metadata(s, dir),
      Some(MmOracle.metadataSql)),
    Q("mm_frames",
      (s, dir) => Multimodal.frames(s, dir),
      Some(MmOracle.framesSql)),
    Q("mm_resize_plan",
      (s, dir) => Multimodal.resizePlan(s, dir),
      Some(MmOracle.resizePlanSql())),
    Q("mm_type_rollup",
      (s, dir) => Multimodal.typeRollup(s, dir),
      Some(MmOracle.typeRollupSql)),
    // media content-hash dedup: byte-identical payloads collapse —
    // no decode, so no codec dependency.
    Q("mm_dedup",
      (s, dir) => Multimodal.dedupMedia(s, dir),
      Some(MmOracle.dedupMediaSql)),
    // perceptual rung: dHash over codec-decoded luma grids, then
    // banded near-dup pairs — re-encoded copies collapse where the
    // content-hash rung above is blind.
    Q("mm_phash",
      (s, dir) => Multimodal.perceptualHashes(s, dir),
      Some(MmOracle.phashSql)),
    // over the planted re-encode fixture (the corpus itself holds no
    // same-length re-encodes): every twin must collapse onto its
    // original where the content hash is blind.
    Q("mm_neardup",
      (s, dir) => Multimodal.neardupReencoded(s, dir),
      Some(MmOracle.neardupSql())),
    // the REAL decoder behind the same seam (round-15 verdict #4):
    // deterministic rendered PNGs, javax.imageio pixel decode into
    // the durable grid artifact, dHash arithmetic over real pixels.
    // The oracle reads the SAME persisted grids (the decode is not
    // SQL-expressible; the spec pins the pixel read on crafted
    // images).
    Q("mm_phash_imageio",
      (s, dir) => operators.ImageCodec.phashImageIo(s, dir),
      None,
      oracleOf = Some(dir => MmOracle.phashFromGridsSql(
        sources.Artifacts.servedPathLocal(
          operators.ImageCodec.gridsPath(dir))))),
    // raw-blob ingress roundtrip: a directory of loose doc_<id>.<ext>
    // files read through the binaryFile source and normalized into
    // the media schema — format-independent metadata must equal the
    // parquet-derived rows (same oracle, subset-restricted).
    Q("blob_source_metadata",
      (s, dir) => {
        // the shared write-once fixture convention (Queries.fixturePath
        // / fixtureOnce), stamped on the documents table the blobs
        // derive from
        val path = Queries.fixturePath("blobs", dir, stampTable = "documents")
        Queries.fixtureOnce(path)(
          sources.BlobSource.writeBlobs(
            s.read.parquet(s"$dir/documents.parquet")
              .where(org.apache.spark.sql.functions.col("doc_id") % BlobMod === 0)
              .select("doc_id", "text"),
            path))
        // metadataOf already ends with the presentation orderBy
        Multimodal.metadataOf(sources.BlobSource.readMedia(s, path))
      },
      Some(MmOracle.metadataModSql(BlobMod))))
}
