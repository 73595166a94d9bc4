package graft

import graft.operators.Multimodal
import graft.oracle.MmOracle

/** Registered queries for the multimodal family (LLM-pipeline
  * extension beyond the reference surface — SURVEY §7.2 step 7).
  */
object MmQueries {

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
      Some(MmOracle.neardupSql())))
}
