package graft.oracle

/** DuckDB oracle SQL for the multimodal family. The fake codec is
  * md5-derived ([[graft.operators.Multimodal.FakeCodec]]), so every
  * decode output is reproducible in SQL: payload bytes are the
  * document's text bytes (ASCII corpus — char and byte offsets
  * coincide), dimensions come from md5 hex fields, frame hashes from
  * `md5(md5hex || ':' || ix)`.
  */
object MmOracle {

  private val mediaType =
    "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"

  private def metaCte: String =
    s"""mmeta AS (
    SELECT doc_id, $mediaType AS media_type,
      CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      md5(text) AS payload_md5,
      hex(CAST(substr(text, 1, 8) AS BLOB)) AS header_hex,
      CAST(16 + ${DocOracle.hex8IntSql("md5(text)")} % 240 AS BIGINT) AS width,
      CAST(16 + ${DocOracle.hex8IntSql("substr(md5(text), 9, 8)")} % 240 AS BIGINT) AS height
    FROM documents
  )"""

  def metadataSql: String =
    s"""WITH $metaCte
SELECT doc_id, media_type, n_bytes, payload_md5, header_hex, width, height
FROM mmeta ORDER BY doc_id"""

  def framesSql: String =
    s"""WITH $metaCte
SELECT m.doc_id, m.media_type, t.i AS frame_ix,
  md5(m.payload_md5 || ':' || t.i) AS frame_md5, m.width, m.height
FROM mmeta m, range(0, 3) t(i)
WHERE t.i < 1 + m.n_bytes % 3
ORDER BY m.doc_id, frame_ix"""

  def typeRollupSql: String =
    s"""WITH $metaCte
SELECT media_type, count(*) AS n_media,
  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
  CAST(max(n_bytes) AS BIGINT) AS max_bytes,
  CAST((sum(width) * 100) // count(*) AS BIGINT) AS mean_width_c,
  CAST((sum(height) * 100) // count(*) AS BIGINT) AS mean_height_c
FROM mmeta GROUP BY media_type ORDER BY media_type"""

  /** Mirrors `Multimodal.resizePlan` (fit-within, never upscale). */
  def resizePlanSql(maxDim: Long = 128): String =
    s"""WITH $metaCte
SELECT doc_id, media_type, width, height,
  CAST(CASE WHEN greatest(width, height) <= $maxDim THEN 10000
       ELSE (10000 * $maxDim) // greatest(width, height) END AS BIGINT) AS scale_bp,
  CAST(CASE WHEN greatest(width, height) <= $maxDim THEN width
       ELSE (width * $maxDim) // greatest(width, height) END AS BIGINT) AS out_w,
  CAST(CASE WHEN greatest(width, height) <= $maxDim THEN height
       ELSE (height * $maxDim) // greatest(width, height) END AS BIGINT) AS out_h
FROM mmeta ORDER BY doc_id"""

  /** Mirrors `Multimodal.dedupMedia` (content-hash groups). */
  def dedupMediaSql: String =
    s"""WITH $metaCte
SELECT media_type, payload_md5, min(doc_id) AS keeper_doc_id,
  count(*) AS copies
FROM mmeta GROUP BY media_type, payload_md5
ORDER BY media_type, payload_md5"""
}
