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
    // ((x % 3) + 3) % 3 mirrors the engine's pmod (sign-safe on
  // hash-derived negative ids; identical for non-negative ones).
  "CASE WHEN ((doc_id % 3) + 3) % 3 = 0 THEN 'image' WHEN ((doc_id % 3) + 3) % 3 = 1 THEN 'audio' ELSE 'video' END"

  // encode(text) = the UTF-8 payload bytes (CAST(STRING AS BLOB)
  // THROWS on non-ascii text, and substr(text,1,8) is chars, not
  // bytes — both found by the degenerate-lake hash gate, round 13;
  // byte-identical to the old spelling on ascii corpora).
  private def metaCte: String =
    s"""mmeta AS (
    SELECT doc_id, $mediaType AS media_type,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      md5(text) AS payload_md5,
      substr(hex(encode(text)), 1, 16) AS header_hex,
      CAST(16 + ${DocOracle.hex8IntSql("md5(text)")} % 240 AS BIGINT) AS width,
      CAST(16 + ${DocOracle.hex8IntSql("substr(md5(text), 9, 8)")} % 240 AS BIGINT) AS height
    FROM documents
  )"""

  def metadataSql: String =
    s"""WITH $metaCte
SELECT doc_id, media_type, n_bytes, payload_md5, header_hex, width, height
FROM mmeta ORDER BY doc_id"""

  /** [[metadataSql]] restricted to the blob-roundtrip subset — the
    * `blob_source_metadata` oracle. The blobs are written FROM the
    * documents table, so the format-independent metadata must match
    * the parquet-derived rows exactly.
    */
  def metadataModSql(mod: Long): String =
    s"""WITH $metaCte
SELECT doc_id, media_type, n_bytes, payload_md5, header_hex, width, height
FROM mmeta WHERE doc_id % $mod = 0 ORDER BY doc_id"""

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

  /** Two hex chars -> 0-255 (the `hex8IntSql` technique at byte
    * width).
    */
  private def hex2Int(hexExpr: String): String =
    s"((strpos('0123456789abcdef', substr($hexExpr, 1, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr($hexExpr, 2, 1)) - 1))"

  /** The fake codec's luma grid in SQL: 72 even CODE-POINT slices of
    * the text (cell i covers chars [(i*len)//72, ((i+1)*len)//72)),
    * luma = first md5 byte of the slice — `FakeCodec.lumaGrid` bit
    * for bit (the engine slices by code points too, round 13 — SQL
    * character semantics, surrogate-pair-safe). With
    * `withTwins`, the planted re-encode fixture rows
    * (`Multimodal.mediaReencoded`: one mid-text char spliced, id
    * shifted by 1000000) join the frame.
    */
  /** One 32-bit dHash half over a luma list column `l` — the exact
    * `Multimodal.dhashOf` gradient arithmetic in DuckDB list algebra
    * (1-based list indexing matches Spark's element_at).
    */
  private def halfSql(from: Int): String =
    s"""CAST(list_sum(list_transform(range(0, 32), j ->
      CASE WHEN l[CAST(((j + $from) // 8) * 9 + ((j + $from) % 8) + 2 AS INT)] >
                l[CAST(((j + $from) // 8) * 9 + ((j + $from) % 8) + 1 AS INT)]
           THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""

  /** Mirrors `ImageCodec.phashImageIo`: dHashes recomputed in SQL from
    * the PERSISTED real-codec grid artifact (the decode itself is not
    * SQL-expressible; everything downstream of the pixel read is
    * hash-gated — round-15 verdict #4).
    */
  def phashFromGridsSql(gridsDir: String): String =
    s"""WITH luma AS (
    SELECT doc_id, media_type, luma AS l
    FROM read_parquet('${gridsDir.replace("'", "''")}/*.parquet')
  )
SELECT doc_id, media_type,
  ${halfSql(0)} AS dhash_lo,
  ${halfSql(32)} AS dhash_hi
FROM luma ORDER BY doc_id"""

  private def phashCte(withTwins: Boolean): String = {
    val twins = if (withTwins) s"""
    UNION ALL
    SELECT d.doc_id + 1000000 AS doc_id,
      CASE WHEN ((d.doc_id % 3) + 3) % 3 = 0 THEN 'image'
           WHEN ((d.doc_id % 3) + 3) % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      substr(d.text, 1, greatest(length(d.text) // 2, 1) - 1) || 'x' ||
        substr(d.text, greatest(length(d.text) // 2, 1) + 1) AS text
    FROM documents d WHERE length(d.text) > 0 AND d.doc_id % 5 = 0"""
    else ""
    val slice = "substr(text, 1 + (i * length(text)) // 72, " +
      "((i + 1) * length(text)) // 72 - (i * length(text)) // 72)"
    val half = halfSql _
    s"""mdocs AS (
    -- null payloads yield no frames/grids (the engine's decode-stage
    -- contract): a null-text doc has NO dhash row, not a (0,0) one
    SELECT doc_id, $mediaType AS media_type, text FROM documents
    WHERE text IS NOT NULL$twins
  ),
  luma AS (
    SELECT doc_id, media_type,
      list_transform(range(0, 72), i -> ${hex2Int(s"md5($slice)")}) AS l
    FROM mdocs
  ),
  ph AS (
    SELECT doc_id, media_type,
      ${half(0)} AS dhash_lo,
      ${half(32)} AS dhash_hi
    FROM luma
  )"""
  }

  /** Mirrors `Multimodal.perceptualHashes`. */
  def phashSql: String =
    s"""WITH ${phashCte(withTwins = false)}
SELECT doc_id, media_type, dhash_lo, dhash_hi FROM ph ORDER BY doc_id"""

  /** Mirrors `Multimodal.neardupReencoded` (banded candidates over
    * the planted-twin fixture, verified Hamming).
    */
  def neardupSql(maxHam: Int = 3): String =
    s"""WITH ${phashCte(withTwins = true)},
  bands AS (
    SELECT doc_id, dhash_lo, dhash_hi, t.b AS band_ix,
      CASE WHEN t.b < 2 THEN (dhash_lo >> CAST(t.b * 16 AS INT)) % 65536
           ELSE (dhash_hi >> CAST((t.b - 2) * 16 AS INT)) % 65536 END AS band_v
    FROM ph, range(0, 4) t(b)
  ),
  cand AS (
    SELECT DISTINCT x.doc_id AS doc_x, y.doc_id AS doc_y,
      x.dhash_lo AS lo_x, x.dhash_hi AS hi_x,
      y.dhash_lo AS lo_y, y.dhash_hi AS hi_y
    FROM bands x JOIN bands y
      ON x.band_ix = y.band_ix AND x.band_v = y.band_v
    WHERE x.doc_id < y.doc_id
  )
SELECT doc_x, doc_y,
  CAST(bit_count(xor(lo_x, lo_y)) + bit_count(xor(hi_x, hi_y)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(lo_x, lo_y)) + bit_count(xor(hi_x, hi_y)) <= $maxHam
ORDER BY doc_x, doc_y, hamming"""
}
