package graft.oracle

import graft.operators.Cdc

/** DuckDB oracle SQL for the CDC merge family ([[Cdc]]). The change
  * feed is rebuilt from the documents table by the same doc_id
  * arithmetic as the Spark side, so the oracle is a fully independent
  * replay of the merge: latest-change selection runs as a window
  * (row_number over seq DESC) where Spark runs a max-struct
  * aggregation — different physical plan, same rows, which is the
  * point of the hash compare.
  */
object CdcOracle {

  private val off = Cdc.InsertOffset

  /** Shared feed CTE body (seq as BIGINT to match Spark's LongType). */
  private val feedCte: String =
    s"""feed AS (
    SELECT doc_id, CAST(1 AS BIGINT) AS seq, 'U' AS op,
      'RECRAWL ' || text AS text,
      CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS VARCHAR) AS source
    FROM documents WHERE doc_id % 10 = 3
    UNION ALL
    SELECT doc_id, CAST(2 AS BIGINT), 'U', 'RECRAWL2 ' || text, NULL, NULL
    FROM documents WHERE doc_id % 20 = 3
    UNION ALL
    SELECT doc_id, CAST(1 AS BIGINT), 'D', NULL, NULL, NULL
    FROM documents WHERE doc_id % 10 = 7
    UNION ALL
    SELECT doc_id + $off, CAST(1 AS BIGINT), 'I', 'NEW ' || text, lang, source
    FROM documents WHERE doc_id % 10 = 9
  )"""

  /** The latest-wins merge body over a feed relation (optionally
    * pre-filtered) — shared by the full merge and the as-of replay.
    */
  private def mergeBody(feedFilter: String): String =
    s"""latest AS (
    SELECT doc_id, op, text, lang, source FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
      FROM feed $feedFilter
    ) WHERE rn = 1
  )
SELECT coalesce(b.doc_id, l.doc_id) AS doc_id,
  coalesce(l.text, b.text) AS text,
  coalesce(b.lang, l.lang) AS lang,
  coalesce(b.source, l.source) AS source,
  CASE WHEN b.doc_id IS NULL THEN 'inserted'
       WHEN l.doc_id IS NULL THEN 'base'
       ELSE 'updated' END AS origin
FROM documents b FULL OUTER JOIN latest l ON b.doc_id = l.doc_id
WHERE coalesce(l.op, 'K') <> 'D'
ORDER BY doc_id"""

  def mergeSnapshotSql: String =
    s"WITH $feedCte,\n  ${mergeBody("")}"

  /** [[Cdc.asOfSnapshot]]: the identical merge replayed over the
    * `seq <= cut` prefix of the feed.
    */
  def asOfSnapshotSql(cut: Long = 1L): String =
    s"WITH $feedCte,\n  ${mergeBody(s"WHERE seq <= $cut")}"

  def historyScdSql: String =
    s"""WITH $feedCte,
  versions AS (
    SELECT doc_id, CAST(0 AS BIGINT) AS seq, 'B' AS op, text FROM documents
    UNION ALL
    SELECT doc_id, seq, op, text FROM feed
  )
SELECT doc_id, seq, op, text,
  (row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1
    AND op <> 'D') AS is_current
FROM versions
ORDER BY doc_id, seq"""
}
