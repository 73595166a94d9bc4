package graft.oracle

/** DuckDB oracle SQL for the corpus-preparation family. Mirrors
  * [[graft.operators.CorpusPrep]]: same md5 bucket arithmetic
  * (positional hex decode, [[DocOracle.hex8IntSql]]), and the PLAIN
  * global running sum for shard packing — the independent formulation
  * that proves the engine's distributed two-pass rewrite exact.
  */
object PrepOracle {

  def splitAssignSql(pctTrain: Int = 80, pctVal: Int = 10): String =
    s"""WITH b AS (
    SELECT doc_id, lang, n_chars,
      ${DocOracle.hex8IntSql("md5(CAST(doc_id AS VARCHAR))")} % 100 AS bucket
    FROM documents
  ),
  assigned AS (
    SELECT lang, n_chars,
      CASE WHEN bucket < $pctTrain THEN 'train'
           WHEN bucket < ${pctTrain + pctVal} THEN 'val'
           ELSE 'test' END AS split
    FROM b
  )
SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY split, lang ORDER BY split, lang"""

  def shardPackingSql(budget: Long = 4096L): String =
    s"""WITH base AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
  ),
  cum AS (
    SELECT doc_id, n_tokens,
      coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
    FROM base
  )
SELECT doc_id, n_tokens, CAST(tokens_before // $budget AS BIGINT) AS shard_id
FROM cum ORDER BY doc_id"""
}
