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

  /** Mirrors `CorpusPrep.splitLeakfree`: the same md5 bucket over
    * the CLUSTER id (the recursive dedup closure's label, the
    * keeper's doc_id; own id outside every cluster) instead of the
    * document's — an independent DuckDB derivation of both the
    * clustering AND the bucketing.
    */
  def splitLeakfreeSql(pctTrain: Int = 80, pctVal: Int = 10,
      numSeeds: Int = 8): String =
    s"""WITH RECURSIVE ${DocOracle.labelCtes(numSeeds)},
  b AS (
    SELECT d.lang, d.n_chars,
      ${DocOracle.hex8IntSql(
        "md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR))")} % 100 AS bucket
    FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
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

  def mixtureSql(rates: Map[String, Int] = Map("src0" -> 100, "src1" -> 50, "src2" -> 25),
      defaultRate: Int = 75): String = {
    // escape embedded quotes: the Spark side binds source names as
    // Column parameters, but here they land inside SQL literals.
    val rateCase = rates.map { case (s, r) =>
      s"WHEN source = '${s.replace("'", "''")}' THEN $r"
    }.mkString("CASE ", " ", s" ELSE $defaultRate END")
    s"""WITH b AS (
    SELECT source, n_chars, $rateCase AS rate_pct,
      CASE WHEN ${DocOracle.hex8IntSql("md5('mix|' || CAST(doc_id AS VARCHAR))")} % 100 < ($rateCase)
        THEN 1 ELSE 0 END AS kept
    FROM documents
  )
SELECT source, CAST(max(rate_pct) AS BIGINT) AS rate_pct, count(*) AS n_total,
  CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(sum(kept * n_chars) AS BIGINT) AS kept_chars
FROM b GROUP BY source ORDER BY source"""
  }

  /** [[graft.operators.CorpusPrep.alphaMixture]]: identical exact
    * integer pipeline — corrected isqrt, scaled-integer argmin,
    * rational keep rate, bp-granularity md5 bucket.
    */
  def alphaMixtureSql(): String =
    s"""WITH st AS (SELECT source, count(*) AS n_total FROM documents GROUP BY source),
  w0 AS (SELECT source, n_total,
    CAST(floor(sqrt(CAST(n_total AS DOUBLE))) AS BIGINT) AS w0 FROM st),
  w1 AS (SELECT source, n_total,
    w0 - CASE WHEN w0 * w0 > n_total THEN 1 ELSE 0 END AS w1 FROM w0),
  wt AS (SELECT source, n_total,
    w1 + CASE WHEN (w1 + 1) * (w1 + 1) <= n_total THEN 1 ELSE 0 END AS weight FROM w1),
  r AS (SELECT *, (n_total * 1000000000000) // weight AS ratio FROM wt),
  m AS (SELECT n_total AS n_m, weight AS w_m FROM r ORDER BY ratio, source LIMIT 1),
  rates AS (SELECT r.source, r.n_total, r.weight,
    (10000 * m.n_m * r.weight) // (m.w_m * r.n_total) AS rate_bp FROM r, m),
  b AS (
    SELECT d.source, d.n_chars, rt.n_total, rt.weight, rt.rate_bp,
      CASE WHEN ${DocOracle.hex8IntSql("md5('alpha|' || CAST(d.doc_id AS VARCHAR))")} % 10000 < rt.rate_bp
        THEN 1 ELSE 0 END AS kept
    FROM documents d JOIN rates rt USING (source)
  )
SELECT source, CAST(max(n_total) AS BIGINT) AS n_total,
  CAST(max(weight) AS BIGINT) AS weight,
  CAST(max(rate_bp) AS BIGINT) AS rate_bp,
  CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(sum(kept * n_chars) AS BIGINT) AS kept_chars
FROM b GROUP BY source ORDER BY source"""

  /** The capstone composition's oracle: quality CTEs (TextOracle),
    * the recursive dedup closure (DocOracle), and the split bucket in
    * one statement.
    */
  def trainingCorpusSql(pctTrain: Int = 80, minTokens: Int = 30,
      maxTokens: Int = 100000, numSeeds: Int = 8): String =
    s"""WITH RECURSIVE ${DocOracle.labelCtes(numSeeds)},
  ${TextOracle.statsCte},
  ${TextOracle.flagsCte(minTokens, maxTokens)}
SELECT d.doc_id, d.lang, d.source,
  CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS n_tokens
FROM documents d
JOIN tflags f ON f.doc_id = d.doc_id
WHERE f.flag_len * f.flag_avg_word_len * f.flag_stopwords = 1
  AND d.doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
  AND ${DocOracle.hex8IntSql("md5(CAST(d.doc_id AS VARCHAR))")} % 100 < $pctTrain
ORDER BY d.doc_id"""

  /** Decontamination oracle: the same distinct-n-gram overlap in
    * DuckDB list comprehensions (the [[TextOracle.repetitionSql]]
    * gram pattern generalized to width `n`).
    */
  def decontaminateSql(n: Int = 5, evalMod: Int = 23): String = {
    val concat = (0 until n).map(j => s"t[x+$j]").mkString(" || ' ' || ")
    val splitT = s"string_split(${graft.functions.Tokenize.cleanSql("text")}, ' ')"
    s"""WITH rt AS (
    SELECT doc_id, $splitT AS t FROM documents
    WHERE len($splitT) >= $n AND ($splitT)[1] <> ''
  ),
  g AS (
    SELECT DISTINCT doc_id,
      unnest([$concat for x in generate_series(1, len(t) - ${n - 1})]) AS gram
    FROM rt
  ),
  e AS (SELECT DISTINCT gram FROM g WHERE doc_id % $evalMod = 0),
  tr AS (SELECT doc_id, gram FROM g WHERE doc_id % $evalMod <> 0),
  agg AS (
    SELECT tr.doc_id, count(*) AS n_doc_grams,
      sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
    FROM tr LEFT JOIN e ON tr.gram = e.gram
    GROUP BY tr.doc_id
  )
SELECT doc_id, CAST(n_doc_grams AS BIGINT) AS n_doc_grams,
  CAST(n_hits AS BIGINT) AS n_hits,
  CAST((n_hits * 10000) // greatest(n_doc_grams, 1) AS BIGINT) AS contam_bp,
  CAST(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM agg ORDER BY doc_id"""
  }

  def shardPackingSql(budget: Long = 4096L): String =
    s"""WITH base AS (
    SELECT doc_id,
      CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
  ),
  cum AS (
    SELECT doc_id, n_tokens,
      coalesce(sum(n_tokens) OVER (ORDER BY doc_id, n_tokens
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
    FROM base
  )
SELECT doc_id, n_tokens, CAST(tokens_before // $budget AS BIGINT) AS shard_id
FROM cum ORDER BY doc_id"""

  /** [[graft.operators.CorpusPrep]] shard packing fed by the TRAINED
    * BPE token counts instead of the whitespace counter — the
    * composition oracle: the full tokenizer-retraining CTE chain
    * (TextOracle) supplies per-doc sizes, then the identical global
    * running-sum packing runs over them. Docs with no `[a-z]+` words
    * have no BPE tokens and are absent (the Spark side's inner
    * vocabulary join drops them too).
    */
  def shardPackingBpeSql(budget: Long = 4096L,
      n: Int = graft.operators.Bpe.Merges): String =
    s"""WITH ${TextOracle.bpeCtes(n)},
  bvocab AS (
    SELECT word,
      CAST((length(w) - length(replace(w, '|', ''))) // 2 AS BIGINT) AS n_tok
    FROM bwords$n
  ),
  bdocw AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents
  ),
  base AS (
    SELECT d.doc_id, CAST(sum(v.n_tok) AS BIGINT) AS n_tokens
    FROM bdocw d JOIN bvocab v USING (word) GROUP BY d.doc_id
  ),
  cum AS (
    SELECT doc_id, n_tokens,
      coalesce(sum(n_tokens) OVER (ORDER BY doc_id, n_tokens
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
    FROM base
  )
SELECT doc_id, n_tokens, CAST(tokens_before // $budget AS BIGINT) AS shard_id
FROM cum ORDER BY doc_id"""

  /** The PRODUCTION-tokenizer packing oracle: per-doc sizes come from
    * the durable fast-trained segments artifact (`len(syms)` per word
    * — an 8192-merge budget cannot retrain as CTEs, but the trained
    * segmentations are plain parquet; `TextOracle.bpeTokenIdsProdSql`
    * rationale), then the identical global running-sum packing runs
    * over them — so the vocabulary join, the token accounting, and
    * `packedOf`'s two-pass rewrite are all hash-compared end to end.
    * Dir-resolved at Verify-dump time ([[graft.Q.oracleOf]]).
    */
  def shardPackingBpeProdSql(dir: String, budget: Long = 4096L,
      n: Int = graft.operators.Bpe.ProdMerges): String =
    s"""WITH bvocab AS (
    SELECT word, CAST(len(syms) AS BIGINT) AS n_tok
    FROM read_parquet('${graft.sources.Artifacts.servedPathLocal(graft.operators.Bpe.segmentsPath(dir, n))}/*.parquet')
  ),
  bdocw AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents
  ),
  base AS (
    SELECT d.doc_id, CAST(sum(v.n_tok) AS BIGINT) AS n_tokens
    FROM bdocw d JOIN bvocab v USING (word) GROUP BY d.doc_id
  ),
  cum AS (
    SELECT doc_id, n_tokens,
      coalesce(sum(n_tokens) OVER (ORDER BY doc_id, n_tokens
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
    FROM base
  )
SELECT doc_id, n_tokens, CAST(tokens_before // $budget AS BIGINT) AS shard_id
FROM cum ORDER BY doc_id"""

  /** [[graft.operators.CorpusPrep.epochPack]]: the per-epoch GLOBAL
    * running sum over the md5 permutation order — the one-window
    * formulation whose equality with the engine's bucketed two-pass
    * is the point of the hash comparison.
    */
  def epochPackSql(epochs: Int = 3, budget: Long = 4096L,
      outMod: Long = 50L): String =
    s"""WITH base AS (
    SELECT doc_id,
      CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
  ),
  e AS (
    SELECT t.i AS epoch, b.doc_id, b.n_tokens,
      md5(CAST(t.i AS VARCHAR) || '|' || CAST(b.doc_id AS VARCHAR)) AS okey
    FROM base b, range(0, $epochs) t(i)
  ),
  cum AS (
    SELECT epoch, doc_id, n_tokens,
      coalesce(sum(n_tokens) OVER (PARTITION BY epoch ORDER BY okey, doc_id, n_tokens
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
    FROM e
  )
SELECT epoch, doc_id, n_tokens,
  CAST(tokens_before // $budget AS BIGINT) AS seq_id,
  CAST(tokens_before % $budget AS BIGINT) AS start_offset
FROM cum WHERE doc_id % $outMod = 0 ORDER BY epoch, doc_id"""

  /** [[graft.operators.CorpusPrep.sequenceMap]]: same plain global
    * running sum, loader-facing projection.
    */
  def sequenceMapSql(budget: Long = 4096L): String =
    s"""WITH base AS (
    SELECT doc_id,
      CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
  ),
  cum AS (
    SELECT doc_id, n_tokens,
      coalesce(sum(n_tokens) OVER (ORDER BY doc_id, n_tokens
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
    FROM base
  )
SELECT doc_id, n_tokens, CAST(tokens_before // $budget AS BIGINT) AS seq_id,
  CAST(tokens_before % $budget AS BIGINT) AS start_offset,
  CAST(CASE WHEN tokens_before % $budget + n_tokens > $budget
       THEN 1 ELSE 0 END AS BIGINT) AS spills
FROM cum ORDER BY doc_id"""

  /** [[graft.operators.CorpusPrep.manifest]]: identical split bucket
    * and order-independent checksum arithmetic (32-bit hash terms
    * summed as BIGINT).
    */
  def manifestSql(pctTrain: Int = 80, pctVal: Int = 10): String = {
    val bucket = DocOracle.hex8IntSql("md5(CAST(doc_id AS VARCHAR))")
    val term = DocOracle.hex8IntSql(
      "md5(CAST(doc_id AS VARCHAR) || '|' || md5(text))")
    s"""WITH b AS (
    SELECT source, n_chars,
      CASE WHEN $bucket % 100 < $pctTrain THEN 'train'
           WHEN $bucket % 100 < ${pctTrain + pctVal} THEN 'val'
           ELSE 'test' END AS split,
      $term AS term
    FROM documents
  )
SELECT split, source, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(sum(term) AS BIGINT) AS checksum
FROM b GROUP BY split, source ORDER BY split, source"""
  }

  /** [[graft.operators.CorpusPrep.sourceCap]]: the WINDOW formulation
    * (rank per source, keep <= n) — the independent twin that proves
    * the engine's bounded-aggregator rewrite exact.
    */
  def sourceCapSql(n: Int = 10): String =
    s"""WITH ranked AS (
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
    FROM documents
  )
SELECT source, CAST(rk AS BIGINT) AS rank, doc_id, n_chars
FROM ranked WHERE rk <= $n ORDER BY source, rank"""

  /** [[graft.operators.CorpusPrep.qualityResample]]: same tier CASE
    * over the shared stats/flags CTEs ([[TextOracle.statsCte]]), same
    * salted md5 bucket (`'qr|' || doc_id`), rates inlined per the
    * [[mixtureSql]] convention (an alias can't be referenced in its
    * own SELECT).
    */
  def qualityResampleSql(rateHigh: Int = 100, rateMid: Int = 60,
      rateLow: Int = 10, minTokens: Int = 30, maxTokens: Int = 100000,
      highTokens: Int = 100): String = {
    val tierCase =
      s"""CASE WHEN f.flag_len * f.flag_avg_word_len * f.flag_stopwords = 1
          AND s.n_ws_tokens >= $highTokens THEN 'high'
        WHEN f.flag_len * f.flag_avg_word_len * f.flag_stopwords = 1 THEN 'mid'
        ELSE 'low' END"""
    val rateCase =
      s"CASE tier WHEN 'high' THEN $rateHigh WHEN 'mid' THEN $rateMid ELSE $rateLow END"
    s"""WITH ${TextOracle.statsCte}, ${TextOracle.flagsCte(minTokens, maxTokens)},
  tiered AS (
    SELECT s.doc_id, d.lang, s.n_chars, s.n_ws_tokens, $tierCase AS tier
    FROM tstats_bp s
    JOIN tflags f ON f.doc_id = s.doc_id
    JOIN documents d ON d.doc_id = s.doc_id
  ),
  b AS (
    SELECT tier, lang, n_chars, n_ws_tokens, $rateCase AS rate_pct,
      CASE WHEN ${DocOracle.hex8IntSql("md5('qr|' || CAST(doc_id AS VARCHAR))")} % 100 < ($rateCase)
        THEN 1 ELSE 0 END AS kept
    FROM tiered
  )
SELECT tier, lang, CAST(max(rate_pct) AS BIGINT) AS rate_pct,
  count(*) AS n_total, CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(sum(kept * n_chars) AS BIGINT) AS kept_chars,
  CAST(sum(kept * n_ws_tokens) AS BIGINT) AS kept_tokens
FROM b GROUP BY tier, lang ORDER BY tier, lang"""
  }

  /** [[graft.operators.CorpusPrep.chunks]]: same coverage formula
    * (`ceil(max(n - window, 0) / stride) + 1` chunks) and 1-based
    * substring over character counts — both engines' `length`/
    * `substr` are code-point-based, so offsets agree byte-for-byte.
    */
  def chunksSql(window: Int = 400, stride: Int = 300): String =
    s"""WITH d AS (
    SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) > 0
  ),
  c AS (
    SELECT doc_id, text,
      (greatest(n - $window, 0) + ${stride - 1}) // $stride + 1 AS n_chunks
    FROM d
  ),
  e AS (
    SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_id FROM c
  )
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
  CAST(chunk_id * $stride + 1 AS BIGINT) AS start,
  CAST(length(substr(text, CAST(chunk_id * $stride + 1 AS INT), $window)) AS BIGINT) AS chunk_len,
  substr(text, CAST(chunk_id * $stride + 1 AS INT), $window) AS chunk
FROM e ORDER BY doc_id, chunk_id"""
}
