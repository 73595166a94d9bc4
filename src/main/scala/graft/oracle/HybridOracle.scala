package graft.oracle

import graft.functions.Tokenize
import graft.operators.{Hybrid, Similarity}

/** DuckDB oracle SQL for the hybrid RRF retrieval family — the BM25
  * tower mirrors [[TextOracle.bm25TopKSql]] stage for stage, the
  * vector tower mirrors [[SimOracle]]'s quantized-cosine CTEs with a
  * single derived `vec_id = min(doc_id)` probe (exact or
  * IVF-routed), and the fusion
  * is the same exact integer `RrfScale // (RrfK + rank)` arithmetic.
  */
object HybridOracle {

  private val S = Similarity.QuantScale
  private val D = Similarity.Dim
  private val RS = Hybrid.RrfScale
  private val RK = Hybrid.RrfK

  /** The BM25 tower as a CTE chain ending in `tcand(doc_id,
    * rank_text)`: ranks ALL matched docs, drops the query document
    * itself, keeps the top `kCand` non-self positions — the same
    * candidate set the engine gets from `bm25TopK(kCand + 1)` minus
    * self (the top-kCand non-self docs of a ranking are always
    * contained in its top kCand + 1). The query document is DERIVED
    * (`qd` = min doc_id — the engine's `Hybrid.queryDocId` rule),
    * never a literal id: on a re-keyed corpus a hardcoded 0 would
    * exclude the wrong document and probe a nonexistent vec_id
    * (round-8 ADVICE).
    */
  private val qdCte =
    "qd AS (SELECT min(doc_id) AS qid FROM documents)"

  private def textCtes(kCand: Int, qTerms: Int): String =
    s"""${TextOracle.statsCte},
  $qdCte,
  qsrc AS (
    SELECT string_split(${Tokenize.cleanSql("text")}, ' ')[1:$qTerms] AS ts
    FROM documents ORDER BY doc_id LIMIT 1
  ),
  q AS (SELECT DISTINCT unnest(ts) AS term FROM qsrc),
  qf AS (SELECT term FROM q WHERE term <> ''),
  toks AS (
    SELECT doc_id, unnest(string_split(${Tokenize.cleanSql("text")}, ' ')) AS term
    FROM documents
  ),
  tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks
    WHERE term <> '' AND term IN (SELECT term FROM qf)
    GROUP BY doc_id, term
  ),
  dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
  dl AS (SELECT doc_id, sum(n_clean_tokens) AS dl FROM tstats
         GROUP BY doc_id HAVING sum(n_clean_tokens) > 0),
  tot AS (
    SELECT count(*) AS n_docs, sum(dl) // count(*) AS avgdl FROM dl
  ),
  sc AS (
    SELECT t.doc_id,
      (10000 * (2 * n_docs - 2 * f.df + 1) * (22 * t.tf * avgdl)) //
        ((2 * f.df + 1) * (10 * t.tf * avgdl + 3 * avgdl + 9 * d.dl)) AS score_t
    FROM tf t
    JOIN dfc f ON f.term = t.term
    JOIN dl d ON d.doc_id = t.doc_id
    CROSS JOIN tot
  ),
  bagg AS (SELECT doc_id, sum(score_t) AS score FROM sc GROUP BY doc_id),
  tranked AS (
    SELECT doc_id,
      row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank_text
    FROM bagg WHERE doc_id <> (SELECT qid FROM qd)
  ),
  tcand AS (SELECT doc_id, rank_text FROM tranked WHERE rank_text <= $kCand)"""

  /** The fusion tail: expects `tcand(doc_id, rank_text)` and
    * `vcand(doc_id, rank_vec)` in scope.
    */
  private def fusionSql(k: Int): String =
    s"""  fused AS (
    SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
      COALESCE($RS // ($RK + t.rank_text), 0) + COALESCE($RS // ($RK + v.rank_vec), 0)
        AS rrf_score,
      COALESCE(t.rank_text, 0) AS rank_text,
      COALESCE(v.rank_vec, 0) AS rank_vec
    FROM tcand t FULL OUTER JOIN vcand v ON t.doc_id = v.doc_id
  ),
  franked AS (
    SELECT doc_id, rrf_score, rank_text, rank_vec,
      row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank
    FROM fused
  )
SELECT doc_id, CAST(rank AS BIGINT) AS rank, CAST(rrf_score AS BIGINT) AS rrf_score,
  CAST(rank_text AS BIGINT) AS rank_text, CAST(rank_vec AS BIGINT) AS rank_vec
FROM franked WHERE rank <= $k ORDER BY rank"""

  /** `search_hybrid_rrf` oracle: exact brute-force vector tower. */
  def rrfTopKSql(k: Int = 20, kCand: Int = 50, qTerms: Int = 8): String =
    s"""WITH ${textCtes(kCand, qTerms)},
  qbase AS (
    SELECT vec_id,
      list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $S) AS BIGINT)) AS q
    FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) = $D
      AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0
      AND len(list_filter(embedding, x -> x <> 0)) > 0
  ),
  nb AS (
    SELECT vec_id, q, CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS nq
    FROM qbase
  ),
  probe AS (SELECT q AS pq, nq AS pnq FROM nb WHERE vec_id = (SELECT qid FROM qd)),
  vpairs AS (
    SELECT c.vec_id,
      CAST(list_sum(list_transform(range(1, ${D + 1}), i -> p.pq[i] * c.q[i])) AS BIGINT) AS dot_q,
      c.nq, p.pnq
    FROM probe p, nb c WHERE c.vec_id <> (SELECT qid FROM qd)
  ),
  vscored AS (
    SELECT vec_id,
      CAST(dot_q AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(pnq AS DOUBLE))) AS cosd
    FROM vpairs
  ),
  vranked AS (
    SELECT vec_id AS doc_id,
      row_number() OVER (ORDER BY cosd DESC, vec_id ASC) AS rank_vec
    FROM vscored
  ),
  vcand AS (SELECT doc_id, rank_vec FROM vranked WHERE rank_vec <= $kCand),
${fusionSql(k)}"""

  /** `search_hybrid_batch` oracle: the per-probe chains — union-term
    * tf/df (probe-independent, computed once, same values the
    * single-probe chain sees), per-(probe, doc) scoring, self
    * excluded before ranking, compound-key full-outer fusion.
    */
  def rrfTopKBatchSql(k: Int = 20, kCand: Int = 50, qTerms: Int = 8,
      probeIds: Seq[Long] = Hybrid.BatchProbes): String = {
    val ids = probeIds.mkString(", ")
    s"""WITH ${TextOracle.statsCte},
  qsrc AS (
    SELECT doc_id AS probe_id,
      string_split(${Tokenize.cleanSql("text")}, ' ')[1:$qTerms] AS ts
    FROM documents WHERE doc_id IN ($ids)
  ),
  qf AS (
    SELECT DISTINCT probe_id, term FROM (
      SELECT probe_id, unnest(ts) AS term FROM qsrc
    ) WHERE term <> ''
  ),
  uterms AS (SELECT DISTINCT term FROM qf),
  toks AS (
    SELECT doc_id, unnest(string_split(${Tokenize.cleanSql("text")}, ' ')) AS term
    FROM documents
  ),
  tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks
    WHERE term <> '' AND term IN (SELECT term FROM uterms)
    GROUP BY doc_id, term
  ),
  dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
  dl AS (SELECT doc_id, sum(n_clean_tokens) AS dl FROM tstats
         GROUP BY doc_id HAVING sum(n_clean_tokens) > 0),
  tot AS (
    SELECT count(*) AS n_docs, sum(dl) // count(*) AS avgdl FROM dl
  ),
  sc AS (
    SELECT q.probe_id, t.doc_id,
      (10000 * (2 * n_docs - 2 * f.df + 1) * (22 * t.tf * avgdl)) //
        ((2 * f.df + 1) * (10 * t.tf * avgdl + 3 * avgdl + 9 * d.dl)) AS score_t
    FROM tf t
    JOIN qf q ON q.term = t.term
    JOIN dfc f ON f.term = t.term
    JOIN dl d ON d.doc_id = t.doc_id
    CROSS JOIN tot
  ),
  bagg AS (
    SELECT probe_id, doc_id, sum(score_t) AS score
    FROM sc GROUP BY probe_id, doc_id
  ),
  tranked AS (
    SELECT probe_id, doc_id,
      row_number() OVER (PARTITION BY probe_id
        ORDER BY score DESC, doc_id ASC) AS rank_text
    FROM bagg WHERE doc_id <> probe_id
  ),
  tcand AS (SELECT probe_id, doc_id, rank_text FROM tranked WHERE rank_text <= $kCand),
  qbase AS (
    SELECT vec_id,
      list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $S) AS BIGINT)) AS q
    FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) = $D
      AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0
      AND len(list_filter(embedding, x -> x <> 0)) > 0
  ),
  nb AS (
    SELECT vec_id, q, CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS nq
    FROM qbase
  ),
  vprobes AS (SELECT vec_id AS probe_id, q AS pq, nq AS pnq FROM nb WHERE vec_id IN ($ids)),
  vpairs AS (
    SELECT p.probe_id, c.vec_id,
      CAST(list_sum(list_transform(range(1, ${D + 1}), i -> p.pq[i] * c.q[i])) AS BIGINT) AS dot_q,
      c.nq, p.pnq
    FROM vprobes p, nb c WHERE c.vec_id <> p.probe_id
  ),
  vranked AS (
    SELECT probe_id, vec_id AS doc_id,
      row_number() OVER (PARTITION BY probe_id ORDER BY
        CAST(dot_q AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(pnq AS DOUBLE))) DESC,
        vec_id ASC) AS rank_vec
    FROM vpairs
  ),
  vcand AS (SELECT probe_id, doc_id, rank_vec FROM vranked WHERE rank_vec <= $kCand),
  fused AS (
    SELECT COALESCE(t.probe_id, v.probe_id) AS probe_id,
      COALESCE(t.doc_id, v.doc_id) AS doc_id,
      COALESCE($RS // ($RK + t.rank_text), 0) + COALESCE($RS // ($RK + v.rank_vec), 0)
        AS rrf_score,
      COALESCE(t.rank_text, 0) AS rank_text,
      COALESCE(v.rank_vec, 0) AS rank_vec
    FROM tcand t FULL OUTER JOIN vcand v
      ON t.probe_id = v.probe_id AND t.doc_id = v.doc_id
  ),
  franked AS (
    SELECT probe_id, doc_id, rrf_score, rank_text, rank_vec,
      row_number() OVER (PARTITION BY probe_id
        ORDER BY rrf_score DESC, doc_id ASC) AS rank
    FROM fused
  )
SELECT probe_id, CAST(rank AS BIGINT) AS rank, doc_id,
  CAST(rrf_score AS BIGINT) AS rrf_score,
  CAST(rank_text AS BIGINT) AS rank_text, CAST(rank_vec AS BIGINT) AS rank_vec
FROM franked WHERE rank <= $k ORDER BY probe_id, rank"""
  }

  /** `search_hybrid_rrf_ivf` oracle: the vector tower candidates
    * come from the query document's routed cell under the TRAINED
    * codebook (the [[SimOracle.ivfProbeSql]] chain, single probe) at
    * the CORPUS-SCALED codebook size (`ksz` — the engine's
    * `numCentsFor` rule; the 100 TB fusion routes against a scaled
    * book, not the demo 8).
    */
  def rrfTopKIvfSql(k: Int = 20, kCand: Int = 50, qTerms: Int = 8): String =
    s"""WITH ${textCtes(kCand, qTerms)},
  ${SimOracle.baseCtes},
  ${SimOracle.kszCte},
  ${SimOracle.codebookCtesK(SimOracle.KScaledSql, Similarity.CodebookIters)},
  vassign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${SimOracle.cosSql(SimOracle.dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC,
        c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  vcells AS (SELECT vec_id, cent_id AS cell_id FROM vassign WHERE rn = 1),
  vprobe AS (
    SELECT n.q AS pq, n.nq AS pnq, c.cell_id
    FROM nb n JOIN vcells c ON c.vec_id = n.vec_id
    WHERE n.vec_id = (SELECT qid FROM qd)
  ),
  vpairs AS (
    SELECT n.vec_id, ${SimOracle.dotSql("p.pq", "n.q")} AS dot_q, n.nq, p.pnq
    FROM vprobe p JOIN vcells c ON c.cell_id = p.cell_id
    JOIN nb n ON n.vec_id = c.vec_id
    WHERE n.vec_id <> (SELECT qid FROM qd)
  ),
  vranked AS (
    SELECT vec_id AS doc_id,
      row_number() OVER (ORDER BY
        ${SimOracle.cosSql("dot_q", "nq", "pnq")} DESC, vec_id ASC) AS rank_vec
    FROM vpairs
  ),
  vcand AS (SELECT doc_id, rank_vec FROM vranked WHERE rank_vec <= $kCand),
${fusionSql(k)}"""
}
