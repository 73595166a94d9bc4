package graft.oracle

import graft.operators.Similarity

/** DuckDB oracle SQL for the similarity family. Mirrors
  * [[graft.operators.Similarity]] stage for stage: same integer
  * quantization (`round(x * 10000)` per component), exact bigint dot
  * products / squared norms, and the identical single float step
  * `dot / (sqrt(na) * sqrt(nb))` — IEEE correctly-rounded in both
  * engines, so rankings and `floor(cos * 10000)` basis points match
  * bit for bit (see the Similarity object doc).
  *
  * DuckDB's `range(a, b)` is a list in scalar position and lists are
  * 1-indexed; `list_sum` over BIGINT widens to HUGEINT, so sums are
  * cast back down.
  */
object SimOracle {

  private val S = Similarity.QuantScale
  private val D = Similarity.Dim

  /** Shared CTEs: quantized vectors + exact squared norms. The WHERE
    * mirrors `Similarity.quantized`'s door (structural admission plus
    * non-null, exactly Dim-dimensional, all components finite) so the
    * two formulations stay semantic twins on junk-bearing corpora —
    * the real sf tables carry no junk vectors, so hashes are
    * unchanged there.
    */
  private[oracle] def baseCtes: String =
    s"""qbase AS (
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
  )"""

  private[oracle] def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, ${D + 1}), i -> $a[i] * $b[i])) AS BIGINT)"

  private[oracle] def cosSql(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))"

  /** The trained-codebook CTE chain (mirrors `Similarity.ivfCodebook`
    * — spherical k-means with sum-centroids, unrolled literally):
    * `cents0` seeds from the first `numCents` vectors, then each
    * round is an argmax-cosine assignment plus a component-wise
    * member SUM (the mean's division is omitted on both sides —
    * cosine is scale-invariant, so every number stays exact). Ends
    * with `cents(cent_id, cq, cnq)` — the same shape the untrained
    * CTE had, so downstream SQL is unchanged.
    */
  private[oracle] def codebookCtes(numCents: Int, iters: Int): String =
    codebookCtesK(numCents.toString, iters)

  /** The corpus-scaled codebook size as SQL — the engine's
    * `Similarity.numCentsFor` formula derived from the same
    * `count(*)` (clamp(8, 65536, floor(sqrt(n)))), so engine and
    * oracle agree on k without a literal being threaded through.
    * Include [[kszCte]] in the WITH chain and seed the codebook via
    * `codebookCtesK(KScaledSql, iters)`.
    */
  private[oracle] val kszCte: String =
    """ksz AS (
    SELECT LEAST(65536, GREATEST(8,
      CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS k
    FROM embeddings
  )"""
  private[oracle] val KScaledSql = "(SELECT k FROM ksz)"

  private[oracle] def codebookCtesK(numCents: String, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"cents${i - 1}"
      s"""assign$i AS (
    SELECT vec_id, cent_id FROM (
      SELECT n.vec_id, c.cent_id,
        row_number() OVER (PARTITION BY n.vec_id ORDER BY
          ${cosSql(dotSql("n.q", "c.cq"), "n.nq", dotSql("c.cq", "c.cq"))} DESC,
          c.cent_id ASC) AS rn
      FROM nb n, $prev c
    ) WHERE rn = 1
  ),
  sums$i AS (
    SELECT a.cent_id, t.d, CAST(sum(n.q[t.d + 1]) AS BIGINT) AS s
    FROM assign$i a JOIN nb n ON n.vec_id = a.vec_id
    CROSS JOIN range(0, $D) t(d)
    GROUP BY a.cent_id, t.d
  ),
  cents$i AS (
    -- zero-norm (all-cancelled) centroids drop like empty cells:
    -- their cosine is 0/0 = NaN and NaN ordering is engine-specific.
    SELECT cent_id, cq FROM (
      SELECT cent_id, list(s ORDER BY d) AS cq FROM sums$i GROUP BY cent_id
    ) WHERE ${dotSql("cq", "cq")} > 0
  )"""
    }.mkString(",\n  ")
    s"""cents0 AS (
    -- the numCents SMALLEST vec_ids (rank form, not `vec_id < k`:
    -- mirrors the engine's ordered-limit seeding, which the predicate
    -- only equals on dense 0-based ids)
    SELECT vec_id AS cent_id, q AS cq FROM nb
    QUALIFY row_number() OVER (ORDER BY vec_id) <= $numCents
  ),
  $rounds,
  cents AS (SELECT cent_id, cq, ${dotSql("cq", "cq")} AS cnq FROM cents$iters)"""
  }

  /** Codebook summary pin: per trained centroid, its member count
    * under the final assignment and the exact squared norm of its
    * sum-vector — one scalar row per cell that moves if ANY component
    * of ANY round drifts (mirrors the `sim_ivf_codebook` query).
    */
  def ivfCodebookSql(numCents: Int = 8,
      iters: Int = Similarity.CodebookIters): String =
    s"""WITH $baseCtes,
  ${codebookCtes(numCents, iters)},
  assign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  cells AS (SELECT vec_id, cent_id AS cell_id FROM assign WHERE rn = 1),
  sizes AS (SELECT cell_id AS cent_id, count(*) AS n_members FROM cells GROUP BY cell_id)
SELECT c.cent_id, CAST(s.n_members AS BIGINT) AS n_members, c.cnq
FROM cents c JOIN sizes s USING (cent_id)
ORDER BY c.cent_id"""

  /** Mirrors `Similarity.clusterBalance`: the assignment re-derived
    * from the unrolled Lloyd rounds, then pure integer balance math.
    */
  def clusterBalanceSql(numCents: Int = 8,
      iters: Int = Similarity.CodebookIters): String =
    s"""WITH $baseCtes,
  ${codebookCtes(numCents, iters)},
  assign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  cells AS (SELECT vec_id, cent_id AS cell_id FROM assign WHERE rn = 1),
  sizes AS (SELECT cell_id, count(*) AS n_members FROM cells GROUP BY cell_id),
  tot AS (SELECT CAST(sum(n_members) AS BIGINT) AS n_total,
    count(*) AS n_cells FROM sizes)
SELECT CAST(cell_id AS BIGINT) AS cell_id,
  CAST(n_members AS BIGINT) AS n_members,
  CAST((n_members * 10000) // n_total AS BIGINT) AS share_bp,
  CAST(least(n_members, n_total // n_cells) AS BIGINT) AS keep_cap,
  CAST(least(10000, ((n_total // n_cells) * 10000) // n_members) AS BIGINT) AS weight_bp
FROM sizes CROSS JOIN tot ORDER BY cell_id"""

  /** Mirrors `Similarity.cellCapApplied`: the balanced-sampling cap
    * applied — per-vector keep/drop under the per-cell keep_cap,
    * keeper = smallest vec_id first, rank ties on duplicate ids
    * interchangeable (same payload, same cell), final order total on
    * (vec_id, cell_rank).
    */
  def cellCapAppliedSql(numCents: Int = 8,
      iters: Int = Similarity.CodebookIters): String =
    s"""WITH $baseCtes,
  ${codebookCtes(numCents, iters)},
  assign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  cells AS (SELECT vec_id, cent_id AS cell_id FROM assign WHERE rn = 1),
  sizes AS (SELECT cell_id, count(*) AS n_members FROM cells GROUP BY cell_id),
  tot AS (SELECT CAST(sum(n_members) AS BIGINT) AS n_total,
    count(*) AS n_cells FROM sizes),
  caps AS (
    SELECT cell_id, least(n_members, n_total // n_cells) AS keep_cap
    FROM sizes CROSS JOIN tot
  ),
  ranked AS (
    SELECT vec_id, cell_id,
      row_number() OVER (PARTITION BY cell_id ORDER BY vec_id) AS cell_rank
    FROM cells
  )
SELECT r.vec_id, CAST(r.cell_id AS BIGINT) AS cell_id,
  CAST(r.cell_rank AS BIGINT) AS cell_rank,
  CAST(CASE WHEN r.cell_rank <= c.keep_cap THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM ranked r JOIN caps c USING (cell_id)
ORDER BY r.vec_id, r.cell_rank"""

  def cosineTopKSql(k: Int = 10, probeMod: Int = 50): String =
    s"""WITH $baseCtes,
  probes AS (SELECT vec_id AS qid, q AS pq, nq AS pnq FROM nb WHERE vec_id % $probeMod = 0),
  pairs AS (
    SELECT p.qid, c.vec_id, ${dotSql("p.pq", "c.q")} AS dot_q, c.nq, p.pnq
    FROM probes p, nb c WHERE c.vec_id <> p.qid
  ),
  scored AS (
    SELECT qid, vec_id, dot_q, ${cosSql("dot_q", "nq", "pnq")} AS cosd FROM pairs
  ),
  ranked AS (
    SELECT qid, vec_id, dot_q, CAST(floor(cosd * $S) AS BIGINT) AS cos_bp,
      row_number() OVER (PARTITION BY qid ORDER BY cosd DESC, vec_id ASC) AS rank
    FROM scored
  )
SELECT qid, rank, vec_id, dot_q, cos_bp FROM ranked WHERE rank <= $k ORDER BY qid, rank"""

  /** [[graft.operators.Similarity.cosineTopKDiverse]]: the exact
    * top-kCand chain, a recursive closure over the sign-LSH verified
    * near-dup pairs (the `dedup_embedding_cosine` pair rung), best
    * rank per (probe, cluster), re-rank, truncate — every stage an
    * independent DuckDB formulation of the Spark pipeline.
    */
  def topKDiverseSql(k: Int = 10, kCand: Int = 30, probeMod: Int = 50,
      minCosBp: Int = 3000): String = {
    val nBands = Similarity.NumBands
    val bBits = Similarity.BandBits
    s"""WITH RECURSIVE $baseCtes,
  bands AS (
    SELECT vec_id, b AS band_ix,
      CAST(list_sum(list_transform(range(0, $bBits),
        j -> CASE WHEN q[b * $bBits + j + 1] >= 0 THEN 1 << j ELSE 0 END)) AS BIGINT) AS band_v
    FROM nb, range(0, $nBands) t(b)
  ),
  cand AS (
    SELECT DISTINCT a.vec_id AS vec_x, b.vec_id AS vec_y
    FROM bands a
    JOIN bands b ON a.band_ix = b.band_ix AND a.band_v = b.band_v AND a.vec_id < b.vec_id
  ),
  nd AS (
    SELECT c.vec_x, c.vec_y
    FROM cand c JOIN nb x ON x.vec_id = c.vec_x JOIN nb y ON y.vec_id = c.vec_y
    WHERE CAST(floor(${cosSql(dotSql("x.q", "y.q"), "x.nq", "y.nq")} * $S) AS BIGINT) >= $minCosBp
  ),
  edges AS (SELECT vec_x AS s, vec_y AS d FROM nd UNION ALL SELECT vec_y, vec_x FROM nd),
  reach(v, lbl) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
    UNION
    SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.v
  ),
  labels AS (SELECT v AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY v),
  probes AS (SELECT vec_id AS qid, q AS pq, nq AS pnq FROM nb WHERE vec_id % $probeMod = 0),
  prs AS (
    SELECT p.qid, c.vec_id, ${dotSql("p.pq", "c.q")} AS dot_q, c.nq, p.pnq
    FROM probes p, nb c WHERE c.vec_id <> p.qid
  ),
  scored AS (SELECT qid, vec_id, ${cosSql("dot_q", "nq", "pnq")} AS cosd FROM prs),
  ranked AS (
    SELECT qid, vec_id, CAST(floor(cosd * $S) AS BIGINT) AS cos_bp,
      row_number() OVER (PARTITION BY qid ORDER BY cosd DESC, vec_id ASC) AS rank
    FROM scored
  ),
  topc AS (SELECT * FROM ranked WHERE rank <= $kCand),
  grp AS (
    SELECT t.qid, t.vec_id, t.cos_bp, t.rank,
      coalesce(l.cluster_id, t.vec_id) AS cluster_id
    FROM topc t LEFT JOIN labels l ON l.vec_id = t.vec_id
  ),
  best AS (
    SELECT *, row_number() OVER (PARTITION BY qid, cluster_id ORDER BY rank) AS pick
    FROM grp
  ),
  rer AS (
    SELECT qid, vec_id, cluster_id, cos_bp,
      row_number() OVER (PARTITION BY qid ORDER BY rank) AS rank2
    FROM best WHERE pick = 1
  )
SELECT qid, CAST(rank2 AS BIGINT) AS rank, vec_id, cluster_id, cos_bp
FROM rer WHERE rank2 <= $k ORDER BY qid, rank"""
  }

  def lshPairsSql(minCosBp: Int = 3000): String = {
    val nBands = Similarity.NumBands
    val bBits = Similarity.BandBits
    s"""WITH $baseCtes,
  bands AS (
    SELECT vec_id, b AS band_ix,
      CAST(list_sum(list_transform(range(0, $bBits),
        j -> CASE WHEN q[b * $bBits + j + 1] >= 0 THEN 1 << j ELSE 0 END)) AS BIGINT) AS band_v
    FROM nb, range(0, $nBands) t(b)
  ),
  cand AS (
    SELECT DISTINCT a.vec_id AS vec_x, b.vec_id AS vec_y
    FROM bands a
    JOIN bands b ON a.band_ix = b.band_ix AND a.band_v = b.band_v AND a.vec_id < b.vec_id
  ),
  verified AS (
    SELECT c.vec_x, c.vec_y, ${dotSql("x.q", "y.q")} AS dot_q, x.nq AS nx, y.nq AS ny
    FROM cand c JOIN nb x ON x.vec_id = c.vec_x JOIN nb y ON y.vec_id = c.vec_y
  )
SELECT vec_x, vec_y, dot_q,
  CAST(floor(${cosSql("dot_q", "nx", "ny")} * $S) AS BIGINT) AS cos_bp
FROM verified
WHERE CAST(floor(${cosSql("dot_q", "nx", "ny")} * $S) AS BIGINT) >= $minCosBp
ORDER BY vec_x, vec_y"""
  }

  /** Mirrors `Similarity.searchAuto`'s small-corpus route: the exact
    * top-k projected to the dispatcher's common columns.
    */
  def searchAutoSql(k: Int = 10, probeMod: Int = 50): String =
    s"""SELECT qid, rank, vec_id, cos_bp FROM (
${cosineTopKSql(k, probeMod)}
) ORDER BY qid, rank"""

  /** Mirrors `CorpusPrep.semanticDecontaminate` (train-vs-eval
    * banded candidates, exact-cosine verify, left-joined per-doc
    * aggregation with the -10000 no-hit sentinel).
    */
  def semanticDecontaminateSql(evalMod: Int = 23, minCosBp: Int = 3000): String = {
    val nBands = Similarity.NumBands
    val bBits = Similarity.BandBits
    s"""WITH $baseCtes,
  bands AS (
    SELECT vec_id, b AS band_ix,
      CAST(list_sum(list_transform(range(0, $bBits),
        j -> CASE WHEN q[b * $bBits + j + 1] >= 0 THEN 1 << j ELSE 0 END)) AS BIGINT) AS band_v
    FROM nb, range(0, $nBands) t(b)
  ),
  scand AS (
    SELECT DISTINCT a.vec_id AS doc_id, b.vec_id AS eval_id
    FROM bands a
    JOIN bands b ON a.band_ix = b.band_ix AND a.band_v = b.band_v
    WHERE a.vec_id % $evalMod <> 0 AND b.vec_id % $evalMod = 0
  ),
  sver AS (
    SELECT c.doc_id, c.eval_id, ${dotSql("x.q", "y.q")} AS dot_q,
      x.nq AS nx, y.nq AS ny
    FROM scand c
    JOIN nb x ON x.vec_id = c.doc_id
    JOIN nb y ON y.vec_id = c.eval_id
  ),
  shits AS (
    SELECT doc_id, eval_id,
      CAST(floor(${cosSql("dot_q", "nx", "ny")} * $S) AS BIGINT) AS cos_bp
    FROM sver
    WHERE CAST(floor(${cosSql("dot_q", "nx", "ny")} * $S) AS BIGINT) >= $minCosBp
  ),
  sagg AS (
    SELECT doc_id, count(*) AS n_eval_hits, max(cos_bp) AS max_cos_bp
    FROM shits GROUP BY doc_id
  )
SELECT n.vec_id AS doc_id,
  CAST(coalesce(a.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
  CAST(coalesce(a.max_cos_bp, -10000) AS BIGINT) AS max_cos_bp,
  CAST(CASE WHEN a.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS flagged
FROM nb n LEFT JOIN sagg a ON a.doc_id = n.vec_id
WHERE n.vec_id % $evalMod <> 0
ORDER BY doc_id"""
  }

  /** LSH recall audit (mirrors `Similarity.lshRecall`). */
  def lshRecallSql(k: Int = 10, probeMod: Int = 50): String = {
    val nBands = Similarity.NumBands
    val bBits = Similarity.BandBits
    s"""WITH $baseCtes,
  probes AS (SELECT vec_id AS qid, q AS pq, nq AS pnq FROM nb WHERE vec_id % $probeMod = 0),
  scored AS (
    SELECT p.qid, c.vec_id,
      ${cosSql(dotSql("p.pq", "c.q"), "c.nq", "p.pnq")} AS cosd
    FROM probes p, nb c WHERE c.vec_id <> p.qid
  ),
  topk AS (
    SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
        row_number() OVER (PARTITION BY qid ORDER BY cosd DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= $k
  ),
  bands AS (
    SELECT vec_id, b AS band_ix,
      CAST(list_sum(list_transform(range(0, $bBits),
        j -> CASE WHEN q[b * $bBits + j + 1] >= 0 THEN 1 << j ELSE 0 END)) AS BIGINT) AS band_v
    FROM nb, range(0, $nBands) t(b)
  ),
  band_pairs AS (
    SELECT DISTINCT a.vec_id AS qid, b.vec_id AS vec_id
    FROM bands a
    JOIN bands b ON a.band_ix = b.band_ix AND a.band_v = b.band_v
      AND a.vec_id <> b.vec_id
  ),
  hits AS (
    SELECT t.qid, count(*) AS hits
    FROM topk t JOIN band_pairs bp ON bp.qid = t.qid AND bp.vec_id = t.vec_id
    GROUP BY t.qid
  )
SELECT q.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
  CAST($k AS BIGINT) AS k,
  CAST(floor(10000 * coalesce(h.hits, 0) / $k) AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT qid FROM topk) q
LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid"""
  }

  /** Document-level embedding-cosine near-dup: the lshPairs pipeline
    * joined back to `documents` (mirrors `Dedup.embeddingCosine`).
    */
  def embeddingCosineSql(minCosBp: Int = 3000): String = {
    val nBands = Similarity.NumBands
    val bBits = Similarity.BandBits
    s"""WITH $baseCtes,
  bands AS (
    SELECT vec_id, b AS band_ix,
      CAST(list_sum(list_transform(range(0, $bBits),
        j -> CASE WHEN q[b * $bBits + j + 1] >= 0 THEN 1 << j ELSE 0 END)) AS BIGINT) AS band_v
    FROM nb, range(0, $nBands) t(b)
  ),
  cand AS (
    SELECT DISTINCT a.vec_id AS vec_x, b.vec_id AS vec_y
    FROM bands a
    JOIN bands b ON a.band_ix = b.band_ix AND a.band_v = b.band_v AND a.vec_id < b.vec_id
  ),
  verified AS (
    SELECT c.vec_x, c.vec_y,
      CAST(floor(${cosSql(dotSql("x.q", "y.q"), "x.nq", "y.nq")} * $S) AS BIGINT) AS cos_bp
    FROM cand c JOIN nb x ON x.vec_id = c.vec_x JOIN nb y ON y.vec_id = c.vec_y
  )
SELECT dx.doc_id AS doc_x, dy.doc_id AS doc_y, v.cos_bp,
  CAST(CASE WHEN dx.lang = dy.lang THEN 1 ELSE 0 END AS BIGINT) AS same_lang
FROM verified v
JOIN documents dx ON dx.doc_id = v.vec_x
JOIN documents dy ON dy.doc_id = v.vec_y
WHERE v.cos_bp >= $minCosBp
ORDER BY doc_x, doc_y"""
  }

  /** nprobe=1 recall per probe (mirrors `Similarity.ivfRecall`). */
  def ivfRecallSql(k: Int = 10, numCents: Int = 8, probeMod: Int = 50): String =
    s"""WITH $baseCtes,
  probes AS (SELECT vec_id AS qid, q AS pq, nq AS pnq FROM nb WHERE vec_id % $probeMod = 0),
  scored AS (
    SELECT p.qid, c.vec_id,
      ${cosSql(dotSql("p.pq", "c.q"), "c.nq", "p.pnq")} AS cosd
    FROM probes p, nb c WHERE c.vec_id <> p.qid
  ),
  topk AS (
    SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
        row_number() OVER (PARTITION BY qid ORDER BY cosd DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= $k
  ),
  ${codebookCtes(numCents, Similarity.CodebookIters)},
  assign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  cells AS (SELECT vec_id, cent_id AS cell_id FROM assign WHERE rn = 1),
  qcells AS (
    SELECT vec_id AS qid, cell_id AS qcell FROM cells WHERE vec_id % $probeMod = 0
  ),
  hits AS (
    SELECT t.qid, count(*) AS hits
    FROM topk t
    JOIN cells c ON c.vec_id = t.vec_id
    JOIN qcells qc ON qc.qid = t.qid
    WHERE c.cell_id = qc.qcell
    GROUP BY t.qid
  )
SELECT q.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
  CAST($k AS BIGINT) AS k,
  CAST(floor(10000 * coalesce(h.hits, 0) / $k) AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT qid FROM topk) q
LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid"""

  /** [[ivfRecallSql]] at the CORPUS-SCALED codebook size (`ksz` —
    * the engine's `numCentsFor` rule): the recall measurement that
    * accompanies the scaled k, so the sizing rule ships with its
    * quality number instead of a caveat (round-8 verdict #2 — record
    * recall at both k; the pinned-8 audit above stays registered).
    */
  def ivfRecallScaledSql(k: Int = 10, probeMod: Int = 50): String =
    s"""WITH $baseCtes,
  $kszCte,
  probes AS (SELECT vec_id AS qid, q AS pq, nq AS pnq FROM nb WHERE vec_id % $probeMod = 0),
  scored AS (
    SELECT p.qid, c.vec_id,
      ${cosSql(dotSql("p.pq", "c.q"), "c.nq", "p.pnq")} AS cosd
    FROM probes p, nb c WHERE c.vec_id <> p.qid
  ),
  topk AS (
    SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
        row_number() OVER (PARTITION BY qid ORDER BY cosd DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= $k
  ),
  ${codebookCtesK(KScaledSql, Similarity.CodebookIters)},
  assign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  cells AS (SELECT vec_id, cent_id AS cell_id FROM assign WHERE rn = 1),
  qcells AS (
    SELECT vec_id AS qid, cell_id AS qcell FROM cells WHERE vec_id % $probeMod = 0
  ),
  hits AS (
    SELECT t.qid, count(*) AS hits
    FROM topk t
    JOIN cells c ON c.vec_id = t.vec_id
    JOIN qcells qc ON qc.qid = t.qid
    WHERE c.cell_id = qc.qcell
    GROUP BY t.qid
  )
SELECT q.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
  CAST($k AS BIGINT) AS k,
  CAST(floor(10000 * coalesce(h.hits, 0) / $k) AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT qid FROM topk) q
LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid"""

  /** Multi-probe recall (mirrors `Similarity.ivfRecallMulti`): a
    * neighbor counts when its cell is among the probe's top-nprobe
    * routed cells.
    */
  def ivfRecallMultiSql(k: Int = 10, numCents: Int = 8, probeMod: Int = 50,
      nprobe: Int = 2): String =
    s"""WITH $baseCtes,
  probes AS (SELECT vec_id AS qid, q AS pq, nq AS pnq FROM nb WHERE vec_id % $probeMod = 0),
  scored AS (
    SELECT p.qid, c.vec_id,
      ${cosSql(dotSql("p.pq", "c.q"), "c.nq", "p.pnq")} AS cosd
    FROM probes p, nb c WHERE c.vec_id <> p.qid
  ),
  topk AS (
    SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
        row_number() OVER (PARTITION BY qid ORDER BY cosd DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= $k
  ),
  ${codebookCtes(numCents, Similarity.CodebookIters)},
  assign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  cells AS (SELECT vec_id, cent_id AS cell_id FROM assign WHERE rn = 1),
  qroutes AS (
    SELECT vec_id AS qid, cent_id AS qcell FROM assign
    WHERE vec_id % $probeMod = 0 AND rn <= $nprobe
  ),
  hits AS (
    SELECT t.qid, count(*) AS hits
    FROM topk t
    JOIN cells c ON c.vec_id = t.vec_id
    JOIN qroutes qr ON qr.qid = t.qid AND qr.qcell = c.cell_id
    GROUP BY t.qid
  )
SELECT q.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
  CAST($k AS BIGINT) AS k,
  CAST(floor(10000 * coalesce(h.hits, 0) / $k) AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT qid FROM topk) q
LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid"""

  /** Multi-probe search (mirrors `Similarity.ivfProbeMulti`):
    * candidates come from each probe's top-nprobe routed cells.
    */
  def ivfProbeMultiSql(k: Int = 5, numCents: Int = 8, probeMod: Int = 50,
      nprobe: Int = 2): String =
    s"""WITH $baseCtes,
  ${codebookCtes(numCents, Similarity.CodebookIters)},
  assign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  cells AS (SELECT vec_id, cent_id AS cell_id FROM assign WHERE rn = 1),
  probes AS (
    SELECT n.vec_id AS qid, n.q AS pq, n.nq AS pnq, a.cent_id AS cell_id
    FROM nb n JOIN assign a ON a.vec_id = n.vec_id
    WHERE n.vec_id % $probeMod = 0 AND a.rn <= $nprobe
  ),
  scored AS (
    SELECT p.qid, n.vec_id, ${dotSql("p.pq", "n.q")} AS dot_q, n.nq, p.pnq
    FROM probes p JOIN cells c ON c.cell_id = p.cell_id JOIN nb n ON n.vec_id = c.vec_id
    WHERE n.vec_id <> p.qid
  ),
  ranked AS (
    SELECT qid, vec_id, dot_q,
      CAST(floor(${cosSql("dot_q", "nq", "pnq")} * $S) AS BIGINT) AS cos_bp,
      row_number() OVER (PARTITION BY qid ORDER BY
        ${cosSql("dot_q", "nq", "pnq")} DESC, vec_id ASC) AS rank
    FROM scored
  )
SELECT qid, rank, vec_id, dot_q, cos_bp
FROM ranked WHERE rank <= $k ORDER BY qid, rank"""

  // ----- Product quantization (mirrors Similarity.pq*) ------------

  private val PqM = Similarity.PqSubspaces
  private val PqSd = Similarity.PqSubDim

  /** Subspace dot product (subdim-wide lists). */
  private def sdotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, ${PqSd + 1}), i -> $a[i] * $b[i])) AS BIGINT)"

  /** The PQ training + coding CTE chain, unrolled per subspace and
    * Lloyd round (mirrors `Similarity.pqCodebook`/`pqCodes`): exact
    * integer L2 argmin (`|c|^2 - 2<x,c>`; the `|x|^2` term is
    * constant under the argmin), truncated integer-mean updates
    * (`//` and Spark's `div` both truncate toward zero — verified
    * empirically, signed sums make this matter). Ends with
    * `pqbook(m, cent_id, cq)` and `pqcodes(vec_id, m, code)`.
    */
  private def pqCtes(numCents: Int, iters: Int): String = {
    def assignSql(m: Int, centsCte: String): String =
      s"""SELECT vec_id, cent_id FROM (
      SELECT s.vec_id, c.cent_id,
        row_number() OVER (PARTITION BY s.vec_id ORDER BY
          ${sdotSql("c.cq", "c.cq")} - 2 * ${sdotSql("s.q", "c.cq")} ASC,
          c.cent_id ASC) AS rn
      FROM sub$m s, $centsCte c
    ) WHERE rn = 1"""
    val perSub = (0 until PqM).map { m =>
      val lo = m * PqSd + 1
      val hi = (m + 1) * PqSd
      val rounds = (1 to iters).map { i =>
        s"""pa${m}_$i AS (
    ${assignSql(m, s"pc${m}_${i - 1}")}
  ),
  ps${m}_$i AS (
    SELECT a.cent_id, t.d, CAST(sum(s.q[t.d + 1]) AS BIGINT) AS sm,
      count(*) AS cnt
    FROM pa${m}_$i a JOIN sub$m s ON s.vec_id = a.vec_id
    CROSS JOIN range(0, $PqSd) t(d)
    GROUP BY a.cent_id, t.d
  ),
  pc${m}_$i AS (
    SELECT cent_id, list(sm // cnt ORDER BY d) AS cq FROM ps${m}_$i GROUP BY cent_id
  )"""
      }.mkString(",\n  ")
      s"""sub$m AS (SELECT vec_id, q[$lo:$hi] AS q FROM nb),
  pc${m}_0 AS (SELECT vec_id AS cent_id, q AS cq FROM sub$m
    QUALIFY row_number() OVER (ORDER BY vec_id) <= $numCents),
  $rounds"""
    }.mkString(",\n  ")
    val book = (0 until PqM)
      .map(m => s"SELECT CAST($m AS BIGINT) AS m, CAST(cent_id AS BIGINT) AS cent_id, cq FROM pc${m}_$iters")
      .mkString("\n    UNION ALL ")
    val codes = (0 until PqM)
      .map(m => s"""SELECT vec_id, CAST($m AS BIGINT) AS m, CAST(cent_id AS BIGINT) AS code FROM (
      ${assignSql(m, s"pc${m}_$iters")}
    )""")
      .mkString("\n    UNION ALL ")
    s"""$perSub,
  pqbook AS (
    $book
  ),
  pqcodes AS (
    $codes
  )"""
  }

  /** Mirrors `Similarity.pqCodebookSummary`. */
  def pqCodebookSummarySql(numCents: Int = Similarity.PqCents,
      iters: Int = Similarity.PqIters): String =
    s"""WITH $baseCtes,
  ${pqCtes(numCents, iters)},
  sizes AS (SELECT m, code, count(*) AS n_members FROM pqcodes GROUP BY m, code)
SELECT b.m, b.cent_id, CAST(s.n_members AS BIGINT) AS n_members,
  ${sdotSql("b.cq", "b.cq")} AS cnq
FROM pqbook b JOIN sizes s ON s.m = b.m AND s.code = b.cent_id
ORDER BY b.m, b.cent_id"""

  /** ADC + exact-rerank CTE chain ending in `pqranked` (mirrors
    * `Similarity.pqTopK`); shared by the top-k and recall oracles.
    */
  private def pqTopKCtes(k: Int, probeMod: Int, numCents: Int,
      iters: Int): String =
    s"""${pqCtes(numCents, iters)},
  pprobes AS (SELECT vec_id AS qid, q AS pq, nq AS pnq FROM nb WHERE vec_id % $probeMod = 0),
  lut AS (
    SELECT p.qid, b.m, b.cent_id AS code,
      CAST(list_sum(list_transform(range(1, ${PqSd + 1}),
        i -> p.pq[CAST(b.m * $PqSd AS INT) + i] * b.cq[i])) AS BIGINT) AS pdot
    FROM pprobes p, pqbook b
  ),
  adc AS (
    SELECT l.qid, c.vec_id, CAST(sum(l.pdot) AS BIGINT) AS adc_dot
    FROM pqcodes c JOIN lut l ON l.m = c.m AND l.code = c.code
    WHERE c.vec_id <> l.qid
    GROUP BY l.qid, c.vec_id
  ),
  pool AS (
    SELECT qid, vec_id, adc_dot,
      row_number() OVER (PARTITION BY qid ORDER BY adc_dot DESC, vec_id ASC) AS arn
    FROM adc
  ),
  rr AS (
    SELECT p.qid, p.vec_id, p.adc_dot, ${dotSql("pb.pq", "n.q")} AS dot_q,
      n.nq, pb.pnq
    FROM pool p
    JOIN nb n ON n.vec_id = p.vec_id
    JOIN pprobes pb ON pb.qid = p.qid
    WHERE p.arn <= ${Similarity.PqRerankFactor * k}
  ),
  pqranked AS (
    SELECT qid, vec_id, adc_dot, dot_q,
      CAST(floor(${cosSql("dot_q", "nq", "pnq")} * $S) AS BIGINT) AS cos_bp,
      row_number() OVER (PARTITION BY qid ORDER BY
        ${cosSql("dot_q", "nq", "pnq")} DESC, vec_id ASC) AS rank
    FROM rr
  )"""

  /** Mirrors `Similarity.pqTopK`. */
  def pqTopKSql(k: Int = 10, probeMod: Int = 50,
      numCents: Int = Similarity.PqCents,
      iters: Int = Similarity.PqIters): String =
    s"""WITH $baseCtes,
  ${pqTopKCtes(k, probeMod, numCents, iters)}
SELECT qid, rank, vec_id, adc_dot, dot_q, cos_bp
FROM pqranked WHERE rank <= $k ORDER BY qid, rank"""

  /** Mirrors `Similarity.pqRecall`: exact brute-force top-k vs the
    * PQ pipeline's final top-k, per probe, failures counted.
    */
  def pqRecallSql(k: Int = 10, probeMod: Int = 50,
      numCents: Int = Similarity.PqCents,
      iters: Int = Similarity.PqIters): String =
    s"""WITH $baseCtes,
  ${pqTopKCtes(k, probeMod, numCents, iters)},
  got AS (SELECT qid, vec_id FROM pqranked WHERE rank <= $k),
  exact_pairs AS (
    SELECT p.qid, c.vec_id, ${cosSql(dotSql("p.pq", "c.q"), "c.nq", "p.pnq")} AS cosd
    FROM pprobes p, nb c WHERE c.vec_id <> p.qid
  ),
  exact_topk AS (
    SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
        row_number() OVER (PARTITION BY qid ORDER BY cosd DESC, vec_id ASC) AS rank
      FROM exact_pairs
    ) WHERE rank <= $k
  ),
  hits AS (
    SELECT e.qid, count(*) AS hits
    FROM exact_topk e JOIN got g ON g.qid = e.qid AND g.vec_id = e.vec_id
    GROUP BY e.qid
  )
SELECT q.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
  CAST($k AS BIGINT) AS k,
  CAST(floor(10000.0 * coalesce(h.hits, 0) / $k) AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT qid FROM exact_topk) q
LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid"""

  /** IVF-PQ CTE chain ending in `ipqranked` (mirrors
    * `Similarity.ivfPqTopK`): trained spherical router (`cents` from
    * [[codebookCtes]]) + PQ codes ([[pqCtes]]) + candidate-restricted
    * ADC + exact re-rank. Shared by the top-k and recall oracles.
    */
  private def ivfPqCtes(k: Int, probeMod: Int, numCents: Int,
      nprobe: Int, pqCents: Int, pqIters: Int): String =
    s"""${codebookCtes(numCents, Similarity.CodebookIters)},
  iassign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  icells AS (SELECT vec_id, cent_id AS cell_id FROM iassign WHERE rn = 1),
  ${pqCtes(pqCents, pqIters)},
  pprobes AS (SELECT vec_id AS qid, q AS pq, nq AS pnq FROM nb WHERE vec_id % $probeMod = 0),
  routes AS (
    SELECT qid, cent_id AS cell_id FROM (
      SELECT p.qid, c.cent_id,
        row_number() OVER (PARTITION BY p.qid ORDER BY
          ${cosSql(dotSql("p.pq", "c.cq"), "p.pnq", "c.cnq")} DESC, c.cent_id ASC) AS rn
      FROM pprobes p, cents c
    ) WHERE rn <= $nprobe
  ),
  lut AS (
    SELECT p.qid, b.m, b.cent_id AS code,
      CAST(list_sum(list_transform(range(1, ${PqSd + 1}),
        i -> p.pq[CAST(b.m * $PqSd AS INT) + i] * b.cq[i])) AS BIGINT) AS pdot
    FROM pprobes p, pqbook b
  ),
  adc AS (
    SELECT r.qid, cl.vec_id, CAST(sum(l.pdot) AS BIGINT) AS adc_dot
    FROM routes r
    JOIN icells cl ON cl.cell_id = r.cell_id AND cl.vec_id <> r.qid
    JOIN pqcodes pc ON pc.vec_id = cl.vec_id
    JOIN lut l ON l.qid = r.qid AND l.m = pc.m AND l.code = pc.code
    GROUP BY r.qid, cl.vec_id
  ),
  pool AS (
    SELECT qid, vec_id, adc_dot,
      row_number() OVER (PARTITION BY qid ORDER BY adc_dot DESC, vec_id ASC) AS arn
    FROM adc
  ),
  rr AS (
    SELECT p.qid, p.vec_id, p.adc_dot, ${dotSql("pb.pq", "n.q")} AS dot_q,
      n.nq, pb.pnq
    FROM pool p
    JOIN nb n ON n.vec_id = p.vec_id
    JOIN pprobes pb ON pb.qid = p.qid
    WHERE p.arn <= ${Similarity.PqRerankFactor * k}
  ),
  ipqranked AS (
    SELECT qid, vec_id, adc_dot, dot_q,
      CAST(floor(${cosSql("dot_q", "nq", "pnq")} * $S) AS BIGINT) AS cos_bp,
      row_number() OVER (PARTITION BY qid ORDER BY
        ${cosSql("dot_q", "nq", "pnq")} DESC, vec_id ASC) AS rank
    FROM rr
  )"""

  /** Mirrors `Similarity.ivfPqTopK`. */
  def ivfPqTopKSql(k: Int = 10, probeMod: Int = 50, numCents: Int = 8,
      nprobe: Int = 2, pqCents: Int = Similarity.PqCents,
      pqIters: Int = Similarity.PqIters): String =
    s"""WITH $baseCtes,
  ${ivfPqCtes(k, probeMod, numCents, nprobe, pqCents, pqIters)}
SELECT qid, rank, vec_id, adc_dot, dot_q, cos_bp
FROM ipqranked WHERE rank <= $k ORDER BY qid, rank"""

  /** Mirrors `Similarity.ivfPqRecall`. */
  def ivfPqRecallSql(k: Int = 10, probeMod: Int = 50, numCents: Int = 8,
      nprobe: Int = 2, pqCents: Int = Similarity.PqCents,
      pqIters: Int = Similarity.PqIters): String =
    s"""WITH $baseCtes,
  ${ivfPqCtes(k, probeMod, numCents, nprobe, pqCents, pqIters)},
  got AS (SELECT qid, vec_id FROM ipqranked WHERE rank <= $k),
  exact_pairs AS (
    SELECT p.qid, c.vec_id, ${cosSql(dotSql("p.pq", "c.q"), "c.nq", "p.pnq")} AS cosd
    FROM pprobes p, nb c WHERE c.vec_id <> p.qid
  ),
  exact_topk AS (
    SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
        row_number() OVER (PARTITION BY qid ORDER BY cosd DESC, vec_id ASC) AS rank
      FROM exact_pairs
    ) WHERE rank <= $k
  ),
  hits AS (
    SELECT e.qid, count(*) AS hits
    FROM exact_topk e JOIN got g ON g.qid = e.qid AND g.vec_id = e.vec_id
    GROUP BY e.qid
  )
SELECT q.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
  CAST($k AS BIGINT) AS k,
  CAST(floor(10000.0 * coalesce(h.hits, 0) / $k) AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT qid FROM exact_topk) q
LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid"""

  def ivfProbeSql(k: Int = 5, numCents: Int = 8, probeMod: Int = 50): String =
    s"""WITH $baseCtes,
  ${codebookCtes(numCents, Similarity.CodebookIters)},
  assign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  cells AS (SELECT vec_id, cent_id AS cell_id FROM assign WHERE rn = 1),
  probes AS (
    SELECT n.vec_id AS qid, n.q AS pq, n.nq AS pnq, c.cell_id
    FROM nb n JOIN cells c ON c.vec_id = n.vec_id WHERE n.vec_id % $probeMod = 0
  ),
  scored AS (
    SELECT p.qid, p.cell_id, n.vec_id, ${dotSql("p.pq", "n.q")} AS dot_q, n.nq, p.pnq
    FROM probes p JOIN cells c ON c.cell_id = p.cell_id JOIN nb n ON n.vec_id = c.vec_id
    WHERE n.vec_id <> p.qid
  ),
  ranked AS (
    SELECT qid, cell_id, vec_id, dot_q,
      CAST(floor(${cosSql("dot_q", "nq", "pnq")} * $S) AS BIGINT) AS cos_bp,
      row_number() OVER (PARTITION BY qid ORDER BY
        ${cosSql("dot_q", "nq", "pnq")} DESC, vec_id ASC) AS rank
    FROM scored
  )
SELECT qid, cell_id, rank, vec_id, dot_q, cos_bp
FROM ranked WHERE rank <= $k ORDER BY qid, rank"""

  /** SemDeDup oracle (`Dedup.semanticCells`): trained-codebook cell
    * assignment, exhaustive within-cell pairs at the exact quantized
    * cosine threshold, keeper-by-min-id rollup. The codebook size is
    * DERIVED from the corpus (`ksz` — the engine's `numCentsFor`
    * rule): SemDeDup's n²/k economics are the whole point of the
    * operator, so its k scales instead of staying pinned at the
    * demo 8 (round-8 verdict #2).
    */
  def semanticCellsSql(minCosBp: Int = 3000): String =
    s"""WITH $baseCtes,
  $kszCte,
  ${codebookCtesK(KScaledSql, Similarity.CodebookIters)},
  vassign AS (
    SELECT n.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        ${cosSql(dotSql("n.q", "c.cq"), "n.nq", "c.cnq")} DESC, c.cent_id ASC) AS rn
    FROM nb n, cents c
  ),
  vcells AS (SELECT vec_id, cent_id AS cell_id FROM vassign WHERE rn = 1),
  qc AS (
    SELECT c.cell_id, n.vec_id, n.q, n.nq
    FROM nb n JOIN vcells c USING (vec_id)
  ),
  spairs AS (
    SELECT a.vec_y, a.cos_bp FROM (
      SELECT b.vec_id AS vec_y,
        CAST(floor(${cosSql(dotSql("a.q", "b.q"), "a.nq", "b.nq")} * $S) AS BIGINT) AS cos_bp
      FROM qc a JOIN qc b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    ) a WHERE a.cos_bp >= $minCosBp
  ),
  sflags AS (
    SELECT vec_y AS doc_id, count(*) AS n_dups, max(cos_bp) AS max_cos_bp
    FROM spairs GROUP BY vec_y
  )
SELECT c.vec_id AS doc_id, CAST(c.cell_id AS BIGINT) AS cell_id,
  CAST(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
  CAST(coalesce(f.n_dups, 0) AS BIGINT) AS n_dups,
  CAST(coalesce(f.max_cos_bp, 0) AS BIGINT) AS max_cos_bp
FROM vcells c LEFT JOIN sflags f ON f.doc_id = c.vec_id
ORDER BY doc_id"""
}
