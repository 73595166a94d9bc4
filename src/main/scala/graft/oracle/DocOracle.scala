package graft.oracle

import graft.functions.Tokenize

/** DuckDB oracle SQL for the document pipeline families (dedup, text
  * analysis). Mirrors [[graft.operators.Dedup]] /
  * [[graft.operators.TextAnalysis]] stage for stage: same cleaning
  * chain, same md5-based hashing, same integer (basis-point) scores.
  *
  * DuckDB list indexing is 1-based (`w[i]`); the Spark side indexes
  * 0-based with a shifted `sequence`, producing identical shingles.
  */
object DocOracle {

  /** `(strpos-arithmetic)` rendering of "first 8 md5 hex chars as a
    * 32-bit integer" — DuckDB 1.0 has no hex->int conversion, so the
    * oracle decodes positionally. Spark computes the same value via
    * `conv(substr(md5(x),1,8),16,10)`.
    */
  def hex8IntSql(hexExpr: String): String = {
    val terms = (1 to 8).map { p =>
      val scale = 1L << (4 * (8 - p))
      s"(strpos('0123456789abcdef', substr($hexExpr, $p, 1)) - 1) * ${scale}"
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** Shared CTEs: cleaned docs, word arrays, distinct 3-gram
    * shingles, per-doc shingle counts.
    */
  def shingleCtes: String =
    s"""doc_clean AS (
    SELECT doc_id, ${Tokenize.cleanSql("text")} AS cleaned FROM documents
  ),
  doc_words AS (SELECT doc_id, string_split(cleaned, ' ') AS w FROM doc_clean),
  doc_shingles AS (
    SELECT DISTINCT doc_id,
      unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
    FROM doc_words
  ),
  shingle_sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id)"""

  def exactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id, count(*) AS copies
FROM documents GROUP BY md5(text) ORDER BY text_hash"""

  /** [[graft.operators.Dedup.exactNormalized]]: hash of the cleaned
    * text through the shared [[Tokenize.cleanSql]] chain.
    */
  def exactNormalizedSql: String =
    s"""SELECT md5(${graft.functions.Tokenize.cleanSql("text")}) AS norm_hash,
  min(doc_id) AS keeper_doc_id, count(*) AS copies
FROM documents GROUP BY 1 ORDER BY norm_hash"""

  /** Candidate CTE -> verified near-dup pairs as a CTE chain ending
    * in `verified(doc_x, doc_y, inter_n, union_n, jac_bp)`.
    */
  private def verifiedCtes(candCtes: String): String =
    s"""$shingleCtes,
  $candCtes,
  pair_inter AS (
    SELECT c.doc_x, c.doc_y, count(*) AS inter_n
    FROM cand c
    JOIN doc_shingles sx ON sx.doc_id = c.doc_x
    JOIN doc_shingles sy ON sy.doc_id = c.doc_y AND sy.s = sx.s
    GROUP BY c.doc_x, c.doc_y
  ),
  verified AS (
    SELECT p.doc_x, p.doc_y, p.inter_n,
      nx.n + ny.n - p.inter_n AS union_n,
      CAST(floor(10000.0 * p.inter_n / (nx.n + ny.n - p.inter_n)) AS BIGINT) AS jac_bp
    FROM pair_inter p
    JOIN shingle_sizes nx ON nx.doc_id = p.doc_x
    JOIN shingle_sizes ny ON ny.doc_id = p.doc_y
    WHERE 10000.0 * p.inter_n / (nx.n + ny.n - p.inter_n) >= 5000
  )"""

  /** Candidate CTE -> verified near-dup pairs (exact Jaccard >= 50%). */
  private def verifySql(candCtes: String): String =
    s"""WITH ${verifiedCtes(candCtes)}
SELECT doc_x, doc_y, inter_n, union_n, jac_bp FROM verified
ORDER BY doc_x, doc_y"""

  /** Transitive duplicate clusters over the MinHash-LSH verified
    * pairs: the recursive closure labels every member with its
    * minimum reachable doc_id — an independent (recursive-CTE)
    * implementation of the label-propagation fixpoint
    * [[graft.operators.Dedup.clustersFromPairs]] iterates.
    */
  def clustersSql(numSeeds: Int = 8): String =
    s"""WITH RECURSIVE ${labelCtes(numSeeds)},
  csizes AS (SELECT cluster_id, count(*) AS n_members FROM labels GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id, c.n_members,
  CAST(CASE WHEN l.doc_id = l.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM labels l JOIN csizes c ON c.cluster_id = l.cluster_id
ORDER BY l.doc_id"""

  /** Recursive closure chain ending in `labels(doc_id, cluster_id)`
    * (shared by [[clustersSql]] and [[keptCorpusSql]]).
    */
  private[oracle] def labelCtes(numSeeds: Int): String =
    s"""${verifiedCtes(minhashCandCtes(numSeeds))},
  edges AS (
    SELECT doc_x AS s, doc_y AS d FROM verified
    UNION ALL SELECT doc_y, doc_x FROM verified
  ),
  reach(v, lbl) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
    UNION
    SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.v
  ),
  labels AS (SELECT v AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY v)"""

  /** [[graft.operators.Dedup.keepBest]]: per-cluster longest-member
    * keeper over the recursive-closure labels. The oracle picks the
    * keeper with a window (`row_number` over `n_chars DESC, doc_id`)
    * where Spark runs a `max_by` aggregation — different physical
    * plan, same keeper, which re-checks the argmax itself.
    */
  def keepBestSql(numSeeds: Int = 8): String =
    s"""WITH RECURSIVE ${labelCtes(numSeeds)},
  m AS (
    SELECT l.cluster_id, l.doc_id, d.n_chars
    FROM labels l JOIN documents d USING (doc_id)
  ),
  r AS (
    SELECT cluster_id, doc_id, n_chars,
      row_number() OVER (PARTITION BY cluster_id
        ORDER BY n_chars DESC, doc_id) AS rn
    FROM m
  ),
  sz AS (SELECT cluster_id, count(*) AS n_members FROM m GROUP BY cluster_id)
SELECT s.cluster_id, CAST(s.n_members AS BIGINT) AS n_members,
  r.doc_id AS keeper_doc_id, CAST(r.n_chars AS BIGINT) AS keeper_chars
FROM sz s JOIN r ON r.cluster_id = s.cluster_id AND r.rn = 1
ORDER BY s.cluster_id"""

  /** [[graft.operators.Dedup.keptCorpusBest]]: the corpus with the
    * longest-member keep policy applied — non-argmax cluster members
    * dropped (window-ranked here, `max_by`-aggregated in Spark).
    */
  def keptCorpusBestSql(numSeeds: Int = 8): String =
    s"""WITH RECURSIVE ${labelCtes(numSeeds)},
  m AS (
    SELECT l.cluster_id, l.doc_id, d.n_chars
    FROM labels l JOIN documents d USING (doc_id)
  ),
  r AS (
    SELECT cluster_id, doc_id,
      row_number() OVER (PARTITION BY cluster_id
        ORDER BY n_chars DESC, doc_id) AS rn
    FROM m
  )
SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM r WHERE rn > 1)
ORDER BY d.doc_id"""

  /** The deduplicated corpus: documents minus non-keeper cluster
    * members (the applied form of [[clustersSql]]'s decision).
    */
  def keptCorpusSql(numSeeds: Int = 8): String =
    s"""WITH RECURSIVE ${labelCtes(numSeeds)}
SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
ORDER BY d.doc_id"""

  private def minhashBandCtes(numSeeds: Int): String =
    s"""minh AS (
    SELECT doc_id, seed, min(md5(seed::VARCHAR || '|' || s)) AS mh
    FROM doc_shingles, range(0, $numSeeds) t(seed)
    GROUP BY doc_id, seed
  ),
  bands AS (
    SELECT doc_id, seed // 2 AS band_id,
      md5(min(CASE WHEN seed % 2 = 0 THEN mh END) || '|' ||
          min(CASE WHEN seed % 2 = 1 THEN mh END)) AS bh
    FROM minh GROUP BY doc_id, seed // 2
  )"""

  private def minhashCandCtes(numSeeds: Int): String =
    s"""${minhashBandCtes(numSeeds)},
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_x, b.doc_id AS doc_y
    FROM bands a
    JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
  )"""

  def minhashLshSql(numSeeds: Int = 8): String =
    verifySql(minhashCandCtes(numSeeds))

  /** [[graft.operators.Dedup.incrementalNearDups]]: delta docs
    * (doc_id % deltaMod = 0) paired against base docs (any) or
    * smaller-id delta docs, verified, rolled up per delta doc with
    * an all-rows left join.
    */
  def incrementalSql(deltaMod: Int = 11, numSeeds: Int = 8): String = {
    val cand = s"""${minhashBandCtes(numSeeds)},
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_x, b.doc_id AS doc_y
    FROM bands a
    JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh
      AND a.doc_id <> b.doc_id
    WHERE b.doc_id % $deltaMod = 0
      AND (a.doc_id % $deltaMod <> 0 OR a.doc_id < b.doc_id)
  )"""
    s"""WITH ${verifiedCtes(cand)},
  flags AS (
    SELECT doc_y AS doc_id, count(*) AS dups,
      sum(CASE WHEN doc_x % $deltaMod <> 0 THEN 1 ELSE 0 END) AS base_dups,
      max(jac_bp) AS best_jac
    FROM verified GROUP BY doc_y
  )
SELECT d.doc_id,
  CAST(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
  CAST(coalesce(f.dups, 0) AS BIGINT) AS n_dups,
  CAST(coalesce(f.base_dups, 0) AS BIGINT) AS n_base_dups,
  CAST(coalesce(f.best_jac, 0) AS BIGINT) AS max_jac_bp
FROM documents d LEFT JOIN flags f USING (doc_id)
WHERE d.doc_id % $deltaMod = 0
ORDER BY d.doc_id"""
  }

  def ngramJaccardSql(maxDf: Int = 100, minShared: Int = 3): String = verifySql(
    rareCandCtes(maxDf, minShared))

  /** Rare-shingle candidate CTEs shared by the Jaccard and
    * containment verifiers (mirrors the engine's shared
    * `rareSharedCandidates`).
    */
  private def rareCandCtes(maxDf: Int, minShared: Int): String =
    s"""rare AS (
    SELECT doc_id, s FROM doc_shingles
    WHERE s IN (SELECT s FROM doc_shingles GROUP BY s HAVING count(*) <= $maxDf)
  ),
  cand AS (
    SELECT a.doc_id AS doc_x, b.doc_id AS doc_y
    FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= $minShared
  )"""

  /** [[graft.operators.Dedup.containment]]: same candidates, but the
    * verification denominator is `min(|X|, |Y|)` — the asymmetric
    * doc-in-doc score.
    */
  def containmentSql(maxDf: Int = 100, minShared: Int = 3,
      minContBp: Int = 8000): String =
    s"""WITH $shingleCtes,
  ${rareCandCtes(maxDf, minShared)},
  pair_inter AS (
    SELECT c.doc_x, c.doc_y, count(*) AS inter_n
    FROM cand c
    JOIN doc_shingles sx ON sx.doc_id = c.doc_x
    JOIN doc_shingles sy ON sy.doc_id = c.doc_y AND sy.s = sx.s
    GROUP BY c.doc_x, c.doc_y
  )
SELECT p.doc_x, p.doc_y, p.inter_n,
  least(nx.n, ny.n) AS min_n,
  CAST(floor(10000.0 * p.inter_n / least(nx.n, ny.n)) AS BIGINT) AS cont_bp
FROM pair_inter p
JOIN shingle_sizes nx ON nx.doc_id = p.doc_x
JOIN shingle_sizes ny ON ny.doc_id = p.doc_y
WHERE 10000.0 * p.inter_n / least(nx.n, ny.n) >= $minContBp
ORDER BY p.doc_x, p.doc_y"""

  /** CTEs through the per-doc 64-bit simhash, materialized as two
    * positive 32-bit halves (sidesteps signed-64 overflow when
    * assembling bit 63 in either engine).
    */
  private def simhashCtes: String = {
    def bitSums(h: String, p: String) = (0 until 32)
      .map(b => s"sum(CASE WHEN ($h // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS $p$b")
      .mkString(",\n      ")
    def assemble(p: String) = (0 until 32)
      .map(b => s"CASE WHEN $p$b >= 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""doc_clean AS (
    SELECT doc_id, ${Tokenize.cleanSql("text")} AS cleaned FROM documents
  ),
  doc_tokens AS (
    SELECT DISTINCT doc_id, unnest(string_split(cleaned, ' ')) AS t
    FROM doc_clean WHERE cleaned <> ''
  ),
  tok_hash AS (
    SELECT doc_id, ${hex8IntSql("md5(t)")} AS h_lo,
      ${hex8IntSql("substr(md5(t), 9, 8)")} AS h_hi
    FROM doc_tokens
  ),
  bit_sums AS (
    SELECT doc_id,
      ${bitSums("h_lo", "lo")},
      ${bitSums("h_hi", "hi")}
    FROM tok_hash GROUP BY doc_id
  ),
  sims AS (
    SELECT doc_id, CAST(${assemble("lo")} AS BIGINT) AS sim_lo,
      CAST(${assemble("hi")} AS BIGINT) AS sim_hi
    FROM bit_sums
  )"""
  }

  def simhashSql: String =
    s"WITH $simhashCtes\nSELECT doc_id, sim_lo, sim_hi FROM sims ORDER BY doc_id"

  def simhashPairsSql: String =
    s"""WITH $simhashCtes,
  sim_bands AS (
    SELECT doc_id, sim_lo, sim_hi, i AS band_ix,
      CASE WHEN i < 2 THEN (sim_lo >> (i * 16)) % 65536
           ELSE (sim_hi >> ((i - 2) * 16)) % 65536 END AS band_v
    FROM sims, range(0, 4) t(i)
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_x, b.doc_id AS doc_y,
      a.sim_lo AS lo_x, a.sim_hi AS hi_x, b.sim_lo AS lo_y, b.sim_hi AS hi_y
    FROM sim_bands a
    JOIN sim_bands b ON a.band_ix = b.band_ix AND a.band_v = b.band_v
      AND a.doc_id < b.doc_id
  )
SELECT doc_x, doc_y,
  CAST(bit_count(xor(lo_x, lo_y)) + bit_count(xor(hi_x, hi_y)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(lo_x, lo_y)) + bit_count(xor(hi_x, hi_y)) <= 3
ORDER BY doc_x, doc_y"""

  /** [[graft.operators.Dedup.spanRemoved]]: covered positions via a
    * dup-span × range(n) expansion, kept tokens via ANTI JOIN, text
    * rebuilt with an ordered string_agg — an independent formulation
    * of the Spark side's left_anti + array_sort rebuild.
    */
  def spanRemovedSql(n: Int = 4): String = {
    val concat = (0 until n).map(j => s"t[x+$j]").mkString(" || ' ' || ")
    s"""WITH rt AS (
    SELECT doc_id, string_split(${Tokenize.cleanSql("text")}, ' ') AS t
    FROM documents
  ),
  base AS (
    SELECT doc_id, t,
      CASE WHEN len(t) = 0 OR t[1] = '' THEN 0 ELSE len(t) END AS n_tokens
    FROM rt
  ),
  s AS (
    SELECT doc_id,
      unnest(generate_series(1, len(t) - ${n - 1})) AS start,
      unnest([$concat for x in generate_series(1, len(t) - ${n - 1})]) AS gram
    FROM base WHERE n_tokens >= $n
  ),
  dup AS (SELECT gram FROM s GROUP BY gram HAVING count(*) >= 2),
  covered AS (
    SELECT DISTINCT s.doc_id, s.start + j AS pos
    FROM s JOIN dup USING (gram), range(0, $n) r(j)
  ),
  toks AS (
    SELECT doc_id, unnest(generate_series(1, len(t))) AS pos,
      unnest(t) AS tok
    FROM base WHERE n_tokens > 0
  ),
  kept AS (
    SELECT tk.doc_id, count(*) AS n_kept,
      string_agg(tk.tok, ' ' ORDER BY tk.pos) AS cleaned
    FROM toks tk ANTI JOIN covered c
      ON tk.doc_id = c.doc_id AND tk.pos = c.pos
    GROUP BY tk.doc_id
  )
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
  coalesce(k.cleaned, '') AS cleaned
FROM base b LEFT JOIN kept k USING (doc_id) ORDER BY b.doc_id"""
  }

  /** [[graft.operators.Dedup.spanCoverage]]: positions via zipped
    * `unnest`s (DuckDB zips same-select unnests positionally), the
    * identical fixed-length interval union via `lag`.
    */
  def spanCoverageSql(n: Int = 4): String = {
    val concat = (0 until n).map(j => s"t[x+$j]").mkString(" || ' ' || ")
    s"""WITH rt AS (
    SELECT doc_id, string_split(${Tokenize.cleanSql("text")}, ' ') AS t
    FROM documents
  ),
  base AS (
    SELECT doc_id, t,
      CASE WHEN len(t) = 0 OR t[1] = '' THEN 0 ELSE len(t) END AS n_tokens
    FROM rt
  ),
  s AS (
    SELECT doc_id,
      unnest(generate_series(1, len(t) - ${n - 1})) AS start,
      unnest([$concat for x in generate_series(1, len(t) - ${n - 1})]) AS gram
    FROM base WHERE n_tokens >= $n
  ),
  dup AS (SELECT gram FROM s GROUP BY gram HAVING count(*) >= 2),
  cv AS (
    SELECT s.doc_id, s.start,
      least($n, s.start - lag(s.start) OVER (PARTITION BY s.doc_id ORDER BY s.start)) AS inc
    FROM s JOIN dup USING (gram)
  ),
  cov AS (
    SELECT doc_id, count(*) AS n_dup_spans,
      sum(coalesce(inc, $n)) AS covered
    FROM cv GROUP BY doc_id
  )
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
  CAST(greatest(b.n_tokens - ${n - 1}, 0) AS BIGINT) AS n_spans,
  CAST(coalesce(cov.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
  CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
  CAST((coalesce(cov.covered, 0) * 10000) // greatest(b.n_tokens, 1) AS BIGINT) AS coverage_bp
FROM base b LEFT JOIN cov USING (doc_id) ORDER BY b.doc_id"""
  }

  /** Cluster-size histogram oracle: the recursive-closure labels
    * rolled up to (size, cluster count, dropped docs) — a different
    * clustering algorithm than the engine's star contraction, so the
    * histogram equality re-checks the clustering itself.
    */
  def clusterHistogramSql(numSeeds: Int = 8): String =
    s"""WITH RECURSIVE ${labelCtes(numSeeds)},
  csizes AS (SELECT cluster_id, count(*) AS n_members FROM labels GROUP BY cluster_id)
SELECT CAST(n_members AS BIGINT) AS n_members,
  count(*) AS n_clusters,
  CAST(sum(n_members) - count(*) AS BIGINT) AS n_dropped
FROM csizes GROUP BY n_members ORDER BY n_members"""

  /** Cross-source overlap oracle: the same distinct (source,
    * shingle) collapse, shingle-keyed pair join, and exact integer
    * basis-point ratios.
    */
  def sourceOverlapSql: String =
    s"""WITH $shingleCtes,
  src_sh AS (
    SELECT DISTINCT d.source, s.s
    FROM doc_shingles s JOIN documents d USING (doc_id)
  ),
  ssz AS (SELECT source, count(*) AS n FROM src_sh GROUP BY source),
  spairs AS (
    SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
    FROM src_sh a JOIN src_sh b ON a.s = b.s AND a.source < b.source
    GROUP BY a.source, b.source
  )
SELECT p.source_a, p.source_b,
  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
  CAST(p.n_shared AS BIGINT) AS n_shared,
  CAST((10000 * p.n_shared) // (na.n + nb.n - p.n_shared) AS BIGINT) AS jaccard_bp,
  CAST((10000 * p.n_shared) // na.n AS BIGINT) AS contain_a_bp,
  CAST((10000 * p.n_shared) // nb.n AS BIGINT) AS contain_b_bp
FROM spairs p
JOIN ssz na ON na.source = p.source_a
JOIN ssz nb ON nb.source = p.source_b
ORDER BY p.source_a, p.source_b"""

  /** The planted-URL CTE chain ending in `unorm(doc_id, url,
    * url_norm)` — mirrors `Dedup.urlsOf` + `Dedup.urlNormalizedOf`
    * step for step. The plant filters `source IS NOT NULL` explicitly
    * where the engine relies on concat's null propagation (DuckDB's
    * concat SKIPS nulls — the one intentional dialect divergence).
    * DuckDB regexp_replace replaces the FIRST match by default (Spark
    * replaces all), so the one multi-occurrence pattern (`/{2,}`)
    * carries the 'g' flag; every other pattern is anchored.
    */
  private val urlCtes: String =
    """urls AS (
    SELECT doc_id, concat(
      CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END,
      CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
      source, '.example.com',
      CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,
      '/articles/', CAST(doc_id % 50 AS VARCHAR),
      CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
      '?',
      CASE WHEN doc_id % 3 = 0 THEN concat('utm_source=feed&id=', CAST(doc_id % 50 AS VARCHAR))
           WHEN doc_id % 3 = 1 THEN concat('id=', CAST(doc_id % 50 AS VARCHAR), '&utm_campaign=x')
           ELSE concat('id=', CAST(doc_id % 50 AS VARCHAR)) END,
      CASE WHEN doc_id % 7 = 0 THEN '#section2' ELSE '' END) AS url
    FROM documents WHERE source IS NOT NULL
  ),
  unf AS (
    SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nf FROM urls
  ),
  ustrip AS (
    SELECT doc_id, url, regexp_replace(nf, '^(?:[a-zA-Z]+:)?//', '') AS st
    FROM unf
  ),
  uparts AS (
    SELECT doc_id, url,
      regexp_replace(regexp_replace(
        lower(regexp_extract(st, '^([^/?#]+)', 1)),
        '^www\.', ''), ':(443|80)$', '') AS host,
      regexp_extract(st, '^[^/?#]+(.*)$', 1) AS pathq
    FROM ustrip
  ),
  unorm AS (
    SELECT doc_id, url,
      concat(host,
        regexp_replace(regexp_replace(
          regexp_extract(pathq, '^([^?]*)', 1), '/{2,}', '/', 'g'), '/+$', ''),
        CASE WHEN qs = '' THEN '' ELSE concat('?', qs) END) AS url_norm
    FROM (
      SELECT doc_id, url, host, pathq,
        array_to_string(list_sort(list_filter(
          string_split(regexp_extract(pathq, '\?(.*)$', 1), '&'),
          p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS qs
      FROM uparts
    )
    WHERE host <> ''
  )"""

  /** Mirrors `Dedup.urlNormalize`. */
  def urlNormalizeSql: String =
    s"""WITH $urlCtes
SELECT doc_id, url, url_norm FROM unorm ORDER BY doc_id"""

  /** Mirrors `Dedup.urlDedup`. */
  def urlDedupSql: String =
    s"""WITH $urlCtes
SELECT url_norm, min(doc_id) AS keeper_doc_id,
  CAST(count(*) AS BIGINT) AS copies,
  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms
FROM unorm GROUP BY url_norm ORDER BY url_norm"""

  /** Mirrors `Dedup.urlDomainReport`: the url CTE chain joined to the
    * shared stats/flags CTEs (`TextOracle`), one domain rollup in
    * exact integer basis points / cents.
    */
  def urlDomainReportSql: String =
    s"""WITH ${TextOracle.statsCte}, ${TextOracle.flagsCte(30, 100000)},
  $urlCtes,
  udom AS (
    SELECT doc_id, url_norm, regexp_extract(url_norm, '^([^/]+)', 1) AS domain
    FROM unorm
  )
SELECT u.domain,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT u.url_norm) AS BIGINT) AS n_canonical,
  CAST((10000 * (count(*) - count(DISTINCT u.url_norm))) // count(*) AS BIGINT) AS dup_bp,
  CAST((10000 * sum(CAST(f.flag_len * f.flag_avg_word_len * f.flag_stopwords AS BIGINT))) // count(*) AS BIGINT) AS quality_pass_bp,
  CAST((100 * sum(t.n_ws_tokens)) // count(*) AS BIGINT) AS mean_tokens_c
FROM udom u
JOIN tflags f USING (doc_id)
JOIN tstats_bp t USING (doc_id)
GROUP BY u.domain ORDER BY u.domain"""
}
