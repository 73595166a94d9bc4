package graft.oracle

import graft.functions.Tokenize

/** DuckDB oracle SQL for the text-analysis family. Mirrors
  * [[graft.operators.TextAnalysis]] stage for stage — same cleaning
  * chain, same function-word list, same integer basis-point math —
  * so the driver's hash compare is exact.
  */
object TextOracle {

  private val swList: String =
    Tokenize.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared per-document statistics CTE (the oracle twin of
    * `TextAnalysis.stats`).
    */
  private[oracle] def statsCte: String =
    s"""tstats AS (
    SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_re_tokens,
      CAST(CASE WHEN ${Tokenize.cleanSql("text")} = '' THEN 0
        ELSE len(string_split(${Tokenize.cleanSql("text")}, ' ')) END AS BIGINT) AS n_clean_tokens,
      CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
      CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
      CAST(len(list_filter(string_split(lower(text), ' '),
        w -> list_contains($swList, w))) AS BIGINT) AS sw_hits
    FROM documents
  ),
  tstats_bp AS (
    SELECT *, CAST(floor(10000 * sw_hits / greatest(n_ws_tokens, 1)) AS BIGINT) AS sw_bp
    FROM tstats
  )"""

  def statsSql: String =
    s"""WITH $statsCte
SELECT doc_id, n_chars, n_ws_tokens, n_re_tokens, n_clean_tokens, n_alpha, n_digit,
  sw_hits, sw_bp
FROM tstats_bp ORDER BY doc_id"""

  private[oracle] def flagsCte(minTokens: Int, maxTokens: Int): String =
    s"""tflags AS (
    SELECT doc_id,
      CASE WHEN n_ws_tokens >= $minTokens AND n_ws_tokens <= $maxTokens THEN 1 ELSE 0 END AS flag_len,
      CASE WHEN n_alpha >= 3 * n_ws_tokens AND n_alpha <= 10 * n_ws_tokens THEN 1 ELSE 0 END AS flag_avg_word_len,
      CASE WHEN sw_hits >= 2 THEN 1 ELSE 0 END AS flag_stopwords
    FROM tstats_bp
  )"""

  /** Mirrors `TextAnalysis.qualityModel`: weak labels from the flag
    * CTEs, per-term Laplace-smoothed pass probability in basis
    * points, exact mean over occurrences, midpoint threshold.
    */
  def qualityModelSql(minTokens: Int = 30, maxTokens: Int = 100000): String =
    s"""WITH $statsCte, ${flagsCte(minTokens, maxTokens)},
  qlabels AS (
    -- ONE label per document identity: min over the id's crawl rows
    -- (the engine's conservative fold on re-crawled duplicate ids)
    SELECT doc_id,
      CAST(min(flag_len * flag_avg_word_len * flag_stopwords) AS BIGINT) AS quality_pass
    FROM tflags GROUP BY doc_id
  ),
  qdterms AS (
    SELECT DISTINCT doc_id, term FROM (
      SELECT doc_id, unnest(string_split(${Tokenize.cleanSql("text")}, ' ')) AS term
      FROM documents
    ) WHERE term <> ''
  ),
  qweights AS (
    SELECT term,
      (10000 * (SUM(quality_pass) + 1)) //
        (SUM(quality_pass) + SUM(1 - quality_pass) + 2) AS w
    FROM qdterms JOIN qlabels USING (doc_id)
    GROUP BY term
  ),
  qocc AS (
    SELECT doc_id, term FROM (
      SELECT doc_id, unnest(string_split(${Tokenize.cleanSql("text")}, ' ')) AS term
      FROM documents
    ) WHERE term <> ''
  ),
  qscored AS (
    SELECT o.doc_id, count(*) AS n_terms, SUM(w.w) // count(*) AS score_bp
    FROM qocc o JOIN qweights w USING (term)
    GROUP BY o.doc_id
  ),
  qprior AS (
    SELECT (10000 * (SUM(quality_pass) + 1)) // (count(*) + 2) AS prior_bp
    FROM qlabels
  )
SELECT l.doc_id,
  CAST(coalesce(s.n_terms, 0) AS BIGINT) AS n_terms,
  CAST(coalesce(s.score_bp, 0) AS BIGINT) AS score_bp,
  CAST(p.prior_bp AS BIGINT) AS prior_bp,
  CAST(CASE WHEN coalesce(s.score_bp, 0) >= p.prior_bp THEN 1 ELSE 0 END AS BIGINT)
    AS model_pass,
  l.quality_pass AS heuristic_pass
FROM qlabels l LEFT JOIN qscored s ON s.doc_id = l.doc_id
CROSS JOIN qprior p
ORDER BY l.doc_id"""

  def qualityFlagsSql(minTokens: Int = 30, maxTokens: Int = 100000): String =
    s"""WITH $statsCte, ${flagsCte(minTokens, maxTokens)}
SELECT doc_id, CAST(flag_len AS BIGINT) AS flag_len,
  CAST(flag_avg_word_len AS BIGINT) AS flag_avg_word_len,
  CAST(flag_stopwords AS BIGINT) AS flag_stopwords,
  CAST(flag_len * flag_avg_word_len * flag_stopwords AS BIGINT) AS quality_pass
FROM tflags ORDER BY doc_id"""

  def langIdSql(minSwBp: Int = 400): String =
    s"""WITH $statsCte
SELECT s.doc_id, s.sw_bp,
  CASE WHEN s.sw_bp >= $minSwBp THEN 'en' ELSE 'und' END AS predicted,
  d.lang,
  CAST(CASE WHEN (CASE WHEN s.sw_bp >= $minSwBp THEN 'en' ELSE 'und' END) = d.lang
    THEN 1 ELSE 0 END AS BIGINT) AS is_match
FROM tstats_bp s JOIN documents d ON d.doc_id = s.doc_id
ORDER BY s.doc_id"""

  def sourceProfileSql(minTokens: Int = 30, maxTokens: Int = 100000): String =
    s"""WITH $statsCte, ${flagsCte(minTokens, maxTokens)}
SELECT d.lang, d.source, count(*) AS n_docs,
  CAST(sum(s.n_ws_tokens) AS BIGINT) AS sum_tokens,
  CAST(sum(s.n_chars) AS BIGINT) AS sum_chars,
  CAST(sum(f.flag_len * f.flag_avg_word_len * f.flag_stopwords) AS BIGINT) AS n_quality,
  CAST((sum(s.n_ws_tokens) * 100) // count(*) AS BIGINT) AS mean_tokens_c
FROM tstats_bp s
JOIN tflags f ON f.doc_id = s.doc_id
JOIN documents d ON d.doc_id = s.doc_id
GROUP BY d.lang, d.source ORDER BY d.lang, d.source"""

  def topTermsSql(k: Int = 10): String =
    s"""WITH terms AS (
    SELECT DISTINCT doc_id, lang, unnest(string_split(${Tokenize.cleanSql("text")}, ' ')) AS term
    FROM documents
  ),
  dfc AS (
    SELECT lang, term, count(*) AS df FROM terms WHERE term <> '' GROUP BY lang, term
  ),
  ranked AS (
    SELECT lang, term, df,
      row_number() OVER (PARTITION BY lang ORDER BY df DESC, term ASC) AS rank
    FROM dfc
  )
SELECT lang, rank, term, df FROM ranked WHERE rank <= $k ORDER BY lang, rank"""

  def tfidfTopSql(k: Int = 3): String =
    s"""WITH toks AS (
    SELECT doc_id, unnest(string_split(${Tokenize.cleanSql("text")}, ' ')) AS term
    FROM documents
  ),
  tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term),
  dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
  total AS (SELECT count(*) AS n_docs FROM documents),
  scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df, t.tf * ((n.n_docs * 1000) // d.df) AS score
    FROM tf t JOIN dfc d ON t.term = d.term CROSS JOIN total n
  ),
  ranked AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
    FROM scored
  )
SELECT doc_id, rank, term, tf, df, score FROM ranked WHERE rank <= $k
ORDER BY doc_id, rank"""

  /** BM25 oracle: the identical rationalized integer formula — same
    * query-by-example term source, same floored avgdl, same per-term
    * basis-point floor before the per-doc sum.
    */
  /** The indexed path's oracle IS the derived path's oracle
    * (round-14, verdict #7): BM25 document length is identity-keyed —
    * `sum(n_clean_tokens) GROUP BY doc_id` — on every engine path
    * (the contract and its rationale live at
    * `TextAnalysis.identityDocLengths`), so the round-13 per-row /
    * per-identity fork and its string-patch machinery are gone: one
    * contract, one oracle, two engine paths hash-gated against it.
    */
  def bm25TopKIndexedSql(k: Int = 20, qTerms: Int = 8): String =
    bm25TopKSql(k, qTerms)

  def bm25TopKSql(k: Int = 20, qTerms: Int = 8): String =
    s"""WITH $statsCte,
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
    SELECT count(*) AS n_docs, sum(dl) AS l_tot, sum(dl) // count(*) AS avgdl
    FROM dl
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
  agg AS (SELECT doc_id, count(*) AS n_terms, sum(score_t) AS score FROM sc GROUP BY doc_id)
SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, CAST(score AS BIGINT) AS score
FROM agg ORDER BY score DESC, doc_id ASC LIMIT $k"""

  /** Exact-phrase oracle: DuckDB verifies adjacency by direct list
    * slicing (`w[i : i+len(p)-1] = p`) — an implementation
    * deliberately unlike the engine's anchored position-map join, so
    * hash equality checks the semantics, not the plan.
    */
  def phraseTopKSql(n: Int = 3, k: Int = 20): String =
    s"""WITH qsrc AS (
    SELECT ${Tokenize.cleanSql("text")} AS ct FROM documents ORDER BY doc_id LIMIT 1
  ),
  q AS (
    SELECT CASE WHEN ct = '' THEN []::VARCHAR[]
           ELSE string_split(ct, ' ')[1:$n] END AS p
    FROM qsrc
  ),
  tok AS (
    SELECT doc_id, string_split(${Tokenize.cleanSql("text")}, ' ') AS w
    FROM documents WHERE ${Tokenize.cleanSql("text")} <> ''
  ),
  hits AS (
    SELECT t.doc_id,
      list_sum([CASE WHEN t.w[i : i + len(q.p) - 1] = q.p THEN 1 ELSE 0 END
                for i in generate_series(1, len(t.w) - len(q.p) + 1)]) AS n_hits
    FROM tok t CROSS JOIN q
    WHERE len(q.p) > 0
  )
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
FROM hits WHERE n_hits > 0
ORDER BY n_hits DESC, doc_id ASC LIMIT $k"""

  /** Proximity oracle: positions via index-filtered list
    * comprehensions, distances via nested list_transform — again a
    * different formulation from the engine's probe+aggregate plan.
    * `list_filter((x,i) -> i = list_position(w, x))` is DuckDB's
    * first-occurrence-ordered distinct (Spark's `array_distinct`
    * order contract, which `list_distinct` does not guarantee).
    */
  def proximityTopKSql(window: Int = 5, k: Int = 20): String =
    s"""WITH qsrc AS (
    SELECT string_split(${Tokenize.cleanSql("text")}, ' ') AS qw
    FROM documents ORDER BY doc_id LIMIT 1
  ),
  q AS (
    SELECT fd[1] AS t0, fd[2] AS t1 FROM (
      SELECT list_filter(list_filter(qw, x -> x <> ''),
        (x, i) -> i = list_position(list_filter(qw, y -> y <> ''), x)) AS fd
      FROM qsrc
    ) WHERE len(fd) >= 2
  ),
  tok AS (
    SELECT doc_id, string_split(${Tokenize.cleanSql("text")}, ' ') AS w
    FROM documents WHERE ${Tokenize.cleanSql("text")} <> ''
  ),
  pos AS (
    SELECT t.doc_id,
      [i for i in generate_series(1, len(t.w)) if t.w[i] = q.t0] AS pa,
      [i for i in generate_series(1, len(t.w)) if t.w[i] = q.t1] AS pb
    FROM tok t CROSS JOIN q
  ),
  d AS (
    SELECT doc_id,
      flatten(list_transform(pa, a -> list_transform(pb, b -> abs(a - b)))) AS dists
    FROM pos WHERE len(pa) > 0 AND len(pb) > 0
  )
SELECT doc_id, CAST(list_min(dists) AS BIGINT) AS min_dist,
  CAST(len(list_filter(dists, x -> x <= $window)) AS BIGINT) AS n_within
FROM d WHERE list_min(dists) <= $window
ORDER BY min_dist ASC, n_within DESC, doc_id ASC LIMIT $k"""

  /** PII redaction oracle: identical explicit-class patterns in RE2,
    * with DuckDB's 'g' flag supplying the global semantics Spark's
    * regexp_replace has by default.
    */
  def redactPiiSql: String = {
    import graft.operators.TextAnalysis.{EmailRe, Ipv4Re}
    // single-quote-free patterns embed directly into standard-SQL
    // string literals (no backslash processing in DuckDB literals).
    val em = EmailRe
    val ip = Ipv4Re
    s"""WITH planted AS (
    SELECT doc_id, text ||
      CASE WHEN doc_id % 3 = 0
             THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
           WHEN doc_id % 3 = 1
             THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.99 logged'
           ELSE '' END AS t
    FROM documents
  ),
  red AS (
    SELECT doc_id, t,
      regexp_replace(regexp_replace(t, '$em', '<EMAIL>', 'g'),
        '$ip', '<IP>', 'g') AS r
    FROM planted
  )
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '$em')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
  md5(r) AS redacted_md5,
  CAST(length(r) AS BIGINT) AS n_chars_redacted
FROM red ORDER BY doc_id"""
  }

  def repetitionSql: String =
    s"""WITH rt AS (
    SELECT doc_id, string_split(${Tokenize.cleanSql("text")}, ' ') AS t
    FROM documents
    WHERE len(string_split(${Tokenize.cleanSql("text")}, ' ')) >= 2
      AND string_split(${Tokenize.cleanSql("text")}, ' ')[1] <> ''
  ),
  g AS (
    SELECT doc_id, 2 AS n,
      unnest([t[x] || ' ' || t[x+1] for x in generate_series(1, len(t)-1)]) AS gram
    FROM rt
    UNION ALL
    SELECT doc_id, 3 AS n,
      unnest([t[x] || ' ' || t[x+1] || ' ' || t[x+2] for x in generate_series(1, len(t)-2)]) AS gram
    FROM rt
  ),
  cnts AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY doc_id, n, gram)
SELECT doc_id, CAST(n AS BIGINT) AS n,
  CAST(sum(cnt) AS BIGINT) AS n_grams,
  CAST(max(cnt) AS BIGINT) AS top_cnt,
  CAST(coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0) AS BIGINT) AS dup_occ,
  CAST((max(cnt) * 10000) // greatest(sum(cnt), 1) AS BIGINT) AS top_bp,
  CAST((coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0) * 10000) // greatest(sum(cnt), 1) AS BIGINT) AS dup_bp
FROM cnts GROUP BY doc_id, n ORDER BY doc_id, n"""

  def fingerprintsSql(k: Int = 4): String =
    s"""WITH ${DocOracle.shingleCtes},
  hashed AS (SELECT doc_id, md5(s) AS h FROM doc_shingles)
SELECT doc_id, array_to_string(list_sort(list(h))[1:$k], '|') AS fp
FROM hashed GROUP BY doc_id ORDER BY doc_id"""

  /** [[graft.operators.TextAnalysis.htmlExtract]]: the identical page
    * construction and extraction rules in RE2 (block drops are
    * backreference-free on purpose — RE2 has no backreferences).
    */
  def htmlExtractSql: String = {
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
    def decode(x: String) = entities.foldLeft(x) { case (c, (e, v)) =>
      s"replace($c, '$e', '$v')"
    }
    // explicit whitespace class shared with the Spark side: RE2's \s
    // excludes \x0B (vertical tab) while Java's includes it, so `\s`
    // on both sides is NOT one definition (round-7 ADVICE). The trim
    // charset is explicit too: DuckDB's bare trim() strips UNICODE
    // whitespace (an all-NBSP body emptied) where Spark's trim
    // strips ASCII space only (round-13 degenerate hash gate).
    def collapse(x: String) =
      s"trim(regexp_replace($x, '[ \\t\\n\\f\\r]+', ' ', 'g'), ' ')"
    val blocks = Seq("head", "script", "style").foldLeft("html") { (c, t) =>
      s"regexp_replace($c, '(?is)<$t[^>]*>.*?</$t>', ' ', 'g')"
    }
    val noTags = s"regexp_replace($blocks, '<[^>]*>', ' ', 'g')"
    val extracted = collapse(decode(noTags))
    val title = collapse(decode(
      s"regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)"))
    s"""WITH h AS (
    SELECT doc_id, text,
      '<html><head><title>doc &amp; ' || CAST(doc_id AS VARCHAR) ||
      '</title><style>.c{color:red}</style></head><body>' ||
      '<script>var x = 1 < 2;</script><p>' || text ||
      '</p></body></html>' AS html
    FROM documents
  ),
  e AS (
    SELECT doc_id, text, $title AS title, $extracted AS extracted FROM h
  )
SELECT doc_id, title, md5(extracted) AS extracted_md5,
  CAST(length(extracted) AS BIGINT) AS n_chars_extracted,
  CAST(CASE WHEN extracted = text THEN 1 ELSE 0 END AS BIGINT) AS matches_source
FROM e ORDER BY doc_id"""
  }

  /** [[graft.operators.TextAnalysis.bigramSurprise]]: identical
    * exact-integer pipeline — per-doc bigram tf, corpus frequency
    * summed over the tf rows, tf-weighted centi-mean with floor
    * division.
    */
  def bigramSurpriseSql(): String =
    s"""WITH doc_clean AS (
    SELECT doc_id, ${Tokenize.cleanSql("text")} AS cleaned FROM documents
  ),
  dw AS (SELECT doc_id, string_split(cleaned, ' ') AS w FROM doc_clean),
  bi AS (
    SELECT doc_id,
      unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
    FROM dw WHERE len(w) >= 2 AND w[1] <> ''
  ),
  tfg AS (SELECT doc_id, g, count(*) AS tf FROM bi GROUP BY doc_id, g),
  fr AS (SELECT g, sum(tf) AS freq FROM tfg GROUP BY g)
SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
  CAST((100 * sum(t.tf * f.freq)) // sum(t.tf) AS BIGINT) AS mean_freq_c
FROM tfg t JOIN fr f ON f.g = t.g
GROUP BY t.doc_id ORDER BY t.doc_id"""

  /** BPE trainer CTE chain (mirrors [[graft.operators.Bpe]] — the
    * unrolled-rounds pattern of `SimOracle.codebookCtes`): the word
    * frequency table seeds `bwords0` with delimiter-framed symbol
    * strings; each round counts weight-summed adjacent pairs, picks
    * the global argmax (count desc, pair asc — the Spark tie-break
    * literally), and applies it with literal left-to-right `replace`
    * (identical non-overlapping semantics in both engines by the
    * framing argument in Bpe's scaladoc). `LEFT JOIN ... ON true`
    * mirrors the exhausted-vocabulary passthrough. The per-round
    * CTEs are `MATERIALIZED`: each is referenced twice (pair count +
    * apply), and DuckDB inlines multi-referenced CTEs by default —
    * unmaterialized, the chain re-executes 2^rounds times (measured
    * 5m19s vs 0.7s at sf0.01) — the oracle-side twin of the
    * localCheckpoint-per-round discipline on the Spark side.
    */
  private[oracle] def bpeCtes(n: Int): String = {
    val rounds = (1 to n).map { t =>
      s"""bpairs$t AS (
    SELECT a, b, CAST(sum(wc) AS BIGINT) AS cnt FROM (
      SELECT wc, unnest(s[1:len(s)-1]) AS a, unnest(s[2:len(s)]) AS b
      FROM (SELECT wc, string_split(trim(w, '|'), '||') AS s FROM bwords${t - 1})
      WHERE len(s) >= 2
    ) GROUP BY a, b
  ),
  bbest$t AS MATERIALIZED (
    SELECT a, b, cnt FROM bpairs$t ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
  ),
  bwords$t AS MATERIALIZED (
    SELECT word, wc,
      CASE WHEN p.a IS NULL THEN w
        ELSE replace(w, '|' || p.a || '||' || p.b || '|', '|' || p.a || p.b || '|')
      END AS w
    FROM bwords${t - 1} LEFT JOIN bbest$t p ON true
  )"""
    }.mkString(",\n  ")
    s"""bwords0 AS MATERIALIZED (
    SELECT word, CAST(count(*) AS BIGINT) AS wc,
      regexp_replace(word, '(.)', '|\\1|', 'g') AS w
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
          FROM documents)
    GROUP BY word
  ),
  $rounds"""
  }

  /** Mirrors `Bpe.merges`. */
  def bpeMergesSql(n: Int = graft.operators.Bpe.Merges): String = {
    val union = (1 to n).map(t =>
      s"""SELECT CAST($t AS BIGINT) AS rank, a AS pair_a, b AS pair_b,
      a || b AS merged, cnt AS weight FROM bbest$t""").mkString("\n    UNION ALL ")
    s"""WITH ${bpeCtes(n)}
SELECT rank, pair_a, pair_b, merged, weight FROM (
    $union
) ORDER BY rank"""
  }

  /** Mirrors `Bpe.vocabArtifact` — the oracle RETRAINS and the
    * engine serves the persisted artifact, so hash equality proves
    * the durable tokenizer is the trainer's exact output.
    */
  def bpeVocabSql(n: Int = graft.operators.Bpe.Merges): String =
    s"""WITH ${bpeCtes(n)}
SELECT word, wc,
  CAST((length(w) - length(replace(w, '|', ''))) // 2 AS BIGINT) AS n_tok
FROM bwords$n ORDER BY word"""

  /** Mirrors `Bpe.tokens`. */
  def bpeTokensSql(n: Int = graft.operators.Bpe.Merges): String =
    s"""WITH ${bpeCtes(n)},
  bvocab AS (
    SELECT word,
      CAST((length(w) - length(replace(w, '|', ''))) // 2 AS BIGINT) AS n_tok
    FROM bwords$n
  ),
  bdocw AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents
  )
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(length(d.word)) AS BIGINT) AS n_word_chars,
  CAST(sum(v.n_tok) AS BIGINT) AS n_bpe_tokens,
  CAST(floor(10000 * sum(v.n_tok) / greatest(sum(length(d.word)), 1)) AS BIGINT) AS tok_bp
FROM bdocw d JOIN bvocab v USING (word)
GROUP BY d.doc_id ORDER BY d.doc_id"""

  /** Mirrors `Bpe.fertility`: the per-doc token accounting rolled
    * up per source with exact floor-division basis points.
    */
  def bpeFertilitySql(n: Int = graft.operators.Bpe.Merges): String =
    s"""WITH ${bpeCtes(n)},
  bvocab AS (
    SELECT word,
      CAST((length(w) - length(replace(w, '|', ''))) // 2 AS BIGINT) AS n_tok
    FROM bwords$n
  ),
  bdocw AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents
  ),
  perdoc AS (
    SELECT d.doc_id, count(*) AS n_words, sum(length(d.word)) AS n_word_chars,
      sum(v.n_tok) AS n_bpe_tokens
    FROM bdocw d JOIN bvocab v USING (word)
    GROUP BY d.doc_id
  )
SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(p.n_words) AS BIGINT) AS sum_words,
  CAST(sum(p.n_word_chars) AS BIGINT) AS sum_chars,
  CAST(sum(p.n_bpe_tokens) AS BIGINT) AS sum_tokens,
  CAST((10000 * sum(p.n_bpe_tokens)) // sum(p.n_words) AS BIGINT) AS tokens_per_word_bp,
  CAST((10000 * sum(p.n_word_chars)) // sum(p.n_bpe_tokens) AS BIGINT) AS chars_per_token_bp
FROM perdoc p JOIN documents s USING (doc_id)
GROUP BY s.source ORDER BY s.source"""

  /** Mirrors `Bpe.tokenIds`: the oracle retrains, segments each
    * distinct word, enumerates symbols lexicographically, and
    * flattens the sampled documents to ordered (wpos, spos) token
    * rows. Positions come from zipped same-select unnests (DuckDB
    * zips them positionally — the spanCoverage convention), 0-based
    * to match Spark's posexplode.
    */
  def bpeTokenIdsSql(n: Int = graft.operators.Bpe.Merges,
      docMod: Int = 25): String =
    s"""WITH ${bpeCtes(n)},
  bsegs AS (
    SELECT word, string_split(trim(w, '|'), '||') AS syms FROM bwords$n
  ),
  bids AS (
    SELECT symbol, CAST(row_number() OVER (ORDER BY symbol) AS BIGINT) AS tok_id
    FROM (SELECT DISTINCT unnest(syms) AS symbol FROM bsegs)
  ),
  bdocw AS (
    SELECT doc_id, unnest(warr) AS word,
      unnest(generate_series(0, len(warr) - 1)) AS wpos
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS warr
          FROM documents WHERE doc_id % $docMod = 0)
  ),
  btoks AS (
    SELECT d.doc_id, d.wpos, unnest(s.syms) AS symbol,
      unnest(generate_series(0, len(s.syms) - 1)) AS spos
    FROM bdocw d JOIN bsegs s USING (word)
  )
SELECT t.doc_id, CAST(t.wpos AS BIGINT) AS wpos,
  CAST(t.spos AS BIGINT) AS spos, t.symbol, i.tok_id
FROM btoks t JOIN bids i USING (symbol)
ORDER BY doc_id, wpos, spos"""

  /** Mirrors `Bpe.tokenIdsProd` AGAINST THE DURABLE ARTIFACT: an
    * 8192-merge production budget cannot unroll as retraining CTEs
    * (the [[bpeCtes]] route), but the trained per-word segmentations
    * are a parquet table DuckDB reads directly — so the oracle
    * consumes `<snapshot>-bpe8192-segments` and re-derives the id
    * enumeration, the vocabulary joins, positions, and ordering.
    * Everything DOWNSTREAM of training is hash-compared cross-engine
    * (and the engine side segments via the packed row-local replay,
    * not the artifact join, so the hash also pins runtime-vs-trained
    * segmentation equality on corpus words); training itself stays
    * carried by `BpeFastSpec`'s merge-for-merge pin against the
    * distributed trainer. Dir-resolved at Verify-dump time
    * ([[graft.Q.oracleOf]]).
    */
  def bpeTokenIdsProdSql(dir: String,
      n: Int = graft.operators.Bpe.ProdMerges, docMod: Int = 25): String =
    s"""WITH bsegs AS (
    SELECT word, syms FROM read_parquet('${graft.sources.Artifacts.servedPathLocal(graft.operators.Bpe.segmentsPath(dir, n))}/*.parquet')
  ),
  bids AS (
    SELECT symbol, CAST(row_number() OVER (ORDER BY symbol) AS BIGINT) AS tok_id
    FROM (SELECT DISTINCT unnest(syms) AS symbol FROM bsegs)
  ),
  bdocw AS (
    SELECT doc_id, unnest(warr) AS word,
      unnest(generate_series(0, len(warr) - 1)) AS wpos
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS warr
          FROM documents WHERE doc_id % $docMod = 0)
  ),
  btoks AS (
    SELECT d.doc_id, d.wpos, unnest(s.syms) AS symbol,
      unnest(generate_series(0, len(s.syms) - 1)) AS spos
    FROM bdocw d JOIN bsegs s USING (word)
  )
SELECT t.doc_id, CAST(t.wpos AS BIGINT) AS wpos,
  CAST(t.spos AS BIGINT) AS spos, t.symbol, i.tok_id
FROM btoks t JOIN bids i USING (symbol)
ORDER BY doc_id, wpos, spos"""

  /** Shared winnow-selection CTEs (the oracle twin of
    * `TextAnalysis.winnowFingerprints`): per doc, md5 gram hashes,
    * per-window rightmost argmin, distinct selections — the same
    * lexicographic-hex min and tie rules, list-comprehension form.
    */
  private def winnowCtes(k: Int, w: Int): String = {
    val clean = graft.functions.Tokenize.cleanSql("text")
    s"""wt AS (
    SELECT doc_id, string_split($clean, ' ') AS t FROM documents
    WHERE $clean <> '' AND len(string_split($clean, ' ')) - ${k - 1} >= $w
  ),
  wg AS (
    SELECT doc_id,
      [md5(array_to_string(t[i:i+${k - 1}], ' '))
        for i in generate_series(1, len(t) - ${k - 1})] AS g
    FROM wt
  ),
  wsel AS (
    SELECT doc_id, g,
      list_distinct([
        list_max(list_filter(generate_series(j, j + ${w - 1}),
          i -> g[i] = list_min(g[j:j+${w - 1}])))
        for j in generate_series(1, len(g) - ${w - 1})]) AS sel
    FROM wg
  ),
  wfp AS (
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, g[pos] AS fp
    FROM (SELECT doc_id, g, unnest(sel) AS pos FROM wsel)
  )"""
  }

  def winnowFingerprintsSql(k: Int = 4, w: Int = 5): String =
    s"""WITH ${winnowCtes(k, w)}
SELECT doc_id, pos, fp FROM wfp ORDER BY doc_id, pos"""

  /** Mirrors `TextAnalysis.winnowOverlap`: fingerprint-keyed pair
    * counting over the distinct per-doc selections.
    */
  def winnowOverlapSql(k: Int = 4, w: Int = 5, minShared: Int = 3): String =
    s"""WITH ${winnowCtes(k, w)},
  wd AS (SELECT DISTINCT doc_id, fp FROM wfp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(count(*) AS BIGINT) AS n_shared
FROM wd a JOIN wd b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= $minShared
ORDER BY doc_a, doc_b"""

  /** Mirrors `TextAnalysis.winnowScreen`: the crawl slice's distinct
    * selections joined fp-for-fp against the WHOLE corpus' (the
    * engine serves the corpus side from the durable sketch artifact;
    * the oracle re-derives it — same numbers either way is exactly
    * the artifact gate's claim).
    */
  def winnowScreenSql(k: Int = 4, w: Int = 5, minShared: Int = 3,
      crawlMod: Int = 20, crawlRem: Int = 7): String =
    s"""WITH ${winnowCtes(k, w)},
  wd AS (SELECT DISTINCT doc_id, fp FROM wfp)
SELECT a.doc_id AS new_doc_id, b.doc_id AS corpus_doc_id,
  CAST(count(*) AS BIGINT) AS n_shared
FROM wd a JOIN wd b ON a.fp = b.fp AND b.doc_id <> a.doc_id
WHERE a.doc_id % $crawlMod = $crawlRem
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= $minShared
ORDER BY new_doc_id, corpus_doc_id"""

  /** Mirrors `TextAnalysis.nfcNormalize`: the same decomposed plants
    * (passed through as real UTF-8 in the dumped SQL) normalized by
    * DuckDB's `nfc_normalize` (utf8proc) — the md5 compare pins both
    * engines to one UAX#15 NFC.
    */
  def nfcNormalizeSql: String =
    s"""WITH nraw AS (
    SELECT doc_id, substr(text, 1, 40) || ' café Å ñ é' AS raw
    FROM documents
  )
SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
  md5(nfc_normalize(raw)) AS nfc_hash
FROM nraw ORDER BY doc_id"""

  /** Adaptive-quality oracle: the identical histogram-median chain —
    * per-source value histogram, cumulative count, cutoff = smallest
    * value whose cumulative reaches `(n + 1) // 2`, kept rollup.
    */
  def adaptiveQualitySql: String =
    s"""WITH $statsCte,
  abase AS (
    SELECT t.doc_id, t.n_ws_tokens, d.source
    FROM tstats t JOIN documents d ON d.doc_id = t.doc_id
  ),
  ahist AS (
    SELECT source, n_ws_tokens, count(*) AS c
    FROM abase GROUP BY source, n_ws_tokens
  ),
  acum AS (
    SELECT source, n_ws_tokens, c,
      sum(c) OVER (PARTITION BY source ORDER BY n_ws_tokens ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      sum(c) OVER (PARTITION BY source) AS tot
    FROM ahist
  ),
  acut AS (
    SELECT source, min(n_ws_tokens) AS median_tokens
    FROM acum WHERE cum >= (tot + 1) // 2
    GROUP BY source
  )
SELECT b.source, count(*) AS n_docs,
  CAST(max(k.median_tokens) AS BIGINT) AS median_tokens,
  CAST(sum(CASE WHEN b.n_ws_tokens >= k.median_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN b.n_ws_tokens >= k.median_tokens THEN b.n_ws_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
FROM abase b JOIN acut k USING (source)
GROUP BY b.source ORDER BY b.source"""

  /** Length-trim oracle: the same cumulative-histogram chain with the
    * percentile-pair conditional mins (`ceil(p * n)` ranks in basis
    * points) and the in-range kept rollup.
    */
  def lengthTrimSql(loBp: Int = 1000, hiBp: Int = 9000): String =
    s"""WITH $statsCte,
  abase AS (
    SELECT t.doc_id, t.n_ws_tokens, d.source
    FROM tstats t JOIN documents d ON d.doc_id = t.doc_id
  ),
  ahist AS (
    SELECT source, n_ws_tokens, count(*) AS c
    FROM abase GROUP BY source, n_ws_tokens
  ),
  acum AS (
    SELECT source, n_ws_tokens, c,
      sum(c) OVER (PARTITION BY source ORDER BY n_ws_tokens ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      sum(c) OVER (PARTITION BY source) AS tot
    FROM ahist
  ),
  abounds AS (
    SELECT source,
      min(CASE WHEN cum >= ($loBp * tot + 9999) // 10000 THEN n_ws_tokens END) AS lo_tokens,
      min(CASE WHEN cum >= ($hiBp * tot + 9999) // 10000 THEN n_ws_tokens END) AS hi_tokens
    FROM acum GROUP BY source
  )
SELECT b.source, count(*) AS n_docs,
  CAST(max(k.lo_tokens) AS BIGINT) AS lo_tokens,
  CAST(max(k.hi_tokens) AS BIGINT) AS hi_tokens,
  CAST(sum(CASE WHEN b.n_ws_tokens BETWEEN k.lo_tokens AND k.hi_tokens
    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN b.n_ws_tokens BETWEEN k.lo_tokens AND k.hi_tokens
    THEN b.n_ws_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
FROM abase b JOIN abounds k USING (source)
GROUP BY b.source ORDER BY b.source"""

  /** Shared token-count CTE chain ending in
    * `counts(term, cnt)` over cleaned non-empty tokens.
    */
  private def termCountCtes: String =
    s"""vc_clean AS (
    SELECT ${Tokenize.cleanSql("text")} AS cleaned FROM documents
  ),
  vc_toks AS (
    SELECT unnest(string_split(cleaned, ' ')) AS term FROM vc_clean
  ),
  counts AS (
    SELECT term, count(*) AS cnt FROM vc_toks
    WHERE term <> '' GROUP BY term
  )"""

  /** [[graft.operators.TextAnalysis.vocabCoverage]]: the identical
    * frequency-ranked cumulative prefix, integer threshold compare.
    */
  def vocabCoverageSql(pctsBp: Seq[Int] = Seq(5000, 9000, 9900)): String =
    s"""WITH $termCountCtes,
  ranked AS (
    SELECT cnt,
      row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank,
      sum(cnt) OVER (ORDER BY cnt DESC, term ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM counts
  ),
  tot AS (SELECT sum(cnt) AS total, count(*) AS vocab_total FROM counts),
  levels AS (SELECT unnest([${pctsBp.mkString(", ")}]) AS pct_bp)
SELECT CAST(p.pct_bp AS BIGINT) AS pct_bp,
  CAST(min(r.rank) AS BIGINT) AS vocab_size,
  CAST(min_by(r.cum, r.rank) AS BIGINT) AS covered_tokens,
  CAST(max(t.total) AS BIGINT) AS total_tokens,
  CAST(max(t.vocab_total) AS BIGINT) AS vocab_total
FROM ranked r, tot t, levels p
WHERE r.cum * 10000 >= p.pct_bp * t.total
GROUP BY p.pct_bp ORDER BY pct_bp"""

  /** [[graft.operators.TextAnalysis.heavyHitters]]: the oracle
    * computes the exact top-k directly (no bucket sketch — that is
    * the engine's internal route) plus the identical certificate
    * arithmetic, so hash equality checks result AND proof.
    */
  def heavyHittersSql(k: Int = 20, buckets: Int = 4096): String =
    s"""WITH $termCountCtes,
  tot AS (SELECT sum(cnt) AS n FROM counts),
  th AS (SELECT ((n + ${buckets - 1}) // $buckets) * 2 AS theta FROM tot),
  topk AS (
    SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
    FROM counts ORDER BY cnt DESC, term ASC LIMIT $k
  ),
  m AS (SELECT min(cnt) AS min_cnt, count(*) AS n_top FROM topk)
SELECT CAST(t.rank AS BIGINT) AS rank, t.term, CAST(t.cnt AS BIGINT) AS cnt,
  CAST(h.theta AS BIGINT) AS theta,
  CAST(CASE WHEN m.n_top = $k AND m.min_cnt >= h.theta
    THEN 1 ELSE 0 END AS BIGINT) AS certified
FROM topk t, th h, m ORDER BY rank"""

  /** The planted page expression — the oracle twin of
    * `TextAnalysis.pagedOf` (`||` null-propagates exactly like
    * Spark's `concat`, so null text/source docs are absent in both
    * engines).
    */
  private def pageExpr: String =
    "'home | about | contact' || chr(10) || " +
      "'subscribe to the ' || source || ' newsletter' || chr(10) || " +
      "text || chr(10) || 'copyright ' || source || chr(10) || " +
      "'ref ' || CAST(doc_id AS VARCHAR)"

  private def boilerCtes(minDocs: Int): String =
    s"""pages AS (
    SELECT doc_id, $pageExpr AS page FROM documents
  ),
  nzlines AS (
    SELECT doc_id,
      unnest(generate_series(1, len(string_split(page, chr(10))))) AS ln,
      unnest(string_split(page, chr(10))) AS line
    FROM pages
  ),
  nz AS (SELECT * FROM nzlines WHERE line <> ''),
  boiler AS (
    SELECT line, CAST(count(*) AS BIGINT) AS n_docs
    FROM (SELECT DISTINCT doc_id, line FROM nz)
    GROUP BY line HAVING count(*) >= $minDocs
  )"""

  /** [[graft.operators.TextAnalysis.lineQuality]]: the same page
    * CTE, all-list-function metrics (no unnest), identical integer
    * basis-point math on the `greatest(n_lines, 1)` floor.
    */
  def lineQualitySql: String =
    s"""WITH pages AS (
    SELECT doc_id, $pageExpr AS page FROM documents
  ),
  pl AS (
    SELECT doc_id,
      list_filter(string_split(page, chr(10)), l -> l <> '') AS ls
    FROM pages WHERE page IS NOT NULL
  ),
  m AS (
    SELECT doc_id,
      CAST(len(ls) AS BIGINT) AS n_lines,
      CAST(len(list_filter(ls, l -> regexp_matches(l, '[.!?]$$'))) AS BIGINT) AS punct_end,
      CAST(len(list_filter(ls, l -> len(string_split(l, ' ')) < 4)) AS BIGINT) AS short_lines,
      CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS dup_lines
    FROM pl
  )
SELECT doc_id, n_lines,
  CAST((10000 * punct_end) // greatest(n_lines, 1) AS BIGINT) AS punct_end_bp,
  CAST((10000 * short_lines) // greatest(n_lines, 1) AS BIGINT) AS short_bp,
  CAST((10000 * dup_lines) // greatest(n_lines, 1) AS BIGINT) AS dup_bp
FROM m ORDER BY doc_id"""

  /** [[graft.operators.TextAnalysis.boilerplateLines]]. */
  def boilerplateLinesSql(minDocs: Int = 10): String =
    s"""WITH ${boilerCtes(minDocs)}
SELECT line, n_docs FROM boiler ORDER BY n_docs DESC, line"""

  /** [[graft.operators.TextAnalysis.boilerplateRemoved]]: same CTEs,
    * left join against the boilerplate set, per-doc rebuild with
    * `string_agg` skipping the dropped (CASE-nulled) lines — NULL
    * when every line was template, as in Spark.
    */
  def boilerplateRemovedSql(minDocs: Int = 10): String =
    s"""WITH ${boilerCtes(minDocs)}
SELECT n.doc_id,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(count(b.line) AS BIGINT) AS n_dropped,
  md5(string_agg(CASE WHEN b.line IS NULL THEN n.line END, chr(10)
    ORDER BY n.ln, n.line)) AS clean_md5
FROM nz n LEFT JOIN boiler b ON n.line = b.line
GROUP BY n.doc_id ORDER BY n.doc_id"""
}
