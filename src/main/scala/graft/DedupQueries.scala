package graft

import graft.operators.Dedup
import graft.oracle.DocOracle

/** Registered queries for the deduplication family (LLM-pipeline
  * extension beyond the reference surface — SURVEY §7.2 step 7).
  */
object DedupQueries {

  val all: Seq[Q] = Seq(
    Q("dedup_exact",
      (s, dir) => Dedup.exact(s, dir),
      Some(DocOracle.exactSql)),
    // the C4-style normalized-exact rung: re-encodings / case /
    // spacing edits collapse; content edits still need MinHash.
    Q("dedup_exact_normalized",
      (s, dir) => Dedup.exactNormalized(s, dir),
      Some(DocOracle.exactNormalizedSql)),
    // URL canonicalization — the crawl-frontier identity rung
    // (scheme case / www / default port / tracking params / param
    // order / fragment / trailing slash all collapse onto one key).
    Q("dedup_url_normalize",
      (s, dir) => Dedup.urlNormalize(s, dir),
      Some(DocOracle.urlNormalizeSql)),
    Q("dedup_url_normalized",
      (s, dir) => Dedup.urlDedup(s, dir),
      Some(DocOracle.urlDedupSql)),
    // the crawl-ops curation table: identity + quality + volume per
    // canonical domain (what to re-crawl, cap, or drop).
    Q("url_domain_report",
      (s, dir) => Dedup.urlDomainReport(s, dir),
      Some(DocOracle.urlDomainReportSql)),
    Q("dedup_minhash_lsh",
      (s, dir) => Dedup.minhashLsh(s, dir),
      Some(DocOracle.minhashLshSql())),
    // the incremental-crawl shape: a delta batch checked against the
    // banded base (never base x base), per-delta-doc verdict rows.
    Q("dedup_incremental",
      (s, dir) => Dedup.incrementalNearDups(s, dir),
      Some(DocOracle.incrementalSql())),
    // cluster resolution: star-contraction CC is the default (O(log n)
    // rounds on any graph shape — round-8 change); label propagation
    // stays registered as the cross-check twin. BOTH hash against the
    // one recursive-CTE oracle.
    Q("dedup_clusters",
      (s, dir) => Dedup.clusters(s, dir),
      Some(DocOracle.clustersSql())),
    Q("dedup_clusters_labelprop",
      (s, dir) => Dedup.clustersLabelProp(s, dir),
      Some(DocOracle.clustersSql())),
    Q("dedup_kept_corpus",
      (s, dir) => Dedup.keptCorpus(s, dir),
      Some(DocOracle.keptCorpusSql())),
    // keep-policy variant: per cluster keep the LONGEST member, not
    // the min id — one max_by aggregation (Spark) vs a ranking
    // window (oracle), so the argmax itself is cross-checked.
    Q("dedup_keep_best",
      (s, dir) => Dedup.keepBestQuery(s, dir),
      Some(DocOracle.keepBestSql())),
    // the longest-member policy APPLIED: the kept corpus under
    // keep-best — observably diverges from dedup_kept_corpus (about
    // half the fixture clusters pick a non-min-id keeper).
    Q("dedup_kept_corpus_best",
      (s, dir) => Dedup.keptCorpusBest(s, dir),
      Some(DocOracle.keptCorpusBestSql())),
    Q("dedup_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccard(s, dir),
      Some(DocOracle.ngramJaccardSql())),
    // asymmetric containment (inter / min-size): the doc-in-doc dup
    // class Jaccard's union denominator hides; same candidates and
    // shingle lineage as the Jaccard rung.
    Q("dedup_containment",
      (s, dir) => Dedup.containment(s, dir),
      Some(DocOracle.containmentSql())),
    Q("dedup_simhash",
      (s, dir) => Dedup.simhash(s, dir),
      Some(DocOracle.simhashSql)),
    Q("dedup_simhash_pairs",
      (s, dir) => Dedup.simhashPairs(s, dir),
      Some(DocOracle.simhashPairsSql)),
    Q("dedup_embedding_cosine",
      (s, dir) => Dedup.embeddingCosine(s, dir),
      Some(graft.oracle.SimOracle.embeddingCosineSql())),
    // SemDeDup: the published cluster-scoped semantic dedup —
    // candidates are exhaustive WITHIN a trained k-means cell and
    // empty across cells (n^2/k comparisons, k scaling with the
    // corpus), keeper-by-min-id; vs the LSH-bucketed candidates of
    // dedup_embedding_cosine above.
    Q("dedup_semantic_cells",
      (s, dir) => Dedup.semanticCells(s, dir),
      Some(graft.oracle.SimOracle.semanticCellsSql())),
    // sub-document granularity: per-doc coverage by corpus-duplicated
    // n-token spans (the suffix-array span-dedup signal at fixed n).
    Q("dedup_span_coverage",
      (s, dir) => Dedup.spanCoverage(s, dir),
      Some(DocOracle.spanCoverageSql())),
    // cross-source contamination matrix: exact shared-shingle counts
    // with Jaccard + directional containments; the shingle lineage
    // collapses to (source, shingle) before any join, so pair fanout
    // is bounded by |sources|^2 per shingle, never by documents.
    Q("dedup_source_overlap",
      (s, dir) => Dedup.sourceOverlap(s, dir),
      Some(DocOracle.sourceOverlapSql)),
    // the dedup report card: cluster-size distribution + drop mass,
    // one tiny aggregation over the keeper rows; the oracle
    // re-clusters via recursive closure, so equality re-checks the
    // clustering through a second algorithm.
    Q("dedup_cluster_histogram",
      (s, dir) => Dedup.clusterHistogram(s, dir),
      Some(DocOracle.clusterHistogramSql())),
    // the removal step: cleaned text with corpus-duplicated spans cut
    // out (shares the persisted span lineage with the coverage view).
    Q("dedup_span_removed",
      (s, dir) => Dedup.spanRemoved(s, dir),
      Some(DocOracle.spanRemovedSql())))
}
