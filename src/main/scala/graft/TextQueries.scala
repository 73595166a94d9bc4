package graft

import graft.operators.TextAnalysis
import graft.oracle.TextOracle

/** Registered queries for the text-analysis family (LLM-pipeline
  * extension beyond the reference surface — SURVEY §7.2 step 7).
  */
object TextQueries {

  val all: Seq[Q] = Seq(
    Q("text_stats",
      (s, dir) => TextAnalysis.stats(s, dir).orderBy("doc_id"),
      Some(TextOracle.statsSql)),
    Q("text_quality_flags",
      (s, dir) => TextAnalysis.qualityFlags(s, dir),
      Some(TextOracle.qualityFlagsSql())),
    Q("text_langid",
      (s, dir) => TextAnalysis.langId(s, dir),
      Some(TextOracle.langIdSql())),
    Q("text_source_profile",
      (s, dir) => TextAnalysis.sourceProfile(s, dir),
      Some(TextOracle.sourceProfileSql())),
    Q("text_top_terms",
      (s, dir) => TextAnalysis.topTerms(s, dir),
      Some(TextOracle.topTermsSql())),
    Q("text_tfidf_top",
      (s, dir) => TextAnalysis.tfidfTop(s, dir),
      Some(TextOracle.tfidfTopSql())),
    // per-source adaptive cutoff via the aggregation-shaped exact
    // histogram median (windows run over value histograms, never
    // corpus rows — the form that survives 100 TB).
    Q("text_quality_adaptive",
      (s, dir) => TextAnalysis.adaptiveQuality(s, dir),
      Some(TextOracle.adaptiveQualitySql)),
    // the outlier rung: per-source P10/P90 length-tail trim through
    // the same histogram-percentile machinery.
    Q("text_length_trim",
      (s, dir) => TextAnalysis.lengthTrim(s, dir),
      Some(TextOracle.lengthTrimSql())),
    Q("text_fingerprint",
      (s, dir) => TextAnalysis.fingerprints(s, dir),
      Some(TextOracle.fingerprintsSql())),
    Q("text_repetition",
      (s, dir) => TextAnalysis.repetition(s, dir),
      Some(TextOracle.repetitionSql)),
    // BM25 ranked retrieval in exact bigint arithmetic (rationalized
    // idf + tf saturation, per-term bp floor before the doc sum).
    Q("text_bm25_topk",
      (s, dir) => TextAnalysis.bm25TopK(s, dir),
      Some(TextOracle.bm25TopKSql())),
    // the artifact-served twin (round 9): tf from the durable
    // positional index's live view (query terms pushed as one In
    // predicate), dl from the durable doc-length companion — no
    // corpus re-tokenization at query time. SAME oracle as the
    // derived form above: hash equality through the gate proves the
    // artifacts carry the identical cleaning chain.
    Q("text_bm25_topk_indexed",
      (s, dir) => TextAnalysis.bm25TopKIndexed(s, dir),
      Some(TextOracle.bm25TopKIndexedSql())),
    // exact phrase over POSITIONAL postings, rarest-term-anchored
    // starts, row-local adjacency verify; the oracle checks by direct
    // list slicing — a deliberately different formulation.
    Q("text_phrase_topk",
      (s, dir) => TextAnalysis.phraseTopK(s, dir),
      Some(TextOracle.phraseTopKSql())),
    // the durable-index twin: same phrase pipeline served from the
    // term-clustered positional artifact with a literal pushdown
    // probe (PushedFilters spec-asserted); same oracle.
    Q("text_phrase_topk_indexed",
      (s, dir) => TextAnalysis.phraseTopKIndexed(s, dir),
      Some(TextOracle.phraseTopKSql())),
    // the NEAR relaxation between bag-of-words and exact phrase:
    // both terms within a token window, ranked by closeness.
    Q("text_phrase_near",
      (s, dir) => TextAnalysis.proximityTopK(s, dir),
      Some(TextOracle.proximityTopKSql())),
    Q("text_phrase_near_indexed",
      (s, dir) => TextAnalysis.proximityTopKIndexed(s, dir),
      Some(TextOracle.proximityTopKSql())),
    // model-based quality scoring: a per-term Laplace-smoothed
    // pass-probability scorer DISTILLED from the heuristic flags
    // (the CCNet/GPT-3 classifier-above-heuristics practice), exact
    // integers end to end; both verdicts emitted side by side.
    Q("text_quality_model",
      (s, dir) => TextAnalysis.qualityModel(s, dir),
      Some(TextOracle.qualityModelSql())),
    // trained BPE tokenizer: merge rules learned over the word-
    // frequency table (vocabulary-sized rounds, never corpus-sized),
    // oracle-unrolled like the Lloyd codebook.
    Q("text_bpe_merges",
      (s, dir) => graft.operators.Bpe.merges(s, dir),
      Some(TextOracle.bpeMergesSql())),
    // per-document token accounting under the trained vocabulary —
    // the number a token-budget/packing planner consumes.
    Q("text_bpe_tokens",
      (s, dir) => graft.operators.Bpe.tokens(s, dir),
      Some(TextOracle.bpeTokensSql())),
    // per-source fertility (tokens/word, chars/token in exact bp) —
    // the tokenizer-eval rollup that exposes a vocabulary
    // fragmenting one source and inflating its token budget.
    Q("text_bpe_fertility",
      (s, dir) => graft.operators.Bpe.fertility(s, dir),
      Some(TextOracle.bpeFertilitySql())),
    // the durable tokenizer artifact (content-fingerprint-gated on
    // the documents source); the oracle retrains from scratch.
    Q("text_bpe_artifact",
      (s, dir) => graft.operators.Bpe.vocabArtifact(s, dir),
      Some(TextOracle.bpeVocabSql())),
    // loader-ready token-id sequences under the trained segmentation:
    // merge application paid per DISTINCT word, ids one vocabulary
    // window, per-occurrence work a broadcast join — the shape that
    // tokenizes 100 TB.
    Q("text_bpe_ids",
      (s, dir) => graft.operators.Bpe.tokenIds(s, dir),
      Some(TextOracle.bpeTokenIdsSql())),
    // the tokenizer RUNTIME twin: the same token-id sequences via a
    // row-local shipped-merges replace chain (no vocabulary join to
    // segment — the OOV-capable form a live ingest runs), hashed
    // against the SAME oracle.
    Q("text_bpe_ids_rowlocal",
      (s, dir) => graft.operators.Bpe.tokenIdsRowLocal(s, dir),
      Some(TextOracle.bpeTokenIdsSql())),
    // the PRODUCTION tokenizer end-to-end: durable fast-trained
    // artifact at the ProdMerges budget (the trainer's merge loop is
    // driver-local over the vocabulary-sized word-frequency table —
    // merge count costs loop iterations, not cluster rounds) shipped
    // through the packed O(1)-plan-size segmenter. The oracle reads
    // the durable segments ARTIFACT as parquet (a production merge
    // budget cannot unroll as retraining CTEs) and re-derives ids,
    // positions and ordering — everything downstream of training is
    // hash-gated; BpeFastSpec pins training itself merge-for-merge
    // against the distributed trainer.
    Q("text_bpe_ids_prod",
      (s, dir) => graft.operators.Bpe.tokenIdsProd(s, dir),
      None,
      oracleOf = Some(dir => TextOracle.bpeTokenIdsProdSql(dir))),
    // corpus-bigram familiarity (the exact-integer LM-perplexity
    // filter analog): tf-weighted mean corpus frequency per doc.
    Q("text_bigram_surprise",
      (s, dir) => TextAnalysis.bigramSurprise(s, dir),
      Some(TextOracle.bigramSurpriseSql())),
    // winnowing fingerprints (MOSS): per-window rightmost-argmin
    // gram selection at ~2/(w+1) density with the >= w+k-1 shared-run
    // detection floor — row-local array arithmetic end to end.
    Q("text_winnow_fingerprints",
      (s, dir) => TextAnalysis.winnowFingerprints(s, dir),
      Some(TextOracle.winnowFingerprintsSql())),
    // the sketch's application: fingerprint-keyed doc-pair overlap
    // (LSH-banding shape, never all pairs); the corpus's planted
    // re-crawl duplicates surface with near-total overlap.
    Q("text_winnow_overlap",
      (s, dir) => TextAnalysis.winnowOverlap(s, dir),
      Some(TextOracle.winnowOverlapSql())),
    // incremental crawl screening: a doc_id-slice "crawl" fingerprints
    // row-locally and joins fp-keyed against the DURABLE whole-corpus
    // winnow sketch (never re-fingerprinting the corpus) — the
    // artifact-served read path under the hash gate.
    Q("text_winnow_screen",
      (s, dir) => TextAnalysis.winnowScreen(s, dir),
      Some(TextOracle.winnowScreenSql())),
    // cross-document repeated-line (boilerplate) set — the CCNet/
    // RefinedWeb line-dedup rung over the planted multi-line page
    // view: in-doc distinct is row-local, ONE line-keyed shuffle.
    Q("text_boilerplate_lines",
      (s, dir) => TextAnalysis.boilerplateLines(s, dir),
      Some(TextOracle.boilerplateLinesSql())),
    // per-document boilerplate removal: original line order carried
    // as data (no window), hint-free drop-list join, doc-keyed
    // rebuild hashed for the compare.
    Q("text_boilerplate_removed",
      (s, dir) => TextAnalysis.boilerplateRemoved(s, dir),
      Some(TextOracle.boilerplateRemovedSql())),
    // line-level quality signals (the C4 terminal-punctuation rule +
    // FineWeb short/duplicated-line fractions) over the page view —
    // no generator, no shuffle: higher-order functions over each
    // doc's own line array, one codegen'd projection per row.
    Q("text_line_quality",
      (s, dir) => TextAnalysis.lineQuality(s, dir),
      Some(TextOracle.lineQualitySql)),
    // artifact-served twin: the template set filters the durable
    // (line, n_docs) artifact at query time — SAME oracle as the
    // derived form (the bm25_topk_indexed convention: hash equality
    // proves the artifact carries the identical line accounting).
    Q("text_boilerplate_removed_indexed",
      (s, dir) => TextAnalysis.boilerplateRemovedIndexed(s, dir),
      Some(TextOracle.boilerplateRemovedSql())),
    // Unicode NFC canonicalization (the pre-hash/pre-dedup rung):
    // decomposed plants on every row, JDK Normalizer vs DuckDB
    // nfc_normalize — the md5 compare pins one UAX#15 NFC.
    Q("text_nfc_normalize",
      (s, dir) => TextAnalysis.nfcNormalize(s, dir),
      Some(TextOracle.nfcNormalizeSql)),
    // PII scrubbing over planted emails/IPs (the html_extract
    // fixture convention) — counts + redacted hash, RE2-mirrored.
    Q("text_redact_pii",
      (s, dir) => TextAnalysis.redactPiiDemo(s, dir),
      Some(TextOracle.redactPiiSql)),
    // regex-tier HTML -> text extraction over constructed pages; the
    // oracle runs the identical rules in RE2, pinning the
    // cross-engine regex semantics (the risk of a regex extractor).
    Q("text_html_extract",
      (s, dir) => TextAnalysis.htmlExtract(s, dir),
      Some(TextOracle.htmlExtractSql)),
    // tokenizer sizing: smallest frequency-ranked vocabulary prefix
    // covering 50/90/99% of token mass, exact-integer thresholds.
    Q("text_vocab_coverage",
      (s, dir) => TextAnalysis.vocabCoverage(s, dir),
      Some(TextOracle.vocabCoverageSql())),
    // sketch-then-verify heavy hitters: bucket sketch prunes the
    // vocabulary tail out of the term-keyed aggregation; the result
    // carries its own exactness certificate, and the oracle computes
    // the exact top-k + certificate directly (no sketch).
    Q("text_heavy_hitters",
      (s, dir) => TextAnalysis.heavyHitters(s, dir),
      Some(TextOracle.heavyHittersSql())))
}
