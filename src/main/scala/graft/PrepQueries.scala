package graft

import graft.operators.CorpusPrep
import graft.oracle.PrepOracle

/** Registered queries for the corpus-preparation family (LLM-pipeline
  * extension beyond the reference surface — SURVEY §7.2 step 7).
  */
object PrepQueries {

  val all: Seq[Q] = Seq(
    Q("prep_split_assign",
      (s, dir) => CorpusPrep.splitAssign(s, dir),
      Some(PrepOracle.splitAssignSql())),
    // the near-dup-leakage-free variant: the same bucket rule keyed
    // by duplicate CLUSTER, so near-duplicates never straddle the
    // train/eval boundary.
    Q("prep_split_leakfree",
      (s, dir) => CorpusPrep.splitLeakfree(s, dir),
      Some(PrepOracle.splitLeakfreeSql())),
    // the capstone: quality ∘ dedup ∘ split composed in one query —
    // the frame a training run actually reads.
    Q("prep_training_corpus",
      (s, dir) => CorpusPrep.trainingCorpus(s, dir),
      Some(PrepOracle.trainingCorpusSql())),
    Q("prep_mixture",
      (s, dir) => CorpusPrep.mixture(s, dir),
      Some(PrepOracle.mixtureSql())),
    // temperature sampling (alpha = 1/2): target shares ~ sqrt(n_s),
    // realized by exact-integer downsampling rates.
    Q("prep_alpha_mixture",
      (s, dir) => CorpusPrep.alphaMixture(s, dir),
      Some(PrepOracle.alphaMixtureSql())),
    // the distributed two-pass running sum vs the oracle's global
    // window: hash equality proves the rewrite exact.
    Q("prep_shard_packing",
      (s, dir) => CorpusPrep.shardPacking(s, dir),
      Some(PrepOracle.shardPackingSql())),
    // the RECURSIVE two-pass running sum: no stage ever windows more
    // than bucketSize rows on one reducer, at ANY corpus size — the
    // sizing-rule obligation packedOf carries is gone. bucketSize=8
    // forces multi-level recursion on the verify corpus; the oracle
    // is the same global window (the output is bucketing-independent).
    Q("prep_shard_packing_recursive",
      (s, dir) => CorpusPrep.shardPackingRecursive(s, dir),
      Some(PrepOracle.shardPackingSql())),
    // the packer fed by the TRAINED tokenizer instead of whitespace
    // counts — the composition a real loader runs (budgets are in
    // model tokens); the `sized`-frame seam makes it one select.
    Q("prep_shard_packing_bpe",
      (s, dir) => CorpusPrep.shardPackingOf(
        operators.Bpe.tokens(s, dir).selectExpr(
          "doc_id", "n_bpe_tokens as n_tokens"),
        budget = 4096L, bucketSize = 100L),
      Some(PrepOracle.shardPackingBpeSql())),
    // the packer budgeted in PRODUCTION-tokenizer tokens (the durable
    // fast-trained artifact at the ProdMerges budget). The oracle
    // reads that segments artifact as parquet for per-word sizes and
    // replays the packing as one global window — the vocabulary
    // join, token accounting, and the two-pass running-sum rewrite
    // are hash-gated end to end (training itself rides on
    // BpeFastSpec, as for text_bpe_ids_prod).
    Q("prep_shard_packing_bpe_prod",
      (s, dir) => CorpusPrep.shardPackingOf(
        operators.Bpe.tokensProd(s, dir).selectExpr(
          "doc_id", "n_bpe_tokens as n_tokens"),
        budget = 4096L, bucketSize = 100L),
      None,
      oracleOf = Some(dir => PrepOracle.shardPackingBpeProdSql(dir))),
    // benchmark n-gram decontamination: distinct 5-gram overlap of
    // every training doc against the eval split's gram set.
    Q("prep_decontaminate",
      (s, dir) => CorpusPrep.decontaminate(s, dir),
      Some(PrepOracle.decontaminateSql())),
    // the embedding-space twin: paraphrase-robust decontamination via
    // train-vs-eval sign-LSH candidates + exact-cosine verify (the
    // gram join above is blind to paraphrased leakage).
    Q("prep_semantic_decontaminate",
      (s, dir) => CorpusPrep.semanticDecontaminate(s, dir),
      Some(graft.oracle.SimOracle.semanticDecontaminateSql())),
    // per-source/domain cap via the bounded TopK aggregator (O(n)
    // state per source over the shuffle); the oracle runs the window
    // formulation — hash equality proves the rewrite exact.
    Q("prep_source_cap",
      (s, dir) => CorpusPrep.sourceCap(s, dir),
      Some(PrepOracle.sourceCapSql())),
    // reproducibility manifest: per-(split, source) counts and an
    // order-independent exact-integer content checksum.
    Q("prep_manifest",
      (s, dir) => CorpusPrep.manifest(s, dir),
      Some(PrepOracle.manifestSql())),
    // the loader-ready packing view: per-doc sequence id, start
    // offset, and boundary-spill flag from the SAME running total as
    // shard packing.
    Q("prep_sequence_map",
      (s, dir) => CorpusPrep.sequenceMap(s, dir),
      Some(PrepOracle.sequenceMapSql())),
    // epoch-shuffled packing: every epoch a distinct deterministic
    // permutation (md5(epoch|doc)) packed by the same bucketed
    // two-pass running total; oracle runs the global window per epoch.
    Q("prep_epoch_pack",
      (s, dir) => CorpusPrep.epochPack(s, dir),
      Some(PrepOracle.epochPackSql())),
    // quality-tier importance resampling (DCLM/FineWeb posture):
    // keep RATE follows the quality tier instead of a binary filter.
    Q("prep_quality_resample",
      (s, dir) => CorpusPrep.qualityResample(s, dir),
      Some(PrepOracle.qualityResampleSql())),
    // retrieval/embedding prep: overlapping fixed-window character
    // chunks with guaranteed coverage — zero-shuffle explode.
    Q("prep_chunks",
      (s, dir) => CorpusPrep.chunks(s, dir),
      Some(PrepOracle.chunksSql())),
    // CDC merge: recrawl/takedown/discovery change feed folded into
    // the base snapshot — latest-wins overwrite (the next corpus a
    // training run reads). Spark compacts the feed with a max-struct
    // aggregation; the oracle replays it with a seq-DESC window.
    Q("cdc_merge_snapshot",
      (s, dir) => operators.Cdc.mergeSnapshotQuery(s, dir),
      Some(graft.oracle.CdcOracle.mergeSnapshotSql)),
    // Same feed consumed as SCD-2 version history (audit/lineage
    // view): every version kept, delete tombstones close their key.
    Q("cdc_history_scd",
      (s, dir) => operators.Cdc.historyScdQuery(s, dir),
      Some(graft.oracle.CdcOracle.historyScdSql)),
    // Time travel: the merged snapshot AS OF seq 1 — the seq-2
    // second recrawls are excluded, so doubly-updated docs show
    // their intermediate text (observable vs the full merge).
    Q("cdc_asof_snapshot",
      (s, dir) => operators.Cdc.asOfSnapshotQuery(s, dir),
      Some(graft.oracle.CdcOracle.asOfSnapshotSql())))
}
