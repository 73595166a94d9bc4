package graft

import graft.operators.{Hybrid, Similarity}
import graft.oracle.{HybridOracle, SimOracle}

/** Registered queries for the similarity-search family (LLM-pipeline
  * extension beyond the reference surface — SURVEY §7.2 step 7).
  */
object SimQueries {

  val all: Seq[Q] = Seq(
    // DEFAULT cosine search = the bounded TopK-aggregator form (round-7
    // verdict #5): per-partition O(k) top-k state before any exchange —
    // the plan that survives a 100 TB corpus. The full-corpus-window
    // form below is the registered cross-check twin (the
    // searchTables/searchTablesWindowed arrangement); both hash against
    // ONE oracle, and SimilaritySpec pins the default's plan window-free.
    Q("sim_cosine_topk",
      (s, dir) => Similarity.cosineTopKAgg(s, dir),
      Some(SimOracle.cosineTopKSql())),
    Q("sim_lsh_bucketed",
      (s, dir) => Similarity.lshPairs(s, dir),
      Some(SimOracle.lshPairsSql())),
    Q("sim_ivf_probe",
      (s, dir) => Similarity.ivfProbe(s, dir),
      Some(SimOracle.ivfProbeSql())),
    // the LIVE-corpus twin (round 9): base + streamed vector deltas
    // through the same cell-routed probe — with no deltas
    // accumulated it degrades to the base path, so it carries the
    // SAME oracle; VectorDeltaSpec pins the with-deltas behavior.
    Q("sim_ivf_probe_live",
      (s, dir) => Similarity.ivfProbeLive(s, dir),
      Some(SimOracle.ivfProbeSql())),
    // the recall dial AS a search operator: candidates from each
    // probe's top-2 routed cells (measured +700bp recall vs own-cell).
    Q("sim_ivf_probe_np2",
      (s, dir) => Similarity.ivfProbeMulti(s, dir),
      Some(SimOracle.ivfProbeMultiSql())),
    Q("sim_lsh_recall",
      (s, dir) => Similarity.lshRecall(s, dir),
      Some(SimOracle.lshRecallSql())),
    Q("sim_ivf_recall",
      (s, dir) => Similarity.ivfRecall(s, dir),
      Some(SimOracle.ivfRecallSql())),
    // the nprobe dial measured: recall at nprobe=2 vs the own-cell
    // baseline above (same exact top-k ground truth).
    Q("sim_ivf_recall_np2",
      (s, dir) => Similarity.ivfRecallMulti(s, dir),
      Some(SimOracle.ivfRecallMultiSql())),
    // recall at the CORPUS-SCALED codebook (k ~ sqrt(n),
    // Similarity.numCentsFor — the sizing rule the 100 TB paths
    // route with): measured beside the pinned-8 audit above, so the
    // k dial ships with its quality number at both settings.
    Q("sim_ivf_recall_scaled",
      (s, dir) => Similarity.ivfRecall(s, dir,
        numCents = Similarity.autoCents(s, dir)),
      Some(SimOracle.ivfRecallScaledSql())),
    // full-corpus-window twin: same oracle as sim_cosine_topk proves
    // the partial-top-k default exact against the window formulation.
    Q("sim_cosine_topk_windowed",
      (s, dir) => Similarity.cosineTopK(s, dir),
      Some(SimOracle.cosineTopKSql())),
    // diversity-deduplicated retrieval: top-kCand candidates
    // collapsed to one representative per embedding near-dup
    // cluster, re-ranked to k — the query-time guard against
    // near-identical result lists.
    Q("sim_topk_diverse",
      (s, dir) => Similarity.cosineTopKDiverse(s, dir),
      Some(SimOracle.topKDiverseSql())),
    // cluster-balanced sampling plan over the trained cells (the
    // SemDeDup-adjacent prep rung): per-cell share, keep cap, and
    // sampling weight in exact bigint.
    Q("sim_cluster_balance",
      (s, dir) => Similarity.clusterBalance(s, dir),
      Some(SimOracle.clusterBalanceSql())),
    // the cap APPLIED: per-vector keep/drop decisions (the D4-style
    // diversified corpus view a balanced sampler actually reads).
    Q("sim_cell_cap",
      (s, dir) => Similarity.cellCapApplied(s, dir),
      Some(SimOracle.cellCapAppliedSql())),
    // product quantization: the compressed-domain rung (64x smaller
    // representation; ADC scores from codes + a per-probe lookup
    // table, raw vectors touched only for the bounded re-rank).
    Q("sim_pq_codebook",
      (s, dir) => Similarity.pqCodebookSummary(s, dir),
      Some(SimOracle.pqCodebookSummarySql())),
    Q("sim_pq_topk",
      (s, dir) => Similarity.pqTopK(s, dir),
      Some(SimOracle.pqTopKSql())),
    // what the compression + re-rank cut costs, measured per probe
    // against the exact top-k (the M/K/rerank-depth dial).
    Q("sim_pq_recall",
      (s, dir) => Similarity.pqRecall(s, dir),
      Some(SimOracle.pqRecallSql())),
    // the composed index (FAISS-IVFPQ layout): routed cells, ADC over
    // codes, bounded exact re-rank — neither half works alone at
    // 100 TB (flat ADC is compute-bound, raw-vector IVF is I/O-bound).
    Q("sim_ivfpq_topk",
      (s, dir) => Similarity.ivfPqTopK(s, dir),
      Some(SimOracle.ivfPqTopKSql())),
    // joint routing+compression loss vs exact, attributable against
    // sim_pq_recall (compression only) / sim_ivf_recall_np2 (routing).
    Q("sim_ivfpq_recall",
      (s, dir) => Similarity.ivfPqRecall(s, dir),
      Some(SimOracle.ivfPqRecallSql())),
    // plan-stats routed dispatch (exact scan vs IVF-PQ — the
    // strategy_auto arrangement for ANN); oracle = the exact
    // formulation, proving the small-corpus route at test scale.
    Q("sim_search_auto",
      (s, dir) => Similarity.searchAuto(s, dir),
      Some(SimOracle.searchAutoSql())),
    // hybrid lexical+vector retrieval: BM25 and cosine candidate
    // lists for the same query document, fused by exact-integer
    // reciprocal-rank fusion — both towers are bounded pipelines,
    // the fusion joins two k-row frames (operators.Hybrid).
    Q("search_hybrid_rrf",
      (s, dir) => Hybrid.rrfTopK(s, dir),
      Some(HybridOracle.rrfTopKSql())),
    // the fused query's 100 TB form: same BM25 tower, vector
    // candidates from the probe's routed IVF cell (the
    // sim_cosine_topk / sim_ivf_probe relationship, lifted).
    Q("search_hybrid_rrf_ivf",
      (s, dir) => Hybrid.rrfTopKIvf(s, dir),
      Some(HybridOracle.rrfTopKIvfSql())),
    // N hybrid queries, one shared corpus pass per tower (the
    // batched-search arrangement lifted to fused retrieval);
    // per-probe rows are exactly the single fusion's.
    Q("search_hybrid_batch",
      (s, dir) => Hybrid.rrfTopKBatch(s, dir),
      Some(HybridOracle.rrfTopKBatchSql())),
    // the trained-codebook build itself, pinned: per centroid, final
    // member count + exact squared norm of the sum-vector — any
    // drift in any Lloyd round moves this row.
    Q("sim_ivf_codebook",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val sizes = Similarity.ivfCells(s, dir)
          .groupBy(col("cell_id").as("cent_id"))
          .agg(count(lit(1)).as("n_members"))
        Similarity.ivfCodebook(s, dir)
          .join(sizes, Seq("cent_id"))
          .select(col("cent_id"), col("n_members"), col("cnq"))
          .orderBy("cent_id")
      },
      Some(SimOracle.ivfCodebookSql())))
}
