"""Measured scaling curve: run a representative query subset at every
local scale factor and report wall-time growth vs data growth.

The SCALE.md design notes claim each plan survives a 100-1000x scale-up;
this tool MEASURES the local end of that claim: between sf0.01 and sf0.1
the data grows 10x, so a query whose wall grows ~<=10x is at-or-below
linear (fixed overhead amortizes; partial aggregation absorbs repeats),
and anything super-linear is a red flag the suite would otherwise hide.

Usage: python tools/scaling_curve.py [out.json] [query ...]
(default: SCALING.json, the built-in representative subset)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one query per family: scans/agg, join-heavy, window, WPL parse, OML,
# dedup shuffle, connected components, token shuffle, ANN, curation
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q18_large_orders",
    "user_sessions",
    "wpl_parse_clf",
    "wpl_oml_pipeline",
    "dedup_exact",
    "minhash_lsh_dups",
    "top_tokens",
    "lm_perplexity",
    "bm25_search",
    "cosine_topk",
    "curation_pipeline",
    # r6 additions: cohort join-reuse, boundary-bucketed deciles,
    # grouping sets, PMI token shuffle, seeded shard windows
    "events_retention",
    "customer_deciles",
    "orders_cube",
    "bigram_pmi",
    "training_shards",
    # r8 additions: map-only repetition signals, token-keyed KL,
    # broadcast-vocab OOV probe
    "doc_repetition",
    "domain_kl",
    "vocab_oov",
    # r9 additions: conditional-agg dual unigram models, posexplode
    # centroid agg + broadcast z-scores, ADC codes-only ANN scoring
    "dsir_weights",
    "embedding_outliers",
    "pq_ann_topk",
    "ngram_novelty",
    "cross_source_overlap",
    "winnow_fingerprints",
    "ccnet_buckets",
    "zipf_slope",
    "ivfpq_ann_topk",
    # r10 additions: trigram backoff LM (the heaviest new token shuffle),
    # 4x-exploded truncation ranks, sketch rollup, map-only entropy,
    # two-level Heaps checkpoints
    "stupid_backoff_ppl",
    "mrl_truncation_eval",
    "countmin_heavy_hitters",
    "char_entropy",
    "heaps_law",
    # r10 batch 2/3: map-only CDC chunking, broadcast-census k-anon,
    # clustered semantic dedup, iterative PageRank rounds
    "cdc_chunking",
    "k_anonymity_suppress",
    "semdedup_prune",
    "neardup_pagerank",
    # r11 additions: freq-of-freq rollup, bigram distinct agg, bucketed
    # sorted-adjacency window, JL shortlist + rerank
    "good_turing_mass",
    "distinct_ngrams",
    "prefix_containment_dedup",
    "jl_projection_ann",
    # r11 batch 2: one-row-broadcast mixture weights, tiny-agg DP noise,
    # CC-group-keyed split (rides the pair/component machinery)
    "domain_temperature_mix",
    "dp_event_release",
    "leakage_safe_split",
    # r12 additions: map-only URL canonical keys, integer-HOF Luhn scan,
    # vocab-bounded NB counts + broadcast model, one-step DoReMi agg,
    # per-key EWMA fold, partial-Gram whitening, greedy max-coverage
    # (persisted token shuffle + k tiny argmax rounds — the heaviest)
    "url_canonicalize",
    "luhn_card_scan",
    "naive_bayes_quality",
    "doremi_weights",
    "ewma_anomaly_batch",
    "embedding_whiten",
    "coverage_select",
    # r12 batch 2: map-only C4 line/doc heuristics, lang-count shuffle +
    # tiny water-filling windows, bounded suffix explode + broadcast semi
    "c4_filters",
    "unimax_weights",
    "domain_blocklist_filter",
    # r12 batch 3: bigram-keyed KN count joins, sort-based 2D skyline,
    # k map-only farthest-point rounds
    "kneser_ney_ppl",
    "pareto_frontier",
    "kcenter_select",
    # r12 batch 4: per-key sorted collect + HOF Viterbi fold; two-phase
    # rank + rank-delta equi-join pairing
    "burst_detection",
    "snm_candidate_pairs",
    # r12 batch 5: map-only HRW hashing; one source-keyed robust rollup
    "rendezvous_shards",
    "robust_source_stats",
    # r13 additions: map-only HOF readability + line filters, (doc,tok)
    # spectrum rollup, shuffle-joined trigram commonness, blocked
    # record-linkage self-join, two-phase KMV k-smallest, triple
    # two-phase global ranking, iterative bounded-graph PageRank,
    # 8-round distributed BPE (driver loop, compact vocab state)
    "flesch_readability",
    "yule_k_diversity",
    "softdedup_weights",
    "refinedweb_line_filter",
    "fellegi_sunter_links",
    "kmv_theta_sketch",
    "quality_ensemble_rank",
    "host_pagerank",
    "bpe_train_merges",
    # r13 batch 2: four bounded-agg UNION card, per-key two-phase
    # reservoir, Arrow NFC slow path, 3-round LPA on the host graph
    "wimbd_report",
    "per_source_reservoir",
    "unicode_normalize_clean",
    "host_label_propagation",
    # r13 batch 3: doc-distinct token contingency shuffle, fixed-bin
    # drift rollup, confusion-matrix eval riding the NB plan, dual
    # exact rankers + metric join, 200x bounded bootstrap explode,
    # bounded-candidate Arrow greedy rerank
    "chi2_feature_select",
    "psi_drift",
    "classifier_prf",
    "rank_eval_ndcg",
    "bootstrap_ci",
    "mmr_rerank",
    # r14 additions: the TPC-H completion's heaviest joins (derived
    # supply relation, decorrelated EXISTS pair), bounded-domain rank
    # evals, fixed-block similarity self-join, map-only HOF MATTR,
    # window-closed-form CUSUM, ordered 3-way triangle join
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q16_parts_supplier_count",
    "q21_suppliers_kept_waiting",
    "auc_roc",
    "spearman_corr",
    "ks_drift",
    "log_odds_keywords",
    "host_triangles",
    "edit_distance_join",
    "mattr_diversity",
    "cusum_changepoint",
    "curriculum_order",
    "score_quantile_normalize",
    # r14 batch 2: NB-riding threshold table, skew-proof snake shards,
    # map-only KWIC concordance, bounded label-pair centroid geometry,
    # calendar-bounded classical decomposition
    "threshold_sweep",
    "balanced_shards",
    "kwic_extract",
    "centroid_distances",
    "seasonal_decompose",
    # r14 batch 3: calendar-bounded pairwise trend frame, censoring-
    # aware KM curve, decimal-moment CUPED constants
    "trend_test",
    "kaplan_meier_retention",
    "cuped_adjustment",
    # r15 additions: the two chunked scale-out rewrites (per-week
    # composites + stitch MUST stay linear), bounded-bin rank tests,
    # integer-exact drift distances, basket pair generation (linear in
    # orders), per-user transition windows, bounded-domain quintiles,
    # calendar-bounded sequential readouts (burst_detection and
    # ewma_anomaly_batch — the chunked rewrites — are already listed in
    # the r12 section above)
    "mann_whitney_u",
    "wasserstein_drift",
    "market_basket",
    "markov_transitions",
    "rfm_segments",
    "dpo_pairs",
    "trimmed_source_stats",
    "acf_daily",
    "sprt_readout",
    "logrank_test",
    "exp_smooth_daily",
    "cem_att",
    # r15 batches 6-8: broadcast-centroid silhouette, rank-bounded
    # stylometry pair frame, two-phase dimension ranking, keyness agg,
    # calendar-bounded CCF/portmanteau
    "silhouette_labels",
    "burrows_delta",
    "abc_analysis",
    "dunning_keyness",
    "lead_lag_corr",
    "ljung_box",
    # r16 additions: value-domain rank histograms, calendar-bounded
    # day-pair frames, blocked within-day ranks, quantized-trig DFT
    # rollup, fact-join unit values, per-user cohort rollup,
    # per-customer gap windows, bigram t-score shuffle, (doc, word)
    # burstiness rollup, reference n-gram joins, edge-moment
    # assortativity
    "kruskal_wallis",
    "kendall_tau_daily",
    "friedman_test",
    "spectral_peaks",
    "unit_value_index",
    "cohort_retention",
    "interpurchase_time",
    "collocation_tscore",
    "word_burstiness",
    "rouge_overlap",
    "host_assortativity",
]

SF_DIRS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args and args[0].endswith(".json") else "SCALING.json"
    names = [a for a in args if not a.endswith(".json")] or DEFAULT_QUERIES

    from pyspark.sql import functions as F

    from wp_motor_spark.queries import QUERIES
    from wp_motor_spark.session import get_spark

    spark = get_spark(app_name="wp_motor_spark_scaling")
    spark.sparkContext.setLogLevel("ERROR")

    # warm JVM + codegen so sf0.001 doesn't absorb session startup
    QUERIES[names[0]][0](spark, SF_DIRS[0][0]).limit(1).count()

    def run_once(fn, sf_dir: str) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # same anti-pruning forcing action as bench.py
        df.select(
            F.max(F.xxhash64(*[F.col(c).cast("string") for c in df.columns]))
        ).collect()
        return time.perf_counter() - t0

    rows = {}
    for name in names:
        fn = QUERIES[name][0]
        per_sf = {}
        for sf_dir, sf in SF_DIRS:
            # best-of-2: shared-box noise filter (PROFILE.md discipline).
            # clearCache BETWEEN the two runs too: a query that persists
            # an intermediate (ccnet_buckets) would otherwise serve run 2
            # from run 1's cache and record a cache read, not the query.
            t1 = run_once(fn, sf_dir)
            spark.catalog.clearCache()
            t2 = run_once(fn, sf_dir)
            spark.catalog.clearCache()
            per_sf[sf] = round(min(t1, t2), 3)
        ratio = (
            round(per_sf[0.1] / per_sf[0.01], 2) if per_sf[0.01] > 0 else None
        )
        rows[name] = {
            "t_sf0.001": per_sf[0.001],
            "t_sf0.01": per_sf[0.01],
            "t_sf0.1": per_sf[0.1],
            "wall_ratio_0.1_vs_0.01": ratio,
            # data grows 10x between those points; <=10 means at-or-below
            # linear wall growth (sub-linear = fixed overhead amortizing)
            "superlinear": bool(ratio and ratio > 10.0),
        }

    result = {
        "data_growth_per_step": 10,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "queries": rows,
        "any_superlinear": any(r["superlinear"] for r in rows.values()),
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
