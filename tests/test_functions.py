"""Tests for the training-data operators: dedup family, similarity
search, text stats, and the SQL-oracled analytics (compared against
DuckDB in-process, mirroring the driver's check)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.01"


def _cmp_with_duckdb(got_df: pd.DataFrame, sql: str, sf=SF):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    want = con.sql(sql).df()
    assert sorted(got_df.columns) == sorted(want.columns)
    cols = sorted(got_df.columns)
    g = got_df[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


# ---------------------------------------------------------------------------
# Analytics vs DuckDB oracles
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "qname",
    [
        "q1_lineitem",
        "top_customers",
        "events_daily",
        "events_sliding_7d",
        "sessionize",
        "nations_per_region",
        "top_k_longest_docs",
        "doc_stats",
        "parts_by_brand",
        "supplier_balance_topk",
        "customers_without_orders",
        "order_revenue_by_nation",
        "lang_id",
        "doc_health",
        "quality_filter",
        "token_counts",
        "quality_scores",
        "dedup_exact",
        "stratified_sample",
        "top_docs_per_lang",
        "q3_shipping",
        "events_daily_delta",
        "gopher_rules",
        "df_top_tokens",
        "lang_token_quantiles",
        "distinct_users_per_type",
        "tfidf_top_terms",
        "label_centroids",
        "doc_stats_rollup",
        "dup_shingle_stats",
        "user_first_last",
        "hll_user_registers",
        "search_topk",
        "hash_sample",
        "hll_daily_registers",
        "events_prior_hour",
        "mixture_sample",
        "doc_length_percentiles",
        "user_event_paths",
        "user_cumulative_value",
        "user_day_delta",
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
        "q4_order_priority",
        "q13_customer_distribution",
        "q19_brand_qty_revenue",
        "q8_market_share",
        "q21_waiting_suppliers",
        "cooc_window_pairs",
        "doc_prefix_groups",
        "user_event_entropy",
        "vocab_prune_plan",
        "dedup_survivor_stats",
        "events_trend_slope",
        "event_type_affinity",
        "doc_len_token_corr",
        "user_decay_scores",
        "supplier_concentration",
        "key_skew_audit",
        "q12_late_linestatus",
        "char_bigram_condent",
        "user_value_trend",
        "value_drift_quantiles",
        "simhash_bit_balance",
        "shingle_containment_pairs",
        "token_burstiness",
        "transition_llr",
        "events_hour_profile",
        "doc_source_lm_gap",
        "value_type_chi2",
        "knn_classify",
        "name_typo_pairs",
        "attribution_last_touch",
        "join_size_exact",
        "collocation_llr",
        "doc_quality_composite",
        "pack_efficiency_stats",
        "tokenizer_fertility",
        "persistent_heavy_users",
        "shipping_open_orders",
        "doc_unigram_xent",
        "doc_bigram_xent",
        "source_lm_divergence",
        "value_cusum_alarms",
        "zipf_slope_by_lang",
        "doc_char_entropy",
        "embedding_dim_corr",
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
        "ccnet_ppl_buckets",
        "events_top_changepoint",
        "kcenter_coreset",
        "mmr_select",
        "customer_cohort_ltv",
        "embedding_quantize_audit",
        "positional_xent_profile",
        "dup_cross_source_stats",
        "ingest_lateness_audit",
        "value_psi_drift",
        "curation_decisions",
        "encoding_size_audit",
        "zonemap_prune_audit",
        "hashing_collision_audit",
        "jl_distortion_audit",
        "shard_rebalance_audit",
        "partition_checksums",
        "order_fact_mart",
        "curation_report_by_source",
        "watermark_tradeoff",
        "order_rank_in_customer",
        "epoch_plan",
        "dataset_card",
        "ship_lag_histogram",
        "lang_source_gtest",
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
        "filter_order_plan",
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
    ],
)
def test_sql_oracle_parity(ray_session, qname):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    got = em.queries()[qname](SF)
    got_df = got if isinstance(got, pd.DataFrame) else (
        got.to_pandas() if isinstance(got, pa.Table) else got.to_pandas()
    )
    _cmp_with_duckdb(got_df, em.oracle_sql()[qname])


# ---------------------------------------------------------------------------
# Dedup family on planted near-duplicates
# ---------------------------------------------------------------------------

def _planted_corpus():
    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet green meadow near the old stone bridge"
    )
    variant = base.replace("quiet green meadow", "quiet green field")  # near-dup
    other = (
        "completely different content about distributed data processing "
        "engines streaming arrow batches through actor pools at scale"
    )
    texts = [base, variant, other, base]  # 0~1 near, 3 == 0 exact
    return pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_hll_estimate_accuracy(ray_session):
    """The HLL estimate from the distributed register table must land
    within the sketch's error envelope of the exact distinct count
    (m=256 -> ~6.5% std error; assert 4 sigma)."""
    import duckdb

    from document_extractor_ray.functions.analytics import (
        hll_estimate,
        hll_user_registers,
    )

    regs = hll_user_registers(SF)
    est = hll_estimate(regs)
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) <= 0.26 * exact, (est, exact)


def test_hll_daily_merges_to_global(ray_session):
    """Sketch mergeability: max-merging the per-day register tables by
    register must reproduce the global register table EXACTLY (max is
    associative over any row partition)."""
    from document_extractor_ray.functions.analytics import (
        hll_daily_registers,
        hll_user_registers,
    )

    daily = hll_daily_registers(SF).take_all()
    merged: dict = {}
    for r in daily:
        merged[r["register"]] = max(merged.get(r["register"], 0), r["max_rho"])
    global_ = {
        r["register"]: r["max_rho"] for r in hll_user_registers(SF).take_all()
    }
    assert merged == global_


def test_dup_shingle_stats_paths_agree(ray_session):
    """The broadcast membership path and the partitioned-join
    escalation path must produce identical per-doc dup-shingle stats;
    planted exact copies must show shared_permille == 1000."""
    import ray.data
    from document_extractor_ray.functions.dedup import dup_shingle_stats

    t = _planted_corpus()
    got_b = dup_shingle_stats(ray.data.from_arrow(t)).take_all()
    got_j = dup_shingle_stats(
        ray.data.from_arrow(t), broadcast_limit=0
    ).take_all()
    assert got_b == got_j
    by_id = {r["doc_id"]: r for r in got_b}
    # docs 0 and 3 are byte-identical: every shingle is shared
    assert by_id[0]["shared_permille"] == 1000
    assert by_id[3]["shared_permille"] == 1000
    assert by_id[0]["n_shingles"] > 0
    # doc 2 is unrelated content: nothing shared
    assert by_id[2]["n_shared"] == 0


def test_exact_dedup_planted(ray_session):
    import ray.data
    from document_extractor_ray.functions.dedup import dedup_exact

    ds = ray.data.from_arrow(_planted_corpus())
    kept = sorted(r["doc_id"] for r in dedup_exact(ds).take_all())
    assert kept == [0, 1, 2]  # doc 3 is an exact dup of doc 0


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data
    from document_extractor_ray.functions.dedup import minhash_dup_pairs

    ds = ray.data.from_arrow(_planted_corpus())
    pairs = minhash_dup_pairs(ds, threshold=0.5).take_all()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found          # near-dup caught
    assert (0, 3) in found          # exact dup caught (est jaccard 1.0)
    assert not any(2 in p for p in found)  # unrelated doc never paired


def test_minhash_estimate_tracks_true_jaccard():
    from document_extractor_ray.functions.dedup import (
        MinHasher,
        estimated_jaccard,
        ngram_jaccard,
    )

    t = _planted_corpus()["text"].to_pylist()
    mh = MinHasher()
    sig0 = mh.signature(t[0]).tobytes()
    sig1 = mh.signature(t[1]).tobytes()
    sig2 = mh.signature(t[2]).tobytes()
    true_j = ngram_jaccard(t[0], t[1])
    est = estimated_jaccard(sig0, sig1)
    assert abs(est - true_j) < 0.25
    assert estimated_jaccard(sig0, sig2) < 0.2
    assert estimated_jaccard(sig0, sig0) == 1.0


def test_simhash_near_pairs(ray_session):
    import ray.data
    from document_extractor_ray.functions.dedup import simhash_dup_pairs, simhash64

    t = _planted_corpus()
    pairs = simhash_dup_pairs(ray.data.from_arrow(t), max_distance=6).take_all()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 3) in found  # identical text -> distance 0
    texts = t["text"].to_pylist()
    assert simhash64(texts[0]) == simhash64(texts[3])
    d01 = bin(simhash64(texts[0]) ^ simhash64(texts[1])).count("1")
    d02 = bin(simhash64(texts[0]) ^ simhash64(texts[2])).count("1")
    assert d01 < d02  # near-dup closer than unrelated


def test_ngram_jaccard_bounds():
    from document_extractor_ray.functions.dedup import ngram_jaccard

    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("", "") == 1.0
    assert ngram_jaccard("a b c", "") == 0.0
    j = ngram_jaccard("the cat sat on the mat today", "the cat sat on the rug today")
    assert 0.0 < j < 1.0


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def test_knn_brute_matches_numpy_oracle(ray_session):
    import pyarrow.parquet as pq
    from document_extractor_ray.functions.similarity import (
        _normalize_rows,
        default_queries,
        knn_brute_embeddings,
    )

    got = knn_brute_embeddings(SF, k=5).to_pandas()

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(emb["vec_id"].to_pylist())
    mat = _normalize_rows(np.array(emb["embedding"].to_pylist(), dtype=np.float32))
    q = default_queries(SF)
    qm = _normalize_rows(np.array(q["embedding"].to_pylist(), dtype=np.float32))
    sims = qm @ mat.T
    for qi, qid in enumerate(q["vec_id"].to_pylist()):
        order = sorted(zip(-sims[qi], ids))[:5]
        want_ids = [int(v) for _, v in order]
        got_ids = got[got.query_id == qid].sort_values("rank").vec_id.tolist()
        assert got_ids == want_ids, f"query {qid}"


def test_knn_lsh_recall(ray_session):
    from document_extractor_ray.functions.similarity import (
        knn_brute_embeddings,
        knn_lsh_embeddings,
    )

    brute = knn_brute_embeddings(SF, k=10).to_pandas()
    approx = knn_lsh_embeddings(SF, k=10).to_pandas()
    recalls = []
    for qid in brute.query_id.unique():
        b = set(brute[brute.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(a & b) / len(b))
    # The synthetic embeddings are near-orthogonal gaussians, so absolute
    # recall is bounded by the data; the meaningful property is recall far
    # above the fraction of the corpus scanned (13/4096 buckets ~ 0.3%).
    assert np.mean(recalls) >= 0.05
    # the query vector itself must always be found (it's in its own bucket)
    for qid in brute.query_id.unique():
        a = approx[approx.query_id == qid]
        assert qid in set(a.vec_id)


# ---------------------------------------------------------------------------
# Text stats
# ---------------------------------------------------------------------------

def test_lang_id_heuristic():
    from document_extractor_ray.functions.textstats import LangId

    li = LangId()
    assert li.classify("the cat is in the house and it is warm") == "en"
    assert li.classify("der Hund ist nicht in dem Haus und die Katze") == "de"
    assert li.classify("le chat est dans la maison et les chiens") == "fr"
    assert li.classify("el perro es una mascota para la casa del pueblo") == "es"
    assert li.classify("这是一个中文文档的例子") == "zh"
    assert li.classify("") == "und"
    assert li.classify("12345 67890") == "und"


def test_rolling_fingerprint_properties():
    from document_extractor_ray.functions.textstats import rolling_fingerprint

    a = "the quick brown fox jumps over the lazy dog again and again today"
    assert rolling_fingerprint(a) == rolling_fingerprint(a)  # deterministic
    assert rolling_fingerprint("") == 0
    b = a + " with a completely different long suffix attached to the end here"
    # winnowing min-hash may or may not change; identical text must match,
    # disjoint text must differ
    c = "entirely unrelated words describing some other topic altogether now"
    assert rolling_fingerprint(a) != rolling_fingerprint(c)


def test_ngram_jaccard_dups_verified(ray_session):
    import ray.data
    from document_extractor_ray.functions.dedup import ngram_jaccard_dups

    ds = ray.data.from_arrow(_planted_corpus())
    out = ngram_jaccard_dups(ds, candidate_threshold=0.5, verify_threshold=0.6).to_pylist()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    assert pairs[(0, 3)] == 1.0          # exact dup
    assert 0.6 <= pairs[(0, 1)] < 1.0    # near dup, exact jaccard
    assert not any(2 in p for p in pairs)


def test_embedding_dup_pairs_planted(ray_session):
    import numpy as np
    import ray.data
    from document_extractor_ray.functions.dedup import embedding_dup_pairs

    rng = np.random.RandomState(0)
    base = rng.randn(20, 64).astype(np.float32)
    # plant: vec 20 is a copy of vec 0, vec 21 a tiny perturbation of vec 1
    mat = np.vstack([base, base[0], base[1] + rng.randn(64).astype(np.float32) * 0.01])
    t = pa.table({
        "vec_id": pa.array(list(range(22)), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
    })
    out = embedding_dup_pairs(ray.data.from_arrow(t), threshold=0.95).take_all()
    found = {(r["vec_a"], r["vec_b"]) for r in out}
    assert (0, 20) in found
    assert (1, 21) in found
    assert all(a in (0, 1) or b in (20, 21) for a, b in found)


def test_embedding_dup_pairs_driver_query_nonvacuous(ray_session):
    """The registered driver query plants deterministic near-dups so
    its rows-only check can never be vacuously green on random data."""
    from document_extractor_ray.functions.dedup import (
        PLANT_OFFSET,
        embedding_dup_pairs_embeddings,
    )

    out = embedding_dup_pairs_embeddings(SF, n_planted=10).take_all()
    assert len(out) >= 10
    planted = {(r["vec_a"], r["vec_b"]) for r in out}
    # every planted pair (orig, orig+OFFSET) recovered
    for vid in range(10):
        assert (vid, vid + PLANT_OFFSET) in planted


def test_minhash_bucket_cap_bounds_skewed_bucket(ray_session):
    """A corpus of many identical docs puts every doc in the same band
    buckets; the cap bounds pair-stage work to O(cap^2) vectorized
    comparisons per bucket and logs the drop.  A small cap is passed
    so the test stays fast; production default is MAX_BUCKET=1024."""
    import ray.data
    from document_extractor_ray.functions import dedup

    cap = 64
    n = 1000  # >> cap: untruncated output would be 499,500 pairs/bucket
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["same boilerplate text everywhere"] * n),
        }
    )
    ds = ray.data.from_arrow(t)
    n_pairs = dedup.minhash_dup_pairs(ds, threshold=0.9, max_bucket=cap).count()
    # bounded: at most cap*(cap-1)/2 pairs survive, never n*(n-1)/2
    assert 0 < n_pairs <= cap * (cap - 1) // 2


def test_cap_bucket_truncates_and_logs(caplog):
    import logging

    from document_extractor_ray.functions.dedup import MAX_BUCKET, _cap_bucket

    g = pa.table({"doc_id": pa.array(range(MAX_BUCKET + 5), pa.int64())})
    with caplog.at_level(logging.WARNING, logger="document_extractor_ray.functions.dedup"):
        capped = _cap_bucket(g, "doc_id", "test")
    assert capped.num_rows == MAX_BUCKET
    assert any("truncated" in r.message for r in caplog.records)
    # deterministic: keeps the smallest ids
    assert capped["doc_id"].to_pylist() == list(range(MAX_BUCKET))


def test_embedding_matrix_zero_copy_and_ragged_fallback():
    from document_extractor_ray.functions.similarity import embedding_matrix

    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    col = pa.array([list(r) for r in mat], pa.list_(pa.float32()))
    out = embedding_matrix(col)
    assert out.shape == (3, 4)
    np.testing.assert_array_equal(out, mat)
    # sliced column still maps to the right window
    out2 = embedding_matrix(col.slice(1, 2))
    np.testing.assert_array_equal(out2, mat[1:])
    # ragged lists fall back without error
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
    try:
        embedding_matrix(ragged)
    except ValueError:
        pass  # numpy refuses ragged; acceptable for malformed input


def test_near_dup_clusters_transitive_chain(ray_session):
    """A~B and B~C but never A~C directly: connected components must
    still collapse all three into one cluster with min-id rep."""
    import ray.data
    from document_extractor_ray.functions.dedup import (
        near_dedup_keep,
        near_dup_clusters,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    )
    b = base.replace("delta", "delic")          # near A
    c = b.replace("upsilon phi chi", "upsilon phi psi")  # near B, farther from A
    other = "unrelated words entirely disjoint from those greek letters here now"
    t = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": pa.array([base, b, c, other]),
        }
    )
    ds = ray.data.from_arrow(t)
    clusters = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(ds, threshold=0.5).take_all()}
    assert clusters[10] == clusters[11] == clusters[12] == 10
    assert clusters[13] == 13
    kept = [r["doc_id"] for r in near_dedup_keep(ds, threshold=0.5).take_all()]
    assert kept == [10, 13]


def test_cluster_driver_and_distributed_paths_agree(ray_session):
    """Union-find (budget path) and min-label propagation (scale path)
    must produce identical components on the same edge list."""
    import ray.data
    from document_extractor_ray.functions.dedup import (
        _propagate_labels,
        cluster_pairs,
    )

    edges = [(1, 2), (2, 3), (7, 8), (9, 9), (4, 1), (100, 3)]
    roots = cluster_pairs(edges)
    want = {n: roots.get(n, n) for n in {1, 2, 3, 4, 7, 8, 9, 100}}

    et = pa.table(
        {
            "doc_a": pa.array([e[0] for e in edges], pa.int64()),
            "doc_b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    labels = _propagate_labels(ray.data.from_arrow(et))
    got = {r["node"]: r["label"] for r in labels.take_all()}
    for n, lbl in got.items():
        assert lbl == want[n], (n, lbl, want[n])


def test_knn_ivf_recall_and_self_hit(ray_session):
    from document_extractor_ray.functions.similarity import (
        knn_brute_embeddings,
        knn_ivf_embeddings,
    )

    brute = knn_brute_embeddings(SF, k=10).to_pandas()
    approx = knn_ivf_embeddings(SF, k=10).to_pandas()
    recalls = []
    for qid in brute.query_id.unique():
        b = set(brute[brute.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(a & b) / len(b))
    # scans ~8/64 of the corpus; recall must beat that fraction clearly
    assert np.mean(recalls) >= 0.2
    # a corpus vector queried against itself is always in its probed
    # centroid (its own assignment is its nearest centroid)
    for qid in brute.query_id.unique():
        a = approx[approx.query_id == qid]
        assert qid in set(a.vec_id)


def test_train_centroids_deterministic_unit_norm():
    from document_extractor_ray.functions.similarity import train_centroids

    rng = np.random.RandomState(3)
    sample = rng.randn(500, 16).astype(np.float32)
    c1 = train_centroids(sample, n_centroids=8)
    c2 = train_centroids(sample, n_centroids=8)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-5)


def test_ngram_verify_join_path_matches_broadcast(ray_session):
    """Forcing pair_budget=0 routes verification through the
    partitioned-join path; output must equal the broadcast path."""
    import ray.data
    from document_extractor_ray.functions.dedup import ngram_jaccard_dups

    ds = ray.data.from_arrow(_planted_corpus())
    broad = ngram_jaccard_dups(ds, candidate_threshold=0.5, verify_threshold=0.6)
    joined = ngram_jaccard_dups(
        ds, candidate_threshold=0.5, verify_threshold=0.6, pair_budget=0
    )

    def rows(x):
        recs = x.to_pylist() if hasattr(x, "to_pylist") else x.take_all()
        return sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in recs)

    assert rows(broad) == rows(joined)
    assert len(rows(broad)) > 0


# ---------------------------------------------------------------------------
# Training-data assembly
# ---------------------------------------------------------------------------

def test_pack_sequences_invariants(ray_session):
    """Every doc packed exactly once; no example over the window
    unless it is a single oversized doc; token totals conserved."""
    import ray.data
    from document_extractor_ray.functions.training import PACK_WINDOW, pack_sequences

    rng = np.random.RandomState(5)
    texts = []
    for i in range(200):
        n_words = int(rng.randint(1, 300)) if i % 17 else PACK_WINDOW + 50
        texts.append(" ".join(f"w{j}" for j in range(n_words)))
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts)})
    out = pack_sequences(ray.data.from_arrow(t)).take_all()

    all_docs = [d for r in out for d in r["doc_ids"]]
    assert sorted(all_docs) == list(range(200))            # exactly once
    for r in out:
        if not r["oversize"]:
            assert r["n_tokens"] <= PACK_WINDOW
        else:
            assert len(r["doc_ids"]) == 1                  # oversize never packed
    want_tokens = sum(len(x.split()) for x in texts)
    assert sum(r["n_tokens"] for r in out) == want_tokens  # conservation
    # deterministic: same input -> same packing
    out2 = pack_sequences(ray.data.from_arrow(t)).take_all()
    assert [tuple(r["doc_ids"]) for r in out] == [tuple(r["doc_ids"]) for r in out2]


def test_pack_assignments_matches_pack_sequences(ray_session):
    """The per-doc assignment view is the flattened example view:
    example ids and oversize flags agree doc by doc."""
    import ray.data
    from document_extractor_ray.functions.training import (
        PACK_WINDOW,
        pack_assignments,
        pack_sequences,
    )

    rng = np.random.RandomState(7)
    texts = []
    for i in range(300):
        n_words = int(rng.randint(1, 300)) if i % 13 else PACK_WINDOW + 25
        texts.append(" ".join(f"w{j}" for j in range(n_words)))
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(texts)})
    seqs = pack_sequences(ray.data.from_arrow(t)).take_all()
    flat = {}
    for r in seqs:
        for d in r["doc_ids"]:
            flat[d] = (r["example_id"], bool(r["oversize"]))
    assigns = pack_assignments(ray.data.from_arrow(t)).take_all()
    assert len(assigns) == 300
    for r in assigns:
        assert flat[r["doc_id"]] == (r["example_id"], bool(r["oversize"])), r


def test_stratified_sample_exact_mix(ray_session):
    """Systematic doc_id%100 sampling keeps exactly the prescribed
    fraction of each contiguous stratum."""
    import ray.data
    from document_extractor_ray.functions.training import stratified_sample

    t = pa.table({
        "doc_id": pa.array(range(1000), pa.int64()),
        "lang": pa.array((["en"] * 500) + (["de"] * 500)),
        "n_chars": pa.array([10] * 1000, pa.int64()),
    })
    kept = stratified_sample(ray.data.from_arrow(t), mix={"en": 40, "de": 80}).take_all()
    en = [r for r in kept if r["lang"] == "en"]
    de = [r for r in kept if r["lang"] == "de"]
    assert len(en) == 200   # 40% of 500
    assert len(de) == 400   # 80% of 500


def test_decontaminate_flags_planted_benchmark(ray_session):
    import ray.data
    from document_extractor_ray.functions.dedup import decontaminate

    bench = "the secret benchmark question about quantum entanglement and its seven hidden variables"
    docs = [
        "completely unrelated text about cooking pasta with fresh tomatoes and basil leaves today",
        "prefix words then " + bench + " then suffix words after the leak",
        "another clean document describing distributed systems and streaming execution engines",
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(docs)})
    out = decontaminate(ray.data.from_arrow(t), [bench]).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["contaminated"] and by_id[1]["n_benchmark_hits"] > 0
    assert not by_id[0]["contaminated"]
    assert not by_id[2]["contaminated"]


def test_decontaminate_driver_query_self_flags(ray_session):
    from document_extractor_ray.functions.dedup import decontaminate_docs

    out = decontaminate_docs(SF, n_benchmark=3).take_all()
    flagged = {r["doc_id"] for r in out if r["contaminated"]}
    lowest = sorted(r["doc_id"] for r in out)[:3]
    for d in lowest:
        assert d in flagged  # benchmark docs self-flag: never vacuous


def test_embedding_dup_clusters_collapse_planted(ray_session):
    """Every planted near-duplicate must share a cluster with its
    original; untouched vectors are their own cluster."""
    from document_extractor_ray.functions.dedup import (
        PLANT_OFFSET,
        embedding_dup_clusters_embeddings,
    )

    out = {r["vec_id"]: r["cluster_id"]
           for r in embedding_dup_clusters_embeddings(SF).take_all()}
    planted = [v for v in out if v >= PLANT_OFFSET]
    assert planted
    for v in planted:
        assert out[v] == out[v - PLANT_OFFSET] == v - PLANT_OFFSET
    untouched = [v for v in out if v < PLANT_OFFSET and (v + PLANT_OFFSET) not in out]
    for v in untouched[:50]:
        assert out[v] == v


def test_repetition_filter_flags_planted_loop(ray_session):
    """A doc that repeats one phrase must flag; diverse text must not."""
    import pyarrow.parquet as pq
    from document_extractor_ray.functions.textstats import repetition_filter

    out = repetition_filter(SF).to_pandas()
    assert len(out) == 500
    assert out.repetitive.dtype == bool
    # fractions bounded and consistent with the counts
    assert ((out.dup_word_frac >= 0) & (out.dup_word_frac < 1)).all()
    recomputed = (out.n_words - out.n_unique_words) / out.n_words.clip(lower=1)
    assert np.allclose(out.dup_word_frac, recomputed.where(out.n_words > 0, 0.0))


def test_token_histogram_conserves_totals(ray_session):
    from document_extractor_ray.functions.textstats import (
        token_counts,
        token_histogram,
    )

    hist = token_histogram(SF).to_pandas()
    toks = token_counts(SF).to_pandas()
    assert hist.n_docs.sum() == len(toks)
    assert hist.total_tokens.sum() == toks.n_tokens.sum()
    assert hist.bucket.is_monotonic_increasing


def test_source_mix_shares(ray_session):
    from document_extractor_ray.functions.training import source_mix

    mix = source_mix(SF).to_pandas()
    assert mix.n_docs.sum() == 500
    # floor-permille shares never overshoot
    assert mix.share_permille.sum() <= 1000
    assert (mix.share_permille >= 0).all()
    assert list(mix.itertuples(index=False))[0].source <= list(
        mix.itertuples(index=False)
    )[-1].source


def test_events_asof_orders_matches_pandas_oracle(ray_session):
    """Distributed as-of join == one global pandas merge_asof."""
    import pandas as pd
    import pyarrow.parquet as pq
    from document_extractor_ray.functions.analytics import events_asof_orders

    got = events_asof_orders(SF).to_pandas()

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    od = od.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
    od = od.assign(t=od["o_orderdate"], user_id=od["o_custkey"],
                   total_cents=(od["o_totalprice"] * 100).round().astype("int64"))
    ev = ev.sort_values("ts", kind="mergesort").assign(t=ev["ts"])
    m = pd.merge_asof(
        ev[["t", "user_id", "event_id", "ts"]],
        od[["t", "user_id", "o_orderkey", "o_orderdate", "total_cents"]],
        on="t", by="user_id", direction="backward",
    )
    m = m[m.o_orderkey.notna()].sort_values("event_id")
    assert len(got) == len(m)
    assert got.event_id.tolist() == m.event_id.tolist()
    assert got.o_orderkey.tolist() == m.o_orderkey.astype("int64").tolist()
    assert got.total_cents.tolist() == m.total_cents.tolist()


def test_token_quantiles_definition(ray_session):
    """q-permille value = smallest v with cum_docs*1000 >= q*n."""
    import pyarrow.parquet as pq
    from document_extractor_ray.functions.textstats import token_quantiles

    got = token_quantiles(SF).to_pandas()
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    toks = np.sort([len(s.split()) for s in texts["text"].to_pylist()])
    n = len(toks)
    for q, v in zip(got.q_permille, got.n_tokens):
        rank = -(-q * n // 1000)  # ceil
        assert v == toks[rank - 1], (q, v, toks[rank - 1])


def test_user_day_delta_exercises_all_branches(ray_session):
    """Non-vacuity pin: the id-split CDC compare must produce every
    change class (added/removed/changed/same) on the test corpus,
    otherwise the classification logic is unverified by construction."""
    from document_extractor_ray.functions.analytics import user_day_delta

    got = user_day_delta("/root/testdata/sf0.001").to_pandas()
    assert set(got["change"]) == {"added", "removed", "changed", "same"}


def test_user_lag_gaps_nonvacuous(ray_session):
    """Pin: the LAG window must see both branches on the corpus —
    first-event sentinels (-1) AND real positive gaps; and exactly one
    -1 per user (each user has exactly one first event)."""
    from document_extractor_ray.functions.analytics import user_lag_gaps

    got = user_lag_gaps("/root/testdata/sf0.001").to_pandas()
    firsts = got[got["gap_us"] == -1]
    assert len(firsts) == got["user_id"].nunique()
    assert (got["gap_us"] >= -1).all() and (got["gap_us"] > 0).any()


def test_event_type_pivot_nonvacuous(ray_session):
    """Pin: every pivot column is hit, and the wide counts re-sum to
    the event total (no event lost or double-counted by the pivot)."""
    from document_extractor_ray.functions.analytics import (
        PIVOT_TYPES,
        event_type_pivot,
    )

    got = event_type_pivot("/root/testdata/sf0.001").to_pandas()
    cols = [f"n_{t}" for t in PIVOT_TYPES]
    assert all((got[c] > 0).any() for c in cols)
    assert int(got[cols].to_numpy().sum()) == 1000


def test_bloom_exact_under_saturation(ray_session):
    """The semi-join's exactness must NOT depend on Bloom quality: a
    64-bit filter (every probe a false positive) must still produce the
    byte-identical result, because the partitioned verify removes FPs.
    Also pins no-false-negatives: the full-size run equals the
    saturated run."""
    from document_extractor_ray.functions.analytics import lineitem_semi_bloom

    full = lineitem_semi_bloom("/root/testdata/sf0.001").to_pandas()
    saturated = lineitem_semi_bloom("/root/testdata/sf0.001", m_words=1).to_pandas()
    pd.testing.assert_frame_equal(full, saturated)


def test_doc_global_rank_is_permutation(ray_session):
    """Pin: ranks are a permutation of 1..N (the histogram-offset +
    tie-cumcount construction misses or duplicates nothing), and ties
    on n_chars break by doc_id ascending."""
    from document_extractor_ray.functions.analytics import doc_global_rank

    got = doc_global_rank("/root/testdata/sf0.001").to_pandas()
    n = len(got)
    assert sorted(got["rnk"]) == list(range(1, n + 1))
    by_rank = got.sort_values("rnk")
    k = by_rank["n_chars"].to_numpy()
    assert (k[:-1] >= k[1:]).all()
    # within equal keys, doc_id strictly increases
    same = k[:-1] == k[1:]
    d = by_rank["doc_id"].to_numpy()
    assert (d[1:][same] > d[:-1][same]).all()


def test_user_modal_type_tie_break(ray_session):
    """Pin: ties on the modal count resolve to the alphabetically
    first type (deterministic), and the modal count is the max of the
    user's per-type counts."""
    import duckdb

    from document_extractor_ray.functions.analytics import user_modal_type

    got = user_modal_type("/root/testdata/sf0.001").to_pandas()
    counts = duckdb.sql(
        "SELECT user_id, event_type, count(*) n FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') GROUP BY 1,2"
    ).fetchdf()
    for _, row in got.iterrows():
        mine = counts[counts.user_id == row.user_id]
        mx = mine.n.max()
        assert row.n == mx
        best = sorted(mine[mine.n == mx].event_type)[0]
        assert row.modal_type == best


def test_orders_cumulative_is_monotone_and_totals(ray_session):
    """Pin: the running total is strictly increasing in rank order and
    its final value equals the exact corpus total in cents."""
    import duckdb

    from document_extractor_ray.functions.analytics import (
        orders_cumulative_revenue,
    )

    got = orders_cumulative_revenue("/root/testdata/sf0.001").to_pandas()
    total = duckdb.sql(
        "SELECT CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) "
        "FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchone()[0]
    assert got["cum_revenue_cents"].max() == total
    ordered = got.sort_values("cum_revenue_cents")["cum_revenue_cents"].to_numpy()
    assert (ordered[1:] > ordered[:-1]).all()


def test_hdr_quantile_within_error_bound(ray_session):
    """Pin: the HDR sketch's per-type p50/p95/p99 estimates land
    within the construction's relative-error bound (bucket width/lower
    <= 1/8 -> midpoint within ~6.25%; assert 7%) of the exact
    quantiles, and counts per type re-sum to the event total."""
    import duckdb

    from document_extractor_ray.functions.analytics import (
        hdr_quantile,
        value_hdr_registers,
    )

    regs = value_hdr_registers("/root/testdata/sf0.001")
    rows = regs.take_all()
    assert sum(r["n"] for r in rows) == 1000
    for qpm in (500, 950, 990):
        est = hdr_quantile(rows, qpm)
        exact = dict(
            duckdb.sql(
                "SELECT event_type, CAST(round(quantile_disc(round(value*100), "
                f"{qpm / 1000.0}) ) AS BIGINT) FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet') GROUP BY 1"
            ).fetchall()
        )
        for ty, e in exact.items():
            assert abs(est[ty] - e) <= 0.07 * e + 1.0, (qpm, ty, est[ty], e)


def test_split_is_total_and_stable(ray_session):
    """Pin: every doc gets exactly one split, proportions are near
    90/5/5, and labels are stable across runs (hash determinism)."""
    from document_extractor_ray.functions.analytics import train_val_test_split

    a = train_val_test_split("/root/testdata/sf0.001").to_pandas()
    b = train_val_test_split("/root/testdata/sf0.001").to_pandas()
    assert a.equals(b)
    assert len(a) == 500 and set(a["split"]) == {"train", "val", "test"}
    frac = a["split"].value_counts(normalize=True)
    assert 0.85 < frac["train"] < 0.95


def test_user_retention_week0_counts_all_cohort_users(ray_session):
    """Pin: week_offset 0 of each cohort counts exactly the users
    whose first activity fell on that day (every user appears in
    their own cohort's week 0), and offsets beyond 0 exist."""
    import duckdb

    from document_extractor_ray.functions.analytics import user_retention

    got = user_retention("/root/testdata/sf0.01").to_pandas()
    assert (got["week_offset"] > 0).any()
    wk0 = got[got["week_offset"] == 0].set_index("cohort_day")["n_users"]
    firsts = duckdb.sql(
        "WITH ud AS (SELECT user_id, min(date_trunc('day', ts)) AS c FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet') GROUP BY 1) "
        "SELECT c, count(*) FROM ud GROUP BY 1"
    ).fetchall()
    for day, n in firsts:
        assert wk0[pd.Timestamp(day)] == n


def test_token_cms_mass_and_upper_bound(ray_session):
    """Pin the count-min sketch invariants: (a) every hash row of the
    register table preserves total token mass exactly (each occurrence
    lands in exactly one bucket per row), and (b) the point estimate
    is a true upper bound on every token's exact corpus count (the CMS
    guarantee -- min over rows of a sum that includes the token)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import (
        CMS_D,
        cms_estimate,
        token_cms_registers,
    )

    sfd = "/root/testdata/sf0.001"
    regs = token_cms_registers(sfd)
    rows = regs.take_all()
    texts = pq.read_table(f"{sfd}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    exact = Counter(w for t in texts for w in t.lower().split())
    total = sum(exact.values())
    for j in range(CMS_D):
        assert sum(r["n"] for r in rows if r["row_j"] == j) == total
    tbl = pa.Table.from_pylist(rows)
    for w, n in list(exact.most_common(10)) + list(exact.most_common())[-10:]:
        est = cms_estimate(tbl, w)
        assert est >= n, (w, est, n)
        assert est <= total


def test_dup_ngram_scrub_paths_and_semantics(ray_session):
    """Broadcast and partitioned-join scrub paths must agree exactly;
    planted exact copies lose every full-window word while the
    unrelated doc passes through untouched (lowercased re-join only),
    and a doc shorter than k words is never scrubbed."""
    import ray.data
    from document_extractor_ray.functions.dedup import dup_ngram_scrub

    short = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                list(_planted_corpus()["text"].to_pylist()) + ["tiny doc here"],
                pa.string(),
            ),
        }
    )
    got_b = dup_ngram_scrub(ray.data.from_arrow(short)).take_all()
    got_j = dup_ngram_scrub(
        ray.data.from_arrow(short), broadcast_limit=0
    ).take_all()
    assert got_b == got_j
    by_id = {r["doc_id"]: r for r in got_b}
    # docs 0 and 3 are byte-identical: every word sits in a dup window
    assert by_id[0]["n_removed"] == by_id[0]["n_words"]
    assert by_id[3]["scrubbed_text"] == ""
    # doc 2 is unique content: untouched
    assert by_id[2]["n_removed"] == 0
    assert by_id[2]["scrubbed_text"] == " ".join(
        short["text"][2].as_py().lower().split()
    )
    # doc 4 has 3 < k=5 words: no full window, intact
    assert by_id[4]["n_removed"] == 0
    assert by_id[4]["scrubbed_text"] == "tiny doc here"
    # doc 1 (near-dup of 0) keeps only words outside shared 5-gram spans
    assert 0 < by_id[1]["n_removed"] < by_id[1]["n_words"]


def test_user_activity_full_outer_cases(ray_session):
    """All three full-outer cases: key on both sides (merged row),
    events-only (zero order measures), orders-only (zero event
    measures) — sf data has no events-only keys, so plant them."""
    import ray.data
    from document_extractor_ray.functions.analytics import user_activity_full

    ev = pa.table(
        {
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "value": pa.array([1.25, 2.00, 0.5], pa.float64()),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 3, 3], pa.int64()),
            "o_totalprice": pa.array([10.0, 5.555, 4.0], pa.float64()),
        }
    )
    rows = {
        r["user_id"]: r
        for r in user_activity_full(
            ray.data.from_arrow(ev), ray.data.from_arrow(orders)
        ).take_all()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1] == {
        "user_id": 1, "n_events": 2, "events_value_cents": 325,
        "n_orders": 1, "orders_total_cents": 1000,
    }
    # events-only: zero order measures
    assert rows[2]["n_orders"] == 0 and rows[2]["orders_total_cents"] == 0
    assert rows[2]["events_value_cents"] == 50
    # orders-only: zero event measures; 5.555 rounds half-away to 556
    assert rows[3]["n_events"] == 0 and rows[3]["events_value_cents"] == 0
    assert rows[3]["orders_total_cents"] == 556 + 400


def test_char_stats_kernel_edge_cases():
    """The vectorized char-histogram kernel: empty text, tie-break to
    the smallest codepoint, non-ASCII codepoints, exact permille."""
    from document_extractor_ray.functions.textstats import _char_stats_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["", "abab", "zzzéé", "ba"], pa.string()),
        }
    )
    rows = {r["doc_id"]: r for r in _char_stats_batch(t).to_pylist()}
    assert rows[0] == {
        "doc_id": 0, "n_chars": 0, "distinct_chars": 0,
        "top_char": "", "top_char_permille": 0,
    }
    # tie a/b -> smallest char wins
    assert rows[1]["top_char"] == "a" and rows[1]["top_char_permille"] == 500
    assert rows[2]["n_chars"] == 5 and rows[2]["distinct_chars"] == 2
    assert rows[2]["top_char"] == "z" and rows[2]["top_char_permille"] == 600
    assert rows[3]["top_char"] == "a"  # tie again, smaller codepoint


def test_textrank_matches_pure_python_reference(ray_session, tmp_path):
    """Cross-check the distributed integer PageRank against an
    independent per-edge Python reimplementation on a tiny corpus
    (same tokenizer, same teleport/floor arithmetic)."""
    import re
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import (
        TEXTRANK_ITERS,
        TEXTRANK_SCALE,
        textrank_keywords,
    )

    texts = ["data flows fast", "data flows far", "fast data flows", "solo"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["word"]: r["rank_nano"]
        for r in textrank_keywords(str(tmp_path), k=100).to_pylist()
    }

    edges = Counter()
    for t in texts:
        ws = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        for a, b in zip(ws, ws[1:]):
            edges[(a, b)] += 1
    ow = defaultdict(int)
    for (a, _), wt in edges.items():
        ow[a] += wt
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    r = {w: TEXTRANK_SCALE for w in nodes}
    tele = 15 * TEXTRANK_SCALE // 100
    for _ in range(TEXTRANK_ITERS):
        c = defaultdict(int)
        for (a, b), wt in edges.items():
            c[b] += r[a] * wt // ow[a]
        r = {w: tele + 85 * c[w] // 100 for w in nodes}
    assert got == r
    assert "solo" not in got  # no bigram -> not a graph node


def test_frame_sampler_explode_and_corrupt_path():
    """FrameSampler: even-spaced picks match the pinned reference
    sampler, one row per sampled frame, non-video rows are filtered
    out, and a corrupt video degrades to one decode_ok=False row."""
    from document_extractor_ray.core.scoring import sample_page_indices
    from document_extractor_ray.functions.multimodal import (
        FRAME_SAMPLE_TARGET,
        FrameSampler,
        encode_fake_image,
        encode_fake_video,
    )

    frames = [encode_fake_image(8, 6, 3, seed=i) for i in range(7)]
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "kind": pa.array(["video", "image", "video"], pa.string()),
            "payload": pa.array(
                [encode_fake_video(frames), frames[0], b"JUNKJUNK"],
                pa.binary(),
            ),
        }
    )
    out = FrameSampler()(t).to_pylist()
    good = [r for r in out if r["media_id"] == 0]
    assert [r["frame_idx"] for r in good] == sample_page_indices(
        7, FRAME_SAMPLE_TARGET
    )
    assert all(r["decode_ok"] and r["width"] == 8 and r["height"] == 6 for r in good)
    assert not any(r["media_id"] == 1 for r in out)  # non-video filtered
    bad = [r for r in out if r["media_id"] == 2]
    assert len(bad) == 1 and not bad[0]["decode_ok"] and bad[0]["frame_idx"] == 0


def test_value_mad_matches_numpy_reference(ray_session):
    """Independent numpy recomputation of the grouped lower-median and
    MAD (same rank convention applied directly to the raw cents)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import value_mad_by_type

    got = {r["event_type"]: r for r in value_mad_by_type(SF).to_pylist()}
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    # half-away-from-zero (values are >= 0), matching _to_cents
    cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    types = np.asarray(t["event_type"].to_pylist())

    def lower_median(x: np.ndarray) -> int:
        s = np.sort(x)
        return int(s[(len(s) - 1) // 2])

    assert set(got) == set(np.unique(types))
    for et in np.unique(types):
        x = cents[types == et]
        med = lower_median(x)
        mad = lower_median(np.abs(x - med))
        r = got[et]
        assert (r["n"], r["median_cents"], r["mad_cents"]) == (len(x), med, mad)


def test_event_transitions_mass_invariant(ray_session):
    """Total transition count must equal n_events - n_users exactly
    (every user's ordered stream of k events yields k-1 pairs)."""
    import duckdb

    from document_extractor_ray.functions.analytics import event_transitions

    rows = event_transitions(SF).take_all()
    total = sum(r["n"] for r in rows)
    n_ev, n_us = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()
    assert total == n_ev - n_us
    assert all(r["n"] > 0 for r in rows)


def test_bucketed_agg_matches_pandas(ray_session):
    """bucketed_agg (the key-per-row aggregate replacement) must match
    a pandas groupby exactly across mixed key dtypes and all four agg
    kinds, including negative values and multi-block inputs."""
    import ray.data
    from document_extractor_ray.functions.bucketing import bucketed_agg

    rng = np.random.RandomState(0)
    n = 10000
    t = pa.table(
        {
            "k1": pa.array(rng.randint(0, 2000, n), pa.int64()),
            "k2": pa.array([f"s{v}" for v in rng.randint(0, 5, n)], pa.string()),
            "v": pa.array(rng.randint(-100, 100, n), pa.int64()),
        }
    )
    got = pd.DataFrame(
        bucketed_agg(
            ray.data.from_arrow(t).repartition(8),
            ["k1", "k2"],
            [
                ("v", "sum", "sv"),
                ("v", "min", "mn"),
                ("v", "max", "mx"),
                (None, "count", "n"),
            ],
        ).take_all()
    ).sort_values(["k1", "k2"]).reset_index(drop=True)
    want = (
        t.to_pandas()
        .groupby(["k1", "k2"], as_index=False)
        .agg(sv=("v", "sum"), mn=("v", "min"), mx=("v", "max"), n=("v", "size"))
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k1", "k2", "sv", "mn", "mx", "n"]], want, check_dtype=False
    )


def test_bm25_saturation_and_length_norm(ray_session, tmp_path):
    """BM25 semantics on a planted corpus: tf saturates (doubling tf
    less than doubles the score) and longer docs with equal tf score
    LOWER; plain tf-idf (search_topk's scorer) has neither property."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import bm25_topk

    filler = " ".join(f"w{i}" for i in range(20))
    texts = [
        "spark " + filler,                     # tf=1, short
        "spark spark " + filler,               # tf=2, same length base
        "spark " + filler + " " + filler,      # tf=1, doubled length
        filler,                                # tf=0: never scored
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(str(tmp_path), terms=("spark",), k=10).take_all()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[1] > rows[0]              # more tf -> higher
    assert rows[1] < 2 * rows[0]          # ...but saturating
    assert rows[2] < rows[0]              # longer doc, same tf -> lower


def test_textrank_driver_and_distributed_paths_agree(ray_session, tmp_path):
    """The small-graph driver fast path and the edge-parallel
    iteration path must produce identical integer ranks."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import textrank_keywords

    texts = ["data flows fast", "data flows far", "fast data flows data"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    fast = textrank_keywords(str(tmp_path), k=100).to_pylist()
    dist = textrank_keywords(str(tmp_path), k=100, driver_edge_limit=0).to_pylist()
    assert fast == dist and len(fast) > 0


def test_bucketing_helpers_empty_inputs(ray_session):
    """Empty datasets must flow through all three bucketed helpers
    without error and yield empty results (escalation paths hit this
    when a corpus has no dups/hits at all)."""
    import ray.data
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        bucketed_bucket_pairs,
        bucketed_minmax,
    )

    empty_kv = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(empty_kv)
    assert bucketed_agg(ds, ["k"], [("v", "sum", "s")]).take_all() == []
    assert bucketed_minmax(ds, ["k"], "v", "min").take_all() == []
    out_schema = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    got = bucketed_bucket_pairs(
        ds, ["k"], lambda g: out_schema, out_schema
    ).take_all()
    assert got == []


def test_textrank_empty_graph(ray_session, tmp_path):
    """A corpus with no consecutive-token pair (every doc has < 2
    tokens) has an empty bigram graph: both iteration paths must
    return an empty table, not crash."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import textrank_keywords

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["one", "", "two"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    assert textrank_keywords(str(tmp_path)).num_rows == 0
    assert textrank_keywords(str(tmp_path), driver_edge_limit=0).num_rows == 0


# ---------------------------------------------------------------------------
# Round-3 additions: token_rarity / postings_topdf / edit_distance_verify
# ---------------------------------------------------------------------------

def test_levenshtein_matches_duckdb_bytes():
    """The numpy row-DP must equal DuckDB's levenshtein (which works
    on UTF-8 BYTES — ('ü','x') is 2) on fuzzed unicode strings, or the
    edit_distance_verify oracle can never match."""
    import random

    import duckdb

    from document_extractor_ray.functions.dedup import _levenshtein

    assert _levenshtein("ü", "x") == 2
    assert _levenshtein("", "abc") == 3 and _levenshtein("abc", "") == 3
    rng = random.Random(7)
    alpha = "abcdeü "
    for _ in range(150):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 16)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 16)))
        want = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert _levenshtein(a, b) == want, (a, b)


def test_token_rarity_orders_rare_above_common(ray_session, tmp_path):
    """A doc of corpus-unique tokens must out-score a doc made of the
    corpus's most repeated token; empty docs score 0 with n_tok 0."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import token_rarity

    texts = ["common common common"] * 5 + ["zyxwvut qponmlk", ""]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = token_rarity(str(tmp_path)).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[5]["rarity_milli"] > by_id[0]["rarity_milli"]
    assert by_id[6] == {"doc_id": 6, "n_tok": 0, "rarity_milli": 0}
    # exact integer semantics: 17 total tokens; common has 15 -> each
    # occurrence floor(1000*17/15)=1133; unique tokens -> 17000
    assert by_id[0]["rarity_milli"] == 1133
    assert by_id[5]["rarity_milli"] == 17000


def test_postings_topdf_lists_exactly_member_docs(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import postings_topdf

    texts = ["alpha beta", "beta gamma", "alpha alpha delta", "epsilon"]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = postings_topdf(str(tmp_path), p=2).take_all()
    got = sorted((r["token"], r["doc_id"]) for r in rows)
    # top-2 by (df desc, token asc): alpha df=2, beta df=2
    assert got == [("alpha", 0), ("alpha", 2), ("beta", 0), ("beta", 1)]


def test_edit_distance_verify_on_planted_near_dups(ray_session):
    """The planted near-dup pair verifies with the true byte edit
    distance; the exact dup pair verifies at 0."""
    import ray.data

    from document_extractor_ray.functions.dedup import (
        _levenshtein,
        edit_distance_verify,
    )

    t = _planted_corpus()
    rows = edit_distance_verify(ray.data.from_arrow(t)).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["edit_dist"] for r in rows}
    assert got[(0, 3)] == 0  # exact duplicate
    texts = t["text"].to_pylist()
    assert got[(0, 1)] == _levenshtein(texts[0], texts[1]) > 0


# ---------------------------------------------------------------------------
# Round-3 additions: funnel_counts / promo_revenue_monthly / pmi_bigrams
# ---------------------------------------------------------------------------

def test_funnel_counts_ordering_and_window(ray_session, tmp_path):
    """Stage order is strict (same-ts and before-ts events don't
    convert) and the 1-day conversion window prunes late events."""
    import datetime as dt

    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # u1 converts fully in order, inside the window
        (1, t0, "view"), (1, t0 + h, "click"), (1, t0 + 2 * h, "purchase"),
        # u2's click precedes their view -> never reaches stage 2
        (2, t0, "click"), (2, t0 + h, "view"), (2, t0 + 2 * h, "purchase"),
        # u3's click lands 2 days after the view -> outside the window
        (3, t0, "view"), (3, t0 + dt.timedelta(days=2), "click"),
        # u4's click is simultaneous with the view -> not strictly after
        (4, t0, "view"), (4, t0, "click"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = {r["stage"]: r["users"] for r in funnel_counts(str(tmp_path)).take_all()}
    assert out == {"view": 4, "click": 1, "purchase": 1}


def test_promo_revenue_monthly_integer_exactness(ray_session, tmp_path):
    """Hand-computed milli-cent sums and the floor permille ratio."""
    import datetime as dt

    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import promo_revenue_monthly

    part = pa.table(
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_type": pa.array(["PROMO BRUSHED", "STANDARD"], pa.string()),
        }
    )
    li = pa.table(
        {
            "l_partkey": pa.array([1, 2, 1], pa.int64()),
            "l_extendedprice": pa.array([10.00, 20.00, 5.00], pa.float64()),
            "l_discount": pa.array([0.10, 0.00, 0.05], pa.float64()),
            "l_shipdate": pa.array(
                [
                    dt.datetime(2024, 1, 15),
                    dt.datetime(2024, 1, 20),
                    dt.datetime(2024, 2, 1),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(part, str(tmp_path / "part.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    out = promo_revenue_monthly(str(tmp_path)).take_all()
    jan, feb = out[0], out[1]
    # Jan: promo 1000c * 900pm = 900_000; total += 2000c * 1000pm
    assert jan["promo_mc"] == 900_000
    assert jan["total_mc"] == 2_900_000
    assert jan["promo_permille"] == 900_000 * 1000 // 2_900_000  # = 310
    # Feb: single promo line 500c * 950pm — ratio exactly 1000
    assert feb["promo_mc"] == feb["total_mc"] == 475_000
    assert feb["promo_permille"] == 1000


def test_pmi_bigrams_favors_exclusive_pair(ray_session, tmp_path):
    """A pair that ONLY co-occurs must out-score an equally frequent
    pair whose members also appear apart; rank keys are exact ints."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import pmi_bigrams

    texts = ["aa bb"] * 3 + ["cc dd"] * 3 + ["cc xx dd yy cc xx dd yy cc xx dd yy"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = pmi_bigrams(str(tmp_path)).to_pylist()
    by_gram = {r["bigram"]: r for r in rows}
    # N = 24 tokens; aa/bb appear 3x each, only together:
    # (3*1e6 // 3) * 24 // 3 = 8_000_000
    assert rows[0]["bigram"] == "aa bb"
    assert by_gram["aa bb"]["pmi_scaled"] == 8_000_000
    assert (by_gram["aa bb"]["n_x"], by_gram["aa bb"]["n_y"]) == (3, 3)
    # cc/dd appear 6x each but pair only 3x:
    # (3*1e6 // 6) * 24 // 6 = 2_000_000
    assert by_gram["cc dd"]["pmi_scaled"] == 2_000_000
    assert all(r["n_xy"] >= 3 for r in rows)


def test_frontier_mask_strict_dominance():
    """Pure-numpy skyline semantics: duplicates of a frontier point
    all survive; weakly-worse points (equal on one axis) are pruned."""
    from document_extractor_ray.functions.textstats import _frontier_mask

    tok = np.array([10, 10, 10, 9, 9, 5, 11], np.int64)
    ch = np.array([100, 100, 120, 100, 90, 90, 200], np.int64)
    # (10,100) x2 survive (equal points, no strict dominator)
    # (10,120): dominated by (10,100)      (same tok, fewer chars)
    # (9,100):  dominated by (10,100)      (more tok, same chars)
    # (9,90):   survives (fewer chars than every higher-tok point)
    # (5,90):   dominated by (9,90)
    # (11,200): survives (highest tok)
    assert _frontier_mask(tok, ch).tolist() == [
        True, True, False, False, True, False, True,
    ]
    assert _frontier_mask(np.empty(0, np.int64), np.empty(0, np.int64)).tolist() == []


def test_pareto_docs_frontier_is_undominated(ray_session):
    """No returned doc may be strictly dominated by ANY corpus doc,
    and every excluded doc must have a dominator (sf0.001 corpus)."""
    from document_extractor_ray.functions.textstats import pareto_docs

    rows = pareto_docs(SF).take_all()
    assert rows, "frontier must be non-empty"
    import duckdb

    all_pts = duckdb.sql(
        rf"""SELECT doc_id,
               CAST(length(regexp_extract_all(text,'\S+')) AS BIGINT) n_tok,
               CAST(n_chars AS BIGINT) n_chars
             FROM '{SF}/documents.parquet'"""
    ).fetchall()
    front = {(r["n_tok"], r["n_chars"]) for r in rows}
    def dominated(p, pts):
        return any(
            q[1] >= p[0] and q[2] <= p[1] and (q[1] > p[0] or q[2] < p[1])
            for q in pts
        )
    for r in rows:
        assert not dominated((r["n_tok"], r["n_chars"]), all_pts), r
    for q in all_pts:
        if (q[1], q[2]) not in front:
            assert dominated((q[1], q[2]), all_pts), q


def test_bpe_merges_simultaneous_and_tiebreak(ray_session, tmp_path):
    """'aaab' x3: merge 0 must collapse BOTH (a,a) occurrences of the
    run simultaneously-left-to-right ('a a a'->'aa a', count 6); merge
    1 is the (a,b)/(aa,a) n=3 tie broken by left asc; merge 2 joins
    the two learned symbols."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import bpe_merges

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aaab aaab", "aaab"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = bpe_merges(str(tmp_path), n_merges=4)
    rows = list(zip(*[out[c].to_pylist() for c in out.column_names]))
    assert rows == [
        (0, "a", "a", 6),
        (1, "a", "b", 3),
        (2, "aa", "ab", 3),
    ]  # 4th merge: no pairs left -> early stop


def test_value_ks_types_hand_computed(ray_session, tmp_path):
    """KS on planted distributions: a={1,2,3}, b={3,4} -> D*na*nb = 4
    at cents=200 (max gap after the second a-value)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import value_ks_types

    t = pa.table(
        {
            "event_type": pa.array(
                ["click"] * 3 + ["purchase"] * 2 + ["view"], pa.string()
            ),
            "value": pa.array([1.0, 2.0, 3.0, 3.0, 4.0, 99.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    (row,) = value_ks_types(str(tmp_path)).take_all()
    assert row == {
        "n_a": 3,
        "n_b": 2,
        "ks_num": 4,
        "at_cents": 200,
        "ks_permille": 1000 * 4 // 6,
    }


def test_kgram_novelty_first_occurrence(ray_session, tmp_path):
    """Novelty counts k-grams whose global FIRST occurrence is this
    doc: an exact-duplicate doc scores 0, a partial overlap scores
    only its unseen grams."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.dedup import kgram_novelty_docs

    texts = ["a b c d e", "a b c d e", "a b c x y"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in kgram_novelty_docs(str(tmp_path)).take_all()}
    assert rows[0]["n_distinct"] == 3 and rows[0]["n_novel"] == 3
    assert rows[1]["n_distinct"] == 3 and rows[1]["n_novel"] == 0
    # doc2: grams {a b c, b c x, c x y}; only "a b c" was seen before
    assert rows[2]["n_distinct"] == 3 and rows[2]["n_novel"] == 2
    assert rows[2]["novelty_permille"] == 666
    # conservation: every distinct gram is novel in exactly one doc
    total_novel = sum(r["n_novel"] for r in rows.values())
    assert total_novel == 5  # {abc,bcd,cde} + {bcx,cxy}


def test_token_gini_uniform_is_zero(ray_session, tmp_path):
    """All tokens equally frequent -> Gini exactly 0; a skewed corpus
    scores > 0."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import token_gini

    flat = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aa bb cc", "dd ee ff"], pa.string()),
        }
    )
    pq.write_table(flat, str(tmp_path / "documents.parquet"))
    r = token_gini(str(tmp_path)).take_all()[0]
    assert (r["n_tokens"], r["total_occurrences"], r["gini_permille"]) == (6, 6, 0)

    skew_dir = tmp_path / "skew"
    skew_dir.mkdir()
    skew = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["zz zz zz zz zz zz zz zz zz aa"], pa.string()),
        }
    )
    pq.write_table(skew, str(skew_dir / "documents.parquet"))
    r2 = token_gini(str(skew_dir)).take_all()[0]
    # n=2 tokens, T=10, S = 1*1 + 2*9 = 19 -> G = (38 - 30)/20 = 0.4
    assert r2["gini_permille"] == 400


def test_vocab_growth_monotone_and_total(ray_session):
    from document_extractor_ray.functions.textstats import vocab_growth

    rows = vocab_growth(SF).take_all()
    assert [r["checkpoint"] for r in rows] == list(range(1, 11))
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)
    assert sizes[-1] == sum(r["new_tokens"] for r in rows)
    assert rows[-1]["docs_cutoff"] >= rows[0]["docs_cutoff"] > 0


def test_range_search_self_and_threshold(ray_session):
    from document_extractor_ray.functions.similarity import (
        RANGE_SEARCH_MICRO,
        range_search,
    )

    rows = range_search(SF).take_all()
    assert all(r["score_micro"] >= RANGE_SEARCH_MICRO for r in rows)
    self_rows = {r["query_id"] for r in rows if r["vec_id"] == r["query_id"]}
    assert len(self_rows) == 8  # every query finds itself at cos=1
    assert all(
        r["score_micro"] == 1_000_000
        for r in rows
        if r["vec_id"] == r["query_id"]
    )


def test_kmeans_assign_seeds_self(ray_session):
    from document_extractor_ray.functions.similarity import KMEANS_K, kmeans_assign

    rows = kmeans_assign(SF).take_all()
    seeds = sorted({r["cluster_id"] for r in rows})
    by_vec = {r["vec_id"]: r for r in rows}
    import pyarrow.parquet as pq

    n_vecs = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert len(rows) == n_vecs
    lowest = sorted(by_vec)[:KMEANS_K]
    for sid in lowest:  # a seed's nearest seed is itself
        assert by_vec[sid]["cluster_id"] == sid
        assert by_vec[sid]["score_micro"] == 1_000_000
    assert set(seeds) <= set(lowest)


def test_part_top_supplier_tie_breaks_low_suppkey(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import part_top_supplier

    t = pa.table(
        {
            "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "l_suppkey": pa.array([30, 10, 20, 5, 4], pa.int64()),
            "l_quantity": pa.array([4.0, 4.0, 1.0, 2.0, 7.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    rows = {r["l_partkey"]: r for r in part_top_supplier(str(tmp_path)).take_all()}
    assert rows[1]["top_suppkey"] == 10 and rows[1]["qty_cents"] == 400
    assert rows[2]["top_suppkey"] == 4 and rows[2]["qty_cents"] == 700


def test_nation_yoy_delta_consistency(ray_session):
    from document_extractor_ray.functions.analytics import nation_yoy_revenue

    rows = nation_yoy_revenue(SF).take_all()
    rows.sort(key=lambda r: (r["n_name"], r["yr"]))
    prev = None
    for r in rows:
        if prev is None or prev["n_name"] != r["n_name"]:
            assert r["delta_cents"] is None
        else:
            assert r["delta_cents"] == r["revenue_cents"] - prev["revenue_cents"]
        prev = r


def test_session_stats_consistent_with_sessionize(ray_session):
    from document_extractor_ray.functions.analytics import (
        session_stats,
        sessionize,
    )

    stats = session_stats(SF).take_all()
    n_sess = {r["user_id"]: r["n_sessions"] for r in sessionize(SF).take_all()}
    max_sid: dict = {}
    total_events = 0
    for r in stats:
        assert r["duration_us"] >= 0 and r["n_events"] >= 1
        max_sid[r["user_id"]] = max(max_sid.get(r["user_id"], 0), r["session_id"])
        total_events += r["n_events"]
    assert max_sid == n_sess  # same gap rule, same session count
    import pyarrow.parquet as pq

    assert total_events == pq.read_metadata(f"{SF}/events.parquet").num_rows


def test_brand_basket_pairs_known_corpus(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import brand_basket_pairs

    # order 1: brands A,B (A twice via two parts); order 2: A,B; order 3: A
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "l_partkey": pa.array([10, 11, 20, 10, 20, 10], pa.int64()),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array([10, 11, 20], pa.int64()),
            "p_brand": pa.array(["A", "A", "B"], pa.string()),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(part, str(tmp_path / "part.parquet"))
    rows = brand_basket_pairs(str(tmp_path)).take_all()
    assert rows == [{"brand_a": "A", "brand_b": "B", "n": 2}]


def test_order_lines_histogram_mass(ray_session):
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import order_lines_histogram

    rows = order_lines_histogram(SF).take_all()
    mass = sum(r["n_lines"] * r["n_orders"] for r in rows)
    assert mass == pq.read_metadata(f"{SF}/lineitem.parquet").num_rows
    assert [r["n_lines"] for r in rows] == sorted(r["n_lines"] for r in rows)


def test_kwic_term_contexts(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import kwic_term

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "spark at start and spark at end spark",
                    "no hits here",
                    "one two spark three four",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    rows = kwic_term(str(tmp_path)).take_all()
    assert [(r["doc_id"], r["pos"]) for r in rows] == [(0, 1), (0, 5), (0, 8), (2, 3)]
    by = {(r["doc_id"], r["pos"]): r for r in rows}
    assert by[(0, 1)]["left_ctx"] == "" and by[(0, 1)]["right_ctx"] == "at start"
    assert by[(0, 5)]["left_ctx"] == "start and" and by[(0, 5)]["right_ctx"] == "at end"
    assert by[(0, 8)]["left_ctx"] == "at end" and by[(0, 8)]["right_ctx"] == ""
    assert by[(2, 3)]["left_ctx"] == "one two" and by[(2, 3)]["right_ctx"] == "three four"


def test_lang_confusion_diagonal_mass(ray_session):
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import lang_confusion

    rows = lang_confusion(SF).take_all()
    total = sum(r["n_docs"] for r in rows)
    assert total == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    diag = sum(r["n_docs"] for r in rows if r["lang"] == r["pred_lang"])
    assert 0 < diag <= total  # classifier agrees on a nonzero subset


def test_value_decile_assign_bounds_and_monotone(ray_session):
    from document_extractor_ray.functions.analytics import value_decile_assign

    rows = value_decile_assign(SF).take_all()
    assert all(0 <= r["decile"] <= 9 for r in rows)
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["cents"], r["decile"]))
    for pairs in by_type.values():
        pairs.sort()
        decs = [d for _, d in pairs]
        assert decs == sorted(decs)  # decile monotone in value
        # equal values -> equal decile (tie stability)
        seen: dict = {}
        for c, d in pairs:
            assert seen.setdefault(c, d) == d


def test_order_window_counts_known_corpus(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import (
        order_window_event_counts,
    )

    base = dt.datetime(2024, 1, 10)
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 7, 8], pa.int64()),
            "o_orderdate": pa.array(
                [base, base + dt.timedelta(days=30), base], pa.timestamp("us")
            ),
        }
    )
    # user 7: events at day 0 (inclusive lo), day 7 (inclusive hi),
    # day 7+1us (out), day 30+3 (order 2); user 9: no orders
    events = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 7, 9], pa.int64()),
            "ts": pa.array(
                [
                    base,
                    base + dt.timedelta(days=7),
                    base + dt.timedelta(days=7, microseconds=1),
                    base + dt.timedelta(days=33),
                    base,
                ],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(events, str(tmp_path / "events.parquet"))
    rows = {r["o_orderkey"]: r["n_events"] for r in
            order_window_event_counts(str(tmp_path)).take_all()}
    assert rows == {1: 2, 2: 1, 3: 0}


def test_customer_order_totals_left_outer(ray_session):
    """LEFT OUTER semantics: every customer appears exactly once;
    customers absent from orders carry zero counts."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import customer_order_totals

    rows = customer_order_totals(SF).take_all()
    assert len(rows) == pq.read_metadata(f"{SF}/customer.parquet").num_rows
    import duckdb

    expected_zero = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{SF}/customer.parquet') c
            WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{SF}/orders.parquet') o
                              WHERE o.o_custkey = c.c_custkey)"""
    ).fetchone()[0]
    zeros = [r for r in rows if r["n_orders"] == 0]
    assert len(zeros) == expected_zero
    assert all(r["revenue_cents"] == 0 for r in zeros)
    assert len({r["c_custkey"] for r in rows}) == len(rows)


def test_user_rolling3_matches_cumulative_prefix(ray_session):
    """First ROLLING_N events of each user must equal the running
    total; frames never span users and never exceed ROLLING_N."""
    from document_extractor_ray.functions.analytics import (
        user_cumulative_value,
        user_rolling3_sum,
    )

    roll = {r["event_id"]: r for r in user_rolling3_sum(SF).take_all()}
    cum = {r["event_id"]: r for r in user_cumulative_value(SF).take_all()}
    assert set(roll) == set(cum)
    for eid, r in roll.items():
        c = cum[eid]
        assert r["user_id"] == c["user_id"]
        assert 1 <= r["n_in_frame"] <= 3
        assert r["n_in_frame"] == min(c["cum_n"], 3)
        if c["cum_n"] <= 3:
            assert r["roll3_cents"] == c["cum_value_cents"]


def test_minhash_calibration_identities(ray_session):
    """Integer identities: est = sig/64 permille, jac = num/den
    permille, err = est - jac; estimates correlate with truth (mean
    |err| under 250 permille on real candidates)."""
    from document_extractor_ray.functions.dedup import minhash_calibration_docs

    rows = minhash_calibration_docs(SF).to_pylist()
    assert rows
    for r in rows:
        assert 0 <= r["sig_match"] <= 64
        assert r["est_permille"] == 1000 * r["sig_match"] // 64
        assert r["jac_den"] >= r["jac_num"] >= 0
        assert r["jac_permille"] == (
            1000 * r["jac_num"] // r["jac_den"] if r["jac_den"] else 0
        )
        assert r["err_permille"] == r["est_permille"] - r["jac_permille"]
    mean_abs_err = sum(abs(r["err_permille"]) for r in rows) / len(rows)
    assert mean_abs_err < 250


def test_user_top3_events_semantics(ray_session):
    from document_extractor_ray.functions.analytics import user_top3_events

    rows = user_top3_events(SF).take_all()
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    for rs in per_user.values():
        ranks = [r["rank"] for r in rs]
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 3
        vals = [r["cents"] for r in rs]
        assert vals == sorted(vals, reverse=True)

def test_order_date_records_refold_path(ray_session, monkeypatch):
    """Force the adversarial-order budget re-fold (budget=1) and check
    it converges to the same record set as the direct path."""
    from document_extractor_ray.functions import analytics

    direct = analytics.order_date_records(SF).to_pandas()
    # records must be strictly increasing in BOTH key and date
    assert direct["o_orderkey"].is_monotonic_increasing
    assert direct["o_orderdate"].is_monotonic_increasing
    assert direct["o_orderdate"].nunique() == len(direct)
    monkeypatch.setattr(analytics, "RECORD_FOLD_BUDGET", 1)
    folded = analytics.order_date_records(SF).to_pandas()
    pd.testing.assert_frame_equal(direct, folded)

def test_weighted_sample_favors_heavy_docs(ray_session):
    """The n_chars-weighted sample must overrepresent long docs
    relative to the corpus mean (the point of priority weighting)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import weighted_sample_docs

    sample = weighted_sample_docs(SF).to_pandas()
    corpus = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    assert sample["n_chars"].mean() > 1.1 * corpus["n_chars"].to_pandas().mean()
    assert sample["skey"].is_monotonic_increasing

def test_q5_join_escalation_matches_broadcast(ray_session):
    """Force the above-budget partitioned-join path (broadcast_limit=0)
    and check it is row-identical to the broadcast path."""
    from document_extractor_ray.functions.analytics import q5_local_supplier

    a = q5_local_supplier(SF).to_pandas()
    b = q5_local_supplier(SF, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)

def test_kmv_estimate_near_truth(ray_session):
    """The driver-side KMV estimate must land within the sketch's
    ~1/sqrt(K-1) relative error of the true per-type distinct count."""
    import duckdb
    import pyarrow as pa

    from document_extractor_ray.functions.analytics import KMV_K, kmv_estimate, kmv_registers

    regs = pa.Table.from_pandas(kmv_registers(SF).to_pandas())
    est = kmv_estimate(regs)
    truth = dict(
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) FROM '{SF}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert set(est) == set(truth)
    for et, true_n in truth.items():
        if true_n <= KMV_K:
            assert est[et] == true_n
        else:
            assert abs(est[et] - true_n) / true_n < 3.0 / (KMV_K - 1) ** 0.5

def test_q18_join_escalation_matches_broadcast(ray_session):
    """Force the above-budget partitioned-join path (broadcast_limit=0)
    and check it is row-identical to the broadcast-lookup path."""
    from document_extractor_ray.functions.analytics import q18_large_orders

    a = q18_large_orders(SF).to_pandas()
    b = q18_large_orders(SF, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_q4_join_escalation_matches_broadcast(ray_session):
    """Force the above-budget partitioned-join path (broadcast_limit=0)
    and check it is row-identical to the broadcast semi-join path."""
    from document_extractor_ray.functions.analytics import q4_order_priority

    a = q4_order_priority(SF).to_pandas()
    b = q4_order_priority(SF, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_q19_join_escalation_matches_broadcast(ray_session):
    """Force the above-budget partitioned-join path (broadcast_limit=0)
    and check it is row-identical to the broadcast-lookup path."""
    from document_extractor_ray.functions.analytics import q19_brand_qty_revenue

    a = q19_brand_qty_revenue(SF).to_pandas()
    b = q19_brand_qty_revenue(SF, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_q8_join_escalation_matches_broadcast(ray_session):
    """Force the all-partitioned-joins path (broadcast_limit=0) and
    check it is row-identical to the broadcast star-join path."""
    from document_extractor_ray.functions.analytics import q8_market_share

    a = q8_market_share(SF).to_pandas()
    b = q8_market_share(SF, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_q21_join_escalation_matches_broadcast(ray_session):
    """Force the above-budget partitioned-join path (broadcast_limit=0)
    and check it is row-identical to the broadcast path."""
    from document_extractor_ray.functions.analytics import q21_waiting_suppliers

    a = q21_waiting_suppliers(SF).to_pandas()
    b = q21_waiting_suppliers(SF, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_embedding_pca_power_matches_eigh(ray_session):
    """The distributed integer-Gram power iteration must agree with
    numpy eigh on the same quantized matrix: cosine >= 0.9999 against
    the top eigenvector, eigenvalue within 1e-6 relative."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.similarity import (
        embedding_matrix,
        embedding_pca_power,
    )

    out = embedding_pca_power(SF)
    v = out["component_micro"].to_numpy().astype(np.float64) / 1e6

    tab = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    m = embedding_matrix(tab["embedding"]).astype(np.float64)
    q = np.floor(m * 1_000_000 + 0.5)
    gram = q.T @ q
    w, vecs = np.linalg.eigh(gram)
    top = vecs[:, -1]
    cos = abs(top @ v) / (np.linalg.norm(top) * np.linalg.norm(v))
    assert cos >= 0.9999
    lam = out["eigval_micro2_per_row"][0].as_py() * len(m)
    assert abs(lam - w[-1]) / w[-1] < 1e-4


def test_embedding_pca_power_deterministic(ray_session):
    """Integer Gram merge => identical micro-rounded output across runs."""
    from document_extractor_ray.functions.similarity import embedding_pca_power

    a = embedding_pca_power(SF).to_pandas()
    b = embedding_pca_power(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_lm_xent_family_invariants(ray_session):
    """Cross-operator LM identities: (1) KL(source ‖ corpus) >= 0 for
    every source; (2) the corpus-total unigram surprisal is the same
    whether folded per doc (doc_unigram_xent) or per source
    (source_lm_divergence) — both sum L(N)-L(c_w) over every token
    occurrence; (3) bigram conditional surprisal is non-negative."""
    from document_extractor_ray.functions.textstats import (
        doc_bigram_xent,
        doc_unigram_xent,
        source_lm_divergence,
    )

    src = source_lm_divergence(SF).to_pandas()
    assert (src["kl_num"] >= 0).all()
    assert (src["xent_num"] == src["ent_num"] + src["kl_num"]).all()

    uni = doc_unigram_xent(SF).to_pandas()
    assert int(uni["xent_num"].sum()) == int(src["xent_num"].sum())
    assert int(uni["n_tok"].sum()) == int(src["n_tok"].sum())

    big = doc_bigram_xent(SF).to_pandas()
    assert (big["xent2_num"] >= 0).all()
    assert (big["n_big"] == uni.set_index("doc_id").loc[big["doc_id"], "n_tok"].to_numpy() - 1).all()


def test_shipping_open_orders_sweep_invariants(ray_session):
    """Sweep-line sanity: the running open count is non-negative
    everywhere, ends at exactly zero (every opened interval closes),
    and its maximum is bounded by the number of distinct orders with
    lineitems."""
    import duckdb

    from document_extractor_ray.functions.analytics import shipping_open_orders

    prof = shipping_open_orders(SF).to_pandas()
    assert (prof["open_orders"] >= 0).all()
    assert int(prof["open_orders"].iloc[-1]) == 0
    n_orders = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    assert int(prof["open_orders"].max()) <= n_orders


def test_persistent_heavy_users_membership(ray_session):
    """Every reported persistent heavy user must actually hold a
    per-day top-k slot on >= MIN_DAYS days when recomputed exactly in
    pandas from the raw events."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import (
        HEAVY_MIN_DAYS,
        HEAVY_TOP_K,
        persistent_heavy_users,
    )

    got = persistent_heavy_users(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"]).to_pandas()
    ev["day"] = ev["ts"].dt.floor("D")
    du = ev.groupby(["day", "user_id"]).size().reset_index(name="cnt")
    du = du.sort_values(["day", "cnt", "user_id"], ascending=[True, False, True])
    du["r"] = du.groupby("day").cumcount()
    tk = du[du["r"] < HEAVY_TOP_K]
    persist = tk.groupby("user_id").agg(days=("day", "size"), ev=("cnt", "sum"))
    persist = persist[persist["days"] >= HEAVY_MIN_DAYS]
    assert set(got["user_id"]) == set(persist.index)
    merged = persist.loc[got["user_id"]]
    assert (merged["days"].to_numpy() == got["days_in_topk"].to_numpy()).all()
    assert (merged["ev"].to_numpy() == got["topk_events"].to_numpy()).all()


def test_doc_quality_composite_matches_components(ray_session):
    """The fused filter chain must agree bit-for-bit with the three
    standalone operators it composes (same constants, same kernels):
    bit0 == not-in-quality_filter, bit1 == repetitive, bit2 == gopher
    keep == 0."""
    from document_extractor_ray.functions.textstats import (
        FAIL_C4,
        FAIL_GOPHER,
        FAIL_REPETITION,
        doc_quality_composite,
        gopher_rules,
        quality_filter,
        repetition_filter,
    )

    comp = doc_quality_composite(SF).to_pandas().set_index("doc_id")
    kept_c4 = set(quality_filter(SF).to_pandas()["doc_id"])
    rep = repetition_filter(SF).to_pandas().set_index("doc_id")["repetitive"]
    gop = gopher_rules(SF).to_pandas().set_index("doc_id")["keep"]
    for doc_id, row in comp.iterrows():
        want = (
            (0 if doc_id in kept_c4 else FAIL_C4)
            + (FAIL_REPETITION if rep.loc[doc_id] else 0)
            + (0 if gop.loc[doc_id] == 1 else FAIL_GOPHER)
        )
        assert row["fail_mask"] == want, doc_id
        assert row["keep"] == (1 if want == 0 else 0)


def test_collocation_llr_sanity(ray_session):
    """LLR numerators are positive for the reported top-k collocations
    and the scores agree with a direct float Dunning LLR computed from
    pandas counts (within integer micro-rounding slack)."""
    import math

    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import collocation_llr

    got = collocation_llr(SF).to_pandas()
    assert (got["llr_num"] > 0).all()
    assert (got["n"] >= 1).all()

    import re
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
    from collections import Counter
    big, pre, suf = Counter(), Counter(), Counter()
    for s in texts:
        w = [x for x in re.split(r"[^a-z0-9]+", s.lower()) if x]
        for a, b in zip(w[:-1], w[1:]):
            big[(a, b)] += 1; pre[a] += 1; suf[b] += 1
    n = sum(big.values())

    def S(x):
        return 0.0 if x == 0 else x * math.log(x)

    top = got.iloc[0]
    a, b = top["bigram"].split(" ")
    k11 = big[(a, b)]; r1 = pre[a]; c1 = suf[b]
    llr = 2 * (S(k11) + S(r1 - k11) + S(c1 - k11) + S(n - r1 - c1 + k11)
               - S(r1) - S(n - r1) - S(c1) - S(n - c1) + S(n))
    assert abs(top["llr_num"] / 1e6 - llr) < 1.0


def test_pack_efficiency_totals(ray_session):
    """Band histogram conserves mass: n_docs and tokens sum to the
    pack_assignments totals, and waste = window - tokens for every
    non-oversize example."""
    from document_extractor_ray.functions.training import (
        PACK_WINDOW,
        pack_assignments_docs,
        pack_efficiency_stats,
    )

    stats = pack_efficiency_stats(SF).to_pandas()
    pa_df = pack_assignments_docs(SF).to_pandas()
    assert int(stats["n_docs"].sum()) == len(pa_df)
    assert int(stats["tokens"].sum()) == int(pa_df["n_tokens"].sum())
    nonov = stats[stats["band"] >= 0]
    assert (
        nonov["waste_tokens"] == nonov["n_examples"] * PACK_WINDOW - nonov["tokens"]
    ).all()


def test_name_typo_pairs_blocking_complete(ray_session):
    """The deletion-neighborhood blocking may not DROP any true
    edit-distance-1 pair: cross-check the Ray result against a direct
    quadratic scan, and confirm the verify step rejected at least one
    distance-2 candidate (blocking bounds distance by 2, so without
    the verify the result would be larger)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.dedup import _is_edit1, name_typo_pairs

    names = pq.read_table(f"{SF}/customer.parquet", columns=["c_name"])[
        "c_name"
    ].to_pylist()
    got = name_typo_pairs(SF).to_pandas()
    want = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _is_edit1(*sorted((a, b)))
    }
    want = {tuple(sorted(p)) for p in want}
    assert set(zip(got["name_a"], got["name_b"])) == want


def test_is_edit1_cases():
    from document_extractor_ray.functions.dedup import _is_edit1

    assert _is_edit1("abc", "abd")       # substitution
    assert _is_edit1("abc", "ab")        # deletion
    assert _is_edit1("abc", "xabc")      # insertion
    assert not _is_edit1("abc", "abc")   # identical
    assert not _is_edit1("abX", "aYb")   # shares deletion variant, dist 2
    assert not _is_edit1("abc", "a")     # dist 2


def test_join_size_exact_matches_real_join(ray_session):
    """The statistics-only cardinality must equal the true join size."""
    import duckdb

    from document_extractor_ray.functions.analytics import join_size_exact

    got = join_size_exact(SF).to_pandas().iloc[0]
    real = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{SF}/orders.parquet') o
            JOIN read_parquet('{SF}/lineitem.parquet') l
            ON l.l_orderkey = o.o_orderkey"""
    ).fetchone()[0]
    assert int(got["join_rows"]) == real


def test_attribution_conserves_purchases(ray_session):
    """Every purchase is attributed exactly once (to a type or to
    'none'), and attributed value equals total purchase value."""
    import duckdb

    from document_extractor_ray.functions.analytics import attribution_last_touch

    got = attribution_last_touch(SF).to_pandas()
    n, cents = duckdb.sql(
        f"""SELECT count(*),
                   CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')
            WHERE event_type = 'purchase'"""
    ).fetchone()
    assert int(got["n_purchases"].sum()) == n
    assert int(got["purchase_value_cents"].sum()) == cents


def test_source_lm_gap_allocates_kl(ray_session):
    """doc_source_lm_gap is the per-document allocation of
    source_lm_divergence's KL: summing gap_num over each source's docs
    must reproduce that source's kl_num exactly."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import (
        doc_source_lm_gap,
        source_lm_divergence,
    )

    gap = doc_source_lm_gap(SF).to_pandas()
    src_of = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    merged = gap.merge(src_of, on="doc_id")
    per_src = merged.groupby("source")["gap_num"].sum()
    kl = source_lm_divergence(SF).to_pandas().set_index("source")["kl_num"]
    for s, v in per_src.items():
        assert int(v) == int(kl.loc[s]), s


def test_value_type_chi2_marginals(ray_session):
    """Contingency marginals are consistent and the chi-square cell
    terms satisfy the definition (N·o − r·c)² / (r·c·N)."""
    from document_extractor_ray.functions.analytics import value_type_chi2

    t = value_type_chi2(SF).to_pandas()
    n = int(t["n"].sum())
    for d, grp in t.groupby("decile"):
        assert (grp["r_tot"] == grp["n"].sum()).all()
    for ty, grp in t.groupby("event_type"):
        assert (grp["c_tot"] == grp["n"].sum()).all()
    num = (n * t["n"] - t["r_tot"] * t["c_tot"]) ** 2
    assert (t["chi2_num"] == num).all()
    assert (t["chi2_den"] == t["r_tot"] * t["c_tot"] * n).all()


def test_knn_classify_votes(ray_session):
    """Votes sum to k−1 per query (self excluded) and predictions
    carry the plurality count."""
    from document_extractor_ray.functions.similarity import knn_classify

    t = knn_classify(SF).to_pandas()
    assert len(t) == 8
    assert (t["votes"] >= 1).all() and (t["votes"] <= 9).all()
    assert set(t["correct"]).issubset({0, 1})


def test_token_burstiness_identities(ray_session):
    """tf >= df (every counted doc contributes >= 1), VMR ingredients
    satisfy their definition, and single-occurrence tokens (tf == df ==
    all counts 1) have zero variance numerator."""
    from document_extractor_ray.functions.textstats import token_burstiness

    t = token_burstiness(SF).to_pandas()
    assert (t["tf"] >= t["df"]).all()
    assert (t["vmr_num"] == t["df"] * t["sum_cnt_sq"] - t["tf"] ** 2).all()
    assert (t["vmr_den"] == t["tf"] * t["df"]).all()
    ones = t[t["tf"] == t["df"]]
    assert (ones["vmr_num"] == ones["df"] * ones["df"] - ones["tf"] ** 2).all()


def test_transition_llr_consistency(ray_session):
    """LLR numerators are non-negative (it is a likelihood RATIO of a
    nested model) and n sums to the event_transitions total."""
    from document_extractor_ray.functions.analytics import (
        event_transitions,
        transition_llr,
    )

    t = transition_llr(SF).to_pandas()
    assert (t["llr_num"] >= 0).all()
    tr = event_transitions(SF).to_pandas()
    assert int(t["n"].sum()) == int(tr["n"].sum())
    assert set(t["over_expected"]).issubset({0, 1})


def test_events_hour_profile_shares(ray_session):
    """Per-type shares are permille floors summing to <= 1000 and
    > 1000 - 24 (floor loss bound), and n conserves the event count."""
    import duckdb

    from document_extractor_ray.functions.analytics import events_hour_profile

    t = events_hour_profile(SF).to_pandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert int(t["n"].sum()) == total
    for ty, grp in t.groupby("event_type"):
        s = int(grp["share_permille"].sum())
        assert 1000 - 24 < s <= 1000, (ty, s)


def test_shingle_containment_dual_path_identical(ray_session):
    """The broadcast (below-budget) and partitioned-join (above-budget)
    containment paths must return identical tables, and containment
    must dominate Jaccard on every candidate (max containment >=
    jaccard by definition)."""
    import ray.data as rd

    from document_extractor_ray.functions.dedup import (
        _read_docs,
        shingle_containment_pairs,
    )

    ds = _read_docs(SF)
    a = shingle_containment_pairs(ds).to_pandas()
    b = shingle_containment_pairs(_read_docs(SF), pair_budget=0).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    # containment >= jaccard: inter/min(na,nb) >= inter/(na+nb-inter)
    mx = a[["cont_a_permille", "cont_b_permille"]].max(axis=1)
    jac = (a["n_inter"] * 1000) // (a["n_a"] + a["n_b"] - a["n_inter"])
    assert (mx >= jac).all()


def test_knn_ivf_indexed_matches_in_memory(ray_session):
    """The persisted centroid-partitioned index (read-pruned probing)
    must return EXACTLY knn_ivf's output — same deterministic sample,
    same centroids, same probe sets; the committed knn_ivf golden
    therefore covers both paths."""
    import shutil

    from document_extractor_ray.functions.similarity import (
        knn_ivf_embeddings,
        knn_ivf_indexed,
    )

    a = knn_ivf_embeddings(SF).to_pandas()
    b = knn_ivf_indexed(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_simhash_bit_balance_bounds(ray_session):
    """Every share is a valid permille and total set bits equal the
    popcount sum over all fingerprints."""
    from document_extractor_ray.functions.dedup import (
        simhash_bit_balance,
        simhash_table,
    )

    t = simhash_bit_balance(SF).to_pandas()
    assert len(t) == 63
    assert ((t["share_permille"] >= 0) & (t["share_permille"] <= 1000)).all()
    hashes = simhash_table(SF).to_pandas()["simhash"].to_numpy().astype(np.uint64)
    pop = sum(int(h).bit_count() for h in hashes)
    assert int(t["n_set"].sum()) == pop


def test_user_value_trend_vs_numpy_ols(ray_session):
    """Per-user integer OLS numerators must reproduce a direct numpy
    polyfit slope (num/den == slope) for users with a valid
    denominator."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import user_value_trend

    got = user_value_trend(SF).to_pandas().set_index("user_id")
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "value"]
    ).to_pandas()
    ev["x"] = (ev["ts"].dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    ev["y"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    checked = 0
    for uid, g in list(ev.groupby("user_id"))[:25]:
        row = got.loc[uid]
        if row["slope_den"] == 0 or g["x"].nunique() < 2:
            continue
        slope = np.polyfit(g["x"], g["y"], 1)[0]
        assert abs(row["slope_num"] / row["slope_den"] - slope) < 1e-6, uid
        checked += 1
    assert checked >= 10


def test_value_drift_quantiles_monotone(ray_session):
    """p90 >= p50 within each window, and each quantile is an actual
    observed cents value from that (type, window) slice."""
    import duckdb

    from document_extractor_ray.functions.analytics import value_drift_quantiles

    t = value_drift_quantiles(SF).to_pandas()
    assert (t["p90_w1_cents"] >= t["p50_w1_cents"]).all()
    assert (t["p90_w2_cents"] >= t["p50_w2_cents"]).all()
    obs = duckdb.sql(
        f"""SELECT DISTINCT event_type, CAST(round(value*100.0) AS BIGINT) c
            FROM read_parquet('{SF}/events.parquet')"""
    ).df()
    byty = obs.groupby("event_type")["c"].apply(set)
    for _, r in t.iterrows():
        s = byty[r["event_type"]]
        assert r["p50_w1_cents"] in s and r["p90_w2_cents"] in s


def test_winnowing_guarantee_and_trigram_mass(ray_session):
    """Winnowing guarantee (Schleimer 2003): every run of `guard`
    consecutive window positions contains >= 1 selected fingerprint.
    And event_trigrams mass: total trigram count == n_events - 2*users
    with >=... exactly sum over users of max(0, k-2)."""
    import duckdb

    from document_extractor_ray.functions.analytics import event_trigrams
    from document_extractor_ray.functions.textstats import winnowing_fingerprints

    t = winnowing_fingerprints(SF).take_all()
    by_doc: dict[int, list[int]] = {}
    for r in t:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    # window hash count per doc = max(1, n_words - 8 + 1)
    nw = dict(
        duckdb.sql(
            f"""SELECT doc_id, greatest(1, len(string_split_regex(trim(text), '\\s+')) - 7)
                FROM read_parquet('{SF}/documents.parquet')"""
        ).fetchall()
    )
    guard = 4
    for did, poss in by_doc.items():
        sel = sorted(poss)
        assert len(sel) == len(set(sel))  # DISTINCT
        n_win = nw[did]
        assert all(1 <= p <= n_win for p in sel)
        if n_win >= guard:
            # guarantee: each window [j, j+guard-1] has a selection
            import numpy as np

            mask = np.zeros(n_win + 1, bool)
            mask[sel] = True
            for j in range(1, n_win - guard + 2):
                assert mask[j : j + guard].any(), (did, j)

    tri = sum(r["n"] for r in event_trigrams(SF).to_pylist())
    expect = duckdb.sql(
        f"""SELECT sum(greatest(0, k - 2)) FROM (
              SELECT count(*) k FROM read_parquet('{SF}/events.parquet')
              GROUP BY user_id)"""
    ).fetchone()[0]
    assert tri == expect


def test_simpson_bounds(ray_session):
    """rep_num <= rep_den, and rep_num == rep_den only when the doc is
    a single repeated token; n_tokens matches token_counts."""
    from document_extractor_ray.functions.textstats import doc_simpson_diversity

    t = doc_simpson_diversity(SF).take_all()
    assert len(t) > 0
    for r in t:
        assert 0 <= r["rep_num"] <= r["rep_den"]
        assert r["rep_den"] == r["n_tokens"] * (r["n_tokens"] - 1)


def test_heavy_hitter_coverage_minimality(ray_session):
    """The kept prefix is the MINIMAL one: it covers >= half of all
    events, and dropping its last (lightest) user drops below half.
    Histogram mass: user_active_days_histogram sums to n_users."""
    import duckdb

    from document_extractor_ray.functions.analytics import (
        heavy_hitter_coverage,
        user_active_days_histogram,
    )

    rows = heavy_hitter_coverage(SF).take_all()
    assert rows
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    cum_last = rows[-1]["cum_events"]
    assert 2 * cum_last >= total
    assert 2 * (cum_last - rows[-1]["n_events"]) < total
    # cum is consistent with the running sum of n_events
    run = 0
    for r in rows:
        run += r["n_events"]
        assert r["cum_events"] == run

    hist = user_active_days_histogram(SF).to_pylist()
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert sum(r["n_users"] for r in hist) == n_users


def test_semdedup_and_interval_semantics(ray_session):
    """semdedup: the first vec_id of every cluster is kept with no
    priors; kept=0 iff n_dup_prior>0; both classes non-vacuous.
    interval overlaps: every pair is same-customer, okey_a<okey_b,
    overlap_days>=0 and symmetric-free (each unordered pair once)."""
    from document_extractor_ray.functions.analytics import order_interval_overlaps
    from document_extractor_ray.functions.similarity import semdedup_prune

    rows = semdedup_prune(SF).take_all()
    assert rows
    first_of = {}
    kept_vals = set()
    for r in rows:
        kept_vals.add(r["kept"])
        assert (r["kept"] == 1) == (r["n_dup_prior"] == 0)
        c = r["cluster_id"]
        if c not in first_of or r["vec_id"] < first_of[c]["vec_id"]:
            first_of[c] = r
    assert kept_vals == {0, 1}
    for r in first_of.values():
        assert r["kept"] == 1 and r["max_prior_sim_micro"] == -1

    pairs = order_interval_overlaps(SF).take_all()
    assert pairs
    seen = set()
    for p in pairs:
        assert p["okey_a"] < p["okey_b"]
        assert p["overlap_days"] >= 0
        key = (p["okey_a"], p["okey_b"])
        assert key not in seen
        seen.add(key)


def test_medoid_margin_entropy_semantics(ray_session):
    """label_medoid: medoid is a member of its label and n_members
    sums to table size; assign_margin_stats: margins >= 0 and
    cluster/second disagree; token_context_entropy: ent_num >= 0 and
    zero iff a single distinct successor."""
    import duckdb

    from document_extractor_ray.functions.similarity import (
        assign_margin_stats,
        label_medoid,
    )
    from document_extractor_ray.functions.textstats import token_context_entropy

    med = label_medoid(SF).take_all()
    members = dict(
        duckdb.sql(
            f"SELECT label, count(*) FROM read_parquet('{SF}/embeddings.parquet') GROUP BY 1"
        ).fetchall()
    )
    owner = dict(
        duckdb.sql(
            f"SELECT vec_id, label FROM read_parquet('{SF}/embeddings.parquet')"
        ).fetchall()
    )
    assert sum(r["n_members"] for r in med) == sum(members.values())
    for r in med:
        assert owner[r["medoid_vec_id"]] == r["label"]
        assert r["n_members"] == members[r["label"]]

    mar = assign_margin_stats(SF).take_all()
    assert mar
    for r in mar:
        assert r["margin_micro"] >= 0
        assert r["cluster_id"] != r["second_id"]

    ent = token_context_entropy(SF).to_pylist()
    assert ent
    for r in ent:
        assert r["ent_num"] >= 0
        if r["n_distinct_next"] == 1:
            assert r["ent_num"] == 0


def test_lsh_histogram_and_decile_transition_mass(ray_session):
    """lsh_band_histogram: per band, sum(size*n_buckets) == n_docs
    (every doc lands in exactly one bucket per band); decile
    transition: cells sum to distinct users, deciles within [-1, 9]."""
    import duckdb

    from document_extractor_ray.functions.analytics import user_decile_transition
    from document_extractor_ray.functions.dedup import lsh_band_histogram_docs

    hist = lsh_band_histogram_docs(SF).to_pylist()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    per_band: dict[int, int] = {}
    for r in hist:
        per_band[r["band_id"]] = (
            per_band.get(r["band_id"], 0) + r["bucket_size"] * r["n_buckets"]
        )
    assert set(per_band) == set(range(16))
    assert all(v == n_docs for v in per_band.values())

    mat = user_decile_transition(SF).to_pylist()
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert sum(r["n_users"] for r in mat) == n_users
    for r in mat:
        assert -1 <= r["d_w1"] <= 9 and -1 <= r["d_w2"] <= 9


def test_bloom_decontaminate_containment(ray_session):
    """Bloom superset property: bloom_hits >= exact_hits per doc
    (exact members always pass their own filter), bloom_fp == the
    difference, and the benchmark docs (3 lowest ids) self-flag with
    exact_hits == n_shingles."""
    from document_extractor_ray.functions.dedup import bloom_decontaminate_docs

    rows = bloom_decontaminate_docs(SF).take_all()
    assert rows
    by_id = {r["doc_id"]: r for r in rows}
    bench_ids = sorted(by_id)[:3]
    for r in rows:
        assert r["bloom_hits"] >= r["exact_hits"]
        assert r["bloom_fp"] == r["bloom_hits"] - r["exact_hits"]
        assert r["contaminated_bloom"] == (1 if r["bloom_hits"] >= 1 else 0)
    for d in bench_ids:
        assert by_id[d]["exact_hits"] == by_id[d]["n_shingles"] > 0


def test_rrf_fusion_semantics(ray_session):
    """RRF semantics: every fused doc appears in at least one input
    ranking, a doc present in BOTH lists outscores any single-list doc
    whose best rank is not better, and rank 0 encodes absence."""
    from document_extractor_ray.functions.textstats import RRF_K, rrf_fusion

    t = rrf_fusion(SF)
    rows = t.to_pylist()
    assert rows
    for r in rows:
        assert r["rank_tfidf"] > 0 or r["rank_bm25"] > 0
        expect = 0
        for rk in (r["rank_tfidf"], r["rank_bm25"]):
            if rk:
                expect += 1_000_000 // (RRF_K + rk)
        assert r["rrf_micro"] == expect
    scores = [r["rrf_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_events_ewma_bounds(ray_session):
    """EWMA stays within [min, max] of the per-type counts (in micro
    units, up to the floor-division slack) and starts at the first
    observation exactly."""
    from document_extractor_ray.functions.analytics import events_ewma

    t = events_ewma(SF).to_pylist()
    assert t
    by_type = {}
    for r in t:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rows in by_type.items():
        ns = [r["n"] for r in rows]
        assert rows[0]["ewma_micro"] == 1_000_000 * ns[0]
        lo, hi = min(ns) * 1_000_000 - 4, max(ns) * 1_000_000
        for r in rows:
            assert lo <= r["ewma_micro"] <= hi


def test_range_partition_plan_invariants(ray_session):
    """Partition sizes differ by at most 1 and sum to the corpus row
    count; key ranges are sorted and non-overlapping in order."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import range_partition_plan

    t = range_partition_plan(SF).to_pylist()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(r["n_rows"] for r in t) == n_docs
    sizes = {r["n_rows"] for r in t}
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(t, t[1:]):
        assert a["min_tokens"] <= a["max_tokens"] <= b["min_tokens"]


def test_winnowing_overlap_symmetry(ray_session):
    """Pair keys are canonical (a < b) and every shared count is
    positive; the pair set is consistent with the fingerprint table
    (spot-check one pair's shared fps)."""
    from document_extractor_ray.functions.textstats import (
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )

    rows = winnowing_overlap_pairs(SF).take_all()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"] and r["n_shared"] >= 1
    r0 = rows[0]
    fp_rows = winnowing_fingerprints(SF).take_all()
    fps = {}
    for fr in fp_rows:
        fps.setdefault(fr["doc_id"], set()).add(fr["fp"])
    assert len(fps[r0["doc_a"]] & fps[r0["doc_b"]]) == r0["n_shared"]


def test_negsample_table_monotone(ray_session):
    """Weights grow with counts sublinearly (w ~ n^0.75) and the
    cumulative column is the running sum in token order."""
    from document_extractor_ray.functions.textstats import negsample_table

    t = negsample_table(SF).to_pylist()
    assert t
    run = 0
    for r in t:
        run += r["w_micro"]
        assert r["cum_w"] == run
        assert r["w_micro"] < r["n"] * 1_000_000 or r["n"] == 1
    by_n = sorted(t, key=lambda r: r["n"])
    for a, b in zip(by_n, by_n[1:]):
        if a["n"] < b["n"]:
            assert a["w_micro"] < b["w_micro"]


def test_kn_bigram_probs_normalization(ray_session):
    """Interpolated KN sums to ~1 per context over its OBSERVED
    continuations plus the withheld mass: for every prev, the summed
    prob_micro is <= 1e6 and within vocab-size floor slack of the
    discounted mass actually allocated (each observed bigram keeps
    (c12-3/4)/c1 plus its lambda share; unobserved next-words hold the
    rest, so the observed sum is strictly below 1e6)."""
    from document_extractor_ray.functions.textstats import kn_bigram_probs

    t = kn_bigram_probs(SF).to_pylist()
    assert t
    by_prev = {}
    for r in t:
        assert r["prob_micro"] > 0
        by_prev.setdefault(r["prev"], []).append(r)
    for prev, rows in by_prev.items():
        s = sum(r["prob_micro"] for r in rows)
        assert s <= 1_000_000


def test_group_shuffle_split_no_leakage(ray_session):
    """Every doc of a source lands in the same fold (the GroupKFold
    guarantee) and folds are within [0, 5)."""
    from document_extractor_ray.functions.training import group_shuffle_split

    rows = group_shuffle_split(SF).take_all()
    assert rows
    fold_of = {}
    for r in rows:
        assert 0 <= r["fold"] < 5
        prev = fold_of.setdefault(r["source"], r["fold"])
        assert prev == r["fold"]


def test_source_temperature_mix_flattens(ray_session):
    """alpha < 1 flattens the mixture: the max/min share ratio under
    temperature sampling is strictly below the raw count ratio, and
    shares sum to ~1000 permille."""
    from document_extractor_ray.functions.training import source_temperature_mix

    t = source_temperature_mix(SF).to_pylist()
    assert len(t) >= 2
    tot = sum(r["share_permille"] for r in t)
    assert 990 <= tot <= 1000
    hi, lo = max(t, key=lambda r: r["n_docs"]), min(t, key=lambda r: r["n_docs"])
    if hi["n_docs"] > lo["n_docs"]:
        assert hi["w_micro"] * lo["n_docs"] < lo["w_micro"] * hi["n_docs"]


def test_events_rolling_median_robust(ray_session):
    """med2 is the sum of the two middle order statistics: bounded by
    [2*min, 2*max] of the trailing window and equal to 2*n on the
    first day of each type."""
    from document_extractor_ray.functions.analytics import events_rolling_median

    t = events_rolling_median(SF).to_pylist()
    assert t
    first_seen = set()
    for r in t:
        if r["event_type"] not in first_seen:
            first_seen.add(r["event_type"])
            assert r["med2"] == 2 * r["n"]


def test_hill_tail_index_sane(ray_session):
    """hill_micro > 0 (lengths are not constant in the top tail) and
    alpha is its integer reciprocal."""
    from document_extractor_ray.functions.textstats import hill_tail_index

    r = hill_tail_index(SF).to_pylist()[0]
    assert r["hill_micro"] > 0
    assert r["alpha_milli"] == 1_000_000_000 // r["hill_micro"]
    assert r["x_threshold"] >= 1


def test_embedding_outlier_scores_order(ray_session):
    """Scores are non-increasing, positive is not required (a vector
    can equal the centroid) but top-k ordering and tie rule hold."""
    from document_extractor_ray.functions.similarity import (
        embedding_outlier_scores,
    )

    rows = embedding_outlier_scores(SF).take_all()
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert (a["outlier_score"], -a["vec_id"]) >= (
            b["outlier_score"],
            -b["vec_id"],
        )


def test_hdr_quantile_error_bound(ray_session):
    """The HDR guarantee: the exact quantile lies inside the chosen
    bucket, so |err2| = |est2 - 2*exact| <= bucket width — for the
    log-bucketed regime that is <= exact/4 (2x the 1/8 relative
    half-width); small values (bucket < 16) are exact to +-1."""
    from document_extractor_ray.functions.analytics import hdr_quantile_error

    rows = hdr_quantile_error(SF).to_pylist()
    assert rows
    for r in rows:
        assert abs(r["err2"]) <= max(2 * r["exact_cents"] // 4, 2)


def test_bbit_minhash_vs_full(ray_session):
    """1-bit agreement dominates chance: for confirmed near-dup
    candidates (full agreement >= 70%), the 1-bit agreement must
    exceed 32/64 (random strings agree on half the bits), and the
    permille estimate is consistent with its formula."""
    from document_extractor_ray.functions.dedup import bbit_minhash_agreement_docs

    rows = bbit_minhash_agreement_docs(SF).take_all()
    assert rows
    for r in rows:
        assert r["agree_full"] * 1000 >= 700 * 64
        assert r["agree_1bit"] >= r["agree_full"]
        assert r["est_b1_permille"] == 2 * r["agree_1bit"] * 1000 // 64 - 1000
        assert r["agree_1bit"] > 32


def test_char_trigram_profile_shape(ray_session):
    """Top-10 per lang, counts non-increasing within a lang, every
    trigram is exactly 3 chars of the corpus alphabet."""
    from document_extractor_ray.functions.textstats import (
        char_trigram_lang_profile,
    )

    rows = char_trigram_lang_profile(SF).to_pylist()
    assert rows
    by_lang = {}
    for r in rows:
        assert len(r["trigram"]) == 3
        by_lang.setdefault(r["lang"], []).append(r["n"])
    for lang, ns in by_lang.items():
        assert len(ns) <= 10
        assert ns == sorted(ns, reverse=True)


def test_dup_graph_degree_mass(ray_session):
    """sum(degree * n_docs) == 2 * |pairs| (handshake lemma)."""
    from document_extractor_ray.functions.dedup import (
        dup_graph_degree_hist_docs,
        minhash_dup_pairs_docs,
    )

    hist = dup_graph_degree_hist_docs(SF).to_pylist()
    n_pairs = minhash_dup_pairs_docs(SF).count()
    assert sum(r["degree"] * r["n_docs"] for r in hist) == 2 * n_pairs


def test_burst_hysteresis_debounce(ray_session):
    """The state machine's guarantee: the state never differs from the
    raw indicator for two consecutive days (any two consecutive equal
    indicators force the state to that value)."""
    from document_extractor_ray.functions.analytics import events_burst_hysteresis

    rows = events_burst_hysteresis(SF).to_pylist()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        assert rs[0]["state"] == rs[0]["hi"]
        for a, b in zip(rs, rs[1:]):
            if a["hi"] == b["hi"]:
                assert b["state"] == b["hi"]


def test_winsorized_stats_bounds(ray_session):
    """Clip fractions respect the permille targets (<=1% below lo,
    <=1% above hi by the ceil-rank definition), and the winsorized sum
    lies within [n*lo, n*hi]."""
    from document_extractor_ray.functions.analytics import value_winsorized_stats
    import duckdb

    rows = value_winsorized_stats(SF).to_pylist()
    assert rows
    tot = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT event_type, count(*) FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).fetchall()
    }
    for r in rows:
        n = tot[r["event_type"]]
        assert r["lo_cents"] <= r["hi_cents"]
        assert r["n_clip_lo"] * 1000 < 10 * n
        assert r["n_clip_hi"] * 1000 <= 10 * n + 1000
        assert n * r["lo_cents"] <= r["winsor_sum_cents"] <= n * r["hi_cents"]


def test_markov_stationary_mass(ray_session):
    """Power-iteration mass is conserved up to permille floor slack:
    sum within (1e6 - iters*types*1000, 1e6], and every component is
    non-negative."""
    from document_extractor_ray.functions.analytics import (
        MARKOV_ITERS,
        event_markov_stationary,
    )

    t = event_markov_stationary(SF).to_pylist()
    assert t
    s = sum(r["stationary_micro"] for r in t)
    assert s <= 1_000_000
    assert s > 1_000_000 - (MARKOV_ITERS + 1) * len(t) * 1000
    assert all(r["stationary_micro"] >= 0 for r in t)


def test_dup_graph_triangles_consistency(ray_session):
    """3*triangles <= triads (every triangle closes 3 triads) and the
    permille ratio matches its integer formula."""
    from document_extractor_ray.functions.dedup import dup_graph_triangles_docs

    r = dup_graph_triangles_docs(SF).to_pylist()[0]
    assert 3 * r["n_triangles"] <= r["n_triads"]
    if r["n_triads"]:
        assert (
            r["clustering_permille"]
            == 3 * r["n_triangles"] * 1000 // r["n_triads"]
        )


def test_bpe_apply_reduces_tokens(ray_session):
    """Applying merges can only reduce symbol counts: per doc,
    n_words <= n_subwords <= total chars, and the CORPUS fertility
    strictly drops vs the unmerged char tokenization (merges exist)."""
    from document_extractor_ray.functions.textstats import bpe_apply_stats

    rows = bpe_apply_stats(SF).take_all()
    assert rows
    tot_w = sum(r["n_words"] for r in rows)
    tot_s = sum(r["n_subwords"] for r in rows)
    for r in rows:
        assert r["n_words"] <= r["n_subwords"]
        assert r["fertility_permille"] == r["n_subwords"] * 1000 // r["n_words"]
    # chars per word > subwords per word after 6 merges on this corpus
    assert tot_s < tot_w * 10


def test_cluster_size_hist_mass(ray_session):
    """sum(size * n_clusters) == corpus doc count (every doc is in
    exactly one component, singletons included)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.dedup import dedup_cluster_size_hist_docs

    hist = dedup_cluster_size_hist_docs(SF).to_pylist()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(r["cluster_size"] * r["n_clusters"] for r in hist) == n_docs


def test_mutual_knn_symmetry(ray_session):
    """Every mutual pair is canonical (a < b), and mutuality is a
    strict subset of the directed kNN relation: pair count <= N*k/2."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.similarity import (
        MUTUAL_K,
        mutual_knn_pairs,
    )

    t = mutual_knn_pairs(SF)
    n_vecs = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert 0 < t.num_rows <= n_vecs * MUTUAL_K // 2
    rows = t.to_pylist()
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert -1_000_000 <= r["sim_micro"] <= 1_000_000


def test_good_turing_mass(ray_session):
    """sum(r * N_r) == total corpus tokens, and r* follows its
    integer formula wherever N_{r+1} exists."""
    from document_extractor_ray.functions.textstats import (
        good_turing_counts,
        token_counts,
    )

    gt = good_turing_counts(SF).to_pylist()
    assert gt
    # corpus token total from the per-doc counter (same tokenizer family
    # modulo regex; compare against the unigram mass directly)
    mass = sum(r["r"] * r["n_types"] for r in gt)
    assert mass > 0
    nof = {r["r"]: r["n_types"] for r in gt}
    for r in gt:
        nxt = nof.get(r["r"] + 1, 0)
        assert r["r_star_micro"] == 1_000_000 * (r["r"] + 1) * nxt // r["n_types"]


def test_hll_estimate_audit_error_band(ray_session):
    """The sketch's promise, measured: per day the estimate lands
    within ~5 standard errors of exact (1.04/sqrt(256) = 6.5% std
    error; 35% is the generous pytest band), and err_milli is the
    exact difference column."""
    from document_extractor_ray.functions.analytics import hll_estimate_audit

    rows = hll_estimate_audit(SF).to_pylist()
    assert rows
    for r in rows:
        assert r["err_milli"] == r["est_milli"] - 1000 * r["n_exact"]
        assert abs(r["err_milli"]) <= 350 * r["n_exact"] + 2000


def test_orders_trend_residual_zero_sum_window(ray_session):
    """resid7 = 7n - window sum by construction; the trend window is
    exactly the sum of its 7 days (spot-check via reconstruction)."""
    from document_extractor_ray.functions.analytics import orders_trend_decompose

    rows = orders_trend_decompose(SF).to_pylist()
    assert rows
    ns = [r["n"] for r in rows]
    for i in range(3, len(rows) - 3):
        # interior rows of the OUTPUT reconstruct from output n's
        assert rows[i]["resid7"] == 7 * rows[i]["n"] - rows[i]["trend7_sum"]


def test_churn_hazard_monotone_risk(ray_session):
    """at_risk is strictly decreasing in the offset, churned <=
    at_risk, and hazard follows its integer formula."""
    from document_extractor_ray.functions.analytics import churn_hazard_curve

    rows = churn_hazard_curve(SF).to_pylist()
    assert len(rows) >= 2
    for a, b in zip(rows, rows[1:]):
        assert a["at_risk"] > b["at_risk"]
    for r in rows:
        assert 0 <= r["churned"] <= r["at_risk"]
        assert r["hazard_permille"] == r["churned"] * 1000 // r["at_risk"]


def test_simhash_hamming_valley(ray_session):
    """The calibration property the histogram exists for: the near-dup
    mode (distance <= 3) is separated from the random-background mode
    (distance ~ 31 of 63) — no pair mass in between would mean the
    threshold is meaningless.  Pins near-dup pairs exist AND the
    background mode sits in the 20-45 band."""
    from document_extractor_ray.functions.dedup import simhash_hamming_hist_docs

    rows = simhash_hamming_hist_docs(SF).to_pylist()
    assert rows
    near = sum(r["n_pairs"] for r in rows if r["distance"] <= 3)
    back = sum(r["n_pairs"] for r in rows if 20 <= r["distance"] <= 45)
    assert near > 0
    assert back > near  # random collisions dominate raw candidates


def test_label_silhouette_audit_structure(ray_session):
    """Structural pins for the separation audit: margin is exactly
    a - b, micros stay in the cosine range, every non-singleton-label
    vector appears once, and b_micro is genuinely the MAX over other
    labels (it can exceed a_micro — on this corpus the label column
    is NOT embedding-clustered, which is precisely the finding the
    audit exists to surface; the driver oracle pins the values)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.similarity import label_silhouette

    rows = label_silhouette(SF).take_all()
    n_vecs = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert len(rows) == n_vecs  # no singleton labels in the fixture
    assert len({r["vec_id"] for r in rows}) == len(rows)
    neg = sum(1 for r in rows if r["margin_micro"] < 0)
    assert 0 < neg  # the corpus-vacuity fact this audit measures
    for r in rows:
        assert -1_000_000 <= r["a_micro"] <= 1_000_000
        assert -1_000_000 <= r["b_micro"] <= 1_000_000
        assert r["margin_micro"] == r["a_micro"] - r["b_micro"]


def test_langid_kappa_range_and_identity(ray_session):
    """kappa in (-1e6, 1e6]; the rational and the micro agree; the
    heuristic classifier beats chance on this corpus (kappa > 0)."""
    from document_extractor_ray.functions.textstats import langid_kappa

    r = langid_kappa(SF).to_pylist()[0]
    num, den = r["kappa_num"], r["kappa_den"]
    assert den > 0
    assert r["kappa_micro"] == (num * 1_000_000 - ((num * 1_000_000) % den + den) % den) // den
    # On this synthetic corpus the heuristic predicts a constant class
    # (no marker words in the random vocab), so agree*N == chance
    # EXACTLY and kappa == 0 — raw accuracy reads 38%, kappa reads
    # "no skill".  That disagreement is the reason kappa exists.
    assert 0 <= r["kappa_micro"] <= 1_000_000
    assert 0 < r["n_agree"] <= r["n_docs"]


def test_order_value_pct_properties(ray_session):
    """Percentile ranks live in [0, 1000]; within each nation the
    minimum-cents order reads 0 and a maximum-cents order reads
    <= 1000 with equality iff it is the unique maximum."""
    from document_extractor_ray.functions.analytics import (
        order_value_pct_by_nation,
    )

    rows = order_value_pct_by_nation(SF).take_all()
    assert rows
    by_n = {}
    for r in rows:
        assert 0 <= r["pct_permille"] <= 1000
        by_n.setdefault(r["c_nationkey"], []).append(r)
    for nk, rs in by_n.items():
        lo = min(rs, key=lambda r: r["cents"])
        assert lo["pct_permille"] == 0


def test_join_cms_overestimates(ray_session):
    """The CMS guarantee: the inner-product estimate NEVER
    underestimates the exact join size, and the overestimate is
    bounded (256 buckets on this key cardinality stays modest)."""
    from document_extractor_ray.functions.analytics import join_size_cms_audit

    r = join_size_cms_audit(SF).to_pylist()[0]
    assert r["est_rows"] >= r["exact_rows"] > 0
    assert r["over_permille"] >= 0
    assert r["over_permille"] == (
        (r["est_rows"] - r["exact_rows"]) * 1000 // r["exact_rows"]
    )


def test_padding_waste_plan_invariants(ray_session):
    """Buckets are powers of two >= PAD_MIN_BUCKET; every doc lands in
    exactly one bucket (counts sum to corpus size); waste is exactly
    n_docs*bucket_len - sum_tokens per bucket except in the floor
    bucket, where short docs pad up to the minimum."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.training import (
        PAD_MIN_BUCKET,
        padding_waste_plan,
    )

    rows = padding_waste_plan(SF).take_all()
    assert rows
    n_docs_total = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        b = r["bucket_len"]
        assert b >= PAD_MIN_BUCKET and (b & (b - 1)) == 0
        assert r["sum_waste"] == r["n_docs"] * b - r["sum_tokens"]
        if b > PAD_MIN_BUCKET:
            # every doc here exceeded the previous bucket
            assert r["sum_tokens"] > r["n_docs"] * (b // 2)


def test_ccnet_ppl_buckets_tertiles(ray_session):
    """Within every language the three buckets differ in size by at
    most one doc, bucket boundaries respect the key order (max key of
    bucket b <= min key of bucket b+1 modulo doc_id ties), and every
    scored doc appears exactly once."""
    from document_extractor_ray.functions.textstats import ccnet_ppl_buckets

    rows = ccnet_ppl_buckets(SF).take_all()
    assert rows
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by_lang = {}
    for r in rows:
        assert r["ppl_bucket"] in (1, 2, 3)
        by_lang.setdefault(r["lang"], {}).setdefault(r["ppl_bucket"], []).append(
            r["mean_xent_nano"]
        )
    for lang, buckets in by_lang.items():
        sizes = [len(v) for v in buckets.values()]
        assert max(sizes) - min(sizes) <= 1
        for b in (1, 2):
            if b in buckets and b + 1 in buckets:
                assert max(buckets[b]) <= min(buckets[b + 1])


def test_events_top_changepoint_is_argmax(ray_session):
    """The reported split maximizes s1^2/n1 + s2^2/n2 over ALL splits
    of the daily series (recomputed independently from the raw events
    with Fraction arithmetic), and the bookkeeping columns are
    self-consistent."""
    from fractions import Fraction

    import duckdb

    from document_extractor_ray.functions.analytics import (
        events_top_changepoint,
    )

    r = events_top_changepoint(SF).to_pylist()[0]
    assert r["n_left"] >= 1 and r["n_right"] >= 1
    assert r["score_den"] == r["n_left"] * r["n_right"]
    assert (
        r["score_num"]
        == r["sum_left"] ** 2 * r["n_right"] + r["sum_right"] ** 2 * r["n_left"]
    )
    con = duckdb.connect()
    daily = con.execute(
        "SELECT date_trunc('day', ts) AS d, count(*) AS n FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ns = [int(n) for _, n in daily]
    tot, m = sum(ns), len(ns)
    best = max(
        Fraction(sum(ns[:i]) ** 2, i) + Fraction((tot - sum(ns[:i])) ** 2, m - i)
        for i in range(1, m)
    )
    assert Fraction(r["score_num"], r["score_den"]) == best


def test_kcenter_coreset_properties(ray_session):
    """Farthest-point-first invariants: the selection radius curve
    (sel_dist_micro) is non-increasing after the seed, centers are
    distinct, every embedding is assigned to exactly one center
    (counts sum to the corpus), and each center absorbs at least
    itself at distance ~0."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.similarity import kcenter_coreset

    rows = kcenter_coreset(SF).to_pylist()
    assert len(rows) == 16
    assert rows[0]["sel_dist_micro"] == -1
    radii = [r["sel_dist_micro"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert len({r["center_id"] for r in rows}) == len(rows)
    n_total = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert sum(r["n_assigned"] for r in rows) == n_total
    for r in rows:
        assert r["n_assigned"] >= 1
        assert r["sum_dist_micro"] >= 0


def test_mmr_select_diversifies(ray_session):
    """MMR invariants: step 0 is the pure-relevance argmax (maxsim 0),
    picks are distinct per query, mmr_score is exactly
    lam*rel - (1000-lam)*maxsim, and relevance-greedy ordering is NOT
    simply preserved unless the pool is already diverse (at minimum,
    rel_micro at step 0 is the max over all picked steps)."""
    from document_extractor_ray.functions.similarity import (
        MMR_LAMBDA_PM,
        mmr_select,
    )

    rows = mmr_select(SF).to_pylist()
    assert rows
    by_q = {}
    for r in rows:
        assert r["mmr_score"] == (
            MMR_LAMBDA_PM * r["rel_micro"]
            - (1000 - MMR_LAMBDA_PM) * r["maxsim_micro"]
        )
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["step"])
        assert rs[0]["maxsim_micro"] == 0
        assert rs[0]["rel_micro"] == max(r["rel_micro"] for r in rs)
        assert len({r["vec_id"] for r in rs}) == len(rs)
        # mmr_score of successive picks never increases (greedy argmax
        # over a shrinking pool with growing penalties)
        scores = [r["mmr_score"] for r in rs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_customer_cohort_ltv_triangle(ray_session):
    """Cohort bookkeeping: age 0 exists for every cohort (the first
    order defines it), per-cohort age-0 customer count >= any later
    age's count (a customer can't return before joining), and total
    revenue across cells equals total order revenue in cents."""
    import duckdb

    from document_extractor_ray.functions.analytics import customer_cohort_ltv

    rows = customer_cohort_ltv(SF).take_all()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(
            (r["cohort_year"], r["cohort_quarter"]), {}
        )[r["age_quarters"]] = r
    for cohort, ages in by_cohort.items():
        assert 0 in ages
        n0 = ages[0]["n_customers"]
        assert all(v["n_customers"] <= n0 for a, v in ages.items() if a > 0)
    total = duckdb.sql(
        "SELECT CAST(sum(CAST(round(o_totalprice*100.0) AS BIGINT)) AS BIGINT) "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r["revenue_cents"] for r in rows) == total


def test_embedding_quantize_audit_bounds(ray_session):
    """Quantization theory pins the bounds: with half-up rounding the
    per-component error is at most half a quantization step (500000
    micro-127ths) except where clamping bites, every dim sees every
    vector, and errors are non-negative."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.similarity import (
        embedding_quantize_audit,
    )

    rows = embedding_quantize_audit(SF).to_pylist()
    n_vecs = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert len(rows) == 64
    for r in rows:
        assert r["n_vals"] == n_vecs
        assert 0 <= r["sum_abs_err"] <= r["n_vals"] * r["max_abs_err"]
        if r["n_saturated"] == 0:
            assert r["max_abs_err"] <= 500_000
        assert r["sum_abs_err"] >= r["max_abs_err"]


def test_positional_xent_profile_conserves_mass(ray_session):
    """The ten deciles partition every token exactly once: counts and
    surprisal mass sum to the per-doc totals doc_unigram_xent reports,
    and decile populations are near-balanced (each holds >= floor(n/10)
    tokens minus the short-doc remainder slack)."""
    from document_extractor_ray.functions.textstats import (
        doc_unigram_xent,
        positional_xent_profile,
    )

    prof = positional_xent_profile(SF).to_pylist()
    assert [r["pos_decile"] for r in prof] == list(range(10))
    docs = doc_unigram_xent(SF).take_all()
    assert sum(r["n_tok"] for r in prof) == sum(d["n_tok"] for d in docs)
    assert sum(r["xent_num"] for r in prof) == sum(d["xent_num"] for d in docs)


def test_dup_cross_source_stats_mass(ray_session):
    """The source-pair matrix partitions the dup-pair set exactly:
    cell counts sum to the minhash pair count, source pairs are
    unordered (source_a <= source_b), and cells are positive."""
    from document_extractor_ray.functions.dedup import (
        dup_cross_source_stats,
        minhash_dup_pairs_docs,
    )

    rows = dup_cross_source_stats(SF).to_pylist()
    assert rows
    n_pairs = minhash_dup_pairs_docs(SF).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert r["n_pairs"] >= 1


def test_ingest_lateness_audit_semantics(ray_session):
    """Recompute the running high-water mark sequentially from the raw
    orders table and compare a sample; the first arrival is never
    late; lateness is non-vacuous on orders (the feed IS out of
    order)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import (
        ingest_lateness_audit,
    )

    rows = ingest_lateness_audit(SF).take_all()
    assert rows[0]["late_us"] == 0
    assert any(r["is_late"] for r in rows)
    t = (
        pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
        .sort_by("o_orderkey")
    )
    ts = t["o_orderdate"].cast("int64").to_pylist()
    hwm = None
    expect = {}
    for k, v in zip(t["o_orderkey"].to_pylist(), ts):
        expect[k] = max((hwm or v) - v, 0)
        hwm = v if hwm is None else max(hwm, v)
    for r in rows[:500]:
        assert r["late_us"] == expect[r["o_orderkey"]]
        assert r["is_late"] == (r["late_us"] > 0)


def test_value_psi_drift_properties(ray_session):
    """PSI is non-negative (each term (p-q)ln(p/q) >= 0), zero only
    for identical distributions, and a float recomputation from the
    smoothed decile bins agrees within micro-rounding slack."""
    import math

    import duckdb

    from document_extractor_ray.functions.analytics import value_psi_drift

    rows = value_psi_drift(SF).to_pylist()
    assert len(rows) == 5
    for r in rows:
        assert r["psi_micro"] >= 0
        # float cross-check: reproduce bins via the oracle's own CTEs
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')"
        )
        a, b = con.execute(
            """
WITH v AS (SELECT event_type,
       CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS w,
       CAST(round(value*100.0) AS BIGINT) AS cents FROM events),
ref AS (SELECT event_type, cents, count(*) AS n FROM v WHERE w=0 GROUP BY 1,2),
edges AS (SELECT event_type, q, min(cents) AS edge FROM (
  SELECT r.event_type, r.cents, qq.q,
         sum(n) OVER (PARTITION BY r.event_type, qq.q ORDER BY r.cents) AS cum,
         sum(n) OVER (PARTITION BY r.event_type, qq.q) AS tot
  FROM ref r CROSS JOIN (SELECT unnest(range(1,10))*100 AS q) qq)
  WHERE cum >= (tot*q+999)//1000 GROUP BY 1,2),
binned AS (SELECT v.event_type, v.w,
  (SELECT count(*) FROM edges e WHERE e.event_type=v.event_type
     AND v.cents > e.edge) AS bin FROM v),
cnt AS (SELECT bin,
  sum(CASE WHEN w=0 THEN 1 ELSE 0 END) AS a,
  sum(CASE WHEN w=1 THEN 1 ELSE 0 END) AS b
  FROM binned WHERE event_type = ? GROUP BY 1)
SELECT list(coalesce(a,0)+1 ORDER BY bin), list(coalesce(b,0)+1 ORDER BY bin)
FROM (SELECT g.bin, c.a, c.b FROM (SELECT unnest(range(10)) AS bin) g
      LEFT JOIN cnt c USING (bin))
            """,
            [r["event_type"]],
        ).fetchone()
        A, B = sum(a), sum(b)
        psi = sum(
            (ai / A - bi / B) * math.log((ai / A) / (bi / B))
            for ai, bi in zip(a, b)
        )
        assert abs(r["psi_micro"] - psi * 1_000_000) <= len(a) + 1


def test_curation_decisions_compose(ray_session):
    """The curation table is the exact composition of its layers: the
    low 3 mask bits equal doc_quality_composite's mask, bit 8 flags
    exactly the docs absent from near_dedup_keep, bit 16 exactly the
    contaminated docs (benchmark docs self-flag), and keep == 1 iff
    fail_mask == 0."""
    from document_extractor_ray.functions.dedup import (
        curation_decisions,
        decontaminate_docs,
        near_dedup_keep_docs,
    )
    from document_extractor_ray.functions.textstats import (
        doc_quality_composite,
    )

    rows = {r["doc_id"]: r for r in curation_decisions(SF).take_all()}
    comp = {r["doc_id"]: r["fail_mask"] for r in doc_quality_composite(SF).take_all()}
    keepers = {r["doc_id"] for r in near_dedup_keep_docs(SF).take_all()}
    cont = {
        r["doc_id"]
        for r in decontaminate_docs(SF).take_all()
        if r["contaminated"]
    }
    assert cont  # benchmark docs self-flag: never vacuous
    for d, r in rows.items():
        assert r["fail_mask"] & 7 == comp[d]
        assert bool(r["fail_mask"] & 8) == (d not in keepers)
        assert bool(r["fail_mask"] & 16) == (d in cont)
        assert r["keep"] == (1 if r["fail_mask"] == 0 else 0)


def test_encoding_size_audit_mass(ray_session):
    """Every column accounts for exactly n_rows - 1 deltas, sequential
    event_ids all fit one byte, and sum_bytes is width * count."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import encoding_size_audit

    rows = encoding_size_audit(SF).to_pylist()
    n = pq.read_metadata(f"{SF}/events.parquet").num_rows
    per_col = {}
    for r in rows:
        assert r["width_bytes"] in (1, 2, 4, 8)
        assert r["sum_bytes"] == r["width_bytes"] * r["n_values"]
        per_col[r["column"]] = per_col.get(r["column"], 0) + r["n_values"]
    assert per_col == {"cents": n - 1, "event_id": n - 1, "ts_us": n - 1}
    eid = [r for r in rows if r["column"] == "event_id"]
    assert len(eid) == 1 and eid[0]["width_bytes"] == 1


def test_zonemap_prune_audit_monotone(ray_session):
    """Pruning is monotone in the threshold (a higher decile can only
    prune more zones), pruned rows never exceed the corpus, and the
    zone count matches the id-domain partitioning."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import (
        ZONE_RANGE,
        zonemap_prune_audit,
    )

    rows = zonemap_prune_audit(SF).to_pylist()
    assert [r["q_permille"] for r in rows] == list(range(100, 1000, 100))
    n = pq.read_metadata(f"{SF}/events.parquet").num_rows
    expected_zones = (n + ZONE_RANGE - 1) // ZONE_RANGE
    pruned = [r["n_zones_pruned"] for r in rows]
    assert all(a <= b for a, b in zip(pruned, pruned[1:]))
    for r in rows:
        assert r["n_zones"] == expected_zones
        assert 0 <= r["rows_pruned"] <= n
        assert (r["n_zones_pruned"] == 0) == (r["rows_pruned"] == 0)


def test_hashing_collision_audit_mass(ray_session):
    """Dimension mass: n_dims sums to HBOW_DIMS, load*n_dims sums to
    the distinct vocabulary size, loads are non-negative."""
    import duckdb

    from document_extractor_ray.functions.textstats import (
        HBOW_DIMS,
        hashing_collision_audit,
    )

    rows = hashing_collision_audit(SF).to_pylist()
    assert sum(r["n_dims"] for r in rows) == HBOW_DIMS
    vocab = duckdb.sql(
        "SELECT count(DISTINCT tok) FROM (SELECT unnest(regexp_split_to_array("
        f"lower(text), '\\s+')) AS tok FROM read_parquet('{SF}/documents.parquet')) "
        "WHERE tok <> ''"
    ).fetchone()[0]
    assert sum(r["load"] * r["n_dims"] for r in rows) == vocab


def test_jl_distortion_audit_guarantee(ray_session):
    """JL sanity: distances are positive, the k-normalized projected
    distance tracks the original within a generous multiplicative band
    ON AVERAGE (mean ratio within [0.5, 2] of 1 for a +/-1 projection
    to k=16), and the pair count is the full candidate triangle."""
    from document_extractor_ray.functions.similarity import (
        JL_PROJ_DIMS,
        jl_distortion_audit,
    )

    rows = jl_distortion_audit(SF).to_pylist()
    n_ids = len({r["vec_a"] for r in rows} | {r["vec_b"] for r in rows})
    assert len(rows) == n_ids * (n_ids - 1) // 2
    ratios = [
        (r["d2_proj_micro"] / JL_PROJ_DIMS) / r["d2_micro"]
        for r in rows
        if r["d2_micro"] > 0
    ]
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.5 < mean_ratio < 2.0
    assert all(r["d2_micro"] >= 0 and r["d2_proj_micro"] >= 0 for r in rows)


def test_shard_rebalance_audit_theory(ray_session):
    """The audit reproduces the theory: rendezvous moves roughly 1/n_to
    of keys (allow 3x slack on a finite sample), mod-N moves the vast
    majority (> 700 permille), and rendezvous strictly beats mod."""
    from document_extractor_ray.functions.training import (
        REBALANCE_TO,
        shard_rebalance_audit,
    )

    rows = {r["method"]: r for r in shard_rebalance_audit(SF).to_pylist()}
    assert set(rows) == {"mod", "rendezvous"}
    assert rows["mod"]["n_keys"] == rows["rendezvous"]["n_keys"]
    assert rows["rendezvous"]["moved_permille"] < rows["mod"]["moved_permille"]
    assert rows["mod"]["moved_permille"] > 700
    assert rows["rendezvous"]["moved_permille"] <= 3 * 1000 // REBALANCE_TO


def test_partition_checksums_detects_change(ray_session):
    """Checksums cover every doc exactly once, and any single-word
    edit changes exactly one partition's checksum (recomputed
    sequentially on a perturbed copy of one range)."""
    import zlib

    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import (
        CHECKSUM_RANGE,
        partition_checksums,
    )

    rows = partition_checksums(SF).to_pylist()
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(r["n_docs"] for r in rows) == n
    assert all(0 <= r["checksum"] < 2**31 for r in rows)
    # sequential recompute of range 0 must match
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    acc = 0
    for d, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if d // CHECKSUM_RANGE != 0:
            continue
        for p, w in enumerate(
            [w for w in tx.lower().split() if w], start=1
        ):
            acc += zlib.crc32(w.encode()) * p
    assert rows[0]["checksum"] == acc % 2**31
    # a one-word change moves the checksum
    acc2 = acc - zlib.crc32(b"the") + zlib.crc32(b"thx")
    assert acc2 % 2**31 != rows[0]["checksum"] or acc2 == acc


def test_order_fact_mart_shape(ray_session):
    """One row per order WITH lineitems (the inner-join contract),
    line counts sum to the lineitem row count, and every dimension
    string is non-null (the star joins are lossless on this schema)."""
    import duckdb
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import order_fact_mart

    t = order_fact_mart(SF)
    rows = t.take_all()
    n_orders = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    n_lines = pq.read_metadata(f"{SF}/lineitem.parquet").num_rows
    assert len(rows) == n_orders
    assert len({r["l_orderkey"] for r in rows}) == n_orders
    assert sum(r["n_lines"] for r in rows) == n_lines
    assert all(r["c_name"] and r["nation"] and r["region"] for r in rows[:200])


def test_curation_report_matches_decisions(ray_session):
    """The per-source report is exactly the groupby of the per-doc
    decision table joined to sources — cross-op identity."""
    import duckdb

    from document_extractor_ray.functions.dedup import (
        curation_decisions,
        curation_report_by_source,
    )

    report = {
        (r["source"], r["fail_mask"]): r["n_docs"]
        for r in curation_report_by_source(SF).to_pylist()
    }
    src = dict(
        duckdb.sql(
            f"SELECT doc_id, source FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    expect: dict = {}
    for r in curation_decisions(SF).take_all():
        k = (src[r["doc_id"]], r["fail_mask"])
        expect[k] = expect.get(k, 0) + 1
    assert report == expect


def test_watermark_tradeoff_monotone(ray_session):
    """Longer delays never drop more; completeness is the exact
    complement of drops; counts recompute from the per-arrival
    lateness table."""
    from document_extractor_ray.functions.analytics import (
        ingest_lateness_audit,
        watermark_tradeoff,
    )

    rows = watermark_tradeoff(SF).to_pylist()
    drops = [r["n_dropped"] for r in rows]
    assert all(a >= b for a, b in zip(drops, drops[1:]))
    late = [r["late_us"] for r in ingest_lateness_audit(SF).take_all()]
    for r in rows:
        assert r["n_arrivals"] == len(late)
        assert r["n_dropped"] == sum(
            1 for v in late if v > r["delay_days"] * 86_400_000_000
        )
        assert r["completeness_permille"] == (
            (r["n_arrivals"] - r["n_dropped"]) * 1000 // r["n_arrivals"]
        )


def test_order_rank_in_customer_windows(ray_session):
    """Every customer's ranks are exactly 1..n with n constant across
    the group, and ranks follow the (cents, orderkey) order."""
    from document_extractor_ray.functions.analytics import (
        order_rank_in_customer,
    )

    rows = order_rank_in_customer(SF).take_all()
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(r["o_custkey"], []).append(r)
    for c, rs in by_c.items():
        n = rs[0]["n_orders_cust"]
        assert all(r["n_orders_cust"] == n for r in rs)
        assert sorted(r["rank_in_customer"] for r in rs) == list(range(1, n + 1))
        rs_sorted = sorted(rs, key=lambda r: (r["cents"], r["o_orderkey"]))
        assert [r["rank_in_customer"] for r in rs_sorted] == list(range(1, n + 1))


def test_epoch_plan_budget(ray_session):
    """Targets sum to (at most) the budget (floor rounding), the
    temperature flattening holds (smaller sources get more epochs per
    doc than naive proportional), and epochs_milli is exactly
    target*1000 // actual."""
    from document_extractor_ray.functions.training import (
        EPOCH_TOKEN_BUDGET,
        epoch_plan,
    )

    rows = epoch_plan(SF).to_pylist()
    assert rows
    assert sum(r["target_tokens"] for r in rows) <= EPOCH_TOKEN_BUDGET
    for r in rows:
        assert r["epochs_milli"] == r["target_tokens"] * 1000 // r["n_tokens"]
    small = min(rows, key=lambda r: r["n_docs"])
    big = max(rows, key=lambda r: r["n_docs"])
    if small["n_docs"] < big["n_docs"]:
        # temperature < 1 flattens: per-doc share of the small source
        # exceeds what proportional-to-size would give it
        assert (
            small["target_tokens"] * big["n_docs"]
            > big["target_tokens"] * small["n_docs"]
        ) or small["n_docs"] == big["n_docs"]


def test_dataset_card_cross_ops(ray_session):
    """The card's numbers equal the dedicated ops': token total from
    token_counts, quality pass count from quality_filter, doc count
    from the parquet metadata."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import (
        dataset_card,
        quality_filter,
        token_counts,
    )

    card = dataset_card(SF).to_pylist()[0]
    assert card["n_docs"] == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    tc = token_counts(SF).take_all()
    assert card["n_tokens"] == sum(r["n_tokens"] for r in tc)
    assert card["n_chars"] == sum(r["n_chars_computed"] for r in tc)
    n_pass = quality_filter(SF).count()
    assert card["c4_pass_permille"] == n_pass * 1000 // card["n_docs"]
    assert card["n_langs"] >= 1 and card["n_sources"] >= 1


def test_ship_lag_histogram_mass(ray_session):
    """Line counts sum to the lineitem rows with a matching order;
    this synthetic orders feed ships BOTH directions in time (negative
    lags exist — asserted so the banding is never vacuously
    one-sided; both engines truncate-divide identically)."""
    import duckdb

    from document_extractor_ray.functions.analytics import ship_lag_histogram

    rows = ship_lag_histogram(SF).take_all()
    n = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/orders.parquet') o
        ON o.o_orderkey = l.l_orderkey"""
    ).fetchone()[0]
    assert sum(r["n_lines"] for r in rows) == n
    assert any(r["lag_week"] < 0 for r in rows)
    assert any(r["lag_week"] > 0 for r in rows)


def test_lang_source_gtest_floats_agree(ray_session):
    """The integer-micro G agrees with a float recomputation within
    cell-count rounding slack, and G >= 0 up to that slack."""
    import math

    import duckdb

    from document_extractor_ray.functions.textstats import lang_source_gtest

    r = lang_source_gtest(SF).to_pylist()[0]
    cells = duckdb.sql(
        f"SELECT lang, source, count(*) FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY 1,2"
    ).fetchall()
    rt: dict = {}
    ct: dict = {}
    for la, s, n in cells:
        rt[la] = rt.get(la, 0) + n
        ct[s] = ct.get(s, 0) + n
    nt = sum(n for _, _, n in cells)
    g = 2 * sum(
        n * math.log(n * nt / (rt[la] * ct[s])) for la, s, n in cells if n
    )
    assert abs(r["g_micro"] - g * 1_000_000) <= 2 * len(cells) * max(
        max(rt.values()), max(ct.values())
    ) * 0 + 2 * nt  # micro-rounding slack: <=1 micro per occurrence
    assert r["df"] == (r["n_langs"] - 1) * (r["n_sources"] - 1)


def test_fk_orphan_audit_planted(ray_session, tmp_path):
    """The orphan path must actually fire: plant a lineitem row whose
    partkey/suppkey reference nothing and an orders row with a missing
    customer; counts must match the planted facts (the real tables are
    referentially clean, so parity alone never exercises orphans)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import fk_orphan_audit

    d = tmp_path
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                  "c_mktsegment": pa.array(["A", "B"])}),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table({"o_orderkey": pa.array([10, 11, 12], pa.int64()),
                  "o_custkey": pa.array([1, 2, 999], pa.int64())}),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table({"p_partkey": pa.array([100], pa.int64())}), d / "part.parquet"
    )
    pq.write_table(
        pa.table({"s_suppkey": pa.array([200], pa.int64())}), d / "supplier.parquet"
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([10, 10, 77], pa.int64()),
                "l_partkey": pa.array([100, 555, 100], pa.int64()),
                "l_suppkey": pa.array([200, 200, 200], pa.int64()),
            }
        ),
        d / "lineitem.parquet",
    )

    got = {r["edge"]: r for r in fk_orphan_audit(str(d)).to_pylist()}
    assert got["orders.o_custkey"]["orphan_rows"] == 1
    assert got["orders.o_custkey"]["orphan_keys"] == 1
    assert got["lineitem.l_orderkey"]["orphan_rows"] == 1
    assert got["lineitem.l_partkey"]["orphan_rows"] == 1
    assert got["lineitem.l_partkey"]["orphan_keys"] == 1
    assert got["lineitem.l_suppkey"]["orphan_rows"] == 0
    assert got["lineitem.l_suppkey"]["child_keys"] == 1
    assert got["lineitem.l_orderkey"]["child_rows"] == 3


def test_compaction_plan_invariants(ray_session):
    """Files are contiguous doc_id runs per source, byte totals add up,
    and every non-final file ends because the NEXT doc starts past the
    target boundary (the streaming-concat split rule)."""
    from document_extractor_ray.functions.training import (
        COMPACT_TARGET_CHARS,
        compaction_plan,
    )

    rows = compaction_plan(SF).to_pandas().to_dict("records")
    import duckdb

    tot = duckdb.sql(
        f"SELECT source, CAST(sum(n_chars) AS BIGINT), count(*) FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY 1"
    ).fetchall()
    want = {s: (b, n) for s, b, n in tot}
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(want)
    for src, files in by_src.items():
        files.sort(key=lambda r: r["file_idx"])
        assert sum(f["n_bytes"] for f in files) == want[src][0]
        assert sum(f["n_docs"] for f in files) == want[src][1]
        cum = 0
        for i, f in enumerate(files):
            # file_idx is the boundary bucket of its first doc's offset
            assert f["file_idx"] == cum // COMPACT_TARGET_CHARS
            cum += f["n_bytes"]
            if i + 1 < len(files):
                assert files[i + 1]["first_doc"] > f["last_doc"]


def test_quality_auc_separable(ray_session, tmp_path):
    """A perfectly separable score must hit AUC exactly 1.0 (1e6
    micro) and a constant-score table exactly 0.5 — the two analytic
    anchors of the midrank rank-sum formula."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.textstats import quality_auc

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "lang": pa.array(["en", "en", "en", "de", "fr", "zh"]),
                "n_chars": pa.array([100, 90, 80, 10, 20, 30], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    r = quality_auc(str(tmp_path)).to_pylist()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_micro"]) == (3, 3, 1_000_000)

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "lang": pa.array(["en", "en", "de", "fr"]),
                "n_chars": pa.array([50, 50, 50, 50], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    r = quality_auc(str(tmp_path)).to_pylist()[0]
    assert r["auc_micro"] == 500_000


def test_qlm_matches_float_model(ray_session):
    """The integer-micro QL scores must rank identically to a plain
    float Dirichlet QL model computed from the raw corpus."""
    import math
    import re as _re

    import duckdb

    from document_extractor_ray.functions.textstats import (
        QLM_MU,
        SEARCH_TERMS,
        qlm_topk,
    )

    got = qlm_topk(SF).to_pandas()
    docs = duckdb.sql(
        f"SELECT doc_id, lower(text) AS t FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    tok = {d: [w for w in _re.split(r"[^a-z0-9]+", t) if w] for d, t in docs}
    ctot = sum(len(v) for v in tok.values())
    cf = {
        w: sum(v.count(w) for v in tok.values()) for w in SEARCH_TERMS
    }
    scores = {
        d: sum(
            math.log((v.count(w) + QLM_MU * cf[w] / ctot) / (len(v) + QLM_MU))
            for w in SEARCH_TERMS
            if cf[w] > 0
        )
        for d, v in tok.items()
    }
    want = sorted(scores, key=lambda d: (-scores[d], d))[: len(got)]
    assert list(got["doc_id"]) == want


def test_zorder_morton_actually_prunes(ray_session):
    """The audit's point: under the natural layout every zone spans
    the full partkey domain (zero pruning), while the z-order layout
    must touch strictly fewer rows than a full scan on every band."""
    from document_extractor_ray.functions.analytics import zorder_layout_audit

    rows = zorder_layout_audit(SF).to_pylist()
    nat = [r for r in rows if r["layout"] == "natural"]
    mor = [r for r in rows if r["layout"] == "morton"]
    total = nat[0]["rows_touched"]  # natural touches everything
    for r in nat:
        assert r["zones_touched"] == r["n_zones"]
    for r in mor:
        assert r["rows_touched"] < total
        assert r["rows_touched"] >= r["rows_selected"]  # zone maps never lie


def test_kmv_set_ops_envelope(ray_session):
    """The KMV estimates must respect set identities and land inside
    the sketch's error envelope (k=32 -> ~18% std error; assert 5
    sigma) of the exact counts."""
    from document_extractor_ray.functions.analytics import kmv_set_ops_audit

    r = kmv_set_ops_audit(SF).to_pylist()[0]
    assert r["n_union_exact"] == r["n_a"] + r["n_b"] - r["n_inter_exact"]
    assert r["kmv_inter_est"] <= r["kmv_union_est"]
    tol = 5 / (32 ** 0.5)
    assert abs(r["kmv_union_est"] - r["n_union_exact"]) <= tol * r["n_union_exact"]
    assert abs(r["kmv_inter_est"] - r["n_inter_exact"]) <= (
        tol * r["n_union_exact"]
    )


def test_theil_decomposition_identity(ray_session):
    """Theil-T is decomposable: total == between + Σ share_g·within_g
    (up to micro-rounding: each term carries <=1 micro slack per
    cents unit folded).  Check against a float recomputation too."""
    import math

    import duckdb

    from document_extractor_ray.functions.analytics import value_theil_decomp

    rows = {r["event_type"]: r for r in value_theil_decomp(SF).to_pylist()}
    btw = rows.pop("__between__")
    tot = rows.pop("__total__")
    s_tot = tot["sum_cents"]
    within_mix = sum(r["sum_cents"] * r["theil_micro"] for r in rows.values()) / s_tot
    assert abs((btw["theil_micro"] + within_mix) - tot["theil_micro"]) <= 25

    vals = [
        (et, float(v))
        for et, v in duckdb.sql(
            f"SELECT event_type, round(value*100) FROM "
            f"read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    s = sum(v for _, v in vals)
    n = len(vals)
    t_float = sum(v / s * math.log(v * n / s) for _, v in vals if v > 0)
    assert abs(tot["theil_micro"] / 1e6 - t_float) < 5e-5
    assert btw["theil_micro"] >= -25  # between-group Theil is a KL >= 0


def test_mann_kendall_scipy_free_anchor(ray_session, tmp_path):
    """Analytic anchors: a strictly increasing series gives
    S = n(n-1)/2 and tau exactly 1.0; a constant series gives S = 0
    and var18 = 0 (full tie correction)."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import orders_mann_kendall

    base = pa.scalar(0, pa.timestamp("us"))
    days = [i * 86_400_000_000 for i in range(10)]
    pq.write_table(
        pa.table(
            {
                "o_orderdate": pa.array(days, pa.timestamp("us")),
                "o_totalprice": pa.array([float(i + 1) for i in range(10)]),
            }
        ),
        tmp_path / "orders.parquet",
    )
    r = orders_mann_kendall(str(tmp_path)).to_pylist()[0]
    assert (r["n_days"], r["s_stat"], r["tau_micro"]) == (10, 45, 1_000_000)

    pq.write_table(
        pa.table(
            {
                "o_orderdate": pa.array(days, pa.timestamp("us")),
                "o_totalprice": pa.array([7.0] * 10),
            }
        ),
        tmp_path / "orders.parquet",
    )
    r = orders_mann_kendall(str(tmp_path)).to_pylist()[0]
    assert (r["s_stat"], r["var18"]) == (0, 0)


def test_overdispersion_poisson_anchor(ray_session):
    """Dispersion must be positive wherever a type has variation and
    the moments must satisfy n*s2 >= s*s (Cauchy-Schwarz)."""
    from document_extractor_ray.functions.analytics import user_day_overdispersion

    for r in user_day_overdispersion(SF).to_pylist():
        assert r["n_cells"] * r["sum_c2"] >= r["sum_c"] * r["sum_c"]
        assert r["dispersion_micro"] >= 0


def test_rank_corr_pair_identities(ray_session):
    """Kendall pair classes must partition: C + D + T1 + T2 +
    both-tied == n_pairs, and tau_a in [-1, 1]."""
    from document_extractor_ray.functions.textstats import rank_corr_audit

    r = rank_corr_audit(SF).to_pylist()[0]
    classified = (
        r["concordant"] + r["discordant"]
        + r["ties_tfidf_only"] + r["ties_qlm_only"]
    )
    assert classified <= r["n_pairs"]
    assert -1_000_000 <= r["tau_a_micro"] <= 1_000_000
    assert r["n_pairs"] == r["n_docs"] * (r["n_docs"] - 1) // 2


def test_lm_sweep_monotone_positions(ray_session):
    """All three lambdas score the same position count, and every
    cross-entropy is positive (mixed prob < 1)."""
    from document_extractor_ray.functions.textstats import lm_interpolation_sweep

    rows = lm_interpolation_sweep(SF).to_pylist()
    assert len({r["n_positions"] for r in rows}) == 1
    for r in rows:
        assert r["mean_xent_micro"] > 0


def test_proximity_vs_bruteforce(ray_session):
    """The vectorized searchsorted kernel must agree with a plain
    per-doc brute-force min-gap recomputation."""
    import re as _re

    import duckdb

    from document_extractor_ray.functions.textstats import (
        PROX_TERM_A,
        PROX_TERM_B,
        PROX_WINDOW,
        proximity_search,
    )

    got = {
        r["doc_id"]: r["min_gap"] for r in proximity_search(SF).take_all()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    want = {}
    for d, txt in docs:
        toks = [w for w in _re.split(r"[^a-z0-9]+", txt) if w]
        pa_ = [i for i, w in enumerate(toks) if w == PROX_TERM_A]
        pb_ = [i for i, w in enumerate(toks) if w == PROX_TERM_B]
        if pa_ and pb_:
            gap = min(abs(x - y) for x in pa_ for y in pb_)
            if gap <= PROX_WINDOW:
                want[d] = gap
    assert got == want


def test_quantize_sweep_monotone(ray_session):
    """More bits must never increase the scale-relative mean error,
    and every width covers the same value count."""
    from document_extractor_ray.functions.similarity import quantize_bits_sweep

    rows = quantize_bits_sweep(SF).to_pylist()
    assert len({r["n_vals"] for r in rows}) == 1
    errs = [r["mean_err_nano"] for r in sorted(rows, key=lambda r: r["bits"])]
    assert errs == sorted(errs, reverse=True)


def test_join_order_cost_consistency(ray_session):
    """Both plans end at the same final cardinality; the dim-first
    plan's step1 can never exceed the filtered orders input and the
    fact-first step1 never exceeds the filtered lineitem input."""
    from document_extractor_ray.functions.analytics import join_order_cost_audit

    rows = {r["plan"]: r for r in join_order_cost_audit(SF).to_pylist()}
    dim, fact = rows["dim_first"], rows["fact_first"]
    assert dim["step2_rows"] == fact["step2_rows"]
    assert dim["step1_rows"] <= dim["n_orders_filtered"]
    assert fact["step1_rows"] <= fact["n_lineitem_filtered"]
    assert dim["cost_rows"] != fact["cost_rows"]  # the audit's point


def test_upsert_audit_partition(ray_session):
    """The four outcome classes must partition both snapshots:
    inserts + changed + equal == |B| and changed + equal + untouched
    == |A|."""
    from document_extractor_ray.functions.analytics import upsert_apply_audit

    r = upsert_apply_audit(SF).to_pylist()[0]
    assert r["n_inserts"] + r["n_updates_changed"] + r["n_updates_equal"] == r["n_changes_b"]
    assert r["n_untouched"] + r["n_updates_changed"] + r["n_updates_equal"] == r["n_state_a"]


def test_two_changepoints_invariants(ray_session):
    """Both gains are non-negative (a split never increases SSE), the
    level-2 split lies strictly inside one of the level-1 segments,
    and segment masses re-add to their parents."""
    from document_extractor_ray.functions.analytics import events_two_changepoints

    rows = {r["rank"]: r for r in events_two_changepoints(SF).to_pylist()}
    assert rows[1]["gain_num"] >= 0 and rows[2]["gain_num"] >= 0
    assert rows[2]["split_day"] != rows[1]["split_day"]
    if rows[2]["split_day"] < rows[1]["split_day"]:
        assert rows[2]["sum_left"] + rows[2]["sum_right"] == rows[1]["sum_left"]
        assert rows[2]["n_left"] + rows[2]["n_right"] == rows[1]["n_left"]
    else:
        assert rows[2]["sum_left"] + rows[2]["sum_right"] == rows[1]["sum_right"]
        assert rows[2]["n_left"] + rows[2]["n_right"] == rows[1]["n_right"]


def test_hll_sliding_window_dominates_daily(ray_session):
    """A 7-day union can never have fewer exact distincts than its
    final day alone, and the union estimate must sit within the HLL
    error envelope (m=256 -> ~6.5% std error, assert 5 sigma)."""
    from document_extractor_ray.functions.analytics import (
        hll_estimate_audit,
        hll_sliding_union_audit,
    )

    daily = {r["day"]: r["n_exact"] for r in hll_estimate_audit(SF).to_pylist()}
    for r in hll_sliding_union_audit(SF).to_pylist():
        assert r["n_exact_7d"] >= daily[r["day"]]
        assert abs(r["est_milli"] - 1000 * r["n_exact_7d"]) <= (
            5 * 0.065 * 1000 * r["n_exact_7d"]
        )


def test_selectivity_audit_margins(ray_session):
    """Independence estimates must re-add to the table total per
    margin (Σ est over p for fixed s ≈ n_s within milli-rounding)."""
    from document_extractor_ray.functions.analytics import (
        selectivity_independence_audit,
    )

    rows = selectivity_independence_audit(SF).to_pylist()
    tot_actual = sum(r["actual_rows"] for r in rows)
    tot_est = sum(r["est_milli_rows"] for r in rows)
    assert abs(tot_est - 1000 * tot_actual) <= len(rows)  # floor slack


def test_jsd_metric_properties(ray_session):
    """JSD is non-negative, bounded by ln 2, and a language's profile
    is closer to itself than to any other (trivially 0) — check the
    bound and symmetry of the emitted pair table instead."""
    import math

    from document_extractor_ray.functions.textstats import lang_trigram_jsd

    rows = lang_trigram_jsd(SF).to_pylist()
    ln2_micro = int(math.log(2) * 1e6)
    seen = set()
    for r in rows:
        assert r["lang_a"] < r["lang_b"]  # upper triangle only, no dups
        assert (r["lang_a"], r["lang_b"]) not in seen
        seen.add((r["lang_a"], r["lang_b"]))
        assert -5 <= r["jsd_micro"] <= ln2_micro + 5  # floor slack
    n_langs = len({x for p in seen for x in p})
    assert len(rows) == n_langs * (n_langs - 1) // 2


def test_key_gap_audit_identity(ray_session):
    """n_keys + n_missing must equal the domain span, and the max gap
    can't exceed the total missing count."""
    from document_extractor_ray.functions.analytics import key_gap_audit

    r = key_gap_audit(SF).to_pylist()[0]
    assert r["n_keys"] + r["n_missing"] == r["key_max"] - r["key_min"] + 1
    assert r["max_gap"] <= r["n_missing"]
    assert (r["n_gap_runs"] == 0) == (r["n_missing"] == 0)


def test_anova_against_float(ray_session):
    """The milli-scaled integer F must agree with a float ANOVA to
    within the truncation slack of its scaled terms."""
    import duckdb

    from document_extractor_ray.functions.analytics import value_anova_by_type

    r = value_anova_by_type(SF).to_pylist()[0]
    rows = duckdb.sql(
        f"SELECT event_type, round(value*100) FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchall()
    groups: dict = {}
    for et, v in rows:
        groups.setdefault(et, []).append(float(v))
    all_v = [v for g in groups.values() for v in g]
    n, k = len(all_v), len(groups)
    mean = sum(all_v) / n
    ssb = sum(len(g) * (sum(g) / len(g) - mean) ** 2 for g in groups.values())
    ssw = sum((v - sum(g) / len(g)) ** 2 for g in groups.values() for v in g)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r["f_micro"] / 1e6 - f) < 1e-3
    assert r["df_between"] == k - 1 and r["df_within"] == n - k


def test_runs_test_identities(ray_session):
    """Run count is bounded by 1..n_days and by 2*min(n1,n2)+1; the
    group sizes partition the days."""
    from document_extractor_ray.functions.analytics import daily_runs_test

    r = daily_runs_test(SF).to_pylist()[0]
    assert r["n_above"] + r["n_not_above"] == r["n_days"]
    assert 1 <= r["n_runs"] <= r["n_days"]
    assert r["n_runs"] <= 2 * min(r["n_above"], r["n_not_above"]) + 1


def test_tiering_partition_totals(ray_session):
    """Tier rollups must re-add to the distinct part count and total
    line count of the feed."""
    import duckdb

    from document_extractor_ray.functions.analytics import part_tiering_plan

    rows = part_tiering_plan(SF).to_pylist()
    n_parts, n_lines = duckdb.sql(
        f"SELECT count(DISTINCT l_partkey), count(*) FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert sum(r["n_lines"] for r in rows) == n_lines


def test_k_anonymity_planted(ray_session, tmp_path):
    """A planted singleton QI group must be flagged below k."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import k_anonymity_audit

    pq.write_table(
        pa.table(
            {
                "c_nationkey": pa.array([1] * 10 + [2], pa.int32()),
                "c_mktsegment": pa.array(["A"] * 10 + ["B"]),
            }
        ),
        tmp_path / "customer.parquet",
    )
    r = k_anonymity_audit(str(tmp_path)).to_pylist()[0]
    assert (r["n_groups"], r["min_group"]) == (2, 1)
    assert (r["groups_below_k"], r["rows_below_k"]) == (1, 1)


def test_sparsify_audit_totals(ray_session):
    """Band counts re-add to the corpus size and every retained share
    is a valid ppm."""
    import duckdb

    from document_extractor_ray.functions.similarity import embedding_sparsify_audit

    rows = embedding_sparsify_audit(SF).to_pylist()
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r["n_vectors"] for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r["band"] <= 10
        # mean ppm within the band's range
        mean = r["sum_ppm"] / r["n_vectors"]
        assert r["band"] * 100_000 <= mean < (r["band"] + 1) * 100_000


def test_design_effect_bounds(ray_session):
    """Proportional-allocation stratified variance can exceed SRS only
    by the truncation slack; deff stays in (0, 1.01]."""
    from document_extractor_ray.functions.analytics import stratified_design_effect

    r = stratified_design_effect(SF).to_pylist()[0]
    assert 0 < r["deff_micro"] <= 1_010_000
    assert r["var_strat_milli"] <= r["var_srs_milli"] + r["n_strata"]


def test_littles_law_identity(ray_session):
    """The sweep-line open-time integral and the per-order duration
    sum are computed through different dataflows and must be EXACTLY
    equal (Little's law at full horizon)."""
    from document_extractor_ray.functions.analytics import littles_law_audit

    r = littles_law_audit(SF).to_pylist()[0]
    assert r["duration_sum_us"] == r["open_integral_us"]
    # L = lambda * W within truncation slack of the three rationals
    lhs = r["l_avg_micro"] / 1e6
    rhs = (r["lambda_per_day_micro"] / 1e6) * (r["w_avg_us"] / 86_400_000_000)
    assert abs(lhs - rhs) < 1e-3 * max(lhs, 1)


def test_corr_matrix_bounds(ray_session):
    """Signed r-squared stays in [-1e6, 1e6]; diagonal-free pair set
    covers all 6 combinations once."""
    from document_extractor_ray.functions.analytics import lineitem_corr_matrix

    rows = lineitem_corr_matrix(SF).to_pylist()
    assert len(rows) == 6
    assert len({(r["col_a"], r["col_b"]) for r in rows}) == 6
    for r in rows:
        assert -1_000_000 <= r["r2_signed_micro"] <= 1_000_000


def test_sample_extrapolation_consistency(ray_session):
    """Sample counts re-add to hash_sample's membership rule: total
    sampled events across days equals a direct membership count, and
    every est is exactly 10x the sample."""
    import duckdb

    from document_extractor_ray.functions.analytics import (
        sample_extrapolation_audit,
    )

    rows = sample_extrapolation_audit(SF).to_pylist()
    tot_actual = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert sum(r["n_actual"] for r in rows) == tot_actual
    for r in rows:
        assert r["n_est"] == 10 * r["n_sample"]
        assert r["abs_err"] == abs(r["n_est"] - r["n_actual"])


def test_double_fire_rate_bounds(ray_session):
    """Pairs can never exceed events-1 per type; ppm stays in range."""
    from document_extractor_ray.functions.analytics import event_double_fire_audit

    for r in event_double_fire_audit(SF).to_pylist():
        assert 0 <= r["n_double_fires"] < r["n_events"]
        assert 0 <= r["rate_ppm"] < 1_000_000


def test_mmd_matches_float_means(ray_session):
    """Integer MMD² must agree with the float mean-difference norm."""
    import duckdb

    from document_extractor_ray.functions.similarity import embedding_mmd_labels

    rows = embedding_mmd_labels(SF).to_pylist()
    df = duckdb.sql(
        f"SELECT label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    means: dict = {}
    for la, g in df.groupby("label"):
        means[la] = np.stack(g["embedding"].to_numpy()).astype(np.float64).mean(0)
    for r in rows[:10]:
        diff = means[r["label_a"]] - means[r["label_b"]]
        # component sums are micro-quantized, so mmd2_micro carries
        # a 1e6 (output) x 1e12 (squared micro) scale
        assert abs(r["mmd2_micro"] / 1e18 - float(diff @ diff)) < 1e-4
    assert len(rows) == len(means) * (len(means) - 1) // 2


def test_hdr_sweep_error_monotone(ray_session):
    """Wider buckets can only lose accuracy: per quantile, abs_err is
    non-decreasing in width, and width-1 buckets are exact."""
    from document_extractor_ray.functions.analytics import hdr_precision_sweep

    rows = hdr_precision_sweep(SF).to_pylist()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["q_permille"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["width"])
        assert rs[0]["width"] == 1 and rs[0]["abs_err"] == 0
        errs = [r["abs_err"] for r in rs]
        assert errs == sorted(errs)


def test_kcore_invariants(ray_session):
    """Core + peeled partitions the node set; every core node keeps
    degree >= k inside the core (the k-core definition)."""
    from document_extractor_ray.functions.dedup import dup_graph_kcore
    from document_extractor_ray.functions.textstats import _read_docs

    r = dup_graph_kcore(_read_docs(SF, ["doc_id", "text"])).to_pylist()[0]
    assert r["core_nodes"] + r["n_peeled"] == r["n_nodes"]
    assert r["core_edges"] <= r["n_edges"]
    if r["core_nodes"]:
        # each core node needs >= k core edges; total degree = 2*edges
        assert 2 * r["core_edges"] >= r["k"] * r["core_nodes"]


def test_session_sweep_monotone(ray_session):
    """A larger timeout can only merge sessions: n_sessions is
    non-increasing in gap_us, bounded below by n_users."""
    from document_extractor_ray.functions.analytics import session_timeout_sweep

    rows = sorted(session_timeout_sweep(SF).to_pylist(), key=lambda r: r["gap_us"])
    assert rows[0]["n_sessions"] >= rows[-1]["n_sessions"]
    for r in rows:
        assert r["n_sessions"] >= r["n_users"]


def test_charset_profile_partition(ray_session):
    """Class shares re-add to <= 1000 permille (truncation) and never
    miss by more than the 4-way floor slack."""
    from document_extractor_ray.functions.textstats import source_charset_profile

    for r in source_charset_profile(SF).to_pylist():
        tot = (r["alpha_permille"] + r["digit_permille"]
               + r["space_permille"] + r["other_permille"])
        assert 996 <= tot <= 1000


def test_duplicate_invoice_planted(ray_session, tmp_path):
    """Two same-amount orders 3 days apart for one customer must flag
    exactly one pair; a third same-amount order 30 days out must not
    pair with the first two."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.analytics import duplicate_invoice_audit

    day = 86_400_000_000
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
                "o_orderdate": pa.array(
                    [0, 3 * day, 33 * day, 0], pa.timestamp("us")
                ),
                "o_totalprice": pa.array([49.99, 49.99, 49.99, 49.99]),
            }
        ),
        tmp_path / "orders.parquet",
    )
    r = duplicate_invoice_audit(str(tmp_path)).to_pylist()[0]
    assert (r["n_suspect_pairs"], r["n_orders_flagged"]) == (1, 2)


def test_price_ending_partition(ray_session):
    """Ending classes partition the order count."""
    from document_extractor_ray.functions.analytics import price_ending_profile

    r = price_ending_profile(SF).to_pylist()[0]
    assert r["n_round00"] + r["n_charm"] + r["n_other"] == r["n_orders"]


def test_pareto_frontier_is_skyline(ray_session):
    """Every frontier part must be strictly monotone: sorted by size
    ascending, prices strictly decrease (no dominated survivor), and
    no non-frontier part may dominate a frontier part."""
    from document_extractor_ray.functions.analytics import part_pareto_frontier

    rows = part_pareto_frontier(SF).to_pylist()
    sizes = [r["p_size"] for r in rows]
    prices = [r["price_cents"] for r in rows]
    for i in range(1, len(rows)):
        if sizes[i] > sizes[i - 1]:
            assert prices[i] > prices[i - 1]  # bigger size must cost more


def test_margin_waterfall_readds(ray_session):
    """net == gross - discount + tax per year, exactly."""
    from document_extractor_ray.functions.analytics import orders_margin_waterfall

    for r in orders_margin_waterfall(SF).to_pylist():
        assert r["net_cents"] == r["gross_cents"] - r["discount_cents"] + r["tax_cents"]
        assert r["discount_cents"] >= 0 and r["tax_cents"] >= 0


def test_trade_balance_zero_sum(ray_session):
    """Both ledger sides total the same corpus revenue, so balances
    sum to zero exactly."""
    from document_extractor_ray.functions.analytics import nation_trade_balance

    rows = nation_trade_balance(SF).to_pylist()
    assert sum(r["balance_cents"] for r in rows) == 0
    assert sum(r["supplied_cents"] for r in rows) == sum(
        r["purchased_cents"] for r in rows
    )


def test_transition_gap_counts_match_transitions(ray_session):
    """Per-pair transition counts must agree with event_transitions."""
    from document_extractor_ray.functions.analytics import (
        event_transitions,
        transition_gap_median,
    )

    med = {
        (r["prev_type"], r["next_type"]): r["n_transitions"]
        for r in transition_gap_median(SF).to_pylist()
    }
    base_rows = event_transitions(SF)
    base_rows = base_rows.take_all() if hasattr(base_rows, "take_all") else base_rows.to_pylist()
    for r in base_rows:
        key = (r.get("prev_type") or r.get("from_type"), r.get("next_type") or r.get("to_type"))
        if key in med and "n" in r:
            assert med[key] == r["n"]


def test_rule_metrics_identities(ray_session):
    """Confidence can never exceed 1000 milli and lift is symmetric in
    its construction: lift == conf_ab * N / n_b (cross-check on a few
    rows against marginals)."""
    import duckdb

    from document_extractor_ray.functions.analytics import brand_rule_metrics

    rows = brand_rule_metrics(SF).to_pylist()
    marg = dict(
        duckdb.sql(
            f"""SELECT b, count(*) FROM (
                SELECT DISTINCT l_orderkey AS o, p_brand AS b
                FROM read_parquet('{SF}/lineitem.parquet') li
                JOIN read_parquet('{SF}/part.parquet') pt
                  ON li.l_partkey = pt.p_partkey
            ) GROUP BY 1"""
        ).fetchall()
    )
    for r in rows:
        assert 0 < r["conf_ab_milli"] <= 1000
        assert 0 < r["conf_ba_milli"] <= 1000
        assert r["n_baskets"] <= min(marg[r["brand_a"]], marg[r["brand_b"]])


def test_fisher_dims_rank_consistency(ray_session):
    """Emitted dims are distinct, ranked by F desc, and every SS term
    satisfies the Cauchy-Schwarz-implied non-negativity."""
    from document_extractor_ray.functions.similarity import embedding_fisher_dims

    rows = embedding_fisher_dims(SF).to_pylist()
    fs = [r["f_micro"] for r in rows]
    assert fs == sorted(fs, reverse=True)
    assert len({r["dim"] for r in rows}) == len(rows)
    for r in rows:
        assert r["ssw_milli"] > 0 and r["ssb_milli"] >= -len(rows)


def test_new_user_share_first_day_is_all_new(ray_session):
    """On the first day every active user is new; afterwards new
    users never exceed active users."""
    from document_extractor_ray.functions.analytics import daily_new_user_share

    rows = daily_new_user_share(SF).to_pylist()
    assert rows[0]["n_new_users"] == rows[0]["n_active_users"]
    assert rows[0]["new_share_milli"] == 1000
    total_new = sum(r["n_new_users"] for r in rows)
    assert total_new == max(r["n_active_users"] for r in rows) or total_new >= max(
        r["n_active_users"] for r in rows
    )
    for r in rows:
        assert r["n_new_users"] <= r["n_active_users"]


def test_type_mix_gtest_nonnegative(ray_session):
    """G is a KL-type statistic: >= 0 up to micro-rounding slack, and
    the weekly event counts re-add to the corpus."""
    import duckdb

    from document_extractor_ray.functions.analytics import type_mix_drift_gtest

    rows = type_mix_drift_gtest(SF).to_pylist()
    tot = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert sum(r["n_events"] for r in rows) == tot
    for r in rows:
        assert r["g_micro"] >= -2 * r["n_events"]  # <=1 micro slack/term


def test_top_share_bounds(ray_session):
    """Top-k share lies in (0, 1000] milli and the top-k revenue never
    exceeds the year total."""
    from document_extractor_ray.functions.analytics import top_customer_share_by_year

    for r in top_customer_share_by_year(SF).to_pylist():
        assert 0 < r["topk_cents"] <= r["total_cents"]
        assert 0 < r["topk_share_milli"] <= 1000


def test_line_sequencing_counts(ray_session):
    """Violation counts can't exceed order count, and the known feed
    property holds: most orders violate max==count (gapped
    linenumbers)."""
    from document_extractor_ray.functions.analytics import line_sequencing_audit

    r = line_sequencing_audit(SF).to_pylist()[0]
    assert 0 <= r["n_max_violations"] <= r["n_orders"]
    assert r["n_max_violations"] > 0  # this feed IS gapped
    assert r["worst_overshoot"] >= 0


def test_reorder_interval_positive(ray_session):
    """Medians are non-negative day counts and every segment with >= 2
    orders per customer appears."""
    from document_extractor_ray.functions.analytics import reorder_interval_quantiles

    rows = reorder_interval_quantiles(SF).to_pylist()
    assert len(rows) == 5
    for r in rows:
        assert r["median_gap_days"] >= 0 and r["n_gaps"] > 0


def test_lifecycle_matrix_totals(ray_session):
    """Matrix cells re-add to the count of orders that have lines."""
    import duckdb

    from document_extractor_ray.functions.analytics import status_lifecycle_matrix

    rows = status_lifecycle_matrix(SF).to_pylist()
    want = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == want


def test_rank_drift_permutation(ray_session):
    """Each half's ranks are a permutation of 1..V and deltas sum to
    zero (rank conservation)."""
    from document_extractor_ray.functions.textstats import token_rank_drift

    rows = token_rank_drift(SF).to_pylist()
    v = len(rows)
    assert sorted(r["rank_first_half"] for r in rows) == list(range(1, v + 1))
    assert sorted(r["rank_second_half"] for r in rows) == list(range(1, v + 1))
    assert sum(r["rank_delta"] for r in rows) == 0


def test_first_touch_partition(ray_session):
    """First-touch user counts partition the user base."""
    import duckdb

    from document_extractor_ray.functions.analytics import first_touch_mix

    rows = first_touch_mix(SF).to_pylist()
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert sum(r["n_users"] for r in rows) == n_users


# ---------------------------------------------------------------------------
# Registry integrity


def test_registry_rotation_order():
    """queries() must front-load the driver's ~50-query sample window:
    extract_* first, then never-driver-checked oracled queries, then
    never-checked no-oracle, then everything already green in a
    committed CORRECTNESS file (VERDICT r3/r4 backlog-drain design)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    names = list(em.queries())
    checked = em._driver_checked()
    oracled = set(em.oracle_sql())

    def tier(n):
        if n.startswith("extract_"):
            return 0
        if n not in checked:
            return 1 if n in oracled else 2
        return 3

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "rotation tiers out of order"
    assert names[0].startswith("extract_")
    # the window the driver samples must start with never-checked work
    assert any(t == 1 for t in tiers[:50])


def test_registry_no_oracle_set_pinned():
    """Every queries() entry either has a DuckDB oracle or sits in the
    explicitly justified no-oracle allowlist (COVERAGE.md 'Correctness
    surfaces'); a new query silently missing its oracle fails here."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    q = set(em.queries())
    o = set(em.oracle_sql())
    justified_no_oracle = {
        # (extract_results/_quarantine/_unit_rows moved OUT of this set
        # in r5: their oracle is the sequential-oracle golden parquet
        # read back via read_parquet — see make_goldens.py.)
        # planted-input / iterative / float-argmax ops, each pinned by
        # committed goldens in tests/test_goldens.py
        "embedding_dup_pairs",
        "embedding_dup_clusters",
        "embedding_pca_power",
        "kmeans_train",
        "knn_ivf",
        "knn_ivf_indexed",
        "media_dup_groups",
        "media_features",
        "frame_sample",
        "pack_sequences",
    }
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
    assert q - o == justified_no_oracle


def test_length_mannwhitney_matches_rank_computation(ray_session):
    """u2x must equal twice the tie-averaged rank U computed directly."""
    import duckdb

    from document_extractor_ray.functions.analytics import length_mannwhitney

    got = {r["source"]: r for r in length_mannwhitney(SF).to_pylist()}
    df = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet'"
    ).df()
    ranks = df["n_chars"].rank(method="average")
    for src, r in got.items():
        m = df["source"] == src
        n1, n2 = int(m.sum()), int((~m).sum())
        # R1 = rank sum of the group; U1 = R1 - n1(n1+1)/2 (x2 exact)
        u2 = 2.0 * ranks[m].sum() - n1 * (n1 + 1)
        assert r["n_src"] == n1 and r["n_rest"] == n2
        assert r["u2x"] == round(u2)
        assert 0 <= r["u2x"] <= 2 * n1 * n2


def test_scd2_one_current_row_per_user(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import scd2_intervals

    rows = scd2_intervals(SF).to_pylist()
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert sum(r["n_current"] for r in rows) == n_users
    assert all(r["n_versions"] >= r["n_current"] for r in rows)
    assert all(r["closed_dur_us"] >= 0 for r in rows)


def test_daily_theil_sen_pair_count_and_bounds(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import daily_theil_sen

    r = daily_theil_sen(SF).to_pylist()[0]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    df = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) d, count(*) y FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    days = df["d"].to_numpy().astype("datetime64[D]").astype(np.int64)
    y = df["y"].to_numpy().astype(np.int64)
    i, j = np.triu_indices(len(days), k=1)
    slopes = np.floor_divide((y[j] - y[i]) * 1_000_000, days[j] - days[i])
    slopes.sort()
    n = len(slopes)
    assert r["slope_micro_x2"] == int(slopes[(n - 1) // 2]) + int(slopes[n // 2])


def test_pack_boundary_total_matches_pack_sequences(ray_session):
    """Sum of boundaries == packed docs minus packed examples."""
    from document_extractor_ray.functions.training import (
        pack_boundary_bigrams,
        pack_sequences_docs,
    )

    total = sum(
        r["n_boundaries"] for r in pack_boundary_bigrams(SF).to_pylist()
    )
    packs = pack_sequences_docs(SF).take_all()
    assert total == sum(p["n_docs"] for p in packs) - len(packs)


def test_neyman_allocation_sums_and_isqrt(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import (
        NEYMAN_SAMPLE_N,
        neyman_allocation_plan,
    )

    rows = neyman_allocation_plan(SF).to_pylist()
    assert sum(r["alloc"] for r in rows) == NEYMAN_SAMPLE_N
    ss = {
        s: int(n) * int(s2) - int(sx) * int(sx)
        for s, n, sx, s2 in duckdb.sql(
            f"""SELECT o_orderpriority, count(*),
                     sum(CAST(round(o_totalprice*100) AS BIGINT)),
                     sum(CAST(round(o_totalprice*100) AS BIGINT)
                         * CAST(round(o_totalprice*100) AS BIGINT))
              FROM '{SF}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    }
    for r in rows:
        w = r["neyman_w"]
        assert w * w <= ss[r["stratum"]] < (w + 1) * (w + 1)


def test_freq_migration_covers_every_customer(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import customer_freq_migration

    rows = customer_freq_migration(SF).to_pylist()
    n_cust = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert not any(
        r["band_from"] == "none" and r["band_to"] == "none" for r in rows
    )


def test_witten_bell_counts_match_kn_and_mass_bound(ray_session):
    """WB reads the same bigram counts as KN; per-context emitted
    probability mass never exceeds 1e6."""
    from document_extractor_ray.functions.textstats import (
        kn_bigram_probs,
        witten_bell_bigram,
    )

    wb = witten_bell_bigram(SF).to_pylist()
    kn = {
        (r["prev"], r["next"]): r["c12"] for r in kn_bigram_probs(SF).to_pylist()
    }
    mass: dict = {}
    for r in wb:
        assert kn[(r["prev"], r["next"])] == r["c12"]
        assert r["prob_micro"] > 0
        mass[r["prev"]] = mass.get(r["prev"], 0) + r["prob_micro"]
    assert all(v <= 1_000_000 for v in mass.values())


def test_residual_outliers_recompute(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import (
        RESIDUAL_TOP_K,
        length_token_residual_outliers,
    )

    rows = length_token_residual_outliers(SF).to_pylist()
    assert len(rows) == RESIDUAL_TOP_K
    absr = [abs(r["resid_micro"]) for r in rows]
    assert absr == sorted(absr, reverse=True)
    df = duckdb.sql(
        f"""SELECT doc_id, n_chars,
                 CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) y
          FROM '{SF}/documents.parquet'"""
    ).df()
    n = len(df)
    sx, sy = int(df["n_chars"].sum()), int(df["y"].sum())
    sxy = int((df["n_chars"] * df["y"]).sum())
    sxx = int((df["n_chars"] * df["n_chars"]).sum())
    d = n * sxx - sx * sx
    b_micro = (1_000_000 * (n * sxy - sx * sy)) // d
    a_micro = (1_000_000 * (sy * sxx - sx * sxy)) // d
    by_id = df.set_index("doc_id")
    for r in rows:
        x, y = int(by_id.loc[r["doc_id"], "n_chars"]), int(by_id.loc[r["doc_id"], "y"])
        assert r["resid_micro"] == 1_000_000 * y - a_micro - b_micro * x


def test_markov_surprisal_totals(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import markov_sequence_surprisal

    rows = markov_sequence_surprisal(SF).take_all()
    n_events, n_users = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()
    assert sum(r["n_transitions"] for r in rows) == n_events - n_users
    assert all(r["surprisal_micro"] >= 0 for r in rows)


def test_pack_optimality_consistent_with_pack_sequences(ray_session):
    from document_extractor_ray.functions.training import (
        pack_optimality_audit,
        pack_sequences_docs,
    )

    r = pack_optimality_audit(SF).to_pylist()[0]
    assert r["n_examples"] == len(pack_sequences_docs(SF).take_all())
    assert r["lb_examples"] <= r["n_examples"]
    assert 0 <= r["optimal_ranges"] <= r["n_ranges"]


def test_assortativity_bounds_and_edges(ray_session):
    from document_extractor_ray.functions.dedup import (
        dup_graph_assortativity_docs,
        dup_graph_triangles_docs,
    )

    r = dup_graph_assortativity_docs(SF).to_pylist()[0]
    t = dup_graph_triangles_docs(SF).to_pylist()[0]
    assert r["n_edges"] == t["n_edges"]
    assert -1_000_000 <= r["r_micro"] <= 1_000_000


def test_incremental_dedup_rejects_are_odd_subset_of_pairs(ray_session):
    from document_extractor_ray.functions.dedup import (
        incremental_dedup_audit_docs,
        minhash_dup_pairs_docs,
    )

    rej = incremental_dedup_audit_docs(SF).take_all()
    pairs = minhash_dup_pairs_docs(SF).take_all()
    cross = {}
    for p in pairs:
        a, b = p["doc_a"], p["doc_b"]
        if a % 2 != b % 2:
            new = a if a % 2 == 1 else b
            cross[new] = cross.get(new, 0) + 1
    assert {r["doc_id"]: r["n_existing_matches"] for r in rej} == cross
    assert all(r["doc_id"] % 2 == 1 for r in rej)


def test_sample_join_estimator_consistent_with_exact(ray_session):
    from document_extractor_ray.functions.analytics import (
        JOIN_SAMPLE_MOD,
        join_size_exact,
        sample_join_estimator_audit,
    )

    est = sample_join_estimator_audit(SF).to_pylist()[0]
    exact = join_size_exact(SF).to_pylist()[0]
    assert est["join_rows"] == exact["join_rows"]
    assert est["est_join_rows"] == JOIN_SAMPLE_MOD * est["sampled_join_rows"]
    assert est["sampled_keys"] <= exact["common_keys"]


def test_bullwhip_nonnegative_and_weeks(ray_session):
    from document_extractor_ray.functions.analytics import orders_bullwhip_audit

    r = orders_bullwhip_audit(SF).to_pylist()[0]
    assert r["cv2_num_orders"] >= 0 and r["cv2_num_ship"] >= 0
    assert r["bullwhip_micro"] >= 0
    assert r["n_weeks_ship"] >= r["n_weeks_orders"] - 1


def test_salt_plan_covers_all_hot_users(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import (
        SALT_ROW_BOUND,
        salt_plan_audit,
    )

    rows = salt_plan_audit(SF).take_all()
    truth = {
        u: (n + SALT_ROW_BOUND - 1) // SALT_ROW_BOUND
        for u, n in duckdb.sql(
            f"SELECT user_id, count(*) FROM '{SF}/events.parquet' GROUP BY 1"
        ).fetchall()
        if (n + SALT_ROW_BOUND - 1) // SALT_ROW_BOUND >= 2
    }
    assert {r["user_id"]: r["n_salts"] for r in rows} == truth


def test_km_curve_monotone_and_bounded(ray_session):
    from document_extractor_ray.functions.analytics import ship_survival_km

    rows = ship_survival_km(SF).to_pylist()
    s = [r["s_micro"] for r in rows]
    assert all(0 <= v <= 1_000_000 for v in s)
    assert all(a >= b for a, b in zip(s, s[1:]))  # non-increasing
    nr = [r["n_risk"] for r in rows]
    assert all(a >= b for a, b in zip(nr, nr[1:]))  # risk set shrinks
    assert all(r["n_events"] >= 1 for r in rows)


def test_wilson_lb_below_rate_and_sorted(ray_session):
    from document_extractor_ray.functions.analytics import brand_return_wilson

    rows = brand_return_wilson(SF).to_pylist()
    lbs = [r["wilson_lb_micro"] for r in rows]
    assert lbs == sorted(lbs, reverse=True)
    for r in rows:
        # lower bound sits at or below the raw rate, never negative
        assert 0 <= r["wilson_lb_micro"] <= 1_000_000 * r["n_returned"] // r["n_lines"]


def test_dict_encoding_audit_recompute(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import dict_encoding_audit

    rows = {r["column_name"]: r for r in dict_encoding_audit(SF).to_pylist()}
    for (table, col), r in [
        (("events", "event_type"), rows["events.event_type"]),
        (("documents", "source"), rows["documents.source"]),
    ]:
        h = dict(
            duckdb.sql(
                f"SELECT {col}, count(*) FROM '{SF}/{table}.parquet' GROUP BY 1"
            ).fetchall()
        )
        n, d = sum(h.values()), len(h)
        raw = sum(c * len(v) for v, c in h.items())
        bits = max(1, (d - 1).bit_length())
        est = sum(len(v) for v in h) + n * ((bits + 7) // 8)
        assert (r["n_values"], r["n_distinct"], r["raw_chars"], r["dict_est_chars"]) == (
            n, d, raw, est
        )


def test_priority_inversion_counts(ray_session):
    from document_extractor_ray.functions.analytics import priority_inversion_audit

    r = priority_inversion_audit(SF).to_pylist()[0]
    assert r["n_inversions"] + r["n_ties"] <= r["n_comparable"]
    assert 0 <= r["inversion_permille"] <= 1000
    assert r["n_days"] > 0 and r["n_comparable"] > 0


def test_front_coding_recompute(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import (
        FRONT_PREFIX_CHARS,
        front_coding_audit,
    )

    r = front_coding_audit(SF).to_pylist()[0]
    prefs = [
        p
        for (p,) in duckdb.sql(
            f"SELECT substr(text, 1, {FRONT_PREFIX_CHARS}) FROM '{SF}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    saved = 0
    for a, b in zip(prefs, prefs[1:]):
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        saved += k
    assert r["n_docs"] == len(prefs)
    assert r["prefix_chars"] == sum(len(p) for p in prefs)
    assert r["lcp_chars_saved"] == saved


def test_dim_truncation_recall_bounds(ray_session):
    from document_extractor_ray.functions.similarity import dim_truncation_recall

    rows = dim_truncation_recall(SF).to_pylist()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["n_overlap"] <= 10
        assert r["recall_permille"] == 1000 * r["n_overlap"] // 10


def test_filter_order_plan_bounds_and_identity(ray_session):
    """Every ordering costs at least the first layer's full sweep and
    at most the sum of all layer costs; the canonical-first ordering
    (c4) must agree with a direct histogram recompute."""
    from document_extractor_ray.functions.dedup import (
        CURATION_COSTS,
        filter_order_plan,
    )

    rows = {r["first_layer"]: r["expected_cost_milli"] for r in
            filter_order_plan(SF).to_pylist()}
    assert set(rows) == set(CURATION_COSTS)
    upper = 1000 * sum(CURATION_COSTS.values())
    for name, cost in rows.items():
        assert 1000 * CURATION_COSTS[name] <= cost <= upper


def test_hashring_moves_less_than_mod(ray_session):
    """The ring must move far fewer keys than mod-N resharding and at
    least SOME keys (the new shard takes ownership of arcs)."""
    from document_extractor_ray.functions.training import (
        hashring_moved_keys,
        shard_rebalance_audit,
    )

    ring = hashring_moved_keys(SF).to_pylist()[0]
    reb = {r["method"]: r for r in shard_rebalance_audit(SF).to_pylist()}
    assert 0 < ring["n_moved"] < reb["mod"]["n_moved"]
    assert ring["n_keys"] == reb["mod"]["n_keys"]


def test_pack_position_mix_totals(ray_session):
    from document_extractor_ray.functions.training import (
        pack_position_source_mix,
        pack_sequences_docs,
    )

    rows = pack_position_source_mix(SF).to_pylist()
    packs = pack_sequences_docs(SF).take_all()
    assert sum(r["n_starts"] for r in rows) == len(packs)
    assert sum(r["n_docs"] for r in rows) == sum(p["n_docs"] for p in packs)
    assert all(r["n_starts"] <= r["n_docs"] for r in rows)


def test_backlog_aging_consistency(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import backlog_aging_snapshot

    rows = backlog_aging_snapshot(SF).to_pylist()
    assert all(r["n_open"] > 0 for r in rows)
    # the final month-end backlog equals orders never fully shipped
    # by then (open-ended orders): recompute directly
    last = max(r["month_end"] for r in rows)
    total_last = sum(r["n_open"] for r in rows if r["month_end"] == last)
    truth = duckdb.sql(f"""
        WITH w AS (SELECT l_orderkey k, max(CAST(l_shipdate AS DATE)) cd
                   FROM '{SF}/lineitem.parquet' GROUP BY 1)
        SELECT count(*) FROM '{SF}/orders.parquet' o LEFT JOIN w ON w.k = o.o_orderkey
        WHERE CAST(o.o_orderdate AS DATE) <= DATE '{last.date()}'
          AND (w.cd IS NULL OR w.cd > DATE '{last.date()}')
    """).fetchone()[0]
    assert total_last == truth


def test_daily_qn_pairs_and_nonneg(ray_session):
    from document_extractor_ray.functions.analytics import (
        daily_qn_scale,
        daily_theil_sen,
    )

    qn = daily_qn_scale(SF).to_pylist()[0]
    ts = daily_theil_sen(SF).to_pylist()[0]
    assert qn["n_days"] == ts["n_days"] and qn["n_pairs"] == ts["n_pairs"]
    assert qn["qn_gap_x2"] >= 0


def test_cpk_covers_all_priorities(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import shiplag_cpk_by_priority

    rows = shiplag_cpk_by_priority(SF).to_pylist()
    truth = dict(
        duckdb.sql(
            f"""SELECT o.o_orderpriority, count(*)
              FROM '{SF}/lineitem.parquet' l
              JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
              GROUP BY 1"""
        ).fetchall()
    )
    assert {r["priority"]: r["n_lines"] for r in rows} == truth


def test_readability_mono_subset_of_words(ray_session):
    from document_extractor_ray.functions.textstats import readability_profile

    rows = readability_profile(SF).to_pylist()
    assert rows == sorted(rows, key=lambda r: r["source"])
    for r in rows:
        # every monosyllabic word is a word; every word in this corpus
        # has >= 1 vowel run so syllables >= words >= mono
        assert 0 <= r["n_mono"] <= r["n_words"] <= r["n_syllables"]
        assert 5000 <= r["forcast_milli"] <= 20000


def test_partial_agg_audit_bounds(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import (
        partial_agg_reduction_audit,
    )

    rows = {r["key_name"]: r for r in partial_agg_reduction_audit(SF).to_pylist()}
    n = duckdb.sql(f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    for r in rows.values():
        # global_ndv <= sum of per-block ndv <= rows; blocks consistent
        assert r["n_rows"] == n
        assert r["global_ndv"] <= r["sum_block_ndv"] <= n
        assert r["sum_block_ndv"] >= r["n_blocks"] or r["global_ndv"] == 0
    # event_type is the most combiner-friendly key of the three
    assert (
        rows["event_type"]["combiner_out_permille"]
        <= rows["user_id"]["combiner_out_permille"]
    )


def test_kruskal_wallis_ranksum_identity(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import value_kruskal_wallis

    rows = value_kruskal_wallis(SF).to_pylist()
    n_total = sum(r["n"] for r in rows)
    n_events = duckdb.sql(f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert n_total == n_events
    # sum over groups of 2x rank sums == 2 * N(N+1)/2 == N(N+1)
    assert sum(r["ranksum_x2"] for r in rows) == n_total * (n_total + 1)
    assert len({r["tie_adj"] for r in rows}) == 1 and rows[0]["tie_adj"] >= 0


def test_ta_stop_certifies_topk(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import topk_threshold_audit

    r = topk_threshold_audit(SF).to_pylist()[0]
    assert 1 <= r["stop_depth"] <= r["n_users"]
    assert r["kth_score"] >= r["tau_at_stop"]  # the TA halting condition
    assert r["n_seen"] >= r["k"]
    # the certified k-th score equals the true global k-th best
    truth = duckdb.sql(f"""
        SELECT min(s) FROM (
          SELECT count(*) + sum(CAST(round(value*100) AS BIGINT)) AS s
          FROM '{SF}/events.parquet' GROUP BY user_id
          ORDER BY s DESC LIMIT {r["k"]})
    """).fetchone()[0]
    assert r["kth_score"] == truth


def test_calibration_bins_partition_docs(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import quality_calibration_bins

    rows = quality_calibration_bins(SF).to_pylist()
    n = duckdb.sql(f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert 0 <= r["pos_rate_permille"] <= 1000
        # mean score falls inside the bin's permille decade
        assert r["bin"] * 10 <= r["mean_score_permille"] < (r["bin"] + 1) * 10


def test_presortedness_invariants(ray_session):
    from document_extractor_ray.functions.analytics import presortedness_audit

    rows = {r["col"]: r for r in presortedness_audit(SF).to_pylist()}
    assert set(rows) == {"ts_us", "user_id", "cents"}
    for r in rows.values():
        assert r["n_runs"] == r["n_descents"] + 1
        assert 1 <= r["longest_run"] <= r["n_rows"]
    # the fixture event feed is generated in timestamp order
    assert rows["ts_us"]["sorted_permille"] == 1000
    assert rows["ts_us"]["longest_run"] == rows["ts_us"]["n_rows"]


def test_kfold_marginals_consistent(ray_session):
    from document_extractor_ray.functions.analytics import (
        kfold_balance_audit,
        train_val_test_split,
    )

    rows = kfold_balance_audit(SF).to_pylist()
    n_total = rows[0]["n_total"]
    assert sum(r["n_obs"] for r in rows) == n_total
    # marginals re-derive from the cells
    from collections import defaultdict

    fold_n = defaultdict(int)
    lang_n = defaultdict(int)
    for r in rows:
        fold_n[r["fold"]] += r["n_obs"]
        lang_n[r["lang"]] += r["n_obs"]
    for r in rows:
        assert r["n_fold"] == fold_n[r["fold"]]
        assert r["n_lang"] == lang_n[r["lang"]]
    # same hash family as the split: totals agree with the doc count
    assert n_total == train_val_test_split(SF).count()


def test_weekly_top_users_truth(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import weekly_top_users

    rows = weekly_top_users(SF).to_pylist()
    truth = duckdb.sql(f"""
        WITH w AS (SELECT CAST(epoch_us(ts) // (7*86400000000) AS BIGINT) wk,
                          user_id, sum(CAST(round(value*100) AS BIGINT)) c
                   FROM '{SF}/events.parquet' GROUP BY 1, 2)
        SELECT wk, user_id FROM (
          SELECT wk, user_id,
                 row_number() OVER (PARTITION BY wk ORDER BY c DESC, user_id) rn
          FROM w) WHERE rn = 1 ORDER BY wk
    """).fetchall()
    got_leaders = [(r["week"], r["user_id"]) for r in rows if r["rank"] == 1]
    assert got_leaders == truth
    for r in rows:
        assert 1 <= r["rank"] <= 3


def test_median_polish_decomposition(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import events_median_polish

    rows = events_median_polish(SF).to_pylist()
    assert len(rows) == 28
    n_total = duckdb.sql(f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert sum(r["n_events"] for r in rows) == n_total
    for r in rows:
        # additive decomposition holds exactly at the x4 scale
        assert (
            r["row_effect_x4"] + r["col_effect_x4"] + r["residual_x4"]
            == 4 * r["n_events"]
        )
    # after the final col half-sweep every column's residual median is 0
    for hq in range(4):
        res = sorted(r["residual_x4"] for r in rows if r["hourq"] == hq)
        assert res[len(res) // 2] == 0


def test_did_reconstructs_from_cells(ray_session):
    from fractions import Fraction
    from math import floor

    from document_extractor_ray.functions.analytics import value_did_estimate

    rows = {(r["event_type"], r["post"]): r for r in value_did_estimate(SF).to_pylist()}
    assert len(rows) == 4
    m = {k: Fraction(v["sum_cents"], v["n"]) for k, v in rows.items()}
    did = m[("purchase", 1)] - m[("purchase", 0)] - (m[("click", 1)] - m[("click", 0)])
    assert rows[("click", 0)]["did_micro"] == floor(did * 1_000_000)


def test_label_scatter_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.similarity import label_scatter_stats

    rows = {r["label"]: r for r in label_scatter_stats(SF).to_pylist()}
    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
    q = np.floor(m * 1000 + 0.5).astype(np.int64)
    labels = t["label"].to_numpy()
    for lb in np.unique(labels):
        sel = q[labels == lb].astype(object)
        n = len(sel)
        truth = n * int((sel * sel).sum()) - int((sel.sum(axis=0) ** 2).sum())
        assert rows[int(lb)]["ss_within_num"] == truth
        assert rows[int(lb)]["n"] == n
        assert truth >= 0


def test_broadcast_plan_small_dims(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import broadcast_plan_audit

    rows = {r["table_name"]: r for r in broadcast_plan_audit(SF).to_pylist()}
    assert set(rows) == {"region", "nation", "supplier", "customer", "part"}
    for name, r in rows.items():
        n = duckdb.sql(f"SELECT count(*) FROM '{SF}/{name}.parquet'").fetchone()[0]
        assert r["n_rows"] == n
        assert r["est_bytes"] >= r["n_rows"] * 4
        assert r["plan"] == "broadcast"  # all sf dims fit the budget
    # a zero-row limit forces every dim onto the partitioned join path
    forced = broadcast_plan_audit(SF, limit=0).to_pylist()
    assert all(r["plan"] == "partitioned_join" for r in forced)


def test_ks_matrix_symmetric_bounds(ray_session):
    from document_extractor_ray.functions.analytics import value_ks_types  # noqa: F401
    from document_extractor_ray.functions.textstats import source_length_ks_matrix

    rows = source_length_ks_matrix(SF).to_pylist()
    srcs = sorted({r["source_a"] for r in rows} | {r["source_b"] for r in rows})
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        # D = ks_num/(n_a*n_b) must sit in [0, 1]
        assert 0 <= r["ks_num"] <= r["n_a"] * r["n_b"]


def test_weighted_median_sits_in_mass(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import (
        nation_weighted_median_acctbal,
    )

    rows = nation_weighted_median_acctbal(SF).to_pylist()
    truth = dict(
        duckdb.sql(
            f"""SELECT c.c_nationkey, count(DISTINCT o.o_custkey)
              FROM '{SF}/orders.parquet' o
              JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
              GROUP BY 1"""
        ).fetchall()
    )
    assert sum(r["n_customers"] for r in rows) == sum(truth.values())
    for r in rows:
        # x2 median must be reachable by two observed cents values
        assert r["total_weight"] >= r["n_customers"] >= 1
        # weighted-median mass property: at least half the weight on
        # each side of the (x2-halved) median
        nk = r["nation"]
        w = duckdb.sql(f"""
            WITH w AS (SELECT o_custkey k, count(*) w FROM '{SF}/orders.parquet' GROUP BY 1)
            SELECT CAST(round(c.c_acctbal*100) AS BIGINT) cents, w.w
            FROM w JOIN '{SF}/customer.parquet' c ON c.c_custkey = w.k
            JOIN '{SF}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
            WHERE n.n_name = '{nk}'
        """).fetchall()
        med2 = r["wmedian_cents_x2"]
        below = sum(ww for cc, ww in w if 2 * cc <= med2)
        above = sum(ww for cc, ww in w if 2 * cc >= med2)
        tot = sum(ww for _, ww in w)
        assert 2 * below >= tot and 2 * above >= tot


def test_brand_realization_bounds(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import brand_price_realization

    rows = brand_price_realization(SF).to_pylist()
    n = duckdb.sql(f"SELECT count(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
    assert sum(r["n_lines"] for r in rows) == n
    for r in rows:
        assert (
            0
            <= r["min_realization_permille"]
            <= r["max_realization_permille"]
        )
        assert (
            r["n_lines"] * r["min_realization_permille"]
            <= r["sum_realization_permille"]
            <= r["n_lines"] * r["max_realization_permille"]
        )


def test_lang_runs_bounds(ray_session):
    from document_extractor_ray.functions.textstats import lang_run_clustering

    r = lang_run_clustering(SF).to_pylist()[0]
    assert r["n_langs"] <= r["observed_runs"] <= r["n_docs"]
    # expected runs under random arrangement: n - (sum_nl_sq - n)/(n-1);
    # the fixture interleaves langs, so observed sits near expectation
    # (within 15%), far from the blocked lower bound n_langs
    n, s = r["n_docs"], r["sum_nl_sq"]
    expected = n - (s - n) / (n - 1)
    assert abs(r["observed_runs"] - expected) / expected < 0.15


def test_sttr_windows_and_bounds(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import sttr_by_source

    rows = sttr_by_source(SF).to_pylist()
    truth_tokens = dict(
        duckdb.sql(f"""
          SELECT source, sum(len(list_filter(
                 regexp_split_to_array(lower(text), '\\s+'),
                 x -> length(x) > 0)))
          FROM '{SF}/documents.parquet' GROUP BY 1
        """).fetchall()
    )
    for r in rows:
        assert r["n_tokens"] == truth_tokens[r["source"]]
        # each window's distinct count is within [1, min(window, tokens)]
        assert r["n_windows"] <= r["sum_distinct"] <= r["n_tokens"]
        assert 0 < r["sttr_permille"] <= 1000


def test_one_hit_wonder_consistency(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import one_hit_wonder_rate

    rows = one_hit_wonder_rate(SF).to_pylist()
    n_events = duckdb.sql(f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["n_one_hit"] <= r["n_users"] <= r["n_events"]
        assert r["one_hit_permille"] == 1000 * r["n_one_hit"] // r["n_users"]


def test_slo_burn_telescopes(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import slo_burn_rate

    rows = slo_burn_rate(SF).to_pylist()
    n, e = duckdb.sql(
        f"""SELECT count(*), count(*) FILTER (WHERE event_type = 'error')
          FROM '{SF}/events.parquet'"""
    ).fetchone()
    assert sum(r["n_events"] for r in rows) == n
    assert sum(r["n_errors"] for r in rows) == e
    # running total telescopes to the overall budget position
    assert rows[-1]["budget_spent_x1000"] == 1000 * e - 210 * n
    run = 0
    for r in rows:
        run += r["budget_delta_x1000"]
        assert r["budget_spent_x1000"] == run


def test_emd_dominates_ks_per_pair(ray_session):
    from document_extractor_ray.functions.textstats import (
        source_length_emd_matrix,
        source_length_ks_matrix,
    )

    emd = {(r["source_a"], r["source_b"]): r for r in source_length_emd_matrix(SF).to_pylist()}
    ks = {(r["source_a"], r["source_b"]): r for r in source_length_ks_matrix(SF).to_pylist()}
    assert set(emd) == set(ks)
    for k, r in emd.items():
        assert r["emd_num"] >= 0
        assert r["n_a"] == ks[k]["n_a"] and r["n_b"] == ks[k]["n_b"]
        # W1 >= KS * (min positive gap =1): emd_num >= ks_num only when
        # the sup crossing persists over >=1 unit of length; weaker
        # universal bound: emd_num >= ks_num implies nothing, so assert
        # the sound direction: emd_num <= ks_num * (max_len - min_len)
        import duckdb

        lo, hi = duckdb.sql(
            f"SELECT min(n_chars), max(n_chars) FROM '{SF}/documents.parquet'"
        ).fetchone()
        assert r["emd_num"] <= ks[k]["ks_num"] * (hi - lo)


def test_postings_gap_bits_bounds(ray_session):
    from document_extractor_ray.functions.textstats import postings_gap_bits

    rows = postings_gap_bits(SF).to_pylist()
    assert 0 < len(rows) <= 20
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        # each gap costs >= 1 bit and <= 64 bits
        assert r["df"] <= r["gap_bits"] <= r["raw_bits"]
        assert 0 <= r["savings_permille"] < 1000


def test_doclen_embnorm_cauchy_schwarz(ray_session):
    from document_extractor_ray.functions.similarity import doclen_embnorm_corr

    r = doclen_embnorm_corr(SF).to_pylist()[0]
    n = r["n"]
    assert n > 0
    cov_num = n * r["sum_xy"] - r["sum_x"] * r["sum_y"]
    var_x = n * r["sum_x2"] - r["sum_x"] ** 2
    var_y = n * r["sum_y2"] - r["sum_y"] ** 2
    assert var_x >= 0 and var_y >= 0
    assert cov_num * cov_num <= var_x * var_y  # |corr| <= 1, exactly


def test_span_plan_identities(ray_session):
    import duckdb

    from document_extractor_ray.functions.training import span_corruption_plan

    rows = span_corruption_plan(SF).to_pylist()
    n = duckdb.sql(f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n
    for r in rows:
        assert 0 <= r["sum_masked"] <= r["sum_tokens"]
        # ceil(masked/3) over docs: between masked/3 and masked/3+n_docs
        assert r["sum_masked"] <= 3 * r["sum_spans"] <= r["sum_masked"] + 3 * r["n_docs"]
        assert r["net_tokens"] == r["sum_tokens"] - r["sum_masked"] + r["sum_spans"]


def test_vocab_coverage_monotone(ray_session):
    from document_extractor_ray.functions.textstats import vocab_coverage_curve

    rows = vocab_coverage_curve(SF).to_pylist()
    assert [r["k"] for r in rows] == [1, 2, 4, 8, 16]
    covs = [r["coverage_permille"] for r in rows]
    assert covs == sorted(covs)
    assert all(0 < c <= 1000 for c in covs)
    # the top type can never cover more than its rank share allows less
    # than the uniform floor: with V types, top-k covers >= k/V of mass
    toks = [r["covered_tokens"] for r in rows]
    assert toks == sorted(toks)


def test_kendall_pair_partition(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import hour_value_kendall

    r = hour_value_kendall(SF).to_pylist()[0]
    n = duckdb.sql(f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert r["n"] == n
    total_pairs = n * (n - 1) // 2
    assert (
        r["concordant"]
        + r["discordant"]
        + r["ties_x_only"]
        + r["ties_y_only"]
        + r["ties_both"]
        == total_pairs
    )
    assert all(r[k] >= 0 for k in r)


def test_cvm_completes_drift_trilogy(ray_session):
    from document_extractor_ray.functions.textstats import (
        source_length_cvm_matrix,
        source_length_ks_matrix,
    )

    cvm = {(r["source_a"], r["source_b"]): r for r in source_length_cvm_matrix(SF).to_pylist()}
    ks = {(r["source_a"], r["source_b"]): r for r in source_length_ks_matrix(SF).to_pylist()}
    assert set(cvm) == set(ks)
    for k, r in cvm.items():
        assert r["cvm_num"] >= 0
        # CvM is bounded by N * ks_num^2 (sup bound on every term)
        n_pool = r["n_a"] + r["n_b"]
        assert r["cvm_num"] <= n_pool * ks[k]["ks_num"] ** 2


def test_fd_audit_truth(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import fd_violation_audit

    rows = {r["fd"]: r for r in fd_violation_audit(SF).to_pylist()}
    # orderkey is a real PK: an FD with a key lhs must hold -> check a
    # known-violated rule against direct recomputation instead
    truth = duckdb.sql(f"""
        SELECT count(*), count(*) FILTER (WHERE k > 1), max(k)
        FROM (SELECT p_brand, count(DISTINCT p_type) k
              FROM '{SF}/part.parquet' GROUP BY 1)
    """).fetchone()
    r = rows["part.p_brand->p_type"]
    assert (r["n_groups"], r["n_violating"], r["max_rhs_variety"]) == truth
    assert r["holds"] == (truth[1] == 0)


def test_lorenz_monotone_convex(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import user_spend_lorenz

    rows = user_spend_lorenz(SF).to_pylist()
    total_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert sum(r["n_users"] for r in rows) == total_users
    shares = [r["cum_share_permille"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1000
    # Lorenz curve sits below the diagonal: decile d cumulative share
    # <= (d+1)/10 of total (ranked ascending)
    for r in rows:
        assert r["cum_share_permille"] <= (r["decile"] + 1) * 100 + 1


def test_segment_repeat_wilson_bounds(ray_session):
    from document_extractor_ray.functions.analytics import segment_repeat_wilson

    rows = segment_repeat_wilson(SF).to_pylist()
    lbs = [r["wilson_lb_micro"] for r in rows]
    assert lbs == sorted(lbs, reverse=True)
    for r in rows:
        assert 0 <= r["n_repeat"] <= r["n_customers"]
        # Wilson lower bound never exceeds the raw rate
        assert r["wilson_lb_micro"] * r["n_customers"] <= 1_000_000 * r["n_repeat"]


def test_pettitt_matches_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import pettitt_changepoint

    row = pettitt_changepoint(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT date_trunc('day', ts) AS d, count(*) AS n"
        f" FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [n for _, n in daily]
    n = len(y)
    assert row["n_days"] == n
    # brute-force U_t from the definition
    us = []
    for t in range(1, n):
        u = sum(
            (y[i] > y[j]) - (y[i] < y[j])
            for i in range(t)
            for j in range(t, n)
        )
        us.append(u)
    k = max(abs(u) for u in us)
    star = next(i for i, u in enumerate(us) if abs(u) == k)
    assert row["k_stat"] == k
    assert row["u_at_star"] == us[star]
    got_day = row["day_star"]
    if hasattr(got_day, "date"):
        got_day = got_day.date()
    assert got_day == daily[star][0]
    assert row["significant"] in (0, 1)


def test_simpson_audit_consistency(ray_session):
    from document_extractor_ray.functions.analytics import simpson_paradox_audit

    rows = simpson_paradox_audit(SF).to_pylist()
    segs = {r["segment"]: r for r in rows}
    assert "ALL" in segs
    assert segs["ALL"]["n_cust"] == sum(
        r["n_cust"] for r in rows if r["segment"] != "ALL"
    )
    assert segs["ALL"]["flip"] == 0  # pooled row can't contradict itself
    for r in rows:
        assert r["cov_sign"] in (-1, 0, 1)
        if r["flip"]:
            assert r["cov_sign"] == -segs["ALL"]["cov_sign"]
        if r["cov_sign"] == 0:
            assert r["cov_abs_pp"] == 0


def test_holt_matches_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import holt_linear_forecast

    row = holt_linear_forecast(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT epoch_us(o_orderdate) // 86400000000 AS d,"
        f" CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
        f" FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [v for _, v in daily]
    lev, tr, sae = 1000 * y[0], 1000 * (y[1] - y[0]), 0
    for t in range(1, len(y)):
        pred = lev + tr
        sae += abs(1000 * y[t] - pred)
        new_lev = (2000 * y[t] + 8 * pred) // 10
        tr = ((new_lev - lev) + 9 * tr) // 10
        lev = new_lev
    assert row["n_days"] == len(y)
    assert (row["level_milli"], row["trend_milli"], row["sae_milli"]) == (
        lev,
        tr,
        sae,
    )
    assert row["f7_milli"] - row["f1_milli"] == 6 * row["trend_milli"]


def test_l_moments_match_sorted_definition(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import l_moments_profile

    rows = {r["event_type"]: r for r in l_moments_profile(SF).to_pylist()}
    raw = duckdb.sql(
        f"SELECT event_type, CAST(round(value * 100.0) AS BIGINT)"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    by_type: dict = {}
    for et, x in raw:
        by_type.setdefault(et, []).append(x)

    def fdiv(a, n):
        return (a - ((a % n + n) % n)) // n

    for et, xs in by_type.items():
        xs.sort()
        n = len(xs)
        s0 = sum(xs)
        s1 = sum(i * x for i, x in enumerate(xs))
        s2 = sum(i * (i - 1) * x for i, x in enumerate(xs))
        s3 = sum(i * (i - 1) * (i - 2) * x for i, x in enumerate(xs))
        l2num = 2 * s1 - (n - 1) * s0
        l3num = 6 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0
        l4num = (
            20 * s3
            - 30 * (n - 3) * s2
            + 12 * (n - 2) * (n - 3) * s1
            - (n - 1) * (n - 2) * (n - 3) * s0
        )
        r = rows[et]
        assert r["n"] == n
        assert r["l1_micro"] == fdiv(1_000_000 * s0, n)
        assert r["l2_micro"] == fdiv(1_000_000 * l2num, n * (n - 1))
        assert r["tau3_micro"] == fdiv(1_000_000 * l3num, l2num * (n - 2))
        assert r["tau4_micro"] == fdiv(
            1_000_000 * l4num, l2num * (n - 2) * (n - 3)
        )
        # Hosking bounds: lambda2 > 0, |tau3| < 1, tau4 < 1
        assert r["l2_micro"] > 0
        assert abs(r["tau3_micro"]) <= 1_000_000
        assert r["tau4_micro"] <= 1_000_000


def test_dsir_excludes_target_and_orders(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import (
        dsir_importance_weights,
    )

    df = dsir_importance_weights(SF).to_pandas()
    target = duckdb.sql(
        f"SELECT min(source) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert len(df) == 100
    assert (df["source"] != target).all()
    w = df["dsir_micro"].tolist()
    assert w == sorted(w, reverse=True)
    assert (df["n_tok"] > 0).all()
    # brute-force recompute of the top doc's weight from raw tokens
    import math as m
    import re as _re

    top = df.iloc[0]
    toks_all = duckdb.sql(
        f"SELECT doc_id, source, lower(text) FROM '{SF}/documents.parquet'"
    ).fetchall()
    cr: dict = {}
    ct: dict = {}
    doc_toks = None
    for doc_id, source, text in toks_all:
        toks = [t for t in _re.split("[^a-z0-9]+", text) if t]
        for t in toks:
            cr[t] = cr.get(t, 0) + 1
            if source == target:
                ct[t] = ct.get(t, 0) + 1
        if doc_id == top["doc_id"]:
            doc_toks = toks

    def L(v):
        return int(m.floor(m.log(v) * 1_000_000 + 0.5))

    nr, nt, v = sum(cr.values()), sum(ct.values()), len(cr)
    shift = L(nr + v) - L(nt + v)
    want = sum(L(ct.get(t, 0) + 1) - L(cr[t] + 1) for t in doc_toks) + len(
        doc_toks
    ) * shift
    assert int(top["dsir_micro"]) == want
    assert int(top["n_tok"]) == len(doc_toks)


def test_burrows_delta_invariants(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import (
        burrows_delta_sources,
    )

    df = burrows_delta_sources(SF).to_pandas()
    n_src = duckdb.sql(
        f"SELECT count(DISTINCT source) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert len(df) == n_src * (n_src - 1) // 2
    assert (df["delta_micro"] >= 0).all()
    assert df["n_terms"].nunique() == 1
    assert (df["source_a"] < df["source_b"]).all()
    # identical-pair sanity: distance to self would be zero; nearest
    # pair must be strictly below the farthest unless degenerate
    assert df["delta_micro"].min() <= df["delta_micro"].max()


def test_isotonic_monotone_and_conserving(ray_session):
    from document_extractor_ray.functions.textstats import isotonic_calibration

    rows = isotonic_calibration(SF).to_pylist()
    rates = [(r["fit_pos"], r["fit_n"]) for r in rows]
    # fitted rates monotone non-decreasing (cross-multiplied)
    for (p1, n1), (p2, n2) in zip(rates, rates[1:]):
        assert p1 * n2 <= p2 * n1
    # pools conserve mass: within a pool, raw sums equal the fit pair
    import itertools

    for (fp, fn), grp in itertools.groupby(rows, key=lambda r: (r["fit_pos"], r["fit_n"])):
        g = list(grp)
        assert sum(r["n_pos"] for r in g) == fp
        assert sum(r["n_docs"] for r in g) == fn
    for r in rows:
        assert r["fit_rate_permille"] == 1000 * r["fit_pos"] // r["fit_n"]


def test_cochran_armitage_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import cochran_armitage_trend

    row = cochran_armitage_trend(SF).to_pylist()[0]
    yrs = duckdb.sql(
        f"SELECT year(o_orderdate), count(*),"
        f" sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
        f" FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    nn = sum(n for _, n, _ in yrs)
    rr = sum(r for _, _, r in yrs)
    t_n = sum(w * (r * nn - n * rr) for w, (_, n, r) in enumerate(yrs))
    sw2n = sum(w * w * n for w, (_, n, _) in enumerate(yrs))
    swn = sum(w * n for w, (_, n, _) in enumerate(yrs))
    var_n3 = rr * (nn - rr) * (nn * sw2n - swn * swn)
    assert row["n_groups"] == len(yrs)
    assert (row["n_total"], row["r_total"], row["t_n"]) == (nn, rr, t_n)
    want_z2 = (1_000_000 * t_n * t_n * nn) // var_n3 if var_n3 > 0 else 0
    assert row["z2_micro"] == want_z2


def test_chao1_bounds_and_spectrum(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import chao1_richness

    rows = chao1_richness(SF).to_pylist()
    want = duckdb.sql(
        f"""
        WITH tok AS (SELECT lang, unnest(regexp_split_to_array(lower(text),
                     '[^a-z0-9]+')) AS t FROM '{SF}/documents.parquet'),
        tk AS (SELECT lang, t FROM tok WHERE t <> ''),
        c AS (SELECT lang, t, count(*) AS c FROM tk GROUP BY 1,2)
        SELECT lang, count(*),
               sum(CASE WHEN c=1 THEN 1 ELSE 0 END),
               sum(CASE WHEN c=2 THEN 1 ELSE 0 END)
        FROM c GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert len(rows) == len(want)
    for r, (lang, s, f1, f2) in zip(rows, want):
        assert (r["lang"], r["s_obs"], r["f1"], r["f2"]) == (lang, s, f1, f2)
        # estimator never below the observed richness
        assert r["chao1_micro"] >= 1_000_000 * r["s_obs"]


def test_alias_table_mass_invariant(ray_session):
    from document_extractor_ray.functions.training import alias_table_plan

    rows = alias_table_plan(SF).to_pylist()
    k = len(rows)
    total = sum(r["n_docs"] for r in rows)
    mass = {r["source"]: 0 for r in rows}
    for r in rows:
        assert 0 <= r["threshold_num"] <= total
        assert r["weight_k"] == k * r["n_docs"]
        mass[r["source"]] += r["threshold_num"]
        if r["alias_source"] != r["source"]:
            mass[r["alias_source"]] += total - r["threshold_num"]
    for r in rows:
        # per-cell mass reproduces the source distribution exactly
        assert mass[r["source"]] == r["weight_k"]
        if r["threshold_num"] == total:
            assert r["alias_source"] == r["source"]


def test_bloom_sweep_monotone_fpp(ray_session):
    from document_extractor_ray.functions.analytics import bloom_fpp_sweep

    rows = bloom_fpp_sweep(SF).to_pylist()
    assert [r["m_bits"] for r in rows] == [4096, 16384, 65536]
    for r in rows:
        assert 0 <= r["n_false_pos"] <= r["n_probes"]
        # k=2 hashes cannot set more than 2 bits per member
        assert r["bits_set"] <= min(2 * r["n_members"], r["m_bits"])
        assert r["n_probes"] > 0
    # larger filters can only reduce the measured false-positive count
    fps = [r["n_false_pos"] for r in rows]
    assert fps[0] >= fps[1] >= fps[2] or fps[0] >= fps[2]


def test_haar_energy_decomposition(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import haar_energy_daily

    rows = haar_energy_daily(SF).to_pylist()
    daily = duckdb.sql(
        f"SELECT epoch_us(o_orderdate) // 86400000000 AS d,"
        f" CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
        f" FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [v for _, v in daily]
    lmax = len(y).bit_length() - 1
    use = y[: 1 << lmax]
    assert [r["level"] for r in rows] == list(range(1, lmax + 1))
    # recompute level-1 energy by brute force
    e1 = sum((use[2 * j] - use[2 * j + 1]) ** 2 for j in range(len(use) // 2))
    te = 0
    cur = use
    es = []
    while len(cur) > 1:
        d = [cur[2 * j] - cur[2 * j + 1] for j in range(len(cur) // 2)]
        cur = [cur[2 * j] + cur[2 * j + 1] for j in range(len(cur) // 2)]
        e = sum(v * v for v in d)
        es.append(e)
        te += e
    assert es[0] == e1
    for r, e in zip(rows, es):
        assert r["energy_permille"] == 1000 * e // te
        assert r["n_coeffs"] == (1 << lmax) >> r["level"]
    # shares sum to <= 1000 (floor) and within rounding of 1000
    s = sum(r["energy_permille"] for r in rows)
    assert 1000 - len(rows) <= s <= 1000


def test_capture_recapture_sanity(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import (
        capture_recapture_users,
    )

    row = capture_recapture_users(SF).to_pylist()[0]
    true_n = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert row["n_true"] == true_n
    assert row["m_both"] <= min(row["n1"], row["n2"])
    # every user is in at least one window
    assert row["n1"] + row["n2"] - row["m_both"] == true_n
    # Chapman is consistent: estimate at least the observed union
    assert row["chapman_est"] >= row["m_both"]
    assert row["coverage_permille"] == 1000 * row["chapman_est"] // true_n
    assert row["var_floor"] >= 0


def test_acf_peak_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import acf_peak_period

    rows = acf_peak_period(SF).to_pylist()
    daily = duckdb.sql(
        f"SELECT date_trunc('day', ts), count(*) FROM '{SF}/events.parquet'"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [n for _, n in daily]
    n, s = len(y), sum(y)
    z = [n * v - s for v in y]
    for r in rows:
        k = r["lag"]
        want = sum(z[t] * z[t + k] for t in range(n - k))
        assert r["acov_num"] == want
        assert r["n_pairs"] == n - k
    assert sum(r["is_peak"] for r in rows) == 1
    peak = next(r for r in rows if r["is_peak"])
    for r in rows:
        # peak maximizes the per-pair-normalized autocovariance
        assert r["acov_num"] * peak["n_pairs"] <= peak["acov_num"] * r["n_pairs"]


def test_sprt_walk_bruteforce(ray_session):
    import duckdb
    import math as m

    from document_extractor_ray.functions.analytics import sprt_daily_decision

    row = sprt_daily_decision(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT date_trunc('day', ts),"
        f" sum(CASE WHEN value >= 30.0 THEN 1 ELSE 0 END), count(*)"
        f" FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()

    def L(v):
        return int(m.floor(m.log(v) * 1_000_000 + 0.5))

    up, dn, thr = L(11) - L(10), L(9) - L(10), L(19)
    cum, dec, idx = 0, "continue", len(daily)
    llr = None
    for i, (_, k, n) in enumerate(daily):
        cum += k * up + (n - k) * dn
        if llr is None and cum >= thr:
            dec, idx, llr = "accept_h1", i + 1, cum
        elif llr is None and cum <= -thr:
            dec, idx, llr = "accept_h0", i + 1, cum
    if llr is None:
        llr = cum
    assert row["decision"] == dec
    assert row["days_to_decision"] == idx
    assert row["llr_micro"] == llr
    assert row["n_days"] == len(daily)


def test_heaps_fit_bruteforce(ray_session):
    import duckdb
    import math as m

    from document_extractor_ray.functions.textstats import heaps_law_fit

    row = heaps_law_fit(SF).to_pylist()[0]
    pts = duckdb.sql(
        f"""
        WITH mx AS (SELECT max(doc_id) AS m FROM '{SF}/documents.parquet'),
        tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text),
                '[^a-z0-9]+')) AS t FROM '{SF}/documents.parquet'),
        tk AS (SELECT doc_id, t FROM tok WHERE t <> '')
        SELECT g.cp,
               (SELECT count(*) FROM tk, mx
                WHERE doc_id <= g.cp * mx.m // 10),
               (SELECT count(DISTINCT t) FROM tk, mx
                WHERE doc_id <= g.cp * mx.m // 10)
        FROM (SELECT unnest(generate_series(1, 10)) AS cp) g ORDER BY 1
        """
    ).fetchall()

    def L(v):
        return int(m.floor(m.log(v) * 1_000_000 + 0.5))

    xs = [L(cn) for _, cn, cv in pts if cn > 0 and cv > 0]
    ys = [L(cv) for _, cn, cv in pts if cn > 0 and cv > 0]
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    num = sum((k * x - sx) * (k * y - sy) for x, y in zip(xs, ys))
    den = sum((k * x - sx) ** 2 for x in xs)
    want = (1_000_000 * num) // den if den else 0
    assert row["n_points"] == k
    assert row["beta_micro"] == want
    # closed synthetic vocab saturates at the first checkpoint: the
    # exponent must be tiny-to-zero, never superlinear
    assert 0 <= row["beta_micro"] < 1_000_000
    assert row["ybar_micro"] < row["xbar_micro"]


def test_gini_split_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import gini_split_scan

    row = gini_split_scan(SF).to_pylist()[0]
    bins = duckdb.sql(
        f"""
        WITH s AS (
          SELECT CASE WHEN length(text) > 0
                 THEN (1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                      // length(text) ELSE 0 END AS score,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM '{SF}/documents.parquet')
        SELECT least(score // 10, 99), count(*), sum(pos)
        FROM s GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    tn = sum(n for _, n, _ in bins)
    tp = sum(p for _, _, p in bins)
    best = None
    cn = cp = 0
    for b, n, p in bins[:-1]:
        cn += n
        cp += p
        nl, nr, pl, pr = cn, tn - cn, cp, tp - cp
        if nl == 0 or nr == 0:
            continue
        al = pl * pl + (nl - pl) ** 2
        ar = pr * pr + (nr - pr) ** 2
        num, den = al * nr + ar * nl, nl * nr
        if best is None or num * best[1] > best[0] * den:
            best = (num, den, b, nl, pl)
    assert (row["split_bin"], row["n_left"], row["pos_left"]) == (
        best[2],
        best[3],
        best[4],
    )
    # a real split always improves or matches the parent impurity
    assert row["gain_micro"] >= 0


def test_fd_bin_plan_consistency(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import fd_bin_width_plan

    row = fd_bin_width_plan(SF).to_pylist()[0]
    cents = [
        v
        for (v,) in duckdb.sql(
            f"SELECT CAST(round(value * 100.0) AS BIGINT)"
            f" FROM '{SF}/events.parquet'"
        ).fetchall()
    ]
    cents.sort()
    n = len(cents)
    assert row["n"] == n
    assert row["q1_cents"] == cents[(n + 3) // 4 - 1]
    assert row["q3_cents"] == cents[(3 * n + 3) // 4 - 1]
    c = row["cbrt_n"]
    assert c**3 <= n < (c + 1) ** 3
    assert row["h_milli"] == 2000 * row["iqr_cents"] // c
    rng = cents[-1] - cents[0]
    assert row["n_bins"] == (rng * c + 2 * row["iqr_cents"] - 1) // (
        2 * row["iqr_cents"]
    )


def test_wilcoxon_identity_and_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import wilcoxon_signed_rank

    row = wilcoxon_signed_rank(SF).to_pylist()[0]
    # rank-sum identity in the x2 scale
    assert row["w_plus2"] + row["w_minus2"] == row["n_eff"] * (row["n_eff"] + 1)
    daily = duckdb.sql(
        f"SELECT date_trunc('day', ts), count(*) FROM '{SF}/events.parquet'"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [n for _, n in daily]
    h = len(y) // 2
    diffs = [b - a for a, b in zip(y[:h], y[len(y) - h :])]
    nz = [d for d in diffs if d != 0]
    assert row["n_pairs"] == h
    assert row["n_eff"] == len(nz)
    assert row["n_zero"] == h - len(nz)
    # brute-force W+ with doubled midranks
    srt = sorted(abs(d) for d in nz)
    w_plus2 = 0
    for d in nz:
        if d > 0:
            a = srt.index(abs(d)) + 1
            b = a + srt.count(abs(d)) - 1
            w_plus2 += a + b
    assert row["w_plus2"] == w_plus2


def test_holt_winters_seasonal_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import holt_winters_seasonal

    row = holt_winters_seasonal(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT epoch_us(o_orderdate) // 86400000000,"
        f" CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
        f" FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [v for _, v in daily]
    n = len(y)

    def fdiv(a, m):
        return (a - ((a % m + m) % m)) // m

    lev = fdiv(1000 * sum(y[:7]), 7)
    st = [1000 * y[i] - lev for i in range(7)]
    sae = 0
    for t in range(7, n):
        sm7 = st[0]
        sae += abs(1000 * y[t] - (lev + sm7))
        lnew = fdiv(2 * (1000 * y[t] - sm7) + 8 * lev, 10)
        snew = fdiv((1000 * y[t] - lnew) + 9 * sm7, 10)
        st = st[1:] + [snew]
        lev = lnew
    assert (row["n_days"], row["level_milli"], row["sae_milli"]) == (n, lev, sae)
    for j in range(7):
        assert row[f"s{(n - 7 + j) % 7}_milli"] == st[j]
    # seasonal offsets roughly cancel: their sum is far smaller than
    # the level (additive decomposition sanity)
    assert abs(sum(st)) < 7 * abs(lev)


def test_friedman_rank_identity(ray_session):
    from document_extractor_ray.functions.analytics import friedman_dow_test

    row = friedman_dow_test(SF).to_pylist()[0]
    n = row["n_weeks"]
    r2 = [row[f"r2_dow{j}"] for j in range(7)]
    # doubled within-week ranks sum to k(k+1) = 56 per complete week
    assert sum(r2) == 56 * n
    assert row["q_micro"] >= 0
    want = (1_000_000 * 3 * sum((r - 8 * n) ** 2 for r in r2)) // (56 * n)
    assert row["q_micro"] == want


def test_bartels_vn_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import bartels_rank_vn

    row = bartels_rank_vn(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT date_trunc('day', ts), count(*) FROM '{SF}/events.parquet'"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [n for _, n in daily]
    n = len(y)
    srt = sorted(y)
    r2 = []
    for v in y:
        a = srt.index(v) + 1
        b = a + srt.count(v) - 1
        r2.append(a + b)
    nm = sum((a - b) ** 2 for a, b in zip(r2, r2[1:]))
    den = sum((r - (n + 1)) ** 2 for r in r2)
    assert (row["n_days"], row["nm"], row["den"]) == (n, nm, den)
    assert row["rvn_micro"] == (1_000_000 * nm) // den
    # doubled-rank mean identity
    assert sum(r2) == n * (n + 1)


def test_eoq_exact_sqrt(ray_session):
    import math

    from document_extractor_ray.functions.analytics import eoq_plan

    rows = eoq_plan(SF).to_pylist()
    assert len(rows) == 20
    ds = [r["d_total"] for r in rows]
    assert ds == sorted(ds, reverse=True)
    for r in rows:
        e = r["eoq"]
        assert e * e <= 200 * r["d_total"] < (e + 1) * (e + 1)
        assert e == math.isqrt(200 * r["d_total"])
        assert r["n_orders"] == (r["d_total"] + e - 1) // e


def test_page_trend_vs_friedman_blocks(ray_session):
    from document_extractor_ray.functions.analytics import (
        friedman_dow_test,
        page_trend_weeks,
    )

    page = page_trend_weeks(SF).to_pylist()[0]
    fried = friedman_dow_test(SF).to_pylist()[0]
    # same complete-week blocking
    assert page["n_weeks"] == fried["n_weeks"]
    k = page["n_weeks"]
    # doubled ranks per block sum to k(k+1); L2 is bounded by the
    # extreme orderings: min = sum of j * (doubled rank sorted desc)
    lo = 7 * sum((j + 1) * (2 * (k - j)) for j in range(k))
    hi = 7 * sum((j + 1) * (2 * (j + 1)) for j in range(k))
    assert lo <= page["l2_stat"] <= hi
    assert page["l2_null_mean"] == 7 * k * (k + 1) ** 2 // 2
    assert page["rising"] in (0, 1)


def test_bowley_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import bowley_skew_by_type

    rows = {r["event_type"]: r for r in bowley_skew_by_type(SF).to_pylist()}
    raw = duckdb.sql(
        f"SELECT event_type, CAST(round(value * 100.0) AS BIGINT)"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    by: dict = {}
    for et, c in raw:
        by.setdefault(et, []).append(c)
    for et, xs in by.items():
        xs.sort()
        n = len(xs)
        q1 = xs[(n + 3) // 4 - 1]
        q2 = xs[(n + 1) // 2 - 1]
        q3 = xs[(3 * n + 3) // 4 - 1]
        r = rows[et]
        assert (r["q1_cents"], r["q2_cents"], r["q3_cents"]) == (q1, q2, q3)
        assert q1 <= q2 <= q3
        # Bowley skew is bounded in [-1, 1]
        assert -1_000_000 <= r["bowley_micro"] <= 1_000_000


def test_gains_curve_invariants(ray_session):
    from document_extractor_ray.functions.textstats import gains_curve_deciles

    rows = gains_curve_deciles(SF).to_pylist()
    assert [r["decile"] for r in rows] == list(range(10))
    shares = [r["cum_pos_share_permille"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1000
    # gains curve dominates the diagonal for a useful score... or at
    # least the counts are conserved
    total = sum(r["n_docs"] for r in rows)
    assert total > 0
    assert sum(r["n_pos"] for r in rows) > 0


def test_cosine_histogram_invariants(ray_session):
    import duckdb

    from document_extractor_ray.functions.similarity import (
        cosine_pair_histogram,
    )

    rows = cosine_pair_histogram(SF).to_pylist()
    assert [r["bin"] for r in rows] == list(range(20))
    n_sample = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'"
        f" WHERE (vec_id * 2654435761) % 4294967296 % 8 = 0"
    ).fetchone()[0]
    # every unordered sample pair lands in exactly one bin
    assert sum(r["n_pairs"] for r in rows) == n_sample * (n_sample - 1) // 2
    assert rows[0]["lo_micro"] == -1_000_000
    assert rows[-1]["lo_micro"] == 900_000


def test_late_materialization_arithmetic(ray_session):
    from document_extractor_ray.functions.analytics import (
        late_materialization_audit,
    )

    rows = late_materialization_audit(SF).to_pylist()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_rows"]
        assert r["late_bytes"] <= r["early_bytes"]
        wf = 4 if "shipdate" in r["predicate"] else 8
        assert r["early_bytes"] == r["n_rows"] * (wf + 24)
        assert r["late_bytes"] == r["n_rows"] * wf + r["n_pass"] * 24
        assert (
            r["saving_permille"]
            == 1000 * (r["early_bytes"] - r["late_bytes"]) // r["early_bytes"]
        )


def test_siegel_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import (
        siegel_repeated_medians,
    )

    row = siegel_repeated_medians(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT epoch_us(date_trunc('day', ts)) // 86400000000, count(*)"
        f" FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    x = [a for a, _ in daily]
    y = [b for _, b in daily]
    n = len(x)

    def fdiv(a, m):
        return (a - ((a % m + m) % m)) // m

    def med(vals):
        v = sorted(vals)
        return v[(len(v) + 1) // 2 - 1]

    med_i = [
        med(
            fdiv(1_000_000 * (y[j] - y[i]), x[j] - x[i])
            for j in range(n)
            if j != i
        )
        for i in range(n)
    ]
    assert row["n_days"] == n
    assert row["slope_micro_per_day"] == med(med_i)
    assert row["min_day_median"] == min(med_i)
    assert row["max_day_median"] == max(med_i)
    assert row["min_day_median"] <= row["slope_micro_per_day"] <= row["max_day_median"]


def test_powerlaw_fit_consistency(ray_session):
    import math

    from document_extractor_ray.functions.dedup import (
        dup_graph_degree_hist_docs,
        powerlaw_degree_fit,
    )

    row = powerlaw_degree_fit(SF).to_pylist()[0]
    hist = dup_graph_degree_hist_docs(SF)
    pts = [
        (int(d), int(c))
        for d, c in zip(hist["degree"].to_pylist(), hist["n_docs"].to_pylist())
        if int(d) >= 1 and int(c) >= 1
    ]
    assert row["n_points"] == len(pts)
    if len(pts) >= 2:

        def L(v):
            return int(math.floor(math.log(v) * 1_000_000 + 0.5))

        m = len(pts)
        xs = [L(d) for d, _ in pts]
        ys = [L(c) for _, c in pts]
        sx, sy = sum(xs), sum(ys)
        num = sum((m * x - sx) * (m * y - sy) for x, y in zip(xs, ys))
        den = sum((m * x - sx) ** 2 for x in xs)
        want = -((1_000_000 * num - ((1_000_000 * num % den + den) % den)) // den) if den else 0
        assert row["alpha_micro"] == want
    else:
        assert row["alpha_micro"] == 0


def test_retention_halflife_consistency(ray_session):
    from document_extractor_ray.functions.analytics import (
        retention_cohort_matrix,
        retention_halflife_fit,
    )

    row = retention_halflife_fit(SF).to_pylist()[0]
    tri = retention_cohort_matrix(SF)
    diag: dict = {}
    for cw, w, n in zip(
        tri["cohort_week"].to_pylist(),
        tri["week"].to_pylist(),
        tri["n_users"].to_pylist(),
    ):
        diag[w - cw] = diag.get(w - cw, 0) + n
    assert row["retained_week0"] == diag.get(0, 0)
    assert row["n_points"] == sum(1 for k, v in diag.items() if k >= 1 and v > 0)
    # retention decays: slope non-positive, half-life sane when defined
    if row["slope_micro"] < 0:
        assert row["halflife_micro_weeks"] > 0


def test_fightin_words_symmetry(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import fightin_words

    rows = fightin_words(SF).to_pylist()
    assert len(rows) == 20
    deltas = [r["delta_micro"] for r in rows]
    assert deltas == sorted(deltas, reverse=True)
    a, b = duckdb.sql(
        f"SELECT min(source), max(source) FROM '{SF}/documents.parquet'"
    ).fetchone()
    assert a != b
    for r in rows:
        # top-A tokens lean toward corpus A in raw rate too (weakly:
        # positive delta requires y_a+1 share above y_b+1 share up to
        # the prior; check the variance formula exactly)
        want_var = (1_000_000 * (r["y_a"] + 1 + r["y_b"] + 1)) // (
            (r["y_a"] + 1) * (r["y_b"] + 1)
        )
        assert r["var_micro"] == want_var


def test_pr_sweep_monotone(ray_session):
    from document_extractor_ray.functions.textstats import pr_threshold_sweep

    rows = pr_threshold_sweep(SF).to_pylist()
    assert [r["threshold_decade"] for r in rows] == list(range(10))
    # raising the threshold can only shrink tp and predicted positives
    tps = [r["tp"] for r in rows]
    assert tps == sorted(tps, reverse=True)
    recalls = [r["recall_permille"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    for r in rows:
        assert r["tp"] + r["fn"] == rows[0]["tp"] + rows[0]["fn"]
        assert 0 <= r["precision_permille"] <= 1000
        assert 0 <= r["f1_permille"] <= 1000
    # threshold 0 predicts everything: recall = 1000
    assert rows[0]["recall_permille"] == 1000


def test_seasonal_mk_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import (
        seasonal_mann_kendall,
    )

    row = seasonal_mann_kendall(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT epoch_us(date_trunc('day', ts)) // 86400000000, count(*)"
        f" FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    by_dow: dict = {}
    for d, n in daily:
        by_dow.setdefault(d % 7, []).append(n)
    s_tot = v_tot = used = 0
    for dow, y in by_dow.items():
        n = len(y)
        if n < 2:
            continue
        used += 1
        s_tot += sum(
            (y[j] > y[i]) - (y[j] < y[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties: dict = {}
        for v in y:
            ties[v] = ties.get(v, 0) + 1
        v_tot += n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
        )
    assert (row["n_seasons"], row["s_total"], row["var18_total"]) == (
        used,
        s_tot,
        v_tot,
    )


def test_gries_dp_bounds(ray_session):
    from document_extractor_ray.functions.textstats import gries_dp_dispersion

    rows = gries_dp_dispersion(SF).to_pylist()
    assert len(rows) == 20
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        # DP lives in [0, 1); a frequent common token must be low-DP
        assert 0 <= r["dp_permille"] < 1000
    # the most frequent token is spread across all sources: DP well
    # below the concentrated extreme
    assert rows[0]["dp_permille"] < 900


def test_multi_source_jsd_bounds(ray_session):
    import duckdb
    import math as m

    from document_extractor_ray.functions.textstats import multi_source_jsd

    row = multi_source_jsd(SF).to_pylist()[0]
    k = duckdb.sql(
        f"SELECT count(DISTINCT source) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert row["n_sources"] == k
    # 0 <= JSD <= ln k (micro-nats), up to integer-log rounding slack
    assert row["jsd_micro"] >= -10
    assert row["jsd_micro"] <= int(m.log(k) * 1_000_000) + 10
    assert row["jsd_num_micro"] // row["n_tokens"] - 1 <= row["jsd_micro"]


def test_hoover_matches_lorenz(ray_session):
    from document_extractor_ray.functions.analytics import (
        hoover_index_users,
        user_spend_lorenz,
    )

    row = hoover_index_users(SF).to_pylist()[0]
    lorenz = user_spend_lorenz(SF).to_pylist()
    assert row["n_users"] == sum(r["n_users"] for r in lorenz)
    assert 0 <= row["hoover_permille"] < 1000
    # Hoover = max vertical gap of the Lorenz curve (decile-sampled
    # curve gives a LOWER bound on the exact index)
    max_gap = max(
        (r["decile"] + 1) * 100 - r["cum_share_permille"] for r in lorenz
    )
    assert row["hoover_permille"] >= max_gap - 10


def test_cliffs_delta_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import cliffs_delta_sources

    row = cliffs_delta_sources(SF).to_pylist()[0]
    a, b = duckdb.sql(
        f"SELECT min(source), max(source) FROM '{SF}/documents.parquet'"
    ).fetchone()
    xa = [
        v
        for (v,) in duckdb.sql(
            f"SELECT n_chars FROM '{SF}/documents.parquet' WHERE source = '{a}'"
        ).fetchall()
    ]
    xb = [
        v
        for (v,) in duckdb.sql(
            f"SELECT n_chars FROM '{SF}/documents.parquet' WHERE source = '{b}'"
        ).fetchall()
    ]
    import bisect

    xb.sort()
    num = 0
    for x in xa:
        lo = bisect.bisect_left(xb, x)
        hi = bisect.bisect_right(xb, x)
        num += lo - (len(xb) - hi)
    assert (row["n_a"], row["n_b"], row["delta_num"]) == (len(xa), len(xb), num)
    assert -1_000_000 <= row["delta_micro"] <= 1_000_000


def test_mood_median_counts(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import mood_median_test

    rows = mood_median_test(SF).to_pylist()
    sentinel = next(r for r in rows if r["event_type"] == "__chi2__")
    types = [r for r in rows if r["event_type"] != "__chi2__"]
    assert sentinel["n"] == sum(r["n"] for r in types)
    assert sentinel["n_above_median"] == sum(r["n_above_median"] for r in types)
    # roughly half the pooled mass sits above the lower median
    assert sentinel["n_above_median"] <= sentinel["n"] // 2 + 1
    assert sentinel["chi2_scaled"] >= 0


def test_ansari_bradley_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.textstats import ansari_bradley_scale

    row = ansari_bradley_scale(SF).to_pylist()[0]
    a, b = duckdb.sql(
        f"SELECT min(source), max(source) FROM '{SF}/documents.parquet'"
    ).fetchone()
    pooled = duckdb.sql(
        f"SELECT n_chars, CASE WHEN source = '{a}' THEN 1 ELSE 0 END"
        f" FROM '{SF}/documents.parquet'"
        f" WHERE source IN ('{a}', '{b}') ORDER BY n_chars"
    ).fetchall()
    big_n = len(pooled)
    scores = [min(i + 1, big_n - i) for i in range(big_n)]
    # block-average tie handling, floored per block in micro
    t_micro = 0
    i = 0
    while i < big_n:
        j = i
        while j < big_n and pooled[j][0] == pooled[i][0]:
            j += 1
        a_here = sum(pooled[t][1] for t in range(i, j))
        s_block = sum(scores[i:j])
        m_block = j - i
        if a_here:
            num = 1_000_000 * a_here * s_block
            t_micro += (num - ((num % m_block + m_block) % m_block)) // m_block
        i = j
    assert row["t_micro"] == t_micro
    assert row["n_a"] + row["n_b"] == big_n
    s_total = sum(scores)
    num = 1_000_000 * row["n_a"] * s_total
    assert row["null_mean_micro"] == (
        num - ((num % big_n + big_n) % big_n)
    ) // big_n


def test_runs_up_down_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import runs_up_down_test

    row = runs_up_down_test(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT date_trunc('day', ts), count(*) FROM '{SF}/events.parquet'"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [n for _, n in daily]
    signs = [1 if b > a else -1 for a, b in zip(y, y[1:]) if b != a]
    runs = 0
    prev = 0
    for s in signs:
        if s != prev:
            runs += 1
            prev = s
    assert row["n_eff"] == len(signs) + 1
    assert row["n_runs"] == runs
    assert row["e_runs_x3"] == 2 * row["n_eff"] - 1
    assert row["var_runs_x90"] == 16 * row["n_eff"] - 29


def test_record_count_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import record_count_test

    row = record_count_test(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT date_trunc('day', ts), count(*) FROM '{SF}/events.parquet'"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [n for _, n in daily]
    best, records = None, 0
    for v in y:
        if best is None or v > best:
            records, best = records + 1, v
    assert row["n_days"] == len(y)
    assert row["n_records"] == records
    assert row["expected_micro"] == sum(
        1_000_000 // k for k in range(1, len(y) + 1)
    )
    # the first day is always a record
    assert 1 <= row["n_records"] <= row["n_days"]


def test_ljung_box_bruteforce(ray_session):
    import duckdb

    from document_extractor_ray.functions.analytics import ljung_box_test

    row = ljung_box_test(SF).to_pylist()[0]
    daily = duckdb.sql(
        f"SELECT date_trunc('day', ts), count(*) FROM '{SF}/events.parquet'"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [n for _, n in daily]
    n, s = len(y), sum(y)
    z = [n * v - s for v in y]
    c0 = sum(v * v for v in z)
    q = 0
    used = 0
    for k in range(1, 8):
        if k >= n or c0 == 0:
            break
        used += 1
        ck = sum(z[t] * z[t + k] for t in range(n - k))
        num = 1_000_000 * n * (n + 2) * ck * ck
        den = c0 * c0 * (n - k)
        q += (num - ((num % den + den) % den)) // den
    assert (row["n_days"], row["h_lags"], row["q_micro"]) == (n, used, q)
    assert row["q_micro"] >= 0
