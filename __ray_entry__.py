"""Driver contract for the graft builder (Ray Data target).

``entry()``   — flagship extraction pipeline on /root/testdata/sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
                the training-data operators).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
                query (same column names; integer-exact numerics).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() happens here or in the library.

The extraction queries run over the synthetic Common-Crawl-style pages
table (BASELINE.json input_hint shape), generated deterministically
(seed=42) and scaled to the sf dir's documents row count; extraction
itself is not SQL-expressible, so those entries get the driver's
rows-only check — byte-identity is covered by the pytest goldens
(tests/test_golden_extraction.py).
"""

from __future__ import annotations

import os as _os
import sys as _sys

# Make the package importable no matter the caller's cwd.
_REPO_DIR = _os.path.dirname(_os.path.abspath(__file__))
if _REPO_DIR not in _sys.path:
    _sys.path.insert(0, _REPO_DIR)

import os
from collections.abc import Callable
from typing import Any

_SEED = 42


def _pages_path(sf_dir: str) -> str:
    """Deterministic synthetic pages parquet for this sf, cached in /tmp."""
    import pyarrow.parquet as pq

    from document_extractor_ray import fixtures

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_pages = max(200, n_docs)
    path = f"/tmp/docray_pages_v{fixtures.CORPUS_VERSION}_n{n_pages}_s{_SEED}.parquet"
    if not os.path.exists(path):
        tmp = path + ".tmp"
        table = fixtures.make_pages_table(n_pages, seed=_SEED)
        pq.write_table(table, tmp, row_group_size=256)
        os.replace(tmp, path)
    return path


def _extract_results(sf_dir: str):
    """Flagship extraction in driver-hashable form: RESULTS_SCHEMA with
    spans flattened to canonical JSON (pandas can't hash list<struct>)
    and a total url sort, matching the sequential-oracle golden parquet
    that ``oracle_sql()['extract_results']`` reads back (VERDICT r4
    item 2)."""
    from document_extractor_ray.config import DEFAULT_CONFIG
    from document_extractor_ray.core import records
    from document_extractor_ray.pipelines.extract import run_extraction
    from document_extractor_ray.pipelines.outputs import results_dataset

    final = run_extraction(_pages_path(sf_dir), DEFAULT_CONFIG)
    return results_dataset(final).map_batches(
        records.canonical_results, batch_format="pyarrow"
    ).sort("url")


def _extract_quarantine(sf_dir: str):
    from document_extractor_ray.config import DEFAULT_CONFIG
    from document_extractor_ray.pipelines.extract import run_extraction
    from document_extractor_ray.pipelines.outputs import quarantine_dataset

    final = run_extraction(_pages_path(sf_dir), DEFAULT_CONFIG)
    return quarantine_dataset(final).sort("url")


def _extract_unit_rows(sf_dir: str):
    from document_extractor_ray.config import DEFAULT_CONFIG
    from document_extractor_ray.pipelines.extract import run_extraction
    from document_extractor_ray.pipelines.outputs import unit_rows_dataset

    final = run_extraction(_pages_path(sf_dir), DEFAULT_CONFIG)
    return unit_rows_dataset(final).sort(["url", "page"])


def _curation_pages_path(sf_dir: str) -> str:
    """Planted-duplicate pages parquet for the curation chain (same
    sizing as _pages_path, plus deterministic exact/near dup plants so
    every dedup stage is provably non-vacuous)."""
    import pyarrow.parquet as pq

    from document_extractor_ray import fixtures
    from document_extractor_ray.pipelines import curation

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_pages = max(200, n_docs)
    path = (
        f"/tmp/docray_curpages_v{fixtures.CORPUS_VERSION}."
        f"{curation.CURATION_CHAIN_VERSION}_n{n_pages}_s{_SEED}.parquet"
    )
    if not os.path.exists(path):
        tmp = path + ".tmp"
        table = curation.plant_dup_pages(
            fixtures.make_pages_table(n_pages, seed=_SEED)
        )
        pq.write_table(table, tmp, row_group_size=256)
        os.replace(tmp, path)
    return path


def _curation_chain(sf_dir: str):
    """Flagship curation composition: extract -> C4 quality gate -> PII
    scrub -> exact dedup -> MinHash near-dedup -> decontaminate ->
    pack_sequences, hash-checked end to end against the sequential
    twin's golden parquet (pipelines/curation.py)."""
    from document_extractor_ray import fixtures
    from document_extractor_ray.config import DEFAULT_CONFIG
    from document_extractor_ray.pipelines import curation

    pages = _curation_pages_path(sf_dir)
    n = os.path.basename(pages)
    work = f"/tmp/docray_curwork_{n}"
    r = curation.run_curation(pages, DEFAULT_CONFIG, work_dir=work)
    return curation.packed_to_table(r["packed"])


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    return _extract_results("/root/testdata/sf0.001")


def _driver_checked() -> frozenset:
    """Query names that have appeared in any committed driver
    CORRECTNESS_r*.json.  Used to rotate never-driver-checked queries
    to the front of ``queries()`` so the driver's ~50-query sample
    window drains the verification backlog one round at a time
    (VERDICT r3 item 1); once a round's file lands, its queries fall
    to the back automatically next round."""
    import glob as _glob
    import json as _json

    seen: set[str] = set()
    for path in sorted(_glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                seen.update(_json.load(f).keys())
        except (OSError, ValueError):
            pass
    return frozenset(seen)


def queries() -> dict[str, Callable[[str], Any]]:
    from document_extractor_ray.functions import (
        analytics,
        dedup,
        multimodal,
        similarity,
        textstats,
        training,
    )

    q = {
        # --- extraction pipeline (rows-only; byte-identity in pytest goldens) ---
        "extract_results": _extract_results,
        "extract_quarantine": _extract_quarantine,
        "extract_unit_rows": _extract_unit_rows,
        "curation_chain": _curation_chain,
        # --- round-3 additions (oracled, never driver-sampled) ---
        "fk_orphan_audit": analytics.fk_orphan_audit,
        "mktseg_target_encoding": analytics.mktseg_target_encoding,
        "compaction_plan": training.compaction_plan,
        "token_rank_drift": textstats.token_rank_drift,
        "first_touch_mix": analytics.first_touch_mix,
        "status_lifecycle_matrix": analytics.status_lifecycle_matrix,
        "line_sequencing_audit": analytics.line_sequencing_audit,
        "reorder_interval_quantiles": analytics.reorder_interval_quantiles,
        "top_customer_share_by_year": analytics.top_customer_share_by_year,
        "daily_new_user_share": analytics.daily_new_user_share,
        "type_mix_drift_gtest": analytics.type_mix_drift_gtest,
        "embedding_fisher_dims": similarity.embedding_fisher_dims,
        "brand_rule_metrics": analytics.brand_rule_metrics,
        "transition_gap_median": analytics.transition_gap_median,
        "nation_trade_balance": analytics.nation_trade_balance,
        "orders_margin_waterfall": analytics.orders_margin_waterfall,
        "part_pareto_frontier": analytics.part_pareto_frontier,
        "duplicate_invoice_audit": analytics.duplicate_invoice_audit,
        "price_ending_profile": analytics.price_ending_profile,
        "session_timeout_sweep": analytics.session_timeout_sweep,
        "source_charset_profile": textstats.source_charset_profile,
        "dup_graph_kcore": dedup.dup_graph_kcore_docs,
        "embedding_mmd_labels": similarity.embedding_mmd_labels,
        "hdr_precision_sweep": analytics.hdr_precision_sweep,
        "sample_extrapolation_audit": analytics.sample_extrapolation_audit,
        "event_double_fire_audit": analytics.event_double_fire_audit,
        "littles_law_audit": analytics.littles_law_audit,
        "lineitem_corr_matrix": analytics.lineitem_corr_matrix,
        "embedding_sparsify_audit": similarity.embedding_sparsify_audit,
        "stratified_design_effect": analytics.stratified_design_effect,
        "k_anonymity_audit": analytics.k_anonymity_audit,
        "part_tiering_plan": analytics.part_tiering_plan,
        "value_anova_by_type": analytics.value_anova_by_type,
        "daily_runs_test": analytics.daily_runs_test,
        "lang_trigram_jsd": textstats.lang_trigram_jsd,
        "key_gap_audit": analytics.key_gap_audit,
        "hll_sliding_union_audit": analytics.hll_sliding_union_audit,
        "selectivity_independence_audit": analytics.selectivity_independence_audit,
        "upsert_apply_audit": analytics.upsert_apply_audit,
        "events_two_changepoints": analytics.events_two_changepoints,
        "join_order_cost_audit": analytics.join_order_cost_audit,
        "bitmap_index_plan": analytics.bitmap_index_plan,
        "proximity_search": textstats.proximity_search,
        "quantize_bits_sweep": similarity.quantize_bits_sweep,
        "lm_interpolation_sweep": textstats.lm_interpolation_sweep,
        "rank_corr_audit": textstats.rank_corr_audit,
        "orders_mann_kendall": analytics.orders_mann_kendall,
        "discount_qty_elasticity": analytics.discount_qty_elasticity,
        "user_day_overdispersion": analytics.user_day_overdispersion,
        "kmv_set_ops_audit": analytics.kmv_set_ops_audit,
        "value_theil_decomp": analytics.value_theil_decomp,
        "forecast_mase": analytics.forecast_mase,
        "zorder_layout_audit": analytics.zorder_layout_audit,
        "quality_auc": textstats.quality_auc,
        "qlm_topk": textstats.qlm_topk,
        "token_lang_chi2": textstats.token_lang_chi2,
        "event_trigrams": analytics.event_trigrams,
        "kn_continuation_counts": textstats.kn_continuation_counts,
        "winnowing_fingerprints": textstats.winnowing_fingerprints,
        "doc_simpson_diversity": textstats.doc_simpson_diversity,
        "bloom_decontaminate": dedup.bloom_decontaminate_docs,
        "orders_dow_profile": analytics.orders_dow_profile,
        "phrase_search": textstats.phrase_search,
        "rrf_fusion": textstats.rrf_fusion,
        "events_ewma": analytics.events_ewma,
        "range_partition_plan": textstats.range_partition_plan,
        "winnowing_overlap_pairs": textstats.winnowing_overlap_pairs,
        "negsample_table": textstats.negsample_table,
        "kn_bigram_probs": textstats.kn_bigram_probs,
        "group_shuffle_split": training.group_shuffle_split,
        "source_temperature_mix": training.source_temperature_mix,
        "embedding_outlier_scores": similarity.embedding_outlier_scores,
        "events_rolling_median": analytics.events_rolling_median,
        "hill_tail_index": textstats.hill_tail_index,
        "hdr_quantile_error": analytics.hdr_quantile_error,
        "bbit_minhash_agreement": dedup.bbit_minhash_agreement_docs,
        "char_trigram_lang_profile": textstats.char_trigram_lang_profile,
        "dup_graph_degree_hist": dedup.dup_graph_degree_hist_docs,
        "events_burst_hysteresis": analytics.events_burst_hysteresis,
        "value_winsorized_stats": analytics.value_winsorized_stats,
        "event_markov_stationary": analytics.event_markov_stationary,
        "dup_graph_triangles": dedup.dup_graph_triangles_docs,
        "bpe_apply_stats": textstats.bpe_apply_stats,
        "dedup_cluster_size_hist": dedup.dedup_cluster_size_hist_docs,
        "mutual_knn_pairs": similarity.mutual_knn_pairs,
        "good_turing_counts": textstats.good_turing_counts,
        "hll_estimate_audit": analytics.hll_estimate_audit,
        "orders_trend_decompose": analytics.orders_trend_decompose,
        "churn_hazard_curve": analytics.churn_hazard_curve,
        "simhash_hamming_hist": dedup.simhash_hamming_hist_docs,
        "label_silhouette": similarity.label_silhouette,
        "langid_kappa": textstats.langid_kappa,
        "order_value_pct_by_nation": analytics.order_value_pct_by_nation,
        "join_size_cms_audit": analytics.join_size_cms_audit,
        "lsh_band_histogram": dedup.lsh_band_histogram_docs,
        "padding_waste_plan": training.padding_waste_plan,
        "ccnet_ppl_buckets": textstats.ccnet_ppl_buckets,
        "events_top_changepoint": analytics.events_top_changepoint,
        "kcenter_coreset": similarity.kcenter_coreset,
        "mmr_select": similarity.mmr_select,
        "customer_cohort_ltv": analytics.customer_cohort_ltv,
        "embedding_quantize_audit": similarity.embedding_quantize_audit,
        "positional_xent_profile": textstats.positional_xent_profile,
        "dup_cross_source_stats": dedup.dup_cross_source_stats_docs,
        "ingest_lateness_audit": analytics.ingest_lateness_audit,
        "value_psi_drift": analytics.value_psi_drift,
        "curation_decisions": dedup.curation_decisions,
        "filter_agreement_matrix": dedup.filter_agreement_matrix,
        "simhash_sort_locality": dedup.simhash_sort_locality,
        "session_entry_exit": analytics.session_entry_exit,
        "reservoir_quantile_error": analytics.reservoir_quantile_error,
        "token_budget_allocation": training.token_budget_allocation,
        "encoding_size_audit": analytics.encoding_size_audit,
        "zonemap_prune_audit": analytics.zonemap_prune_audit,
        "hashing_collision_audit": textstats.hashing_collision_audit,
        "jl_distortion_audit": similarity.jl_distortion_audit,
        "shard_rebalance_audit": training.shard_rebalance_audit,
        "partition_checksums": textstats.partition_checksums,
        "order_fact_mart": analytics.order_fact_mart,
        "curation_report_by_source": dedup.curation_report_by_source,
        "watermark_tradeoff": analytics.watermark_tradeoff,
        "order_rank_in_customer": analytics.order_rank_in_customer,
        "epoch_plan": training.epoch_plan,
        "dataset_card": textstats.dataset_card,
        "ship_lag_histogram": analytics.ship_lag_histogram,
        "lang_source_gtest": textstats.lang_source_gtest,
        "user_decile_transition": analytics.user_decile_transition,
        "token_context_entropy": textstats.token_context_entropy,
        "label_medoid": similarity.label_medoid,
        "assign_margin_stats": similarity.assign_margin_stats,
        "semdedup_prune": similarity.semdedup_prune,
        "order_interval_overlaps": analytics.order_interval_overlaps,
        "user_median_gap": analytics.user_median_gap,
        "heavy_hitter_coverage": analytics.heavy_hitter_coverage,
        "user_active_days_histogram": analytics.user_active_days_histogram,
        "argmax_dim_stats": similarity.argmax_dim_stats,
        "shingle_containment_pairs": dedup.shingle_containment_pairs_docs,
        "simhash_bit_balance": dedup.simhash_bit_balance,
        "user_value_trend": analytics.user_value_trend,
        "value_drift_quantiles": analytics.value_drift_quantiles,
        "knn_ivf_indexed": similarity.knn_ivf_indexed,
        "token_burstiness": textstats.token_burstiness,
        "transition_llr": analytics.transition_llr,
        "events_hour_profile": analytics.events_hour_profile,
        "doc_source_lm_gap": textstats.doc_source_lm_gap,
        "value_type_chi2": analytics.value_type_chi2,
        "knn_classify": similarity.knn_classify,
        "name_typo_pairs": dedup.name_typo_pairs,
        "attribution_last_touch": analytics.attribution_last_touch,
        "join_size_exact": analytics.join_size_exact,
        "collocation_llr": textstats.collocation_llr,
        "doc_quality_composite": textstats.doc_quality_composite,
        "pack_efficiency_stats": training.pack_efficiency_stats,
        "tokenizer_fertility": textstats.tokenizer_fertility,
        "persistent_heavy_users": analytics.persistent_heavy_users,
        "shipping_open_orders": analytics.shipping_open_orders,
        "doc_unigram_xent": textstats.doc_unigram_xent,
        "doc_bigram_xent": textstats.doc_bigram_xent,
        "source_lm_divergence": textstats.source_lm_divergence,
        "char_bigram_condent": textstats.char_bigram_condent,
        "key_skew_audit": analytics.key_skew_audit,
        "q12_late_linestatus": analytics.q12_late_linestatus,
        "user_decay_scores": analytics.user_decay_scores,
        "supplier_concentration": analytics.supplier_concentration,
        "events_trend_slope": analytics.events_trend_slope,
        "event_type_affinity": analytics.event_type_affinity,
        "doc_len_token_corr": textstats.doc_len_token_corr,
        "vocab_prune_plan": textstats.vocab_prune_plan,
        "dedup_survivor_stats": dedup.dedup_survivor_stats_docs,
        "cooc_window_pairs": textstats.cooc_window_pairs,
        "doc_prefix_groups": textstats.doc_prefix_groups,
        "user_event_entropy": analytics.user_event_entropy,
        "q8_market_share": analytics.q8_market_share,
        "q21_waiting_suppliers": analytics.q21_waiting_suppliers,
        "value_cusum_alarms": analytics.value_cusum_alarms,
        "zipf_slope_by_lang": textstats.zipf_slope_by_lang,
        "doc_char_entropy": textstats.doc_char_entropy,
        "embedding_dim_corr": similarity.embedding_dim_corr,
        "q4_order_priority": analytics.q4_order_priority,
        "q13_customer_distribution": analytics.q13_customer_distribution,
        "q19_brand_qty_revenue": analytics.q19_brand_qty_revenue,
        "q18_large_orders": analytics.q18_large_orders,
        "q22_acctbal_opportunity": analytics.q22_acctbal_opportunity,
        "user_streaks": analytics.user_streaks,
        "kmv_registers": analytics.kmv_registers,
        "hapax_share": textstats.hapax_share,
        "top_tokens_per_lang": textstats.top_tokens_per_lang,
        "lm_bigram_coverage": textstats.lm_bigram_coverage,
        "users_both_windows": analytics.users_both_windows,
        "curriculum_shards": training.curriculum_shards,
        "centroid_distances": similarity.centroid_distances,
        "interarrival_quantiles": analytics.interarrival_quantiles,
        "spike_days": analytics.spike_days,
        "hashed_bow": textstats.hashed_bow,
        "source_overlap_matrix": dedup.source_overlap_matrix_docs,
        "orders_fill_rate": analytics.orders_fill_rate,
        "rfm_segments": analytics.rfm_segments,
        "knn_recall_audit": similarity.knn_recall_audit,
        "lang_percentiles": textstats.lang_percentiles,
        "conversion_latency": analytics.conversion_latency,
        "events_cube": analytics.events_cube,
        "user_twap": analytics.user_twap,
        "embedding_dim_stats": similarity.embedding_dim_stats,
        "supplier_part_coverage": analytics.supplier_part_coverage,
        "length_blocking_audit": textstats.length_blocking_audit,
        "user_type_gini": analytics.user_type_gini,
        "events_resample_5min": analytics.events_resample_5min,
        "value_autocorr_moments": analytics.value_autocorr_moments,
        "lang_vocab_overlap": textstats.lang_vocab_overlap,
        "langid_agreement_by_source": textstats.langid_agreement_by_source,
        "retention_cohort_matrix": analytics.retention_cohort_matrix,
        "q6_forecast_revenue": analytics.q6_forecast_revenue,
        "q15_top_supplier": analytics.q15_top_supplier,
        "value_benford_profile": analytics.value_benford_profile,
        "revenue_gini_by_nation": analytics.revenue_gini_by_nation,
        "shard_balance_audit": training.shard_balance_audit,
        "mktseg_priority_contingency": analytics.mktseg_priority_contingency,
        "q17_small_qty_revenue": analytics.q17_small_qty_revenue,
        "user_value_drawdown": analytics.user_value_drawdown,
        "token_rarity": textstats.token_rarity,
        "postings_topdf": textstats.postings_topdf,
        "edit_distance_verify": dedup.edit_distance_verify_docs,
        "funnel_counts": analytics.funnel_counts,
        "promo_revenue_monthly": analytics.promo_revenue_monthly,
        "pmi_bigrams": textstats.pmi_bigrams,
        "pareto_docs": textstats.pareto_docs,
        "bpe_merges": textstats.bpe_merges,
        "value_ks_types": analytics.value_ks_types,
        "returned_orders_by_priority": analytics.returned_orders_by_priority,
        "returned_revenue_topk": analytics.returned_revenue_topk,
        "nation_yoy_revenue": analytics.nation_yoy_revenue,
        "part_top_supplier": analytics.part_top_supplier,
        "kgram_novelty": dedup.kgram_novelty_docs,
        "token_gini": textstats.token_gini,
        "vocab_growth": textstats.vocab_growth,
        "range_search": similarity.range_search,
        "kmeans_assign": similarity.kmeans_assign,
        "session_stats": analytics.session_stats,
        "brand_basket_pairs": analytics.brand_basket_pairs,
        "order_lines_histogram": analytics.order_lines_histogram,
        "kwic_term": textstats.kwic_term,
        "lang_confusion": textstats.lang_confusion,
        "value_decile_assign": analytics.value_decile_assign,
        "order_window_event_counts": analytics.order_window_event_counts,
        "customer_order_totals": analytics.customer_order_totals,
        "user_rolling3_sum": analytics.user_rolling3_sum,
        "minhash_calibration": dedup.minhash_calibration_docs,
        "user_top3_events": analytics.user_top3_events,
        "order_date_records": analytics.order_date_records,
        "q5_local_supplier": analytics.q5_local_supplier,
        "cumulative_unique_users": analytics.cumulative_unique_users,
        "table_profile": analytics.table_profile,
        "orders_above_customer_avg": analytics.orders_above_customer_avg,
        "q7_volume_shipping": analytics.q7_volume_shipping,
        "nation_revenue_share": analytics.nation_revenue_share,
        "weighted_sample": analytics.weighted_sample_docs,
        "kmeans_train": similarity.kmeans_train,
        "bootstrap_replicas": analytics.bootstrap_replicas,
        # --- oracled queries the driver has NOT yet sampled (r1+r2
        # correctness files) come first so a capped sample reaches
        # them (VERDICT r2 item 3); all are local-gate green ---
        "quality_filter": textstats.quality_filter,
        "pii_scrub": textstats.pii_scrub,
        "repetition_filter": textstats.repetition_filter,
        "token_histogram": textstats.token_histogram,
        "token_quantiles": textstats.token_quantiles,
        "lang_token_quantiles": textstats.lang_token_quantiles,
        "gopher_rules": textstats.gopher_rules,
        "df_top_tokens": textstats.df_top_tokens,
        "tfidf_top_terms": textstats.tfidf_top_terms,
        "search_topk": textstats.search_topk,
        "bm25_topk": textstats.bm25_topk,
        "bigram_top": textstats.bigram_top,
        "token_cms_registers": textstats.token_cms_registers,
        "char_stats": textstats.char_stats,
        "textrank_keywords": textstats.textrank_keywords,
        "near_dup_clusters": dedup.near_dup_clusters_docs,
        "near_dedup_keep": dedup.near_dedup_keep_docs,
        "decontaminate": dedup.decontaminate_docs,
        "dup_shingle_stats": dedup.dup_shingle_stats_docs,
        "dup_ngram_scrub": dedup.dup_ngram_scrub_docs,
        "embedding_topk_pairs": similarity.embedding_topk_pairs,
        "label_centroids": similarity.label_centroids,
        "pack_assignments": training.pack_assignments_docs,
        "stratified_sample": training.stratified_sample_docs,
        "top_docs_per_lang": training.top_docs_per_lang,
        "source_mix": training.source_mix,
        "domain_cap": training.domain_cap,
        # --- never-sampled no-oracle queries (rows-only check) ---
        "embedding_pca_power": similarity.embedding_pca_power,
        "media_dup_groups": multimodal.media_dup_groups_table,
        "embedding_dup_clusters": dedup.embedding_dup_clusters_embeddings,
        "knn_ivf": similarity.knn_ivf_embeddings,
        "pack_sequences": training.pack_sequences_docs,
        "frame_sample": multimodal.frame_sample,
        # --- generic relational operators (SQL oracles) ---
        "q1_lineitem": analytics.q1_lineitem,
        "top_customers": analytics.top_customers,
        "events_daily": analytics.events_daily,
        "events_sliding_7d": analytics.events_sliding_7d,
        "sessionize": analytics.sessionize,
        "nations_per_region": analytics.nations_per_region,
        "top_k_longest_docs": analytics.top_k_longest_docs,
        "doc_stats": analytics.doc_stats,
        "parts_by_brand": analytics.parts_by_brand,
        "supplier_balance_topk": analytics.supplier_balance_topk,
        "customers_without_orders": analytics.customers_without_orders,
        "order_revenue_by_nation": analytics.order_revenue_by_nation,
        "events_asof_orders": analytics.events_asof_orders,
        "events_prior_hour": analytics.events_prior_hour,
        "q3_shipping": analytics.q3_shipping,
        "events_daily_delta": analytics.events_daily_delta,
        "distinct_users_per_type": analytics.distinct_users_per_type,
        "doc_stats_rollup": analytics.doc_stats_rollup,
        "user_first_last": analytics.user_first_last,
        "hll_user_registers": analytics.hll_user_registers,
        "hash_sample": analytics.hash_sample_docs,
        "hll_daily_registers": analytics.hll_daily_registers,
        "mixture_sample": analytics.mixture_sample,
        "doc_length_percentiles": analytics.doc_length_percentiles,
        "user_event_paths": analytics.user_event_paths,
        "user_cumulative_value": analytics.user_cumulative_value,
        "user_day_delta": analytics.user_day_delta,
        "event_type_pivot": analytics.event_type_pivot,
        "user_lag_gaps": analytics.user_lag_gaps,
        "events_corr_stats": analytics.events_corr_stats,
        "lineitem_semi_bloom": analytics.lineitem_semi_bloom,
        "doc_global_rank": analytics.doc_global_rank,
        "user_modal_type": analytics.user_modal_type,
        "orders_cumulative_revenue": analytics.orders_cumulative_revenue,
        "value_hdr_registers": analytics.value_hdr_registers,
        "train_val_test_split": analytics.train_val_test_split,
        "user_retention": analytics.user_retention,
        "props_json_stats": analytics.props_json_stats,
        "user_activity_360": analytics.user_activity_360,
        "value_mad_by_type": analytics.value_mad_by_type,
        "event_transitions": analytics.event_transitions,
        "sliding_7d_users": analytics.sliding_7d_users,
        "value_outliers": analytics.value_outliers,
        # --- text analysis (SQL oracles where ASCII-expressible) ---
        "token_counts": textstats.token_counts,
        "quality_scores": textstats.quality_scores,
        "lang_id": textstats.lang_id,
        "doc_health": textstats.doc_health,
        "fingerprints": textstats.fingerprints,
        # --- dedup family ---
        "dedup_exact": dedup.dedup_exact_docs,
        "minhash_dup_pairs": dedup.minhash_dup_pairs_docs,
        "simhash": dedup.simhash_table,
        "ngram_jaccard_dups": dedup.ngram_jaccard_dups_docs,
        "embedding_dup_pairs": dedup.embedding_dup_pairs_embeddings,
        # --- similarity search ---
        "knn_brute": similarity.knn_brute_embeddings,
        "knn_lsh": similarity.knn_lsh_embeddings,
        # --- multimodal (stubbed codecs, real Ray plumbing) ---
        "media_features": multimodal.media_features,
        # --- round-4 additions ---
        "length_mannwhitney": analytics.length_mannwhitney,
        "scd2_intervals": analytics.scd2_intervals,
        "daily_theil_sen": analytics.daily_theil_sen,
        "pack_boundary_bigrams": training.pack_boundary_bigrams,
        "neyman_allocation_plan": analytics.neyman_allocation_plan,
        "customer_freq_migration": analytics.customer_freq_migration,
        "witten_bell_bigram": textstats.witten_bell_bigram,
        "length_token_residual_outliers": textstats.length_token_residual_outliers,
        "markov_sequence_surprisal": analytics.markov_sequence_surprisal,
        "pack_optimality_audit": training.pack_optimality_audit,
        "dup_graph_assortativity": dedup.dup_graph_assortativity_docs,
        "incremental_dedup_audit": dedup.incremental_dedup_audit_docs,
        "sample_join_estimator_audit": analytics.sample_join_estimator_audit,
        "orders_bullwhip_audit": analytics.orders_bullwhip_audit,
        "salt_plan_audit": analytics.salt_plan_audit,
        "ship_survival_km": analytics.ship_survival_km,
        "brand_return_wilson": analytics.brand_return_wilson,
        "dict_encoding_audit": analytics.dict_encoding_audit,
        "priority_inversion_audit": analytics.priority_inversion_audit,
        "front_coding_audit": textstats.front_coding_audit,
        "dim_truncation_recall": similarity.dim_truncation_recall,
        "filter_order_plan": dedup.filter_order_plan,
        "hashring_moved_keys": training.hashring_moved_keys,
        "pack_position_source_mix": training.pack_position_source_mix,
        "backlog_aging_snapshot": analytics.backlog_aging_snapshot,
        "daily_qn_scale": analytics.daily_qn_scale,
        "shiplag_cpk_by_priority": analytics.shiplag_cpk_by_priority,
        "readability_profile": textstats.readability_profile,
        "partial_agg_reduction_audit": analytics.partial_agg_reduction_audit,
        "value_kruskal_wallis": analytics.value_kruskal_wallis,
        "topk_threshold_audit": analytics.topk_threshold_audit,
        "quality_calibration_bins": textstats.quality_calibration_bins,
        "presortedness_audit": analytics.presortedness_audit,
        "kfold_balance_audit": analytics.kfold_balance_audit,
        "weekly_top_users": analytics.weekly_top_users,
        "events_median_polish": analytics.events_median_polish,
        "value_did_estimate": analytics.value_did_estimate,
        "label_scatter_stats": similarity.label_scatter_stats,
        "broadcast_plan_audit": analytics.broadcast_plan_audit,
        "source_length_ks_matrix": textstats.source_length_ks_matrix,
        "nation_weighted_median_acctbal": analytics.nation_weighted_median_acctbal,
        "brand_price_realization": analytics.brand_price_realization,
        "lang_run_clustering": textstats.lang_run_clustering,
        "sttr_by_source": textstats.sttr_by_source,
        "one_hit_wonder_rate": analytics.one_hit_wonder_rate,
        "slo_burn_rate": analytics.slo_burn_rate,
        "source_length_emd_matrix": textstats.source_length_emd_matrix,
        "postings_gap_bits": textstats.postings_gap_bits,
        "doclen_embnorm_corr": similarity.doclen_embnorm_corr,
        "span_corruption_plan": training.span_corruption_plan,
        "vocab_coverage_curve": textstats.vocab_coverage_curve,
        "hour_value_kendall": analytics.hour_value_kendall,
        "source_length_cvm_matrix": textstats.source_length_cvm_matrix,
        "fd_violation_audit": analytics.fd_violation_audit,
        "user_spend_lorenz": analytics.user_spend_lorenz,
        "segment_repeat_wilson": analytics.segment_repeat_wilson,
        "pettitt_changepoint": analytics.pettitt_changepoint,
        "simpson_paradox_audit": analytics.simpson_paradox_audit,
        "holt_linear_forecast": analytics.holt_linear_forecast,
        "l_moments_profile": analytics.l_moments_profile,
        "dsir_importance_weights": textstats.dsir_importance_weights,
        "burrows_delta_sources": textstats.burrows_delta_sources,
        "isotonic_calibration": textstats.isotonic_calibration,
        "cochran_armitage_trend": analytics.cochran_armitage_trend,
        "chao1_richness": textstats.chao1_richness,
        "alias_table_plan": training.alias_table_plan,
        "bloom_fpp_sweep": analytics.bloom_fpp_sweep,
        "haar_energy_daily": analytics.haar_energy_daily,
        "capture_recapture_users": analytics.capture_recapture_users,
        "acf_peak_period": analytics.acf_peak_period,
        "sprt_daily_decision": analytics.sprt_daily_decision,
        "heaps_law_fit": textstats.heaps_law_fit,
        "gini_split_scan": textstats.gini_split_scan,
        "fd_bin_width_plan": analytics.fd_bin_width_plan,
        "wilcoxon_signed_rank": analytics.wilcoxon_signed_rank,
        "holt_winters_seasonal": analytics.holt_winters_seasonal,
        "friedman_dow_test": analytics.friedman_dow_test,
        "bartels_rank_vn": analytics.bartels_rank_vn,
        "eoq_plan": analytics.eoq_plan,
        "page_trend_weeks": analytics.page_trend_weeks,
        "bowley_skew_by_type": analytics.bowley_skew_by_type,
        "gains_curve_deciles": textstats.gains_curve_deciles,
        "cosine_pair_histogram": similarity.cosine_pair_histogram,
        "late_materialization_audit": analytics.late_materialization_audit,
        "siegel_repeated_medians": analytics.siegel_repeated_medians,
        "powerlaw_degree_fit": dedup.powerlaw_degree_fit,
        "retention_halflife_fit": analytics.retention_halflife_fit,
        "fightin_words": textstats.fightin_words,
        "pr_threshold_sweep": textstats.pr_threshold_sweep,
        "seasonal_mann_kendall": analytics.seasonal_mann_kendall,
        "gries_dp_dispersion": textstats.gries_dp_dispersion,
        "multi_source_jsd": textstats.multi_source_jsd,
        "hoover_index_users": analytics.hoover_index_users,
        "cliffs_delta_sources": textstats.cliffs_delta_sources,
        "mood_median_test": analytics.mood_median_test,
        "ansari_bradley_scale": textstats.ansari_bradley_scale,
        "runs_up_down_test": analytics.runs_up_down_test,
        "record_count_test": analytics.record_count_test,
        "ljung_box_test": analytics.ljung_box_test,
        # --- round-5 additions ---
        "yule_sichel_by_source": analytics.yule_sichel_by_source,
        "cusum_changepoint": analytics.cusum_changepoint,
        "variance_ratio_test": analytics.variance_ratio_test,
        "benford_cents_audit": analytics.benford_cents_audit,
        "order_value_gini_by_nation": analytics.order_value_gini_by_nation,
        "abc_xyz_classification": analytics.abc_xyz_classification,
        "hubness_audit": analytics.hubness_audit,
        "dow_anova_eta": analytics.dow_anova_eta,
        "mrl_prefix_recall": analytics.mrl_prefix_recall,
        "wilcoxon_halves_test": analytics.wilcoxon_halves_test,
        "nation_rank_stability": analytics.nation_rank_stability,
    }
    # Rotate never-driver-checked queries into the driver's sample
    # window: [extract_*, never-checked oracled, never-checked
    # no-oracle, previously-checked rest], stable within each tier.
    checked = _driver_checked()
    oracled = oracle_sql().keys()

    def _tier(name: str) -> int:
        if name.startswith("extract_"):
            return 0
        if name not in checked:
            return 1 if name in oracled else 2
        return 3

    return {name: q[name] for name in sorted(q, key=lambda n: (_tier(n),))}


def oracle_sql() -> dict[str, str]:
    from document_extractor_ray.functions import (
        analytics,
        dedup,
        similarity,
        sqlhash,
        textstats,
        training,
    )

    goldens = _os.path.join(_REPO_DIR, "tests", "goldens")
    return {
        # Extraction flagship: the oracle is the committed golden
        # parquet written by the SEQUENTIAL reference implementation
        # (tools/make_goldens.py make_extract_goldens, sf0.01 fixture)
        # — DuckDB reads it back, so the driver hash-compares the Ray
        # pipeline against an independently-executed expectation.
        "extract_results": (
            "SELECT * FROM read_parquet("
            f"'{goldens}/extract_results_sf0.01.parquet') ORDER BY url"
        ),
        "extract_quarantine": (
            "SELECT * FROM read_parquet("
            f"'{goldens}/extract_quarantine_sf0.01.parquet') ORDER BY url"
        ),
        "extract_unit_rows": (
            "SELECT * FROM read_parquet("
            f"'{goldens}/extract_unit_rows_sf0.01.parquet') "
            "ORDER BY url, page"
        ),
        "curation_chain": (
            "SELECT * FROM read_parquet("
            f"'{goldens}/curation_chain_sf0.01.parquet') "
            "ORDER BY example_id"
        ),
        "q1_lineitem": analytics.Q1_SQL,
        "top_customers": analytics.TOP_CUSTOMERS_SQL,
        "events_daily": analytics.EVENTS_DAILY_SQL,
        "events_sliding_7d": analytics.EVENTS_SLIDING_SQL,
        "sessionize": analytics.SESSIONIZE_SQL,
        "nations_per_region": analytics.NATIONS_PER_REGION_SQL,
        "top_k_longest_docs": analytics.TOP_K_LONGEST_SQL,
        "doc_stats": analytics.DOC_STATS_SQL,
        "parts_by_brand": analytics.PARTS_BY_BRAND_SQL,
        "supplier_balance_topk": analytics.SUPPLIER_BALANCE_SQL,
        "customers_without_orders": analytics.CUSTOMERS_WITHOUT_ORDERS_SQL,
        "order_revenue_by_nation": analytics.ORDER_REVENUE_BY_NATION_SQL,
        "events_asof_orders": analytics.EVENTS_ASOF_ORDERS_SQL,
        "events_prior_hour": analytics.EVENTS_PRIOR_HOUR_SQL,
        "q3_shipping": analytics.Q3_SHIPPING_SQL,
        "events_daily_delta": analytics.EVENTS_DAILY_DELTA_SQL,
        "distinct_users_per_type": analytics.DISTINCT_USERS_SQL,
        "doc_stats_rollup": analytics.DOC_STATS_ROLLUP_SQL,
        "user_first_last": analytics.USER_FIRST_LAST_SQL,
        "hll_user_registers": analytics.HLL_USER_REGISTERS_SQL,
        "hash_sample": analytics.HASH_SAMPLE_SQL,
        "hll_daily_registers": analytics.HLL_DAILY_REGISTERS_SQL,
        "mixture_sample": analytics.MIXTURE_SAMPLE_SQL,
        "doc_length_percentiles": analytics.DOC_LENGTH_PERCENTILES_SQL,
        "user_event_paths": analytics.USER_EVENT_PATHS_SQL,
        "user_cumulative_value": analytics.USER_CUMULATIVE_VALUE_SQL,
        "user_day_delta": analytics.USER_DAY_DELTA_SQL,
        "event_type_pivot": analytics.EVENT_TYPE_PIVOT_SQL,
        "user_lag_gaps": analytics.USER_LAG_GAPS_SQL,
        "events_corr_stats": analytics.EVENTS_CORR_STATS_SQL,
        "lineitem_semi_bloom": analytics.LINEITEM_SEMI_BLOOM_SQL,
        "doc_global_rank": analytics.DOC_GLOBAL_RANK_SQL,
        "user_modal_type": analytics.USER_MODAL_TYPE_SQL,
        "orders_cumulative_revenue": analytics.ORDERS_CUMULATIVE_REVENUE_SQL,
        "value_hdr_registers": analytics.VALUE_HDR_REGISTERS_SQL,
        "train_val_test_split": analytics.TRAIN_VAL_TEST_SPLIT_SQL,
        "user_retention": analytics.USER_RETENTION_SQL,
        "props_json_stats": analytics.PROPS_JSON_STATS_SQL,
        "user_activity_360": analytics.USER_ACTIVITY_360_SQL,
        "value_mad_by_type": analytics.VALUE_MAD_BY_TYPE_SQL,
        "event_transitions": analytics.EVENT_TRANSITIONS_SQL,
        "sliding_7d_users": analytics.SLIDING_7D_USERS_SQL,
        "value_outliers": analytics.VALUE_OUTLIERS_SQL,
        "token_counts": textstats.TOKEN_COUNTS_SQL,
        "quality_scores": textstats.QUALITY_SCORES_SQL,
        "lang_id": textstats.LANG_ID_SQL,
        "doc_health": textstats.DOC_HEALTH_SQL,
        "quality_filter": textstats.QUALITY_FILTER_SQL,
        "pii_scrub": textstats.PII_SCRUB_SQL,
        "repetition_filter": textstats.REPETITION_FILTER_SQL,
        "token_histogram": textstats.TOKEN_HISTOGRAM_SQL,
        "token_quantiles": textstats.TOKEN_QUANTILES_SQL,
        "lang_token_quantiles": textstats.LANG_TOKEN_QUANTILES_SQL,
        "gopher_rules": textstats.GOPHER_RULES_SQL,
        "df_top_tokens": textstats.DF_TOP_TOKENS_SQL,
        "tfidf_top_terms": textstats.TFIDF_TOP_TERMS_SQL,
        "search_topk": textstats.SEARCH_TOPK_SQL,
        "bm25_topk": textstats.BM25_TOPK_SQL,
        "bigram_top": textstats.BIGRAM_TOP_SQL,
        "source_mix": training.SOURCE_MIX_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "stratified_sample": training.STRATIFIED_SAMPLE_SQL,
        "top_docs_per_lang": training.TOP_DOCS_PER_LANG_SQL,
        "domain_cap": training.DOMAIN_CAP_SQL,
        # greedy first-fit packing as a recursive-CTE state machine
        "pack_assignments": training.pack_assignments_sql(),
        # --- content-hash family: crc32/minhash/simhash computed in
        # pure SQL (recursive-CTE CRC-32 + HUGEINT mod-2^64 arithmetic,
        # constants inlined from the live kernels — sqlhash.py) ---
        "simhash": sqlhash.simhash_sql(),
        "minhash_dup_pairs": sqlhash.minhash_pairs_sql(),
        "ngram_jaccard_dups": sqlhash.ngram_jaccard_sql(),
        "fingerprints": sqlhash.fingerprints_sql(),
        "decontaminate": sqlhash.decontaminate_sql(),
        "dup_shingle_stats": sqlhash.dup_shingle_stats_sql(),
        "near_dup_clusters": sqlhash.near_dup_clusters_sql(),
        "near_dedup_keep": sqlhash.near_dedup_keep_sql(),
        "token_cms_registers": sqlhash.token_cms_sql(),
        "dup_ngram_scrub": sqlhash.dup_ngram_scrub_sql(),
        "char_stats": textstats.CHAR_STATS_SQL,
        "textrank_keywords": textstats.textrank_keywords_sql(),
        "token_rarity": textstats.TOKEN_RARITY_SQL,
        "postings_topdf": textstats.POSTINGS_TOPDF_SQL,
        "edit_distance_verify": dedup.edit_distance_verify_sql(),
        "funnel_counts": analytics.FUNNEL_COUNTS_SQL,
        "promo_revenue_monthly": analytics.PROMO_REVENUE_MONTHLY_SQL,
        "pmi_bigrams": textstats.PMI_BIGRAMS_SQL,
        "pareto_docs": textstats.PARETO_DOCS_SQL,
        "bpe_merges": textstats.BPE_MERGES_SQL,
        "value_ks_types": analytics.VALUE_KS_TYPES_SQL,
        "returned_orders_by_priority": analytics.RETURNED_ORDERS_BY_PRIORITY_SQL,
        "returned_revenue_topk": analytics.RETURNED_REVENUE_TOPK_SQL,
        "nation_yoy_revenue": analytics.NATION_YOY_REVENUE_SQL,
        "part_top_supplier": analytics.PART_TOP_SUPPLIER_SQL,
        "kgram_novelty": sqlhash.kgram_novelty_sql(),
        "minhash_calibration": sqlhash.minhash_calibration_sql(),
        "token_gini": textstats.TOKEN_GINI_SQL,
        "vocab_growth": textstats.VOCAB_GROWTH_SQL,
        "range_search": similarity.RANGE_SEARCH_SQL,
        "kmeans_assign": similarity.KMEANS_ASSIGN_SQL,
        "session_stats": analytics.SESSION_STATS_SQL,
        "brand_basket_pairs": analytics.BRAND_BASKET_PAIRS_SQL,
        "order_lines_histogram": analytics.ORDER_LINES_HISTOGRAM_SQL,
        "kwic_term": textstats.KWIC_TERM_SQL,
        "lang_confusion": textstats.LANG_CONFUSION_SQL,
        "value_decile_assign": analytics.VALUE_DECILE_ASSIGN_SQL,
        "order_window_event_counts": analytics.ORDER_WINDOW_EVENT_COUNTS_SQL,
        "customer_order_totals": analytics.CUSTOMER_ORDER_TOTALS_SQL,
        "user_rolling3_sum": analytics.USER_ROLLING3_SUM_SQL,
        "user_top3_events": analytics.USER_TOP3_EVENTS_SQL,
        "order_date_records": analytics.ORDER_DATE_RECORDS_SQL,
        "q5_local_supplier": analytics.Q5_LOCAL_SUPPLIER_SQL,
        "cumulative_unique_users": analytics.CUMULATIVE_UNIQUE_USERS_SQL,
        "table_profile": analytics.TABLE_PROFILE_SQL,
        "orders_above_customer_avg": analytics.ORDERS_ABOVE_CUSTOMER_AVG_SQL,
        "q7_volume_shipping": analytics.Q7_VOLUME_SHIPPING_SQL,
        "fk_orphan_audit": analytics.FK_ORPHAN_AUDIT_SQL,
        "mktseg_target_encoding": analytics.MKTSEG_TARGET_ENCODING_SQL,
        "compaction_plan": training.COMPACTION_PLAN_SQL,
        "token_rank_drift": textstats.TOKEN_RANK_DRIFT_SQL,
        "first_touch_mix": analytics.FIRST_TOUCH_MIX_SQL,
        "status_lifecycle_matrix": analytics.STATUS_LIFECYCLE_MATRIX_SQL,
        "line_sequencing_audit": analytics.LINE_SEQUENCING_AUDIT_SQL,
        "reorder_interval_quantiles": analytics.REORDER_INTERVAL_QUANTILES_SQL,
        "top_customer_share_by_year": analytics.TOP_CUSTOMER_SHARE_BY_YEAR_SQL,
        "daily_new_user_share": analytics.DAILY_NEW_USER_SHARE_SQL,
        "type_mix_drift_gtest": analytics.TYPE_MIX_DRIFT_GTEST_SQL,
        "embedding_fisher_dims": similarity.EMBEDDING_FISHER_DIMS_SQL,
        "brand_rule_metrics": analytics.BRAND_RULE_METRICS_SQL,
        "transition_gap_median": analytics.TRANSITION_GAP_MEDIAN_SQL,
        "nation_trade_balance": analytics.NATION_TRADE_BALANCE_SQL,
        "orders_margin_waterfall": analytics.ORDERS_MARGIN_WATERFALL_SQL,
        "part_pareto_frontier": analytics.PART_PARETO_FRONTIER_SQL,
        "duplicate_invoice_audit": analytics.DUPLICATE_INVOICE_AUDIT_SQL,
        "price_ending_profile": analytics.PRICE_ENDING_PROFILE_SQL,
        "session_timeout_sweep": analytics.SESSION_TIMEOUT_SWEEP_SQL,
        "source_charset_profile": textstats.SOURCE_CHARSET_PROFILE_SQL,
        "dup_graph_kcore": sqlhash.dup_kcore_sql(),
        "embedding_mmd_labels": similarity.EMBEDDING_MMD_LABELS_SQL,
        "hdr_precision_sweep": analytics.HDR_PRECISION_SWEEP_SQL,
        "sample_extrapolation_audit": analytics.SAMPLE_EXTRAPOLATION_AUDIT_SQL,
        "event_double_fire_audit": analytics.EVENT_DOUBLE_FIRE_AUDIT_SQL,
        "littles_law_audit": analytics.LITTLES_LAW_AUDIT_SQL,
        "lineitem_corr_matrix": analytics.LINEITEM_CORR_MATRIX_SQL,
        "embedding_sparsify_audit": similarity.EMBEDDING_SPARSIFY_AUDIT_SQL,
        "stratified_design_effect": analytics.STRATIFIED_DESIGN_EFFECT_SQL,
        "k_anonymity_audit": analytics.K_ANONYMITY_AUDIT_SQL,
        "part_tiering_plan": analytics.PART_TIERING_PLAN_SQL,
        "value_anova_by_type": analytics.VALUE_ANOVA_BY_TYPE_SQL,
        "daily_runs_test": analytics.DAILY_RUNS_TEST_SQL,
        "lang_trigram_jsd": textstats.LANG_TRIGRAM_JSD_SQL,
        "key_gap_audit": analytics.KEY_GAP_AUDIT_SQL,
        "hll_sliding_union_audit": analytics.HLL_SLIDING_UNION_AUDIT_SQL,
        "selectivity_independence_audit": analytics.SELECTIVITY_INDEPENDENCE_AUDIT_SQL,
        "upsert_apply_audit": analytics.UPSERT_APPLY_AUDIT_SQL,
        "events_two_changepoints": analytics.EVENTS_TWO_CHANGEPOINTS_SQL,
        "join_order_cost_audit": analytics.JOIN_ORDER_COST_AUDIT_SQL,
        "bitmap_index_plan": analytics.BITMAP_INDEX_PLAN_SQL,
        "proximity_search": textstats.PROXIMITY_SEARCH_SQL,
        "quantize_bits_sweep": similarity.QUANTIZE_BITS_SWEEP_SQL,
        "lm_interpolation_sweep": textstats.LM_INTERPOLATION_SWEEP_SQL,
        "rank_corr_audit": textstats.RANK_CORR_AUDIT_SQL,
        "orders_mann_kendall": analytics.ORDERS_MANN_KENDALL_SQL,
        "discount_qty_elasticity": analytics.DISCOUNT_QTY_ELASTICITY_SQL,
        "user_day_overdispersion": analytics.USER_DAY_OVERDISPERSION_SQL,
        "kmv_set_ops_audit": analytics.KMV_SET_OPS_AUDIT_SQL,
        "value_theil_decomp": analytics.VALUE_THEIL_DECOMP_SQL,
        "forecast_mase": analytics.FORECAST_MASE_SQL,
        "zorder_layout_audit": analytics.ZORDER_LAYOUT_AUDIT_SQL,
        "quality_auc": textstats.QUALITY_AUC_SQL,
        "qlm_topk": textstats.QLM_TOPK_SQL,
        "token_lang_chi2": textstats.TOKEN_LANG_CHI2_SQL,
        "event_trigrams": analytics.EVENT_TRIGRAMS_SQL,
        "kn_continuation_counts": textstats.KN_CONTINUATION_SQL,
        "winnowing_fingerprints": sqlhash.winnowing_sql(),
        "doc_simpson_diversity": textstats.DOC_SIMPSON_SQL,
        "bloom_decontaminate": sqlhash.bloom_decontaminate_sql(),
        "orders_dow_profile": analytics.ORDERS_DOW_PROFILE_SQL,
        "phrase_search": textstats.PHRASE_SEARCH_SQL,
        "rrf_fusion": textstats.RRF_FUSION_SQL,
        "events_ewma": analytics.EVENTS_EWMA_SQL,
        "range_partition_plan": textstats.RANGE_PARTITION_PLAN_SQL,
        "winnowing_overlap_pairs": sqlhash.winnowing_overlap_sql(),
        "negsample_table": textstats.NEGSAMPLE_TABLE_SQL,
        "kn_bigram_probs": textstats.KN_BIGRAM_PROBS_SQL,
        "group_shuffle_split": sqlhash.group_fold_sql(),
        "source_temperature_mix": training.SOURCE_TEMPERATURE_MIX_SQL,
        "embedding_outlier_scores": similarity.EMBEDDING_OUTLIER_SQL,
        "events_rolling_median": analytics.EVENTS_ROLLING_MEDIAN_SQL,
        "hill_tail_index": textstats.HILL_TAIL_INDEX_SQL,
        "hdr_quantile_error": analytics.HDR_QUANTILE_ERROR_SQL,
        "bbit_minhash_agreement": sqlhash.bbit_minhash_sql(),
        "char_trigram_lang_profile": textstats.CHAR_TRIGRAM_PROFILE_SQL,
        "dup_graph_degree_hist": sqlhash.dup_degree_hist_sql(),
        "events_burst_hysteresis": analytics.EVENTS_BURST_HYSTERESIS_SQL,
        "value_winsorized_stats": analytics.VALUE_WINSORIZED_SQL,
        "event_markov_stationary": analytics.EVENT_MARKOV_STATIONARY_SQL,
        "dup_graph_triangles": sqlhash.dup_triangles_sql(),
        "bpe_apply_stats": textstats.BPE_APPLY_STATS_SQL,
        "dedup_cluster_size_hist": sqlhash.cluster_size_hist_sql(),
        "mutual_knn_pairs": similarity.MUTUAL_KNN_PAIRS_SQL,
        "good_turing_counts": textstats.GOOD_TURING_SQL,
        "hll_estimate_audit": analytics.HLL_ESTIMATE_AUDIT_SQL,
        "orders_trend_decompose": analytics.ORDERS_TREND_DECOMPOSE_SQL,
        "churn_hazard_curve": analytics.CHURN_HAZARD_SQL,
        "simhash_hamming_hist": sqlhash.simhash_hamming_hist_sql(),
        "label_silhouette": similarity.LABEL_SILHOUETTE_SQL,
        "langid_kappa": textstats.LANGID_KAPPA_SQL,
        "order_value_pct_by_nation": analytics.ORDER_VALUE_PCT_SQL,
        "join_size_cms_audit": analytics.JOIN_SIZE_CMS_SQL,
        "lsh_band_histogram": sqlhash.lsh_band_histogram_sql(),
        "padding_waste_plan": training.PADDING_WASTE_PLAN_SQL,
        "ccnet_ppl_buckets": textstats.CCNET_PPL_BUCKETS_SQL,
        "events_top_changepoint": analytics.EVENTS_TOP_CHANGEPOINT_SQL,
        "kcenter_coreset": similarity.KCENTER_CORESET_SQL,
        "mmr_select": similarity.MMR_SELECT_SQL,
        "customer_cohort_ltv": analytics.CUSTOMER_COHORT_LTV_SQL,
        "embedding_quantize_audit": similarity.EMBEDDING_QUANTIZE_AUDIT_SQL,
        "positional_xent_profile": textstats.POSITIONAL_XENT_PROFILE_SQL,
        "dup_cross_source_stats": sqlhash.dup_cross_source_sql(),
        "ingest_lateness_audit": analytics.INGEST_LATENESS_SQL,
        "value_psi_drift": analytics.VALUE_PSI_DRIFT_SQL,
        "curation_decisions": sqlhash.curation_decisions_sql(),
        "filter_agreement_matrix": sqlhash.filter_agreement_matrix_sql(),
        "simhash_sort_locality": sqlhash.simhash_sort_locality_sql(),
        "session_entry_exit": analytics.SESSION_ENTRY_EXIT_SQL,
        "reservoir_quantile_error": analytics.RESERVOIR_QUANTILE_ERROR_SQL,
        "token_budget_allocation": training.TOKEN_BUDGET_ALLOCATION_SQL,
        "encoding_size_audit": analytics.ENCODING_SIZE_AUDIT_SQL,
        "zonemap_prune_audit": analytics.ZONEMAP_PRUNE_AUDIT_SQL,
        "hashing_collision_audit": textstats.HASHING_COLLISION_AUDIT_SQL,
        "jl_distortion_audit": similarity.JL_DISTORTION_AUDIT_SQL,
        "shard_rebalance_audit": training.SHARD_REBALANCE_AUDIT_SQL,
        "partition_checksums": textstats.PARTITION_CHECKSUMS_SQL,
        "order_fact_mart": analytics.ORDER_FACT_MART_SQL,
        "curation_report_by_source": sqlhash.curation_report_by_source_sql(),
        "watermark_tradeoff": analytics.WATERMARK_TRADEOFF_SQL,
        "order_rank_in_customer": analytics.ORDER_RANK_IN_CUSTOMER_SQL,
        "epoch_plan": training.EPOCH_PLAN_SQL,
        "dataset_card": textstats.DATASET_CARD_SQL,
        "ship_lag_histogram": analytics.SHIP_LAG_HISTOGRAM_SQL,
        "lang_source_gtest": textstats.LANG_SOURCE_GTEST_SQL,
        "user_decile_transition": analytics.USER_DECILE_TRANSITION_SQL,
        "token_context_entropy": textstats.TOKEN_CONTEXT_ENTROPY_SQL,
        "label_medoid": similarity.LABEL_MEDOID_SQL,
        "assign_margin_stats": similarity.ASSIGN_MARGIN_STATS_SQL,
        "semdedup_prune": similarity.SEMDEDUP_PRUNE_SQL,
        "order_interval_overlaps": analytics.ORDER_INTERVAL_OVERLAPS_SQL,
        "user_median_gap": analytics.USER_MEDIAN_GAP_SQL,
        "heavy_hitter_coverage": analytics.HEAVY_HITTER_COVERAGE_SQL,
        "user_active_days_histogram": analytics.USER_ACTIVE_DAYS_SQL,
        "argmax_dim_stats": similarity.ARGMAX_DIM_STATS_SQL,
        "shingle_containment_pairs": sqlhash.shingle_containment_sql(),
        "simhash_bit_balance": sqlhash.simhash_bit_balance_sql(),
        "user_value_trend": analytics.USER_VALUE_TREND_SQL,
        "value_drift_quantiles": analytics.VALUE_DRIFT_QUANTILES_SQL,
        "token_burstiness": textstats.TOKEN_BURSTINESS_SQL,
        "transition_llr": analytics.TRANSITION_LLR_SQL,
        "events_hour_profile": analytics.EVENTS_HOUR_PROFILE_SQL,
        "doc_source_lm_gap": textstats.DOC_SOURCE_LM_GAP_SQL,
        "value_type_chi2": analytics.VALUE_TYPE_CHI2_SQL,
        "knn_classify": similarity.KNN_CLASSIFY_SQL,
        "name_typo_pairs": dedup.NAME_TYPO_PAIRS_SQL,
        "attribution_last_touch": analytics.ATTRIBUTION_LAST_TOUCH_SQL,
        "join_size_exact": analytics.JOIN_SIZE_EXACT_SQL,
        "collocation_llr": textstats.COLLOCATION_LLR_SQL,
        "doc_quality_composite": textstats.DOC_QUALITY_COMPOSITE_SQL,
        "pack_efficiency_stats": training.PACK_EFFICIENCY_STATS_SQL,
        "tokenizer_fertility": textstats.TOKENIZER_FERTILITY_SQL,
        "persistent_heavy_users": analytics.PERSISTENT_HEAVY_USERS_SQL,
        "shipping_open_orders": analytics.SHIPPING_OPEN_ORDERS_SQL,
        "doc_unigram_xent": textstats.DOC_UNIGRAM_XENT_SQL,
        "doc_bigram_xent": textstats.DOC_BIGRAM_XENT_SQL,
        "source_lm_divergence": textstats.SOURCE_LM_DIVERGENCE_SQL,
        "char_bigram_condent": textstats.CHAR_BIGRAM_CONDENT_SQL,
        "key_skew_audit": analytics.KEY_SKEW_AUDIT_SQL,
        "q12_late_linestatus": analytics.Q12_LATE_LINESTATUS_SQL,
        "user_decay_scores": analytics.USER_DECAY_SCORES_SQL,
        "supplier_concentration": analytics.SUPPLIER_CONCENTRATION_SQL,
        "events_trend_slope": analytics.EVENTS_TREND_SLOPE_SQL,
        "event_type_affinity": analytics.EVENT_TYPE_AFFINITY_SQL,
        "doc_len_token_corr": textstats.DOC_LEN_TOKEN_CORR_SQL,
        "vocab_prune_plan": textstats.VOCAB_PRUNE_PLAN_SQL,
        "dedup_survivor_stats": sqlhash.dedup_survivor_stats_sql(),
        "cooc_window_pairs": textstats.COOC_WINDOW_PAIRS_SQL,
        "doc_prefix_groups": textstats.DOC_PREFIX_GROUPS_SQL,
        "user_event_entropy": analytics.USER_EVENT_ENTROPY_SQL,
        "q8_market_share": analytics.Q8_MARKET_SHARE_SQL,
        "q21_waiting_suppliers": analytics.Q21_WAITING_SUPPLIERS_SQL,
        "value_cusum_alarms": analytics.VALUE_CUSUM_ALARMS_SQL,
        "zipf_slope_by_lang": textstats.ZIPF_SLOPE_BY_LANG_SQL,
        "doc_char_entropy": textstats.DOC_CHAR_ENTROPY_SQL,
        "embedding_dim_corr": similarity.embedding_dim_corr_sql(),
        "q4_order_priority": analytics.Q4_ORDER_PRIORITY_SQL,
        "q13_customer_distribution": analytics.Q13_CUSTOMER_DISTRIBUTION_SQL,
        "q19_brand_qty_revenue": analytics.Q19_BRAND_QTY_REVENUE_SQL,
        "q18_large_orders": analytics.Q18_LARGE_ORDERS_SQL,
        "q22_acctbal_opportunity": analytics.Q22_ACCTBAL_OPPORTUNITY_SQL,
        "user_streaks": analytics.USER_STREAKS_SQL,
        "kmv_registers": analytics.KMV_REGISTERS_SQL,
        "hapax_share": textstats.HAPAX_SHARE_SQL,
        "top_tokens_per_lang": textstats.TOP_TOKENS_PER_LANG_SQL,
        "lm_bigram_coverage": textstats.LM_BIGRAM_COVERAGE_SQL,
        "users_both_windows": analytics.USERS_BOTH_WINDOWS_SQL,
        "curriculum_shards": training.CURRICULUM_SHARDS_SQL,
        "centroid_distances": similarity.CENTROID_DISTANCES_SQL,
        "interarrival_quantiles": analytics.INTERARRIVAL_QUANTILES_SQL,
        "spike_days": analytics.SPIKE_DAYS_SQL,
        "hashed_bow": textstats.HASHED_BOW_SQL,
        "source_overlap_matrix": sqlhash.source_overlap_sql(),
        "orders_fill_rate": analytics.ORDERS_FILL_RATE_SQL,
        "rfm_segments": analytics.RFM_SEGMENTS_SQL,
        "knn_recall_audit": similarity.knn_recall_audit_sql(),
        "lang_percentiles": textstats.LANG_PERCENTILES_SQL,
        "conversion_latency": analytics.CONVERSION_LATENCY_SQL,
        "events_cube": analytics.EVENTS_CUBE_SQL,
        "user_twap": analytics.USER_TWAP_SQL,
        "embedding_dim_stats": similarity.EMBEDDING_DIM_STATS_SQL,
        "supplier_part_coverage": analytics.SUPPLIER_PART_COVERAGE_SQL,
        "length_blocking_audit": textstats.LENGTH_BLOCKING_AUDIT_SQL,
        "user_type_gini": analytics.USER_TYPE_GINI_SQL,
        "events_resample_5min": analytics.EVENTS_RESAMPLE_5MIN_SQL,
        "value_autocorr_moments": analytics.VALUE_AUTOCORR_MOMENTS_SQL,
        "lang_vocab_overlap": textstats.LANG_VOCAB_OVERLAP_SQL,
        "langid_agreement_by_source": textstats.LANGID_AGREEMENT_BY_SOURCE_SQL,
        "retention_cohort_matrix": analytics.RETENTION_COHORT_MATRIX_SQL,
        "q6_forecast_revenue": analytics.Q6_FORECAST_REVENUE_SQL,
        "q15_top_supplier": analytics.Q15_TOP_SUPPLIER_SQL,
        "value_benford_profile": analytics.VALUE_BENFORD_PROFILE_SQL,
        "revenue_gini_by_nation": analytics.REVENUE_GINI_BY_NATION_SQL,
        "shard_balance_audit": training.SHARD_BALANCE_AUDIT_SQL,
        "mktseg_priority_contingency": analytics.MKTSEG_PRIORITY_CONTINGENCY_SQL,
        "q17_small_qty_revenue": analytics.Q17_SMALL_QTY_REVENUE_SQL,
        "user_value_drawdown": analytics.USER_VALUE_DRAWDOWN_SQL,
        "nation_revenue_share": analytics.NATION_REVENUE_SHARE_SQL,
        "bootstrap_replicas": analytics.BOOTSTRAP_REPLICAS_SQL,
        "weighted_sample": analytics.WEIGHTED_SAMPLE_SQL,
        # --- exact similarity search (float64 compute, half-up micro
        # ints on both sides; margins audited in similarity.py) ---
        "knn_brute": similarity.KNN_BRUTE_SQL,
        "knn_lsh": similarity.knn_lsh_sql(),
        "embedding_topk_pairs": similarity.EMBEDDING_TOPK_PAIRS_SQL,
        "label_centroids": similarity.LABEL_CENTROIDS_SQL,
        # No-oracle tail (13 registered queries; all others oracled), each justified + golden-pinned in
        # tests/test_goldens.py: extract_* x3 (HTML parsing; byte-
        # identity vs oracle.run_oracle in pytest), embedding_dup_
        # pairs/clusters (planted inputs the oracle views can't see;
        # exact-pair semantics oracled via embedding_topk_pairs),
        # knn_ivf (Lloyd-argmax margins ~1.2e-7, inside cross-engine
        # float noise), kmeans_train (iterative Lloyd's), pack_sequences
        # (list-valued; semantics oracled via pack_assignments),
        # media_features / frame_sample / media_dup_groups (synthesized
        # binary payloads), embedding_pca_power (iterative power method;
        # pytest-pinned against numpy eigh on the identical integer
        # Gram).
        # --- round-4 additions ---
        "length_mannwhitney": analytics.LENGTH_MANNWHITNEY_SQL,
        "scd2_intervals": analytics.SCD2_INTERVALS_SQL,
        "daily_theil_sen": analytics.DAILY_THEIL_SEN_SQL,
        "pack_boundary_bigrams": training.pack_boundary_bigrams_sql(),
        "neyman_allocation_plan": analytics.NEYMAN_ALLOCATION_PLAN_SQL,
        "customer_freq_migration": analytics.CUSTOMER_FREQ_MIGRATION_SQL,
        "witten_bell_bigram": textstats.WITTEN_BELL_BIGRAM_SQL,
        "length_token_residual_outliers": textstats.LENGTH_TOKEN_RESIDUAL_SQL,
        "markov_sequence_surprisal": analytics.MARKOV_SEQUENCE_SURPRISAL_SQL,
        "pack_optimality_audit": training.pack_optimality_audit_sql(),
        "dup_graph_assortativity": sqlhash.dup_assortativity_sql(),
        "incremental_dedup_audit": sqlhash.incremental_dedup_sql(),
        "sample_join_estimator_audit": analytics.SAMPLE_JOIN_ESTIMATOR_SQL,
        "orders_bullwhip_audit": analytics.ORDERS_BULLWHIP_SQL,
        "salt_plan_audit": analytics.SALT_PLAN_SQL,
        "ship_survival_km": analytics.SHIP_SURVIVAL_KM_SQL,
        "brand_return_wilson": analytics.BRAND_RETURN_WILSON_SQL,
        "dict_encoding_audit": analytics.DICT_ENCODING_AUDIT_SQL,
        "priority_inversion_audit": analytics.PRIORITY_INVERSION_SQL,
        "front_coding_audit": textstats.FRONT_CODING_AUDIT_SQL,
        "dim_truncation_recall": similarity.DIM_TRUNCATION_RECALL_SQL,
        "filter_order_plan": dedup.filter_order_plan_sql(),
        "hashring_moved_keys": training.hashring_moved_keys_sql(),
        "pack_position_source_mix": training.pack_position_source_mix_sql(),
        "backlog_aging_snapshot": analytics.BACKLOG_AGING_SQL,
        "daily_qn_scale": analytics.DAILY_QN_SCALE_SQL,
        "shiplag_cpk_by_priority": analytics.SHIPLAG_CPK_SQL,
        "readability_profile": textstats.READABILITY_PROFILE_SQL,
        "partial_agg_reduction_audit": analytics.PARTIAL_AGG_REDUCTION_SQL,
        "value_kruskal_wallis": analytics.VALUE_KRUSKAL_WALLIS_SQL,
        "topk_threshold_audit": analytics.TOPK_THRESHOLD_SQL,
        "quality_calibration_bins": textstats.QUALITY_CALIBRATION_SQL,
        "presortedness_audit": analytics.PRESORTEDNESS_SQL,
        "kfold_balance_audit": analytics.KFOLD_BALANCE_SQL,
        "weekly_top_users": analytics.WEEKLY_TOP_USERS_SQL,
        "events_median_polish": analytics.EVENTS_MEDIAN_POLISH_SQL,
        "value_did_estimate": analytics.VALUE_DID_SQL,
        "label_scatter_stats": similarity.LABEL_SCATTER_SQL,
        "broadcast_plan_audit": analytics.BROADCAST_PLAN_SQL,
        "source_length_ks_matrix": textstats.SOURCE_LENGTH_KS_SQL,
        "nation_weighted_median_acctbal": analytics.NATION_WEIGHTED_MEDIAN_SQL,
        "brand_price_realization": analytics.BRAND_PRICE_REALIZATION_SQL,
        "lang_run_clustering": textstats.LANG_RUN_CLUSTERING_SQL,
        "sttr_by_source": textstats.STTR_BY_SOURCE_SQL,
        "one_hit_wonder_rate": analytics.ONE_HIT_WONDER_SQL,
        "slo_burn_rate": analytics.SLO_BURN_SQL,
        "source_length_emd_matrix": textstats.SOURCE_LENGTH_EMD_SQL,
        "postings_gap_bits": textstats.POSTINGS_GAP_BITS_SQL,
        "doclen_embnorm_corr": similarity.DOCLEN_EMBNORM_SQL,
        "span_corruption_plan": training.SPAN_CORRUPTION_SQL,
        "vocab_coverage_curve": textstats.VOCAB_COVERAGE_SQL,
        "hour_value_kendall": analytics.HOUR_VALUE_KENDALL_SQL,
        "source_length_cvm_matrix": textstats.SOURCE_LENGTH_CVM_SQL,
        "fd_violation_audit": analytics.FD_VIOLATION_SQL,
        "user_spend_lorenz": analytics.USER_SPEND_LORENZ_SQL,
        "segment_repeat_wilson": analytics.SEGMENT_REPEAT_WILSON_SQL,
        "pettitt_changepoint": analytics.PETTITT_CHANGEPOINT_SQL,
        "simpson_paradox_audit": analytics.SIMPSON_PARADOX_SQL,
        "holt_linear_forecast": analytics.HOLT_LINEAR_FORECAST_SQL,
        "l_moments_profile": analytics.L_MOMENTS_PROFILE_SQL,
        "dsir_importance_weights": textstats.DSIR_IMPORTANCE_SQL,
        "burrows_delta_sources": textstats.BURROWS_DELTA_SQL,
        "isotonic_calibration": textstats.ISOTONIC_CALIBRATION_SQL,
        "cochran_armitage_trend": analytics.COCHRAN_ARMITAGE_SQL,
        "chao1_richness": textstats.CHAO1_RICHNESS_SQL,
        "alias_table_plan": training.ALIAS_TABLE_PLAN_SQL,
        "bloom_fpp_sweep": analytics.BLOOM_FPP_SWEEP_SQL,
        "haar_energy_daily": analytics.HAAR_ENERGY_SQL,
        "capture_recapture_users": analytics.CAPTURE_RECAPTURE_SQL,
        "acf_peak_period": analytics.ACF_PEAK_PERIOD_SQL,
        "sprt_daily_decision": analytics.SPRT_DAILY_SQL,
        "heaps_law_fit": textstats.HEAPS_LAW_SQL,
        "gini_split_scan": textstats.GINI_SPLIT_SCAN_SQL,
        "fd_bin_width_plan": analytics.FD_BIN_WIDTH_SQL,
        "wilcoxon_signed_rank": analytics.WILCOXON_SIGNED_RANK_SQL,
        "holt_winters_seasonal": analytics.HOLT_WINTERS_SEASONAL_SQL,
        "friedman_dow_test": analytics.FRIEDMAN_DOW_SQL,
        "bartels_rank_vn": analytics.BARTELS_RANK_VN_SQL,
        "eoq_plan": analytics.EOQ_PLAN_SQL,
        "page_trend_weeks": analytics.PAGE_TREND_WEEKS_SQL,
        "bowley_skew_by_type": analytics.BOWLEY_SKEW_SQL,
        "gains_curve_deciles": textstats.GAINS_CURVE_SQL,
        "cosine_pair_histogram": similarity.COSINE_PAIR_HISTOGRAM_SQL,
        "late_materialization_audit": analytics.LATE_MATERIALIZATION_SQL,
        "siegel_repeated_medians": analytics.SIEGEL_REPEATED_MEDIANS_SQL,
        "powerlaw_degree_fit": sqlhash.powerlaw_degree_fit_sql(),
        "retention_halflife_fit": analytics.RETENTION_HALFLIFE_SQL,
        "fightin_words": textstats.FIGHTIN_WORDS_SQL,
        "pr_threshold_sweep": textstats.PR_THRESHOLD_SWEEP_SQL,
        "seasonal_mann_kendall": analytics.SEASONAL_MANN_KENDALL_SQL,
        "gries_dp_dispersion": textstats.GRIES_DP_SQL,
        "multi_source_jsd": textstats.MULTI_SOURCE_JSD_SQL,
        "hoover_index_users": analytics.HOOVER_INDEX_SQL,
        "cliffs_delta_sources": textstats.CLIFFS_DELTA_SQL,
        "mood_median_test": analytics.MOOD_MEDIAN_SQL,
        "ansari_bradley_scale": textstats.ANSARI_BRADLEY_SQL,
        "runs_up_down_test": analytics.RUNS_UP_DOWN_SQL,
        "record_count_test": analytics.RECORD_COUNT_SQL,
        "ljung_box_test": analytics.LJUNG_BOX_SQL,
        "yule_sichel_by_source": analytics.YULE_SICHEL_SQL,
        "cusum_changepoint": analytics.CUSUM_CHANGEPOINT_SQL,
        "variance_ratio_test": analytics.VARIANCE_RATIO_SQL,
        "benford_cents_audit": analytics.BENFORD_SQL,
        "order_value_gini_by_nation": analytics.ORDER_VALUE_GINI_SQL,
        "abc_xyz_classification": analytics.ABC_XYZ_SQL,
        "hubness_audit": analytics.HUBNESS_SQL,
        "dow_anova_eta": analytics.DOW_ANOVA_SQL,
        "mrl_prefix_recall": analytics.MRL_PREFIX_SQL,
        "wilcoxon_halves_test": analytics.WILCOXON_HALVES_SQL,
        "nation_rank_stability": analytics.NATION_RANK_STABILITY_SQL,
    }
