#!/usr/bin/env python
"""Per-query profiling harness (guide §1): times each query function that
the frozen bench.py bundles call, INDIVIDUALLY, so optimization effort can
be ranked.  Not part of the driver contract — bench.py stays the artifact
of record; this file only exists to attribute bundle seconds to queries.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [--only name1,name2]

Prints one JSON line: {"per_query": {name: sec, ...}, "total": N, "sf": ...}
Each query is timed around the same action bench.py performs (collect/
count), so the numbers decompose the bundle sections.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

# bundle -> list of query function names (exactly what bench.py calls)
BUNDLES: dict[str, list[str]] = {
    "round5_text_ops": [
        "q_bpe_train8", "q_bm25_search", "q_suffix_ranks40", "q_nb_lang_classify",
    ],
    "round5_graph_ops": [
        "q_wl_colors3", "q_densest_sub", "q_bfs_relabel_gaps",
    ],
    "round5_session3_ops": [
        "q_rrf_hybrid", "q_label_spread3", "q_hll_users", "q_ppr_nibble",
        "q_split_leakage",
    ],
    "motif_census": [
        "q_triad_census", "q_k4_cliques", "q_gini_degree",
    ],
    "tpch_classics": [
        "q_q3_shipping", "q_q5_local_volume", "q_q10_returned", "q_cascade_lt",
    ],
    "session7_graph_ops": [
        "q_hitting_time6", "q_fiedler4", "q_influence_seeds5", "q_scan_clusters",
        "q_temporal_reach4",
    ],
    "session8_ops": [
        "q_q4_priority_check", "q_q6_forecast", "q_q8_market_share",
        "q_q13_order_dist", "q_q15_top_supplier", "q_q17_small_qty",
        "q_q19_disjunctive", "q_q21_waiting_supplier", "q_ams_f2",
        "q_hourly_anomaly", "q_ari_partitions", "q_tie_overlap", "q_silhouette8",
        "q_greedy_cover4", "q_grouping_sets_orders", "q_rolling_revenue7",
        "q_edit_dist_pairs", "q_temporal_motifs", "q_event_transitions",
        "q_weighted_jaccard20",
    ],
    "session9_ops": [
        "q_assoc_rules", "q_q9_profit", "q_friendship_paradox", "q_knn_curve",
        "q_customer_deciles", "q_revenue_mom", "q_session_windows",
        "q_partition_performance", "q_burstiness", "q_q1_pricing",
        "q_partition_cut_audit", "q_rfm_segments", "q_benford_digits",
        "q_abc_parts", "q_mrr_eval", "q_cohort_ltv", "q_ship_latency",
    ],
    "session14_ops": [
        "q_truss_components", "q_struct_roles", "q_ols_price_qty",
        "q_chi2_terms", "q_rank_corr", "q_steiner_tree4", "q_pca_power3",
        "q_odd_walk_len", "q_cusum_hourly",
    ],
    "session15_ops": [
        "q_rake_top10", "q_snn_clusters", "q_dbscan_star", "q_graphlet4_census",
        "q_nbt_centrality3", "q_forman_curvature", "q_local_bridges",
        "q_two_edge_cc", "q_packing_curve", "q_absorb_funnel6",
        "q_event_trigrams_top", "q_molloy_reed", "q_sbm_likelihood", "q_err_eval",
    ],
    "session16_ops": [
        "q_kn_bigram_ppl", "q_transition_entropy", "q_transitive_reduction2",
        "q_triadic_closure", "q_eps_components", "q_lp_auc_cn",
        "q_attribution_markov5", "q_subseq_support3", "q_int8_recall",
        "q_seasonality_dow", "q_kaplan_meier", "q_item_cf10", "q_kclique_comm3",
        "q_articulation_pts", "q_jl_recall", "q_logreg_gd3", "q_ewma_forecast",
        "q_kmeans_nmi", "q_winnow_pairs", "q_knn_homophily", "q_bmatching2",
    ],
    "session17_ops": [
        "q_kmv_distinct", "q_gt_smoothing", "q_feature_hash_audit",
        "q_revenue_acf", "q_pettitt_change", "q_logrank_test", "q_ap_eval",
        "q_cka_views", "q_conformal_pvalues", "q_euler_check",
        "q_hyperbolicity4", "q_walk_spectrum8", "q_ab_srm", "q_als_rank1",
        "q_maxcut_sweep2", "q_theil_sen", "q_kruskal_wallis",
        "q_chi2_independence", "q_bcubed_eval", "q_walk_entropy",
        "q_kanon_audit", "q_page_hinkley", "q_ks_2samp", "q_best_stump",
        "q_simpson_probe", "q_lorenz_revenue", "q_popularity_hit10",
        "q_runs_test", "q_hurst_rs",
    ],
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    from polar_spark import session as _session
    from polar_spark.operators import analytics_queries as aq

    spark = _session.get_spark(
        master=f"local[{cpus}]",
        app_name="polar_spark_bench_extra",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    per_query: dict[str, float] = {}
    per_bundle: dict[str, float] = {}
    for bundle, names in BUNDLES.items():
        if only is not None and bundle not in only and not (only & set(names)):
            continue
        bt = 0.0
        for name in names:
            if only is not None and bundle not in only and name not in only:
                continue
            fn = getattr(aq, name)
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            dt = round(time.monotonic() - t0, 3)
            per_query[name] = dt
            bt += dt
            print(f"  {name}: {dt:.3f}s", file=sys.stderr)
        per_bundle[bundle] = round(bt, 3)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "per_query": dict(sorted(per_query.items(), key=lambda kv: -kv[1])),
        "per_bundle": per_bundle,
        "total": round(sum(per_query.values()), 3),
        "sf": sf,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
