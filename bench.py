#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "extra": {...}}

Headline set mirrors the north rule: edge-table extraction from the
synthetic source-code corpus, PageRank to convergence, connected
components, LPA, triangle counting on the derived graphs, plus the
training-data ops (dedup hash, kNN cosine).

Interference discipline (round-3, VERDICT r2 #1): this host shows
13-18% hypervisor steal with time-correlated bursts that vary identical
runs up to 3x between minutes.  Sections therefore run INTERLEAVED
best-of-N — repetition rounds cycle through every section, so a burst
hits each section once instead of one section N times; the recorded
time per section is the best draw (the capability estimator least
distorted by neighbors) and ALL draws are on the record in
``extra["<name>_draws"]``.  Inputs (synthetic corpora, benchmark
graphs) are materialized untimed — generating the input is not part of
the operator under measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from polar_spark.operators.analytics_queries import coorder_edges, demand_edges, _sym
    from polar_spark.operators.extract import (
        build_repo_edges,
        extract_dependencies,
        extract_files,
        repos_dim,
    )
    from polar_spark.plans import pregel
    from polar_spark.session import get_spark
    from polar_spark.sources.synthetic import gen_source_table, gen_zipf_edges

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="polar_spark_bench",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    queries: dict[str, float] = {}
    extra: dict[str, object] = {"cpus": cpus, "reps": REPS}

    # ---- untimed input materialization --------------------------------
    n_repos = max(200, int(20000 * sf)) if sf > 0 else 2000
    src = gen_source_table(spark, n_repos=n_repos, files_per_repo=8, n_commits=1).persist()
    src.count()

    m_edges = max(1_000_000, int(100_000_000 * sf)) if sf > 0 else 10_000_000
    zedges = gen_zipf_edges(
        spark, m_edges, max(m_edges // 10, 1000), partitions=3 * cpus
    ).persist()
    zedges.count()

    cop = coorder_edges(spark, sf_dir).persist()
    extra["coorder_edges"] = cop.count()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).persist()
    docs.count()

    # replicated curation corpus: target 1M·sf docs TOTAL (the documents
    # fixture itself scales with sf — 5,000 rows at sf0.1 — so replication
    # must divide by the actual row count; a fixed rep count silently made
    # the sf0.1 section 10x the intended size, 212 s of the bench) —
    # input materialization is untimed per the harness discipline
    n_docs = docs.count()
    corpus_target = max(10_000, int(1_000_000 * sf)) if sf > 0 else 100_000
    corpus_reps = max(4, corpus_target // max(n_docs, 1))
    corpus = (
        docs.crossJoin(spark.range(corpus_reps).select(F.col("id").alias("_r")))
        .select(
            (F.col("doc_id") * corpus_reps + F.col("_r")).alias("doc_id"), "text"
        )
        .persist()
    )
    extra["curation_corpus_docs"] = corpus.count()

    # ---- sections ------------------------------------------------------
    # each fn returns a dict of per-draw extras; the best (fastest) draw's
    # extras win.  state shared across sections (repo_edges) is rebuilt
    # per draw inside its own section only.
    state: dict[str, object] = {}

    def _extract():
        files = extract_files(src)
        n_files = files.count()
        deps = extract_dependencies(src)
        edges = build_repo_edges(deps, repos_dim(src)).persist()
        n_edges = edges.count()
        prev = state.get("repo_edges")
        state["repo_edges"] = edges
        if prev is not None:
            prev.unpersist()
        return {"extract_files": n_files, "extract_repo_edges": n_edges}

    def _pr_repo():
        ranks, st = pregel.pagerank(state["repo_edges"], tol=1e-6, max_iter=60)
        ranks.count()
        wall = sum(st.iter_seconds)
        return {
            "pr_repo_iters": st.iterations,
            "pr_repo_converged": st.converged,
            "pr_repo_edges": st.edges,
            "pr_repo_iters_per_sec": round(st.iterations / wall, 3) if wall else None,
            "pr_repo_edges_per_sec": round(st.edges * st.iterations / wall) if wall else None,
        }

    def _pr_zipf():
        _r, st = pregel.pagerank(zedges, tol=0.0, max_iter=8, num_partitions=3 * cpus)
        wall = sum(st.iter_seconds)
        return {
            "zipf_edges": st.edges,
            "zipf_iters_per_sec": round(st.iterations / wall, 4) if wall else None,
            "zipf_edges_per_sec": round(st.edges * st.iterations / wall) if wall else None,
        }

    def _pr_zipf_salted():
        # the skew-insurance path rides the SAME fused loop as the
        # headline (interleaved best-of-3: fused salt=8 26.0s vs fused
        # unsalted 20.5s vs the previous classic salt=16 28.5s — the
        # salted premium is the extra pre-combine shuffle, ~1.27x)
        _r, st = pregel.pagerank(
            zedges, tol=0.0, max_iter=8, num_partitions=3 * cpus,
            salt_buckets=8,
        )
        wall = sum(st.iter_seconds)
        return {
            "zipf_salted_edges_per_sec": round(st.edges * st.iterations / wall)
            if wall
            else None
        }

    def _pr_cop():
        # tight tol (VERDICT r2 #7): the near-regular co-order graph hits
        # 1e-6 in 3 rounds from the uniform start — too few data points
        # for an iterations/sec headline; 1e-12 exercises the asymptotic
        # decay regime (1e-9 still converged in 6 rounds at sf0.1)
        ranks, st = pregel.pagerank(_sym(cop), tol=1e-12, max_iter=60)
        ranks.count()
        wall = sum(st.iter_seconds)
        return {
            "pr_coorder_iters": st.iterations,
            "pr_coorder_converged": st.converged,
            "pr_coorder_edges": st.edges,
            "pr_coorder_iters_per_sec": round(st.iterations / wall, 3) if wall else None,
            "pr_coorder_edges_per_sec": round(st.edges * st.iterations / wall)
            if wall
            else None,
        }

    def _cc():
        _c, st = pregel.connected_components(cop)
        _c.count()
        return {"cc_iters": st.iterations}

    def _lpa():
        _l, st = pregel.label_propagation(cop, max_iter=5)
        _l.count()
        return {}

    def _tri():
        _pv, total = pregel.triangle_count(cop)
        return {"triangles_total": total}

    def _demand_pr():
        e = demand_edges(spark, sf_dir)
        _ranks, st = pregel.pagerank(e, tol=1e-6, max_iter=60)
        return {"pr_demand_iters": st.iterations, "pr_demand_edges": st.edges}

    def _gitlab_rollup():
        from polar_spark.operators.analytics_queries import q_gitlab_pipeline_rollup

        return {"gitlab_projects": q_gitlab_pipeline_rollup(spark, sf_dir).count()}

    def _store_ingest():
        import shutil
        import tempfile

        from polar_spark.operators.analytics_queries import _gl_pipelines_from_orders
        from polar_spark.operators.gitlab_projection import project_pipelines
        from polar_spark.operators.graph_store import GraphStore

        tmp = tempfile.mkdtemp(prefix="polar_bench_store_")
        try:
            verts, edges = project_pipelines(_gl_pipelines_from_orders(spark, sf_dir))
            store = GraphStore(spark, tmp)
            store.upsert_nodes(verts)
            store.ensure_edges(edges)
            return {
                "store_vertices": store.vertices.count(),
                "store_edges": store.edges.count(),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def _coreness():
        _c, st = pregel.core_numbers(cop)
        _c.count()
        return {"coreness_iters": st.iterations, "coreness_converged": st.converged}

    def _neardup():
        from polar_spark.operators.dedup import minhash_lsh_dedup

        pairs = minhash_lsh_dedup(docs, threshold=0.5)
        return {"neardup_pairs": pairs.count()}

    def _dedup():
        n = (
            docs.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
            .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep"))
            .count()
        )
        return {"dedup_groups": n}

    def _knn():
        from polar_spark.operators.analytics_queries import q_knn_cosine

        return {"knn_rows": q_knn_cosine(spark, sf_dir).count()}

    def _ann_recall():
        # the recall/latency trade on the record: LSH and IVF top-3 vs
        # the exact brute-force ranking over a 200-query panel
        from polar_spark.operators.similarity import (
            cosine_topk_bruteforce,
            cosine_topk_lsh,
            hnsw_topk,
            ivf_topk,
            pq_topk,
        )
        from polar_spark.sources.tables import load_table

        emb = load_table(spark, "embeddings", sf_dir).persist()
        emb.count()
        qids = list(range(200))
        exact = cosine_topk_bruteforce(emb, query_ids=qids, k=3).persist()
        n_exact = exact.count()
        # round-5 recall-calibrated configurations: LSH auto-scales plane
        # count for ~32-vector buckets + radius-1 multiprobe; IVF trains
        # spherical k-means + multi-assigns top-2 cells; PQ m=16/cb=32
        # codebooks (5 Lloyd steps) + 16·k exact rerank; HNSW-style NSW
        # graph per shard + union reduce
        variants = {
            "lsh": lambda: cosine_topk_lsh(emb, k=3),
            "ivf": lambda: ivf_topk(emb, query_ids=qids, k=3),
            "pq": lambda: pq_topk(emb, query_ids=qids, k=3),
            "hnsw": lambda: hnsw_topk(emb, query_ids=qids, k=3),
            # cheaper ends of the recall/latency curve, on the record
            "lsh_fast": lambda: cosine_topk_lsh(emb, k=3, multiprobe=0),
            "ivf_fast": lambda: ivf_topk(
                emb, query_ids=qids, k=3, n_probe=4, assign_top=1
            ),
        }
        out: dict[str, object] = {}
        for name, fn in variants.items():
            t0 = time.monotonic()
            res = fn()
            res = res.persist()
            res.count()
            out[f"ann_{name}_sec"] = round(time.monotonic() - t0, 3)
            hits = exact.join(res, ["query_id", "neighbor_id"], "left_semi").count()
            out[f"ann_{name}_recall_at3"] = (
                round(hits / n_exact, 4) if n_exact else None
            )
            res.unpersist()
        exact.unpersist()
        emb.unpersist()
        return out

    def _msf():
        # Boruvka MSF on the weighted co-part graph (O(log V) rounds,
        # pointer-doubling contraction)
        from polar_spark.operators.analytics_queries import q_msf_copart

        return {"msf_edges": q_msf_copart(spark, sf_dir).count()}

    def _packing():
        # two-phase distributed prefix sum over a sf-scaled token
        # stream (no single-partition window anywhere)
        from polar_spark.operators.packing import pack_sequences, packing_stats

        n = max(100_000, int(20_000_000 * sf)) if sf > 0 else 1_000_000
        toks = spark.range(n).select(
            F.col("id").alias("doc_id"), ((F.col("id") * 7919) % 997).alias("n_tokens")
        )
        st = packing_stats(pack_sequences(toks, seq_len=2048, buckets=256), 2048).first()
        return {"packed_docs": st["n_docs"], "packed_sequences": st["n_sequences"]}

    def _cm_sketch():
        # count-min heavy hitters over lineitem part keys: sketch build
        # is one map-side-combinable agg into <= depth*width cells
        from polar_spark.operators.sketches import cm_heavy_hitters
        from polar_spark.sources.tables import load_table

        li = load_table(spark, "lineitem", sf_dir)
        return {"cm_hh_rows": cm_heavy_hitters(li, "l_partkey", k=20).count()}

    def _stream_scenarios():
        # broker stress-scenario analog (reference's Cassini harness):
        # throughput + batch classes, loss/dup/integrity accounting
        import shutil
        import tempfile

        from polar_spark.streaming import scenarios

        out = {}
        for spec in (
            scenarios.throughput_scenario(n=max(2000, int(200_000 * sf)) if sf > 0 else 20_000),
            scenarios.batch_scenario(n=max(50, int(2_000 * sf)) if sf > 0 else 200),
        ):
            tmp = tempfile.mkdtemp(prefix=f"polar_scn_{spec.name}_")
            try:
                m = scenarios.run_scenario(spark, spec, tmp)
                assert m.lost == 0 and m.integrity_failures == 0, m.as_dict()
                out[f"scn_{spec.name}_msgs_per_sec"] = m.msgs_per_sec
                out[f"scn_{spec.name}_sent"] = m.sent
                out[f"scn_{spec.name}_lat_p50_ms"] = m.latency_p50_ms
                out[f"scn_{spec.name}_lat_p99_ms"] = m.latency_p99_ms
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        return out

    def _curation():
        # substring-dedup span hashes + corpus-LM quality scores over
        # the replicated corpus — the round-4 curation path end to end
        from polar_spark.operators.text import dup_spans, unigram_logprob

        d = dup_spans(corpus, "text", "doc_id", k=8, hash_family="xxhash64")
        n_dup = d.count()
        u = unigram_logprob(corpus, "text", "doc_id")
        n_docs = u.count()
        return {"curation_dup_hashes": n_dup, "curation_scored_docs": n_docs}

    def _dag_paths():
        # integer path-count DP over the per-customer order DAG:
        # ~25 monotone fixpoint rounds, one join-agg shuffle each
        from polar_spark.operators.analytics_queries import q_dag_paths

        return {"dag_path_rows": q_dag_paths(spark, sf_dir).count()}

    def _louvain():
        # deterministic Louvain phase-1 sweep on the FULL weighted
        # co-order graph (LPA-round shuffle shape + per-vertex top-1)
        from polar_spark.operators.analytics_queries import load_table
        from polar_spark.plans import pregel as _pg

        li = load_table(spark, "lineitem", sf_dir)
        op = li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
        a, b = op.alias("a"), op.alias("b")
        wund = (
            a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
            .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
            .agg(F.count("*").cast("double").alias("w"))
        )
        sym = wund.unionByName(
            wund.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        comm = _pg.louvain_move(sym)
        n1 = comm.select("comm").distinct().count()
        prev = state.get("louvain_sym")
        state["louvain_sym"] = sym.persist()
        state["louvain_sym"].count()
        if prev is not None:
            prev.unpersist()
        state["louvain_move1"] = comm
        return {"louvain_communities": n1}

    def _louvain_full():
        # full multi-level Louvain on the same weighted co-order graph;
        # the modularity-vs-phase-1 comparison is the round-5 evidence
        # that the hierarchy actually improves the partition
        from polar_spark.plans import pregel as _pg

        # 3 levels x 6 sweeps: the move-count tail beyond this adds
        # <0.001 modularity on this graph but pays the ~2s/sweep local
        # action floor (32 sweeps = 71s, 18 = ~40s; same 16 communities)
        if "louvain_sym" not in state:
            # SPARK_GRAFT_BENCH_ONLY may filter out the move section
            # this one piggybacks on — rebuild its inputs (dev-loop
            # only; inside the timed draw, so full-record runs keep
            # both sections listed)
            _louvain()
        sym = state["louvain_sym"]
        comm, st = _pg.louvain(sym, max_levels=3, max_sweeps=6)
        n_comms = comm.select("comm").distinct().count()
        q_full = _pg.modularity(sym, comm)
        q_move = _pg.modularity(
            sym, state["louvain_move1"].select("id", "comm")
        )
        return {
            "louvain_full_communities": n_comms,
            "louvain_full_sweeps": st.iterations,
            "louvain_full_modularity": round(q_full, 6),
            "louvain_move1_modularity": round(q_move, 6),
        }

    def _squares():
        # per-vertex 4-cycle motif counts on the bounded co-order graph
        from polar_spark.operators.analytics_queries import q_squares_coorder

        out = q_squares_coorder(spark, sf_dir)
        return {"squares_total": out.agg(F.sum("squares")).collect()[0][0]}

    def _round5_text():
        # the round-5 text/training operators end to end at bench SF:
        # full BPE training, BM25 panel, suffix-array doubling, NB filter
        from polar_spark.operators.analytics_queries import (
            q_bm25_search,
            q_bpe_train8,
            q_nb_lang_classify,
            q_suffix_ranks40,
        )

        nb = q_nb_lang_classify(spark, sf_dir)
        acc = nb.agg(F.avg("correct")).collect()[0][0]
        return {
            "bpe_word_types": q_bpe_train8(spark, sf_dir).count(),
            "bm25_rows": q_bm25_search(spark, sf_dir).count(),
            "suffix_positions": q_suffix_ranks40(spark, sf_dir).count(),
            "nb_accuracy": round(float(acc), 4),
        }

    def _round5_graph():
        # round-5 graph operators on the full co-order graph: WL
        # refinement, densest-subgraph peeling, BFS locality relabel
        from polar_spark.operators.analytics_queries import (
            q_bfs_relabel_gaps,
            q_densest_sub,
            q_wl_colors3,
        )

        wl = q_wl_colors3(spark, sf_dir)
        n_classes = wl.select("color").distinct().count()
        dens = q_densest_sub(spark, sf_dir)
        in_best = dens.where(F.col("in_densest") == 1).count()
        gaps = q_bfs_relabel_gaps(spark, sf_dir).agg(
            F.sum("bits_old").alias("bo"), F.sum("bits_new").alias("bn")
        ).collect()[0]
        return {
            "wl_classes": n_classes,
            "densest_members": in_best,
            "relabel_bits_old": int(gaps["bo"]),
            "relabel_bits_new": int(gaps["bn"]),
        }

    def _round5_session3():
        # this session's additions: hybrid retrieval (RRF of BM25 +
        # dense cosine), integer-Jacobi label spreading, HLL distinct
        # counts, PPR-Nibble sweep, cross-split leakage audit
        from polar_spark.operators.analytics_queries import (
            q_hll_users,
            q_label_spread3,
            q_ppr_nibble,
            q_rrf_hybrid,
            q_split_leakage,
        )

        fused = q_rrf_hybrid(spark, sf_dir).count()
        spread = q_label_spread3(spark, sf_dir).where(F.col("pred") >= 0).count()
        hll = q_hll_users(spark, sf_dir).count()
        sweep_min_phi = (
            q_ppr_nibble(spark, sf_dir)
            .orderBy(F.asc("phi"), F.asc("t"))
            .limit(1)
            .collect()[0]["phi"]
        )
        leaks = q_split_leakage(spark, sf_dir).count()
        return {
            "rrf_rows": fused,
            "label_spread_labeled": spread,
            "hll_groups": hll,
            "nibble_min_phi": float(sweep_min_phi),
            "split_leaks": leaks,
        }

    def _motif_census():
        # session-5/6 motif analytics on the full co-order graph:
        # closed-form triad census (no enumeration), degree-oriented
        # 4-clique counts, histogram-algebra degree Gini
        from polar_spark.operators.analytics_queries import (
            q_gini_degree,
            q_k4_cliques,
            q_triad_census,
        )

        tc = q_triad_census(spark, sf_dir).collect()[0]
        k4 = q_k4_cliques(spark, sf_dir).agg(F.sum("k4")).collect()[0][0]
        gini = q_gini_degree(spark, sf_dir).collect()[0]["gini_r"]
        return {
            "triad_paths": int(tc["path"]),
            "triad_triangles": int(tc["triangle"]),
            "k4_total": int(k4) // 4,
            "degree_gini": float(gini),
        }

    def _tpch_classics():
        # classic star-schema joins with exact integer-cent revenue +
        # the LT influence cascade (all-integer activation algebra)
        from polar_spark.operators.analytics_queries import (
            q_cascade_lt,
            q_q3_shipping,
            q_q5_local_volume,
            q_q10_returned,
        )

        q3 = q_q3_shipping(spark, sf_dir).collect()
        q5 = q_q5_local_volume(spark, sf_dir).collect()
        q10 = q_q10_returned(spark, sf_dir).collect()
        reach = q_cascade_lt(spark, sf_dir).count()
        return {
            "q3_top_revenue_e4": int(q3[0]["revenue_e4"]) if q3 else 0,
            "q5_nations": len(q5),
            "q10_rows": len(q10),
            "cascade_reach": int(reach),
        }

    def _session7_graph():
        # session-7 additions on the full co-order / contact graphs:
        # absorbing-walk hitting times, spectral bisection direction,
        # single-discount influence seeding, SCAN structural clustering,
        # time-respecting earliest-arrival reachability
        from polar_spark.operators.analytics_queries import (
            q_fiedler4,
            q_hitting_time6,
            q_influence_seeds5,
            q_scan_clusters,
            q_temporal_reach4,
        )

        hit = q_hitting_time6(spark, sf_dir).agg(F.max("hit_r")).collect()[0][0]
        fied = q_fiedler4(spark, sf_dir).where(F.col("f_r") > 0).count()
        seeds = q_influence_seeds5(spark, sf_dir).collect()
        scan = (
            q_scan_clusters(spark, sf_dir)
            .groupBy("role")
            .count()
            .collect()
        )
        reach = q_temporal_reach4(spark, sf_dir).count()
        return {
            "hitting_max": float(hit),
            "fiedler_positive_side": int(fied),
            "influence_top_dd": int(seeds[0]["dd"]) if seeds else 0,
            "scan_roles": {r["role"]: r["count"] for r in scan},
            "temporal_reached": int(reach),
        }

    def _session8_ops():
        # session-8 additions: the TPC-H completion set (Q4/Q6/Q8/Q13/
        # Q15/Q17/Q19/Q21), AMS F2 sketch, integer-exact hourly anomaly
        # flags, ARI convergence-stability, tie-overlap deciles,
        # silhouette audit, greedy max-coverage source selection
        from polar_spark.operators.analytics_queries import (
            q_ams_f2,
            q_ari_partitions,
            q_greedy_cover4,
            q_hourly_anomaly,
            q_q4_priority_check,
            q_q6_forecast,
            q_q8_market_share,
            q_q13_order_dist,
            q_q15_top_supplier,
            q_q17_small_qty,
            q_q19_disjunctive,
            q_q21_waiting_supplier,
            q_silhouette8,
            q_tie_overlap,
        )
        from polar_spark.operators.analytics_queries import (
            q_edit_dist_pairs,
            q_event_transitions,
            q_grouping_sets_orders,
            q_rolling_revenue7,
            q_temporal_motifs,
            q_weighted_jaccard20,
        )

        for fn in (
            q_q4_priority_check,
            q_q6_forecast,
            q_q8_market_share,
            q_q13_order_dist,
            q_q15_top_supplier,
            q_q17_small_qty,
            q_q19_disjunctive,
        ):
            fn(spark, sf_dir).collect()
        q21 = q_q21_waiting_supplier(spark, sf_dir).collect()
        ams = q_ams_f2(spark, sf_dir).collect()
        anom = q_hourly_anomaly(spark, sf_dir).agg(F.sum("is_anomaly")).collect()[0][0]
        ari = q_ari_partitions(spark, sf_dir).collect()[0]["ari_r"]
        tie = q_tie_overlap(spark, sf_dir).collect()
        sil = q_silhouette8(spark, sf_dir).collect()
        cover = q_greedy_cover4(spark, sf_dir).collect()
        gs = q_grouping_sets_orders(spark, sf_dir).count()
        q_rolling_revenue7(spark, sf_dir).collect()
        edits = q_edit_dist_pairs(spark, sf_dir).count()
        motifs = q_temporal_motifs(spark, sf_dir).collect()
        q_event_transitions(spark, sf_dir).collect()
        wj = q_weighted_jaccard20(spark, sf_dir).collect()
        import statistics

        return {
            "q21_top_numwait": int(q21[0]["numwait"]) if q21 else 0,
            "ams_mean_est": int(statistics.mean(r["x2"] for r in ams)),
            "ams_exact_f2": int(ams[0]["exact_f2"]) if ams else 0,
            "anomalous_hours": int(anom or 0),
            "lpa_round_ari": float(ari),
            "tie_overlap_zero_edges": next(
                (int(r["n_edges"]) for r in tie if r["overlap_decile"] == 0), 0
            ),
            "silhouette_mean": round(
                statistics.mean(r["mean_sil_r"] for r in sil), 6
            )
            if sil
            else 0.0,
            "cover_cum_grams": int(cover[-1]["cum_grams"]) if cover else 0,
            "grouping_set_rows": int(gs),
            "edit_dist_pairs": int(edits),
            "motif_top_relays": int(motifs[0]["n_relays"]) if motifs else 0,
            "wjaccard_top_ppm": int(wj[0]["wj_ppm"]) if wj else 0,
        }

    def _bucketed_join():
        # the pay-once layout for the persisted edge table: bucket by
        # src at write time, then every iteration's edges-join-ranks
        # runs with ZERO exchanges (plain layout re-shuffles the BIG
        # edge side every iteration).  On a single host an in-memory
        # shuffle of the toy edge table is nearly free, so the wall
        # numbers here understate the win — the avoided cost at
        # cluster scale is the NETWORK shuffle of the 100-TB side,
        # which the exchange counts (not the local seconds) evidence.
        import shutil
        import tempfile

        from polar_spark.plans.bucketing import exchange_count, write_bucketed

        d = tempfile.mkdtemp(prefix="polar_bucket_bench_")
        prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            edges = zedges.select("src", "dst")
            ranks = (
                zedges.select(F.col("src").alias("id"))
                .distinct()
                .withColumn("rank", F.col("id") * 0.001)
            ).persist()
            ranks.count()
            # apples-to-apples: BOTH variants read parquet from disk;
            # the only difference is the bucketed layout
            # bucket count == shuffle partitions: the per-iteration
            # ranks side (already hash-partitioned by the previous
            # round's aggregate) then needs NO exchange either — the
            # bucketed loop join is fully exchange-free, vs the plain
            # layout re-shuffling the BIG edge side every iteration
            t0 = time.monotonic()
            be = write_bucketed(edges, "bench_bucket_e", "src", cpus, f"{d}/e")
            write_sec = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            edges.write.mode("overwrite").parquet(f"{d}/plain")
            plain_write_sec = round(time.monotonic() - t0, 3)
            pe = spark.read.parquet(f"{d}/plain")
            # at 10^12-file scale the per-iteration ranks side is not
            # broadcastable — pin SMJ so the audit measures the shuffle
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

            def _iters(e):
                t0 = time.monotonic()
                for k in range(4):
                    r = ranks.withColumn("rank", F.col("rank") + k)
                    e.join(r.withColumnRenamed("id", "src"), "src").groupBy(
                        "dst"
                    ).agg(F.sum("rank").alias("s")).count()
                return round(time.monotonic() - t0, 3)

            bucketed_sec = _iters(be)
            plain_sec = _iters(pe)
            probe = ranks.withColumnRenamed("id", "src")
            out = {
                "bucket_write_sec": write_sec,
                "plain_write_sec": plain_write_sec,
                "bucketed_4join_sec": bucketed_sec,
                "plain_4join_sec": plain_sec,
                "bucketed_exchanges": exchange_count(be.join(probe, "src")),
                "plain_exchanges": exchange_count(pe.join(probe, "src")),
            }
            ranks.unpersist()
            return out
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
            spark.sql("DROP TABLE IF EXISTS bench_bucket_e")
            shutil.rmtree(d, ignore_errors=True)

    def _session9_ops():
        # session-9 additions: market-basket association rules, TPC-H
        # Q9 essence (blue-part profit by nation x year), friendship-
        # paradox audit on the co-order graph
        from polar_spark.operators.analytics_queries import (
            q_abc_parts,
            q_assoc_rules,
            q_benford_digits,
            q_burstiness,
            q_cohort_ltv,
            q_customer_deciles,
            q_friendship_paradox,
            q_knn_curve,
            q_partition_performance,
            q_q1_pricing,
            q_mrr_eval,
            q_partition_cut_audit,
            q_q9_profit,
            q_ship_latency,
            q_revenue_mom,
            q_rfm_segments,
            q_session_windows,
        )

        rules = q_assoc_rules(spark, sf_dir).collect()
        q_q9_profit(spark, sf_dir).collect()
        fp = q_friendship_paradox(spark, sf_dir).collect()[0]
        knn = q_knn_curve(spark, sf_dir).count()
        dec = q_customer_deciles(spark, sf_dir).collect()
        q_revenue_mom(spark, sf_dir).collect()
        sw = q_session_windows(spark, sf_dir).collect()
        perf = q_partition_performance(spark, sf_dir).collect()[0]
        q_burstiness(spark, sf_dir).collect()
        q_q1_pricing(spark, sf_dir).collect()
        cut = q_partition_cut_audit(spark, sf_dir).collect()[0]
        q_rfm_segments(spark, sf_dir).collect()
        ben = q_benford_digits(spark, sf_dir).collect()
        abc = q_abc_parts(spark, sf_dir).collect()
        mrr = q_mrr_eval(spark, sf_dir).collect()
        q_cohort_ltv(spark, sf_dir).count()
        lat = q_ship_latency(spark, sf_dir).collect()
        return {
            "assoc_top_lift_ppm": int(rules[0]["lift_ppm"]) if rules else 0,
            "paradox_ppm": int(fp["paradox_ppm"]),
            "nbr_mean_deg_ppm": int(fp["nbr_mean_deg_ppm"]),
            "knn_degree_classes": int(knn),
            "top_decile_share_ppm": int(dec[0]["share_ppm"]) if dec else 0,
            "session_top_events": int(sw[0]["n_events"]) if sw else 0,
            "lpa_perf_ppm": int(perf["perf_ppm"]),
            "cut_hash_ppm": int(cut["hash_ppm"]),
            "cut_lpa_ppm": int(cut["lpa_ppm"]),
            "benford_max_dev_ppm": max(int(r["abs_dev_ppm"]) for r in ben),
            "abc_a_parts": next((int(r["n_parts"]) for r in abc if r["abc"] == "A"), 0),
            "mrr_mean_ppm": sum(int(r["rr_ppm"]) for r in mrr) // max(len(mrr), 1),
            "ship_p99_max_days": max(int(r["p99_days"]) for r in lat) if lat else 0,
        }

    def _session14_ops():
        # session-14 additions: truss communities, structural roles,
        # Steiner 2-approx, PCA power iteration, rank-correlation audit,
        # chi-square terms, per-nation OLS, odd-walk depth, CUSUM
        from polar_spark.operators.analytics_queries import (
            q_chi2_terms,
            q_cusum_hourly,
            q_odd_walk_len,
            q_ols_price_qty,
            q_pca_power3,
            q_rank_corr,
            q_steiner_tree4,
            q_struct_roles,
            q_truss_components,
        )

        tc = q_truss_components(spark, sf_dir).collect()
        q_struct_roles(spark, sf_dir).collect()
        ols = q_ols_price_qty(spark, sf_dir).collect()
        q_chi2_terms(spark, sf_dir).collect()
        rc = q_rank_corr(spark, sf_dir).collect()[0]
        st = q_steiner_tree4(spark, sf_dir).collect()
        pca = q_pca_power3(spark, sf_dir).collect()
        ow = q_odd_walk_len(spark, sf_dir).collect()
        cs = q_cusum_hourly(spark, sf_dir).collect()
        return {
            "truss_communities": len({r["comp"] for r in tc}),
            "ols_max_r2_ppm": max(int(r["r2_r"] * 1e6) for r in ols) if ols else 0,
            "rank_corr_spearman_ppm": int(rc["spearman_r"] * 1e6),
            "steiner_total_w": sum(int(r["w"]) for r in st),
            "pca_eig_r": float(pca[0]["eig_r"]) if pca else 0.0,
            "odd_walk_vertices": len(ow),
            "cusum_alarms": sum(int(r["alarm"]) for r in cs),
        }

    def _session15_ops():
        # session-14 later batches: RAKE, SNN/DBSCAN* clustering,
        # graphlet census, non-backtracking centrality, Forman curvature,
        # local bridges + 2ecc, packing curve, absorbing funnel, trigrams
        from polar_spark.operators.analytics_queries import (
            q_absorb_funnel6,
            q_dbscan_star,
            q_event_trigrams_top,
            q_forman_curvature,
            q_graphlet4_census,
            q_local_bridges,
            q_molloy_reed,
            q_nbt_centrality3,
            q_packing_curve,
            q_rake_top10,
            q_sbm_likelihood,
            q_err_eval,
            q_snn_clusters,
            q_two_edge_cc,
        )

        q_rake_top10(spark, sf_dir).collect()
        snn = q_snn_clusters(spark, sf_dir).collect()
        db = q_dbscan_star(spark, sf_dir).collect()
        g4 = q_graphlet4_census(spark, sf_dir).collect()[0]
        q_nbt_centrality3(spark, sf_dir).collect()
        fc = q_forman_curvature(spark, sf_dir).collect()
        lb = q_local_bridges(spark, sf_dir).collect()
        q_two_edge_cc(spark, sf_dir).collect()
        q_packing_curve(spark, sf_dir).collect()
        af = q_absorb_funnel6(spark, sf_dir).collect()
        q_event_trigrams_top(spark, sf_dir).collect()
        mr = q_molloy_reed(spark, sf_dir).collect()[0]
        q_sbm_likelihood(spark, sf_dir).collect()
        q_err_eval(spark, sf_dir).collect()
        return {
            "snn_clusters": len({r["cluster"] for r in snn}),
            "dbscan_clusters": len({r["cluster"] for r in db if r["cluster"] != -1}),
            "graphlet_i_c4": int(g4["i_c4"]),
            "graphlet_i_k4": int(g4["i_k4"]),
            "forman_neg_edges": sum(int(r["n_edges"]) for r in fc if r["curv"] < 0),
            "local_bridges": len(lb),
            "molloy_kappa_ppm": int(mr["kappa_r"] * 1e6),
            "funnel_p_view_ppm": next(
                (int(r["p_purchase_r"] * 1e6) for r in af if r["state"] == "view"), 0
            ),
        }

    def _session16_ops():
        # session-15 additions: Kneser-Ney LM, transition entropy,
        # Kaplan-Meier, item-item CF, clique percolation, articulation
        # points, JL recall, logistic regression, EWMA, k-means NMI,
        # winnowing pairs, kNN homophily, b-matching
        from polar_spark.operators.analytics_queries import (
            q_articulation_pts,
            q_bmatching2,
            q_ewma_forecast,
            q_item_cf10,
            q_jl_recall,
            q_kaplan_meier,
            q_kclique_comm3,
            q_kmeans_nmi,
            q_kn_bigram_ppl,
            q_knn_homophily,
            q_logreg_gd3,
            q_transition_entropy,
            q_winnow_pairs,
        )

        from polar_spark.operators.analytics_queries import (
            q_attribution_markov5,
            q_eps_components,
            q_int8_recall,
            q_lp_auc_cn,
            q_seasonality_dow,
            q_subseq_support3,
            q_transitive_reduction2,
            q_triadic_closure,
        )

        q_kn_bigram_ppl(spark, sf_dir).collect()
        q_transition_entropy(spark, sf_dir).collect()
        q_transitive_reduction2(spark, sf_dir).collect()
        tc = q_triadic_closure(spark, sf_dir).collect()
        ec = q_eps_components(spark, sf_dir).collect()
        lp = q_lp_auc_cn(spark, sf_dir).collect()[0]
        at = q_attribution_markov5(spark, sf_dir).collect()
        q_subseq_support3(spark, sf_dir).collect()
        i8 = q_int8_recall(spark, sf_dir).collect()
        q_seasonality_dow(spark, sf_dir).collect()
        km = q_kaplan_meier(spark, sf_dir).collect()
        cf = q_item_cf10(spark, sf_dir).collect()
        cp = q_kclique_comm3(spark, sf_dir).collect()
        ap = q_articulation_pts(spark, sf_dir).collect()
        jl = q_jl_recall(spark, sf_dir).collect()
        lr = q_logreg_gd3(spark, sf_dir).collect()[0]
        q_ewma_forecast(spark, sf_dir).collect()
        nmi = q_kmeans_nmi(spark, sf_dir).collect()[0]
        wp = q_winnow_pairs(spark, sf_dir).collect()
        hom = q_knn_homophily(spark, sf_dir).collect()
        bm = q_bmatching2(spark, sf_dir).collect()
        return {
            "km_final_surv_ppm": int(km[-1]["s_r"] * 1e6) if km else 0,
            "item_cf_pairs": len(cf),
            "cpm_communities": len({r["comm"] for r in cp}),
            "articulation_count": sum(1 for r in ap if r["is_articulation"]),
            "jl_mean_overlap_x20": sum(int(r["overlap3"]) for r in jl),
            "logreg_acc_ppm": int(
                (lr["tp"] + lr["tn"])
                * 1000000
                // (lr["tp"] + lr["fp"] + lr["fn"] + lr["tn"])
            ),
            "kmeans_nmi_ppm": int(nmi["nmi_r"] * 1e6),
            "winnow_pairs": len(wp),
            "homophily_max_lift_ppm": max(
                (int(r["same_ppm"] - r["base_ppm"]) for r in hom), default=0
            ),
            "bmatching_edges": len(bm),
            "triadic_close_max_ppm": max(
                (int(r["close_ppm"]) for r in tc), default=0
            ),
            "eps_giant_at_30": next(
                (int(r["giant"]) for r in ec if r["thr_centi"] == 30), 0
            ),
            "lp_auc_ppm": int(lp["auc_r"] * 1e6),
            "attribution_max_effect_ppm": max(
                (int(r["effect_r"] * 1e6) for r in at), default=0
            ),
            "int8_overlap_x20": sum(int(r["overlap3"]) for r in i8),
        }

    def _session17_ops():
        # session-17 additions: KMV sketch, Good-Turing, feature-hash
        # audit, revenue ACF, Pettitt, log-rank, AP@10, linear CKA,
        # conformal p-values, Eulerian check, hyperbolicity, walk
        # spectrum, A/B SRM, rank-1 ALS
        from polar_spark.operators.analytics_queries import (
            q_ab_srm,
            q_als_rank1,
            q_ap_eval,
            q_bcubed_eval,
            q_chi2_independence,
            q_cka_views,
            q_conformal_pvalues,
            q_euler_check,
            q_feature_hash_audit,
            q_gt_smoothing,
            q_hyperbolicity4,
            q_kanon_audit,
            q_kmv_distinct,
            q_kruskal_wallis,
            q_logrank_test,
            q_ks_2samp,
            q_page_hinkley,
            q_best_stump,
            q_simpson_probe,
            q_lorenz_revenue,
            q_popularity_hit10,
            q_runs_test,
            q_hurst_rs,
            q_maxcut_sweep2,
            q_pettitt_change,
            q_revenue_acf,
            q_theil_sen,
            q_walk_entropy,
            q_walk_spectrum8,
        )

        kmv = q_kmv_distinct(spark, sf_dir).collect()
        gt = q_gt_smoothing(spark, sf_dir).collect()
        fh = q_feature_hash_audit(spark, sf_dir).collect()
        acf = q_revenue_acf(spark, sf_dir).collect()
        pt = q_pettitt_change(spark, sf_dir).collect()
        lr = q_logrank_test(spark, sf_dir).collect()[0]
        ap = q_ap_eval(spark, sf_dir).collect()
        cka = q_cka_views(spark, sf_dir).collect()[0]
        cf = q_conformal_pvalues(spark, sf_dir).collect()
        eu = q_euler_check(spark, sf_dir).collect()
        hy = q_hyperbolicity4(spark, sf_dir).collect()
        ws = q_walk_spectrum8(spark, sf_dir).collect()
        ab = q_ab_srm(spark, sf_dir).collect()[0]
        als = q_als_rank1(spark, sf_dir).collect()
        mc = q_maxcut_sweep2(spark, sf_dir).collect()[0]
        ts = q_theil_sen(spark, sf_dir).collect()[0]
        kw = q_kruskal_wallis(spark, sf_dir).collect()
        ci = q_chi2_independence(spark, sf_dir).collect()
        bc = q_bcubed_eval(spark, sf_dir).collect()[0]
        we = q_walk_entropy(spark, sf_dir).collect()[0]
        ka = q_kanon_audit(spark, sf_dir).collect()
        ph = q_page_hinkley(spark, sf_dir).collect()
        ks = q_ks_2samp(spark, sf_dir).collect()[0]
        st = q_best_stump(spark, sf_dir).collect()
        sp = q_simpson_probe(spark, sf_dir).collect()
        lz = q_lorenz_revenue(spark, sf_dir).collect()
        pop = q_popularity_hit10(spark, sf_dir).collect()[0]
        rt = q_runs_test(spark, sf_dir).collect()[0]
        hr = q_hurst_rs(spark, sf_dir).collect()
        return {
            "kmv_max_err_ppm": max(
                (
                    abs(int(r["est"]) - r["n_hashes"]) * 1000000 // r["n_hashes"]
                    for r in kmv
                    if r["kth_min"] > 0
                ),
                default=0,
            ),
            "gt_p0_micro": next((int(r["r_star_micro"]) for r in gt if r["r"] == 0), 0),
            "fh_collision_ppm": int(fh[0]["collision_ppm"]) if fh else 0,
            "acf_lag1_ppm": next(
                (int(r["acf_r"] * 1e6) for r in acf if r["lag"] == 1), 0
            ),
            "pettitt_k2": int(pt[0]["k2"]) if pt else 0,
            "logrank_chi2_milli": int(lr["chi2_r"] * 1000),
            "ap_mean_ppm": sum(int(r["ap_ppm"]) for r in ap) // max(len(ap), 1),
            "cka_ppm": int(cka["cka_r"] * 1e6),
            "conformal_tests": len(cf),
            "euler_components": len(eu),
            "hyper_max_delta2": int(hy[0]["max_delta2"]) if hy else 0,
            "walk_spectrum_rows": len(ws),
            "ab_srm_chi2_milli": int(ab["srm_chi2_r"] * 1000),
            "als_top_part": int(als[0]["part"]) if als else 0,
            "maxcut_gain": int(mc["cut2"] - mc["cut_init"]),
            "maxcut_edges": int(mc["n_edges"]),
            "theil_sen_milli": int(ts["median_slope_milli"]),
            "kruskal_h_milli": int(kw[0]["h_tie_r"] * 1000) if kw else 0,
            "chi2_ind_micro": int(ci[0]["chi2_micro"]) if ci else 0,
            "bcubed_f_ppm": int(bc["bcubed_f_ppm"]),
            "walk_entropy_micro": int(we["h_rate_r"] * 1e6),
            "kanon_min_k": int(ka[0]["min_k"]) if ka else 0,
            "ph_max_micro": max((int(r["ph_micro"]) for r in ph), default=0),
            "ks_d_ppm": int(ks["d_ppm"]),
            "stump_best_disc": next(
                (int(r["disc"]) for r in st if r["is_best"]), -1
            ),
            "simpson_reversals": sum(1 for r in sp if r["sign_reversed"]),
            "revenue_gini_ppm": int(lz[0]["gini_r"] * 1e6) if lz else 0,
            "popularity_hit_ppm": int(pop["hit_ppm"]),
            "runs_z_milli": int(rt["z_r"] * 1000),
            "hurst_micro": int(hr[0]["hurst_r"] * 1e6) if hr else 0,
        }

    # (name, fn, reps) — reps=1 for informational/expensive side
    # configurations (salted = the bounded-reducer insurance path;
    # store ingest writes a fresh store per draw)
    sections = [
        ("extract_edge_table", _extract, REPS),
        ("pagerank_repo_graph", _pr_repo, REPS),
        ("pagerank_zipf_fixed8", _pr_zipf, REPS),
        ("pagerank_zipf_salted8", _pr_zipf_salted, min(REPS, 2)),
        ("pagerank_coorder", _pr_cop, min(REPS, 2)),
        ("connected_components", _cc, REPS),
        ("label_propagation_5", _lpa, REPS),
        ("triangle_count", _tri, REPS),
        ("pagerank_demand", _demand_pr, REPS),
        ("gitlab_pipeline_rollup", _gitlab_rollup, REPS),
        ("graph_store_ingest", _store_ingest, min(REPS, 2)),
        ("core_numbers_coorder", _coreness, min(REPS, 2)),
        # 3 reps (VERDICT r4 #2): the 2-rep record caught a neighbor-
        # section memory-pressure burst (11.8s recorded vs ~5s standalone)
        ("minhash_neardup", _neardup, REPS),
        ("dedup_exact", _dedup, REPS),
        ("knn_cosine_top3", _knn, REPS),
        ("ann_recall", _ann_recall, 1),
        ("msf_copart", _msf, min(REPS, 2)),
        ("seq_packing", _packing, min(REPS, 2)),
        ("cm_heavy_hitters", _cm_sketch, min(REPS, 2)),
        ("corpus_curation", _curation, min(REPS, 2)),
        # best-of-2: the first streaming draw pays query/trigger JIT
        # warm-up (9k cold vs 32k warm msgs/s measured standalone)
        ("stream_scenarios", _stream_scenarios, min(REPS, 2)),
        ("dag_path_counts", _dag_paths, min(REPS, 2)),
        ("louvain_move_full", _louvain, min(REPS, 2)),
        ("louvain_multilevel", _louvain_full, 1),
        ("squares_coorder", _squares, min(REPS, 2)),
        ("round5_text_ops", _round5_text, 1),
        ("round5_graph_ops", _round5_graph, 1),
        ("round5_session3_ops", _round5_session3, min(REPS, 2)),
        ("motif_census", _motif_census, 1),
        ("tpch_classics", _tpch_classics, min(REPS, 2)),
        ("session7_graph_ops", _session7_graph, min(REPS, 2)),
        ("session8_ops", _session8_ops, min(REPS, 2)),
        ("session9_ops", _session9_ops, min(REPS, 2)),
        ("session14_ops", _session14_ops, min(REPS, 2)),
        ("session15_ops", _session15_ops, min(REPS, 2)),
        ("session16_ops", _session16_ops, min(REPS, 2)),
        ("session17_ops", _session17_ops, min(REPS, 2)),
        ("bucketed_join", _bucketed_join, 1),
    ]

    # dev-loop filter: SPARK_GRAFT_BENCH_ONLY=a,b runs just those
    # sections (the recorded artifacts always run the full list)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",")}
        sections = [s for s in sections if s[0] in keep]

    draws: dict[str, list[float]] = {name: [] for name, _f, _r in sections}
    best_extras: dict[str, dict] = {}
    max_reps = max(r for _n, _f, r in sections)
    for rep in range(max_reps):
        for name, fn, reps in sections:
            if rep >= reps:
                continue
            t0 = time.monotonic()
            out = fn() or {}
            dt = round(time.monotonic() - t0, 3)
            draws[name].append(dt)
            if dt == min(draws[name]):
                best_extras[name] = out

    for name, _fn, reps in sections:
        queries[name] = min(draws[name])
        if reps > 1:
            extra[f"{name}_draws"] = draws[name]
        extra.update(best_extras.get(name, {}))

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
