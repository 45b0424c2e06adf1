#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "extra": {...}}

Headline set mirrors the north rule: edge-table extraction from the
synthetic source-code corpus, PageRank to 1e-6 convergence, connected
components, LPA, triangle counting on the derived graphs, plus the
training-data ops (dedup hash, kNN cosine).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


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
    from polar_spark.sources.synthetic import gen_source_table

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="polar_spark_bench",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    queries: dict[str, float] = {}
    extra: dict[str, object] = {"cpus": cpus}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        queries[name] = round(time.monotonic() - t0, 3)
        return out

    # -- extraction: synthetic source corpus sized with sf ----------------
    n_repos = max(200, int(20000 * sf)) if sf > 0 else 2000
    src = gen_source_table(spark, n_repos=n_repos, files_per_repo=8, n_commits=1).persist()
    src.count()  # generation materialized outside the timed region

    def _extract():
        files = extract_files(src)
        n_files = files.count()
        deps = extract_dependencies(src)
        edges = build_repo_edges(deps, repos_dim(src)).persist()
        n_edges = edges.count()
        extra["extract_files"] = n_files
        extra["extract_repo_edges"] = n_edges
        return edges

    repo_edges = timed("extract_edge_table", _extract)

    # -- pagerank to 1e-6 on the extracted repo-dependency graph ----------
    def _pr_repo():
        ranks, st = pregel.pagerank(repo_edges, tol=1e-6, max_iter=60)
        extra["pr_repo_iters"] = st.iterations
        extra["pr_repo_converged"] = st.converged
        extra["pr_repo_edges"] = st.edges
        wall = sum(st.iter_seconds)
        extra["pr_repo_iters_per_sec"] = round(st.iterations / wall, 3) if wall else None
        extra["pr_repo_edges_per_sec"] = (
            round(st.edges * st.iterations / wall) if wall else None
        )
        return ranks

    timed("pagerank_repo_graph", _pr_repo)

    # -- throughput headline: Zipf graph scaled by sf, fixed 8 iterations.
    #    Two configurations, both timed: the default plan (fused loop,
    #    map-side partial agg absorbs this hub profile) and the salted
    #    two-phase aggregation — the insurance policy for skew beyond
    #    what per-partition combine can hold at 1000-executor scale.
    #    Measured: salting costs ~70% here BECAUSE the plain combine
    #    already pre-collapses hub dsts; it is not the fast path, it is
    #    the bounded-reducer path — so both numbers are reported.
    from polar_spark.sources.synthetic import gen_zipf_edges

    m_edges = max(1_000_000, int(100_000_000 * sf)) if sf > 0 else 10_000_000
    zedges = gen_zipf_edges(
        spark, m_edges, max(m_edges // 10, 1000), partitions=3 * cpus
    )

    def _pr_zipf():
        _r, st = pregel.pagerank(zedges, tol=0.0, max_iter=8, num_partitions=3 * cpus)
        wall = sum(st.iter_seconds)
        extra["zipf_edges"] = st.edges
        extra["zipf_iters_per_sec"] = round(st.iterations / wall, 4) if wall else None
        extra["zipf_edges_per_sec"] = round(st.edges * st.iterations / wall) if wall else None

    timed("pagerank_zipf_fixed8", _pr_zipf)

    def _pr_zipf_salted():
        # classic loop: chaining the salted double-aggregation lazily
        # (fused) triples in-flight shuffle state and measures slower
        _r, st = pregel.pagerank(
            zedges, tol=0.0, max_iter=8, num_partitions=3 * cpus,
            salt_buckets=16, fuse=False,
        )
        wall = sum(st.iter_seconds)
        extra["zipf_salted_edges_per_sec"] = (
            round(st.edges * st.iterations / wall) if wall else None
        )

    timed("pagerank_zipf_salted8", _pr_zipf_salted)

    # -- derived graphs from the sf tables: the sparse co-order part graph
    #    (the supplier co-part graph is near-complete at every sf — a
    #    degenerate clique that measured nothing but its own density) ----
    cop = timed("coorder_edge_build", lambda: coorder_edges(spark, sf_dir).persist())
    extra["coorder_edges"] = cop.count()

    def _pr_cop():
        ranks, st = pregel.pagerank(_sym(cop), tol=1e-6, max_iter=60)
        extra["pr_coorder_iters"] = st.iterations
        extra["pr_coorder_converged"] = st.converged
        extra["pr_coorder_edges"] = st.edges
        wall = sum(st.iter_seconds)
        extra["pr_coorder_iters_per_sec"] = round(st.iterations / wall, 3) if wall else None
        extra["pr_coorder_edges_per_sec"] = (
            round(st.edges * st.iterations / wall) if wall else None
        )

    timed("pagerank_coorder", _pr_cop)
    timed("connected_components", lambda: pregel.connected_components(cop)[0].count())
    timed("label_propagation_5", lambda: pregel.label_propagation(cop, max_iter=5)[0].count())

    def _tri():
        _pv, total = pregel.triangle_count(cop)
        extra["triangles_total"] = total

    timed("triangle_count", _tri)

    def _demand_pr():
        e = demand_edges(spark, sf_dir)
        ranks, st = pregel.pagerank(e, tol=1e-6, max_iter=60)
        extra["pr_demand_iters"] = st.iterations
        extra["pr_demand_edges"] = st.edges

    timed("pagerank_demand", _demand_pr)

    # -- domain projection + graph-store mutation throughput ---------------
    # (the reference's write path is one Cypher tx per op through a
    # single actor; this measures the set-oriented batch equivalent)
    def _gitlab_rollup():
        from polar_spark.operators.analytics_queries import q_gitlab_pipeline_rollup

        extra["gitlab_projects"] = q_gitlab_pipeline_rollup(spark, sf_dir).count()

    timed("gitlab_pipeline_rollup", _gitlab_rollup)

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
            extra["store_vertices"] = store.vertices.count()
            extra["store_edges"] = store.edges.count()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    timed("graph_store_ingest", _store_ingest)

    # -- training-data ops --------------------------------------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    timed(
        "dedup_exact",
        lambda: docs.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep"))
        .count(),
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def _knn():
        from polar_spark.operators.analytics_queries import q_knn_cosine

        return q_knn_cosine(spark, sf_dir).count()

    timed("knn_cosine_top3", _knn)

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
