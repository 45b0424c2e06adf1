"""CSR-block path cross-checked against the pure-DataFrame engine."""

import pytest
from pyspark.sql import functions as F

from polar_spark.plans import csr, pregel
from tests.oracles import py_pagerank, zipf_digraph


@pytest.fixture(scope="module")
def graph(spark):
    edges = zipf_digraph(n=150, m=900, seed=13)
    return edges, spark.createDataFrame(edges, "src long, dst long")


def test_csr_blocks_cover_all_edges(spark, graph):
    edges, edf = graph
    blocks = csr.build_csr_blocks(edf, n_blocks=4).collect()
    seen = set()
    for b in blocks:
        indptr, src_ids, dst_ids = b["indptr"], b["src_ids"], b["dst_ids"]
        assert len(b["out_deg"]) == len(src_ids) == len(indptr) - 1
        for i, s in enumerate(src_ids):
            assert s % 4 == b["block"]
            for j in range(indptr[i], indptr[i + 1]):
                seen.add((s, dst_ids[j]))
    assert seen == set(edges)


def test_csr_blocks_survive_batch_split(spark):
    """Regression: a hub src whose edge rows straddle the Arrow batch
    boundary must keep its whole adjacency (and global out_deg) in one
    CSR row — pre-fix, chunk-local out_deg distributed the hub's full
    rank once per chunk, inflating contributed mass."""
    # hub 0 → 1..1000 (1000 out-edges ≫ the 64-row batch), plus a tail
    edges = [(0, d) for d in range(1, 1001)] + [(d, 0) for d in range(1, 50)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        blocks = csr.build_csr_blocks(edf, n_blocks=4).collect()
        deg = {}
        for b in blocks:
            for s, d in zip(b["src_ids"], b["out_deg"]):
                assert s not in deg, f"src {s} split across CSR rows"
                deg[s] = d
        assert deg[0] == 1000
        csr_ranks, _ = csr.pagerank_csr(edf, tol=1e-10, max_iter=100, n_blocks=4)
        b = {r["id"]: r["rank"] for r in csr_ranks.collect()}
    finally:
        spark.conf.set(key, old)
    df_ranks, _ = pregel.pagerank(edf, tol=1e-10, max_iter=100)
    a = {r["id"]: r["rank"] for r in df_ranks.collect()}
    assert max(abs(a[k] - b[k]) for k in a) < 1e-9
    assert abs(sum(b.values()) - 1.0) < 1e-9


def test_pagerank_csr_empty_graph(spark):
    ranks, stats = csr.pagerank_csr(
        spark.createDataFrame([], "src long, dst long"), n_blocks=2
    )
    assert ranks.count() == 0 and stats.converged


def test_pagerank_csr_matches_dataframe_path(graph):
    edges, edf = graph
    df_ranks, df_stats = pregel.pagerank(edf, tol=1e-9, max_iter=200)
    csr_ranks, csr_stats = csr.pagerank_csr(edf, tol=1e-9, max_iter=200, n_blocks=4)
    a = {r["id"]: r["rank"] for r in df_ranks.collect()}
    b = {r["id"]: r["rank"] for r in csr_ranks.collect()}
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-9
    exp = py_pagerank(edges)
    assert max(abs(b[k] - exp[k]) for k in exp) < 1e-6
    assert csr_stats.converged
