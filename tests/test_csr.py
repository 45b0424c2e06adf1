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
