"""SCAN structural clustering (Xu et al., KDD'07).

The registered query `scan_clusters` has a DuckDB oracle
(test_entry_contract replays it at sf0.001); these tests pin the
algorithm on hand-built graphs and a python replay.
"""

from __future__ import annotations

import random

from polar_spark.plans import pregel


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _scan_replay(und_pairs, eps_num=7, eps_den=10, mu=3):
    """Python replay of the identical integer-exact SCAN."""
    adj: dict[int, set[int]] = {}
    for a, b in und_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sim: dict[int, set[int]] = {v: set() for v in adj}
    for a, b in und_pairs:
        cn = len(adj[a] & adj[b])
        if (cn + 2) ** 2 * eps_den**2 >= eps_num**2 * (len(adj[a]) + 1) * (len(adj[b]) + 1):
            sim[a].add(b)
            sim[b].add(a)
    cores = {v for v in adj if len(sim[v]) + 1 >= mu}
    # components over core-core sim edges, label = min id
    cluster: dict[int, int] = {}
    for c in sorted(cores):
        if c in cluster:
            continue
        stack, comp = [c], []
        seen = {c}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in sim[x] & cores:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        label = min(comp)
        for x in comp:
            cluster[x] = label
    out = {}
    for v in adj:
        if v in cores:
            out[v] = ("core", cluster[v])
        else:
            adj_core_clusters = [cluster[u] for u in sim[v] if u in cores]
            if adj_core_clusters:
                out[v] = ("border", min(adj_core_clusters))
            else:
                out[v] = ("outlier", -1)
    return out


BARBELL = (
    [(i, j) for i in (1, 2, 3, 4) for j in (1, 2, 3, 4) if i < j]
    + [(i, j) for i in (11, 12, 13, 14) for j in (11, 12, 13, 14) if i < j]
    + [(1, 20), (11, 20), (20, 30), (1, 5), (2, 5)]
    + [(50, 51), (51, 52), (50, 52), (50, 53)]
)


def test_scan_barbell_roles_and_clusters(spark):
    out = {
        r["id"]: (r["role"], r["cluster"])
        for r in pregel.scan_clusters(_edges(spark, BARBELL)).collect()
    }
    assert out == _scan_replay(BARBELL)
    # qualitative shape: the two K4s are core clusters labeled by min id
    # (vertex 5's two σ-edges into clique A make it a core of cluster 1);
    # the bridge hub and its leaf are OUTLIERS (SCAN separates them from
    # communities); the triangle is a third cluster whose pendant is the
    # genuine BORDER case (exactly one σ-edge, to a core)
    for v in (1, 2, 3, 4, 5):
        assert out[v] == ("core", 1)
    for v in (11, 12, 13, 14):
        assert out[v] == ("core", 11)
    assert out[20] == ("outlier", -1) and out[30] == ("outlier", -1)
    for v in (50, 51, 52):
        assert out[v] == ("core", 50)
    assert out[53] == ("border", 50)


def test_scan_matches_python_replay_random(spark):
    rng = random.Random(23)
    und = sorted(
        {(a, b) for a, b in ((rng.randrange(20), rng.randrange(20)) for _ in range(70)) if a < b}
    )
    out = {
        r["id"]: (r["role"], r["cluster"])
        for r in pregel.scan_clusters(_edges(spark, und)).collect()
    }
    assert out == _scan_replay(und)


def test_scan_complete_graph_single_cluster(spark):
    k5 = [(i, j) for i in range(5) for j in range(5) if i < j]
    out = pregel.scan_clusters(_edges(spark, k5)).collect()
    assert all(r["role"] == "core" and r["cluster"] == 0 for r in out)
    assert len(out) == 5


def test_scan_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert pregel.scan_clusters(e).collect() == []
