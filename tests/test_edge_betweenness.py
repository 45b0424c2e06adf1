"""Landmark edge betweenness (Girvan-Newman centrality).

The registered query `edge_betweenness4` has a DuckDB oracle
(test_entry_contract replays it at sf0.001); these tests pin the
algorithm on hand-built graphs and a python Brandes replay.
"""

from __future__ import annotations

import random
from collections import deque

from polar_spark.plans import pregel


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _sym_pairs(pairs):
    return pairs + [(b, a) for a, b in pairs]


def _edge_brandes_replay(und_pairs, sources, max_depth):
    """Python replay of bounded-depth Brandes with per-edge terms."""
    adj: dict[int, list[int]] = {}
    for a, b in und_pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    eb: dict[tuple[int, int], float] = {tuple(sorted(p)): 0.0 for p in und_pairs}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_depth:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for u in adj[w]:
                if u in dist and dist[u] == dist[w] - 1:
                    c = sigma[u] / sigma[w] * (1.0 + delta[w])
                    delta[u] += c
                    eb[tuple(sorted((u, w)))] += c
    return eb


def test_edge_betweenness_path_single_source(spark):
    # path 1-2-3-4 from source 1: edge loads are 3, 2, 1 (each edge
    # carries the shortest paths to everything beyond it)
    pairs = [(1, 2), (2, 3), (3, 4)]
    eb, _ = pregel.edge_betweenness_landmarks(
        _edges(spark, _sym_pairs(pairs)), landmarks=[1], max_depth=4
    )
    out = {(r["u"], r["v"]): r["eb"] for r in eb.collect()}
    assert out == {(1, 2): 3.0, (2, 3): 2.0, (3, 4): 1.0}


def test_edge_betweenness_star_all_sources(spark):
    # star centered at 0: every edge carries 6 source-target paths
    # (3 from its own leaf, 1 from the center, 2 from the other leaves)
    pairs = [(0, 1), (0, 2), (0, 3)]
    eb, _ = pregel.edge_betweenness_landmarks(
        _edges(spark, _sym_pairs(pairs)), landmarks=[0, 1, 2, 3], max_depth=4
    )
    out = {(r["u"], r["v"]): r["eb"] for r in eb.collect()}
    assert out == {(0, 1): 6.0, (0, 2): 6.0, (0, 3): 6.0}


def test_edge_betweenness_bridge_dominates(spark):
    # two triangles joined by one bridge: the bridge edge carries every
    # cross-side pair and must strictly dominate any intra-triangle edge
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    eb, _ = pregel.edge_betweenness_landmarks(
        _edges(spark, _sym_pairs(pairs)), landmarks=[1, 2, 3, 4, 5, 6], max_depth=6
    )
    out = {(r["u"], r["v"]): r["eb"] for r in eb.collect()}
    bridge = out[(3, 4)]
    for e_, val in out.items():
        if e_ != (3, 4):
            assert bridge > val, (e_, val, bridge)


def test_edge_betweenness_matches_python_replay(spark):
    rng = random.Random(31)
    und = sorted(
        {(a, b) for a, b in ((rng.randrange(14), rng.randrange(14)) for _ in range(40)) if a < b}
    )
    sources = sorted({a for a, _ in und})[:4]
    golden = _edge_brandes_replay(und, sources, max_depth=4)
    eb, _ = pregel.edge_betweenness_landmarks(
        _edges(spark, _sym_pairs(und)), landmarks=sources, max_depth=4
    )
    out = {(r["u"], r["v"]): r["eb"] for r in eb.collect()}
    assert set(out) == set(golden)
    for k in golden:
        assert abs(out[k] - golden[k]) < 1e-9, (k, out[k], golden[k])


def test_edge_betweenness_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    eb, stats = pregel.edge_betweenness_landmarks(e, landmarks=[1], max_depth=3)
    assert eb.collect() == [] and stats.converged
