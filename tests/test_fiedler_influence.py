"""Fiedler-direction estimate (spectral bisection) and single-discount
influence-maximization seeding.

Each operator also has a registered query + DuckDB oracle
(test_entry_contract replays those at sf0.001); these tests pin the
algorithmic properties on hand-built graphs and python replays.
"""

from __future__ import annotations

import math
import random

from polar_spark.plans import pregel


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _sym_pairs(pairs):
    return pairs + [(b, a) for a, b in pairs]


def _fiedler_replay(pairs, n_iter):
    """Python replay of the identical deflated power iteration."""
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    ids = sorted(adj)
    deg = {v: len(adj[v]) for v in ids}
    c = max(deg.values()) + 1.0

    def center_normalize(y):
        m = sum(y.values()) / len(y)
        z = {v: y[v] - m for v in y}
        n = math.sqrt(sum(x * x for x in z.values()))
        return {v: z[v] / n for v in z}

    x = center_normalize({v: float(v) for v in ids})
    for _ in range(n_iter):
        y = {v: (c - deg[v]) * x[v] + sum(x[u] for u in adj[v]) for v in ids}
        x = center_normalize(y)
    return x


def test_fiedler_separates_barbell_cliques(spark):
    # two K4 cliques joined by one bridge: the Fiedler direction signs
    # the two cliques apart (the defining spectral-bisection property)
    a = [(i, j) for i in range(4) for j in range(4) if i < j]
    b = [(i, j) for i in range(10, 14) for j in range(10, 14) if i < j]
    pairs = _sym_pairs(a + b + [(3, 10)])
    out = {r["id"]: r["f"] for r in pregel.fiedler_vector(_edges(spark, pairs), n_iter=30).collect()}
    left = [out[v] for v in range(4)]
    right = [out[v] for v in range(10, 14)]
    assert all(x < 0 for x in left) != all(x < 0 for x in right)  # opposite sides
    assert all(x < 0 for x in left) or all(x > 0 for x in left)
    assert all(x < 0 for x in right) or all(x > 0 for x in right)


def test_fiedler_matches_python_replay(spark):
    rng = random.Random(3)
    und = {(a, b) for a, b in ((rng.randrange(10), rng.randrange(10)) for _ in range(30)) if a < b}
    pairs = _sym_pairs(sorted(und))
    golden = _fiedler_replay(pairs, n_iter=4)
    out = {r["id"]: r["f"] for r in pregel.fiedler_vector(_edges(spark, pairs), n_iter=4).collect()}
    assert set(out) == set(golden)
    for v in golden:
        assert abs(out[v] - golden[v]) < 1e-9, (v, out[v], golden[v])


def test_fiedler_unit_norm_and_zero_mean(spark):
    pairs = _sym_pairs([(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (1, 3)])
    vals = [r["f"] for r in pregel.fiedler_vector(_edges(spark, pairs), n_iter=4).collect()]
    assert abs(sum(vals)) < 1e-9  # deflated against the constant vector
    assert abs(sum(v * v for v in vals) - 1.0) < 1e-9  # L2-normalized


def test_influence_seeds_discount_beats_raw_degree_tie(spark):
    # A(id 1): deg 6 (B + five leaves); B(id 2): deg 5 (A + four leaves);
    # C(id 3): deg 5 (five leaves).  Plain top-k degree with id ties
    # would rank B before C; the discount (A is a chosen neighbor of B)
    # drops B to 4, so the greedy picks A, C, B.
    pairs = (
        [(1, 2)]
        + [(1, v) for v in (11, 12, 13, 14, 15)]
        + [(2, v) for v in (21, 22, 23, 24)]
        + [(3, v) for v in (31, 32, 33, 34, 35)]
    )
    out = pregel.influence_seeds(_edges(spark, _sym_pairs(pairs)), k=3).orderBy("rank").collect()
    assert [(r["rank"], r["id"], r["dd"]) for r in out] == [(1, 1, 6), (2, 3, 5), (3, 2, 4)]


def test_influence_seeds_matches_python_replay(spark):
    rng = random.Random(17)
    und = {(a, b) for a, b in ((rng.randrange(15), rng.randrange(15)) for _ in range(45)) if a < b}
    pairs = _sym_pairs(sorted(und))
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    chosen: list[tuple[int, int, int]] = []
    picked: set[int] = set()
    for i in range(1, 6):
        cand = [
            (len(adj[v]) - len(adj[v] & picked), -v, v)
            for v in adj
            if v not in picked
        ]
        dd, _, v = max(cand)
        chosen.append((i, v, dd))
        picked.add(v)
    out = pregel.influence_seeds(_edges(spark, pairs), k=5).orderBy("rank").collect()
    assert [(r["rank"], r["id"], r["dd"]) for r in out] == chosen


def test_influence_seeds_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert pregel.influence_seeds(e, k=3).collect() == []
