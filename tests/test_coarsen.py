"""Heavy-edge-matching graph coarsening (multilevel primitive).

The registered query `coarsen_hem` has a DuckDB oracle
(test_entry_contract replays it at sf0.001); these tests pin the
algorithm on hand-built weighted graphs and a python replay of the
synchronous mutual-proposal rounds.
"""

from __future__ import annotations

import random

from polar_spark.plans import pregel


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def _hem_replay(triples):
    """Python replay of the identical synchronous weight-greedy rounds
    followed by min-id contraction."""
    und: dict[tuple[int, int], int] = {}
    for a, b, w in triples:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        und[k] = und.get(k, 0) + w
    edges = dict(und)
    matched: list[tuple[int, int]] = []
    while edges:
        prop: dict[int, tuple[int, int]] = {}
        verts = {v for e in edges for v in e}
        for v in verts:
            inc = [(e, w) for e, w in edges.items() if v in e]
            e_best = min(inc, key=lambda t: (-t[1], t[0]))[0]
            prop[v] = e_best
        sel = {e for e in edges if prop[e[0]] == e and prop[e[1]] == e}
        if not sel:
            break
        matched.extend(sorted(sel))
        hit = {v for e in sel for v in e}
        edges = {e: w for e, w in edges.items() if e[0] not in hit and e[1] not in hit}
    sup = {}
    for a, b in matched:
        sup[a] = a
        sup[b] = a
    coarse: dict[tuple[int, int], int] = {}
    for (a, b), w in und.items():
        sa, sb = sup.get(a, a), sup.get(b, b)
        if sa == sb:
            continue
        k = (min(sa, sb), max(sa, sb))
        coarse[k] = coarse.get(k, 0) + w
    return und, sorted(matched), sorted((u, v, w) for (u, v), w in coarse.items())


def test_hem_prefers_heavy_edge_on_path(spark):
    # path 1-2-3-4 with weights 5, 9, 1: round 1 matches ONLY the heavy
    # middle edge (both 2 and 3 propose it); its neighbors then drop,
    # so 1 and 4 stay singletons — weight-greedy, not id-greedy
    coarse, mapping, stats = pregel.coarsen_hem(
        _wedges(spark, [(1, 2, 5), (2, 3, 9), (3, 4, 1)])
    )
    m = {r["id"]: r["super"] for r in mapping.collect()}
    assert m == {1: 1, 2: 2, 3: 2, 4: 4}
    out = sorted(map(tuple, coarse.collect()))
    assert out == [(1, 2, 5), (2, 4, 1)]
    assert stats.converged


def test_hem_contraction_sums_parallel_edges(spark):
    # triangle (1,2,w10), (2,3,w10), (1,3,w1): (1,2) matches (tie on w
    # broken by (a,b)); contracting 2 into 1 makes the two remaining
    # edges parallel -> one coarse edge with summed weight 11
    coarse, _m, _s = pregel.coarsen_hem(
        _wedges(spark, [(1, 2, 10), (2, 3, 10), (1, 3, 1)])
    )
    assert sorted(map(tuple, coarse.collect())) == [(1, 3, 11)]


def test_hem_matches_python_replay_and_conserves_weight(spark):
    rng = random.Random(41)
    triples = [
        (rng.randrange(16), rng.randrange(16), rng.randrange(1, 50)) for _ in range(50)
    ]
    triples = [(a, b, w) for a, b, w in triples if a != b]
    und, matched, coarse_golden = _hem_replay(triples)
    coarse, mapping, _s = pregel.coarsen_hem(_wedges(spark, triples))
    out = sorted(map(tuple, coarse.collect()))
    assert out == coarse_golden
    # weight conservation: coarse total + contracted (intra-super) total
    # == original total
    sup = {r["id"]: r["super"] for r in mapping.collect()}
    intra = sum(w for (a, b), w in und.items() if sup[a] == sup[b])
    assert sum(w for _u, _v, w in out) + intra == sum(und.values())
    # supervertex count drops by exactly |matching|
    assert len(set(sup.values())) == len(sup) - len(matched)


def test_hem_empty(spark):
    e = spark.createDataFrame([], "src long, dst long, w long")
    coarse, mapping, stats = pregel.coarsen_hem(e)
    assert coarse.collect() == [] and mapping.collect() == [] and stats.converged


def test_multilevel_fiedler_composition_splits_weighted_barbell(spark):
    # two w=10 K4 cliques + a w=1 bridge: HEM contracts within cliques
    # (heavy edges first), the coarse graph is a 4-path whose Fiedler
    # direction signs the two sides apart; projecting through the
    # mapping must split the ORIGINAL vertices exactly by clique
    a = [(i, j, 10) for i in (1, 2, 3, 4) for j in (1, 2, 3, 4) if i < j]
    b = [(i, j, 10) for i in (11, 12, 13, 14) for j in (11, 12, 13, 14) if i < j]
    coarse, mapping, _s = pregel.coarsen_hem(_wedges(spark, a + b + [(4, 11, 1)]))
    from pyspark.sql import functions as F

    f = pregel.fiedler_vector(
        pregel.symmetrize(coarse.select(F.col("u").alias("src"), F.col("v").alias("dst"))),
        n_iter=20,
    )
    out = {
        r["id"]: r["f"]
        for r in mapping.join(f.withColumnRenamed("id", "super"), "super").collect()
    }
    assert set(out) == {1, 2, 3, 4, 11, 12, 13, 14}
    left = [out[v] for v in (1, 2, 3, 4)]
    right = [out[v] for v in (11, 12, 13, 14)]
    assert all(x < 0 for x in left) != all(x < 0 for x in right)
    assert all(x < 0 for x in left) or all(x > 0 for x in left)
    assert all(x < 0 for x in right) or all(x > 0 for x in right)
