"""Golden tests for the iterative engine (north-rule correctness bar:
PageRank/LPA allclose 1e-6, components + triangles exact, deterministic
re-runs, checkpoint/resume identity)."""

import shutil
import tempfile

import pytest

from polar_spark.plans import pregel
from tests.oracles import py_components, py_lpa, py_pagerank, py_triangles, zipf_digraph


@pytest.fixture(scope="module")
def graph(spark):
    edges = zipf_digraph(n=200, m=1200, seed=7)
    return edges, spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_allclose(graph):
    edges, edf = graph
    ranks, stats = pregel.pagerank(edf, tol=1e-8, max_iter=200)
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    exp = py_pagerank(edges)
    assert stats.converged
    assert set(got) == set(exp)
    assert max(abs(got[k] - exp[k]) for k in exp) < 1e-6
    # mass conservation
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_salted_matches_unsalted(graph):
    edges, edf = graph
    plain, _ = pregel.pagerank(edf, tol=1e-8, max_iter=200)
    salted, _ = pregel.pagerank(edf, tol=1e-8, max_iter=200, salt_buckets=4)
    p = {r["id"]: r["rank"] for r in plain.collect()}
    s = {r["id"]: r["rank"] for r in salted.collect()}
    assert max(abs(p[k] - s[k]) for k in p) < 1e-9


def test_pagerank_checkpoint_resume(graph):
    edges, edf = graph
    tmp = tempfile.mkdtemp(prefix="polar_ckpt_")
    try:
        # full run with durable checkpoints
        full, fstats = pregel.pagerank(
            edf, tol=1e-8, max_iter=200, checkpoint_dir=tmp, checkpoint_every=3
        )
        fvals = {r["id"]: r["rank"] for r in full.collect()}
        # fresh dir: run only a few iterations (simulated kill), then resume
        tmp2 = tempfile.mkdtemp(prefix="polar_ckpt2_")
        try:
            pregel.pagerank(edf, tol=0.0, max_iter=6, checkpoint_dir=tmp2, checkpoint_every=3)
            resumed, rstats = pregel.pagerank(
                edf, tol=1e-8, max_iter=200, checkpoint_dir=tmp2, checkpoint_every=3, resume=True
            )
            assert rstats.resumed_from == 6
            rvals = {r["id"]: r["rank"] for r in resumed.collect()}
            exp = py_pagerank(edges)
            assert max(abs(rvals[k] - exp[k]) for k in exp) < 1e-6
            assert max(abs(rvals[k] - fvals[k]) for k in fvals) < 1e-6
        finally:
            shutil.rmtree(tmp2, ignore_errors=True)
        # lineage metadata recorded per completed checkpoint
        ck = pregel._Ckpt(edf.sparkSession, tmp, "pagerank")
        meta = ck.completed()
        assert meta and all("partitions" in m and m["partitions"] for m in meta)
        assert meta[-1]["iteration"] == fstats.iterations
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_pagerank_incremental_warm_start(graph, spark):
    """Edge-delta update path: warm-starting from the previous graph's
    converged ranks reaches the new fixpoint in fewer rounds than a
    cold start, with the same result (unique fixpoint)."""
    edges, edf = graph
    base, st0 = pregel.pagerank(edf, tol=1e-9, max_iter=300)
    delta = [(7, 191), (191, 3), (42, 7), (150, 151)]
    new_edges = spark.createDataFrame(sorted(set(edges) | set(delta)), "src long, dst long")
    cold, st_cold = pregel.pagerank(new_edges, tol=1e-9, max_iter=300)
    warm, st_warm = pregel.pagerank(new_edges, tol=1e-9, max_iter=300, init_ranks=base)
    assert st_warm.converged and st_cold.converged
    # warm start begins at perturbation distance, not cold's distance
    # from uniform (iteration count itself is spectral-profile-dependent)
    assert st_warm.deltas[0] < st_cold.deltas[0] / 2
    # the degenerate delta: warm-starting the UNCHANGED graph converges
    # immediately — the strong guarantee of the incremental path
    same, st_same = pregel.pagerank(edf, tol=1e-9, max_iter=300, init_ranks=base)
    assert st_same.iterations == 1 and st_same.converged
    a = {r["id"]: r["rank"] for r in cold.collect()}
    b = {r["id"]: r["rank"] for r in warm.collect()}
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-6
    assert abs(sum(b.values()) - 1.0) < 1e-9


def test_pagerank_fused_fixed_matches_classic(graph):
    """tol=0 triggers the fused lazily-chained fixed-iteration path; it
    must produce the SAME ranks as the classic per-round loop (tol so
    small it never converges → same 12 rounds), dangling mass included
    (the zipf digraph has dangling vertices)."""
    edges, edf = graph
    fused, st_f = pregel.pagerank(edf, tol=0.0, max_iter=12)
    classic, st_c = pregel.pagerank(edf, tol=1e-300, max_iter=12)
    assert st_f.fused and not st_c.fused
    assert st_f.iterations == st_c.iterations == 12
    a = {r["id"]: r["rank"] for r in fused.collect()}
    b = {r["id"]: r["rank"] for r in classic.collect()}
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) == 0.0  # bit-identical arithmetic
    assert abs(st_f.final_delta - st_c.final_delta) == 0.0
    assert abs(sum(a.values()) - 1.0) < 1e-9  # mass conserved (dangling folded)


def test_pagerank_fused_salted_and_chunked(graph, spark):
    edges, edf = graph
    plain, _ = pregel.pagerank(edf, tol=0.0, max_iter=6)
    salted, _ = pregel.pagerank(edf, tol=0.0, max_iter=6, salt_buckets=4)
    a = {r["id"]: r["rank"] for r in plain.collect()}
    b = {r["id"]: r["rank"] for r in salted.collect()}
    assert max(abs(a[k] - b[k]) for k in a) < 1e-12
    # durable checkpoints chunk the fused chain without changing results
    tmp = tempfile.mkdtemp(prefix="polar_fused_ckpt_")
    try:
        chunked, st = pregel.pagerank(
            edf, tol=0.0, max_iter=6, checkpoint_dir=tmp, checkpoint_every=2
        )
        c = {r["id"]: r["rank"] for r in chunked.collect()}
        assert max(abs(a[k] - c[k]) for k in a) < 1e-15
        assert st.iterations == 6
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_connected_components_exact(graph, spark):
    edges, edf = graph
    comp, stats = pregel.connected_components(edf)
    got = {r["id"]: r["comp"] for r in comp.collect()}
    exp = py_components(edges)
    assert stats.converged
    assert got == exp


def test_connected_components_disjoint(spark):
    # 3 known components incl. a long chain (exercises multi-round min-prop)
    chain = [(i, i + 1) for i in range(10, 20)]
    ring = [(30, 31), (31, 32), (32, 30)]
    pair = [(40, 41)]
    edges = chain + ring + pair
    edf = spark.createDataFrame(edges, "src long, dst long")
    comp, stats = pregel.connected_components(edf)
    got = {r["id"]: r["comp"] for r in comp.collect()}
    assert {got[i] for i in range(10, 21)} == {10}
    assert {got[i] for i in (30, 31, 32)} == {30}
    assert {got[i] for i in (40, 41)} == {40}


def test_cc_star_matches_hashmin_and_oracle(graph, spark):
    """Large-star/small-star CC is exact-equal to hash-min and the
    union-find oracle on the skewed random graph."""
    edges, edf = graph
    star, st = pregel.connected_components_star(edf)
    hashmin, _ = pregel.connected_components(edf)
    a = {r["id"]: r["comp"] for r in star.collect()}
    b = {r["id"]: r["comp"] for r in hashmin.collect()}
    assert a == b
    exp = py_components(edges)
    assert a == exp
    assert st.converged


def test_cc_star_long_chain(spark):
    """A 400-vertex path: hash-min needs O(diameter)=400 rounds; star
    converges in O(log² n) — and is still exact."""
    chain = [(i, i + 1) for i in range(400)]
    edf = spark.createDataFrame(chain, "src long, dst long")
    comp, st = pregel.connected_components_star(edf, max_iter=30)
    rows = comp.collect()
    assert len(rows) == 401
    assert all(r["comp"] == 0 for r in rows)
    assert st.converged and st.iterations <= 15  # far below diameter
    # two disjoint chains keep distinct minima
    two = chain + [(1000 + i, 1001 + i) for i in range(50)]
    comp2, _ = pregel.connected_components_star(
        spark.createDataFrame(two, "src long, dst long")
    )
    comps = {r["comp"] for r in comp2.collect()}
    assert comps == {0, 1000}


def test_triangles_exact(graph):
    edges, edf = graph
    pv, total = pregel.triangle_count(edf)
    exp_pv, exp_total = py_triangles(edges)
    assert total == exp_total
    got = {r["id"]: r["triangles"] for r in pv.collect()}
    for k, v in exp_pv.items():
        assert got.get(k, 0) == v


def test_lpa_matches_oracle_and_deterministic(graph):
    edges, edf = graph
    l1, stats = pregel.label_propagation(edf, max_iter=3)
    l2, _ = pregel.label_propagation(edf, max_iter=3)
    g1 = {r["id"]: r["label"] for r in l1.collect()}
    g2 = {r["id"]: r["label"] for r in l2.collect()}
    assert g1 == g2  # bit-identical across runs
    assert g1 == py_lpa(edges, max_iter=3)


def test_bfs_distances_exact(graph, spark):
    edges, edf = graph
    sources = [0, 5]
    dist, st = pregel.bfs_distances(edf, sources=sources, max_depth=30)
    got = {r["id"]: r["dist"] for r in dist.collect()}
    # python BFS oracle
    from collections import deque

    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    exp = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in exp:
                exp[v] = exp[u] + 1
                q.append(v)
    assert got == exp
    assert st.converged


def test_pseudo_diameter_path_graph(spark):
    # undirected path 0-1-2-3-4: start=0 → far=4/ecc 4; sweep 2 from 4
    # → pseudo-diameter 4 (double sweep is exact on trees)
    und = [(i, i + 1) for i in range(4)]
    sym = und + [(b, a) for a, b in und]
    edf = spark.createDataFrame(sym, "src long, dst long")
    row = pregel.pseudo_diameter(edf).collect()[0]
    assert (row["start_id"], row["reached"]) == (0, 5)
    assert (row["far_id"], row["ecc1"]) == (4, 4)
    assert (row["far2_id"], row["pseudo_diameter"]) == (0, 4)


def test_pseudo_diameter_star_tiebreak_and_truncation(spark):
    # star center 0, leaves 1..5: sweep 1 ends at the SMALLEST farthest
    # id (1); sweep 2 from 1 reaches another leaf at distance 2
    und = [(0, i) for i in range(1, 6)]
    sym = und + [(b, a) for a, b in und]
    edf = spark.createDataFrame(sym, "src long, dst long")
    row = pregel.pseudo_diameter(edf).collect()[0]
    assert (row["far_id"], row["ecc1"]) == (1, 1)
    assert (row["far2_id"], row["pseudo_diameter"]) == (2, 2)
    # truncation: both sweeps stop at max_depth on the path graph
    path = [(i, i + 1) for i in range(9)]
    psym = path + [(b, a) for a, b in path]
    pdf = spark.createDataFrame(psym, "src long, dst long")
    row = pregel.pseudo_diameter(pdf, max_depth=3).collect()[0]
    assert row["ecc1"] == 3 and row["pseudo_diameter"] == 3 and row["reached"] == 4


def test_personalized_pagerank_matches_python(graph):
    edges, edf = graph
    sources = [0, 3]
    got = {
        r["id"]: r["rank"]
        for r in pregel.personalized_pagerank_fixed(edf, sources, n_iter=4).collect()
    }
    # python oracle: r_{k+1} = 0.15 e_S + 0.85 P^T r_k
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    seed = {x: (0.5 if x in sources else 0.0) for x in nodes}
    r = dict(seed)
    for _ in range(4):
        new = {x: 0.15 * seed[x] for x in nodes}
        for u, vs in out.items():
            c = 0.85 * r[u] / len(vs)
            for v in vs:
                new[v] += c
        r = new
    assert max(abs(got[x] - r[x]) for x in nodes) < 1e-12
    # mass concentrates near the seeds
    assert got[0] > max(got[x] for x in nodes if x not in sources and x > 50)


def test_pagerank_weighted_uniform_equals_unweighted(graph, spark):
    """Uniform weights reduce exactly to the unweighted transition
    matrix; skewed weights shift mass toward the heavy edge's dst."""
    from pyspark.sql import functions as F

    edges, edf = graph
    a = {r["id"]: r["rank"] for r in pregel.pagerank_fixed(edf, n_iter=4).collect()}
    b = {
        r["id"]: r["rank"]
        for r in pregel.pagerank_weighted_fixed(
            edf.withColumn("weight", F.lit(2.5)), n_iter=4
        ).collect()
    }
    assert max(abs(a[k] - b[k]) for k in a) < 1e-12
    # skew: all weight of vertex u onto one edge → that dst gains
    u = edges[0][0]
    heavy_dst = edges[0][1]
    wdf = edf.withColumn(
        "weight",
        F.when((F.col("src") == u) & (F.col("dst") == heavy_dst), 1000.0).otherwise(1.0),
    )
    c = {r["id"]: r["rank"] for r in pregel.pagerank_weighted_fixed(wdf, n_iter=4).collect()}
    assert c[heavy_dst] > b[heavy_dst]


def test_self_loops_ignored(spark):
    edf = spark.createDataFrame([(1, 2), (2, 2), (2, 1)], "src long, dst long")
    pv, total = pregel.triangle_count(edf)
    assert total == 0
    comp, _ = pregel.connected_components(edf)
    got = {r["id"]: r["comp"] for r in comp.collect()}
    assert got == {1: 1, 2: 1}

def test_pagerank_fused_honors_tolerance(graph):
    """fuse=True with tol>0 must stop at convergence (chunk granularity)
    instead of silently running max_iter rounds (ADVICE r2)."""
    edges, edf = graph
    fused, st_f = pregel.pagerank(edf, tol=1e-8, max_iter=200, fuse=True)
    classic, st_c = pregel.pagerank(edf, tol=1e-8, max_iter=200, fuse=False)
    assert st_f.converged and st_f.fused
    assert st_f.iterations < 200
    # chunk-granular stop: within one checkpoint_every (5) of the classic
    assert st_c.iterations <= st_f.iterations <= st_c.iterations + 5
    a = {r["id"]: r["rank"] for r in fused.collect()}
    b = {r["id"]: r["rank"] for r in classic.collect()}
    assert max(abs(a[k] - b[k]) for k in a) < 1e-7

def test_compact_ids_int32_and_long_paths_agree(graph, spark):
    """compact_ids casts loop keys to int32 when ids fit; 64-bit ids
    (e.g. xxhash64 vertex ids) keep long.  Both paths must agree and the
    public schema stays (id long)."""
    edges, edf = graph
    small, _ = pregel.pagerank(edf, tol=1e-10, max_iter=300)
    assert dict(small.dtypes)["id"] == "bigint"
    shifted = spark.createDataFrame(
        [(s + 2**40, d + 2**40) for s, d in edges], "src long, dst long"
    )
    big, _ = pregel.pagerank(shifted, tol=1e-10, max_iter=300)
    assert dict(big.dtypes)["id"] == "bigint"
    a = {r["id"]: r["rank"] for r in small.collect()}
    b = {r["id"] - 2**40: r["rank"] for r in big.collect()}
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-9
    # CC and LPA public schemas survive compaction too
    comp, _ = pregel.connected_components(edf)
    assert dict(comp.dtypes) == {"id": "bigint", "comp": "bigint"}
    lab, _ = pregel.label_propagation(edf, max_iter=1)
    assert dict(lab.dtypes) == {"id": "bigint", "label": "bigint"}


# --------------------------------------------------------------------------
# round 3: k-core, per-source BFS / harmonic centrality


def test_kcore_matches_python_peel(graph):
    edges, edf = graph
    from tests.oracles import py_kcore

    for k in (2, 4):
        core, stats = pregel.kcore(edf, k=k)
        got = {r["id"]: r["deg"] for r in core.collect()}
        exp = py_kcore(edges, k)
        assert stats.converged
        assert got == exp, f"k={k}: {len(got)} vs {len(exp)} core vertices"


def test_kcore_fixpoint_idempotent(graph, spark):
    """Re-peeling the core changes nothing — the property that makes a
    fixed-round unrolled-SQL oracle exact once rounds >= fixpoint."""
    edges, edf = graph
    core, stats = pregel.kcore(edf, k=4)
    members = {r["id"] for r in core.collect()}
    sub = [(u, v) for u, v in edges if u in members and v in members]
    core2, stats2 = pregel.kcore(
        spark.createDataFrame(sub, "src long, dst long"), k=4
    )
    got2 = {r["id"]: r["deg"] for r in core2.collect()}
    got1 = {r["id"]: r["deg"] for r in core.collect()}
    assert got2 == got1
    assert stats2.iterations == 1  # already at the fixpoint


def test_bfs_per_source_matches_single_source(graph):
    edges, edf = graph
    from tests.oracles import py_bfs

    sources = [0, 1, 5]
    dist, stats = pregel.bfs_per_source(edf, sources=sources, max_depth=30)
    got = {(r["source"], r["id"]): r["dist"] for r in dist.collect()}
    assert stats.converged
    exp = {}
    for s in sources:
        for v, d in py_bfs(edges, s).items():
            exp[(s, v)] = d
    assert got == exp


def test_harmonic_centrality_path_graph(spark):
    # path 1-2-3-4 (undirected), landmarks {1, 4}
    und = [(1, 2), (2, 3), (3, 4)]
    sym = und + [(b, a) for a, b in und]
    edf = spark.createDataFrame(sym, "src long, dst long")
    h, _ = pregel.harmonic_centrality(edf, landmarks=[1, 4], max_depth=10)
    got = {r["id"]: round(r["harmonic"], 9) for r in h.collect()}
    assert got == {
        1: round(1 / 3, 9),        # from 4 only (dist 3)
        2: round(1 / 1 + 1 / 2, 9),
        3: round(1 / 2 + 1 / 1, 9),
        4: round(1 / 3, 9),
    }


def test_core_numbers_match_sequential_peel(graph):
    edges, edf = graph
    from tests.oracles import py_core_numbers, py_kcore

    core, stats = pregel.core_numbers(edf)
    got = {r["id"]: r["core"] for r in core.collect()}
    exp = py_core_numbers(edges)
    assert stats.converged
    assert got == exp
    # cross-consistency: coreness >= k exactly for k-core members
    for k in (2, 4):
        members = set(py_kcore(edges, k))
        assert {v for v, c in got.items() if c >= k} == members


def test_ktruss_matches_python_peel(graph, spark):
    edges, edf = graph
    from tests.oracles import py_ktruss

    for k in (3, 4):
        truss, stats = pregel.ktruss(edf, k=k)
        got = {(r["src"], r["dst"]): r["support"] for r in truss.collect()}
        exp = py_ktruss(edges, k)
        assert stats.converged
        assert got == exp, f"k={k}: {len(got)} vs {len(exp)} edges"
    with pytest.raises(ValueError, match="k >= 3"):
        pregel.ktruss(edf, k=2)


def test_random_walks_match_python_simulation(graph):
    edges, edf = graph
    walks = pregel.random_walks(edf, walk_length=3, seed=9)
    got = {(r["start"], r["step"]): r["vertex"] for r in walks.collect()}
    # python simulation of the same deterministic pick
    out: dict[int, list[int]] = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    for vs in out.values():
        vs.sort()
    exp = {}
    for s in out:
        cur = s
        exp[(s, 0)] = s
        for step in range(1, 4):
            ns = out.get(cur)
            if not ns:
                break
            cur = ns[(cur * 31 + step * 17 + 9) % len(ns)]
            exp[(s, step)] = cur
    assert got == exp
    # determinism across runs
    again = {(r["start"], r["step"]): r["vertex"]
             for r in pregel.random_walks(edf, walk_length=3, seed=9).collect()}
    assert again == got


def test_scc_hand_graph(spark):
    # two 3-cycles bridged by a one-way path, plus a dangling tail
    e = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 12), (12, 10), (12, 20)]
    edf = spark.createDataFrame(e, "src long, dst long")
    scc, stats = pregel.strongly_connected_components(edf)
    got = {r["id"]: r["scc"] for r in scc.collect()}
    assert stats.converged
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_scc_matches_tarjan(graph):
    edges, edf = graph
    from tests.oracles import py_scc

    scc, stats = pregel.strongly_connected_components(edf)
    got = {r["id"]: r["scc"] for r in scc.collect()}
    exp = py_scc(edges)
    assert stats.converged
    assert got == exp


def test_anf_matches_python_sketch_and_is_sane(graph, spark):
    edges, edf = graph
    est, stats = pregel.anf(edf, rounds=2, replicas=8, seed=1)
    got = {r["id"]: r["est"] for r in est.collect()}
    # python simulation of the identical deterministic sketch
    out: dict[int, list[int]] = {}
    verts = set()
    for u, v in edges:
        out.setdefault(u, []).append(v)
        verts.add(u)
        verts.add(v)

    def rho(vid, j):
        x0 = (vid * 2654435761 + j * 97 + 1) % 2**31
        x1 = ((x0 ^ (x0 >> 13)) * 1274126177) % 2**31
        h = x1 ^ (x1 >> 17)
        if h == 0:
            return 62
        return min((h & -h).bit_length() - 1, 62)

    reg = {(v, j): 1 << rho(v, j) for v in verts for j in range(8)}
    for _ in range(2):
        new = dict(reg)
        for u, vs in out.items():
            for j in range(8):
                acc = reg[(u, j)]
                for w in vs:
                    acc |= reg[(w, j)]
                new[(u, j)] = acc
        reg = new

    def rho0(x):
        p = 0
        while x & (1 << p):
            p += 1
        return p

    exp = {}
    for v in verts:
        mean = sum(rho0(reg[(v, j)]) for j in range(8)) / 8.0
        exp[v] = 2.0**mean / 0.77351
    assert set(got) == set(exp)
    assert max(abs(got[v] - exp[v]) for v in verts) < 1e-9
    # estimator sanity: the mean estimate tracks the mean true 2-hop
    # ball size within FM's expected error at 8 replicas
    from tests.oracles import py_bfs

    truth = {}
    for v in verts:
        d = py_bfs(edges, v)
        truth[v] = sum(1 for x in d.values() if x <= 2)
    mean_est = sum(got.values()) / len(got)
    mean_true = sum(truth.values()) / len(truth)
    assert 0.5 < mean_est / mean_true < 2.0, (mean_est, mean_true)


def test_betweenness_matches_python_brandes(graph):
    edges, edf = graph
    from tests.oracles import py_betweenness

    sources = [0, 1, 5, 9]
    bcdf, stats = pregel.betweenness_landmarks(edf, sources, max_depth=4)
    got = {r["id"]: r["bc"] for r in bcdf.collect()}
    exp = py_betweenness(edges, sources, max_depth=4)
    assert stats.converged
    assert set(got) == set(exp)
    assert max(abs(got[v] - exp[v]) for v in exp) < 1e-9


def test_sssp_matches_dijkstra(graph, spark):
    edges, _edf = graph
    # deterministic weights derived from endpoints
    we = [(u, v, (u + 2 * v) % 7 + 1) for u, v in edges]
    edf = spark.createDataFrame(we, "src long, dst long, w long")
    dist, stats = pregel.sssp(edf, sources=[0, 3])
    got = {r["id"]: r["dist"] for r in dist.collect()}
    from tests.oracles import py_sssp

    exp = py_sssp(we, [0, 3])
    assert stats.converged
    assert got == exp


def test_mis_is_independent_and_maximal(graph):
    edges, edf = graph
    mis, stats = pregel.maximal_independent_set(edf, seed=11)
    got = {r["id"]: r["in_mis"] for r in mis.collect()}
    assert stats.converged
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    in_set = {v for v, m in got.items() if m}
    # independence: no two set members adjacent
    assert not any(w in in_set for v in in_set for w in adj.get(v, ()))
    # maximality: every non-member has a member neighbor
    for v, m in got.items():
        if not m:
            assert adj.get(v, set()) & in_set, f"{v} could join the set"
    # determinism
    again = {r["id"]: r["in_mis"]
             for r in pregel.maximal_independent_set(edf, seed=11)[0].collect()}
    assert again == got


def test_random_walks_biased_bias_routes_the_pick(spark):
    """Extreme class weights force the second-order pick: a huge return
    weight sends step 2 back to the predecessor; a huge far weight sends
    it to the non-return candidate."""
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    ret = pregel.random_walks_biased(e, walk_length=2, w_ret=1000, w_bfs=1, w_dfs=1)
    got = {(r["start"], r["step"]): r["vertex"] for r in ret.collect()}
    assert got[(1, 1)] == 2  # only neighbor
    assert got[(1, 2)] == 1  # returns to prev under w_ret
    far = pregel.random_walks_biased(e, walk_length=2, w_ret=1, w_bfs=1, w_dfs=1000)
    got = {(r["start"], r["step"]): r["vertex"] for r in far.collect()}
    assert got[(1, 2)] == 3  # explores away from prev under w_dfs


def test_random_walks_biased_deterministic(graph):
    _, edf = graph
    a = sorted(map(tuple, pregel.random_walks_biased(edf, 3).collect()))
    b = sorted(map(tuple, pregel.random_walks_biased(edf, 3).collect()))
    assert a == b
    # every walk advances through existing edges
    edges = {(r["src"], r["dst"]) for r in pregel.normalize_edges(edf).collect()}
    pos = {}
    for s, st, v in a:
        pos.setdefault(s, {})[st] = v
    for s, steps in pos.items():
        for st in range(1, max(steps)):
            if st in steps and st + 1 in steps:
                assert (steps[st], steps[st + 1]) in edges


# --------------------------------------------------------------------------
# minimum spanning forest (Boruvka)


def _py_kruskal(rows):
    """Reference Kruskal under the (w, u, v) total order on canonical
    (u < v) edges with parallel edges collapsed to their min weight."""
    best = {}
    for s, d, w in rows:
        u, v = (s, d) if s < d else (d, s)
        if u == v:
            continue
        best[(u, v)] = min(best.get((u, v), w), w)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (u, v), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def test_msf_matches_kruskal_on_weighted_zipf(graph, spark):
    edges, edf = graph
    # deterministic synthetic weights from the edge identity
    rows = [(s, d, (7 * s + 13 * d) % 20 + 1) for s, d in edges]
    wdf = spark.createDataFrame(rows, "src long, dst long, w long")
    got, stats = pregel.minimum_spanning_forest(wdf)
    assert sorted(map(tuple, got.collect())) == _py_kruskal(rows)
    assert stats.converged and stats.iterations <= 12


def test_msf_forest_on_disconnected_graph_and_multigraph(spark):
    rows = [
        (1, 2, 4), (2, 1, 9),          # parallel reversed edge, keep w=4
        (2, 3, 1), (1, 3, 3), (3, 4, 2), (2, 4, 9),
        (5, 6, 1),                      # second component
        (7, 7, 0),                      # self-loop dropped
    ]
    wdf = spark.createDataFrame(rows, "src long, dst long, w long")
    got, stats = pregel.minimum_spanning_forest(wdf)
    assert sorted(map(tuple, got.collect())) == [
        (1, 3, 3), (2, 3, 1), (3, 4, 2), (5, 6, 1)
    ]
    assert stats.converged


def test_msf_duplicate_weights_deterministic(spark):
    # all-equal weights: the (w, u, v) tie-break alone decides the tree
    rows = [(u, v, 1) for u in range(8) for v in range(u + 1, 8)]
    wdf = spark.createDataFrame(rows, "src long, dst long, w long")
    a, _ = pregel.minimum_spanning_forest(wdf)
    b, _ = pregel.minimum_spanning_forest(
        spark.createDataFrame(rows, "src long, dst long, w long").repartition(7)
    )
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb == _py_kruskal(rows)


def test_msf_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long, w long")
    got, stats = pregel.minimum_spanning_forest(empty)
    assert got.count() == 0 and stats.converged


def test_lpa_weighted_follows_heavy_edge(spark):
    # star: center 0; heavy edge to 9, light edges to 1..3.
    # Unweighted majority would pull 0 toward the small labels; the
    # weighted vote follows the heavy edge to label 9's side.
    rows = [(0, 9, 100), (0, 1, 1), (0, 2, 1), (0, 3, 1)]
    wdf = spark.createDataFrame(rows, "src long, dst long, w long")
    labels, st = pregel.label_propagation_weighted(wdf, max_iter=1)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[0] == 9          # heaviest incident label wins
    assert got[9] == 0 and got[1] == 0
    assert st.iterations == 1


def test_lpa_weighted_all_equal_weights_matches_unweighted(spark):
    rows = [(u, v) for u in range(12) for v in range(u + 1, 12) if (u * v) % 3 == 0]
    udf = spark.createDataFrame(rows, "src long, dst long")
    wdf = spark.createDataFrame([(u, v, 1) for u, v in rows], "src long, dst long, w long")
    lu, _ = pregel.label_propagation(udf, max_iter=3)
    lw, _ = pregel.label_propagation_weighted(wdf, max_iter=3)
    assert sorted(map(tuple, lu.collect())) == sorted(map(tuple, lw.collect()))


# --------------------------------------------------------------------------
# greedy coloring (Jones-Plassmann)


def _py_jp_coloring(edges, seed=11):
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)

    def pri(i):
        x0 = (i * 2654435761 + seed) % 2**31
        x1 = ((x0 ^ (x0 >> 13)) * 1274126177) % 2**31
        return ((x1 ^ (x1 >> 17)) % 2**30) * 2**33 + i

    P = {v: pri(v) for v in adj}
    un, color = set(adj), {}
    while un:
        ready = [v for v in un if all(P[v] > P[u] for u in adj[v] if u in un)]
        for v in ready:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        un -= set(ready)
    return sorted(color.items())


def test_coloring_matches_sequential_greedy_and_is_proper(spark):
    import random

    random.seed(4)
    ed = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in [(random.randrange(80), random.randrange(80)) for _ in range(200)]
            if a != b
        }
    )
    df = spark.createDataFrame(ed, "src long, dst long")
    got, stats = pregel.greedy_coloring(df, seed=11)
    rows = sorted(map(tuple, got.collect()))
    assert rows == _py_jp_coloring(ed)
    assert stats.converged
    color = dict(rows)
    for u, v in ed:
        assert color[u] != color[v], f"edge ({u},{v}) monochrome"


def test_coloring_empty_and_too_dense_raises(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    got, stats = pregel.greedy_coloring(empty)
    assert got.count() == 0 and stats.converged
    # a clique serializes the JP schedule: rounds == n, so max_rounds=3 trips
    clique = spark.createDataFrame(
        [(u, v) for u in range(8) for v in range(u + 1, 8)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        pregel.greedy_coloring(clique, max_rounds=3)


def test_sssp_per_source_matches_single_source(spark):
    rows = [(0, 1, 2), (1, 2, 2), (0, 2, 5), (2, 3, 1), (3, 4, 7), (1, 4, 20), (5, 6, 1)]
    sym = rows + [(d, s, w) for s, d, w in rows]
    wdf = spark.createDataFrame(sym, "src long, dst long, w long")
    multi, st = pregel.sssp_per_source(wdf, [0, 5])
    assert st.converged
    got = {(r["source"], r["id"]): r["dist"] for r in multi.collect()}
    for s in (0, 5):
        single, _ = pregel.sssp(wdf, [s])
        want = {r["id"]: r["dist"] for r in single.collect()}
        assert {i: d for (src, i), d in got.items() if src == s} == want
    assert got[(0, 4)] == 12      # 0-1-2-3-4 beats the 1-4 shortcut
    assert (0, 6) not in got      # other component unreached


def test_katz_matches_python_reference(spark):
    """Truncated Katz vs direct python recursion at 1e-12."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 3), (5, 3), (4, 5)]
    alpha, beta, n_iter = 0.05, 1.0, 6
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    x = {v: beta for v in nodes}
    for _ in range(n_iter):
        new = {v: beta for v in nodes}
        for u, v in edges:
            new[v] += alpha * x[u]
        x = new
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["katz"] for r in pregel.katz(e, alpha, beta, n_iter).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - x[v]) < 1e-12, (v, got[v], x[v])


def test_katz_unnormalized_ranks_hubs_by_indegree_walks(spark):
    """Unlike PageRank, Katz does not dilute by out-degree: the vertex
    every other vertex points at must dominate."""
    e = spark.createDataFrame(
        [(s, 0) for s in range(1, 8)] + [(1, 2)], "src long, dst long"
    )
    got = {r["id"]: r["katz"] for r in pregel.katz(e, 0.1, 1.0, 4).collect()}
    assert got[0] == max(got.values())


def test_node_similarity_matches_python(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5)]
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    for a in adj:
        sims = []
        for b in adj:
            if a == b:
                continue
            inter = len(adj[a] & adj[b])
            if inter == 0:
                continue
            sims.append((-(inter / len(adj[a] | adj[b])), b))
        for rnk, (negj, b) in enumerate(sorted(sims)[:3], start=1):
            want[(a, b)] = (round(-negj, 9), rnk)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["id"], r["other"]): (round(r["sim"], 9), r["rnk"])
        for r in pregel.node_similarity(e, k=3).collect()
    }
    assert got == want


def test_node_similarity_center_degree_cutoff_drops_hub_only_pairs(spark):
    # star: leaves 1..5 all point at hub 0; leaves share ONLY the hub
    e = spark.createDataFrame([(i, 0) for i in range(1, 6)], "src long, dst long")
    full = pregel.node_similarity(e, k=5)
    assert full.where("id >= 1").count() > 0  # leaf pairs via the hub
    capped = pregel.node_similarity(e, k=5, max_center_degree=3)
    # hub (degree 5) is dropped as a wedge center → leaf pairs vanish
    assert capped.where("id >= 1").count() == 0


def test_ppr_multi_equals_per_set_single_runs(spark):
    """The batched keyed sweep must match running
    personalized_pagerank_fixed once per seed set (1e-12 — aggregation
    order inside the keyed sum differs, so last-ulp noise is
    expected)."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (2, 5)]
    e = spark.createDataFrame(edges + [(v, u) for u, v in edges], "src long, dst long")
    seed_sets = {0: [1], 1: [2, 4], 2: [5]}
    multi = {
        (r["gid"], r["id"]): r["rank"]
        for r in pregel.personalized_pagerank_multi(e, seed_sets, n_iter=4).collect()
    }
    for g, seeds in seed_sets.items():
        single = {
            r["id"]: r["rank"]
            for r in pregel.personalized_pagerank_fixed(e, seeds, n_iter=4).collect()
        }
        for v, r in single.items():
            assert abs(multi[(g, v)] - r) < 1e-12, (g, v, multi[(g, v)], r)


def test_betweenness_weighted_matches_python_brandes(graph, spark):
    edges, _edf = graph
    from tests.oracles import py_betweenness_weighted

    # deterministic per-undirected-pair weights, both directions equal
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    we = [(a, b, (a + 2 * b) % 7 + 1) for a, b in und]
    we += [(b, a, w) for a, b, w in we]
    edf = spark.createDataFrame(we, "src long, dst long, w long")
    sources = [0, 1, 5]
    # rounds past the fixpoint on this small graph ⇒ equals exact Brandes
    bcdf, stats = pregel.betweenness_weighted(
        edf, sources, relax_rounds=12, acc_rounds=12
    )
    got = {r["id"]: r["bc"] for r in bcdf.collect()}
    exp = py_betweenness_weighted(we, sources)
    assert stats.converged
    assert set(got) == set(exp)
    assert max(abs(got[v] - exp[v]) for v in exp) < 1e-9


def test_betweenness_weighted_empty(spark):
    edf = spark.createDataFrame([], "src long, dst long, w long")
    bcdf, stats = pregel.betweenness_weighted(edf, [1, 2])
    assert bcdf.count() == 0
    assert stats.converged


def test_eigenvector_centrality_matches_numpy(graph, spark):
    import numpy as np

    edges, _edf = graph
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    sym = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edf = spark.createDataFrame(sym, "src long, dst long")
    out = pregel.eigenvector_centrality(edf, n_iter=4)
    got = {r["id"]: r["eig"] for r in out.collect()}
    ids = sorted({x for e in sym for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for u, v in sym:
        A[idx[v], idx[u]] += 1.0  # x_new[v] = sum over incoming src u
    x = np.ones(len(ids))
    for _ in range(4):
        x = A @ x
        x = x / np.sqrt((x * x).sum())
    assert set(got) == set(ids)
    assert max(abs(got[v] - x[idx[v]]) for v in ids) < 1e-9


def test_eigenvector_centrality_empty(spark):
    edf = spark.createDataFrame([], "src long, dst long")
    assert pregel.eigenvector_centrality(edf).count() == 0


def test_score_matches_python_peel(spark):
    # deterministic weighted graph with a cascade: removing the weak
    # rim lowers hub strengths below the threshold in a later round
    edges = [(0, 1, 5), (1, 2, 5), (2, 0, 5), (0, 3, 6), (3, 4, 2), (4, 5, 9)]
    sym = edges + [(b, a, w) for a, b, w in edges]
    edf = spark.createDataFrame(sym, "src long, dst long, w long")
    core, stats = pregel.score(edf, s=10)
    got = {r["id"]: r["strength"] for r in core.collect()}
    # python peel to fixpoint
    es = {(a, b): w for a, b, w in sym}
    while True:
        st: dict[int, int] = {}
        for (a, b), w in es.items():
            st[a] = st.get(a, 0) + w
        keep = {v for v, x in st.items() if x >= 10}
        nxt = {k: w for k, w in es.items() if k[0] in keep and k[1] in keep}
        if len(nxt) == len(es):
            break
        es = nxt
    exp: dict[int, int] = {}
    for (a, b), w in es.items():
        exp[a] = exp.get(a, 0) + w
    assert stats.converged
    assert got == exp and len(got) > 0


def test_score_fixpoint_within_oracle_rounds(spark):
    # the query unrolls 6 oracle rounds: assert the real fixpoint is
    # reached well inside that at sf0.001
    from polar_spark.operators.analytics_queries import q_score45

    df = q_score45(spark, "/root/testdata/sf0.001")
    assert df.count() > 0


def test_score_empty(spark):
    edf = spark.createDataFrame([], "src long, dst long, w long")
    core, stats = pregel.score(edf, s=5)
    assert core.count() == 0 and stats.converged


def _py_simrank(edges, c=0.8, n_iter=3):
    """Dense reference SimRank: s_{k+1} = c/(|I(a)||I(b)|) Σ s_k over
    in-neighbor pairs, diagonal pinned to 1."""
    import numpy as np

    verts = sorted({u for e in edges for u in e})
    ix = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    inn = [[] for _ in range(n)]
    for u, v in set(edges):
        if u != v:
            inn[ix[v]].append(ix[u])
    s = np.eye(n)
    for _ in range(n_iter):
        nxt = np.zeros((n, n))
        for a in range(n):
            for b in range(n):
                if a == b:
                    nxt[a][b] = 1.0
                    continue
                ia, ib = inn[a], inn[b]
                if not ia or not ib:
                    continue
                tot = sum(s[i][j] for i in ia for j in ib)
                nxt[a][b] = c * tot / (len(ia) * len(ib))
        s = nxt
    return {
        (verts[a], verts[b]): s[a][b]
        for a in range(n)
        for b in range(n)
        if s[a][b] > 0
    }


def test_simrank_matches_python_reference(spark):
    edges = [(3, 1), (3, 2), (1, 4), (2, 4), (4, 3), (5, 1), (5, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out, stats = pregel.simrank(df, c=0.8, n_iter=3)
    got = {(r["a"], r["b"]): r["s"] for r in out.collect()}
    want = _py_simrank(edges, c=0.8, n_iter=3)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    assert stats.iterations == 3 and stats.converged


def test_simrank_symmetric_and_guard(spark):
    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out, _ = pregel.simrank(df, n_iter=2)
    got = {(r["a"], r["b"]): r["s"] for r in out.collect()}
    for (a, b), v in got.items():
        assert abs(got[(b, a)] - v) < 1e-15
    import pytest as _pt

    with _pt.raises(ValueError, match="max_pairs"):
        pregel.simrank(df, n_iter=1, max_pairs=2)


def test_simrank_empty(spark):
    out, stats = pregel.simrank(
        spark.createDataFrame([], "src long, dst long"), n_iter=2
    )
    assert out.count() == 0 and stats.iterations == 0


def test_dag_longest_path_diamond_and_cycle(spark):
    dag = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], "src long, dst long"
    )
    lvl, stats = pregel.dag_longest_path(dag)
    got = {r["id"]: r["lvl"] for r in lvl.collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}
    assert stats.converged
    import pytest as _pt

    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    with _pt.raises(ValueError, match="cycle"):
        pregel.dag_longest_path(cyc, max_iter=10)


def test_dag_longest_path_empty(spark):
    out, _ = pregel.dag_longest_path(
        spark.createDataFrame([], "src long, dst long")
    )
    assert out.count() == 0


def test_square_counts_cycle_k4_and_squarefree(spark):
    def sym(pairs):
        return spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], "src long, dst long"
        )

    c4 = sym([(1, 2), (2, 3), (3, 4), (4, 1)])
    got = {r["id"]: r["squares"] for r in pregel.square_counts(c4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    k4 = sym([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    got = {r["id"]: r["squares"] for r in pregel.square_counts(k4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    tri = sym([(1, 2), (2, 3), (1, 3)])
    got = {r["id"]: r["squares"] for r in pregel.square_counts(tri).collect()}
    assert got == {1: 0, 2: 0, 3: 0}


def test_louvain_move_matches_python_reference(spark):
    und = [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0), (4, 5, 1.0), (5, 6, 1.0), (4, 6, 1.0), (3, 4, 1.0)]
    sym = und + [(b, a, w) for a, b, w in und]
    df = spark.createDataFrame(sym, "src long, dst long, w double")
    got = {r["id"]: r["comm"] for r in pregel.louvain_move(df).collect()}

    m = sum(w for _, _, w in und)
    k = {}
    for a, b, w in sym:
        k[a] = k.get(a, 0) + w
    want = {}
    for v in k:
        best, best_g = v, 0.0
        for a, b, w in sym:
            if a != v:
                continue
            g = w / m - k[v] * k[b] / (2 * m * m)
            if g > best_g + 1e-15 or (abs(g - best_g) <= 1e-15 and b < best and best != v):
                best, best_g = b, g
        want[v] = best
    assert got == want
    # intra-triangle moves only: the bridge never wins against a triangle edge
    assert all(got[v] in (1, 2, 3) for v in (1, 2, 3))
    assert all(got[v] in (4, 5, 6) for v in (4, 5, 6))


def test_louvain_move_empty(spark):
    out = pregel.louvain_move(spark.createDataFrame([], "src long, dst long, w double"))
    assert out.count() == 0


def test_dag_path_counts_fibonacci_chain_and_cycle(spark):
    # chain 1..6 with skip edges (i -> i+1, i -> i+2): paths = Fibonacci
    edges = []
    for i in range(1, 6):
        edges.append((i, i + 1))
    for i in range(1, 5):
        edges.append((i, i + 2))
    df = spark.createDataFrame(edges, "src long, dst long")
    p, stats = pregel.dag_path_counts(df)
    got = {r["id"]: r["paths"] for r in p.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 5, 6: 8}
    assert stats.converged
    import pytest as _pt

    # a cycle REACHABLE FROM A SOURCE diverges -> raises
    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 1)], "src long, dst long")
    with _pt.raises(ValueError, match="cycle"):
        pregel.dag_path_counts(cyc, max_iter=8)
    # a source-free cycle has zero paths from sources: valid fixpoint
    pure = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    p2, st2 = pregel.dag_path_counts(pure, max_iter=8)
    assert {r["id"]: r["paths"] for r in p2.collect()} == {1: 0, 2: 0}
    assert st2.converged


def test_dag_path_counts_multi_source(spark):
    # two sources converging: 1->3, 2->3, 3->4 gives p(3)=2, p(4)=2
    df = spark.createDataFrame([(1, 3), (2, 3), (3, 4)], "src long, dst long")
    p, _ = pregel.dag_path_counts(df)
    got = {r["id"]: r["paths"] for r in p.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2}


def test_maximal_matching_valid_and_maximal(spark):
    import random

    rng = random.Random(3)
    edges = list({tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)})
    df = spark.createDataFrame(edges, "src long, dst long")
    m, stats = pregel.maximal_matching(df)
    got = sorted((r["a"], r["b"]) for r in m.collect())
    assert stats.converged
    used = [v for ab in got for v in ab]
    assert len(used) == len(set(used))  # valid: vertex-disjoint
    matched = set(used)
    for a, b in edges:  # maximal: no free-free edge remains
        assert a in matched or b in matched
    # deterministic across runs
    m2, _ = pregel.maximal_matching(df)
    assert sorted((r["a"], r["b"]) for r in m2.collect()) == got


def test_maximal_matching_empty_and_single(spark):
    out, st = pregel.maximal_matching(
        spark.createDataFrame([], "src long, dst long")
    )
    assert out.count() == 0
    out, st = pregel.maximal_matching(
        spark.createDataFrame([(7, 9)], "src long, dst long")
    )
    assert [(r["a"], r["b"]) for r in out.collect()] == [(7, 9)]
    assert st.converged


def test_shortest_path_counts_grid(spark):
    # 2x3 grid: counts from corner follow the lattice-path binomials
    #   1 - 2 - 3
    #   |   |   |
    #   4 - 5 - 6
    und = [(1, 2), (2, 3), (4, 5), (5, 6), (1, 4), (2, 5), (3, 6)]
    sym = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(sym, "src long, dst long")
    out, stats = pregel.shortest_path_counts(df, 1)
    got = {r["id"]: (r["dist"], r["sigma"]) for r in out.collect()}
    assert got == {1: (0, 1), 2: (1, 1), 4: (1, 1), 3: (2, 1), 5: (2, 2), 6: (3, 3)}
    assert stats.converged


def test_shortest_path_counts_unreachable_and_truncated(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (9, 10)], "src long, dst long")
    out, stats = pregel.shortest_path_counts(df, 1)
    got = {r["id"] for r in out.collect()}
    assert got == {1, 2, 3}  # 9,10 unreachable
    out2, st2 = pregel.shortest_path_counts(df, 1, max_depth=1)
    assert {r["id"] for r in out2.collect()} == {1, 2}
    assert not st2.converged


def test_ppr_push_mass_conservation_and_locality(spark):
    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    sym = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(sym, "src long, dst long")
    out = pregel.ppr_push(df, source=1, alpha=0.15, n_iter=4).collect()
    p = {r["id"]: r["p"] for r in out}
    res = {r["id"]: r["r"] for r in out}
    # settled + residual mass is exactly 1; residual total is (1-a)^k
    assert abs(sum(p.values()) + sum(res.values()) - 1.0) < 1e-12
    assert abs(sum(res.values()) - 0.85**4) < 1e-12
    # locality: mass decays with distance from the seed on the path
    assert p[1] > p[2] > p[3] > p[4] >= p[5]


def test_ppr_push_empty(spark):
    out = pregel.ppr_push(spark.createDataFrame([], "src long, dst long"), source=1)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# full multi-level Louvain


def _sym_w(pairs):
    out = []
    for u, v, w in pairs:
        out.append((u, v, float(w)))
        out.append((v, u, float(w)))
    return out


def _louvain_fixture():
    # two-level hierarchy: 4 cliques of 4 (heavy), cliques bridged in
    # pairs (light) — integer weights so distributed sums stay exact
    und = []
    for base in (0, 4, 8, 12):
        for i in range(4):
            for j in range(i + 1, 4):
                und.append((base + i, base + j, 5))
    und += [(0, 4, 1), (8, 12, 1), (3, 11, 1)]
    return _sym_w(und)


def test_louvain_matches_python_golden(spark):
    from tests import oracles

    sym = _louvain_fixture()
    df = spark.createDataFrame(sym, "src long, dst long, w double")
    comm_df, stats = pregel.louvain(df)
    got = {r["id"]: r["comm"] for r in comm_df.collect()}
    exp = oracles.py_louvain(sym)
    assert got == exp
    # the cliques must collapse (level-1 work happened)
    assert len(set(got.values())) < 16
    assert stats.iterations >= 2
    # every clique ends in ONE community
    for base in (0, 4, 8, 12):
        assert len({got[base + i] for i in range(4)}) == 1


def test_louvain_modularity_beats_single_move(spark):
    from tests import oracles

    sym = _louvain_fixture()
    df = spark.createDataFrame(sym, "src long, dst long, w double")
    full, _st = pregel.louvain(df)
    move1 = pregel.louvain_move(df)
    q_full = pregel.modularity(df, full)
    q_move = pregel.modularity(df, move1)
    assert q_full >= q_move - 1e-12, (q_full, q_move)
    assert q_full > 0.3
    # spark-side modularity agrees with the python formula
    got = {r["id"]: r["comm"] for r in full.collect()}
    assert abs(q_full - oracles.py_modularity(sym, got)) < 1e-9


def test_louvain_empty_and_selfloops(spark):
    empty = spark.createDataFrame([], "src long, dst long, w double")
    out, st = pregel.louvain(empty)
    assert out.count() == 0 and st.iterations == 0
    # a pure self-loop graph: every vertex stays its own community
    loops = spark.createDataFrame(
        [(1, 1, 4.0), (2, 2, 2.0)], "src long, dst long, w double"
    )
    out2, _ = pregel.louvain(loops)
    assert {r["id"]: r["comm"] for r in out2.collect()} == {1: 1, 2: 2}


def test_louvain_checkpoint_resume_identity(spark, tmp_path):
    """Kill after level 1, resume — the final hierarchy must be
    IDENTICAL to the uninterrupted run (the pagerank/cc resume
    contract at level granularity), and meta.json must carry
    per-partition lineage."""
    import json
    import os

    sym = _louvain_fixture()
    df = spark.createDataFrame(sym, "src long, dst long, w double")
    full, _ = pregel.louvain(df)
    want = {r["id"]: r["comm"] for r in full.collect()}

    ck = str(tmp_path / "ck")
    part1, st1 = pregel.louvain(df, max_levels=1, checkpoint_dir=ck)
    meta = json.load(open(os.path.join(ck, "louvain", "meta.json")))
    assert meta and meta[-1]["iteration"] == 1
    assert all("partitions" in m and m["partitions"] for m in meta)

    resumed, st2 = pregel.louvain(df, checkpoint_dir=ck, resume=True)
    assert st2.resumed_from == 1
    got = {r["id"]: r["comm"] for r in resumed.collect()}
    assert got == want


def test_densest_subgraph_peels_to_clique(spark):
    # K5 clique {0..4} + star center 10 with 8 leaves 20..27:
    # round 1 removes only the leaves (deg 1 ≤ 1.5·avg), round 2 removes
    # the rest; best density is the round-2 start state (K5 + isolated
    # center), so in_densest = clique ∪ {center}
    und = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    und += [(10, 20 + i) for i in range(8)]
    edf = spark.createDataFrame(und, "src long, dst long")
    out, st = pregel.densest_subgraph(edf, eps_num=3, eps_den=2)
    rows = {r["id"]: (r["peel_round"], r["in_densest"]) for r in out.collect()}
    assert len(rows) == 14
    for leaf in range(20, 28):
        assert rows[leaf] == (1, 0)
    for v in range(5):
        assert rows[v] == (2, 1)
    assert rows[10] == (2, 1)
    assert st.iterations == 2 and st.converged


def test_densest_subgraph_empty(spark):
    edf = spark.createDataFrame([], "src long, dst long")
    out, st = pregel.densest_subgraph(edf)
    assert out.count() == 0 and st.converged


def test_bfs_relabel_path_star_and_unreached(spark):
    # path 0-1-2-3-4: BFS order is already id order → new_id == id
    path = [(i, i + 1) for i in range(4)]
    sym = path + [(b, a) for a, b in path]
    edf = spark.createDataFrame(sym, "src long, dst long")
    got = {r["id"]: (r["level"], r["new_id"]) for r in pregel.bfs_relabel(edf).collect()}
    assert got == {i: (i, i) for i in range(5)}
    # two components 0-1 and 5-6: unreached vertices order last by id
    two = [(0, 1), (1, 0), (5, 6), (6, 5)]
    edf2 = spark.createDataFrame(two, "src long, dst long")
    got2 = {r["id"]: (r["level"], r["new_id"]) for r in pregel.bfs_relabel(edf2).collect()}
    assert got2 == {0: (0, 0), 1: (1, 1), 5: (33, 2), 6: (33, 3)}


def test_bfs_relabel_improves_locality_on_shuffled_ring(spark):
    # a ring whose ids are bit-reversed (maximally non-local): BFS
    # relabeling must cut the total gap-encoding bits
    import random

    rnd = random.Random(3)
    perm = list(range(64))
    rnd.shuffle(perm)
    ring = [(perm[i], perm[(i + 1) % 64]) for i in range(64)]
    sym = ring + [(b, a) for a, b in ring]
    edf = spark.createDataFrame(sym, "src long, dst long")
    mapping = pregel.bfs_relabel(edf)
    m = {r["id"]: r["new_id"] for r in mapping.collect()}

    def bits(edges):
        from collections import defaultdict

        adj = defaultdict(list)
        for a, b in edges:
            adj[a].append(b)
        tot = 0
        for u, ns in adj.items():
            prev = None
            for n in sorted(ns):
                if prev is None:
                    d = n - u
                    enc = 2 * d if d >= 0 else 2 * (-d) + 1
                else:
                    enc = n - prev
                tot += len(bin(enc)) - 2
                prev = n
        return tot

    old = bits(sym)
    new = bits([(m[a], m[b]) for a, b in sym])
    assert new < old


def test_wl_colors_path_hand_computed(spark):
    # path 0-1-2-3-4: endpoints / near-endpoints / center split into
    # exactly three stable classes: {0,4}, {1,3}, {2}
    path = [(i, i + 1) for i in range(4)]
    sym = path + [(b, a) for a, b in path]
    edf = spark.createDataFrame(sym, "src long, dst long")
    got = {r["id"]: r["color"] for r in pregel.wl_colors(edf, rounds=3).collect()}
    assert got == {0: 1, 4: 1, 1: 2, 3: 2, 2: 3}


def test_wl_colors_regular_graphs_collapse(spark):
    # the canonical 1-WL limitation: every vertex of a 2-regular graph
    # (here C6 ⊎ C3 ⊎ C3) gets the SAME color — degree-regular graphs
    # are 1-WL-indistinguishable.  That this reproduces exactly is a
    # correctness check, not a bug.
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    t1 = [(10, 11), (11, 12), (12, 10)]
    t2 = [(20, 21), (21, 22), (22, 20)]
    und = c6 + t1 + t2
    sym = und + [(b, a) for a, b in und]
    edf = spark.createDataFrame(sym, "src long, dst long")
    colors = {r["color"] for r in pregel.wl_colors(edf, rounds=4).collect()}
    assert colors == {1}


def test_pseudo_diameter_and_relabel_empty(spark):
    edf = spark.createDataFrame([], "src long, dst long")
    assert pregel.pseudo_diameter(edf).count() == 0
    assert pregel.bfs_relabel(edf).count() == 0
    assert pregel.wl_colors(edf).count() == 0
