"""Streaming incremental PageRank: edge-delta batches fold into a
versioned edge table, ranks warm-start from the previous fixpoint."""

import json
import os

from pyspark.sql import functions as F

from polar_spark.plans import pregel
from polar_spark.streaming.graph_updates import (
    RankMaintainer,
    read_delta_stream,
    start_rank_maintenance,
)
from tests.oracles import zipf_digraph


def _write_batch(path, idx, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"batch{idx}.json"), "w") as f:
        for src, dst, op in rows:
            f.write(json.dumps({"src": src, "dst": dst, "op": op}) + "\n")


def test_rank_maintenance_two_batches(spark, tmp_path):
    delta_dir = str(tmp_path / "deltas")
    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")
    base = zipf_digraph(n=120, m=700, seed=11)
    _write_batch(delta_dir, 0, [(u, v, "add") for u, v in base])

    m = RankMaintainer(spark, work, tol=1e-9, max_iter=300)
    start_rank_maintenance(read_delta_stream(spark, delta_dir), m, ckpt).awaitTermination()
    s1 = m.state()
    assert s1["version"] == 1 and not s1["warm_start"]

    # batch 2: a genuinely small perturbation — swap one out-edge of the
    # biggest hub (src 0): its per-edge weight moves 1/k, each dst's
    # inflow changes by ~0.85·r_0/k.  (Adding an edge to a previously
    # dangling vertex would instead redirect that vertex's WHOLE rank —
    # a large perturbation.)
    hub_edges = [e for e in base if e[0] == 0]
    removed = hub_edges[0]
    new_dst = next(d for d in range(119, 0, -1) if (0, d) not in base and d != 0)
    delta2 = [(0, new_dst, "add"), (removed[0], removed[1], "remove")]
    _write_batch(delta_dir, 1, delta2)
    start_rank_maintenance(read_delta_stream(spark, delta_dir), m, ckpt).awaitTermination()
    s2 = m.state()
    assert s2["version"] == 2 and s2["warm_start"]
    # warm start begins near the new fixpoint: its first-round delta is
    # the perturbation scale, well under the cold start's distance from
    # uniform.  (Iteration COUNT is not guaranteed smaller — the warm
    # error can sit on slower-mixing modes — so assert the distance,
    # plus a no-blowup bound on rounds.)
    assert s2["first_delta"] < s1["first_delta"] / 2
    assert s2["iterations"] <= s1["iterations"] + 3

    # final ranks equal a cold recompute on the final edge set
    final_edges = sorted((set(base) | {(0, new_dst)}) - {removed})
    cold, _ = pregel.pagerank(
        spark.createDataFrame(final_edges, "src long, dst long"), tol=1e-9, max_iter=300
    )
    a = {r["id"]: r["rank"] for r in cold.collect()}
    b = {r["id"]: r["rank"] for r in m.ranks().collect()}
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-6
    # edge table matches exactly
    got = sorted(map(tuple, m.edges().select("src", "dst").collect()))
    assert got == final_edges


def test_rank_maintainer_retention_gc(spark, tmp_path):
    """Old edges/ranks version dirs are garbage-collected past the
    retention window (ADVICE r2): a long delta stream must not grow
    disk one immutable version per micro-batch forever."""
    work = str(tmp_path / "gc_work")
    m = RankMaintainer(spark, work, tol=1e-6, max_iter=50, retention=2)
    for i in range(5):
        deltas = spark.createDataFrame(
            [(i, i + 100, "add"), (i + 100, (i + 1) % 5, "add")],
            "src long, dst long, op string",
        )
        m.apply_deltas(deltas)
    vs = sorted(int(d[1:]) for d in os.listdir(os.path.join(work, "edges")))
    assert vs == [4, 5]  # only the retention window survives
    assert sorted(int(d[1:]) for d in os.listdir(os.path.join(work, "ranks"))) == [4, 5]
    # current pointer still fully readable
    assert m.edges().count() == 10
    assert m.ranks().count() > 0


def test_scoped_delta_update_exact_and_delta_sized(spark, tmp_path):
    """Delta-scoped residual path (VERDICT r2 #3): on a dangling-free
    graph with an eligible perturbation, apply_deltas must (a) take the
    scoped path, (b) match a cold full recompute within 1e-6, and
    (c) process far fewer rows than iterations x |V| (cost scales with
    the perturbed neighborhood, not the graph)."""
    work = str(tmp_path / "scoped")
    n = 400
    # directed ring + a few chords: every vertex has out-degree >= 1
    base = [(i, (i + 1) % n) for i in range(n)] + [(i, (i * 7 + 3) % n) for i in range(0, n, 20)]
    base = sorted(set((s, d) for s, d in base if s != d))
    m = RankMaintainer(spark, work, tol=1e-8, max_iter=300)
    s1 = m.apply_deltas(
        spark.createDataFrame([(s, d, "add") for s, d in base], "src long, dst long, op string")
    )
    assert s1["mode"] == "cold"

    # eligible perturbation: existing vertices, sources stay sources
    delta = [(10, 250, "add"), (30, (30 * 7 + 3) % n, "remove")]
    s2 = m.apply_deltas(spark.createDataFrame(delta, "src long, dst long, op string"))
    assert s2["mode"] == "scoped", s2
    assert s2["support_rows"] is not None and s2["support_rows"] > 0

    final_edges = sorted((set(base) | {(10, 250)}) - {(30, (30 * 7 + 3) % n)})
    cold, st_cold = pregel.pagerank(
        spark.createDataFrame(final_edges, "src long, dst long"), tol=1e-8, max_iter=300
    )
    a = {r["id"]: r["rank"] for r in cold.collect()}
    b = {r["id"]: r["rank"] for r in m.ranks().collect()}
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-6
    # delta-scoped cost: total touched rows well under a full sweep set
    assert s2["support_rows"] < st_cold.iterations * n / 5, (
        s2["support_rows"],
        st_cold.iterations * n,
    )

    # ineligible perturbation (new vertex n+5 has no out-edges → the
    # new graph is dangling) falls back to warm_full
    s3 = m.apply_deltas(
        spark.createDataFrame([(250, n + 5, "add")], "src long, dst long, op string")
    )
    assert s3["mode"] == "warm_full"
    cold2, _ = pregel.pagerank(
        spark.createDataFrame(sorted(set(final_edges) | {(250, n + 5)}), "src long, dst long"),
        tol=1e-8,
        max_iter=300,
    )
    a2 = {r["id"]: r["rank"] for r in cold2.collect()}
    b2 = {r["id"]: r["rank"] for r in m.ranks().collect()}
    assert max(abs(a2[k] - b2[k]) for k in a2) < 1e-6


def test_components_maintainer_warm_adds_and_cold_removes(spark, tmp_path):
    import json as _json
    import os as _os

    from polar_spark.streaming.graph_updates import (
        ComponentsMaintainer,
        read_delta_stream,
        start_components_maintenance,
    )
    from polar_spark.plans import pregel
    from tests.oracles import py_components

    work = str(tmp_path / "work")
    delta_dir = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")
    _os.makedirs(delta_dir)

    # batch 1: two long chains (separate components)
    b1 = [(i, i + 1, "add") for i in range(0, 40)] + [
        (i, i + 1, "add") for i in range(100, 140)
    ]
    with open(_os.path.join(delta_dir, "b1.json"), "w") as f:
        f.write("\n".join(_json.dumps({"src": s_, "dst": d, "op": o}) for s_, d, o in b1))
    m = ComponentsMaintainer(spark, work, retention=2)
    start_components_maintenance(read_delta_stream(spark, delta_dir), m, ckpt).awaitTermination()
    s1 = m.state()
    assert s1["mode"] == "cold"

    # batch 2: one bridging edge merges the two chains — warm start must
    # be exact and much cheaper than the cold O(diameter) sweep
    with open(_os.path.join(delta_dir, "b2.json"), "w") as f:
        f.write(_json.dumps({"src": 40, "dst": 100, "op": "add"}))
    start_components_maintenance(read_delta_stream(spark, delta_dir), m, ckpt).awaitTermination()
    s2 = m.state()
    assert s2["mode"] == "warm_adds"
    got = {r["id"]: r["comp"] for r in m.comps().collect()}
    edges_now = [(r["src"], r["dst"]) for r in m.edges().collect()]
    assert got == py_components(edges_now)
    cold, cold_st = pregel.connected_components(m.edges())
    assert {r["id"]: r["comp"] for r in cold.collect()} == got
    assert s2["iterations"] < cold_st.iterations

    # batch 3: removing the bridge splits the component again — must
    # cold-start (stale-low labels would otherwise survive) and be exact
    with open(_os.path.join(delta_dir, "b3.json"), "w") as f:
        f.write(_json.dumps({"src": 40, "dst": 100, "op": "remove"}))
    start_components_maintenance(read_delta_stream(spark, delta_dir), m, ckpt).awaitTermination()
    s3 = m.state()
    assert s3["mode"] == "cold_removes"
    got3 = {r["id"]: r["comp"] for r in m.comps().collect()}
    edges3 = [(r["src"], r["dst"]) for r in m.edges().collect()]
    assert got3 == py_components(edges3)
    assert len(set(got3.values())) == 2


def test_scoped_grow_vertex_addition_exact(spark, tmp_path):
    """Round-4 widening: a delta that ADDS vertices (with out-edges, so
    both graphs stay dangling-free) takes the scoped path with the
    n/n' teleport renormalization and matches a cold recompute."""
    work = str(tmp_path / "scoped_grow")
    n = 300
    base = [(i, (i + 1) % n) for i in range(n)] + [(i, (i * 11 + 5) % n) for i in range(0, n, 15)]
    base = sorted(set((s, d) for s, d in base if s != d))
    m = RankMaintainer(spark, work, tol=1e-8, max_iter=300)
    s1 = m.apply_deltas(
        spark.createDataFrame([(s, d, "add") for s, d in base], "src long, dst long, op string")
    )
    assert s1["mode"] == "cold"

    # two brand-new vertices, each with an out-edge (dangling-free)
    delta = [(10, 500, "add"), (500, 501, "add"), (501, 20, "add")]
    s2 = m.apply_deltas(spark.createDataFrame(delta, "src long, dst long, op string"))
    assert s2["mode"] == "scoped_grow", s2

    final_edges = sorted(set(base) | {(10, 500), (500, 501), (501, 20)})
    cold, _ = pregel.pagerank(
        spark.createDataFrame(final_edges, "src long, dst long"), tol=1e-10, max_iter=400
    )
    a = {r["id"]: r["rank"] for r in cold.collect()}
    b = {r["id"]: r["rank"] for r in m.ranks().collect()}
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-6
    # mass stays normalized to the series-truncation tolerance
    assert abs(sum(b.values()) - 1.0) < 1e-6


def test_scoped_shrink_vertex_removal_exact(spark, tmp_path):
    """Round-4 session-4 widening: a delta that REMOVES a vertex (its
    edges rerouted so both graphs stay dangling-free) takes the scoped
    path — removed sources inject negative residuals and the same n/n'
    renormalization restores the teleport mass — and matches a cold
    recompute on the shrunk graph."""
    work = str(tmp_path / "scoped_shrink")
    n = 400
    base = [(i, (i + 1) % n) for i in range(n)] + [(i, (i * 7 + 3) % n) for i in range(0, n, 20)]
    base = sorted(set((s, d) for s, d in base if s != d))
    m = RankMaintainer(spark, work, tol=1e-8, max_iter=300)
    s1 = m.apply_deltas(
        spark.createDataFrame([(s, d, "add") for s, d in base], "src long, dst long, op string")
    )
    assert s1["mode"] == "cold"

    # remove vertex 55 entirely (ring neighbors rerouted 54→56)
    delta = [(54, 55, "remove"), (55, 56, "remove"), (54, 56, "add")]
    s2 = m.apply_deltas(spark.createDataFrame(delta, "src long, dst long, op string"))
    assert s2["mode"] == "scoped_shrink", s2

    final_edges = sorted((set(base) - {(54, 55), (55, 56)}) | {(54, 56)})
    cold, _ = pregel.pagerank(
        spark.createDataFrame(final_edges, "src long, dst long"), tol=1e-10, max_iter=400
    )
    a = {r["id"]: r["rank"] for r in cold.collect()}
    b = {r["id"]: r["rank"] for r in m.ranks().collect()}
    assert set(a) == set(b) and 55 not in b
    assert max(abs(a[k] - b[k]) for k in a) < 1e-6
    assert abs(sum(b.values()) - 1.0) < 1e-6


def test_scoped_mixed_add_and_remove_vertices_exact(spark, tmp_path):
    """A single batch that removes one vertex AND adds another (equal
    counts — the case where n_new == n_old but the vertex set changed)
    must take the scoped_mixed path and stay exact."""
    work = str(tmp_path / "scoped_mixed")
    n = 300
    base = [(i, (i + 1) % n) for i in range(n)] + [(i, (i * 11 + 5) % n) for i in range(0, n, 15)]
    base = sorted(set((s, d) for s, d in base if s != d))
    m = RankMaintainer(spark, work, tol=1e-8, max_iter=300)
    m.apply_deltas(
        spark.createDataFrame([(s, d, "add") for s, d in base], "src long, dst long, op string")
    )

    # remove vertex 7 (reroute 6→8), add vertex 700 (out-edge keeps it
    # dangling-free): n_new == n_old while the set changes
    delta = [
        (6, 7, "remove"), (7, 8, "remove"), (6, 8, "add"),
        (10, 700, "add"), (700, 20, "add"),
    ]
    s2 = m.apply_deltas(spark.createDataFrame(delta, "src long, dst long, op string"))
    assert s2["mode"] == "scoped_mixed", s2

    final_edges = sorted(
        (set(base) - {(6, 7), (7, 8)}) | {(6, 8), (10, 700), (700, 20)}
    )
    cold, _ = pregel.pagerank(
        spark.createDataFrame(final_edges, "src long, dst long"), tol=1e-10, max_iter=400
    )
    a = {r["id"]: r["rank"] for r in cold.collect()}
    b = {r["id"]: r["rank"] for r in m.ranks().collect()}
    assert set(a) == set(b) and 7 not in b and 700 in b
    assert max(abs(a[k] - b[k]) for k in a) < 1e-6
    assert abs(sum(b.values()) - 1.0) < 1e-6
