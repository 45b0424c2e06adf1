"""Round-5 session additions: bipartiteness audit, HyperLogLog,
vertex cover, exact AUC, MAD outliers, RRF hybrid retrieval.

Each operator also has a registered query + DuckDB oracle
(test_entry_contract replays those at sf0.001); these tests pin the
algorithmic properties on hand-built graphs/golden values instead.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polar_spark.operators.sketches import hll_estimate, hll_merge, hll_registers
from polar_spark.plans import pregel

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------- bipartite


def test_bipartite_odd_cycle_detected(spark):
    rep = pregel.bipartite_report(_edges(spark, [(1, 2), (2, 3), (3, 1)]))
    row = rep.collect()[0]
    assert row["comp"] == 1 and row["n_edges"] == 3
    assert row["odd_edges"] >= 1 and row["is_bipartite"] is False


def test_bipartite_even_cycle_and_path(spark):
    # C4 (bipartite) + disjoint P3 (bipartite): two components, both clean
    rep = pregel.bipartite_report(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (10, 11), (11, 12)])
    ).orderBy("comp")
    rows = rep.collect()
    assert [r["comp"] for r in rows] == [1, 10]
    assert all(r["is_bipartite"] for r in rows)
    assert [r["n_vertices"] for r in rows] == [4, 3]
    assert [r["n_edges"] for r in rows] == [4, 2]


def test_bipartite_mixed_components(spark):
    # triangle (odd) + star K1,3 (bipartite), self-loops/dups ignored
    rep = pregel.bipartite_report(
        _edges(
            spark,
            [(1, 2), (2, 3), (3, 1), (1, 1), (2, 1), (20, 21), (20, 22), (20, 23)],
        )
    ).orderBy("comp")
    rows = {r["comp"]: r for r in rep.collect()}
    assert rows[1]["is_bipartite"] is False and rows[1]["odd_edges"] == 1
    assert rows[20]["is_bipartite"] is True and rows[20]["n_edges"] == 3


def test_bipartite_empty(spark):
    assert pregel.bipartite_report(_edges(spark, [])).count() == 0


# ------------------------------------------------------------ HyperLogLog


def test_hll_estimate_accuracy(spark):
    # 2000 distinct keys, duplicated 3x: estimate within ~3 standard
    # errors (1.04/sqrt(256) ~ 6.5% relative)
    df = spark.range(2000).selectExpr(
        "id AS k", "'g' AS grp"
    ).unionAll(spark.range(2000).selectExpr("id AS k", "'g' AS grp")).unionAll(
        spark.range(2000).selectExpr("id AS k", "'g' AS grp")
    )
    regs = hll_registers(df, "k", "grp")
    assert regs.count() <= 256
    est = hll_estimate(regs).collect()[0]
    assert abs(est["est"] - 2000) / 2000 < 0.20


def test_hll_merge_equals_whole(spark):
    df = spark.range(5000).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS grp")
    whole = hll_registers(df, "k", "grp")
    a = hll_registers(df.where("id % 2 = 0"), "k", "grp")
    b = hll_registers(df.where("id % 2 = 1"), "k", "grp")
    merged = hll_merge(a, b)
    w = {(r["grp"], r["bucket"]): r["m_j"] for r in whole.collect()}
    m = {(r["grp"], r["bucket"]): r["m_j"] for r in merged.collect()}
    assert w == m
    # estimates therefore identical
    ew = {r["grp"]: r["est"] for r in hll_estimate(whole).collect()}
    em = {r["grp"]: r["est"] for r in hll_estimate(merged).collect()}
    assert ew == em


def test_hll_small_range_linear_counting(spark):
    # 30 distinct keys in one group: raw << 2.5m so the linear-counting
    # branch fires and is near-exact at this density
    df = spark.range(30).selectExpr("id AS k", "'s' AS grp")
    est = hll_estimate(hll_registers(df, "k", "grp")).collect()[0]
    assert est["zeros"] > 0
    assert abs(est["est"] - 30) <= 3


# ----------------------------------------------------------- vertex cover


def test_vertex_cover_covers_every_edge(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5), (6, 7)]
    e = _edges(spark, pairs)
    m, _ = pregel.maximal_matching(e)
    cover = {
        r["v"]
        for r in m.select(F.col("a").alias("v"))
        .unionByName(m.select(F.col("b").alias("v")))
        .distinct()
        .collect()
    }
    for s, d in pairs:
        assert s in cover or d in cover
    # 2-approximation: cover size is exactly 2|M|
    assert len(cover) == 2 * m.count()


# --------------------------------------------------------------- AUC / MAD


def _events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def test_auc_matches_python_midrank(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    row = QUERIES["auc_score"](spark, SF).collect()[0]
    pdf = _events_pdf()
    v6 = (pdf["value"] * 1e6 + 0.5).apply(math.floor).astype("int64")
    pos = (pdf["event_type"] == "purchase").astype(int)
    ranks = pd.Series(v6).rank(method="average")  # midranks
    n_pos, n_neg = int(pos.sum()), int((1 - pos).sum())
    r_pos = float(ranks[pos == 1].sum())
    auc = (r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
    assert row["u2"] == round(2 * r_pos - n_pos * (n_pos + 1))
    assert abs(row["auc"] - round(auc, 6)) <= 1e-6


def test_mad_outliers_matches_python(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = {r["event_type"]: r for r in QUERIES["mad_outliers"](spark, SF).collect()}
    pdf = _events_pdf()
    pdf["v6"] = (pdf["value"] * 1e6 + 0.5).apply(math.floor).astype("int64")
    for et, g in pdf.groupby("event_type"):
        med = g["v6"].median()
        dev = (g["v6"] - med).abs()
        mad = dev.median()
        r = rows[et]
        assert r["n"] == len(g)
        assert r["med6_x2"] == int(med * 2)
        assert r["mad6_x4"] == int(mad * 4)
        assert r["n_outliers"] == int((dev > 3 * mad).sum())


# ------------------------------------------------------------- RRF fusion


def test_rrf_fusion_arithmetic_and_shape(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    out = QUERIES["rrf_hybrid"](spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {3, 11, 19, 27, 42}
    for qid, rows in by_q.items():
        assert len(rows) == 10
        for r in rows:
            exp = 0
            if r["brank"] > 0:
                exp += math.floor(1e9 / (60 + r["brank"]))
            if r["crank"] > 0:
                exp += math.floor(1e9 / (60 + r["crank"]))
            assert r["rrf"] == exp
            assert r["did"] != qid  # self excluded
            assert r["brank"] <= 20 and r["crank"] <= 20
        # rnk is the (rrf desc, did asc) order
        ordered = sorted(rows, key=lambda r: (-r["rrf"], r["did"]))
        assert [r["rnk"] for r in ordered] == list(range(1, 11))


def test_rrf_doc_in_both_arms_beats_single_arm_tail(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    out = QUERIES["rrf_hybrid"](spark, SF).collect()
    both = [r for r in out if r["brank"] > 0 and r["crank"] > 0]
    single_tail = [
        r
        for r in out
        if (r["brank"] == 0) != (r["crank"] == 0)
        and max(r["brank"], r["crank"]) >= 15
    ]
    if both and single_tail:
        assert max(r["rrf"] for r in both) > max(r["rrf"] for r in single_tail)


# ----------------------------------------------------- PPR-Nibble sweep


def test_ppr_sweep_finds_planted_community(spark):
    # two 4-cliques joined by a single bridge: the min-phi prefix from
    # a seed inside clique A is exactly clique A
    cl_a = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    cl_b = [(a, b) for a in range(11, 15) for b in range(11, 15) if a < b]
    bridge = [(4, 11)]
    e = _edges(spark, cl_a + cl_b + bridge)
    sym = e.unionByName(e.selectExpr("dst AS src", "src AS dst"))
    # top=6 < |V| so the guarded whole-graph prefix (phi := 0) is not
    # in the sweep — at scale top << V makes that row unreachable anyway
    sweep = pregel.ppr_sweep(sym, source=1, alpha=0.15, n_iter=8, top=6).collect()
    # integer consistency: vol strictly increases, cut >= 0
    vols = [r["vol"] for r in sweep]
    assert vols == sorted(vols) and vols[0] >= 1
    assert all(r["cut"] >= 0 for r in sweep)
    best = min(sweep, key=lambda r: (r["phi"], r["t"]))
    prefix = {r["id"] for r in sweep if r["t"] <= best["t"]}
    assert prefix == {1, 2, 3, 4}
    assert best["cut"] == 1  # only the bridge crosses


# ---------------------------------------------------- disparity filter


def test_disparity_backbone_matches_python(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["disparity_backbone"](spark, SF).collect()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    w = (
        j.assign(src=j["o_custkey"], dst=j["l_suppkey"] + 1_000_000)
        .groupby(["src", "dst"])
        .size()
        .reset_index(name="w")
    )
    sym = pd.concat(
        [w, w.rename(columns={"src": "dst", "dst": "src"})], ignore_index=True
    )
    sd = sym.groupby("src").agg(s=("w", "sum"), k=("w", "count")).reset_index()
    m = w.merge(sd.rename(columns={"src": "src", "s": "sa", "k": "ka"}), on="src")
    m = m.merge(
        sd.rename(columns={"src": "dst", "s": "sb", "k": "kb"}), on="dst"
    )
    m["pa"] = (1.0 - m["w"] / m["sa"]) ** (m["ka"] - 1)
    m["pb"] = (1.0 - m["w"] / m["sb"]) ** (m["kb"] - 1)
    keep = m[(m["pa"] < 0.05) | (m["pb"] < 0.05)].sort_values(["src", "dst"])
    assert len(rows) == len(keep)
    for r, (_, g) in zip(rows, keep.iterrows()):
        assert (r["src"], r["dst"], r["w"]) == (g["src"], g["dst"], g["w"])
        assert abs(r["pa_r"] - round(g["pa"], 6)) <= 1e-9
        assert abs(r["pb_r"] - round(g["pb"], 6)) <= 1e-9


# ------------------------------------------------- matryoshka / bigram


def test_matryoshka_recall_shape(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["matryoshka_recall"](spark, SF).collect()
    assert [r["query_id"] for r in rows] == list(range(20))
    assert all(0 <= r["overlap3"] <= 3 for r in rows)
    # prefix ranking is a real approximation: overlap is not all-3
    # but also far from all-0 on isotropic synthetic embeddings
    total = sum(r["overlap3"] for r in rows)
    assert 0 < total < 60


def test_bigram_ppl_matches_python(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = {r["doc_id"]: r for r in QUERIES["bigram_ppl"](spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = {r.doc_id: r.text.strip().split() for r in docs.itertuples()}
    from collections import Counter

    cb: Counter = Counter()
    cu: Counter = Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] += 1
            cu[a] += 1
    v = len({w for ws in toks.values() for w in ws})
    for doc_id, ws in list(toks.items())[:40]:
        ll = 0
        n = 0
        for a, b in zip(ws, ws[1:]):
            ll += math.floor(1e6 * math.log((cb[(a, b)] + 1.0) / (cu[a] + float(v))))
            n += 1
        r = rows[doc_id]
        assert r["n_bigrams"] == n and r["ll_scaled"] == ll
        assert abs(r["ppl_r"] - round(math.exp(-ll / (1e6 * n)), 4)) <= 1e-9


# ------------------------------------------------ harmonic label spread


def test_harmonic_labels_path_graph(spark):
    # path 1-2-3-4-5, seeds: 1 -> label 0, 5 -> label 1.  With the
    # integer-floor Jacobi algebra the masses stay exactly replayable;
    # the ends' neighbors adopt the nearer seed's label
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    sym = e.unionByName(e.selectExpr("dst AS src", "src AS dst"))
    seeds = spark.createDataFrame([(1, 0), (5, 1)], "id long, lbl int")
    out = {r["id"]: r for r in pregel.harmonic_labels(sym, seeds, 2, rounds=6).collect()}
    assert out[1]["pred"] == 0 and out[5]["pred"] == 1  # clamped
    assert out[2]["pred"] == 0 and out[4]["pred"] == 1
    # center vertex: symmetric masses -> tie broken to smaller label
    assert out[3]["m0"] == out[3]["m1"] and out[3]["pred"] == 0


def test_harmonic_labels_matches_python_replay(spark):
    # integer algebra replayed exactly in python on a small graph
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6), (2, 6)]
    e = _edges(spark, pairs)
    sym = e.unionByName(e.selectExpr("dst AS src", "src AS dst"))
    seeds = [(1, 0), (6, 1)]
    sdf = spark.createDataFrame(seeds, "id long, lbl int")
    rounds, scale = 4, 1_000_000_000
    got = {r["id"]: (r["m0"], r["m1"]) for r in
           pregel.harmonic_labels(sym, sdf, 2, rounds=rounds).collect()}
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    seed_map = dict(seeds)
    f = {v: [scale if seed_map.get(v) == l else 0 for l in (0, 1)] for v in adj}
    for _ in range(rounds):
        nxt = {v: [0, 0] for v in adj}
        for v in adj:
            for u in adj[v]:
                du = len(adj[u])
                nxt[v][0] += f[u][0] // du
                nxt[v][1] += f[u][1] // du
        for v, l in seed_map.items():
            nxt[v] = [scale if l == 0 else 0, scale if l == 1 else 0]
        f = nxt
    assert got == {v: tuple(f[v]) for v in adj}


# ------------------------------------------------------ k-center coreset


def test_kcenter_planted_directions(spark):
    import math as _m

    # four unit vectors at 0, 90, 180, 270 degrees (ids 0..3) plus a
    # near-duplicate of id 0 (id 4): greedy from 0 picks the opposite
    # direction first, then one of the orthogonals (smaller id on tie),
    # and the near-dup is never an early pick
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [-1.0, 0.0]),
        (3, [0.0, -1.0]),
        (4, [0.999, 0.0447]),
    ]
    from polar_spark.operators.similarity import kcenter_init

    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    rows = kcenter_init(emb, k=4, start_id=0).collect()
    order = [r["center_id"] for r in rows]
    assert order[0] == 0 and order[1] == 2
    assert set(order[2:]) == {1, 3}
    assert order[2] == 1  # tie on dmin -> smaller id
    dmins = [r["dmin_r"] for r in rows[1:]]
    assert dmins == sorted(dmins, reverse=True)  # farthest-first monotone
    assert 4 not in order


def test_kcenter_centers_distinct_and_monotone(spark):
    from polar_spark.operators.similarity import kcenter_init

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    rows = kcenter_init(emb, k=8, start_id=0).collect()
    ids = [r["center_id"] for r in rows]
    assert len(set(ids)) == 8
    dmins = [r["dmin_r"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dmins, dmins[1:]))


# ---------------------------------------------------- split leakage


def test_split_leakage_is_cross_split_subset_of_neardups(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    leaks = QUERIES["split_leakage"](spark, SF).collect()
    assert len(leaks) > 0  # planted near-dups do cross the split
    pairs = {
        (r["id_a"], r["id_b"]): r["est_j"]
        for r in QUERIES["minhash_pairs"](spark, SF).collect()
    }
    splits = {
        r["doc_id"]: r["split"] for r in QUERIES["split_assign"](spark, SF).collect()
    }
    for r in leaks:
        assert r["est_j"] >= 0.5
        assert r["split_a"] != r["split_b"]
        assert splits[r["id_a"]] == r["split_a"]
        assert splits[r["id_b"]] == r["split_b"]
        assert pairs[(r["id_a"], r["id_b"])] == r["est_j"]


# -------------------------------------------------- Burt's constraint


def test_burt_constraint_triangle_and_star(spark):
    # triangle: d=2, c_ij = (1/2 + 1/2*1/2)^2 = 0.5625, C = 1.125
    tri = pregel.burt_constraint(_edges(spark, [(1, 2), (2, 3), (1, 3)]))
    for r in tri.collect():
        assert r["c_r"] == 1.125 and r["d"] == 2
    # star K1,4: center C = 4*(1/4)^2 = 0.25, leaves C = 1.0
    star = pregel.burt_constraint(
        _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    )
    rows = {r["id"]: r for r in star.collect()}
    assert rows[0]["c_r"] == 0.25 and rows[0]["d"] == 4
    for leaf in (1, 2, 3, 4):
        assert rows[leaf]["c_r"] == 1.0 and rows[leaf]["d"] == 1
    # the broker (star center) is less constrained than clique members
    assert rows[0]["c_r"] < 1.125


def test_burt_constraint_degree_cutoff(spark):
    # hub of degree 5 excluded at max_degree=4: the induced subgraph
    # loses the hub and its edges entirely
    e = _edges(spark, [(0, i) for i in range(1, 6)] + [(1, 2)])
    out = pregel.burt_constraint(e, max_degree=4)
    ids = {r["id"] for r in out.collect()}
    assert 0 not in ids and ids == {1, 2}


# ---------------------------------------------- streaming distinct HLL


def test_distinct_maintainer_fold_and_restart(spark, tmp_path):
    from polar_spark.streaming.distinct_stream import DistinctCountMaintainer

    m = DistinctCountMaintainer(spark, str(tmp_path), key_col="k", group_col="g")
    b1 = spark.range(0, 600).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS g")
    b2 = spark.range(300, 900).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS g")
    m.apply_batch(b1, batch_id=0)
    m.apply_batch(b2, batch_id=1)
    # equals the registers of the union (max-merge == whole)
    whole = hll_registers(b1.unionByName(b2).distinct(), "k", "g")
    got = {(r["grp"], r["bucket"]): r["m_j"] for r in m.registers().collect()}
    want = {(r["grp"], r["bucket"]): r["m_j"] for r in whole.collect()}
    assert got == want
    est = {r["grp"]: r["est"] for r in m.estimates().collect()}
    for g in ("0", "1"):
        assert abs(est[g] - 450) / 450 < 0.15  # 900 distinct keys, 2 groups
    # restart: a fresh instance resumes from the pointer
    m2 = DistinctCountMaintainer(spark, str(tmp_path), key_col="k", group_col="g")
    assert m2.state()["version"] == 2
    # recorded replay skipped
    out = m2.apply_batch(b2, batch_id=1)
    assert out.get("skipped_replay") is True
    # and even an UNrecorded replay is harmless: max-merge idempotent
    m2.apply_batch(b2, batch_id=7)
    got3 = {(r["grp"], r["bucket"]): r["m_j"] for r in m2.registers().collect()}
    assert got3 == want


# ------------------------------------------------- language confusion


def test_lang_confusion_totals(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["lang_confusion"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    langs = {"en", "es", "de", "fr", "zh"}
    assert {r["label"] for r in rows} <= langs
    assert {r["heur_pred"] for r in rows} <= langs


# ------------------------------------------------------------ plan gates


def _exec_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_registers_single_exchange_no_python(spark):
    # hash + bucket + rho are pure JVM expressions; the register fold
    # is ONE map-side-combinable aggregation -> exactly one Exchange
    df = spark.createDataFrame([(k % 5, k) for k in range(500)], "g long, key long")
    plan = _exec_plan(hll_registers(df, "key", "g"))
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan


def test_disparity_is_linear_no_python(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    plan = _exec_plan(QUERIES["disparity_backbone"](spark, SF))
    # joins + aggregates only: no python stage, no cartesian product
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_mad_auc_no_python_no_cartesian(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    for q in ("mad_outliers", "auc_score"):
        plan = _exec_plan(QUERIES[q](spark, SF))
        assert "EvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_harmonic_labels_no_python(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    sym = e.unionByName(e.selectExpr("dst AS src", "src AS dst"))
    seeds = spark.createDataFrame([(1, 0)], "id long, lbl int")
    plan = _exec_plan(pregel.harmonic_labels(sym, seeds, 2, rounds=1))
    assert "EvalPython" not in plan


# --------------------------------------- percolation / dedup clusters


def test_percolation_profile_monotone(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["percolation_profile"](spark, SF).collect()
    assert [r["thr"] for r in rows] == [2, 3, 4, 5]
    for a, b in zip(rows, rows[1:]):
        # raising the threshold can only shrink the graph
        assert b["n_edges"] <= a["n_edges"]
        assert b["n_vertices"] <= a["n_vertices"]
        assert b["giant"] <= a["giant"]
    for r in rows:
        assert r["giant"] <= r["n_vertices"]
        assert (r["n_edges"] == 0) == (r["n_vertices"] == 0)


def test_neardup_clusters_consistent_with_pairs(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    hist = QUERIES["neardup_clusters"](spark, SF).collect()
    assert all(r["cluster_size"] >= 2 for r in hist)
    n_docs_clustered = sum(r["cluster_size"] * r["n_clusters"] for r in hist)
    pairs = [
        r
        for r in QUERIES["minhash_pairs"](spark, SF).collect()
        if r["est_j"] >= 0.5
    ]
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert n_docs_clustered == len(ids)


# --------------------------------------- triad census / heaps / gini / k4


def test_triad_census_identities(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    r = QUERIES["triad_census"](spark, SF).collect()[0]
    n = r["n"]
    assert r["empty"] >= 0 and r["one_edge"] >= 0 and r["path"] >= 0
    total = r["empty"] + r["one_edge"] + r["path"] + r["triangle"]
    assert total == n * (n - 1) * (n - 2) // 6
    assert r["wedges"] == r["path"] + 3 * r["triangle"]


def test_heaps_curve_monotone_and_totals(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from pyspark.sql import functions as F

    rows = QUERIES["heaps_curve"](spark, SF).collect()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b["docs_cum"] >= a["docs_cum"]
        assert b["tokens_cum"] >= a["tokens_cum"]
        assert b["vocab_cum"] >= a["vocab_cum"]
    docs = load_table(spark, "documents", SF)
    n_docs = docs.count()
    n_vocab = (
        docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert rows[-1]["docs_cum"] == n_docs
    assert rows[-1]["vocab_cum"] == n_vocab


def test_gini_degree_bounds(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    r = QUERIES["gini_degree"](spark, SF).collect()[0]
    assert 0.0 <= r["gini_r"] < 1.0
    # ranked weighted sum is bracketed by the unranked extremes
    assert r["sum_d"] <= r["s"] <= r["n"] * r["sum_d"]


def test_k4_planted_cliques(spark):
    from polar_spark.operators.analytics_queries import k4_per_vertex

    # K5 on {1..5}: every vertex sits in C(4,3)=4 of the 5 K4s; a
    # disjoint K4 minus one edge {10..13} has no 4-clique at all.
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    broken = [(10, 11), (10, 12), (11, 12), (11, 13), (12, 13)]  # no 10-13
    und = spark.createDataFrame(k5 + broken, "src long, dst long")
    got = {r["id"]: r["k4"] for r in k4_per_vertex(und).collect()}
    assert got == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4}


def test_source_dup_matrix_totals(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["source_dup_matrix"](spark, SF).collect()
    assert all(r["source_lo"] <= r["source_hi"] for r in rows)
    n_pairs = sum(r["n_pairs"] for r in rows)
    mh = [r for r in QUERIES["minhash_pairs"](spark, SF).collect() if r["est_j"] >= 0.5]
    assert n_pairs == len(mh)


def test_tok_fertility_totals(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["tok_fertility"](spark, SF).collect()
    n_docs = load_table(spark, "documents", SF).count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["bpe_per_ws_ppm"] > 0
        assert r["chars_per_bpe_milli"] > 0


# --------------------------------------- TPC-H classics / LT cascade


def test_q3_q10_topn_shape(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    q3 = QUERIES["q3_shipping"](spark, SF).collect()
    assert len(q3) <= 10
    revs = [r["revenue_e4"] for r in q3]
    assert revs == sorted(revs, reverse=True)
    assert all(v > 0 for v in revs)
    q10 = QUERIES["q10_returned"](spark, SF).collect()
    assert len(q10) <= 20
    revs10 = [r["revenue_e4"] for r in q10]
    assert revs10 == sorted(revs10, reverse=True)


def test_q5_local_volume_nations(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from pyspark.sql import functions as F

    rows = QUERIES["q5_local_volume"](spark, SF).collect()
    nat = load_table(spark, "nation", SF)
    reg = load_table(spark, "region", SF).where(F.col("r_name") == "ASIA")
    asia = {
        r["n_name"]
        for r in nat.join(reg, nat.n_regionkey == reg.r_regionkey).collect()
    }
    assert {r["n_name"] for r in rows} <= asia
    assert all(r["revenue_e4"] > 0 for r in rows)


def test_cascade_lt_monotone_from_seeds(spark):
    from polar_spark.operators.analytics_queries import QUERIES, coorder_edges, _sym
    from pyspark.sql import functions as F

    rows = QUERIES["cascade_lt"](spark, SF).collect()
    by_round = {}
    for r in rows:
        by_round.setdefault(r["act_round"], set()).add(r["id"])
    assert len(by_round.get(0, ())) == 2  # exactly two seeds
    # every non-seed activation has an already-active neighbor from an
    # earlier round (cascades only spread along edges)
    sym = _sym(coorder_edges(spark, SF))
    adj = {}
    for e in sym.collect():
        adj.setdefault(e["src"], set()).add(e["dst"])
    active_before = set(by_round.get(0, ()))
    for rnd in sorted(k for k in by_round if k > 0):
        for v in by_round[rnd]:
            assert adj.get(v, set()) & active_before, (rnd, v)
        active_before |= by_round[rnd]


# --------------------------------------- eff diameter / densification / readability


def test_eff_diameter_monotone(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["eff_diameter"](spark, SF).collect()
    assert [r["h"] for r in rows] == [1, 2, 3, 4]
    reach = [r["reach_micro"] for r in rows]
    assert reach == sorted(reach)  # neighborhood mass only grows with h
    assert rows[-1]["within_90pct"]  # the final hop is trivially within 90%
    # flags are monotone: once within 90%, stays within
    flags = [r["within_90pct"] for r in rows]
    assert flags == sorted(flags)


def test_densification_curve_cumulative(spark):
    from polar_spark.operators.analytics_queries import QUERIES, coorder_edges

    rows = QUERIES["densification_curve"](spark, SF).collect()
    assert rows == sorted(rows, key=lambda r: r["ym"])
    assert sum(r["new_edges"] for r in rows) == rows[-1]["cum_edges"]
    assert sum(r["new_vertices"] for r in rows) == rows[-1]["cum_vertices"]
    # the curve's totals equal the static co-order graph
    und = coorder_edges(spark, SF)
    assert rows[-1]["cum_edges"] == und.count()


def test_readability_bounds(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["readability"](spark, SF).collect()
    assert len(rows) == load_table(spark, "documents", SF).count()
    for r in rows:
        assert r["n_sentences"] >= 0 and r["n_words"] > 0
        assert r["syll_per_word_milli"] >= 0
        if r["n_sentences"] > 0:
            assert r["words_per_sent_milli"] >= 1000 // max(r["n_sentences"], 1)


# ------------------------------- containment / calibration / attack tolerance


def test_containment_brackets_jaccard(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["containment_pairs"](spark, SF).collect()
    for r in rows:
        assert 0 < max(r["cont_a_ppm"], r["cont_b_ppm"]) <= 1000000
        # containment of the smaller side is >= 40% by the filter
        assert max(r["cont_a_ppm"], r["cont_b_ppm"]) >= 400000
    # every exact-jaccard >= 0.4 pair must appear (containment >= jaccard)
    jacc = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["exact_jaccard_pairs"](spark, SF).collect()
        if r["jaccard_r"] >= 0.4
    }
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert jacc <= got


def test_minhash_calibration_sane(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["minhash_calibration"](spark, SF).collect()
    assert sum(r["n_pairs"] for r in rows) == len(
        QUERIES["minhash_pairs"](spark, SF).collect()
    )
    for r in rows:
        assert 0 <= r["band"] <= 10
        assert 0 <= r["pooled_est_ppm"] <= 1000000
        assert 0 <= r["pooled_exact_ppm"] <= 1000000
    # pooled estimates are ordered with their bands
    ests = [r["pooled_est_ppm"] for r in sorted(rows, key=lambda r: r["band"])]
    assert ests == sorted(ests)


def test_attack_tolerance_monotone(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["attack_tolerance"](spark, SF).collect()
    assert [r["k"] for r in rows] == [0, 10, 50, 100]
    for a, b in zip(rows, rows[1:]):
        assert b["n_edges"] <= a["n_edges"]
        assert b["n_vertices"] <= a["n_vertices"]
        assert b["giant"] <= a["giant"]
    for r in rows:
        assert r["giant"] <= r["n_vertices"]


# --------------------------------------- Q7/Q12/Q18 / novelty


def test_q7_bilateral_directions(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["q7_nation_volume"](spark, SF).collect()
    for r in rows:
        assert {r["supp_nation"], r["cust_nation"]} == {"NATION_0", "NATION_1"}
        assert 1996 <= r["yr"] <= 1998
        assert r["revenue_e4"] > 0


def test_late_shipments_partition(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["late_shipments"](spark, SF).collect()
    total = sum(r["n_lines"] for r in rows)
    assert total == load_table(spark, "lineitem", SF).count()
    for r in rows:
        assert 0 <= r["n_late"] <= r["n_lines"]
        assert 0 <= r["late_ppm"] <= 1000000


def test_q18_threshold_and_order(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["q18_large_orders"](spark, SF).collect()
    assert len(rows) <= 20
    qtys = [r["total_qty_c"] for r in rows]
    assert qtys == sorted(qtys, reverse=True)
    assert all(q > 12000 for q in qtys)


def test_novelty_conservation(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["novelty"](spark, SF).collect()
    # the first document is 100% novel by definition
    first = min(rows, key=lambda r: r["doc_id"])
    assert first["novelty_ppm"] == 1000000
    # total novel grams across docs == global distinct gram count
    n_novel = sum(r["n_novel"] for r in rows)
    assert n_novel <= sum(r["n_grams"] for r in rows)
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]


# --------------------------------------- Q14 / Q16 / Q22


def test_q14_ratio_bounds(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["q14_promo_ratio"](spark, SF).collect()
    for r in rows:
        assert 199801 <= r["ym"] <= 199812
        assert 0 <= r["promo_rev_e4"] <= r["total_rev_e4"]
        assert 0 <= r["promo_ppm"] <= 1000000


def test_q16_counts_consistent(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from pyspark.sql import functions as F

    rows = QUERIES["q16_supplier_counts"](spark, SF).collect()
    # per-category part totals can't exceed the catalog size, and the
    # category breakdown partitions the supplied parts
    n_supplied = (
        load_table(spark, "lineitem", SF).select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows) == n_supplied
    n_supp = load_table(spark, "supplier", SF).count()
    assert all(0 < r["n_suppliers"] <= n_supp for r in rows)


def test_q22_idle_rich_semantics(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from pyspark.sql import functions as F

    rows = QUERIES["q22_idle_rich"](spark, SF).collect()
    cust = load_table(spark, "customer", SF)
    orders = (
        load_table(spark, "orders", SF)
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    idle = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").count()
    assert sum(r["n_custs"] for r in rows) <= idle
    for r in rows:
        assert r["n_custs"] > 0 and r["total_bal_c"] > 0


# -------------------------- revenue concentration / order gaps / degree-core


def test_revenue_concentration_shape(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = {r["top_pct"]: r for r in QUERIES["revenue_concentration"](spark, SF).collect()}
    assert set(rows) == {1, 10}
    # more customers capture more revenue, and shares are valid ppm
    assert rows[10]["share_ppm"] >= rows[1]["share_ppm"]
    assert rows[10]["k_customers"] >= rows[1]["k_customers"]
    for r in rows.values():
        assert 0 < r["share_ppm"] <= 1000000
        # top-p% must capture at least p% of revenue (by definition of top)
        assert r["share_ppm"] >= r["top_pct"] * 10000


def test_order_gaps_consistency(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from pyspark.sql import functions as F

    rows = QUERIES["order_gaps"](spark, SF).collect()
    multi = (
        load_table(spark, "orders", SF)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .count()
    )
    assert len(rows) == multi
    for r in rows:
        assert r["n_orders"] >= 2
        assert 0 <= r["median_gap_x2"] <= 2 * r["max_gap_days"]


def test_degree_core_corr_range(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    r = QUERIES["degree_core_corr"](spark, SF).collect()[0]
    assert -1.0 <= r["pearson_r"] <= 1.0
    assert r["n"] > 0


def test_graph_profile_consistent_with_census(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    p = QUERIES["graph_profile"](spark, SF).collect()[0]
    t = QUERIES["triad_census"](spark, SF).collect()[0]
    assert p["n_vertices"] == t["n"] and p["n_edges"] == t["m"]
    assert p["triangles"] == t["triangle"]
    assert 0 < p["density_ppm"] <= 2000000
    assert 0 <= p["giant_share_ppm"] <= 1000000
    assert p["max_degree"] * p["n_vertices"] >= 2 * p["n_edges"] // 1  # dmax >= mean


# ------------------------------------------------- session-9 additions


def test_session9_plans_no_python_no_cartesian(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    for q in (
        "event_transitions",
        "weighted_jaccard20",
        "assoc_rules",
        "q9_profit",
        "friendship_paradox",
    ):
        plan = _exec_plan(QUERIES[q](spark, SF))
        assert "EvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_friendship_paradox_inequality(spark):
    # Σd²/Σd ≥ Σd/n with equality only on regular graphs (Cauchy-
    # Schwarz) — the co-order graph is far from regular, so strict
    from polar_spark.operators.analytics_queries import QUERIES

    r = QUERIES["friendship_paradox"](spark, SF).collect()[0]
    assert r["nbr_mean_deg_ppm"] > r["mean_deg_ppm"]
    assert 0 <= r["paradox_ppm"] <= 1_000_000
    assert r["n_paradox"] <= r["n_vertices"]


def test_assoc_rules_bounds(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["assoc_rules"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["n_ab"] >= 3
        assert 0 < r["conf_ppm"] <= 1_000_000


def test_event_transitions_rows_sum_to_total(spark):
    # Σ transition counts = Σ_user (events_u - 1); row probabilities
    # never exceed 1e6 ppm
    from polar_spark.operators.analytics_queries import QUERIES
    from polar_spark.sources.tables import load_table

    rows = QUERIES["event_transitions"](spark, SF).collect()
    total = sum(r["n"] for r in rows)
    ev = load_table(spark, "events", SF)
    per_user = ev.groupBy("user_id").agg((F.count("*") - 1).alias("k"))
    expect = per_user.agg(F.sum("k")).collect()[0][0]
    assert total == expect
    assert all(0 < r["p_ppm"] <= 1_000_000 for r in rows)


def test_weighted_jaccard_bounds_and_symmetry_identity(spark):
    # Ruzicka similarity is in (0, 1]; sum_min identity keeps it exact
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["weighted_jaccard20"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 < r["wj_ppm"] <= 1_000_000


def test_session9b_plans_no_python_no_cartesian(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    for q in ("knn_curve", "customer_deciles", "revenue_mom"):
        plan = _exec_plan(QUERIES[q](spark, SF))
        assert "EvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_customer_deciles_partition_of_customers(spark):
    from polar_spark.operators.analytics_queries import QUERIES
    from polar_spark.sources.tables import load_table

    rows = QUERIES["customer_deciles"](spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_cust = (
        load_table(spark, "orders", SF).select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000  # floor rounding
    # deciles are ordered by revenue: monotone non-increasing share
    shares = [r["rev_cents"] for r in rows]
    assert all(a >= b for a, b in zip(shares, shares[1:]))


def test_knn_curve_weighted_mean_is_nbr_mean(spark):
    # Σ_k n_k·k·knn(k) / Σ_k n_k·k  ==  Σd²/Σd from friendship_paradox
    # (up to the ppm floor); checks the two derivations agree
    from polar_spark.operators.analytics_queries import QUERIES

    curve = QUERIES["knn_curve"](spark, SF).collect()
    fp = QUERIES["friendship_paradox"](spark, SF).collect()[0]
    num = sum(r["deg"] * r["n_vertices"] * r["knn_ppm"] for r in curve)
    den = sum(r["deg"] * r["n_vertices"] for r in curve)
    approx = num / den
    assert abs(approx - fp["nbr_mean_deg_ppm"]) < 1000  # ppm floor noise


def test_revenue_mom_first_month_null_growth(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["revenue_mom"](spark, SF).collect()
    assert rows[0]["growth_ppm"] is None
    assert all(r["growth_ppm"] is not None for r in rows[1:])
    assert all(r["rev_cents"] > 0 for r in rows)


def test_session9c_plans_no_python(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    for q in ("burstiness", "q1_pricing", "partition_performance"):
        plan = _exec_plan(QUERIES[q](spark, SF))
        assert "EvalPython" not in plan, q


def test_burstiness_range_and_regularity_sign(spark):
    # B ∈ (-1, 1); a strictly periodic user would be -1, Poisson ~0
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["burstiness"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 < r["burstiness_r"] < 1.0
        assert r["n_gaps"] >= 5 and r["mean_gap_sec"] > 0


def test_partition_performance_bounds_vs_modularity_inputs(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    r = QUERIES["partition_performance"](spark, SF).collect()[0]
    assert 0 <= r["perf_ppm"] <= 1_000_000
    assert r["intra_e"] <= r["m"]
    assert r["intra_pairs"] >= r["intra_e"]  # pairs within communities


def test_q1_pricing_totals_consistent(spark):
    # avg columns are the integer floor of sum/count; charge >= disc
    # price x 100 never (tax >= 0 means charge_e6 >= disc_e4 * 100)
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["q1_pricing"](spark, SF).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["avg_qty_centi"] == r["sum_qty_centi"] // r["count_order"]
        assert r["sum_charge_e6"] >= r["sum_disc_e4"] * 100


def test_session9d_plans_no_python(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    for q in ("partition_cut_audit", "rfm_segments", "benford_digits", "abc_parts"):
        plan = _exec_plan(QUERIES[q](spark, SF))
        assert "EvalPython" not in plan, q


def test_partition_cut_community_beats_hash(spark):
    # the point of the audit: community-aware placement cuts fewer
    # edges than hash placement on a graph with community structure
    from polar_spark.operators.analytics_queries import QUERIES

    r = QUERIES["partition_cut_audit"](spark, SF).collect()[0]
    assert r["cut_lpa"] < r["cut_hash"]
    assert 0 <= r["lpa_ppm"] <= 1_000_000
    assert r["cut_hash"] <= r["m"] and r["cut_range"] <= r["m"]


def test_rfm_segments_partition_customers(spark):
    from polar_spark.operators.analytics_queries import QUERIES
    from polar_spark.sources.tables import load_table

    rows = QUERIES["rfm_segments"](spark, SF).collect()
    n_cust = load_table(spark, "orders", SF).select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert len(r["segment"]) == 3
        assert all(c in "12345" for c in r["segment"])


def test_benford_digits_cover_1_to_9(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["benford_digits"](spark, SF).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(r["obs_ppm"] for r in rows) <= 1_000_000
    # Benford expectation must itself sum to ~1e6
    assert abs(sum(r["benford_ppm"] for r in rows) - 1_000_000) < 10


def test_abc_parts_pareto_shape(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = {r["abc"]: r for r in QUERIES["abc_parts"](spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    # A-class: <=80% of revenue in the fewest parts; shares ordered
    assert rows["A"]["share_ppm"] <= 800_000
    assert rows["A"]["rev_e4"] > rows["C"]["rev_e4"]


def test_session9e_plans_no_python(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    for q in ("mrr_eval", "cohort_ltv", "ship_latency"):
        plan = _exec_plan(QUERIES[q](spark, SF))
        assert "EvalPython" not in plan, q


def test_mrr_eval_rank_reciprocal_identity(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["mrr_eval"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        if r["first_rank"] > 0:
            assert r["rr_ppm"] == 1_000_000 // r["first_rank"]
            assert 1 <= r["first_rank"] <= 10
        else:
            assert r["rr_ppm"] == 0


def test_cohort_ltv_cumulative_monotone(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["cohort_ltv"](spark, SF).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for seq in by_cohort.values():
        cums = [r["cum_rev_cents"] for r in seq]
        assert all(a < b for a, b in zip(cums, cums[1:])) or len(cums) == 1
        assert cums[-1] == sum(r["rev_cents"] for r in seq)


def test_ship_latency_percentiles_ordered(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["ship_latency"](spark, SF).collect()
    assert len(rows) == 5  # five order priorities
    for r in rows:
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"]
        assert r["n"] > 0


# ----------------------------------------- Q2 / Q11 / Q20 (family complete)


def test_q2_best_offer_is_minimum_and_ties_surface(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from pyspark.sql import functions as F

    rows = QUERIES["q2_min_cost_supp"](spark, SF).collect()
    assert rows, "bolt parts with EUROPE offers must exist"
    # every surfaced part is a '%bolt' part and every offer is positive
    bolts = {
        r["p_partkey"]
        for r in load_table(spark, "part", SF)
        .where(F.col("p_name").like("%bolt"))
        .collect()
    }
    per_part = {}
    for r in rows:
        assert r["p_partkey"] in bolts
        assert r["offer_e4"] > 0
        per_part.setdefault(r["p_partkey"], set()).add(r["offer_e4"])
    # all rows for one part share the single best offer (ties surface)
    assert all(len(v) == 1 for v in per_part.values())


def test_q11_threshold_and_share_identity(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["q11_important_stock"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["share_ppm"] <= 1_000_000
        # threshold 1/2000 == 500 ppm: every kept share must exceed ~500
        # ppm minus the downscale rounding slack (1 ppm)
        assert r["share_ppm"] >= 499
    vals = [r["value_e4"] for r in rows]
    assert vals == sorted(vals, reverse=True) or len(set(vals)) < len(vals)


def test_q20_dominance_recheck(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from pyspark.sql import functions as F

    rows = QUERIES["q20_excess_suppliers"](spark, SF).collect()
    # recompute the dominant (part, supplier) set naively and compare
    li = load_table(spark, "lineitem", SF)
    part = (
        load_table(spark, "part", SF)
        .where(F.col("p_name").like("cold %"))
        .select("p_partkey")
    )
    nat = load_table(spark, "nation", SF)
    reg = load_table(spark, "region", SF).where(F.col("r_name") == "EUROPE")
    eur = (
        load_table(spark, "supplier", SF)
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    fact = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(eur, li.l_suppkey == eur.s_suppkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.expr("SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))").alias("sq"))
        .collect()
    )
    tot = {}
    for r in fact:
        tot[r["p_partkey"]] = tot.get(r["p_partkey"], 0) + r["sq"]
    expect = {}
    for r in fact:
        if 2 * r["sq"] > tot[r["p_partkey"]]:
            expect[r["l_suppkey"]] = expect.get(r["l_suppkey"], 0) + 1
    got = {r["s_suppkey"]: r["n_dominant_parts"] for r in rows}
    assert got == expect


# -------------------- butterflies / config-model audit / clustering curve


def test_butterflies_identities(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from pyspark.sql import functions as F

    r = QUERIES["butterflies"](spark, SF).collect()[0]
    # each butterfly contains exactly 4 labeled 3-paths
    assert 4 * r["butterflies"] <= r["caterpillars"]
    assert 0 <= r["bip_clustering_ppm"] <= 1_000_000
    # wedges_orders equals the total multiplicity of the co-order pair
    # table (sum of per-pair co-occurrence counts)
    li = load_table(spark, "lineitem", SF)
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    pair_mult = a.join(
        b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
    ).count()
    assert r["wedges_orders"] == pair_mult
    # independent butterfly recompute from the pair-count table
    co = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p"), F.col("b.p"))
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).alias("bf"))
        .collect()[0]["bf"]
    )
    assert r["butterflies"] == co


def test_config_model_audit_identities(spark):
    from polar_spark.operators.analytics_queries import QUERIES, coorder_edges
    from polar_spark.plans import pregel

    r = QUERIES["config_model_audit"](spark, SF).collect()[0]
    assert r["n"] > 0 and r["s1"] > 0 and r["s2"] > 0
    assert r["transitivity_ppm"] == 6 * r["triangles"] * 1_000_000 // r["s2"]
    _pv, total = pregel.triangle_count(coorder_edges(spark, SF))
    assert r["triangles"] == total
    # excess ratio is triangles / expectation, both published rounded
    assert abs(r["excess_ratio_r"] - r["triangles"] / r["expected_tri_r"]) < 1e-2


def test_clustering_curve_partitions_and_triangle_mass(spark):
    from polar_spark.operators.analytics_queries import QUERIES, coorder_edges
    from polar_spark.plans import pregel
    from pyspark.sql import functions as F

    rows = QUERIES["clustering_curve"](spark, SF).collect()
    e = coorder_edges(spark, SF)
    _pv, total = pregel.triangle_count(e)
    # vertices with degree < 2 carry no triangles, so the k>=2 classes
    # hold the full triangle mass: sum of per-vertex counts = 3T
    assert sum(r["tri_sum"] for r in rows) == 3 * total
    deg2 = pregel.degrees(e).where(F.col("degree") >= 2).count()
    assert sum(r["n_k"] for r in rows) == deg2
    for r in rows:
        assert 0 <= r["cc_pooled_ppm"] <= 1_000_000


# -------------------- nDCG eval / NB margin calibration / attribution


def test_ndcg_bounds_and_mrr_consistency(spark):
    from polar_spark.operators.analytics_queries import (
        _NDCG_IDCG,
        _NDCG_W,
        QUERIES,
    )

    # weight table sanity: strictly decreasing discounts, prefix sums
    assert _NDCG_W[0] == 1_000_000 and all(
        a > b for a, b in zip(_NDCG_W, _NDCG_W[1:])
    )
    assert _NDCG_IDCG[-1] == sum(_NDCG_W)
    ndcg = {r["query_id"]: r for r in QUERIES["ndcg_eval"](spark, SF).collect()}
    mrr = {r["query_id"]: r for r in QUERIES["mrr_eval"](spark, SF).collect()}
    assert set(ndcg) == set(mrr)
    for qid, r in ndcg.items():
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        assert r["n_relevant"] == mrr[qid]["n_relevant"]
        # a first-rank-1 hit guarantees ndcg >= w1/idcg(min(R,10))
        if mrr[qid]["first_rank"] == 1:
            from polar_spark.operators.analytics_queries import _NDCG_K

            idcg = _NDCG_IDCG[min(r["n_relevant"], _NDCG_K) - 1]
            assert r["ndcg_ppm"] >= 1_000_000 * 1_000_000 // idcg
        # zero relevant docs -> zero everything
        if r["n_relevant"] == 0:
            assert r["hits10"] == 0 and r["dcg_e6"] == 0 and r["ndcg_ppm"] == 0
        # perfect prefix: hits10 == min(R,10) AND all at top => ndcg == 1e6
        if r["dcg_e6"] and r["hits10"]:
            assert r["dcg_e6"] <= _NDCG_IDCG[r["hits10"] - 1]


def test_nb_margin_calibration_partitions_docs(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table
    from polar_spark.operators.classify import nb_classify

    rows = QUERIES["nb_margin_calibration"](spark, SF).collect()
    assert [r["bin"] for r in rows] == list(range(1, 11))
    n_docs = load_table(spark, "documents", SF).count()
    assert sum(r["n"] for r in rows) == n_docs
    # NTILE bin sizes differ by at most 1
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n"]
        assert r["acc_ppm"] == r["n_correct"] * 1_000_000 // r["n"]
        assert r["margin_min"] >= 0  # top1 >= top2 by construction
        assert r["margin_min"] <= r["margin_max"]
    # margins are non-decreasing across bins
    for a, b in zip(rows, rows[1:]):
        assert a["margin_max"] <= b["margin_min"]
    # total correct matches the classifier's own tally
    total_correct = nb_classify(load_table(spark, "documents", SF)).agg(
        F.sum("correct")
    ).collect()[0][0]
    assert sum(r["n_correct"] for r in rows) == total_correct


def test_attribution_conserves_purchases(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["attribution_last_touch"](spark, SF).collect()
    n_purchases = (
        load_table(spark, "events", SF)
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["conversions"] for r in rows) == n_purchases
    types = {r["touch_type"] for r in rows}
    # only non-purchase types (or 'direct') can receive credit
    assert "purchase" not in types
    valid = {"click", "view", "signup", "error", "direct"}
    assert types <= valid
    for r in rows:
        assert 0 < r["n_users"] <= r["conversions"]


# ------------------- widest paths / mutual top-1 / conversion lag


def test_widest_paths_golden_diamond(spark):
    # 1->2 (10) ->4 (10) vs 1->3 (3) ->4 (100): bottleneck to 4 is 10,
    # and the wide far edge cannot rescue the narrow 1->3 link
    e = spark.createDataFrame(
        [(1, 2, 10), (2, 4, 10), (1, 3, 3), (3, 4, 100)],
        "src long, dst long, w long",
    )
    cap, st = pregel.widest_paths(e, sources=[1])
    got = {r["id"]: r["cap"] for r in cap.collect()}
    assert got[2] == 10 and got[3] == 3 and got[4] == 10
    assert got[1] == pregel.WIDEST_INF
    assert st.converged


def test_widest_paths_parallel_edges_keep_max(spark):
    e = spark.createDataFrame(
        [(1, 2, 1), (1, 2, 7), (2, 3, 5)], "src long, dst long, w long"
    )
    cap, _ = pregel.widest_paths(e, sources=[1])
    got = {r["id"]: r["cap"] for r in cap.collect()}
    assert got[2] == 7 and got[3] == 5


def test_widest_paths_reaches_same_set_as_sssp(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    wide = {r["id"] for r in QUERIES["widest_paths"](spark, SF).collect()}
    short = {r["id"] for r in QUERIES["sssp_weighted"](spark, SF).collect()}
    # same graph, same source: reachability is identical (source is
    # excluded from widest's published rows, included in sssp's)
    src = min(short)
    assert wide == short - {src}


def test_mutual_top1_pairs_are_reciprocal_maxima(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["mutual_top1_pairs"](spark, SF).collect()
    # each supplier appears in at most one pair
    seen = []
    for r in rows:
        seen += [r["a"], r["b"]]
        assert r["a"] < r["b"] and r["shared_parts"] > 0
    assert len(seen) == len(set(seen))
    # recompute adjacency max weight per endpoint: the pair weight must
    # equal BOTH endpoints' maximum adjacent weight
    li = load_table(spark, "lineitem", SF)
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    wu = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("x"), F.col("b.s").alias("y"))
        .agg(F.count("*").alias("w"))
        .collect()
    )
    best = {}
    for r in wu:
        for u in (r["x"], r["y"]):
            best[u] = max(best.get(u, 0), r["w"])
    for r in rows:
        assert r["shared_parts"] == best[r["a"]] == best[r["b"]]


def test_conversion_lag_monotone(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    r = QUERIES["conversion_lag"](spark, SF).collect()[0]
    assert r["n_converted"] > 0
    assert 0 <= r["p25_days"] <= r["p50_days"] <= r["p75_days"] <= r["p90_days"]


# ------------------- onion layers / token entropy / PR residuals


def test_onion_layers_k4_with_tail(spark):
    # K4 on {1,2,3,4} plus tail 4-5-6: peel removes 6 (layer 1, k=1),
    # then 5 (layer 2, k=1), then the whole K4 at once (layer 3, k=3)
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = {r["id"]: (r["layer"], r["core"]) for r in pregel.onion_layers(e).collect()}
    assert got == {
        6: (1, 1),
        5: (2, 1),
        1: (3, 3),
        2: (3, 3),
        3: (3, 3),
        4: (3, 3),
    }


def test_onion_layers_refine_coreness(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["onion_layers"](spark, SF).collect()
    assert rows, "peel assigned no vertices"
    # every vertex assigned exactly once; core is non-decreasing in layer
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))
    by_layer = sorted({(r["layer"], r["core"]) for r in rows})
    cores = [c for _, c in by_layer]
    assert cores == sorted(cores)
    # cross-check coreness against the H-index fixpoint operator on
    # the same bounded co-order graph
    from polar_spark.operators.analytics_queries import load_table

    li = load_table(spark, "lineitem", SF)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .where(F.col("l_partkey") < 400)
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    core_df, _ = pregel.core_numbers(und)
    core_ref = {r["id"]: r["core"] for r in core_df.collect()}
    assert set(core_ref) == set(ids)
    for r in rows:
        assert r["core"] == core_ref[r["id"]]


def test_token_entropy_bounds(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    for r in QUERIES["token_entropy"](spark, SF).collect():
        assert r["n_tokens"] >= r["vocab"] >= 1
        assert -1e-6 <= r["entropy_r"] <= math.log(r["vocab"]) + 1e-6


def test_pagerank_residuals_contract(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = sorted(
        QUERIES["pagerank_residuals6"](spark, SF).collect(), key=lambda r: r["iter"]
    )
    assert [r["iter"] for r in rows] == [1, 2, 3, 4, 5, 6]
    res = [r["residual_r"] for r in rows]
    assert all(v > 0 for v in res)
    # power iteration is an 0.85-contraction in L1 on this stochastic
    # update; rounding at 6 dp motivates the epsilon
    for a, b in zip(res, res[1:]):
        assert b <= 0.85 * a + 1e-5


# ------------------------------------------------- truss communities


def test_truss_components_two_k4s_bridge(spark):
    # two K4s joined by one bridge edge: the 4-truss drops the bridge
    # (0 triangles) and keeps both K4s (support 2 each), so CC over the
    # surviving edges yields TWO communities where plain CC yields one.
    k4a = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    k4b = [(11, 12), (11, 13), (11, 14), (12, 13), (12, 14), (13, 14)]
    e = _edges(spark, k4a + k4b + [(4, 11)])
    truss, _ = pregel.ktruss(e, k=4)
    comp, _ = pregel.connected_components(truss.select("src", "dst"))
    got = {r["id"]: r["comp"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 11: 11, 12: 11, 13: 11, 14: 11}
    whole, _ = pregel.connected_components(e)
    assert {r["comp"] for r in whole.collect()} == {1}


def test_truss_components_query_min_id_property(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["truss_components"](spark, SF).collect()
    by_comp: dict[int, list[int]] = {}
    for r in rows:
        by_comp.setdefault(r["comp"], []).append(r["id"])
    for comp, ids in by_comp.items():
        assert comp == min(ids)


# ------------------------------------------------- structural roles


def test_struct_roles_golden_recompute(spark):
    """Exact pandas recompute of every feature + role bucket at sf0.001."""
    from polar_spark.operators.analytics_queries import QUERIES, coorder_edges

    rows = QUERIES["struct_roles"](spark, SF).collect()
    und = [
        (r["src"], r["dst"])
        for r in coorder_edges(spark, SF)
        .where((F.col("src") < 400) & (F.col("dst") < 400))
        .collect()
    ]
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    # each triangle increments each of its corners exactly once: corner c
    # is found as the common neighbor of the opposite edge (a, b)
    for a, b in und:
        for c in adj[a] & adj[b]:
            tri[c] += 1
    golden = {
        v: (
            len(adj[v]),
            sum(len(adj[u]) for u in adj[v]),
            tri[v],
        )
        for v in adj
    }
    assert len(rows) == len(golden)
    for r in rows:
        d, s, t = golden[r["id"]]
        assert (r["deg"], r["nbr_deg_sum"], r["tri"]) == (d, s, t)
        assert r["role_d"] == d.bit_length() - 1
        assert r["role_s"] == (s + 1).bit_length() - 1
        assert r["role_t"] == (t + 1).bit_length() - 1


# ------------------------------------------------- per-group OLS


def test_ols_price_qty_golden_numpy(spark):
    import numpy as np

    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = {r["n_name"]: r for r in QUERIES["ols_price_qty"](spark, SF).collect()}
    li = load_table(spark, "lineitem", SF).select(
        "l_suppkey", "l_quantity", "l_extendedprice"
    ).toPandas()
    sup = load_table(spark, "supplier", SF).select("s_suppkey", "s_nationkey").toPandas()
    nat = load_table(spark, "nation", SF).select("n_nationkey", "n_name").toPandas()
    df = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    df["x"] = df["l_quantity"].astype("int64")
    df["y"] = (df["l_extendedprice"] * 100).round().astype("int64")
    n_total = 0
    for name, g in df.groupby("n_name"):
        r = rows[name]
        x, y = g["x"].to_numpy(float), g["y"].to_numpy(float)
        slope, intercept = np.polyfit(x, y, 1)
        assert r["n_rows"] == len(g)
        assert abs(r["slope_r"] - slope) < 1e-4
        assert abs(r["intercept_r"] - intercept) < 1e-2  # cents scale
        cc = np.corrcoef(x, y)[0, 1]
        assert abs(r["r2_r"] - cc * cc) < 1e-6
        assert 0.0 <= r["r2_r"] <= 1.0
        n_total += len(g)
    assert n_total == len(df)


# ------------------------------------------------- chi-square terms


def test_chi2_terms_golden_recompute(spark):
    """Exact python recompute of the 2x2 chi-square + top-5 selection."""
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["chi2_terms"](spark, SF).collect()
    docs = load_table(spark, "documents", SF).select("doc_id", "source", "text").collect()
    nd = len(docs)
    ns: dict[str, int] = {}
    a_cnt: dict[tuple[str, str], int] = {}
    df_cnt: dict[str, int] = {}
    for r in docs:
        ns[r["source"]] = ns.get(r["source"], 0) + 1
        for w in set(r["text"].strip().lower().split()):
            a_cnt[(r["source"], w)] = a_cnt.get((r["source"], w), 0) + 1
            df_cnt[w] = df_cnt.get(w, 0) + 1
    golden: dict[str, list[tuple[float, str, int, int]]] = {}
    for (src, w), a in a_cnt.items():
        df = df_cnt[w]
        if df < 5 or df >= nd:
            continue
        adnd = float(a * nd - ns[src] * df)
        chi2 = round(
            nd * adnd * adnd / (ns[src] * (nd - ns[src]) * df * (nd - df)), 6
        )
        golden.setdefault(src, []).append((chi2, w, a, df))
    for src, lst in golden.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
    for r in rows:
        chi2, w, a, df = golden[r["source"]][r["rnk"] - 1]
        assert (r["term"], r["a"], r["df"]) == (w, a, df)
        assert abs(r["chi2_r"] - chi2) < 1e-9
    assert len(rows) == sum(min(5, len(v)) for v in golden.values())


# ------------------------------------------------- rank correlation


def test_rank_corr_golden_recompute(spark):
    from polar_spark.operators.analytics_queries import (
        DAMPING,
        QUERIES,
        _sym,
        coorder_edges,
    )

    row = QUERIES["rank_corr"](spark, SF).collect()[0]
    und = coorder_edges(spark, SF).where((F.col("src") < 400) & (F.col("dst") < 400))
    e = _sym(und)
    pr = {
        r["id"]: round(r["rank"], 6)
        for r in pregel.pagerank_fixed(e, n_iter=5, damping=DAMPING).collect()
    }
    deg: dict[int, int] = {}
    for r in e.collect():
        deg[r["src"]] = deg.get(r["src"], 0) + 1
    top = sorted(deg, key=lambda v: (-deg[v], v))[:100]
    rd = {v: i + 1 for i, v in enumerate(top)}
    by_pr = sorted(top, key=lambda v: (-pr[v], v))
    rp = {v: i + 1 for i, v in enumerate(by_pr)}
    n = len(top)
    sum_d2 = sum((rd[v] - rp[v]) ** 2 for v in top)
    conc = disc = 0
    for i, u in enumerate(top):
        for v in top[i + 1 :]:
            if rp[u] < rp[v]:
                conc += 1
            else:
                disc += 1
    assert (row["n"], row["sum_d2"]) == (n, sum_d2)
    assert (row["concordant"], row["discordant"]) == (conc, disc)
    assert row["concordant"] + row["discordant"] == n * (n - 1) // 2
    assert abs(row["spearman_r"] - round(1 - 6 * sum_d2 / (n * (n * n - 1)), 6)) < 1e-9
    assert abs(row["kendall_r"] - round((conc - disc) / (n * (n - 1) / 2), 6)) < 1e-9
    # degree should positively predict PageRank on this graph
    assert row["spearman_r"] > 0.5 and row["kendall_r"] > 0.3


# ------------------------------------------------- Steiner 2-approx


def test_steiner_closure_mst_hand_graph(spark):
    """Star + detour: terminals {1,2,3,4} around hub 10.  Closure
    distances via the hub are 1-10 (1), 2-10 (2), 3-10 (3), 4-10 (10);
    the direct edge 3-4 (4) beats the 13-long hub path, so the closure
    MST must pick it over the 4-10 leg."""
    e_dir = [
        (1, 10, 1), (2, 10, 2), (3, 10, 3), (4, 10, 10), (3, 4, 4),
    ]
    e = spark.createDataFrame(
        e_dir + [(b, a, w) for a, b, w in e_dir], "src long, dst long, w long"
    )
    d, _ = pregel.sssp_per_source(e, [1, 2, 3, 4])
    closure = (
        d.where(F.col("id").isin([1, 2, 3, 4]))
        .where(F.col("source") < F.col("id"))
        .select(F.col("source").alias("src"), F.col("id").alias("dst"), F.col("dist").alias("w"))
    )
    got_closure = {(r["src"], r["dst"]): r["w"] for r in closure.collect()}
    assert got_closure == {
        (1, 2): 3, (1, 3): 4, (1, 4): 8, (2, 3): 5, (2, 4): 9, (3, 4): 4,
    }
    mst, _ = pregel.minimum_spanning_forest(closure)
    got = sorted((r["u"], r["v"], r["w"]) for r in mst.collect())
    assert got == [(1, 2, 3), (1, 3, 4), (3, 4, 4)]
    # 2-approx bound vs the true Steiner tree (hub star 1+2+3+4... the
    # optimum connects via 10 and the 3-4 edge: 1+2+3+4 = 10)
    assert sum(w for _, _, w in got) <= 2 * 10


def test_steiner_tree4_query_contract(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["steiner_tree4"](spark, SF).collect()
    assert len(rows) == 3
    # spanning tree of the 4 terminals: touches exactly 4 distinct ids
    ids = {r["u"] for r in rows} | {r["v"] for r in rows}
    assert len(ids) == 4
    assert all(r["w"] > 0 for r in rows)


# ------------------------------------------------- PCA power iteration


def test_pca_power3_golden_numpy(spark):
    import numpy as np

    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["pca_power3"](spark, SF).collect()
    emb = np.array(
        [r["embedding"] for r in load_table(spark, "embeddings", SF).collect()],
        dtype=np.float64,
    )
    n, d = emb.shape
    c = np.round(np.cov(emb, rowvar=False, ddof=1), 6)
    x = np.ones(d)
    for _ in range(3):
        y = c @ x
        x = y / np.sqrt((y * y).sum())
    assert len(rows) == d
    for r in rows:
        assert abs(r["loading_r"] - x[r["dim"]]) < 1e-5
    ray = float(x @ (c @ x))
    assert abs(rows[0]["eig_r"] - ray) < 1e-4
    lam_max = float(np.linalg.eigvalsh(c)[-1])
    assert rows[0]["eig_r"] <= lam_max + 1e-6


# ------------------------------------------------- odd closed walks


def test_odd_closed_walks_hand_graphs(spark):
    # triangle 1-2-3 + pendant 4 off vertex 3 + disjoint C4 (bipartite)
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11), (11, 12), (12, 13), (13, 10)],
    )
    out, _ = pregel.odd_closed_walks(e, max_len=9)
    got = {r["id"]: r["odd_len"] for r in out.collect()}
    # triangle vertices: odd walk 3; pendant 4: down to the triangle and
    # back = 2 + 3 = 5; C4 vertices are bipartite -> absent
    assert got == {1: 3, 2: 3, 3: 3, 4: 5}


def test_odd_closed_walks_c5(spark):
    # C5: every vertex lies on the 5-cycle -> odd_len 5 everywhere
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)])
    out, _ = pregel.odd_closed_walks(e, max_len=9)
    assert {r["odd_len"] for r in out.collect()} == {5}
    assert out.count() == 5


# ------------------------------------------------- CUSUM


def test_cusum_hourly_golden_recompute(spark):
    """Sequential max(0, S+a) recurrence must equal the prefix form."""
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["cusum_hourly"](spark, SF).collect()
    ev = load_table(spark, "events", SF).select(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).groupBy("hour").count().orderBy("hour").collect()
    xs = [r["count"] for r in ev]
    nh, total = len(xs), sum(xs)
    s = 0
    golden = []
    for x in xs:
        s = max(0, s + nh * x - total)
        golden.append(s)
    assert len(rows) == nh
    for r, g in zip(rows, golden):
        assert r["cusum_scaled"] == g
        assert r["alarm"] == (1 if g > 5 * total else 0)
    # drift-free deviations sum to zero -> the statistic returns to 0
    assert any(g == 0 for g in golden)


# ------------------------------------------------- RAKE keyphrases


def test_rake_top10_golden_recompute(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["rake_top10"](spark, SF).collect()
    docs = load_table(spark, "documents", SF).select("text").collect()
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    pcount: dict[str, int] = {}
    for r in docs:
        toks = r["text"].strip().lower().split()
        phrase: list[str] = []
        segments = []
        for w in toks:
            if w in ("the", "a"):
                segments.append(phrase)
                phrase = []
            else:
                phrase.append(w)
        segments.append(phrase)
        for ph in segments:
            if not 1 <= len(ph) <= 4:
                continue
            pcount[" ".join(ph)] = pcount.get(" ".join(ph), 0) + 1
            for w in ph:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ph)
    scored = sorted(
        (
            (round(sum(deg[w] / freq[w] for w in p.split()), 6), p, n)
            for p, n in pcount.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    assert len(rows) == 10
    for r in rows:
        s, p, n = scored[r["rnk"] - 1]
        assert (r["phrase"], r["n"]) == (p, n)
        assert abs(r["score_r"] - s) < 1e-9


# ------------------------------------------------- SNN clustering


def test_snn_clusters_golden_recompute(spark):
    import numpy as np

    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = {r["vec_id"]: r["cluster"] for r in QUERIES["snn_clusters"](spark, SF).collect()}
    recs = load_table(spark, "embeddings", SF).select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in recs]
    m = np.array([r["embedding"] for r in recs], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(m @ m.T, 7)
    knn: dict[int, set[int]] = {}
    for i, vid in enumerate(ids):
        order = sorted(
            ((-(cos[i, j]), ids[j]) for j in range(len(ids)) if j != i)
        )[:5]
        knn[vid] = {nid for _, nid in order}
    edges = set()
    for u in ids:
        for v in knn[u]:
            if u < v and u in knn.get(v, set()) and len(knn[u] & knn[v]) >= 2:
                edges.add((u, v))
    parent = {u: u for e in edges for u in e}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    golden = {u: find(u) for u in parent}
    assert rows == golden
    for vid, c in rows.items():
        assert c <= vid


# ------------------------------------------------- Molloy-Reed


def test_molloy_reed_golden_recompute(spark):
    from polar_spark.operators.analytics_queries import QUERIES, _sym, coorder_edges

    row = QUERIES["molloy_reed"](spark, SF).collect()[0]
    deg: dict[int, int] = {}
    for r in _sym(coorder_edges(spark, SF)).collect():
        deg[r["src"]] = deg.get(r["src"], 0) + 1
    n = len(deg)
    sd = sum(deg.values())
    sd2 = sum(d * d for d in deg.values())
    kappa = sd2 / sd
    assert (row["n"], row["m"], row["sum_d2"]) == (n, sd // 2, sd2)
    assert abs(row["kappa_r"] - round(kappa, 6)) < 1e-9
    assert abs(row["fc_r"] - round(1 - 1 / (kappa - 1), 6)) < 1e-9
    # the co-order graph has a giant component -> criterion holds
    assert row["kappa_r"] > 2.0 and 0.0 < row["fc_r"] < 1.0


# ------------------------------------------------- DC-SBM likelihood


def test_sbm_likelihood_golden_recompute(spark):
    import math

    from polar_spark.operators.analytics_queries import QUERIES, _sym, coorder_edges

    row = QUERIES["sbm_likelihood"](spark, SF).collect()[0]
    und = coorder_edges(spark, SF)
    labels = {
        r["id"]: r["label"]
        for r in pregel.label_propagation(und, max_iter=2)[0].collect()
    }
    mrs: dict[tuple[int, int], int] = {}
    kap: dict[int, int] = {}
    for r in _sym(und).collect():
        a, b = labels[r["src"]], labels[r["dst"]]
        mrs[(a, b)] = mrs.get((a, b), 0) + 1
        kap[a] = kap.get(a, 0) + 1
    ll = sum(m * math.log(m / (kap[a] * kap[b])) for (a, b), m in mrs.items())
    assert row["n_block_pairs"] == len(mrs)
    assert row["m2"] == sum(mrs.values())
    assert abs(row["loglik_r"] - round(ll, 4)) < 1e-6
    # the block structure must beat the single-block null (ll = m2·ln(1/m2)
    # when every edge is in one block of kappa = m2)
    m2 = sum(mrs.values())
    assert row["loglik_r"] > round(m2 * math.log(1 / m2), 4)


# ------------------------------------------------- ERR@10


def test_err_eval_cascade_properties(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["err_eval"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # ERR is bounded by the all-relevant-from-rank-1 cascade:
        # sum(0.5^k / k for k = 1..10) and by 0 below
        # 5e-7: err_r is rounded at 6 dp, so a saturated cascade can sit
        # half an ulp-of-rounding above the exact bound
        assert 0.0 <= r["err_r"] <= sum(0.5**k / k for k in range(1, 11)) + 5e-7
        if r["hits10"] == 0:
            assert r["err_r"] == 0.0
        else:
            # a single hit at rank 10 is the weakest nonzero outcome
            assert r["err_r"] >= round(0.5 / 10, 6) - 1e-9


def test_err_eval_agrees_with_mrr_on_first_hit(spark):
    """The first-hit ERR term is exactly 0.5/rank_first = 0.5·RR, so
    ERR ≥ 0.5·(1/rank of first relevant hit) with equality iff there is
    exactly one relevant hit in the top 10."""
    from polar_spark.operators.analytics_queries import QUERIES

    err = {r["query_id"]: r for r in QUERIES["err_eval"](spark, SF).collect()}
    mrr = {r["query_id"]: r for r in QUERIES["mrr_eval"](spark, SF).collect()}
    for qid, r in err.items():
        rr_ppm = mrr[qid]["rr_ppm"]
        if r["hits10"] == 1:
            assert abs(r["err_r"] - 0.5 * rr_ppm / 1e6) < 2e-6
        elif r["hits10"] > 1:
            assert r["err_r"] > 0.5 * rr_ppm / 1e6 - 2e-6


# ------------------------------------------------- 4-node graphlets


def _brute_graphlet4(edges):
    from itertools import combinations

    es = {tuple(sorted(e)) for e in edges}
    vs = sorted({x for e in es for x in e})
    cnt = dict(p4=0, claw=0, paw=0, c4=0, diamond=0, k4=0)
    for quad in combinations(vs, 4):
        sub = [e for e in combinations(quad, 2) if e in es]
        k = len(sub)
        degs = sorted(sum(1 for e in sub if v in e) for v in quad)
        if k == 3:
            if degs == [1, 1, 2, 2]:
                cnt["p4"] += 1
            elif degs == [1, 1, 1, 3]:
                cnt["claw"] += 1
        elif k == 4:
            if degs == [1, 2, 2, 3]:
                cnt["paw"] += 1
            elif degs == [2, 2, 2, 2]:
                cnt["c4"] += 1
        elif k == 5:
            cnt["diamond"] += 1
        elif k == 6:
            cnt["k4"] += 1
    return cnt


def test_four_node_census_vs_bruteforce(spark):
    cases = {
        "C5": [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)],
        "K5": [(a, b) for a in range(1, 6) for b in range(a + 1, 6)],
        "star5": [(0, i) for i in range(1, 6)],
        "paw": [(1, 2), (2, 3), (3, 1), (1, 4)],
        "diamond": [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)],
        "det25": [
            (a, b)
            for a in range(25)
            for b in range(a + 1, 25)
            if (a * 31 + b * 17 + a * b) % 7 < 2
        ],
    }
    for name, es in cases.items():
        got = pregel.four_node_census(_edges(spark, es)).collect()[0]
        want = _brute_graphlet4(es)
        assert (
            got["i_p4"],
            got["i_claw"],
            got["i_paw"],
            got["i_c4"],
            got["i_diamond"],
            got["i_k4"],
        ) == (
            want["p4"],
            want["claw"],
            want["paw"],
            want["c4"],
            want["diamond"],
            want["k4"],
        ), name


def test_graphlet4_census_consistency(spark):
    """Census scalars must agree with the already-verified standalone
    motif queries on their shared substructures."""
    from polar_spark.operators.analytics_queries import QUERIES, coorder_edges

    row = QUERIES["graphlet4_census"](spark, SF).collect()[0]
    und = coorder_edges(spark, SF).where((F.col("src") < 400) & (F.col("dst") < 400))
    assert row["m"] == und.count()
    per_vertex, total = pregel.triangle_count(und)
    assert row["triangles"] == total
    assert all(
        row[k] >= 0
        for k in ("i_p4", "i_claw", "i_paw", "i_c4", "i_diamond", "i_k4")
    )


# ------------------------------------------------- non-backtracking


def test_nbt_centrality_hand_counts(spark):
    """Triangle 1-2-3: from any directed edge there is exactly one
    non-backtracking continuation (go around), so x stays 1 on all 6
    directed edges for every round -> nbt3(v) = 2 per vertex.  Path
    1-2-3: every length-3 walk must backtrack -> all zero (vertices
    absent from the non-empty x3 sums)."""
    from polar_spark.operators.analytics_queries import QUERIES  # noqa: F401

    def nbt3(pairs):
        e = _edges(spark, pairs)
        sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        x = sym.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1).cast("long").alias("x"))
        for _ in range(3):
            x = (
                x.join(sym.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v")
                .where(F.col("w") != F.col("u"))
                .groupBy(F.col("v").alias("u"), F.col("w").alias("v"))
                .agg(F.sum("x").cast("long").alias("x"))
            )
        return {
            r["v"]: r["s"]
            for r in x.groupBy("v").agg(F.sum("x").alias("s")).collect()
        }

    assert nbt3([(1, 2), (2, 3), (3, 1)]) == {1: 2, 2: 2, 3: 2}
    assert nbt3([(1, 2), (2, 3)]) == {}
    # C4: one continuation per step, never closes within 3 -> x stays 1,
    # every vertex receives 2 incoming directed edges
    assert nbt3([(1, 2), (2, 3), (3, 4), (4, 1)]) == {1: 2, 2: 2, 3: 2, 4: 2}


def test_forman_curvature_hand_values(spark):
    """Star K1,3: every edge has d_u=3, d_v=1, t=0 -> curv 0; triangle:
    d=2,2,t=1 -> curv 4-2-2+3 = 3."""
    from polar_spark.operators.analytics_queries import _sym  # noqa: F401

    def curv_hist(pairs):
        # canonical src < dst edges, as coorder_edges produces
        und = _edges(spark, pairs)
        sym = und.unionByName(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        deg = sym.groupBy("src").agg(F.count("*").alias("d"))
        ab = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        bc = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        ac = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        tri = ab.join(bc, "b").join(ac, ["a", "c"])
        sup = (
            tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
            .unionAll(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
            .groupBy("src", "dst").agg(F.count("*").alias("t"))
        )
        rows = (
            und.join(sup, ["src", "dst"], "left")
            .join(deg.select(F.col("src"), F.col("d").alias("du")), "src")
            .join(deg.select(F.col("src").alias("dst"), F.col("d").alias("dv")), "dst")
            .select((F.lit(4) - F.col("du") - F.col("dv") + F.lit(3) * F.coalesce(F.col("t"), F.lit(0))).alias("curv"))
            .collect()
        )
        out: dict[int, int] = {}
        for r in rows:
            out[r["curv"]] = out.get(r["curv"], 0) + 1
        return out

    assert curv_hist([(0, 1), (0, 2), (0, 3)]) == {0: 3}
    assert curv_hist([(1, 2), (2, 3), (1, 3)]) == {3: 3}
    # triangle + pendant on 1: edge (1,4): 4-3-1+0 = 0; edges (1,2),(1,3):
    # 4-3-2+3 = 2; edge (2,3): 4-2-2+3 = 3
    assert curv_hist([(1, 2), (2, 3), (1, 3), (1, 4)]) == {0: 1, 2: 2, 3: 1}


# ------------------------------------------------- local bridges


def test_local_bridges_hand_graphs(spark):
    # two triangles joined by one edge (3,4): that edge has no common
    # neighbor -> local bridge; removing it leaves 3 and 4 disconnected
    # -> span -1.  Triangle edges are embedded (support 1) -> not bridges.
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)])
    out, _ = pregel.local_bridges(e, max_span=8)
    assert [(r["u"], r["v"], r["span"]) for r in out.collect()] == [(3, 4, -1)]

    # C5: every edge is a local bridge (no triangles) with span 4
    # (the detour around the cycle)
    c5 = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)])
    out5, _ = pregel.local_bridges(c5, max_span=8)
    rows5 = sorted((r["u"], r["v"], r["span"]) for r in out5.collect())
    assert len(rows5) == 5 and all(s == 4 for _, _, s in rows5)

    # C5 with max_span 3: the detour exceeds the cap -> -1 everywhere
    out5c, _ = pregel.local_bridges(c5, max_span=3)
    assert all(r["span"] == -1 for r in out5c.collect())


def test_local_bridges_span_at_least_three(spark):
    """By definition a local bridge's span is >= 3 when finite: span 2
    would mean a common neighbor (not a bridge); span 1 would mean a
    parallel edge."""
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["local_bridges"](spark, "/root/testdata/sf0.01").collect()
    assert rows, "sf0.01 bounded co-order graph should have bridges"
    for r in rows:
        assert r["span"] == -1 or r["span"] >= 3


# ------------------------------------------------- 2-edge-connected


def test_two_edge_cc_hand_graph(spark):
    """Two triangles joined by a bridge: the bridge is a cut edge, so
    the 2ecc partition separates the triangles; a C4 joined by TWO
    parallel-ish paths stays one component."""
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)])
    lb, stats = pregel.local_bridges(e, max_span=40)
    assert stats.converged
    bridges = {(r["u"], r["v"]) for r in lb.where(F.col("span") == -1).collect()}
    assert bridges == {(3, 4)}
    # C5 has local bridges (span 4) but NO cut edges -> one 2ecc
    c5 = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)])
    lb5, _ = pregel.local_bridges(c5, max_span=40)
    assert lb5.where(F.col("span") == -1).count() == 0


def test_two_edge_cc_query_partition(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["two_edge_cc"](spark, SF).collect()
    comp = {r["id"]: r["comp"] for r in rows}
    # rep is the component minimum
    by_comp: dict[int, list[int]] = {}
    for v, c in comp.items():
        by_comp.setdefault(c, []).append(v)
    for c, vs in by_comp.items():
        assert c == min(vs)


# ------------------------------------------------- packing curve


def test_packing_curve_monotonicity(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = sorted(
        QUERIES["packing_curve"](spark, SF).collect(), key=lambda r: r["seq_len"]
    )
    assert [r["seq_len"] for r in rows] == [128, 512, 2048, 8192]
    st = {r["seq_len"]: r for r in rows}
    stream = rows[0]["stream_tokens"]
    for r in rows:
        assert r["stream_tokens"] == stream
        assert r["n_seqs"] == -(-stream // r["seq_len"])
        assert r["tail_waste"] == r["n_seqs"] * r["seq_len"] - stream
        assert 0 <= r["split_ppm"] <= 1_000_000
    # longer contexts split MORE docs (boundaries are rarer but docs
    # are small): split count must be non-increasing with seq_len
    assert st[128]["n_split"] >= st[512]["n_split"] >= st[2048]["n_split"] >= st[8192]["n_split"]


# ------------------------------------------------- DBSCAN*


def test_dbscan_star_golden_recompute(spark):
    import numpy as np

    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = {r["vec_id"]: r["cluster"] for r in QUERIES["dbscan_star"](spark, SF).collect()}
    recs = load_table(spark, "embeddings", SF).select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in recs]
    m = np.array([r["embedding"] for r in recs], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    d = np.round(1.0 - m @ m.T, 7)
    core = set()
    for i, vid in enumerate(ids):
        ds = sorted((d[i, j], ids[j]) for j in range(len(ids)) if j != i)
        if ds[3][0] <= 0.68:
            core.add(vid)
    idx = {v: i for i, v in enumerate(ids)}
    parent = {v: v for v in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cl = sorted(core)
    for i, u in enumerate(cl):
        for v in cl[i + 1 :]:
            if d[idx[u], idx[v]] <= 0.68:
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
    golden = {v: (find(v) if v in core else -1) for v in ids}
    assert rows == golden
    n_clusters = len({c for c in rows.values() if c != -1})
    assert n_clusters >= 2, "eps chosen to be non-degenerate"
    assert any(c == -1 for c in rows.values()), "noise must exist"


# ------------------------------------------------- absorbing funnel


def test_absorb_funnel_golden_recompute(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = {r["state"]: r["p_purchase_r"] for r in QUERIES["absorb_funnel6"](spark, SF).collect()}
    ev = sorted(
        load_table(spark, "events", SF)
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    cnt: dict[tuple[str, str], int] = {}
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"]:
            cnt[(a["event_type"], b["event_type"])] = cnt.get(
                (a["event_type"], b["event_type"]), 0
            ) + 1
    tot: dict[str, int] = {}
    for (s, _t), n in cnt.items():
        tot[s] = tot.get(s, 0) + n
    states = sorted(tot)
    pin = lambda st, x: 1.0 if st == "purchase" else (0.0 if st == "error" else x)  # noqa: E731
    v = {s: pin(s, 0.0) for s in states}
    for _ in range(6):
        nv = {}
        for s in states:
            nv[s] = pin(
                s,
                sum(
                    (n / tot[s]) * v.get(t, 0.0)
                    for (s2, t), n in cnt.items()
                    if s2 == s
                ),
            )
        v = nv
    assert set(rows) == set(states)
    for s in states:
        assert abs(rows[s] - round(v[s], 6)) < 1e-9
    assert rows["purchase"] == 1.0 and rows["error"] == 0.0
    for s in ("view", "click", "signup"):
        assert 0.0 < rows[s] < 1.0


def test_event_trigrams_top_golden(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["event_trigrams_top"](spark, SF).collect()
    ev = sorted(
        load_table(spark, "events", SF)
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    cnt: dict[tuple[str, str, str], int] = {}
    for a, b, c in zip(ev, ev[1:], ev[2:]):
        if a["user_id"] == b["user_id"] == c["user_id"]:
            k = (a["event_type"], b["event_type"], c["event_type"])
            cnt[k] = cnt.get(k, 0) + 1
    golden = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [((r["t1"], r["t2"], r["t3"]), r["n"]) for r in rows] == golden


# ------------------------------------------------- subgraph centrality


def test_subgraph_centrality_matrix_golden(spark):
    import numpy as np

    from polar_spark.operators.analytics_queries import QUERIES, coorder_edges

    rows = {r["id"]: r["sc24"] for r in QUERIES["subgraph_centrality4"](spark, SF).collect()}
    und = [
        (r["src"], r["dst"])
        for r in coorder_edges(spark, SF)
        .where((F.col("src") < 400) & (F.col("dst") < 400))
        .collect()
    ]
    ids = sorted({x for e in und for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    a = np.zeros((len(ids), len(ids)), dtype=np.int64)
    for u, v in und:
        a[idx[u], idx[v]] = a[idx[v], idx[u]] = 1
    a2 = a @ a
    a3 = a2 @ a
    a4 = a3 @ a
    assert set(rows) == set(ids)
    for v in ids:
        i = idx[v]
        want = 24 + 12 * a2[i, i] + 4 * a3[i, i] + a4[i, i]
        assert rows[v] == want


# ------------------------------------------------- graph center


def test_graph_center_path_and_star(spark):
    from polar_spark.plans import pregel as pg

    # P5: eccentricities 4,3,2,3,4 -> radius 2 (center = middle), diam 4
    p5 = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    sym = p5.unionByName(p5.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    dist, _ = pg.bfs_per_source(sym, [1, 2, 3, 4, 5], max_depth=30)
    ecc = {
        r["id"]: r["ecc"]
        for r in dist.groupBy(F.col("source").alias("id"))
        .agg(F.max("dist").alias("ecc"))
        .collect()
    }
    assert ecc == {1: 4, 2: 3, 3: 2, 4: 3, 5: 4}


def test_graph_center_query_invariants(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["graph_center"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["radius"] <= r["ecc"] <= r["diameter"]
        assert r["diameter"] <= 2 * r["radius"]  # metric bound per component
        assert r["is_center"] == (1 if r["ecc"] == r["radius"] else 0)
    # at least one center per component
    comps = {r["comp"] for r in rows}
    centers = {r["comp"] for r in rows if r["is_center"]}
    assert comps == centers


# ------------------------------------------------- kNN hubness


def test_knn_hubness_conservation(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = QUERIES["knn_hubness"](spark, SF).collect()
    n_vecs = load_table(spark, "embeddings", SF).count()
    assert sum(r["n_vecs"] for r in rows) == n_vecs
    # every vector emits exactly 5 edges -> total in-degree = 5n
    assert sum(r["indeg"] * r["n_vecs"] for r in rows) == 5 * n_vecs
    # hubness: in high-d some vector exceeds k (measured on this corpus)
    assert max(r["indeg"] for r in rows) > 5


def test_embed_isotropy_golden_numpy(spark):
    import numpy as np

    from polar_spark.operators.analytics_queries import QUERIES, load_table

    row = QUERIES["embed_isotropy"](spark, SF).collect()[0]
    m = np.array(
        [r["embedding"] for r in load_table(spark, "embeddings", SF).collect()],
        dtype=np.float64,
    )
    norms = np.linalg.norm(m, axis=1)
    mh = m / norms[:, None]
    n = len(m)
    cos = mh @ mh.T
    avg_pair = (cos.sum() - n) / (n * (n - 1))
    assert row["n"] == n
    assert abs(row["mean_norm_r"] - norms.mean()) < 1e-5
    assert abs(row["avg_cos_r"] - avg_pair) < 1e-5
    assert -1.0 <= row["avg_cos_r"] <= 1.0


# ------------------------------------------------- interval overlap


def test_interval_overlaps_golden_recompute(spark):
    from polar_spark.operators.analytics_queries import QUERIES, load_table

    rows = {r["r_name"]: r for r in QUERIES["interval_overlaps"](spark, SF).collect()}
    li = load_table(spark, "lineitem", SF).select("l_suppkey", "l_shipdate").collect()
    sup = {r["s_suppkey"]: r["s_nationkey"] for r in load_table(spark, "supplier", SF).collect()}
    nat = {r["n_nationkey"]: r["n_regionkey"] for r in load_table(spark, "nation", SF).collect()}
    reg = {r["r_regionkey"]: r["r_name"] for r in load_table(spark, "region", SF).collect()}
    win: dict[int, list] = {}
    for r in li:
        w = win.setdefault(r["l_suppkey"], [r["l_shipdate"], r["l_shipdate"]])
        w[0] = min(w[0], r["l_shipdate"])
        w[1] = max(w[1], r["l_shipdate"])
    by_reg: dict[str, list[tuple[int, object, object]]] = {}
    for sk, (lo, hi) in win.items():
        by_reg.setdefault(reg[nat[sup[sk]]], []).append((sk, lo, hi))
    for rname, lst in by_reg.items():
        lst.sort()
        pairs = overlaps = 0
        for i, (sa, la, ha) in enumerate(lst):
            for sb, lb, hb in lst[i + 1 :]:
                pairs += 1
                if la <= hb and lb <= ha:
                    overlaps += 1
        if pairs:
            assert (rows[rname]["n_pairs"], rows[rname]["n_overlap"]) == (pairs, overlaps)


def test_dq_report_clean_dataset(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = {r["check_name"]: r["n_bad"] for r in QUERIES["dq_report"](spark, SF).collect()}
    # the synthetic dataset is referentially clean; row counts positive
    assert rows["rows_lineitem"] > 0 and rows["rows_orders"] > 0
    # genuine data properties of the synthetic generator (measured at
    # sf0.001: 1161 dup (orderkey, linenumber) pairs, 2815 lineitems
    # shipped before their order date) — the report SURFACES them;
    # everything referential must be clean
    findings = {"dup_lineitem_pk", "ship_before_order"}
    for k, v in rows.items():
        if not k.startswith("rows_") and k not in findings:
            assert v == 0, (k, v)
    assert rows["dup_lineitem_pk"] > 0 and rows["ship_before_order"] > 0


# ------------------------------------------------- Kneser-Ney bigram LM


def _kn_corpus_stats(spark):
    """Corpus-level KN inputs recomputed in pure python at sf0.001."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, trim(text) AS t FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    import re

    docs = {d: re.split(r"\s+", t) for d, t in rows}
    cb: dict[tuple[str, str], int] = {}
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
    cw1: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1b: dict[str, int] = {}
    for (a, b), c in cb.items():
        cw1[a] = cw1.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    return docs, cb, cw1, n1f, n1b, len(cb)


def test_kn_bigram_distribution_sums_to_one(spark):
    """Interpolated KN is a proper conditional distribution: summed over
    the full continuation vocabulary it must give exactly 1 per context."""
    _, cb, cw1, n1f, n1b, nt = _kn_corpus_stats(spark)
    vocab = set(n1b)
    for w1 in list(cw1)[:5]:
        total = sum(
            (
                max(cb.get((w1, w2), 0) - 0.75, 0.0)
                + 0.75 * n1f[w1] * (n1b[w2] / nt)
            )
            / cw1[w1]
            for w2 in vocab
        )
        assert abs(total - 1.0) < 1e-9


def test_kn_bigram_ppl_golden_recompute(spark):
    import math

    from polar_spark.operators.analytics_queries import QUERIES

    out = {
        r["doc_id"]: r
        for r in QUERIES["kn_bigram_ppl"](spark, SF).where(F.col("doc_id") < 10).collect()
    }
    docs, cb, cw1, n1f, n1b, nt = _kn_corpus_stats(spark)
    for doc_id in list(out)[:10]:
        toks = docs[doc_id]
        ll = 0
        n = 0
        for a, b in zip(toks, toks[1:]):
            p = (
                max(cb[(a, b)] - 0.75, 0.0) + 0.75 * n1f[a] * (n1b[b] / nt)
            ) / cw1[a]
            ll += math.floor(1e6 * math.log(p))
            n += 1
        row = out[doc_id]
        assert row["n_bigrams"] == n
        # per-term floors replayed in python can differ by a ulp on the
        # ln boundary; bound the accumulated drift, then check the ppl
        assert abs(row["ll_scaled"] - ll) <= n
        assert abs(row["ppl_r"] - round(math.exp(-ll / (1e6 * n)), 4)) < 1e-3
        # KN smoothing of a corpus over its own text: the synthetic corpus
        # is near-uniform over its 31-word vocab, so per-doc ppl sits close
        # to |V| (a doc slightly atypical of the corpus can exceed it)
        assert 1.0 < row["ppl_r"] < 2 * len(n1b)


# ------------------------------------------------- transition entropy


def test_transition_entropy_golden_and_bounds(spark):
    import math

    from polar_spark.operators.analytics_queries import QUERIES

    rows = {r["from_type"]: r for r in QUERIES["transition_entropy"](spark, SF).collect()}
    trans = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in QUERIES["event_transitions"](spark, SF).collect()
    }
    agg: dict[str, dict[str, int]] = {}
    for (a, b), n in trans.items():
        agg.setdefault(a, {})[b] = n
    assert set(rows) == set(agg)
    for x, succ in agg.items():
        nx = sum(succ.values())
        h = math.log(nx) - sum(n * math.log(n) for n in succ.values()) / nx
        row = rows[x]
        assert row["n_x"] == nx and row["n_succ"] == len(succ)
        assert abs(row["h_r"] - round(h, 6)) < 1e-5
        # 0 <= H(x) <= ln(#successors)
        assert -1e-9 <= row["h_r"] <= math.log(len(succ)) + 1e-9


# ------------------------------------------------- Kaplan-Meier survival


def test_kaplan_meier_golden_recompute(spark):
    import math

    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    out = QUERIES["kaplan_meier"](spark, SF).collect()
    rows = duckdb.sql(
        f"SELECT o_custkey, o_orderdate, o_orderkey FROM '{SF}/orders.parquet' "
        "ORDER BY o_custkey, o_orderdate, o_orderkey"
    ).fetchall()
    maxd = max(r[1] for r in rows)
    subjects = []  # (time_days, is_event)
    by_cust: dict[int, list] = {}
    for c, d, k in rows:
        by_cust.setdefault(c, []).append(d)
    for dates in by_cust.values():
        for cur, nxt in zip(dates, dates[1:]):
            subjects.append(((nxt.date() - cur.date()).days, True))
        subjects.append((((maxd.date() - dates[-1].date()).days), False))
    times = sorted({t for t, ev in subjects if ev})
    golden = {}
    s_scaled = 0
    na9 = 0
    dropped = False
    for t in times:
        n_risk = sum(1 for tt, _ in subjects if tt >= t)
        d = sum(1 for tt, ev in subjects if tt == t and ev)
        if d < n_risk:
            s_scaled += math.floor(1e6 * math.log((n_risk - d) / n_risk))
        else:
            dropped = True
        na9 += d * 1000000000 // n_risk
        s = 0.0 if dropped else round(math.exp(s_scaled / 1e6), 6)
        golden[t] = (n_risk, d, na9, s)
    assert len(out) == len(times)
    prev_s = 1.0
    for r in out:
        n_risk, d, na9_g, s = golden[r["t_days"]]
        assert (r["n_risk"], r["d"], r["na9"]) == (n_risk, d, na9_g)
        assert abs(r["s_r"] - s) < 2e-6
        # survival curve is monotone nonincreasing in [0, 1]
        assert 0.0 <= r["s_r"] <= prev_s + 1e-9
        prev_s = r["s_r"]


# ------------------------------------------------- item-item CF


def test_item_cf10_golden_recompute(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    out = QUERIES["item_cf10"](spark, SF).collect()
    baskets = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    by_order: dict[int, set] = {}
    n: dict[int, int] = {}
    for o, p in baskets:
        by_order.setdefault(o, set()).add(p)
        n[p] = n.get(p, 0) + 1
    co: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                co[(a, b)] = co.get((a, b), 0) + 1
    # golden top-10 for the three lowest part ids present in the output
    parts_out: dict[int, list] = {}
    for r in out:
        parts_out.setdefault(r["part"], []).append(r)
    for part in sorted(parts_out)[:3]:
        nbrs = []
        for (a, b), c in co.items():
            if a == part:
                nbrs.append((b, c))
            elif b == part:
                nbrs.append((a, c))
        scored = sorted(
            ((round(c / (n[part] * n[o]) ** 0.5, 6), o, c) for o, c in nbrs),
            key=lambda x: (-x[0], x[1]),
        )[:10]
        got = parts_out[part]
        assert [(r["nbr"], r["co"], r["cos_r"]) for r in sorted(got, key=lambda r: r["rn"])] == [
            (o, c, s) for s, o, c in scored
        ]
    for r in out:
        assert 1 <= r["rn"] <= 10 and 0.0 < r["cos_r"] <= 1.0


# ------------------------------------------------- articulation points


def test_articulation_barbell_and_star(spark):
    # two triangles joined by a path 3-10-4: 3, 10 and 4 are cut vertices
    rep, stats = pregel.articulation_points(
        _edges(
            spark,
            [(1, 2), (2, 3), (1, 3), (3, 10), (10, 4), (4, 5), (5, 6), (4, 6)],
        )
    )
    rows = {r["id"]: r for r in rep.collect()}
    assert stats.converged
    assert {v for v, r in rows.items() if r["is_articulation"]} == {3, 10, 4}
    # interior triangle vertices reach all their neighbors
    assert rows[1]["reached_nbrs"] == rows[1]["n_nbrs"] == 2


def test_articulation_cycle_and_star(spark):
    # C4: no articulation; star K1,3: the hub is one
    rep, _ = pregel.articulation_points(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (20, 21), (20, 22), (20, 23)])
    )
    rows = {r["id"]: r["is_articulation"] for r in rep.collect()}
    assert rows == {1: False, 2: False, 3: False, 4: False, 20: True}


def test_articulation_python_replay(spark):
    from collections import defaultdict, deque

    from polar_spark.operators.analytics_queries import QUERIES, _w2_backbone

    out = {r["id"]: r for r in QUERIES["articulation_pts"](spark, SF).collect()}
    adj = defaultdict(set)
    for r in _w2_backbone(spark, SF).collect():
        adj[r["src"]].add(r["dst"])
        adj[r["dst"]].add(r["src"])
    for v, nbrs in adj.items():
        if len(nbrs) < 2:
            assert v not in out
            continue
        x0 = min(nbrs)
        seen = {x0}
        q = deque([x0])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w != v and w not in seen:
                    seen.add(w)
                    q.append(w)
        row = out[v]
        assert row["n_nbrs"] == len(nbrs)
        assert row["reached_nbrs"] == len(nbrs & seen)
        assert row["is_articulation"] == (len(nbrs & seen) < len(nbrs))


# ------------------------------------------------- 3-clique percolation


def _cpm_rows(spark, pairs):
    out = pregel.clique_percolation3(_edges(spark, pairs)).collect()
    comms: dict[int, set] = {}
    for r in out:
        comms.setdefault(r["comm"], set()).add(r["vertex"])
    return sorted(comms.values(), key=sorted)


def test_cpm_shared_edge_merges(spark):
    # two triangles sharing edge (2,3): ONE community of 4 vertices
    comms = _cpm_rows(spark, [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)])
    assert comms == [{1, 2, 3, 4}]


def test_cpm_shared_vertex_overlaps(spark):
    # two triangles sharing only vertex 3: TWO communities, 3 in both —
    # the overlap partition methods cannot express
    comms = _cpm_rows(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)])
    assert comms == [{1, 2, 3}, {3, 4, 5}]


def test_cpm_pendant_and_chain_excluded(spark):
    # a triangle with a pendant edge and a separate path: only the
    # triangle's vertices are in any community
    comms = _cpm_rows(spark, [(1, 2), (2, 3), (1, 3), (3, 9), (20, 21), (21, 22)])
    assert comms == [{1, 2, 3}]


# ------------------------------------------------- JL projection audit


def test_jl_recall_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES, _jl_signs

    out = {r["query_id"]: r["overlap3"] for r in QUERIES["jl_recall"](spark, SF).collect()}
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    signs = _jl_signs()

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def proj(v):
        return [fold_dot(v, row) for row in signs]

    def top3(space):
        res = {}
        for q in [i for i in space if i < 20]:
            scored = sorted(
                (
                    (-fold_dot(space[q], space[o])
                     / (fold_dot(space[q], space[q]) ** 0.5
                        * fold_dot(space[o], space[o]) ** 0.5), o)
                    for o in space if o != q
                ),
            )[:3]
            res[q] = {o for _, o in scored}
        return res

    full = top3(vecs)
    sk = top3({vid: proj(v) for vid, v in vecs.items()})
    golden = {q: len(full[q] & sk[q]) for q in full}
    assert out == golden


def test_jl_signs_deterministic_and_balanced(spark):
    from polar_spark.operators.analytics_queries import _jl_signs

    a, b = _jl_signs(), _jl_signs()
    assert a == b and len(a) == 16 and all(len(r) == 64 for r in a)
    flat = [x for r in a for x in r]
    assert set(flat) == {1.0, -1.0}
    # sign balance within 4 sigma of a fair coin (LCG sanity)
    assert abs(sum(flat)) < 4 * (len(flat) ** 0.5)


# ------------------------------------------------- logistic regression


def test_logreg_gd3_python_replay(spark):
    import math

    import duckdb

    from polar_spark.operators.analytics_queries import _LOGREG_M, QUERIES

    row = QUERIES["logreg_gd3"](spark, SF).collect()[0]
    feats = duckdb.sql(
        f"""SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                   CAST(ROUND(l_discount * 100) AS BIGINT) AS x1,
                   CAST(ROUND(l_quantity * 100) AS BIGINT) // 100 AS x2
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    n = len(feats)
    d = 2 * n
    w = [0, 0, 0]
    for _ in range(3):
        g = [0, 0, 0]
        for y, x1, x2 in feats:
            m = w[0] + w[1] * x1 + w[2] * x2
            p = 1.0 / (1.0 + math.exp(-(m / 1e6)))
            t = math.floor(1e6 * (p - y))
            g[0] += t
            g[1] += t * x1
            g[2] += t * x2
        w = [w[j] - ((g[j] + _LOGREG_M * d) // d - _LOGREG_M) for j in range(3)]
    tp = fp = fn = tn = 0
    for y, x1, x2 in feats:
        pred = 1 if w[0] + w[1] * x1 + w[2] * x2 > 0 else 0
        if pred and y:
            tp += 1
        elif pred:
            fp += 1
        elif y:
            fn += 1
        else:
            tn += 1
    assert (row["w0_e6"], row["w1_e6"], row["w2_e6"]) == tuple(w)
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert tp + fp + fn + tn == n
    # with ~25% positives and no signal the all-negative bias should win:
    # the intercept must be negative after 3 rounds
    assert w[0] < 0


# ------------------------------------------------- EWMA forecast


def test_ewma_forecast_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import _EWMA_K, QUERIES

    out = QUERIES["ewma_forecast"](spark, SF).collect()
    daily = duckdb.sql(
        f"""SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    cents = [c for _, c in daily]
    days = [d for d, _ in daily]
    golden = {}
    for t in range(_EWMA_K, len(daily)):
        num_prev = sum(
            cents[t - 1 - j] * (1 << (_EWMA_K - 1 - j)) for j in range(_EWMA_K)
        )
        num_cur = sum(
            cents[t - j] * (1 << (_EWMA_K - 1 - j)) for j in range(_EWMA_K)
        )
        golden[days[t]] = (cents[t], num_cur, cents[t] * (1 << _EWMA_K) - num_prev)
    assert len(out) == len(golden)
    for r in out:
        c, num, err = golden[r["day"]]
        assert (r["cents"], r["ewma_num"], r["err_num"]) == (c, num, err)
        # the EWMA forecast is a convex-ish combination of the trailing
        # window (tail weight 2^-20 missing): inside its [min, max] span
        lo = min(cents[max(0, i)] for i in range(len(cents)))
        assert 0 < r["ewma_num"] < (1 << _EWMA_K) * max(cents)
        del lo


# ------------------------------------------------- k-means NMI


def test_kmeans_nmi_golden_recompute(spark):
    import math

    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    row = QUERIES["kmeans_nmi"](spark, SF).collect()[0]
    asg = {r["id"]: r["cluster"] for r in QUERIES["kmeans8"](spark, SF).collect()}
    labels = dict(
        duckdb.sql(f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'").fetchall()
    )
    ct: dict[tuple[int, int], int] = {}
    for vid, c in asg.items():
        ct[(c, labels[vid])] = ct.get((c, labels[vid]), 0) + 1
    n = sum(ct.values())
    nc: dict[int, int] = {}
    nl: dict[int, int] = {}
    for (c, l), v in ct.items():
        nc[c] = nc.get(c, 0) + v
        nl[l] = nl.get(l, 0) + v
    i_val = sum(
        v / n * math.log(n * v / (nc[c] * nl[l])) for (c, l), v in ct.items()
    )
    hc = -sum(v / n * math.log(v / n) for v in nc.values())
    hl = -sum(v / n * math.log(v / n) for v in nl.values())
    purity = sum(
        max(v for (c2, _), v in ct.items() if c2 == c) for c in nc
    )
    assert row["n_cells"] == len(ct) and row["n"] == n
    assert row["purity_ppm"] == purity * 1000000 // n
    assert abs(row["nmi_r"] - i_val / math.sqrt(hc * hl)) < 1e-4
    assert 0.0 <= row["nmi_r"] <= 1.0 + 1e-9
    assert 1000000 // len(nl) <= row["purity_ppm"] <= 1000000


# ------------------------------------------------- winnowing pairs


def test_winnow_pairs_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES
    from tests.test_text_multimodal import _py_winnow

    out = {(r["a"], r["b"]): r["shared"] for r in QUERIES["winnow_pairs"](spark, SF).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    fp: dict[int, set] = {}
    for did, text in docs:
        _, fps = _py_winnow(text, 4, 5)
        fp[did] = fps
    df: dict[int, int] = {}
    for fps in fp.values():
        for h in fps:
            df[h] = df.get(h, 0) + 1
    kept = {d: {h for h in fps if df[h] <= 50} for d, fps in fp.items()}
    golden = {}
    ids = sorted(kept)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            s = len(kept[a] & kept[b])
            if s >= 2:
                golden[(a, b)] = s
    assert out == golden


# ------------------------------------------------- kNN homophily


def test_knn_homophily_conservation_and_baseline(spark):
    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["knn_homophily"](spark, SF).collect()
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_l"] for r in rows) == n_vec
    assert sum(r["n_edges"] for r in rows) == 5 * n_vec
    for r in rows:
        assert 0 <= r["n_same"] <= r["n_edges"]
        assert r["same_ppm"] == r["n_same"] * 1000000 // r["n_edges"]
        assert r["base_ppm"] == (r["n_l"] - 1) * 1000000 // (n_vec - 1)


# ------------------------------------------------- b-matching


def test_bmatching_triangle_and_star(spark):
    # triangle, b=2: every vertex has capacity for both incident edges
    out, stats = pregel.b_matching(_edges(spark, [(1, 2), (2, 3), (1, 3)]), b=2)
    assert stats.converged
    assert sorted(map(tuple, out.select("a", "b").collect())) == [(1, 2), (1, 3), (2, 3)]
    # star K1,4, b=2: the hub keeps exactly 2 spokes
    out2, _ = pregel.b_matching(
        _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]), b=2
    )
    pairs = sorted(map(tuple, out2.select("a", "b").collect()))
    assert len(pairs) == 2 and all(a == 0 for a, _ in pairs)


def test_bmatching_capacity_and_maximality(spark):
    from collections import Counter

    from polar_spark.operators.analytics_queries import QUERIES, coorder_edges

    sel = [(r["a"], r["b"]) for r in QUERIES["bmatching2"](spark, SF).collect()]
    deg = Counter()
    for a, b in sel:
        deg[a] += 1
        deg[b] += 1
    assert all(d <= 2 for d in deg.values())
    # maximality: every remaining edge has an endpoint at capacity
    und = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in coorder_edges(spark, SF)
        .where((F.col("src") < 400) & (F.col("dst") < 400))
        .collect()
    }
    selected = set(sel)
    for a, b in und - selected:
        assert deg[a] >= 2 or deg[b] >= 2, (a, b)


def test_bmatching_b1_equals_maximal_matching(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 6), (2, 5)])
    m1, _ = pregel.b_matching(e, b=1)
    m2, _ = pregel.maximal_matching(e)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


# ------------------------------------------------- transitive reduction


def test_transitive_reduction_closed_form(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    out = {(r["src"], r["dst"]) for r in QUERIES["transitive_reduction2"](spark, SF).collect()}
    # on the interval-order succession DAG the exact transitive
    # reduction is precisely the next-1 edges: every next-2 shortcut is
    # witnessed by two next-1 hops, and next-1 edges are irreducible
    rows = duckdb.sql(
        f"""SELECT o_custkey, o_orderkey FROM '{SF}/orders.parquet'
            ORDER BY o_custkey, o_orderdate, o_orderkey"""
    ).fetchall()
    by_cust: dict[int, list] = {}
    for c, k in rows:
        by_cust.setdefault(c, []).append(k)
    golden = set()
    for seq in by_cust.values():
        for u, v in zip(seq, seq[1:]):
            golden.add((u, v))
        # the LAST next-2 edge (from the second-to-last order) has no
        # next-1 witness pair only if the chain is length 2 — but then
        # no next-2 edge exists; all next-2 edges are removed
    assert out == golden


# ------------------------------------------------- triadic closure


def test_triadic_closure_bounds_and_replay(spark):
    from polar_spark.operators.analytics_queries import QUERIES, _w2_backbone

    rows = QUERIES["triadic_closure"](spark, SF).collect()
    assert rows, "backbone has wedges at sf0.001"
    for r in rows:
        assert 0 <= r["n_closed_later"] <= r["n_wedges"]
        assert r["close_ppm"] == r["n_closed_later"] * 1000000 // r["n_wedges"]
    # pair-level python replay on the dated backbone
    import duckdb

    dated = duckdb.sql(
        f"""WITH op AS (SELECT DISTINCT l.l_orderkey AS o, l.l_partkey AS p,
                        date_trunc('month', o.o_orderdate) AS m
                 FROM '{SF}/lineitem.parquet' l
                 JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey)
            SELECT a.p, b.p, CAST(MIN(LEAST(a.m, b.m)) AS DATE)
            FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2 HAVING COUNT(*) >= 2"""
    ).fetchall()
    adj: dict[int, dict[int, object]] = {}
    emap = {}
    for a, b, fm in dated:
        adj.setdefault(a, {})[b] = fm
        adj.setdefault(b, {})[a] = fm
        emap[(a, b)] = fm
    pairs: dict[tuple[int, int], object] = {}
    for c, nbrs in adj.items():
        ns = sorted(nbrs)
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                formed = max(nbrs[u], nbrs[v])
                key = (u, v)
                if key not in pairs or formed < pairs[key]:
                    pairs[key] = formed
    golden: dict[str, list] = {}
    for (u, v), formed in pairs.items():
        cm = emap.get((u, v))
        month = formed.strftime("%Y-%m")
        golden.setdefault(month, [0, 0])
        golden[month][0] += 1
        if cm is not None and cm > formed:
            golden[month][1] += 1
    got = {r["month"]: [r["n_wedges"], r["n_closed_later"]] for r in rows}
    assert got == golden


# ------------------------------------------------- epsilon-graph curve


def test_eps_components_monotone_and_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["eps_components"](spark, SF).orderBy("thr_centi").collect()
    # monotone shrinkage as the threshold tightens
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_vertices"] >= b["n_vertices"]
        assert a["giant"] >= b["giant"]
    # python union-find replay per threshold
    pairs = duckdb.sql(
        f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                 FROM '{SF}/embeddings.parquet')
            SELECT a.vec_id, b.vec_id, list_cosine_similarity(a.v, b.v)
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.30"""
    ).fetchall()
    for r in rows:
        t = r["thr_centi"] / 100.0
        sub = [(a, b) for a, b, c in pairs if c >= t]
        parent: dict[int, int] = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        verts = set()
        for a, b in sub:
            verts |= {a, b}
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps: dict[int, int] = {}
        for v in verts:
            comps[find(v)] = comps.get(find(v), 0) + 1
        assert r["n_pairs"] == len(sub)
        assert r["n_vertices"] == len(verts)
        assert r["n_components"] == len(comps)
        assert r["giant"] == (max(comps.values()) if comps else 0)


# ------------------------------------------------- temporal LP AUC


def test_lp_auc_cn_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import _LP_SPLIT, QUERIES

    row = QUERIES["lp_auc_cn"](spark, SF).collect()[0]

    def backbone(where=""):
        return set(
            map(
                tuple,
                duckdb.sql(
                    f"""WITH op AS (SELECT DISTINCT l.l_orderkey o, l.l_partkey p,
                              o.o_orderdate odate
                         FROM '{SF}/lineitem.parquet' l
                         JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey)
                        SELECT a.p, b.p FROM op a JOIN op b
                        ON a.o = b.o AND a.p < b.p {where}
                        GROUP BY 1, 2 HAVING COUNT(*) >= 2"""
                ).fetchall(),
            )
        )

    bbt = backbone(f"AND a.odate < DATE '{_LP_SPLIT}'")
    bbf = backbone()
    adj: dict[int, set] = {}
    for a, b in bbt:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cand: dict[tuple[int, int], int] = {}
    for c, nbrs in adj.items():
        ns = sorted(nbrs)
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                cand[(u, v)] = cand.get((u, v), 0) + 1
    labeled = [
        (cn, 1 if (u, v) in bbf else 0)
        for (u, v), cn in cand.items()
        if (u, v) not in bbt
    ]
    n_pos = sum(p for _, p in labeled)
    n_neg = len(labeled) - n_pos
    # exact midrank AUC
    from collections import Counter

    hist = Counter(cn for cn, _ in labeled)
    cum = 0
    mid2 = {}
    for cn in sorted(hist):
        mid2[cn] = 2 * cum + hist[cn] + 1
        cum += hist[cn]
    r2 = sum(mid2[cn] for cn, p in labeled if p)
    u2 = r2 - n_pos * (n_pos + 1)
    assert (row["n_pairs"], row["n_pos"], row["n_neg"], row["u2"]) == (
        len(labeled),
        n_pos,
        n_neg,
        u2,
    )
    assert abs(row["auc_r"] - round(u2 / (2 * n_pos * n_neg), 6)) < 1e-9
    # common neighbors must beat coin-flip on this graph
    assert row["auc_r"] > 0.5


# ------------------------------------------------- Markov attribution


def test_attribution_markov_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    rows = {r["channel"]: r for r in QUERIES["attribution_markov5"](spark, SF).collect()}
    seq = duckdb.sql(
        f"""SELECT user_id, event_type FROM '{SF}/events.parquet'
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, t in seq:
        by_user.setdefault(u, []).append(t)
    starts: dict[str, int] = {}
    for evs in by_user.values():
        starts[evs[0]] = starts.get(evs[0], 0) + 1
    trans: dict[str, dict[str, int]] = {}
    for evs in by_user.values():
        for s, t in zip(evs, evs[1:]):
            d = trans.setdefault(s, {})
            d[t] = d.get(t, 0) + 1
    prob = {
        s: {t: n / sum(ts.values()) for t, n in ts.items()}
        for s, ts in trans.items()
    }
    states = set(prob)

    def conv(removed):
        pinned0 = {"error"} | ({removed} if removed else set())
        v = {s: 1.0 if s == "purchase" else 0.0 for s in states}
        for _ in range(6):
            nv = {}
            for s in states:
                if s == "purchase":
                    nv[s] = 1.0
                elif s in pinned0:
                    nv[s] = 0.0
                else:
                    nv[s] = sum(p * v.get(t, 0.0) for t, p in prob[s].items())
            v = nv
        n_users = sum(starts.values())
        return sum(n * v.get(s, 0.0) for s, n in starts.items()) / n_users

    base = conv(None)
    for c in ("click", "signup", "view"):
        r = rows[c]
        cc = conv(c)
        assert abs(r["conv_base_r"] - round(base, 6)) < 2e-6
        assert abs(r["conv_removed_r"] - round(cc, 6)) < 2e-6
        assert abs(r["effect_r"] - round((base - cc) / base, 6)) < 2e-5
        # knocking out a channel can only lose conversion mass
        assert r["conv_removed_r"] <= r["conv_base_r"] + 1e-9
        assert r["effect_r"] >= -1e-9


# ------------------------------------------------- subsequence support


def test_subseq_support_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    out = {
        (r["a"], r["b"], r["c"]): r["support"]
        for r in QUERIES["subseq_support3"](spark, SF).collect()
    }
    rows = duckdb.sql(
        f"""SELECT user_id, event_type, ts FROM '{SF}/events.parquet'
            ORDER BY user_id, ts"""
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, t, ts in rows:
        by_user.setdefault(u, []).append((ts, t))
    types = sorted({t for _, t, _ in rows})
    golden: dict[tuple, int] = {}
    for evs in by_user.values():
        evs.sort()
        for a in types:
            fa = next((ts for ts, t in evs if t == a), None)
            if fa is None:
                continue
            for b in types:
                gb = next((ts for ts, t in evs if t == b and ts > fa), None)
                if gb is None:
                    continue
                for c in types:
                    if any(t == c and ts > gb for ts, t in evs):
                        golden[(a, b, c)] = golden.get((a, b, c), 0) + 1
    assert out == golden
    # containment is monotone: support(a,b,c) <= support of the prefix pair
    pair_support: dict[tuple, int] = {}
    for evs in by_user.values():
        for a in types:
            fa = next((ts for ts, t in evs if t == a), None)
            if fa is not None:
                for b in types:
                    if any(t == b and ts > fa for ts, t in evs):
                        pair_support[(a, b)] = pair_support.get((a, b), 0) + 1
    for (a, b, c), s in out.items():
        assert s <= pair_support[(a, b)]


# ------------------------------------------------- int8 retrieval audit


def test_int8_recall_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    out = {r["query_id"]: r["overlap3"] for r in QUERIES["int8_recall"](spark, SF).collect()}
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    d = len(next(iter(vecs.values())))
    mn = [min(v[i] for v in vecs.values()) for i in range(d)]
    mx = [max(v[i] for v in vecs.values()) for i in range(d)]
    scale = [1.0 if mx[i] == mn[i] else (mx[i] - mn[i]) / 255.0 for i in range(d)]
    import math

    def dq(v):
        out = []
        for i, x in enumerate(v):
            code = min(255, max(0, math.floor((x - mn[i]) / scale[i] + 0.5)))
            out.append(mn[i] + code * scale[i])
        return out

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def top3(space):
        res = {}
        for q in [i for i in space if i < 20]:
            res[q] = {
                o
                for _, o in sorted(
                    (
                        (-fold_dot(space[q], space[o])
                         / (fold_dot(space[q], space[q]) ** 0.5
                            * fold_dot(space[o], space[o]) ** 0.5), o)
                        for o in space if o != q
                    )
                )[:3]
            }
        return res

    full = top3(vecs)
    quant = top3({vid: dq(v) for vid, v in vecs.items()})
    assert out == {q: len(full[q] & quant[q]) for q in full}
    # int8 with per-dim ranges is a mild distortion: mean overlap high
    assert sum(out.values()) / len(out) >= 2.0


# ------------------------------------------------- day-of-week profile


def test_seasonality_dow_conservation(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["seasonality_dow"](spark, SF).collect()
    assert [r["dow"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    total = duckdb.sql(
        f"SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["total_cents"] for r in rows) == total
    n_days = duckdb.sql(
        f"SELECT COUNT(DISTINCT date_trunc('day', o_orderdate)) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_days"] for r in rows) == n_days
    for r in rows:
        assert r["mean_cents"] == r["total_cents"] // r["n_days"]
        # a uniform-ish synthetic calendar: every weekday within 3x of uniform
        assert 1000000 // 3 <= r["idx_ppm"] <= 3000000



# ------------------------------------------------- Wilson LB ranking


def test_wilson_returns_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    rows = QUERIES["wilson_returns"](spark, SF).collect()
    stats = duckdb.sql(
        f"""SELECT l_partkey, COUNT(*), SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END)
            FROM '{SF}/lineitem.parquet' GROUP BY 1"""
    ).fetchall()
    z2 = 3.8415
    scored = []
    for part, n, k in stats:
        p = k / n
        lb = (p + z2 / (2 * n) - ((z2 * (p * (1 - p) + z2 / (4 * n)) / n) ** 0.5)) / (
            1 + z2 / n
        )
        scored.append((round(lb, 7), part, n, k))
    golden = sorted(scored, key=lambda t: (-t[0], t[1]))[:50]
    got = [(r["wilson_lb_r"], r["part"], r["n"], r["k"]) for r in rows]
    for (glb, gp, gn, gk), (olb, op_, on, ok) in zip(golden, got):
        assert (gp, gn, gk) == (op_, on, ok)
        assert abs(glb - olb) < 2e-7
    # small-sample discipline: the bound never exceeds the raw rate
    for r in rows:
        assert r["wilson_lb_r"] <= r["k"] / r["n"] + 1e-9


# ------------------------------------------------- Mann-Kendall trend


def test_mann_kendall_python_replay(spark):
    import duckdb

    from polar_spark.operators.analytics_queries import QUERIES

    row = QUERIES["mann_kendall"](spark, SF).collect()[0]
    months = duckdb.sql(
        f"""SELECT date_trunc('month', o_orderdate) AS m,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    vals = [c for _, c in months]
    n = len(vals)
    s = sum(
        (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(vals)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t >= 2)
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    z = (s - 1 if s > 0 else s + 1 if s < 0 else 0) / (var18 / 18.0) ** 0.5
    assert (row["n"], row["n_pairs"], row["s"], row["var18"]) == (
        n,
        n * (n - 1) // 2,
        s,
        var18,
    )
    assert abs(row["z_r"] - round(z, 6)) < 1e-9


# ------------------------------------------------- clique census


def test_clique_census_hand_graphs(spark):
    from polar_spark.operators.analytics_queries import QUERIES, _CLIQUE_KMAX

    # identity checks on the sf0.001 backbone census
    rows = {r["k"]: r["n_cliques"] for r in QUERIES["clique_census"](spark, SF).collect()}
    assert set(rows) == set(range(2, _CLIQUE_KMAX + 1))
    tri = QUERIES["triangles"]  # noqa: F841 (presence — same triangle base)
    # census is monotone-bounded: C(k+1) <= C(k) * max_fanout and once a
    # level is empty all deeper levels are empty
    seen_zero = False
    for k in range(2, _CLIQUE_KMAX + 1):
        if seen_zero:
            assert rows[k] == 0
        if rows[k] == 0:
            seen_zero = True
    # python recount of levels 2-4 on the actual backbone edges
    from polar_spark.operators.analytics_queries import _w2_backbone

    edge_set = {(r["src"], r["dst"]) for r in _w2_backbone(spark, SF).collect()}
    adj: dict[int, set] = {}
    for a, b in edge_set:
        adj.setdefault(a, set()).add(b)
    tri = sum(
        1
        for (a, b) in edge_set
        for c in adj.get(b, set())
        if (a, c) in edge_set
    )
    k4 = 0
    for (a, b) in edge_set:
        for c in sorted(adj.get(b, set())):
            if (a, c) not in edge_set:
                continue
            for d in adj.get(c, set()):
                if (a, d) in edge_set and (b, d) in edge_set:
                    k4 += 1
    assert rows[2] == len(edge_set)
    assert rows[3] == tri
    assert rows[4] == k4


# ------------------------------------------------- biconnected blocks


def _py_bcc(edge_list):
    """Iterative Hopcroft-Tarjan biconnected components (edge stacks)."""
    adj: dict[int, list] = {}
    for a, b in edge_list:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for v in adj:
        adj[v].sort()
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    comps = []
    stack: list[tuple[int, int]] = []
    timer = [0]

    def canon(u, v):
        return (min(u, v), max(u, v))

    for root in sorted(adj):
        if root in disc:
            continue
        work = [(root, None, iter(adj[root]))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        while work:
            v, parent, it = work[-1]
            advanced = False
            for w in it:
                if w == parent:
                    continue
                if w not in disc:
                    stack.append(canon(v, w))
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    work.append((w, v, iter(adj[w])))
                    advanced = True
                    break
                elif disc[w] < disc[v]:
                    stack.append(canon(v, w))
                    low[v] = min(low[v], disc[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
                if low[v] >= disc[pv]:
                    comp = set()
                    while stack:
                        e = stack.pop()
                        comp.add(e)
                        if e == canon(pv, v):
                            break
                    if comp:
                        comps.append(comp)
    return sorted(comps, key=sorted)


def test_bcc_hand_graphs(spark):
    def run(pairs):
        out, st = pregel.biconnected_components(_edges(spark, pairs))
        assert st.converged
        blocks: dict[int, set] = {}
        for r in out.collect():
            blocks.setdefault(r["block"], set()).add((r["a"], r["b"]))
        return sorted(blocks.values(), key=sorted)

    # two triangles at a cut vertex; triangle + bridge + path; C4
    assert run([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]) == _py_bcc(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    )
    assert run([(1, 2), (2, 3), (1, 3), (3, 9), (20, 21), (21, 22)]) == _py_bcc(
        [(1, 2), (2, 3), (1, 3), (3, 9), (20, 21), (21, 22)]
    )
    assert run([(1, 2), (2, 3), (3, 4), (1, 4)]) == [{(1, 2), (1, 4), (2, 3), (3, 4)}]


def test_bcc_backbone_python_replay(spark):
    from polar_spark.operators.analytics_queries import QUERIES, _w2_backbone

    rows = QUERIES["biconnected_blocks"](spark, SF).collect()
    edges = [
        (r["src"], r["dst"])
        for r in _w2_backbone(spark, SF)
        .where((F.col("src") < 1000) & (F.col("dst") < 1000))
        .collect()
    ]
    golden = _py_bcc(edges)
    got_sizes = sorted((r["n_edges"], r["n_vertices"]) for r in rows)
    want_sizes = sorted(
        (len(c), len({v for e in c for v in e})) for c in golden
    )
    assert got_sizes == want_sizes
    assert sum(r["n_edges"] for r in rows) == len(edges)
    for r in rows:
        assert r["is_bridge"] == (r["n_edges"] == 1)
