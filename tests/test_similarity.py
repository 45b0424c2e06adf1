"""Similarity-search tests: brute force vs numpy oracle; LSH/IVF recall
against the exact baseline."""

import numpy as np
import pytest

from polar_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    n, d = 120, 16
    mat = rng.standard_normal((n, d))
    # plant 3 tight clusters so ANN has structure to find
    for c in range(3):
        mat[c * 30 : c * 30 + 20] = mat[c * 30] + 0.05 * rng.standard_normal((20, d))
    rows = [(i, mat[i].astype(float).tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, mat


def _np_topk(mat, qids, k):
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = nm @ nm[q]
        sims[q] = -np.inf
        idx = np.argsort(-sims)[:k]
        out[q] = list(idx)
    return out


def test_bruteforce_matches_numpy(emb):
    df, mat = emb
    qids = [0, 5, 50, 99]
    got = similarity.cosine_topk_bruteforce(df, query_ids=qids, k=5)
    rows = got.collect()
    by_q = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rnk"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    exp = _np_topk(mat, qids, 5)
    for q in qids:
        assert by_q[q] == exp[q], f"query {q}: {by_q[q]} vs {exp[q]}"


def test_lsh_recall_on_clusters(emb):
    df, mat = emb
    got = similarity.cosine_topk_lsh(df, k=5, n_tables=10, n_planes=8)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exp = _np_topk(mat, list(range(0, 20)), 5)
    # recall@5 over clustered queries should be high
    hits = sum(len(by_q.get(q, set()) & set(exp[q])) for q in exp)
    total = sum(len(exp[q]) for q in exp)
    assert hits / total > 0.6, f"LSH recall too low: {hits}/{total}"


def test_ivf_finds_cluster_neighbors(emb):
    df, mat = emb
    qids = [0, 30, 60]
    got = similarity.ivf_topk(df, query_ids=qids, k=5, n_centroids=12, n_probe=4)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exp = _np_topk(mat, qids, 5)
    hits = sum(len(by_q.get(q, set()) & set(exp[q])) for q in exp)
    total = sum(len(exp[q]) for q in exp)
    assert hits / total > 0.6, f"IVF recall too low: {hits}/{total}"


def test_cosine_pairs_guard_and_exactness(emb):
    df, mat = emb
    with pytest.raises(ValueError, match="candidate pairs exceed"):
        similarity.cosine_pairs(df, threshold=0.8, max_rows=100)
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.cosine_pairs(df, threshold=0.8, max_rows=None).collect()
    }
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T
    exp = {
        (i, j): sims[i, j]
        for i in range(len(mat))
        for j in range(i + 1, len(mat))
        if sims[i, j] >= 0.8
    }
    assert set(got) == set(exp)
    assert max(abs(got[k] - exp[k]) for k in got) < 1e-12


def test_cosine_neardup_exact_reps_match_unionfind(emb):
    df, mat = emb
    from tests.oracles import py_components

    reps = {
        r["vec_id"]: r["rep_id"]
        for r in similarity.cosine_neardup(df, threshold=0.8, exact=True).collect()
    }
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T
    pairs = [
        (i, j)
        for i in range(len(mat))
        for j in range(i + 1, len(mat))
        if sims[i, j] >= 0.8
    ]
    comp = py_components(pairs)
    exp = {i: comp.get(i, i) for i in range(len(mat))}
    assert reps == exp
    # the three planted clusters collapse to their smallest member
    for c in range(3):
        members = [reps[i] for i in range(c * 30, c * 30 + 20)]
        assert set(members) == {c * 30}


def test_cosine_neardup_lsh_matches_exact_on_planted_clusters(emb):
    df, _mat = emb
    exact = {
        r["vec_id"]: r["rep_id"]
        for r in similarity.cosine_neardup(df, threshold=0.8, exact=True).collect()
    }
    lsh = {
        r["vec_id"]: r["rep_id"]
        for r in similarity.cosine_neardup(
            df, threshold=0.8, n_tables=12, n_planes=8, seed=3
        ).collect()
    }
    # near-identical planted vectors share sign-bit buckets w.h.p.; with
    # 12 tables the LSH path recovers every exact cluster here
    agree = sum(1 for k in exact if lsh[k] == exact[k])
    assert agree / len(exact) >= 0.95


def test_pq_recall_on_clusters(emb):
    """PQ asymmetric-distance search with exact rerank recovers cluster
    neighbors (dim 16 → 4 subvectors of 4)."""
    df, mat = emb
    qids = [0, 30, 60, 90]
    got = similarity.pq_topk(
        df, query_ids=qids, k=5, m_subvectors=4, n_centroids=12, rerank=6
    )
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exp = _np_topk(mat, qids, 5)
    hits = sum(len(by_q.get(q, set()) & set(exp[q])) for q in exp)
    total = sum(len(exp[q]) for q in exp)
    assert hits / total > 0.6, f"PQ recall too low: {hits}/{total}"
    # exact-rerank contract: reported cos equals the true cosine
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for r in rows:
        assert abs(r["cos"] - float(nm[r["query_id"]] @ nm[r["neighbor_id"]])) < 1e-9


def test_pq_deterministic_and_dim_guard(emb):
    df, _ = emb
    a = sorted(map(tuple, similarity.pq_topk(df, [0, 5], k=3, m_subvectors=4).collect()))
    b = sorted(map(tuple, similarity.pq_topk(df, [0, 5], k=3, m_subvectors=4).collect()))
    assert a == b and a
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_topk(df, [0], m_subvectors=5)


# -- distributed Lloyd's k-means -------------------------------------------


def test_kmeans_separated_clusters(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    pts, want = [], {}
    centers = [np.array([10.0, 0.0, 0.0]), np.array([0.0, 10.0, 0.0]),
               np.array([0.0, 0.0, 10.0])]
    vid = 0
    # seeds first: ids 0,1,2 land in distinct clusters (init = k smallest ids)
    for ci, c in enumerate(centers):
        v = c + rng.normal(0, 0.1, 3)
        pts.append((vid, [float(x) for x in v])); want[vid] = ci; vid += 1
    for ci, c in enumerate(centers):
        for _ in range(10):
            v = c + rng.normal(0, 0.3, 3)
            pts.append((vid, [float(x) for x in v])); want[vid] = ci; vid += 1
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out, cents = similarity.kmeans_lloyd(df, k=3, n_iter=4)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got == want
    assert len(cents) == 3
    # converged centroids sit near the true centers
    import numpy.linalg as la
    for ci, c in enumerate(centers):
        assert la.norm(np.array(cents[ci]) - c) < 0.5


def test_kmeans_assign_is_map_only(spark):
    pts = [(i, [float(i), 0.0]) for i in range(10)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out, _ = similarity.kmeans_lloyd(df, k=2, n_iter=1)
    # result is a checkpointed map-stage output: no Exchange anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_empty_and_determinism(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out, cents = similarity.kmeans_lloyd(empty, k=4)
    assert out.count() == 0 and cents == []
    pts = [(i, [float(i % 5), float(i % 3)]) for i in range(30)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, similarity.kmeans_lloyd(df, k=4, n_iter=2)[0].collect()))
    b = sorted(map(tuple, similarity.kmeans_lloyd(df, k=4, n_iter=2)[0].collect()))
    assert a == b and len(a) == 30


# --------------------------------------------------------------------------
# distributed PCA


def test_pca_matches_numpy(spark):
    import numpy as np

    rng = [(i, [((i * 7 + j * 13) % 17) / 17.0 + (j % 3) * 1.5 for j in range(6)]) for i in range(80)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    from polar_spark.operators.similarity import pca_fit, pca_project

    mean, comps, ev = pca_fit(df, k=3)
    m = np.array([v for _i, v in rng])
    mu = m.mean(axis=0)
    cov = np.cov(m, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    assert np.allclose(mean, mu, atol=1e-12)
    for rank, idx in enumerate(order):
        v = vecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        assert np.allclose(comps[rank], v, atol=1e-9), rank
        assert abs(ev[rank] - vals[idx]) < 1e-9
    # projection reproduces numpy (X - mu) @ components.T
    proj = {
        r["vec_id"]: r["pca"] for r in pca_project(df, mean, comps).collect()
    }
    want = (m - mu) @ np.array(comps).T
    for i in range(80):
        assert np.allclose(proj[i], want[i], atol=1e-9)
    # explained variance descending
    assert ev == sorted(ev, reverse=True)


def test_pca_project_is_pure_map(spark):
    from polar_spark.operators.similarity import pca_project

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    out = pca_project(df, [0.0, 0.0, 0.0], [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_gram_partials_reduce_to_exact_sums(spark):
    import numpy as np

    from polar_spark.operators.similarity import gram_partials

    rows = [(i, [float(i), float(2 * i)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(7)
    parts = gram_partials(df).collect()
    n = sum(r["n"] for r in parts)
    s = np.sum([r["s"] for r in parts], axis=0)
    g = np.sum([np.array(r["g"]).reshape(2, 2) for r in parts], axis=0)
    m = np.array([v for _i, v in rows])
    assert n == 50
    assert np.allclose(s, m.sum(axis=0))
    assert np.allclose(g, m.T @ m)


# -- SemDedup ---------------------------------------------------------------


def test_semdedup_drop_rule_matches_bruteforce(emb):
    df, mat = emb
    out = similarity.semdedup(df, k=4, n_iter=2, threshold=0.9)
    rows = {r["id"]: (r["cluster"], r["keep"]) for r in out.collect()}
    assert set(rows) == set(range(mat.shape[0]))
    # replay the rule in numpy per cluster: drop iff an earlier
    # same-cluster vector has cosine >= threshold
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    by_cluster: dict[int, list[int]] = {}
    for i, (c, _) in rows.items():
        by_cluster.setdefault(c, []).append(i)
    for c, ids in by_cluster.items():
        for i in ids:
            expect_drop = any(
                j < i and float(nm[j] @ nm[i]) >= 0.9 for j in ids
            )
            assert rows[i][1] == (not expect_drop), (i, c)
    # the planted near-identical cluster members must actually dedup
    assert sum(1 for _, k in rows.values() if not k) > 0


def test_semdedup_cluster_guard(emb):
    df, _ = emb
    with pytest.raises(ValueError, match="max_cluster"):
        similarity.semdedup(df, k=2, n_iter=1, threshold=0.9, max_cluster=10)


def test_quantize_int8_roundtrip_error_bounded(spark):
    import numpy as np

    from polar_spark.operators.similarity import quantize_int8

    rng = np.random.default_rng(5)
    rows = [(i, [float(v) for v in rng.normal(size=8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantize_int8(df).collect()
    assert len(out) == 40
    arr = np.array([r[1] for r in rows])
    step = (arr.max(axis=0) - arr.min(axis=0)) / 255.0
    for r in out:
        assert len(r["codes"]) == 8
        assert all(0 <= c <= 255 for c in r["codes"])
        # per-dim error is at most half a quantization step
        assert r["max_abs_err"] <= step.max() / 2 + 1e-12
        assert r["mse"] <= (step.max() / 2) ** 2 + 1e-12
    # constant dimension: scale falls back to 1.0, code 0, exact recon
    cdf = spark.createDataFrame(
        [(1, [3.5, 1.0]), (2, [3.5, 2.0])], "vec_id long, embedding array<double>"
    )
    got = {r["id"]: r for r in quantize_int8(cdf).collect()}
    assert got[1]["codes"][0] == 0 and got[2]["codes"][0] == 0
    assert got[1]["max_abs_err"] < 1e-12 or got[1]["codes"][1] in (0, 255)


def test_hnsw_topk_high_recall_and_deterministic(emb):
    df, mat = emb
    qids = [0, 5, 30, 60, 99]
    got = similarity.hnsw_topk(df, query_ids=qids, k=5, n_shards=4)
    rows = got.collect()
    by_q = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rnk"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    exp = _np_topk(mat, qids, 5)
    hits = sum(len(set(by_q.get(q, [])) & set(exp[q])) for q in exp)
    total = sum(len(exp[q]) for q in exp)
    # beam ef >= shard size here, so the union reduce is effectively exact
    assert hits / total >= 0.9, f"HNSW recall too low: {hits}/{total}"
    again = similarity.hnsw_topk(df, query_ids=qids, k=5, n_shards=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hnsw_query_guard_and_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = similarity.hnsw_topk(df, query_ids=[1, 2], k=3)
    assert out.count() == 0
    small = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])], "vec_id long, embedding array<double>"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="max_queries"):
        similarity.hnsw_topk(small, query_ids=list(range(20)), k=3, max_queries=10)


def test_nsw_graph_search_matches_bruteforce_single_shard(emb):
    """One shard => one NSW graph over the whole fixture; with ef large
    the beam search must return the exact top-k."""
    df, mat = emb
    qids = [0, 77]
    got = similarity.hnsw_topk(
        df, query_ids=qids, k=3, n_shards=1, ef_search=200, ef_construction=96
    )
    by_q = {}
    for r in sorted(got.collect(), key=lambda r: (r["query_id"], r["rnk"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    exp = _np_topk(mat, qids, 3)
    for q in qids:
        assert by_q[q] == exp[q]


def test_kmeans_parallel_init_matches_python_golden(spark):
    from polar_spark.operators.similarity import kmeans_parallel_init

    def bucket(key, seed=5):
        x0 = (key * 2654435761 + seed) % 2**31
        x1 = ((x0 ^ (x0 >> 13)) * 1274126177) % 2**31
        return (x1 ^ (x1 >> 17)) % 10000

    import math

    # 3 well-separated blobs on a line, deterministic coords
    pts = {i: [float(i % 7), float((i * 3) % 5) + 40.0 * (i % 3)] for i in range(60)}
    rows = [(i, v) for i, v in sorted(pts.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    l, rounds, scale = 4, 3, 2**20
    cands = [(0, 0)]
    for r in range(1, rounds + 1):
        cost = {}
        for i, v in pts.items():
            md = min(
                sum((a - b) * (a - b) for a, b in zip(v, pts[c]))
                for c, _ in cands
            )
            cost[i] = math.floor(scale * md)
        total = sum(cost.values())
        if total == 0:
            break
        known = {c for c, _ in cands}
        for i in sorted(pts):
            if i in known:
                continue
            thr = min((l * 10000 * cost[i]) // total, 10000)
            if bucket(i * 131 + r) < thr:
                cands.append((i, r))
    weight = {}
    for i, v in pts.items():
        best = min(
            ((sum((a - b) * (a - b) for a, b in zip(v, pts[c])), c) for c, _ in cands)
        )[1]
        weight[best] = weight.get(best, 0) + 1
    want = sorted((c, r, weight.get(c, 0)) for c, r in cands)

    got = [
        (row["cand_id"], row["round_added"], row["weight"])
        for row in kmeans_parallel_init(df).collect()
    ]
    assert got == want
    assert len(want) > 1  # the schedule actually sampled beyond the seed
    assert sum(w for _, _, w in want) == len(pts)
