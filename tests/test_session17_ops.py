"""Round-5 session-17 additions: KMV distinct sketch, Good-Turing
smoothing, feature-hashing collision audit (+ later batches in this
session).

Each operator also has a registered query + DuckDB oracle
(test_entry_contract replays those at sf0.001); these tests pin the
algorithmic properties by python/numpy replay or hand-golden values.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.analytics_queries import QUERIES
from polar_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- KMV


def _kmv_hash(uid: int) -> int:
    x0 = (uid * 2654435761 + 1000003) % 2147483648
    x1 = ((x0 ^ (x0 >> 13)) * 1274126177) % 2147483648
    return x1 ^ (x1 >> 17)


def test_kmv_distinct_python_replay(spark):
    rows = {r["grp"]: r for r in QUERIES["kmv_distinct"](spark, SF).collect()}
    ev = load_table(spark, "events", SF).select("event_type", "user_id").collect()
    by_grp: dict[str, set[int]] = {}
    users: dict[str, set[int]] = {}
    for r in ev:
        by_grp.setdefault(r["event_type"], set()).add(_kmv_hash(r["user_id"]))
        users.setdefault(r["event_type"], set()).add(r["user_id"])
    assert set(rows) == set(by_grp)
    for grp, hashes in by_grp.items():
        row = rows[grp]
        assert row["n_hashes"] == len(hashes)
        assert row["n_users"] == len(users[grp])
        if len(hashes) >= 64:
            kth = sorted(hashes)[63]
            assert row["kth_min"] == kth
            assert row["est"] == round(63 * 2147483648 / kth, 4)
        else:
            assert row["kth_min"] == 0
            assert row["est"] == float(len(hashes))


def test_kmv_estimate_tracks_exact(spark):
    # k=64 gives ~1/sqrt(62) ≈ 13% relative standard error; allow 3 sigma
    for r in QUERIES["kmv_distinct"](spark, SF).collect():
        if r["kth_min"] > 0:
            assert abs(r["est"] - r["n_hashes"]) / r["n_hashes"] < 0.4


# ------------------------------------------------------- Good-Turing


def _trigram_counts(spark):
    docs = load_table(spark, "documents", SF).select("doc_id", "text").collect()
    c: Counter[str] = Counter()
    for r in docs:
        toks = r["text"].strip().split()
        for i in range(len(toks) - 2):
            c[" ".join(toks[i : i + 3])] += 1
    return c


def test_gt_smoothing_python_replay(spark):
    out = {r["r"]: r for r in QUERIES["gt_smoothing"](spark, SF).collect()}
    counts = _trigram_counts(spark)
    fof = Counter(counts.values())
    n_total = sum(counts.values())
    assert out[0]["n_r"] == n_total
    assert out[0]["r_star_micro"] == fof[1] * 1000000 // n_total
    for r in range(1, 7):
        if r in out:
            assert out[r]["n_r"] == fof[r]
            if fof.get(r + 1):
                assert out[r]["r_star_micro"] == (r + 1) * fof[r + 1] * 1000000 // fof[r]
            else:
                assert out[r]["r_star_micro"] == 0


def test_gt_smoothing_mass_conservation(spark):
    # Turing adjusted counts redistribute mass downward: r* < r·1e6 for
    # singletons in a heavy-tailed fof (N_2 < 2·N_1 ⇒ 2·N_2/N_1 < ...),
    # and every returned row is one of r = 0..6
    rows = QUERIES["gt_smoothing"](spark, SF).collect()
    assert {r["r"] for r in rows} <= set(range(7))
    assert all(r["n_r"] > 0 for r in rows)


# ------------------------------------------- feature-hash collision audit


def test_feature_hash_audit_python_replay(spark):
    from polar_spark.operators.dedup import _POLY_B, _P31

    docs = load_table(spark, "documents", SF).select("doc_id", "text").collect()
    seen: dict[str, set[int]] = {}
    for r in docs:
        toks = r["text"].strip().split()
        for i in range(len(toks) - 2):
            seen.setdefault(" ".join(toks[i : i + 3]), set()).add(r["doc_id"])
    vocab = [t for t, d in seen.items() if len(d) >= 2]

    def poly(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * _POLY_B + ord(ch)) % _P31
        return acc

    loads = Counter(poly(t) % 1024 for t in vocab)
    hist = Counter(loads.values())
    n_tokens = len(vocab)
    coll = sum(v * (v - 1) // 2 for v in loads.values())
    ppm = coll * 1000000 // (n_tokens * (n_tokens - 1) // 2)
    rows = QUERIES["feature_hash_audit"](spark, SF).collect()
    assert {(r["load"], r["n_buckets"]) for r in rows} == set(hist.items())
    for r in rows:
        assert r["n_tokens"] == n_tokens
        assert r["collision_ppm"] == ppm


def test_feature_hash_histogram_accounts_all_tokens(spark):
    rows = QUERIES["feature_hash_audit"](spark, SF).collect()
    total = sum(r["load"] * r["n_buckets"] for r in rows)
    assert total == rows[0]["n_tokens"]
    assert sum(r["n_buckets"] for r in rows) <= 1024


# ---------------------------------------------------------- revenue ACF


def _daily_kdollars(spark):
    rows = load_table(spark, "orders", SF).select("o_orderdate", "o_totalprice").collect()
    import datetime

    base = datetime.date(1992, 1, 1)
    daily: dict[int, int] = {}
    for r in rows:
        d = (r["o_orderdate"].date() - base).days
        daily[d] = daily.get(d, 0) + int(round(r["o_totalprice"] * 100)) // 100000
    return daily


def test_revenue_acf_python_replay(spark):
    daily = _daily_kdollars(spark)
    out = {r["lag"]: r for r in QUERIES["revenue_acf"](spark, SF).collect()}
    for lag in range(1, 8):
        pairs = [(x, daily[d + lag]) for d, x in daily.items() if d + lag in daily]
        n = len(pairs)
        assert out[lag]["n_pairs"] == n
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx > 0 and vy > 0:
            r = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            assert abs(out[lag]["acf_r"] - round(r, 6)) < 1e-9
        else:
            assert out[lag]["acf_r"] == 0.0
        # synthetic orders are calendar-uniform: no weekly structure
        assert abs(out[lag]["acf_r"]) < 0.3


# ------------------------------------------------------ Pettitt test


def test_pettitt_python_replay(spark):
    rows = load_table(spark, "orders", SF).select("o_orderdate").collect()
    import datetime

    base = datetime.date(1992, 1, 1)
    daily: dict[int, int] = {}
    for r in rows:
        d = (r["o_orderdate"].date() - base).days
        daily[d] = daily.get(d, 0) + 1
    xs = sorted(daily.items())
    n = len(xs)
    vals = sorted(v for _, v in daily.items())
    # doubled average rank: 2*minrank + ties - 1
    first = {}
    for i, v in enumerate(vals):
        first.setdefault(v, i + 1)
    ties = Counter(vals)
    r2 = {v: 2 * first[v] + ties[v] - 1 for v in ties}
    out = {r["d"]: r for r in QUERIES["pettitt_change"](spark, SF).collect()}
    assert len(out) == n
    acc = 0
    kmax = 0
    us = {}
    for t, (d, v) in enumerate(xs, start=1):
        acc += r2[v]
        u = acc - t * (n + 1)
        us[d] = u
        kmax = max(kmax, abs(u))
    for d, u in us.items():
        assert out[d]["u2"] == u
        assert out[d]["k2"] == kmax
        assert out[d]["is_change_point"] == (abs(u) == kmax)
    # U_n telescopes to zero: sum of doubled avg ranks is n(n+1)
    assert us[xs[-1][0]] == 0


# ------------------------------------------------------ log-rank test


def test_logrank_python_replay(spark):
    orders = load_table(spark, "orders", SF).select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).collect()
    cust = {
        r["c_custkey"]: 1 if r["c_nationkey"] % 2 == 0 else 0
        for r in load_table(spark, "customer", SF).collect()
    }
    by_c: dict[int, list] = {}
    maxd = max(r["o_orderdate"] for r in orders)
    for r in orders:
        by_c.setdefault(r["o_custkey"], []).append(r)
    subs = []
    for ck, rs in by_c.items():
        rs.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        for cur, nxt in zip(rs, rs[1:] + [None]):
            if nxt is not None:
                subs.append(((nxt["o_orderdate"] - cur["o_orderdate"]).days, 1, cust[ck]))
            else:
                subs.append(((maxd - cur["o_orderdate"]).days, 0, cust[ck]))
    times = sorted({t for t, _, _ in subs})
    o1 = e1m = vm = 0
    for t in times:
        at_risk = [s for s in subs if s[0] >= t]
        n = len(at_risk)
        n1 = sum(g for _, _, g in at_risk)
        d = sum(e for tt, e, _ in at_risk if tt == t)
        d1 = sum(e * g for tt, e, g in at_risk if tt == t)
        if d >= 1:
            o1 += d1
            e1m += d * n1 * 1000000 // n
            if n > 1:
                vm += (d * (n - d) // (n - 1)) * n1 * (n - n1) * 1000 // (n * n)
    row = QUERIES["logrank_test"](spark, SF).collect()[0]
    assert row["o1"] == o1
    assert row["e1_micro"] == e1m
    assert row["v_milli"] == vm
    chi2 = (o1 - e1m / 1e6) ** 2 / (vm / 1e3)
    assert abs(row["chi2_r"] - round(chi2, 6)) < 1e-9
    # nation parity is independent of ordering behavior: the null holds
    assert row["chi2_r"] < 15.0


# -------------------------------------------------------- AP@10 eval


def test_ap_eval_python_replay(spark):
    from polar_spark.operators.analytics_queries import _BM25_QUERIES
    from polar_spark.operators.text import bm25_topk

    docs = load_table(spark, "documents", SF)
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id string, qtext string")
    top10 = {}
    for r in bm25_topk(docs, qdf).collect():
        top10.setdefault(r["query_id"], []).append((r["rnk"], r["doc_id"]))
    texts = {r["doc_id"]: set(r["text"].strip().split()) for r in docs.collect()}
    out = {r["query_id"]: r for r in QUERIES["ap_eval"](spark, SF).collect()}
    for qid, qtext in _BM25_QUERIES:
        terms = set(qtext.strip().split())
        rel = {d for d, ts in texts.items() if terms <= ts}
        row = out[qid]
        assert row["n_relevant"] == len(rel)
        hits = sorted(rnk for rnk, d in top10.get(qid, []) if d in rel)
        assert row["hits10"] == len(hits)
        if rel:
            terms_sum = sum(
                (j + 1) * 1000000 // rnk for j, rnk in enumerate(hits)
            )
            assert row["ap_ppm"] == terms_sum // min(len(rel), 10)
        else:
            assert row["ap_ppm"] == 0
        assert 0 <= row["ap_ppm"] <= 1000000


def test_ap_consistent_with_ndcg_hits(spark):
    ap = {r["query_id"]: r for r in QUERIES["ap_eval"](spark, SF).collect()}
    nd = {r["query_id"]: r for r in QUERIES["ndcg_eval"](spark, SF).collect()}
    assert set(ap) == set(nd)
    for q in ap:
        assert ap[q]["hits10"] == nd[q]["hits10"]
        assert ap[q]["n_relevant"] == nd[q]["n_relevant"]


# -------------------------------------------------------- linear CKA


def test_cka_views_numpy_replay(spark):
    import numpy as np

    vs = np.array(
        [r["embedding"] for r in load_table(spark, "embeddings", SF).collect()],
        dtype=np.float64,
    )
    n = vs.shape[0]
    c = np.round((vs.T @ vs - np.outer(vs.sum(0), vs.sum(0)) / n) / (n - 1), 6)
    # the query's cmat carries both (i,j) and (j,i): the xy block is the
    # full 32×32 rectangle counted twice
    fxy = float((c[:32, 32:] ** 2).sum() * 2)
    fxx = float((c[:32, :32] ** 2).sum())
    fyy = float((c[32:, 32:] ** 2).sum())
    row = QUERIES["cka_views"](spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["fro2_xy"] - round(fxy, 6)) < 1e-4
    assert abs(row["fro2_xx"] - round(fxx, 6)) < 1e-4
    assert abs(row["fro2_yy"] - round(fyy, 6)) < 1e-4
    cka = fxy / math.sqrt(fxx * fyy)
    assert abs(row["cka_r"] - cka) < 1e-5
    assert 0.0 <= row["cka_r"] <= 1.0 + 1e-9


# ------------------------------------------------ conformal p-values


def test_conformal_python_replay(spark):
    import numpy as np

    rows = load_table(spark, "embeddings", SF).collect()
    calib = [(r["vec_id"], r["label"], np.array(r["embedding"], dtype=np.float64))
             for r in rows if r["vec_id"] % 2 == 0]
    test = [(r["vec_id"], r["label"], np.array(r["embedding"], dtype=np.float64))
            for r in rows if r["vec_id"] % 50 == 1]
    cents = {}
    for lb in {l for _, l, _ in calib}:
        m = np.stack([v for _, l, v in calib if l == lb]).mean(axis=0)
        cents[lb] = np.round(m, 6)

    def score(v, lb):
        c = cents[lb]
        return round(1.0 - float(v @ c) / (float(np.linalg.norm(v)) * float(np.linalg.norm(c))), 6)

    cal_s = {}
    for _, lb, v in calib:
        cal_s.setdefault(lb, []).append(score(v, lb))
    out = {r["vec_id"]: r for r in QUERIES["conformal_pvalues"](spark, SF).collect()}
    assert set(out) == {vid for vid, _, _ in test}
    for vid, lb, v in test:
        s = score(v, lb)
        row = out[vid]
        assert row["label"] == lb
        assert abs(row["score_r"] - s) < 2e-6
        ge = sum(1 for x in cal_s[lb] if x >= row["score_r"])
        assert row["p_ppm"] == (1 + ge) * 1000000 // (len(cal_s[lb]) + 1)
        assert 0 < row["p_ppm"] <= 1000000


# ---------------------------------------------- Eulerian classification


def _coorder150(spark):
    from polar_spark.operators.analytics_queries import coorder_edges

    return [
        (r["src"], r["dst"])
        for r in coorder_edges(spark, SF)
        .where((F.col("src") < 150) & (F.col("dst") < 150))
        .collect()
    ]


def test_euler_check_python_replay(spark):
    edges = _coorder150(spark)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for v in deg:
        comps.setdefault(find(v), []).append(v)
    out = {r["comp"]: r for r in QUERIES["euler_check"](spark, SF).collect()}
    # hash-min CC labels components by min member id == union-find min root
    assert set(out) == set(comps)
    for root, members in comps.items():
        row = out[root]
        assert row["n_vertices"] == len(members)
        n_odd = sum(1 for v in members if deg[v] % 2 == 1)
        assert row["n_odd"] == n_odd
        assert row["euler_circuit"] == (n_odd == 0)
        assert row["euler_trail"] == (n_odd == 2)
        assert row["n_edges"] == sum(deg[v] for v in members) // 2


# ------------------------------------------------- delta-hyperbolicity


def test_hyperbolicity_python_replay(spark):
    from itertools import combinations

    edges = _coorder150(spark)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    panel = sorted(v for v in adj if v % 5 == 0)

    def bfs(s):
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            frontier = nxt
        return dist

    d = {s: bfs(s) for s in panel}
    hist: Counter[int] = Counter()
    for a, b, c, e in combinations(panel, 4):
        try:
            s1 = d[a][b] + d[c][e]
            s2 = d[a][c] + d[b][e]
            s3 = d[a][e] + d[b][c]
        except KeyError:
            continue
        ss = sorted((s1, s2, s3))
        hist[ss[2] - ss[1]] += 1
    rows = QUERIES["hyperbolicity4"](spark, SF).collect()
    assert {(r["delta2"], r["n_quads"]) for r in rows} == set(hist.items())
    mx = max(hist)
    for r in rows:
        assert r["max_delta2"] == mx
        assert r["delta2"] >= 0


# ------------------------------------------------ walk-length spectrum


def test_walk_spectrum_python_replay(spark):
    edges = _coorder150(spark)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for r in QUERIES["walk_spectrum8"](spark, SF).collect():
        out[(r["source"], r["id"])] = r
    srcs = sorted(v for v in adj if v % 50 == 0)
    expected = {}
    for s in srcs:
        lens: dict[int, set[int]] = {s: {0}}
        frontier = {s}
        for d in range(1, 9):
            nxt = set()
            for u in frontier:
                nxt |= adj[u]
            for v in nxt:
                lens.setdefault(v, set()).add(d)
            frontier = nxt
        for v, ds in lens.items():
            expected[(s, v)] = ds
    assert set(out) == set(expected)
    for key, ds in expected.items():
        row = out[key]
        assert row["mask"] == sum(1 << d for d in ds)
        assert row["n_lens"] == len(ds)
        assert row["min_len"] == min(ds)
        assert row["has_odd"] == (1 if any(d % 2 == 1 for d in ds) else 0)
        assert row["has_even"] == (1 if any(d % 2 == 0 and d > 0 for d in ds) else 0)


def test_walk_spectrum_contains_bfs_distance(spark):
    # the lowest set bit IS the BFS distance; consecutive lengths share
    # parity with min_len + 2k whenever a neighbor loop exists
    for r in QUERIES["walk_spectrum8"](spark, SF).collect():
        assert r["mask"] & (1 << r["min_len"])
        assert (r["mask"] & ((1 << r["min_len"]) - 1)) == 0


# ------------------------------------------------------- A/B SRM audit


def test_ab_srm_python_replay(spark):
    ev = load_table(spark, "events", SF).select("event_id", "event_type").collect()
    n_a = sum(1 for r in ev if r["event_id"] % 2 == 0)
    n_b = len(ev) - n_a
    x_a = sum(1 for r in ev if r["event_id"] % 2 == 0 and r["event_type"] == "purchase")
    x_b = sum(1 for r in ev if r["event_id"] % 2 != 0 and r["event_type"] == "purchase")
    row = QUERIES["ab_srm"](spark, SF).collect()[0]
    assert (row["n_a"], row["n_b"], row["x_a"], row["x_b"]) == (n_a, n_b, x_a, x_b)
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    assert abs(row["srm_chi2_r"] - round(chi2, 6)) < 1e-9
    phat = (x_a + x_b) / (n_a + n_b)
    z = (x_a / n_a - x_b / n_b) / math.sqrt(
        phat * (1 - phat) * (1 / n_a + 1 / n_b)
    )
    assert abs(row["z_r"] - round(z, 6)) < 1e-9
    # event-id parity is unconfounded by construction: both stats small
    assert row["srm_chi2_r"] < 10.84  # chi2_1 at alpha=0.001
    assert abs(row["z_r"]) < 3.3


# -------------------------------------------------------- rank-1 ALS


def test_als_rank1_python_replay(spark):
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_partkey", "l_quantity").collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, "orders", SF).collect()
    }
    ratings: dict[tuple[int, int], int] = {}
    for r in li:
        key = (orders[r["l_orderkey"]], r["l_partkey"])
        ratings[key] = ratings.get(key, 0) + int(r["l_quantity"])
    by_cust: dict[int, list[int]] = {}
    for (c, p), q in ratings.items():
        by_cust.setdefault(c, []).append(q)
    u = {c: sum(qs) * 1000000 // len(qs) for c, qs in by_cust.items()}
    num: dict[int, int] = {}
    den: dict[int, int] = {}
    cnt: dict[int, int] = {}
    for (c, p), q in ratings.items():
        num[p] = num.get(p, 0) + q * u[c]
        den[p] = den.get(p, 0) + (u[c] * u[c]) // 1000000
        cnt[p] = cnt.get(p, 0) + 1
    v = {p: num[p] * 1000000 // den[p] for p in num}
    top = sorted(v.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = QUERIES["als_rank1"](spark, SF).collect()
    assert len(rows) == 20
    for rnk, (row, (p, vm)) in enumerate(zip(rows, top), start=1):
        assert row["part"] == p
        assert row["v_micro"] == vm
        assert row["n_raters"] == cnt[p]
        assert row["rnk"] == rnk
    # item factors live on the quantity scale (1..50, micro units)
    assert all(0 < r["v_micro"] < 100_000_000 for r in rows)


# ------------------------------------------------------- max-cut sweeps


def test_maxcut_monotone_and_replay(spark):
    from polar_spark.operators.analytics_queries import _w2_backbone

    edges = [
        (r["src"], r["dst"])
        for r in _w2_backbone(spark, SF)
        .where((F.col("src") < 2000) & (F.col("dst") < 2000))
        .collect()
    ]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    side = {v: v % 2 for v in adj}

    def cut(s):
        return sum(1 for a, b in edges if s[a] != s[b])

    c0 = cut(side)
    flips = []
    cuts = []
    for _ in range(2):
        cand = {
            v
            for v in adj
            if 2 * sum(1 for w in adj[v] if side[w] == side[v]) > len(adj[v])
        }
        flip = {v for v in cand if all(v < w for w in adj[v] if w in cand)}
        for v in flip:
            side[v] = 1 - side[v]
        flips.append(len(flip))
        cuts.append(cut(side))
    row = QUERIES["maxcut_sweep2"](spark, SF).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["cut_init"] == c0
    assert row["flips1"] == flips[0]
    assert row["cut1"] == cuts[0]
    assert row["flips2"] == flips[1]
    assert row["cut2"] == cuts[1]
    # independent-set-scheduled local search is monotone non-decreasing
    assert row["cut_init"] <= row["cut1"] <= row["cut2"] <= row["n_edges"]


# --------------------------------------------------------- Theil-Sen


def test_theil_sen_python_replay(spark):
    rows = load_table(spark, "orders", SF).select("o_orderdate", "o_totalprice").collect()
    monthly: dict[int, int] = {}
    for r in rows:
        mi = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
        monthly[mi] = monthly.get(mi, 0) + int(round(r["o_totalprice"] * 100)) // 100000
    ms = sorted(monthly.items())
    slopes = []
    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            (mi, yi), (mj, yj) = ms[i], ms[j]
            slopes.append(((yj - yi) * 1000) // (mj - mi))  # python // floors
    slopes.sort()
    row = QUERIES["theil_sen"](spark, SF).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert row["n_positive"] == sum(1 for s in slopes if s > 0)
    assert row["median_slope_milli"] == slopes[(len(slopes) + 1) // 2 - 1]


# --------------------------------------------------- Kruskal-Wallis H


def test_kruskal_wallis_python_replay(spark):
    rows = load_table(spark, "orders", SF).select("o_orderdate", "o_totalprice").collect()
    daily: dict = {}
    for r in rows:
        d = r["o_orderdate"].date()
        daily[d] = daily.get(d, 0) + int(round(r["o_totalprice"] * 100)) // 100000
    vals = sorted(daily.values())
    first = {}
    for i, v in enumerate(vals):
        first.setdefault(v, i + 1)
    ties = Counter(vals)
    r2 = {v: 2 * first[v] + ties[v] - 1 for v in ties}
    per: dict[int, list[int]] = {}
    for d, v in daily.items():
        per.setdefault(d.isoweekday(), []).append(r2[v])
    nn = len(daily)
    sq = sum((sum(g)) ** 2 // len(g) for g in per.values())
    h = 3.0 * sq / (nn * (nn + 1)) - 3.0 * (nn + 1)
    tie3 = sum(t**3 - t for t in ties.values())
    hc = h / (1.0 - tie3 / (nn**3 - nn))
    out = {r["wd"]: r for r in QUERIES["kruskal_wallis"](spark, SF).collect()}
    assert set(out) == set(per)
    for wd, g in per.items():
        assert out[wd]["n"] == len(g)
        assert out[wd]["r2_sum"] == sum(g)
        assert abs(out[wd]["h_r"] - round(h, 6)) < 1e-9
        assert abs(out[wd]["h_tie_r"] - round(hc, 6)) < 1e-9
    # uniform synthetic calendar: no weekday effect (chi2_6 at 0.001 = 22.5)
    assert out[1]["h_tie_r"] < 22.5


# ------------------------------------------------- chi2 independence


def test_chi2_independence_python_replay(spark):
    rows = load_table(spark, "events", SF).select("ts", "event_type").collect()
    cells: Counter = Counter()
    for r in rows:
        cells[(r["event_type"], r["ts"].date().isoweekday())] += 1
    rmarg: Counter = Counter()
    cmarg: Counter = Counter()
    for (et, wd), o in cells.items():
        rmarg[et] += o
        cmarg[wd] += o
    nn = sum(cells.values())
    per_type: dict[str, int] = {}
    for (et, wd), o in cells.items():
        e = rmarg[et] * cmarg[wd] / nn
        per_type[et] = per_type.get(et, 0) + math.floor(1e6 * (o - e) ** 2 / e)
    chi2 = sum(per_type.values())
    dof = (len(rmarg) - 1) * (len(cmarg) - 1)
    v = math.sqrt(chi2 / 1e6 / (nn * min(len(rmarg) - 1, len(cmarg) - 1)))
    out = {r["event_type"]: r for r in QUERIES["chi2_independence"](spark, SF).collect()}
    assert set(out) == set(rmarg)
    for et in rmarg:
        assert out[et]["n_row"] == rmarg[et]
        assert out[et]["chi2_micro_type"] == per_type[et]
        assert out[et]["chi2_micro"] == chi2
        assert out[et]["dof"] == dof
        assert abs(out[et]["cramers_v_r"] - round(v, 6)) < 1e-9
        # event types are calendar-independent by construction
        assert out[et]["cramers_v_r"] < 0.2


# ------------------------------------------------------- B-cubed eval


def test_bcubed_python_replay(spark):
    from polar_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, "embeddings", SF)
    asg, _ = kmeans_lloyd(emb, k=8, n_iter=3)
    clusters = {r["id"]: r["cluster"] for r in asg.collect()}
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    ct: Counter = Counter()
    for vid, c in clusters.items():
        ct[(c, labels[vid])] += 1
    nc: Counter = Counter()
    nl: Counter = Counter()
    for (c, l), n in ct.items():
        nc[c] += n
        nl[l] += n
    n = sum(ct.values())
    p_num = sum(v * v * 1000000 // nc[c] for (c, l), v in ct.items())
    r_num = sum(v * v * 1000000 // nl[l] for (c, l), v in ct.items())
    row = QUERIES["bcubed_eval"](spark, SF).collect()[0]
    assert row["n"] == n
    assert row["bcubed_p_ppm"] == p_num // n
    assert row["bcubed_r_ppm"] == r_num // n
    p, r = p_num // n, r_num // n
    assert row["bcubed_f_ppm"] == 2 * p * r // (p + r)
    # both are averages of fractions in (0, 1]
    assert 0 < row["bcubed_p_ppm"] <= 1000000
    assert 0 < row["bcubed_r_ppm"] <= 1000000


# -------------------------------------------------- walk entropy rate


def test_walk_entropy_python_replay(spark):
    from polar_spark.operators.analytics_queries import _w2_backbone

    edges = [(r["src"], r["dst"]) for r in _w2_backbone(spark, SF).collect()]
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    dsum = sum(deg.values())
    dlnd = sum(math.floor(1e6 * d * math.log(d)) for d in deg.values())
    row = QUERIES["walk_entropy"](spark, SF).collect()[0]
    assert row["n_vertices"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert row["dlnd_scaled"] == dlnd
    h = dlnd / (1e6 * dsum)
    assert abs(row["h_rate_r"] - round(h, 6)) < 1e-9
    assert abs(row["h_pi_r"] - round(math.log(dsum) - h, 6)) < 1e-9
    # information bounds: 0 ≤ h_rate ≤ ln(max deg); H(pi) ≤ ln n
    assert 0 <= row["h_rate_r"] <= math.log(max(deg.values())) + 1e-9
    assert row["h_pi_r"] <= row["h_uniform_r"] + 1e-9


# -------------------------------------------------- k-anonymity audit


def test_kanon_audit_python_replay(spark):
    rows = load_table(spark, "customer", SF).collect()
    grp: dict = {}
    for r in rows:
        key = (r["c_nationkey"], r["c_mktsegment"])
        sign = (r["c_acctbal"] > 0) - (r["c_acctbal"] < 0)
        grp.setdefault(key, []).append(sign)
    ks = Counter(len(v) for v in grp.values())
    out = {r["k"]: r for r in QUERIES["kanon_audit"](spark, SF).collect()}
    assert set(out) == set(ks)
    min_k = min(ks)
    min_l = min(len(set(v)) for v in grp.values())
    total = len(rows)
    small = sum(len(v) for v in grp.values() if len(v) < 5)
    for k, n_classes in ks.items():
        row = out[k]
        assert row["n_classes"] == n_classes
        assert row["n_rows"] == k * n_classes
        assert row["min_k"] == min_k
        assert row["min_l"] == min_l
        assert row["small_class_ppm"] == small * 1000000 // total
        assert row["min_l_at_k"] == min(
            len(set(v)) for v in grp.values() if len(v) == k
        )


# ---------------------------------------------------- Page-Hinkley drift


def test_page_hinkley_python_replay(spark):
    rows = load_table(spark, "orders", SF).select("o_orderdate").collect()
    import datetime

    base = datetime.date(1992, 1, 1)
    daily: dict[int, int] = {}
    for r in rows:
        d = (r["o_orderdate"].date() - base).days
        daily[d] = daily.get(d, 0) + 1
    out = {r["d"]: r for r in QUERIES["page_hinkley"](spark, SF).collect()}
    assert set(out) == set(daily)
    s = 0
    m = 0
    mmin = 0
    first = True
    for i, (d, x) in enumerate(sorted(daily.items()), start=1):
        s += x
        m += x * 1000000 - (s * 1000000 // i) - 500000
        mmin = m if first else min(mmin, m)
        first = False
        row = out[d]
        assert row["x"] == x
        assert row["m_micro"] == m
        assert row["ph_micro"] == m - mmin
        assert row["alarm"] == (m - mmin > 50_000_000)
        assert row["ph_micro"] >= 0


def test_page_hinkley_stationary_series_quiet(spark):
    # the synthetic calendar is stationary: no drift alarm should fire
    rows = QUERIES["page_hinkley"](spark, SF).collect()
    assert not any(r["alarm"] for r in rows)


# ------------------------------------------------- two-sample KS test


def test_ks_2samp_python_replay(spark):
    rows = load_table(spark, "orders", SF).select("o_orderdate", "o_totalprice").collect()
    import datetime

    base = datetime.date(1992, 1, 1)
    daily: dict[int, int] = {}
    for r in rows:
        d = (r["o_orderdate"].date() - base).days
        daily[d] = daily.get(d, 0) + int(round(r["o_totalprice"] * 100)) // 100000
    mid = (min(daily) + max(daily)) // 2
    s1 = sorted(v for d, v in daily.items() if d <= mid)
    s2 = sorted(v for d, v in daily.items() if d > mid)
    n1, n2 = len(s1), len(s2)
    grid = sorted(set(s1) | set(s2))
    best = (-1, None)
    import bisect

    for x in grid:
        c1 = bisect.bisect_right(s1, x)
        c2 = bisect.bisect_right(s2, x)
        gap = abs(c1 * n2 - c2 * n1)
        if gap > best[0]:
            best = (gap, x)
    row = QUERIES["ks_2samp"](spark, SF).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["d_scaled"] == best[0]
    assert row["at_value"] == best[1]
    assert row["d_ppm"] == best[0] * 1000000 // (n1 * n2)
    # same underlying distribution in both halves: D should be small
    # (KS 0.001 critical ~ 1.95*sqrt((n1+n2)/(n1*n2)))
    crit = 1.95 * math.sqrt((n1 + n2) / (n1 * n2))
    assert row["d_ppm"] / 1e6 < crit


# ------------------------------------------------------ decision stump


def test_best_stump_python_replay(spark):
    rows = load_table(spark, "lineitem", SF).select("l_discount", "l_returnflag").collect()
    hist: dict[int, list[int]] = {}
    for r in rows:
        disc = int(round(r["l_discount"] * 100))
        hist.setdefault(disc, [0, 0])
        hist[disc][0] += 1
        hist[disc][1] += 1 if r["l_returnflag"] == "R" else 0
    discs = sorted(hist)
    nt = sum(v[0] for v in hist.values())
    pt = sum(v[1] for v in hist.values())
    out = {r["disc"]: r for r in QUERIES["best_stump"](spark, SF).collect()}
    nl = pl = 0
    ginis = {}
    for disc in discs:
        nl += hist[disc][0]
        pl += hist[disc][1]
        if nl >= nt:
            continue
        nr, pr = nt - nl, pt - pl
        gl = math.floor(2e6 * pl * (nl - pl) / (nl * nl))
        gr = math.floor(2e6 * pr * (nr - pr) / (nr * nr))
        ginis[disc] = (nl * gl + nr * gr) // nt
        row = out[disc]
        assert (row["nl"], row["nr"], row["pl"], row["pr"]) == (nl, nr, pl, pr)
        assert row["gini_micro"] == ginis[disc]
    assert set(out) == set(ginis)
    best = min(ginis.values())
    for disc, row in out.items():
        assert row["is_best"] == (ginis[disc] == best)
    # gini of a split is bounded by the 2p(1-p) maximum of 0.5e6... x2 scale
    assert all(0 <= r["gini_micro"] <= 1_000_000 for r in out.values())


# -------------------------------------------------- Simpson's paradox


def test_simpson_probe_python_replay(spark):
    rows = load_table(spark, "lineitem", SF).select(
        "l_returnflag", "l_discount", "l_quantity"
    ).collect()
    per: dict[str, list] = {}
    pooled = []
    for r in rows:
        x = int(round(r["l_discount"] * 100))
        y = int(r["l_quantity"])
        per.setdefault(r["l_returnflag"], []).append((x, y))
        pooled.append((x, y))

    def slope(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)

    ps = slope(pooled)
    out = {r["grp"]: r for r in QUERIES["simpson_probe"](spark, SF).collect()}
    assert set(out) == set(per)
    for g, pts in per.items():
        row = out[g]
        assert row["n"] == len(pts)
        assert abs(row["slope_r"] - slope(pts)) < 1e-9
        assert abs(row["pooled_slope_r"] - ps) < 1e-9
        assert row["sign_reversed"] == ((slope(pts) > 0) != (ps > 0))


# --------------------------------------------------- Lorenz and Gini


def test_lorenz_python_replay(spark):
    rows = load_table(spark, "orders", SF).select("o_custkey", "o_totalprice").collect()
    rev: dict[int, int] = {}
    for r in rows:
        rev[r["o_custkey"]] = rev.get(r["o_custkey"], 0) + int(
            round(r["o_totalprice"] * 100)
        )
    ordered = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ordered)
    total = sum(v for _, v in ordered)
    ix = sum(i * v for i, (_, v) in enumerate(ordered, start=1))
    gini = round((2.0 * ix - (n + 1.0) * total) / (n * total), 6)
    # NTILE(10): first (n % 10) deciles get ceil(n/10)
    sizes = [n // 10 + (1 if d <= n % 10 else 0) for d in range(1, 11)]
    out = {r["decile"]: r for r in QUERIES["lorenz_revenue"](spark, SF).collect()}
    pos = 0
    cum = 0
    for d, sz in enumerate(sizes, start=1):
        chunk = ordered[pos : pos + sz]
        pos += sz
        cents = sum(v for _, v in chunk)
        cum += cents
        row = out[d]
        assert row["n_cust"] == sz
        assert row["cents"] == cents
        assert row["cum_share_ppm"] == cum * 1000000 // total
        assert abs(row["gini_r"] - gini) < 1e-9
    # Lorenz curve is convex increasing to exactly 1
    assert out[10]["cum_share_ppm"] == 1000000
    shares = [out[d]["cum_share_ppm"] for d in range(1, 11)]
    assert shares == sorted(shares)
    assert 0.0 <= out[1]["gini_r"] < 1.0


# ------------------------------------------- popularity baseline eval


def test_popularity_hit10_python_replay(spark):
    orders = load_table(spark, "orders", SF).collect()
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_partkey").collect()
    by_c: dict[int, list] = {}
    for r in orders:
        by_c.setdefault(r["o_custkey"], []).append(r)
    test_orders = {}
    train_orders = set()
    n_excluded = 0
    for c, rs in by_c.items():
        rs.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]), reverse=True)
        if len(rs) == 1:
            n_excluded += 1
            continue
        test_orders[rs[0]["o_orderkey"]] = c
        train_orders |= {r["o_orderkey"] for r in rs[1:]}
    cnt: Counter = Counter()
    for r in li:
        if r["l_orderkey"] in train_orders:
            cnt[r["l_partkey"]] += 1
    # count distinct orders per part
    seen = set()
    cnt = Counter()
    for r in li:
        if r["l_orderkey"] in train_orders and (r["l_orderkey"], r["l_partkey"]) not in seen:
            seen.add((r["l_orderkey"], r["l_partkey"]))
            cnt[r["l_partkey"]] += 1
    top10 = {p for p, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]}
    hit_custs = set()
    for r in li:
        if r["l_orderkey"] in test_orders and r["l_partkey"] in top10:
            hit_custs.add(test_orders[r["l_orderkey"]])
    row = QUERIES["popularity_hit10"](spark, SF).collect()[0]
    assert row["n_eval"] == len(test_orders)
    assert row["n_excluded"] == n_excluded
    assert row["n_hits"] == len(hit_custs)
    assert row["hit_ppm"] == len(hit_custs) * 1000000 // max(len(test_orders), 1)
    assert 0 <= row["hit_ppm"] <= 1000000


# --------------------------------------------------------- runs test


def test_runs_test_python_replay(spark):
    rows = load_table(spark, "orders", SF).select("o_orderdate", "o_totalprice").collect()
    import datetime

    base = datetime.date(1992, 1, 1)
    daily: dict[int, int] = {}
    for r in rows:
        d = (r["o_orderdate"].date() - base).days
        daily[d] = daily.get(d, 0) + int(round(r["o_totalprice"] * 100)) // 100000
    ordered = sorted(daily.items(), key=lambda kv: (kv[1], kv[0]))
    med = ordered[(len(ordered) + 1) // 2 - 1][1]
    seq = [1 if x > med else 0 for d, x in sorted(daily.items()) if x != med]
    n1 = sum(seq)
    n2 = len(seq) - n1
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    row = QUERIES["runs_test"](spark, SF).collect()[0]
    assert (row["n1"], row["n2"], row["r"]) == (n1, n2, runs)
    e = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
        / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
    )
    assert abs(row["expected_r"] - round(e, 6)) < 1e-9
    assert abs(row["z_r"] - round((runs - e) / math.sqrt(var), 6)) < 1e-9
    # daily totals from a uniform synthetic calendar are serially random
    assert abs(row["z_r"]) < 3.3


# ------------------------------------------------------ Hurst exponent


def test_hurst_rs_python_replay(spark):
    rows = load_table(spark, "orders", SF).select("o_orderdate", "o_totalprice").collect()
    import datetime

    base = datetime.date(1992, 1, 1)
    daily: dict[int, int] = {}
    for r in rows:
        d = (r["o_orderdate"].date() - base).days
        daily[d] = daily.get(d, 0) + int(round(r["o_totalprice"] * 100)) // 100000
    xs = [x for _, x in sorted(daily.items())]
    per_m = {}
    for m in (8, 16, 32, 64):
        rss = []
        for b in range(len(xs) // m):
            blk = xs[b * m : (b + 1) * m]
            s = sum(blk)
            sxx = sum(v * v for v in blk)
            cum = 0
            devs = []
            for j, v in enumerate(blk, start=1):
                cum += v
                devs.append(m * cum - j * s)
            rs = (max(devs) - min(devs)) / math.sqrt(m * sxx - s * s)
            rss.append(math.floor(1e6 * rs))
        per_m[m] = (len(rss), sum(rss) // len(rss))
    pts = [(math.log(m), math.log(mean / 1e6)) for m, (_, mean) in per_m.items()]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    out = {r["m"]: r for r in QUERIES["hurst_rs"](spark, SF).collect()}
    assert set(out) == set(per_m)
    for m, (nb, mean) in per_m.items():
        assert out[m]["n_blocks"] == nb
        assert out[m]["mean_rs_micro"] == mean
        assert abs(out[m]["hurst_r"] - round(h, 6)) < 2e-6
    # an i.i.d.-like series should sit near H = 0.5, far from 1
    assert 0.2 < out[8]["hurst_r"] < 0.8
