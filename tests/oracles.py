"""Pure-python reference implementations used as golden oracles."""

from __future__ import annotations


def py_pagerank(
    edges: list[tuple[int, int]],
    d: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 1000,
) -> dict[int, float]:
    """Power iteration with uniform teleport and dangling-mass
    redistribution — the textbook formulation our engine must match to
    allclose 1e-6."""
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    out: dict[int, list[int]] = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    n = len(nodes)
    r = {x: 1.0 / n for x in nodes}
    for _ in range(max_iter):
        dm = sum(r[x] for x in nodes if x not in out)
        new = {x: (1 - d) / n + d * dm / n for x in nodes}
        for u, vs in out.items():
            c = r[u] / len(vs)
            for v in vs:
                new[v] += d * c
        delta = max(abs(new[x] - r[x]) for x in nodes)
        r = new
        if delta < tol:
            break
    return r


def py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find: every vertex → min id of its undirected component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def py_triangles(edges: list[tuple[int, int]]) -> tuple[dict[int, int], int]:
    """Exact per-vertex + total triangle counts (undirected simple graph)."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    per = {v: 0 for v in adj}
    total = 0
    seen = set()
    for u in adj:
        for v in adj[u]:
            if (min(u, v), max(u, v)) in seen:
                continue
            seen.add((min(u, v), max(u, v)))
            for w in adj[u] & adj[v]:
                if w > max(u, v):
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
                    total += 1
    return per, total


def py_lpa(edges: list[tuple[int, int]], max_iter: int) -> dict[int, int]:
    """Synchronous LPA, most-frequent neighbor label, ties → smallest
    label — the exact tie-break contract of the engine."""
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    adj: dict[int, set[int]] = {x: set() for x in nodes}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    labels = {x: x for x in nodes}
    for _ in range(max_iter):
        new = {}
        for x in nodes:
            if not adj[x]:
                new[x] = labels[x]
                continue
            counts: dict[int, int] = {}
            for nb in adj[x]:
                counts[labels[nb]] = counts.get(labels[nb], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[x] = best[0]
        labels = new
    return labels


def zipf_digraph(n: int = 200, m: int = 1200, seed: int = 7) -> list[tuple[int, int]]:
    """Skewed random digraph (hub sources via Zipf) for golden tests."""
    import numpy as np

    rng = np.random.default_rng(seed)
    edges = set()
    for _ in range(m):
        u, v = int(rng.zipf(1.5) % n), int(rng.integers(0, n))
        if u != v:
            edges.add((u, v))
    return sorted(edges)


def py_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Peel to fixpoint: vertices of the k-core → within-core degree."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        drop = [v for v, ns in adj.items() if len(ns) < k]
        changed = bool(drop)
        for v in drop:
            for w in adj[v]:
                adj[w].discard(v)
            del adj[v]
    return {v: len(ns) for v, ns in adj.items()}


def py_bfs(edges: list[tuple[int, int]], source: int) -> dict[int, int]:
    """Hop distances from source over the directed edge list."""
    out: dict[int, list[int]] = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    dist = {source: 0}
    frontier = [source]
    while frontier:
        nxt = []
        for u in frontier:
            for v in out.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def py_core_numbers(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Sequential min-degree peel (Batagelj-Zaveršnik) → coreness."""
    import heapq

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed: set[int] = set()
    core: dict[int, int] = {}
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue
        k = max(k, d)
        core[v] = k
        removed.add(v)
        for w in adj[v]:
            if w not in removed:
                deg[w] -= 1
                heapq.heappush(heap, (deg[w], w))
    return core


def py_ktruss(edges: list[tuple[int, int]], k: int) -> dict[tuple[int, int], int]:
    """Simultaneous-drop truss peel; surviving canonical edge → support."""
    cur = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    while True:
        adj: dict[int, set[int]] = {}
        for u, v in cur:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(adj[u] & adj[v])
            for u, v in cur
        }
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return sup
        cur = nxt


def py_scc(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; vertex → min id of its SCC."""
    out: dict[int, list[int]] = {}
    verts: set[int] = set()
    for u, v in edges:
        if u == v:
            continue
        out.setdefault(u, []).append(v)
        verts.add(u)
        verts.add(v)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    result: dict[int, int] = {}
    counter = [0]

    for s in verts:
        if s in index:
            continue
        work = [(s, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recursed = False
            ns = out.get(v, [])
            for i in range(pi, len(ns)):
                w = ns[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recursed = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
    return result


def py_betweenness(
    edges: list[tuple[int, int]], sources: list[int], max_depth: int
) -> dict[int, float]:
    """Bounded-depth Brandes from a landmark set (undirected)."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    bc = {v: 0.0 for v in adj}
    for s in sources:
        if s not in adj:
            continue
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for d in range(1, max_depth + 1):
            nxt: dict[int, int] = {}
            for u in levels[d - 1]:
                for w in adj[u]:
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[u]
            if not nxt:
                break
            for w, sg in nxt.items():
                dist[w] = d
                sigma[w] = sg
            levels.append(sorted(nxt))
        delta = {v: 0.0 for v in dist}
        for d in range(len(levels) - 2, -1, -1):
            for v in levels[d]:
                tot = 0.0
                for w in adj[v]:
                    if dist.get(w) == d + 1:
                        tot += sigma[v] / sigma[w] * (1.0 + delta[w])
                delta[v] = tot
            if d >= 1:
                for v in levels[d]:
                    bc[v] += delta[v]
    return bc


def py_sssp(
    edges: list[tuple[int, int, int]], sources: list[int]
) -> dict[int, int]:
    """Dijkstra over the directed weighted edge list."""
    import heapq

    out: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in edges:
        if u == v:
            continue
        out.setdefault(u, []).append((v, w))
    dist: dict[int, int] = {}
    heap = [(0, s) for s in sources]
    while heap:
        d, v = heapq.heappop(heap)
        if v in dist:
            continue
        dist[v] = d
        for w_, wt in out.get(v, []):
            if w_ not in dist:
                heapq.heappush(heap, (d + wt, w_))
    return dist


def py_betweenness_weighted(
    edges: list[tuple[int, int, int]], sources: list[int]
) -> dict[int, float]:
    """Exact weighted Brandes from a landmark set over the directed
    weighted edge list (symmetrize before calling for undirected
    semantics): Dijkstra distances, σ accumulated in increasing-dist
    order, δ back-propagated in decreasing-dist order."""
    import heapq

    adj: dict[int, list[tuple[int, int]]] = {}
    best: dict[tuple[int, int], int] = {}
    verts = set()
    for u, v, w in edges:
        if u == v:
            continue
        k = (u, v)
        if k not in best or w < best[k]:
            best[k] = w
        verts.add(u)
        verts.add(v)
    for (u, v), w in best.items():
        adj.setdefault(u, []).append((v, w))
    bc = {v: 0.0 for v in verts}
    for s in sources:
        dist: dict[int, int] = {s: 0}
        pq = [(0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, []):
                nd = d + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        order = sorted(dist, key=lambda x: dist[x])
        sigma = {v: 0 for v in dist}
        sigma[s] = 1
        preds: dict[int, list[int]] = {v: [] for v in dist}
        for u in order:
            for v, w in adj.get(u, []):
                if v in dist and dist[u] + w == dist[v]:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = {v: 0.0 for v in dist}
        for v in reversed(order):
            for u in preds[v]:
                if sigma[v] > 0:
                    delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
            if v != s:
                bc[v] += delta[v]
    return bc


def py_modularity(sym_edges: list[tuple[int, int, float]], comm: dict[int, int]) -> float:
    """Q over a SYMMETRIZED weighted edge list (self-loops at 2x their
    undirected weight — the louvain contraction convention)."""
    two_m = sum(w for _u, _v, w in sym_edges)
    if not two_m:
        return 0.0
    win: dict[int, float] = {}
    ktot: dict[int, float] = {}
    for u, v, w in sym_edges:
        cu, cv = comm[u], comm[v]
        ktot[cu] = ktot.get(cu, 0.0) + w
        if cu == cv:
            win[cu] = win.get(cu, 0.0) + w
    return sum(
        win.get(c, 0.0) / two_m - (ktot[c] / two_m) ** 2 for c in ktot
    )


def py_louvain(
    sym_edges: list[tuple[int, int, float]],
    max_levels: int = 6,
    max_sweeps: int = 12,
) -> dict[int, int]:
    """Replays pregel.louvain's EXACT schedule in pure python: parity-
    alternating synchronous sweeps, gain (w_vc − w_own)/m −
    k_v(Σtot_c' − Σtot_cv + k_v)/(2m²), ties (gain desc, comm asc),
    phase-1 ends after an idle sweep pair, min-member relabel,
    contraction with 2x self-loops."""
    # dedup parallel rows like the engine's groupBy(src,dst).sum
    acc: dict[tuple[int, int], float] = {}
    for u, v, w in sym_edges:
        acc[(u, v)] = acc.get((u, v), 0.0) + w
    edges = {k: w for k, w in acc.items()}
    mapping = {v: v for k in edges for v in k}
    for _level in range(max_levels):
        nodes = sorted({v for k in edges for v in k})
        comm = {v: v for v in nodes}
        m = sum(edges.values()) / 2.0
        if not m:
            break
        k_str = {v: 0.0 for v in nodes}
        for (u, v), w in edges.items():
            k_str[u] += w
        level_moves = 0
        idle = 0
        frontier = None  # None => every vertex (mirrors the engine)
        for sweep in range(max_sweeps):
            tot: dict[int, float] = {}
            for v in nodes:
                tot[comm[v]] = tot.get(comm[v], 0.0) + k_str[v]
            # v -> neighbor community mass (self edge excluded),
            # frontier-scoped like the engine
            w_vc: dict[int, dict[int, float]] = {}
            for (u, v), w in edges.items():
                if u == v:
                    continue
                if frontier is not None and u not in frontier:
                    continue
                d = w_vc.setdefault(u, {})
                c = comm[v]
                d[c] = d.get(c, 0.0) + w
            moved = {}
            for v in nodes:
                if v % 2 != sweep % 2:
                    continue
                if frontier is not None and v not in frontier:
                    continue
                cands = w_vc.get(v, {})
                w_own = cands.get(comm[v], 0.0)
                best = None
                for c, wc in cands.items():
                    if c == comm[v]:
                        continue
                    g = (wc - w_own) / m - k_str[v] * (
                        tot[c] - tot[comm[v]] + k_str[v]
                    ) / (2.0 * m * m)
                    if g > 0 and (
                        best is None or g > best[0] or (g == best[0] and c < best[1])
                    ):
                        best = (g, c)
                if best is not None:
                    moved[v] = best[1]
            for v, c in moved.items():
                comm[v] = c
            pool = frontier if frontier is not None else set(nodes)
            unprocessed = {v for v in pool if v % 2 != sweep % 2}
            movers = set(moved)
            nbrs = {
                v
                for (u, v) in edges
                if u in movers and u != v
            }
            frontier = unprocessed | movers | nbrs
            level_moves += len(moved)
            idle = idle + 1 if not moved else 0
            if idle >= 2:
                break
            if not frontier:
                break
        if level_moves == 0:
            break
        # min-member relabel
        rep: dict[int, int] = {}
        for v in nodes:
            rep[comm[v]] = min(rep.get(comm[v], v), v)
        comm = {v: rep[comm[v]] for v in nodes}
        mapping = {o: comm[c] for o, c in mapping.items()}
        # contract
        new_edges: dict[tuple[int, int], float] = {}
        for (u, v), w in edges.items():
            key = (comm[u], comm[v])
            new_edges[key] = new_edges.get(key, 0.0) + w
        edges = new_edges
        if len({v for k in edges for v in k}) <= 1:
            break
    return mapping
