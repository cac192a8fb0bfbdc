"""Dense/naive reference implementations for algorithm oracles.

Used only in tests (FIXTURES.md §4): small graphs, O(n^2)/O(n^3) is fine.
Semantics deliberately mirror the engine's documented semantics:

- PageRank: ``rank = (1-d)/N + d * sum(rank[u]/outdeg[u])`` over in-neighbors,
  no dangling-mass redistribution (matches FlashGraph's
  ``libgraph-algs/page_rank.cpp`` formula per SURVEY.md §2.2 A1);
  convergence on L1 delta < eps.
- WCC: minimum vertex id per weakly-connected component.
- Triangles: undirected triangle count per vertex (each triangle counts once
  per member vertex).
- k-core: largest k such that the vertex survives iterative peeling.
- BFS: hop distance from a seed set (unreachable = -1).
"""

from __future__ import annotations

import numpy as np


def _vertices(src, dst):
    return np.unique(np.concatenate([src, dst]))


def pagerank_dense(src, dst, d=0.85, eps=1e-6, max_iter=200):
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    s = np.array([idx[v] for v in src])
    t = np.array([idx[v] for v in dst])
    outdeg = np.bincount(s, minlength=n).astype(float)
    rank = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        w = rank[s] / np.maximum(outdeg[s], 1.0)
        np.add.at(contrib, t, w)
        new = (1 - d) / n + d * contrib
        delta = np.abs(new - rank).sum()
        rank = new
        if delta < eps:
            break
    return dict(zip(verts.tolist(), rank.tolist()))


def pagerank_weighted_dense(src, dst, w, d=0.85, eps=1e-6, max_iter=500):
    """Weighted PageRank: rank flows proportionally to edge weight."""
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    s = np.array([idx[v] for v in src])
    t = np.array([idx[v] for v in dst])
    w = np.asarray(w, dtype=float)
    wout = np.zeros(n)
    np.add.at(wout, s, w)
    rank = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, t, rank[s] * w / np.maximum(wout[s], 1e-300))
        new = (1 - d) / n + d * contrib
        delta = np.abs(new - rank).sum()
        rank = new
        if delta < eps:
            break
    return dict(zip(verts.tolist(), rank.tolist()))


def wcc_minlabel(src, dst):
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    parent = np.arange(len(verts))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in zip(src, dst):
        ra, rb = find(idx[a]), find(idx[b])
        if ra != rb:
            parent[ra] = rb
    roots = np.array([find(i) for i in range(len(verts))])
    # min vertex id per component
    comp_min = {}
    for v, r in zip(verts, roots):
        comp_min[r] = min(comp_min.get(r, v), v)
    return {int(v): int(comp_min[r]) for v, r in zip(verts, roots)}


def triangles_per_vertex(src, dst):
    """src/dst assumed to contain both directions of each undirected edge."""
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj = np.zeros((n, n), dtype=bool)
    for a, b in zip(src, dst):
        if a != b:
            adj[idx[a], idx[b]] = True
            adj[idx[b], idx[a]] = True
    counts = np.zeros(n, dtype=np.int64)
    for i in range(n):
        nbrs = np.nonzero(adj[i])[0]
        for jpos in range(len(nbrs)):
            for kpos in range(jpos + 1, len(nbrs)):
                if adj[nbrs[jpos], nbrs[kpos]]:
                    counts[i] += 1
    return {int(v): int(counts[idx[v]]) for v in verts}


def kcore_peel(src, dst):
    """Coreness per vertex by iterative peeling (undirected input)."""
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    nbrs = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            nbrs[idx[a]].add(idx[b])
            nbrs[idx[b]].add(idx[a])
    deg = np.array([len(s) for s in nbrs])
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    k = 0
    while alive.any():
        k += 1
        changed = True
        while changed:
            changed = False
            for i in range(n):
                if alive[i] and deg[i] < k:
                    alive[i] = False
                    core[i] = k - 1
                    for j in nbrs[i]:
                        if alive[j]:
                            deg[j] -= 1
                    changed = True
    return {int(v): int(core[idx[v]]) for v in verts}


def bfs_dist(src, dst, seeds):
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    nbrs = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        nbrs[idx[a]].append(idx[b])
    dist = np.full(n, -1, dtype=np.int64)
    frontier = [idx[s] for s in seeds if s in idx]
    for f in frontier:
        dist[f] = 0
    level = 0
    while frontier:
        level += 1
        nxt = []
        for u in frontier:
            for v in nbrs[u]:
                if dist[v] == -1:
                    dist[v] = level
                    nxt.append(v)
        frontier = nxt
    return {int(v): int(dist[idx[v]]) for v in verts}


def scc_tarjan(src, dst):
    """Iterative Tarjan; returns {vertex: min member id of its SCC}."""
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[idx[a]].append(idx[b])
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack = []
    comp = [-1] * n
    counter = [0]
    comps = []
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                comps.append(members)
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    out = {}
    for members in comps:
        label = min(int(verts[m]) for m in members)
        for m in members:
            out[int(verts[m])] = label
    return out


def betweenness_brandes(src, dst):
    """Exact directed betweenness (Brandes 2001), unnormalized."""
    from collections import deque

    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[idx[a]].append(idx[b])
    bc = np.zeros(n)
    for s in range(n):
        sigma = np.zeros(n); sigma[s] = 1
        dist = np.full(n, -1); dist[s] = 0
        order = []
        preds = [[] for _ in range(n)]
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = np.zeros(n)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {int(v): float(bc[idx[v]]) for v in verts}


def personalized_pagerank_dense(src, dst, seeds, d=0.85, eps=1e-10, max_iter=200):
    """PPR with restart vector p = 1/|S| on seeds; init rank = p."""
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    s = np.array([idx[v] for v in src])
    t = np.array([idx[v] for v in dst])
    outdeg = np.bincount(s, minlength=n).astype(float)
    p = np.zeros(n)
    for sd in seeds:
        p[idx[sd]] = 1.0 / len(seeds)
    rank = p.copy()
    for _ in range(max_iter):
        contrib = np.zeros(n)
        w = rank[s] / np.maximum(outdeg[s], 1.0)
        np.add.at(contrib, t, w)
        new = (1 - d) * p + d * contrib
        if np.abs(new - rank).sum() < eps:
            rank = new
            break
        rank = new
    return dict(zip(verts.tolist(), rank.tolist()))


def sssp_dijkstra(src, dst, w, seeds):
    """Single/multi-source weighted shortest distances (Dijkstra over the
    union of seeds; -1 = unreachable). Non-negative weights only."""
    import heapq

    verts = _vertices(src, dst)
    adj = {v: [] for v in verts}
    for s, d, ww in zip(src, dst, w):
        adj[int(s)].append((int(d), float(ww)))
    dist = {int(v): float("inf") for v in verts}
    heap = []
    for s in seeds:
        if int(s) in dist:
            dist[int(s)] = 0.0
            heapq.heappush(heap, (0.0, int(s)))
    while heap:
        dcur, v = heapq.heappop(heap)
        if dcur > dist[v]:
            continue
        for u, ww in adj[v]:
            nd = dcur + ww
            if nd < dist[u]:
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return {v: (-1.0 if dist[v] == float("inf") else dist[v]) for v in dist}


def katz_dense(src, dst, alpha=0.1, beta=1.0, iters=6):
    """x_{t+1} = beta + alpha * A^T x_t from x = beta (deduped edges)."""
    verts = _vertices(src, dst)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    pairs = sorted({(idx[a], idx[b]) for a, b in zip(src, dst)})
    s = np.array([p[0] for p in pairs], dtype=np.int64)
    t = np.array([p[1] for p in pairs], dtype=np.int64)
    x = np.full(n, beta)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, t, x[s])
        x = beta + alpha * contrib
    return dict(zip(verts.tolist(), x.tolist()))
