"""Pure-numpy implementations of the reference recurrences.

These are the parity targets for every Spark implementation (SURVEY.md §5):
they transcribe the *semantics* of the reference kernels (not the code) —
including PageRank's pre-divided state, undivided final iteration and
dropped dangling mass (toolkits/pagerank.cpp:36-44, 77-97), CC's min-label
fixpoint over the symmetrized multiset (toolkits/cc.cpp:22-109 +
core/graph.hpp:572-587 non-deduped symmetrization), and the two extension
kernels (label propagation with mode combiner, triangle counting by
degree-ordered intersection) whose semantics SURVEY.md §2.3 A6/A7 defines.
"""

from __future__ import annotations

import numpy as np


def pagerank_ref(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int = 20, d: float = 0.85
) -> np.ndarray:
    """Reference PageRank recurrence (pagerank.cpp:24-99).

    State is stored pre-divided by out-degree between iterations; the final
    iteration leaves values undivided; dangling vertices emit nothing (their
    mass is dropped, not redistributed).
    """
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    curr = np.ones(n, dtype=np.float64)
    nz = outdeg > 0
    curr[nz] /= outdeg[nz]
    for i in range(iters):
        nxt = np.zeros(n, dtype=np.float64)
        np.add.at(nxt, dst, curr[src])
        nxt = (1.0 - d) + d * nxt
        if i != iters - 1:
            nxt[nz] /= outdeg[nz]
        curr = nxt
    return curr


def pagerank_redist_ref(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int = 20, d: float = 0.85
) -> np.ndarray:
    """pagerank_ref with textbook dangling-mass redistribution: each
    iteration adds Σ_{dangling} rank / n to every vertex's incoming sum
    (dangling state is undivided, so curr[~nz] IS the dangling rank)."""
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    curr = np.ones(n, dtype=np.float64)
    nz = outdeg > 0
    curr[nz] /= outdeg[nz]
    for i in range(iters):
        dm = float(curr[~nz].sum())
        nxt = np.zeros(n, dtype=np.float64)
        np.add.at(nxt, dst, curr[src])
        nxt = (1.0 - d) + d * (nxt + dm / n)
        if i != iters - 1:
            nxt[nz] /= outdeg[nz]
        curr = nxt
    return curr


def symmetrize(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Non-deduping symmetrization (graph.hpp:572-587): every edge also
    reversed; parallel edges preserved."""
    return np.concatenate([src, dst]), np.concatenate([dst, src])


def cc_ref(src: np.ndarray, dst: np.ndarray, n: int, max_iters: int = 1000) -> np.ndarray:
    """Min-label propagation (HashMin) over the symmetrized graph to
    fixpoint — synchronous Jacobi iterations; the converged labels equal
    the reference's converged labels (cc.cpp:22-109)."""
    s, t = symmetrize(src, dst)
    label = np.arange(n, dtype=np.int64)
    for _ in range(max_iters):
        nxt = label.copy()
        np.minimum.at(nxt, t, label[s])
        if np.array_equal(nxt, label):
            break
        label = nxt
    return label


def lp_ref(src: np.ndarray, dst: np.ndarray, n: int, iters: int = 10) -> np.ndarray:
    """Label propagation, SURVEY §2.3 A6 semantics: synchronized updates on
    the symmetrized multiset graph; new label = most frequent incoming
    label, ties broken by smallest label; isolated vertices keep theirs."""
    s, t = symmetrize(src, dst)
    label = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        lab_in = label[s]
        # count (dst, label) pairs
        key = t * (n + 1) + lab_in
        uk, cnt = np.unique(key, return_counts=True)
        kd = uk // (n + 1)
        kl = uk % (n + 1)
        # order by (dst, -count, label): pick first per dst
        order = np.lexsort((kl, -cnt, kd))
        kd, kl = kd[order], kl[order]
        first = np.ones(len(kd), dtype=bool)
        first[1:] = kd[1:] != kd[:-1]
        nxt = label.copy()
        nxt[kd[first]] = kl[first]
        label = nxt
    return label


def tc_ref(src: np.ndarray, dst: np.ndarray, n: int) -> tuple[int, np.ndarray]:
    """Triangle count, SURVEY §2.3 A7: distinct undirected edges, no self
    loops; orient low-(degree, id) → high-(degree, id); count intersections.
    Returns (global_count, per_vertex_counts)."""
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    keep = a != b
    a, b = a[keep], b[keep]
    und = np.unique(a * np.int64(n + 1) + b)
    a, b = und // (n + 1), und % (n + 1)
    deg = np.bincount(np.concatenate([a, b]), minlength=n)
    # rank = (degree, id)
    rank = np.argsort(np.lexsort((np.arange(n), deg)))
    lo = np.where(rank[a] < rank[b], a, b)
    hi = np.where(rank[a] < rank[b], b, a)
    adj: dict[int, set[int]] = {}
    for x, y in zip(lo.tolist(), hi.tolist()):
        adj.setdefault(x, set()).add(y)
    total = 0
    per_v = np.zeros(n, dtype=np.int64)
    for x, y in zip(lo.tolist(), hi.tolist()):
        common = adj.get(x, set()) & adj.get(y, set())
        c = len(common)
        total += c
        if c:
            per_v[x] += c
            per_v[y] += c
            for z in common:
                per_v[z] += 1
    return total, per_v


def sssp_ref(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    root: int = 0,
    max_iters: int = 10000,
) -> np.ndarray:
    """Bellman-Ford relaxation to fixpoint, init 1e9 (sssp.cpp:24-127)."""
    dist = np.full(n, 1e9, dtype=np.float64)
    dist[root] = 0.0
    for _ in range(max_iters):
        nxt = dist.copy()
        np.minimum.at(nxt, dst, dist[src] + w)
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    return dist


def bc_ref(
    src: np.ndarray, dst: np.ndarray, n: int, root: int = 0
) -> np.ndarray:
    """Single-source Brandes dependencies, reference formulation
    (toolkits/bc.cpp:24-198 semantics per SURVEY §2.3 A5): forward BFS
    accumulating path counts; backward level sweep with
    dep[v] = inv[v] + Σ_{w ∈ succ, depth[w]=depth[v]+1} dep[w];
    final value (dep−inv)/inv for reached vertices, 0 elsewhere."""
    depth = bfs_depth_ref(src, dst, n, root)
    sigma = np.zeros(n, dtype=np.float64)
    sigma[root] = 1.0
    maxd = int(depth.max())
    for lv in range(maxd):
        on = (depth[src] == lv) & (depth[dst] == lv + 1)
        np.add.at(sigma, dst[on], sigma[src[on]])
    inv = np.zeros(n, dtype=np.float64)
    reached = depth >= 0
    inv[reached] = 1.0 / sigma[reached]
    dep = np.zeros(n, dtype=np.float64)
    dep[depth == maxd] = inv[depth == maxd]
    for lv in range(maxd - 1, -1, -1):
        acc = np.zeros(n, dtype=np.float64)
        on = (depth[src] == lv) & (depth[dst] == lv + 1)
        np.add.at(acc, src[on], dep[dst[on]])
        sel = depth == lv
        dep[sel] = inv[sel] + acc[sel]
    out = np.zeros(n, dtype=np.float64)
    out[reached] = (dep[reached] - inv[reached]) / inv[reached]
    return out


def bfs_depth_ref(
    src: np.ndarray, dst: np.ndarray, n: int, root: int = 0
) -> np.ndarray:
    """BFS depth from root along directed edges; unreached = -1. (The
    reference's parent array is CAS-race nondeterministic, bfs.cpp:53 —
    depth is the deterministic invariant we test.)"""
    depth = np.full(n, -1, dtype=np.int64)
    depth[root] = 0
    frontier = np.array([root], dtype=np.int64)
    level = 0
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    starts = np.searchsorted(s_sorted, np.arange(n))
    ends = np.searchsorted(s_sorted, np.arange(n) + 1)
    while len(frontier):
        level += 1
        nbrs = np.concatenate(
            [d_sorted[starts[v] : ends[v]] for v in frontier.tolist()]
        ) if len(frontier) else np.array([], dtype=np.int64)
        nbrs = np.unique(nbrs)
        new = nbrs[depth[nbrs] < 0]
        depth[new] = level
        frontier = new
    return depth


def ppr_ref(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    seed_mask: np.ndarray,
    iters: int = 10,
    d: float = 0.85,
) -> np.ndarray:
    """Personalized PageRank: pagerank_ref's recurrence with the uniform
    teleport replaced by the seed indicator — r ← (1-d)·1[v∈S] + d·Σ_in.
    Same reference conventions (pagerank.cpp:24-99): pre-divided state,
    undivided final iteration, dangling mass dropped. Initial state is the
    seed indicator (mass |S|, the analogue of PR's all-ones mass |V|)."""
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    tele = seed_mask.astype(np.float64)
    curr = tele.copy()
    nz = outdeg > 0
    curr[nz] /= outdeg[nz]
    for i in range(iters):
        nxt = np.zeros(n, dtype=np.float64)
        np.add.at(nxt, dst, curr[src])
        nxt = (1.0 - d) * tele + d * nxt
        if i != iters - 1:
            nxt[nz] /= outdeg[nz]
        curr = nxt
    return curr


def k_core_ref(src: np.ndarray, dst: np.ndarray, n: int, k: int) -> np.ndarray:
    """k-core membership by synchronous peeling on the SIMPLE undirected
    graph (distinct pairs, self-loops dropped — the standard k-core
    object): repeatedly remove every vertex whose degree among survivors
    is < k, until fixpoint. Returns a bool mask over 0..n-1; vertices
    absent from the simple edge set are never in the core."""
    m = src != dst
    a = np.minimum(src[m], dst[m])
    b = np.maximum(src[m], dst[m])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    u = np.concatenate([pairs[:, 0], pairs[:, 1]])
    v = np.concatenate([pairs[:, 1], pairs[:, 0]])
    alive = np.zeros(n, dtype=bool)
    alive[u] = True
    while True:
        live = alive[u] & alive[v]
        deg = np.bincount(u[live], minlength=n)
        drop = alive & (deg < k)
        if not drop.any():
            return alive
        alive &= ~drop


def hits_ref(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int = 10
) -> tuple[np.ndarray, np.ndarray]:
    """HITS hubs & authorities (Kleinberg '99), L1-normalized each half-
    step so both engines divide by the same deterministic scalar:
    auth ← Σ_in hub (normalized), hub ← Σ_out auth (normalized).
    Parallel edges weight the sums (multigraph semantics, consistent with
    every other kernel here). Returns (auth, hub)."""
    hub = np.ones(n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(iters):
        auth = np.zeros(n, dtype=np.float64)
        np.add.at(auth, dst, hub[src])
        s = auth.sum()
        if s > 0:
            auth /= s
        hub = np.zeros(n, dtype=np.float64)
        np.add.at(hub, src, auth[dst])
        s = hub.sum()
        if s > 0:
            hub /= s
    return auth, hub


def coreness_ref(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Exact core numbers by textbook sequential peeling on the SIMPLE
    undirected graph (the same object as k_core_ref): peel level k = all
    vertices of remaining degree <= k, cascading, before moving to k+1.
    Returns an int array over 0..n-1; vertices absent from the simple
    edge set get 0."""
    m = src != dst
    a = np.minimum(src[m], dst[m])
    b = np.maximum(src[m], dst[m])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    u = np.concatenate([pairs[:, 0], pairs[:, 1]])
    v = np.concatenate([pairs[:, 1], pairs[:, 0]])
    deg = np.bincount(u, minlength=n).astype(np.int64)
    alive = np.zeros(n, dtype=bool)
    alive[u] = True
    core = np.zeros(n, dtype=np.int64)
    k = 0
    while alive.any():
        while True:
            drop = alive & (deg <= k)
            if not drop.any():
                break
            core[drop] = k
            alive &= ~drop
            live = drop[u] & alive[v]
            np.subtract.at(deg, v[live], 1)
        k += 1
    return core


def _bfs_depths_from(u: np.ndarray, v: np.ndarray, n: int, root: int) -> np.ndarray:
    """Hop depths from root over directed pairs (u -> v); -1 unreached."""
    d = np.full(n, -1, dtype=np.int64)
    d[root] = 0
    frontier = np.array([root], dtype=np.int64)
    lvl = 0
    while frontier.size:
        m = np.isin(u, frontier)
        nxt = np.unique(v[m])
        nxt = nxt[d[nxt] == -1]
        lvl += 1
        d[nxt] = lvl
        frontier = nxt
    return d


def ms_bfs_ref(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    seeds: np.ndarray,
    undirected: bool = True,
) -> dict[int, np.ndarray]:
    """Multi-source BFS reference: per seed the full depth array (-1 for
    unreached), on the simple undirected graph (self-loops dropped) when
    ``undirected`` else on the distinct directed pairs."""
    if undirected:
        m = src != dst
        a = np.minimum(src[m], dst[m])
        b = np.maximum(src[m], dst[m])
        pairs = np.unique(np.stack([a, b], axis=1), axis=0)
        u = np.concatenate([pairs[:, 0], pairs[:, 1]])
        v = np.concatenate([pairs[:, 1], pairs[:, 0]])
    else:
        pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
        u, v = pairs[:, 0], pairs[:, 1]
    return {int(s): _bfs_depths_from(u, v, n, int(s)) for s in seeds}


def harmonic_ref(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    seeds: np.ndarray,
    undirected: bool = True,
) -> np.ndarray:
    """Sampled harmonic centrality: H(v) = sum over seeds s with
    0 < d(s,v) of 1/d(s,v)."""
    depths = ms_bfs_ref(src, dst, n, seeds, undirected)
    h = np.zeros(n, dtype=np.float64)
    for s, d in depths.items():
        m = d > 0
        h[m] += 1.0 / d[m]
    return h


def eccentricity_ref(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    seeds: np.ndarray,
    undirected: bool = True,
) -> dict[int, int]:
    """Per-seed eccentricity within its reachable set (max finite BFS
    depth)."""
    depths = ms_bfs_ref(src, dst, n, seeds, undirected)
    return {s: int(d.max()) for s, d in depths.items()}


def random_walks_ref(
    src: np.ndarray,
    dst: np.ndarray,
    seeds: np.ndarray,
    length: int = 8,
    walks_per_seed: int = 1,
) -> list[tuple[int, int, int, int]]:
    """Deterministic random walks reference: identical neighbor-choice
    arithmetic to graph_algos.random_walks (same constants, same
    dst-ascending distinct-neighbor ranking). Returns a list of
    (seed, walk, step, vertex) rows."""
    VMOD, VMUL, SMUL, WMUL, ADD = 1000003, 69069, 40503, 12345, 7
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    nbrs: dict[int, np.ndarray] = {}
    for s in np.unique(pairs[:, 0]):
        nbrs[int(s)] = np.sort(pairs[pairs[:, 0] == s, 1])
    rows = []
    for s in seeds:
        for w in range(walks_per_seed):
            v = int(s)
            rows.append((int(s), w, 0, v))
            for t in range(1, length + 1):
                out = nbrs.get(v)
                if out is None:
                    break
                idx = ((v % VMOD) * VMUL + t * SMUL + w * WMUL + ADD) % len(out)
                v = int(out[idx])
                rows.append((int(s), w, t, v))
    return rows


def mis_ref(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Deterministic maximal independent set reference: sequential greedy
    over vertices sorted by the SAME (priority, id) key as the parallel
    kernel — the lexicographically-first MIS under that order, which the
    round-parallel local-minima process (graph_algos.
    maximal_independent_set) provably also computes (greedy/parallel
    equivalence for fixed orders, Blelloch-Fineman-Shun). Bool mask over
    0..n-1; vertices with no simple edge are in the set."""
    VMOD, VMUL, ADD, PMOD = 1000003, 69069, 12345, 999983
    m = src != dst
    a = np.minimum(src[m], dst[m])
    b = np.maximum(src[m], dst[m])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    nbrs: dict[int, list] = {}
    for x, y in pairs:
        nbrs.setdefault(int(x), []).append(int(y))
        nbrs.setdefault(int(y), []).append(int(x))
    pri = lambda v: ((v % VMOD) * VMUL + ADD) % PMOD
    in_mis = np.zeros(n, dtype=bool)
    blocked = np.zeros(n, dtype=bool)
    for v in sorted(range(n), key=lambda v: (pri(v), v)):
        if blocked[v]:
            continue
        in_mis[v] = True
        for u in nbrs.get(v, ()):
            blocked[u] = True
    return in_mis


def k_truss_ref(
    src: np.ndarray, dst: np.ndarray, k: int
) -> set[tuple[int, int]]:
    """k-truss reference: synchronous peeling of simple undirected edges
    whose support (triangles among survivors) is < k-2, to fixpoint.
    Returns the surviving (a, b) pairs with a < b."""
    m = src != dst
    a = np.minimum(src[m], dst[m])
    b = np.maximum(src[m], dst[m])
    live = {(int(x), int(y)) for x, y in zip(a, b)}
    need = k - 2
    while True:
        nbrs: dict[int, set] = {}
        for x, y in live:
            nbrs.setdefault(x, set()).add(y)
            nbrs.setdefault(y, set()).add(x)
        drop = {
            (x, y)
            for x, y in live
            if len(nbrs[x] & nbrs[y]) < need
        }
        if not drop:
            return live
        live -= drop
