"""Sequential, single-process oracles the distributed engine is tested against.

``pagerank_ref`` reproduces the reference's update rule *exactly* as verified
in SURVEY.md §5.2 against the compiled ``no-cl`` binary (same iteration
counts 25/29/44 on the fixtures, same printed rank digits):

  rule (ref: src/Graph.cpp:118-173):
    1. N = number of distinct vertices in the edge list; rank = 1/N
       (src/Graph.cpp:124-128)
    2. per iteration: sink_sum = ((1-d) + d * sum(rank[outdeg==0])) / N
       (src/Graph.cpp:135-140) — teleport term folded into the same scalar
    3. rank_new[v] = sink_sum + d * sum_{u->v} rank[u]/outdeg[u]
       over previous-iteration ranks (synchronous / Jacobi)
       (src/Graph.cpp:142-155)
    4. per-vertex freeze at |delta| < 1e-16 via the rank_new = 0.0 sentinel
       (src/Graph.cpp:160-169); frozen vertices stop updating but keep
       contributing their committed rank; stop when all frozen; the final
       all-frozen sweep IS counted (increment at src/Graph.cpp:133).
    5. duplicate edges / self-loops kept (multigraph, src/Graph.cpp:92-97).

``pagerank_sync`` is the plain synchronous power iteration (no freezing) the
distributed engine runs; at DELTA=1e-16 the two agree far below the 1e-6
match tolerance (SURVEY.md §7.6).

These oracles operate on *original* vertex ids (any hashables); all engine
comparisons are by original id, never by dense index (SURVEY.md §7.6).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

DAMPING = 0.85
REF_DELTA = 1e-16


def _index_graph(edges):
    """edges: iterable of (src, dst) original ids. Returns
    (ids_sorted, id2ix, out_deg array, in_adj: list of lists of src ix,
     edge list in dense ix). Multigraph semantics: duplicates kept."""
    edges = list(edges)
    ids = sorted({v for e in edges for v in e})
    id2ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outdeg = np.zeros(n, dtype=np.int64)
    in_adj = [[] for _ in range(n)]
    for s, d in edges:
        si, di = id2ix[s], id2ix[d]
        outdeg[si] += 1
        in_adj[di].append(si)
    return ids, id2ix, outdeg, in_adj


def pagerank_ref(edges, d: float = DAMPING, delta: float = REF_DELTA):
    """Exact reference semantics incl. per-vertex freezing + iteration count.

    Returns (dict original_id -> rank, iterations).
    """
    ids, _, outdeg, in_adj = _index_graph(edges)
    n = len(ids)
    rank = np.full(n, 1.0 / n)
    rank_new = np.ones(n)  # 1.0 = "active" sentinel (ref: src/Graph.cpp:127)
    sinks = np.flatnonzero(outdeg == 0)
    iters = 0
    while True:
        iters += 1  # counted before the all-frozen check (src/Graph.cpp:133)
        sink_sum = ((1.0 - d) + d * rank[sinks].sum()) / n
        any_active = False
        for v in range(n):
            if rank_new[v] == 0.0:  # frozen
                continue
            any_active = True
            acc = 0.0
            for u in in_adj[v]:
                acc += rank[u] / outdeg[u]
            # D multiplied once on the in-link total, matching the
            # reference's rounding (src/Graph.cpp:154) — at DELTA=1e-16 the
            # per-edge-multiply form changes iteration counts
            rank_new[v] = sink_sum + d * acc
        if not any_active:
            break
        for v in range(n):
            if rank_new[v] != 0.0:
                if abs(rank_new[v] - rank[v]) < delta:
                    rank[v] = rank_new[v]
                    rank_new[v] = 0.0  # freeze
                else:
                    rank[v] = rank_new[v]
    return {ids[i]: float(rank[i]) for i in range(n)}, iters


def pagerank_sync(edges, iterations: int, d: float = DAMPING):
    """Plain synchronous power iteration for a fixed number of supersteps.

    Same update rule as the reference minus per-vertex freezing; this is the
    semantics the distributed engine implements. Returns dict id -> rank.
    """
    ids, _, outdeg, in_adj = _index_graph(edges)
    n = len(ids)
    rank = np.full(n, 1.0 / n)
    sinks = np.flatnonzero(outdeg == 0)
    for _ in range(iterations):
        sink_sum = ((1.0 - d) + d * rank[sinks].sum()) / n
        new = np.full(n, sink_sum)
        for v in range(n):
            for u in in_adj[v]:
                new[v] += d * rank[u] / outdeg[u]
        rank = new
    return {ids[i]: float(rank[i]) for i in range(n)}


def pagerank_sync_l1(edges, eps: float = 1e-6, d: float = DAMPING,
                     max_iters: int = 10_000):
    """Synchronous iteration to L1 residual < eps (the north-rule stopping
    criterion). Returns (dict id -> rank, iterations)."""
    ids, _, outdeg, in_adj = _index_graph(edges)
    n = len(ids)
    rank = np.full(n, 1.0 / n)
    sinks = np.flatnonzero(outdeg == 0)
    iters = 0
    while iters < max_iters:
        iters += 1
        sink_sum = ((1.0 - d) + d * rank[sinks].sum()) / n
        new = np.full(n, sink_sum)
        for v in range(n):
            for u in in_adj[v]:
                new[v] += d * rank[u] / outdeg[u]
        l1 = float(np.abs(new - rank).sum())
        rank = new
        if l1 < eps:
            break
    return {ids[i]: float(rank[i]) for i in range(n)}, iters


def connected_components(edges, vertices=None):
    """Undirected connected components via union-find.

    Label = smallest original-id member of the component (matches the
    engine's min-label propagation fixpoint). Returns dict id -> label.
    """
    parent = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def add(x):
        if x not in parent:
            parent[x] = x

    for s, t in edges:
        add(s)
        add(t)
        rs, rt = find(s), find(t)
        if rs != rt:
            # union by smaller id as root → root is the component min
            if rt < rs:
                rs, rt = rt, rs
            parent[rt] = rs
    for v in vertices or ():
        add(v)
    return {v: find(v) for v in parent}


def label_propagation(edges, iterations: int):
    """Synchronous label propagation on the undirected simple graph.

    Init label(v) = v. Each round, every vertex takes the most frequent
    label among its neighbors' *previous-round* labels, tie-broken by the
    smallest label; a vertex with no neighbors keeps its label. Deterministic
    by construction (fixed iteration count, smallest-label tie-break) —
    north-rule N5.
    """
    adj = defaultdict(set)
    for s, t in edges:
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    verts = sorted({v for e in edges for v in e})
    label = {v: v for v in verts}
    for _ in range(iterations):
        new = {}
        for v in verts:
            if not adj[v]:
                new[v] = label[v]
                continue
            cnt = Counter(label[u] for u in adj[v])
            top = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == top)
        label = new
    return label


def triangle_count(edges) -> int:
    """Number of triangles in the undirected simple graph (self-loops and
    duplicate/reverse edges collapsed)."""
    adj = defaultdict(set)
    und = set()
    for s, t in edges:
        if s == t:
            continue
        a, b = (s, t) if s <= t else (t, s)
        und.add((a, b))
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    count = 0
    for a, b in und:
        # count common neighbors greater than both to count each tri once
        count += sum(1 for c in adj[a] & adj[b] if c > b)
    return count
