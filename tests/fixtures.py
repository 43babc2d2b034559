"""Deterministic graph/vector fixtures (FIXTURES.md §2-3), seed=42.

These stand in for the reference's SuiteSparse/SNAP test graphs
(west0497, facebook_combined — SURVEY.md §5); golden outputs come from
the NumPy oracles in tests/oracles.py which transliterate the reference
algorithm semantics.
"""

from __future__ import annotations

import numpy as np

SEED = 42


def g10_line_hub() -> tuple[int, list[tuple[int, int]]]:
    """10 vertices: near-complete cycle, vertex 8 dangling (no out-edges),
    vertex 9 a hub linking to all — the small_pagerank shape
    (ref tests/smoke/smoketests.sh:154)."""
    edges = []
    for i in range(10):
        if i == 8:
            continue  # dangling
        if i != 9:
            edges.append((i, (i + 1) % 10))
    for j in range(9):
        edges.append((9, j))
    return 10, sorted(set(edges))


def g2_components() -> tuple[int, list[tuple[int, int]]]:
    """12 vertices, two components {0..6} (tree + extra edges) and {7..11}
    (cycle); undirected (both directions)."""
    rng = np.random.default_rng(SEED)
    und = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]  # tree on 0..6
    extra = set()
    while len(extra) < 4:
        a, b = rng.integers(0, 7, size=2)
        if a != b and (a, b) not in und and (b, a) not in und:
            extra.add((int(min(a, b)), int(max(a, b))))
    und += sorted(extra)
    und += [(7, 8), (8, 9), (9, 10), (10, 11), (11, 7)]  # cycle on 7..11
    edges = sorted({(a, b) for a, b in und} | {(b, a) for a, b in und})
    return 12, edges


def g_dangling(n: int = 20) -> tuple[int, list[tuple[int, int]]]:
    """Random DAG, ~25% of vertices with out-degree 0."""
    rng = np.random.default_rng(SEED)
    dangling = set(rng.choice(n, size=n // 4, replace=False).tolist())
    edges = set()
    for u in range(n):
        if u in dangling:
            continue
        for _ in range(3):
            v = int(rng.integers(u + 1, n + 1))
            if v < n and v != u:
                edges.add((u, v))
    return n, sorted(edges)


def g_seeded_labels() -> tuple[int, list[tuple[int, int, float]], dict[int, float]]:
    """30 vertices: two dense blobs {0..14} and {15..29} bridged by 2 edges;
    symmetric unit weights; seeds on vertices 0,1 (label 1.0) and 15,16
    (label 0.0)."""
    rng = np.random.default_rng(SEED)
    und = set()
    for lo, hi in ((0, 15), (15, 30)):
        ids = list(range(lo, hi))
        for i in range(lo, hi - 1):
            und.add((i, i + 1))
        for _ in range(25):
            a, b = rng.choice(ids, size=2, replace=False)
            und.add((int(min(a, b)), int(max(a, b))))
    und.add((7, 22))
    und.add((3, 27))
    edges = sorted({(a, b, 1.0) for a, b in und} | {(b, a, 1.0) for a, b in und})
    seeds = {0: 1.0, 1: 1.0, 15: 0.0, 16: 0.0}
    return 30, edges, seeds


def g_triangles() -> tuple[int, list[tuple[int, int]], int]:
    """Undirected graph with exactly 11 triangles: 8 disjoint + 3 sharing an
    edge, plus chain noise. Returns (n, directed-both-ways edges, count)."""
    und = set()
    v = 0
    for _ in range(8):  # 8 disjoint triangles on vertices 0..23
        a, b, c = v, v + 1, v + 2
        und |= {(a, b), (b, c), (a, c)}
        v += 3
    # 3 triangles sharing edge (24,25): apexes 26,27,28
    und |= {(24, 25)}
    for apex in (26, 27, 28):
        und |= {(24, apex), (25, apex)}
    # chain noise 29..33 (no triangles)
    for i in range(29, 33):
        und.add((i, i + 1))
    n = 34
    edges = sorted({(a, b) for a, b in und} | {(b, a) for a, b in und})
    return n, edges, 11


def g497_powerlaw(n: int = 497, m: int = 4, seed: int = SEED) -> tuple[int, list[tuple[int, int]]]:
    """Preferential-attachment digraph (analog of west0497's 497 vertices)."""
    rng = np.random.default_rng(seed)
    targets = list(range(m))
    repeated: list[int] = list(range(m))
    edges = set()
    for u in range(m, n):
        for t in set(targets):
            if t != u:
                edges.add((u, int(t)))
                repeated += [u, int(t)]
        targets = [repeated[i] for i in rng.integers(0, len(repeated), size=m)]
    return n, sorted(edges)


def g_hub_skew(n: int = 10_000, seed: int = SEED) -> tuple[int, list[tuple[int, int]]]:
    """Zipf(1.3) out-degrees; hub vertex 0 holds ~5% of edges."""
    rng = np.random.default_rng(seed)
    edges = set()
    degs = np.minimum(rng.zipf(1.3, size=n), n // 10)
    total = int(degs.sum())
    hub_edges = max(total // 20, 100)
    for v in rng.integers(1, n, size=hub_edges):
        edges.add((0, int(v)))
    for u in range(1, n):
        for v in rng.integers(0, n, size=int(degs[u]) % 50):
            if int(v) != u:
                edges.add((u, int(v)))
    return n, sorted(edges)


def edges_df(spark, edges, val: bool = False):
    from alp_spark.containers import matrix_schema

    if val:
        return spark.createDataFrame(
            [(int(a), int(b), float(w)) for a, b, w in edges], matrix_schema("double")
        )
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], matrix_schema(None)
    )


def vec_df(spark, pairs, val_type="double"):
    from alp_spark.containers import vector_schema

    return spark.createDataFrame(list(pairs), vector_schema(val_type))


# §3 vector fixtures
V_DENSE10 = [(i, (i + 1) / 10.0) for i in range(10)]
V_SPARSE10 = [(1, 1.0), (3, 2.0), (5, 3.0)]
MASK10 = [(i, True) for i in (0, 2, 4, 6, 8)]
