"""HITS and link prediction vs NumPy/pure-Python oracles."""

from __future__ import annotations

import math

import numpy as np
import pytest

from alp_spark.algorithms import hits, link_prediction_scores

from .fixtures import edges_df


def _hits_numpy(n, edges, iters):
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] = 1.0
    h = np.ones(n)
    for _ in range(iters):
        a = A.T @ h
        na = np.linalg.norm(a)
        a = a / na if na else a
        h = A @ a
        nh = np.linalg.norm(h)
        h = h / nh if nh else h
    return a, h


DIGRAPH = [
    # two hub-ish authorities (4, 5), several hubs, one isolated vertex 7
    (0, 4), (0, 5), (1, 4), (1, 5), (2, 4), (3, 5), (6, 4), (2, 6), (5, 0),
]


def test_hits_matches_numpy(spark):
    n, iters = 8, 4
    res = hits(spark, edges_df(spark, DIGRAPH), n, iters=iters)
    want_a, want_h = _hits_numpy(n, DIGRAPH, iters)
    got_a, got_h = np.zeros(n), np.zeros(n)
    for r in res.auth.collect():
        got_a[r["id"]] = r["val"]
    for r in res.hubs.collect():
        got_h[r["id"]] = r["val"]
    np.testing.assert_allclose(got_a, want_a, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got_h, want_h, rtol=1e-12, atol=1e-12)
    assert res.rounds == iters
    # unit 2-norm invariant + isolated vertex structurally absent
    assert abs(np.linalg.norm(got_a) - 1.0) < 1e-12
    assert abs(np.linalg.norm(got_h) - 1.0) < 1e-12
    assert res.auth.where("id = 7").count() == 0
    assert res.hubs.where("id = 7").count() == 0


def test_hits_rejects_zero_iters(spark):
    with pytest.raises(ValueError):
        hits(spark, edges_df(spark, DIGRAPH), 8, iters=0)


def _linkpred_python(n, sym, min_common):
    nbr = {i: set() for i in range(n)}
    for s, d in sym:
        nbr[s].add(d)
    deg = {i: len(v) for i, v in nbr.items()}
    out = {}
    for u in range(n):
        for v in range(u + 1, n):
            if v in nbr[u]:
                continue
            com = nbr[u] & nbr[v]
            if len(com) < min_common:
                continue
            aa = sum(1.0 / math.log(deg[w]) for w in com)
            jac = len(com) / (deg[u] + deg[v] - len(com))
            out[(u, v)] = (len(com), jac, aa)
    return out


def _sym(edges):
    return sorted({(a, b) for a, b in edges} | {(b, a) for a, b in edges})


# square 0-1-2-3-0 plus chords through a hub 4 touching 0,1,2,3
UNDIRECTED = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 0), (4, 1), (4, 2), (4, 3)]


def test_link_prediction_exact(spark):
    sym = _sym(UNDIRECTED)
    got = {
        (r["u"], r["v"]): (r["common"], r["jaccard"], r["adamic_adar"])
        for r in link_prediction_scores(
            edges_df(spark, sym), min_common=1
        ).collect()
    }
    want = _linkpred_python(5, sym, 1)
    assert set(got) == set(want)
    for k, (c, jac, aa) in want.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(jac, rel=1e-12)
        assert got[k][2] == pytest.approx(aa, rel=1e-12)
    # adjacent pairs must not be scored
    assert all((u, v) not in got for u, v in sym if u < v)


def test_link_prediction_center_cap(spark):
    sym = _sym(UNDIRECTED)
    # cap below hub 4's degree (4): only degree-≤3 centres count wedges
    got = {
        (r["u"], r["v"]): r["common"]
        for r in link_prediction_scores(
            edges_df(spark, sym), min_common=1, max_center_degree=3
        ).collect()
    }
    # (0,2): centres {1, 3, 4} but 4 is capped → common 2
    assert got[(0, 2)] == 2
