"""Property-based semantics checks (hypothesis): eWiseApply union /
intersection, fold, and vxm pinned against pure-Python oracles over
randomly generated sparse vectors and tiny graphs. Few examples per
property — each example is a Spark job."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from alp_spark import algebra as alg
from alp_spark.operators import e_wise_apply, fold_scalar, vxm

from .fixtures import edges_df, vec_df

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

sparse_vec = st.dictionaries(
    st.integers(0, 7),
    st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
    max_size=6,
)

tiny_graph = st.sets(
    st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(lambda e: e[0] != e[1]),
    max_size=12,
)


def _v(df):
    return {r["id"]: r["val"] for r in df.collect()}


@settings(**SETTINGS)
@given(x=sparse_vec, y=sparse_vec)
def test_e_wise_apply_union_is_dict_merge(spark, x, y):
    # monoid form: sparsity union, absent side reads the identity
    out = _v(
        e_wise_apply(
            vec_df(spark, list(x.items())),
            vec_df(spark, list(y.items())),
            alg.add,
            monoid=alg.PLUS,
        )
    )
    want = {k: x.get(k, 0.0) + y.get(k, 0.0) for k in set(x) | set(y)}
    assert set(out) == set(want)
    for k in want:
        assert out[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9)


@settings(**SETTINGS)
@given(x=sparse_vec, y=sparse_vec)
def test_e_wise_apply_operator_is_intersection(spark, x, y):
    out = _v(
        e_wise_apply(
            vec_df(spark, list(x.items())),
            vec_df(spark, list(y.items())),
            alg.mul,
        )
    )
    want = {k: x[k] * y[k] for k in set(x) & set(y)}
    assert set(out) == set(want)
    for k in want:
        assert out[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9)


@settings(**SETTINGS)
@given(x=sparse_vec)
def test_fold_scalar_monoids(spark, x):
    df = vec_df(spark, list(x.items()))
    got_min = fold_scalar(df, alg.MIN)
    got_max = fold_scalar(df, alg.MAX)
    if x:
        assert got_min == pytest.approx(min(x.values()))
        assert got_max == pytest.approx(max(x.values()))
    else:
        assert got_min == math.inf and got_max == -math.inf


@settings(**SETTINGS)
@given(edges=tiny_graph, x=sparse_vec)
def test_vxm_plus_times_matches_python(spark, edges, x):
    # u[j] = Σ_{i→j} x[i] over a pattern matrix (⊗ one = 1.0)
    x = {k: v for k, v in x.items() if k <= 5}
    E = edges_df(spark, sorted(edges))
    u = _v(vxm(vec_df(spark, list(x.items())), E, alg.PLUS_TIMES))
    want: dict[int, float] = {}
    for s, d in edges:
        if s in x:
            want[d] = want.get(d, 0.0) + x[s]
    assert set(u) == set(want)
    for k in want:
        assert u[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9)
