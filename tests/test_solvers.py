"""CG/BiCGstab vs NumPy oracles transliterating the reference update
order (conjugate_gradient.hpp / bicgstab.hpp); solutions also checked
against np.linalg.solve at the requested tolerance."""

from __future__ import annotations

import numpy as np
import pytest

from alp_spark.algorithms import bicgstab, conjugate_gradient

from .fixtures import SEED


def _spd_system(n=30):
    """Laplacian of a random graph + 2I — SPD, well conditioned."""
    rng = np.random.default_rng(SEED)
    A = np.zeros((n, n))
    for _ in range(n * 3):
        i, j = rng.integers(0, n, 2)
        if i != j:
            A[i, j] = A[j, i] = -1.0
    np.fill_diagonal(A, -A.sum(axis=1) + 2.0)
    b = rng.standard_normal(n)
    return A, b


def _nonsym_system(n=25):
    rng = np.random.default_rng(SEED + 1)
    A = rng.standard_normal((n, n)) * 0.15
    np.fill_diagonal(A, 5.0 + rng.random(n))  # diagonally dominant
    b = rng.standard_normal(n)
    return A, b


def _entries(A):
    n = A.shape[0]
    return [
        (i, j, float(A[i, j]))
        for i in range(n)
        for j in range(n)
        if A[i, j] != 0.0
    ]


def _mat_df(spark, A):
    from alp_spark.containers import matrix_schema

    return spark.createDataFrame(_entries(A), matrix_schema("double"))


def _vec_df(spark, b):
    from alp_spark.containers import vector_schema

    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(b)], vector_schema("double")
    )


def _x_arr(df, n):
    out = np.zeros(n)
    for r in df.collect():
        out[r["id"]] = r["val"]
    return out


def test_conjugate_gradient_matches_oracle(spark):
    from tests import oracles

    A, b = _spd_system()
    n = len(b)
    res = conjugate_gradient(spark, _mat_df(spark, A), _vec_df(spark, b), n, tol=1e-6)
    want_x, want_iters, want_res, want_conv = oracles.conjugate_gradient(
        n, _entries(A), b, tol=1e-6
    )
    assert res.converged and want_conv
    assert res.iterations == want_iters
    np.testing.assert_allclose(_x_arr(res.x, n), want_x, rtol=1e-9, atol=1e-12)
    # tol bounds ||r||, not per-element error: ||x - x*|| <= ||r||/lambda_min
    np.testing.assert_allclose(
        _x_arr(res.x, n), np.linalg.solve(A, b), rtol=1e-4, atol=1e-5
    )


def test_conjugate_gradient_max_iter_failed(spark):
    A, b = _spd_system()
    n = len(b)
    res = conjugate_gradient(
        spark, _mat_df(spark, A), _vec_df(spark, b), n, tol=1e-12, max_iterations=2
    )
    assert not res.converged  # reference FAILED
    assert res.iterations == 2


def test_bicgstab_matches_oracle(spark):
    from tests import oracles

    A, b = _nonsym_system()
    n = len(b)
    res = bicgstab(spark, _mat_df(spark, A), _vec_df(spark, b), n, tol=1e-6)
    want_x, want_iters, want_res, want_conv = oracles.bicgstab(
        n, _entries(A), b, tol=1e-6
    )
    assert res.converged and want_conv
    assert res.iterations == want_iters
    np.testing.assert_allclose(_x_arr(res.x, n), want_x, rtol=1e-9, atol=1e-12)
    # tol bounds ||r||, not per-element error: ||x - x*|| <= ||r||/lambda_min
    np.testing.assert_allclose(
        _x_arr(res.x, n), np.linalg.solve(A, b), rtol=1e-4, atol=1e-5
    )


def test_solvers_reject_bad_tol(spark):
    A, b = _spd_system(5)
    with pytest.raises(ValueError):
        conjugate_gradient(spark, _mat_df(spark, A), _vec_df(spark, b), 5, tol=0.0)
    with pytest.raises(ValueError):
        bicgstab(spark, _mat_df(spark, A), _vec_df(spark, b), 5, tol=-1.0)
