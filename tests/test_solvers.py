"""CG/BiCGstab vs NumPy oracles transliterating the reference update
order (conjugate_gradient.hpp / bicgstab.hpp); solutions also checked
against np.linalg.solve at the requested tolerance."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

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


def test_conjugate_gradient_complex_matches_numpy(spark):
    """Complex CG (the smoke _CG_COMPLEX variant,
    tests/smoke/conjugate_gradient.cpp:36-37) on a Hermitian
    diagonally-dominant system vs the NumPy transliteration."""
    import numpy as np

    from alp_spark.algorithms.solvers import conjugate_gradient_complex
    from .oracles import conjugate_gradient_complex as cgc_oracle

    rng = np.random.RandomState(9)
    n = 24
    entries = []
    deg = np.zeros(n)
    for i in range(n):
        for j in range(i + 1, n):
            if rng.rand() < 0.25:
                re, im = -1.0, float(rng.uniform(-0.3, 0.3))
                entries.append((i, j, re, im))
                entries.append((j, i, re, -im))  # Hermitian mirror
                deg[i] += 1
                deg[j] += 1
    for i in range(n):
        entries.append((i, i, float(1.1 * deg[i] + 2.0), 0.0))  # HPD diagonal
    bvec = [complex((i % 5 + 1) / 5.0, (i % 3 - 1) / 3.0) for i in range(n)]

    A = spark.createDataFrame(entries, "src long, dst long, re double, im double")
    b = spark.createDataFrame(
        [(i, v.real, v.imag) for i, v in enumerate(bvec)],
        "id long, re double, im double",
    )
    res = conjugate_gradient_complex(spark, A, b, n, tol=1e-8)
    want_x, want_iters, want_res, want_conv = cgc_oracle(
        n, entries, bvec, tol=1e-8
    )
    got = np.zeros(n, dtype=complex)
    for r in res.x.collect():
        got[r["id"]] = complex(r["re"], r["im"])
    np.testing.assert_allclose(got, want_x, rtol=1e-8, atol=1e-10)
    assert res.iterations == want_iters
    assert res.converged == want_conv
    # solution really solves the system
    Adense = np.zeros((n, n), dtype=complex)
    for s, d, re, im in entries:
        Adense[s, d] = complex(re, im)
    np.testing.assert_allclose(Adense @ got, np.array(bvec), rtol=1e-6, atol=1e-7)


REF_HERMIT_MTX = "/root/reference/tests/smoke/test_data/rndHermit256.mtx"
REF_HERMIT_GOLDEN = (
    "/root/reference/tests/smoke/output_verification/"
    "complex_conjugate_conjugate_gradient_out_rndHermit256_ref"
)


@pytest.mark.skipif(
    not (os.path.exists(REF_HERMIT_MTX) and os.path.exists(REF_HERMIT_GOLDEN)),
    reason="vendored reference fixture pair not available",
)
def test_complex_cg_matches_reference_golden_output(spark):
    """Validate complex CG end-to-end against the ONLY input+golden pair
    the reference itself ships (tests/smoke/smoketests.sh:215-226): solve
    rndHermit256.mtx (``matrix coordinate complex hermitian`` banner)
    with the smoke test's exact setup — x0 = 1/n, b = 1, TOL = 1e-6,
    MAX_ITERS = 10000 (tests/smoke/conjugate_gradient.cpp:43-44,138-139)
    — and check the solution with the reference's own verification
    harness semantics (tests/utils/output_verification.hpp:135-330):
    per-element inf-norm and global 2-norm, both at relative tolerance
    C1 = C2 = 1e-4 (conjugate_gradient.cpp:46-47). Every other oracle in
    this repo is self-derived; this one is the reference's."""
    import numpy as np

    from alp_spark.algorithms.solvers import conjugate_gradient_complex
    from alp_spark.sources.readers import read_matrix_market

    edges, nrows, ncols = read_matrix_market(spark, REF_HERMIT_MTX)
    assert nrows == ncols == 256
    # 1270 stored entries, 256 on the diagonal -> hermitian mirror adds
    # 1014 conjugated off-diagonals (the parser's Hermitian mode,
    # MatrixFileReaderBase.hpp:153-155)
    assert edges.count() == 2 * 1270 - 256
    n = nrows
    b = spark.range(n).select(
        F.col("id"), F.lit(1.0).alias("re"), F.lit(0.0).alias("im")
    )
    res = conjugate_gradient_complex(
        spark, edges, b, n, tol=1e-6, max_iterations=10000,
        x0=complex(1.0 / n, 0.0),
    )
    assert res.converged

    truth_ri = np.loadtxt(REF_HERMIT_GOLDEN)
    assert truth_ri.shape == (n, 2)
    truth = truth_ri[:, 0] + 1j * truth_ri[:, 1]
    got = np.zeros(n, dtype=complex)
    for r in res.x.collect():
        got[r["id"]] = complex(r["re"], r["im"])

    # reference harness: output_verification.hpp:178-189 (magnitudes),
    # :228-241 (inf-norm), :272-296 (2-norm); eps = DBL_EPSILON (:228)
    c1 = c2 = 1e-4
    eps = np.finfo(np.float64).eps
    magnitude2 = np.sqrt(np.sum(np.abs(truth) ** 2))
    magnitude_inf = np.max(np.abs(truth))
    err = np.abs(got - truth)
    assert np.all(err <= c2 * magnitude_inf + eps), (
        f"inf-norm verification failed: max {err.max()} vs "
        f"{c2 * magnitude_inf + eps}"
    )
    norm2 = np.sqrt(np.sum(err ** 2))
    assert norm2 <= c1 * magnitude2 + n * eps, (
        f"2-norm verification failed: {norm2} vs {c1 * magnitude2 + n * eps}"
    )
