"""Executor-resident CSR segment loop (plans/csr_segloop.py): same
ranks as the driver-vector CSR path and the NumPy oracle, with O(P) —
not O(n) — driver traffic per superstep."""

from __future__ import annotations

import numpy as np
import pytest

from alp_spark.algorithms.simple_pagerank import simple_pagerank_csr
from alp_spark.plans.csr_blocks import build_csr_blocks
from alp_spark.plans.csr_segloop import pagerank_csr_segments

from .fixtures import edges_df, g497_powerlaw, g_dangling
from .oracles import simple_pagerank as oracle_pagerank


def _ranks_arr(df, n):
    out = np.zeros(n)
    for r in df.collect():
        out[r["id"]] = r["val"]
    return out


@pytest.mark.parametrize("fixture", [g_dangling, g497_powerlaw])
def test_segment_loop_matches_oracle_and_driver_path(spark, fixture):
    n, edges = fixture()
    E = edges_df(spark, edges)
    want, _, _ = oracle_pagerank(n, edges, alpha=0.85, conv=1e-7)

    drv = simple_pagerank_csr(spark, E, n, conv=1e-7, engine="driver")
    seg = simple_pagerank_csr(spark, E, n, conv=1e-7, engine="segments")
    a, b = _ranks_arr(drv.ranks, n), _ranks_arr(seg.ranks, n)
    np.testing.assert_allclose(b, want, rtol=1e-9, atol=1e-12)
    # identical elementwise arithmetic → same supersteps, same values
    # (only Σ-stat summation order differs between the two engines)
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-15)
    assert seg.iterations == drv.iterations


def test_segment_loop_driver_traffic_is_O_P(spark):
    """The per-superstep driver collect is one stats row per range —
    independent of n (the verdict's O(P) contract)."""
    n, edges = g497_powerlaw()
    E = edges_df(spark, edges)
    # force several ranges so P > 1 but P << n
    csr = build_csr_blocks(spark, E, n, n_partitions=4)
    try:
        res = pagerank_csr_segments(spark, csr, E, conv=1e-7)
        n_pids = {int(lo) for lo in csr.meta["lo"]}
        assert res.driver_rows_per_step < n / 4
        assert res.driver_rows_per_step >= len(n_pids)
        got = _ranks_arr(res.ranks.localCheckpoint(), n)
        want, _, _ = oracle_pagerank(n, edges, alpha=0.85, conv=1e-7)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    finally:
        csr.unpersist()


def test_segment_loop_auto_switch(spark):
    """engine='auto' with a tiny max_driver_n routes through the
    segment loop and still returns correct ranks."""
    n, edges = g_dangling()
    E = edges_df(spark, edges)
    res = simple_pagerank_csr(spark, E, n, conv=1e-7, max_driver_n=5)
    want, _, _ = oracle_pagerank(n, edges, alpha=0.85, conv=1e-7)
    np.testing.assert_allclose(_ranks_arr(res.ranks, n), want, rtol=1e-9, atol=1e-12)


def test_segment_loop_checkpoint_resume_equivalence(spark, tmp_path):
    """North-rule restartability on the O(P) engine: run 6 supersteps
    straight; run 3 with a checkpoint, then resume from the persisted
    snapshot for the remaining 3 — final ranks, iteration count, and
    residual must match the straight run bit-for-bit."""
    from alp_spark.checkpoint import ParquetCheckpointer

    n, edges = g497_powerlaw()
    E = edges_df(spark, edges)

    csr = build_csr_blocks(spark, E, n, n_partitions=4)
    try:
        straight = pagerank_csr_segments(spark, csr, E, conv=0.0, max_iter=6)
        a = _ranks_arr(straight.ranks.localCheckpoint(), n)

        ck = ParquetCheckpointer(str(tmp_path / "ck"))
        first = pagerank_csr_segments(
            spark, csr, E, conv=0.0, max_iter=3,
            checkpointer=ck, checkpoint_every=3,
        )
        assert first.iterations == 3
        rec = ck.latest()
        assert rec is not None and rec["superstep"] == 3
        assert "residual" in rec["metrics"] and rec["partition_rows"]
        loaded, rec2 = ck.load(spark)
        assert rec2["superstep"] == 3
        resumed = pagerank_csr_segments(
            spark, csr, E, conv=0.0, max_iter=6,
            init_ranks=loaded, init_superstep=3,
        )
        assert resumed.iterations == 6 == straight.iterations
        b = _ranks_arr(resumed.ranks.localCheckpoint(), n)
        np.testing.assert_array_equal(b, a)  # exact, not allclose
        assert resumed.residual == straight.residual
    finally:
        csr.unpersist()


def test_segment_loop_resume_rejects_bad_args(spark):
    n, edges = g_dangling()
    E = edges_df(spark, edges)
    csr = build_csr_blocks(spark, E, n, n_partitions=2)
    try:
        with pytest.raises(ValueError):
            pagerank_csr_segments(spark, csr, E, init_superstep=2)
    finally:
        csr.unpersist()
