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


def test_shuffle_transport_matches_files_and_oracle(spark):
    # VERDICT r3 item 4: the shared-nothing exchange (state rides a
    # P-row binary DataFrame; allgather is a keyed shuffle) must agree
    # with the file-transport engine and the reference oracle.
    n, edges = g497_powerlaw()
    E = edges_df(spark, edges)
    # 40 pinned supersteps: past the point where a stats-compounding
    # plan regression would overflow Catalyst's BigInteger estimates
    # (~25 supersteps), while keeping the loop-heavy test affordable
    want, _, _ = oracle_pagerank(n, edges, alpha=0.85, conv=0.0, max_iter=40)
    csr = build_csr_blocks(spark, E, n, n_partitions=4)
    try:
        files = pagerank_csr_segments(spark, csr, E, conv=0.0, max_iter=40)
        shuf = pagerank_csr_segments(spark, csr, E, conv=0.0, max_iter=40,
                                     transport="shuffle")
        a = _ranks_arr(files.ranks.localCheckpoint(), n)
        b = _ranks_arr(shuf.ranks.localCheckpoint(), n)
        np.testing.assert_allclose(b, want, rtol=1e-9, atol=1e-12)
        # identical elementwise arithmetic; only partial-⊕ order differs
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-15)
        assert shuf.iterations == files.iterations
        assert shuf.driver_rows_per_step == files.driver_rows_per_step
    finally:
        csr.unpersist()


def test_shuffle_transport_resume_bit_for_bit(spark, tmp_path):
    # deterministic ⊕ order (global chunk index) makes resume exact on
    # the shared-nothing engine too: 3 + 3 == 6 straight, bit-for-bit
    from alp_spark.checkpoint import ParquetCheckpointer

    n, edges = g497_powerlaw()
    E = edges_df(spark, edges)
    csr = build_csr_blocks(spark, E, n, n_partitions=4)
    try:
        straight = pagerank_csr_segments(
            spark, csr, E, conv=0.0, max_iter=6, transport="shuffle"
        )
        a = _ranks_arr(straight.ranks.localCheckpoint(), n)
        ck = ParquetCheckpointer(str(tmp_path / "ck"))
        first = pagerank_csr_segments(
            spark, csr, E, conv=0.0, max_iter=3,
            checkpointer=ck, checkpoint_every=3, transport="shuffle",
        )
        assert first.iterations == 3
        loaded, rec = ck.load(spark)
        assert rec["superstep"] == 3
        resumed = pagerank_csr_segments(
            spark, csr, E, conv=0.0, max_iter=6,
            init_ranks=loaded, init_superstep=3, transport="shuffle",
        )
        assert resumed.iterations == 6 == straight.iterations
        b = _ranks_arr(resumed.ranks.localCheckpoint(), n)
        np.testing.assert_array_equal(b, a)  # exact
        assert resumed.residual == straight.residual
    finally:
        csr.unpersist()


def test_shuffle_transport_on_local_cluster():
    # VERDICT r3 item 4 done-criterion: the shared-nothing engine runs
    # on separate executor JVMs (local-cluster), where per-superstep
    # state can NOT ride driver-shared memory — only the keyed shuffle.
    # Subprocess: a second SparkContext with a different master cannot
    # share the test session's JVM.
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = r"""
import numpy as np, sys
REPO = sys.argv[1]
sys.path.insert(0, REPO)
from pyspark.sql import SparkSession
from alp_spark.plans.csr_blocks import build_csr_blocks
from alp_spark.plans.csr_segloop import pagerank_csr_segments
from tests.fixtures import edges_df, g_dangling
from tests.oracles import simple_pagerank as oracle
spark = (SparkSession.builder.master("local-cluster[2,2,1024]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.executorEnv.PYTHONPATH", REPO)
    .getOrCreate())
n, edges = g_dangling()
E = edges_df(spark, edges)
csr = build_csr_blocks(spark, E, n, n_partitions=4)
res = pagerank_csr_segments(spark, csr, E, conv=0.0, max_iter=15,
                            transport="shuffle")
got = np.zeros(n)
for r in res.ranks.collect():
    got[r["id"]] = r["val"]
want, _, _ = oracle(n, edges, alpha=0.85, conv=0.0, max_iter=15)
np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
print("LC-OK", res.driver_rows_per_step)
spark.stop()
"""
    env = dict(os.environ, PYTHONPATH=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, repo],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "LC-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
