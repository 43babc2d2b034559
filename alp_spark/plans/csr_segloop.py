"""Executor-resident superstep loop over CSR segment files.

Lifts the documented driver ceiling of :mod:`alp_spark.plans.csr_blocks`
(n·8-byte per-superstep collect + dense driver-side rank vector, i.e.
n ≈ 10⁹): the rank/contribution vectors live as per-range ``.npy``
segment files, the sub-chunk partial segments ⊕-combine EXECUTOR-side
behind one keyed shuffle on the range id (the reduceByKey form of ALP's
inter-process ``collectives::allreduce`` of vector segments,
reference/base/collectives.hpp), and the per-element PageRank algebra
(dangling fold, α-scale, residual) runs inside the combine task. The
driver sees ONE stats row per range per superstep — O(P), not O(n).

Per superstep (ONE Spark job, two stages):

  stage 1 (compute, round-robin over chunks): assemble the dense x from
    the per-range segment files (sequential reads, Σ = n·8 bytes per
    worker — the same volume as the single-file transport of
    ``spmv_dense``), gather+bincount each cached chunk, emit
    (pid, partial seg);
  stage 2 (combine, keyed by pid): ⊕ the partials, apply
    pr' = y + d  (d = this round's dangling/teleport scalar, a closure
    literal), write the pid's pr' and x' = pr'·inv segment files, emit
    (pid, Σ|pr'−pr|, Σ pr'[dangling]) — the stats the driver needs to
    form the NEXT round's scalar d and the convergence decision.

The dense-x-per-worker assumption of the CSR design is unchanged
(executor memory O(n·8 B)); only the driver leaves the O(n) path.

Transport (``transport=``):

- ``'files'``: segment files on ``cache_dir`` — driver-shared by
  construction in local mode; on a multi-executor cluster point
  ``cache_dir`` at shared storage (NFS / fuse-mounted object store),
  the same deployment note as ``spmv_dense(x_transport='file')``.
- ``'shuffle'``: NO shared filesystem — the per-range state (pr, x,
  inv, mask) is a P-row binary-column DataFrame checkpointed
  executor-resident each superstep, the CSR chunks are packed IN-PLAN
  from the edge DataFrame into binary columns of a persisted DataFrame
  co-partitioned by compute task (the chunk bytes reach their compute
  tasks through the shuffle — no executor-local file is ever read from
  another machine; ADVICE r4), and the dense-x allgather is a keyed
  shuffle replicating the P x-segments to each of the T compute tasks
  (T·n·8 bytes/superstep — exactly the volume of BSP1D's
  ``synchronize`` allgather of ``v._global``, bsp1d/blas2.hpp:111-119).
  Chunk packing sorts by (src, dst) — fully deterministic regardless of
  shuffle arrival order — and partials ⊕-combine in chunk-index order,
  so results are deterministic and resume is bit-for-bit.

Cited parity: the update algebra mirrors
algorithms/simple_pagerank.py:231-245 (itself simple_pagerank.hpp:
291-302/402-416); results match the driver-vector path bit-for-bit
except float summation order inside Σ-stats (values: exact — the
per-element ops are identical elementwise arithmetic).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..containers import DST, ID, SRC, VAL
from .csr_blocks import CsrBlocks, _contrib_buf, _load_chunk, _WORKSPACE


@dataclass
class SegPageRankResult:
    ranks: DataFrame  # (id, val) — assembled distributed, never on the driver
    iterations: int
    residual: float
    residuals: list[float]
    driver_rows_per_step: int  # stats rows collected per superstep (= P)


def _seg_path(cache_dir: str, tag: str, it: int, pid: int) -> str:
    return os.path.join(cache_dir, f"{tag}_{it}_{pid}.npy")


def _aux_path(cache_dir: str, pid: int) -> str:
    return os.path.join(cache_dir, f"aux_{pid}.npz")


def _ranges(n: int, width: int) -> list[tuple[int, int, int]]:
    """(pid, lo, width) covering [0, n) — includes edge-free ranges."""
    out = []
    pid, lo = 0, 0
    while lo < n:
        out.append((pid, lo, min(width, n - lo)))
        pid += 1
        lo += width
    return out


def _load_x_segments(cache_dir: str, tag: str, it: int,
                     ranges: list[tuple[int, int, int]], n: int) -> np.ndarray:
    """Assemble dense x from per-range files into the reused workspace
    buffer (sequential reads in range order)."""
    buf = _WORKSPACE.get("x")
    if buf is None or len(buf) != n:
        buf = np.empty(n, dtype=np.float64)
        _WORKSPACE["x"] = buf
    for pid, lo, w in ranges:
        with open(_seg_path(cache_dir, tag, it, pid), "rb") as fh:
            fh.seek(-w * 8, 2)  # npy payload = trailing w*8 bytes
            fh.readinto(memoryview(buf[lo : lo + w]).cast("B"))
    return buf


def build_aux_segments(
    spark: SparkSession,
    csr: CsrBlocks,
    edges: DataFrame,
    width: int,
    alpha: float,
) -> int:
    """One-time per-range aux files: inv = α/outdeg (0 where dangling)
    and the dangling mask, from one distributed degree aggregation.
    Returns the global dangling-vertex count (for the round-0 scalar)."""
    n, cache_dir = csr.n, csr.cache_dir
    ranges = _ranges(n, width)
    deg = (
        edges.groupBy(F.col(SRC).alias(ID))
        .agg(F.count("*").alias("deg"))
        .withColumn("pid", (F.col(ID) / F.lit(width)).cast("int"))
    )
    # seed every range so edge-free ranges still get aux files
    seed = spark.createDataFrame(
        [(p, -1, 0) for p, _, _ in ranges], f"pid int, {ID} long, deg long"
    )

    def write_aux(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        lo = pid * width
        w = min(width, n - lo)
        outdeg = np.zeros(w, dtype=np.float64)
        real = pdf[pdf[ID] >= 0]
        if len(real):
            outdeg[real[ID].to_numpy(dtype=np.int64) - lo] = real["deg"].to_numpy()
        mask = outdeg == 0.0
        inv = np.where(mask, 0.0, alpha / np.where(mask, 1.0, outdeg))
        np.savez(_aux_path(cache_dir, pid), inv=inv, mask=mask)
        return pd.DataFrame({"pid": [pid], "n_dangling": [int(mask.sum())]})

    stats = (
        deg.select("pid", ID, "deg")
        .unionByName(seed)
        .groupBy("pid")
        .applyInPandas(write_aux, schema="pid int, n_dangling long")
        .toPandas()
    )
    return int(stats["n_dangling"].sum())


def pagerank_csr_segments(
    spark: SparkSession,
    csr: CsrBlocks,
    edges: DataFrame,
    alpha: float = 0.85,
    conv: float = 1e-7,
    max_iter: int = 1000,
    checkpointer=None,
    checkpoint_every: int = 5,
    init_ranks: DataFrame | None = None,
    init_superstep: int = 0,
    transport: str = "files",
) -> SegPageRankResult:
    """PageRank over packed CSR chunks with O(P) driver traffic per
    superstep (semantics of algorithms/simple_pagerank.py:231-245).

    Checkpoint/resume (the north rule's mid-iteration restart, on the
    no-driver-ceiling engine): every ``checkpoint_every`` supersteps the
    current rank segments are assembled DISTRIBUTED (segment files →
    parquet, never through the driver) and committed via
    ``checkpointer.save`` with residual/dangling metrics; a later run
    passes the loaded frame as ``init_ranks`` with its recorded
    superstep as ``init_superstep`` and continues bit-for-bit —
    ``max_iter`` is the ABSOLUTE superstep cap, so a resumed run stops
    where the straight run would. Driver traffic stays O(P): the init
    write and every checkpoint go executor→storage directly."""
    if not 0 < alpha < 1 or max_iter <= 0:
        raise ValueError("alpha must be in (0,1), max_iter > 0")
    if init_superstep < 0 or (init_superstep > 0 and init_ranks is None):
        raise ValueError("init_superstep needs init_ranks")
    if transport not in ("files", "shuffle"):
        raise ValueError("transport must be 'files' or 'shuffle'")
    n, cache_dir, layout = csr.n, csr.cache_dir, csr.layout
    if layout != "src":
        raise ValueError("segment loop needs layout='src' (plus ring)")
    width = int(csr.meta["width"].max()) if len(csr.meta) else n
    # meta widths are min(width, n-lo) — recover the build width from lo
    if len(csr.meta) > 1:
        los = sorted(set(csr.meta["lo"]))
        width = int(los[1] - los[0]) if len(los) > 1 else int(csr.meta["width"].max())
    ranges = _ranges(n, width)
    if transport == "shuffle":
        return _pagerank_segments_shuffle(
            spark, csr, edges, width, ranges,
            alpha=alpha, conv=conv, max_iter=max_iter,
            checkpointer=checkpointer, checkpoint_every=checkpoint_every,
            init_ranks=init_ranks, init_superstep=init_superstep,
        )
    n_pids = len(ranges)
    n_dangling = build_aux_segments(spark, csr, edges, width, alpha)

    # ---- round 0: write pr0 = 1/n and x0 = pr0·inv segments (executor) ----
    rng_df = spark.createDataFrame(
        [(p, lo, w) for p, lo, w in ranges], "pid int, lo long, width int"
    ).repartition(min(n_pids, csr.n_partitions))

    start = init_superstep
    if init_ranks is None:
        def init_segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    aux = np.load(_aux_path(cache_dir, row.pid))
                    pr0 = np.full(row.width, 1.0 / n)
                    np.save(_seg_path(cache_dir, "pr", start, row.pid), pr0)
                    np.save(_seg_path(cache_dir, "x", start, row.pid), pr0 * aux["inv"])
                yield pd.DataFrame({"pid": pdf["pid"]})

        rng_df.mapInPandas(init_segs, schema="pid int").count()
        dangling = n_dangling / n  # Σ pr0[mask] with pr0 = 1/n
    else:
        # resume: route checkpointed rows to their range, write the
        # pr/x segments executor-side, report per-pid dangling partials
        def write_resume(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(key[0])
            lo = pid * width
            w = min(width, n - lo)
            aux = np.load(_aux_path(cache_dir, pid))
            seg = np.zeros(w, dtype=np.float64)
            seg[pdf[ID].to_numpy(dtype=np.int64) - lo] = pdf[VAL].to_numpy(
                dtype=np.float64
            )
            np.save(_seg_path(cache_dir, "pr", start, pid), seg)
            np.save(_seg_path(cache_dir, "x", start, pid), seg * aux["inv"])
            return pd.DataFrame(
                {"pid": [pid], "dangling": [float(seg[aux["mask"]].sum())]}
            )

        rstats = (
            init_ranks.select(
                (F.col(ID) / F.lit(width)).cast("int").alias("pid"), ID, VAL
            )
            .groupBy("pid")
            .applyInPandas(write_resume, schema="pid int, dangling double")
            .toPandas()
            .sort_values("pid")
        )
        dangling = float(rstats["dangling"].sum())

    meta_df = spark.createDataFrame(csr.meta).repartition(csr.n_partitions)
    meta_df = meta_df.localCheckpoint(eager=True)  # reused every superstep

    iters, residual, residuals = 0, float("inf"), []
    while True:
        it = start + iters
        d = (alpha * dangling + 1.0 - alpha) / n

        def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            xv = _load_x_segments(cache_dir, "x", it, ranges, n)
            for pdf in batches:
                out = {"pid": [], "seg": []}
                for row in pdf.itertuples(index=False):
                    src, dstoff = _load_chunk(row.path, "src")
                    contrib = np.take(
                        xv, src, out=_contrib_buf(len(src)), mode="clip"
                    )
                    seg = np.bincount(dstoff, weights=contrib, minlength=row.width)
                    out["pid"].append(row.pid)
                    out["seg"].append(seg.tobytes())
                yield pd.DataFrame(out)

        def combine(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(key[0])
            lo = pid * width
            w = min(width, n - lo)
            y = np.zeros(w, dtype=np.float64)
            for blob in pdf["seg"]:
                if len(blob):  # zero-seed rows for edge-free ranges
                    y += np.frombuffer(blob, dtype=np.float64)
            aux = np.load(_aux_path(cache_dir, pid))
            pr_old = np.load(_seg_path(cache_dir, "pr", it, pid))
            pr_new = y + d
            np.save(_seg_path(cache_dir, "pr", it + 1, pid), pr_new)
            np.save(_seg_path(cache_dir, "x", it + 1, pid), pr_new * aux["inv"])
            return pd.DataFrame(
                {
                    "pid": [pid],
                    "resid": [float(np.abs(pr_new - pr_old).sum())],
                    "dangling": [float(pr_new[aux["mask"]].sum())],
                }
            )

        # zero-seed rows keep ranges with no in-edges in the combine
        seeds = spark.createDataFrame(
            [(p, bytearray(0)) for p, _, _ in ranges], "pid int, seg binary"
        )
        stats = (
            meta_df.mapInPandas(compute, schema="pid int, seg binary")
            .unionByName(seeds)
            .groupBy("pid")
            .applyInPandas(combine, schema="pid int, resid double, dangling double")
            .toPandas()
            .sort_values("pid")  # deterministic ⊕ order across runs/resumes
        )  # P rows — the ONLY per-superstep driver traffic
        residual = float(stats["resid"].sum())
        dangling = float(stats["dangling"].sum())
        residuals.append(residual)
        iters += 1
        if checkpointer is not None and (start + iters) % checkpoint_every == 0:
            checkpointer.save(
                _read_ranks_df(spark, rng_df, cache_dir, start + iters),
                superstep=start + iters,
                metrics={"residual": residual, "dangling": dangling},
            )
        # retire superstep it-1 files (it's inputs may still be cached)
        if it >= start + 1:
            for p, _, _ in ranges:
                for tag in ("pr", "x"):
                    try:
                        os.unlink(_seg_path(cache_dir, tag, it - 1, p))
                    except OSError:
                        pass
        if (conv != 0.0 and residual <= conv) or start + iters >= max_iter:
            break

    final_it = start + iters

    ranks = _read_ranks_df(spark, rng_df, cache_dir, final_it)
    return SegPageRankResult(
        ranks=ranks,
        iterations=start + iters,
        residual=residual,
        residuals=residuals,
        driver_rows_per_step=n_pids,
    )


def _read_ranks_df(
    spark: SparkSession, rng_df: DataFrame, cache_dir: str, it: int
) -> DataFrame:
    """Assemble the superstep-``it`` rank vector distributed from the
    per-range segment files — rows never pass through the driver."""

    def read_ranks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                seg = np.load(_seg_path(cache_dir, "pr", it, row.pid))
                yield pd.DataFrame(
                    {ID: np.arange(row.lo, row.lo + row.width), VAL: seg}
                )

    return rng_df.mapInPandas(read_ranks, schema=f"{ID} long, {VAL} double")


# --------------------------------------------------------------------------
# transport='shuffle': shared-nothing segment exchange
# --------------------------------------------------------------------------

_STATE_SCHEMA = "pid int, pr binary, x binary, inv binary, mask binary"


def _build_aux_df(
    spark: SparkSession,
    edges: DataFrame,
    width: int,
    alpha: float,
    n: int,
    ranges: list[tuple[int, int, int]],
) -> DataFrame:
    """Per-range aux columns as a P-row DataFrame: inv = α/outdeg (0
    where dangling) + the dangling mask — the file-free twin of
    :func:`build_aux_segments`."""
    deg = (
        edges.groupBy(F.col(SRC).alias(ID))
        .agg(F.count("*").alias("deg"))
        .withColumn("pid", (F.col(ID) / F.lit(width)).cast("int"))
    )
    seed = spark.createDataFrame(
        [(p, -1, 0) for p, _, _ in ranges], f"pid int, {ID} long, deg long"
    )

    def make_aux(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        lo = pid * width
        w = min(width, n - lo)
        outdeg = np.zeros(w, dtype=np.float64)
        real = pdf[pdf[ID] >= 0]
        if len(real):
            outdeg[real[ID].to_numpy(dtype=np.int64) - lo] = real["deg"].to_numpy()
        mask = outdeg == 0.0
        inv = np.where(mask, 0.0, alpha / np.where(mask, 1.0, outdeg))
        return pd.DataFrame(
            {
                "pid": [pid],
                "inv": [inv.tobytes()],
                "mask": [mask.tobytes()],
                "n_dangling": [int(mask.sum())],
            }
        )

    return (
        deg.select("pid", ID, "deg")
        .unionByName(seed)
        .groupBy("pid")
        .applyInPandas(
            make_aux, schema="pid int, inv binary, mask binary, n_dangling long"
        )
    )


def _chunks_df(
    spark: SparkSession,
    csr: CsrBlocks,
    edges: DataFrame,
    width: int,
    n_pids: int,
    T: int,
) -> DataFrame:
    """CSR chunks packed IN-PLAN from the edge DataFrame into binary
    columns, co-partitioned by compute task:
    (tpid, gidx, pid, width, src, dstoff).

    The chunk bytes travel through Spark's shuffle to wherever their
    compute task runs — never via an executor-local file path that
    another machine cannot see (ADVICE r4: the previous version read
    the build-time ``.npy`` chunk files inside ``mapInPandas`` with no
    task-locality guarantee, which only worked because local mode
    shares one filesystem). Packing follows :func:`build_csr_blocks`'s
    rule — ``pid = dst // width``, split every ``target_edges`` — but
    sorts by **(src, dst)** via ``lexsort`` so the packed bytes are
    bit-identical regardless of shuffle arrival order (a stable
    src-only sort would leave equal-src runs in nondeterministic dst
    order, perturbing fp summation order in the bincount scatter).
    ``gidx`` is the per-pid chunk index — the combine's ⊕ ordering key
    within its pid group. One pack job at build; every superstep
    thereafter serves from the executor cache."""
    target = csr.target_edges
    n, src_dtype = csr.n, csr.src_dtype
    e = edges.select(SRC, DST).withColumn(
        "pid", (F.col(DST) / F.lit(width)).cast("int")
    )

    def pack_bytes(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        lo = pid * width
        w = int(min(width, n - lo))
        src = pdf[SRC].to_numpy(dtype=np.int64)
        dst = pdf[DST].to_numpy(dtype=np.int64)
        if len(src) and (src.min() < 0 or src.max() >= n):
            raise ValueError(
                f"src vertex id out of range [0, {n}): "
                f"[{src.min()}, {src.max()}]"
            )
        order = np.lexsort((dst, src))  # deterministic total order
        src = src[order].astype(src_dtype)
        dst = dst[order]
        out = {"tpid": [], "gidx": [], "pid": [], "width": [],
               "src": [], "dstoff": []}
        for ci, c0 in enumerate(range(0, max(len(dst), 1), target)):
            c1 = min(c0 + target, len(dst))
            out["tpid"].append((pid + ci) % T)
            out["gidx"].append(ci)
            out["pid"].append(pid)
            out["width"].append(w)
            out["src"].append(src[c0:c1].tobytes())
            out["dstoff"].append((dst[c0:c1] - lo).astype(np.int32).tobytes())
        return pd.DataFrame(out)

    return (
        e.repartition(n_pids, "pid")
        .groupBy("pid")
        .applyInPandas(
            pack_bytes,
            schema="tpid int, gidx long, pid int, width int, "
                   "src binary, dstoff binary",
        )
        .repartition(T, "tpid")
        .persist()
    )


def _state_ranks_df(state: DataFrame, width: int) -> DataFrame:
    """Explode the P-row state into (id, val) — distributed, never
    through the driver."""

    def read_ranks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                pr = np.frombuffer(row.pr, dtype=np.float64)
                lo = row.pid * width
                yield pd.DataFrame(
                    {ID: np.arange(lo, lo + len(pr)), VAL: pr}
                )

    return state.select("pid", "pr").mapInPandas(
        read_ranks, schema=f"{ID} long, {VAL} double"
    )


def _pagerank_segments_shuffle(
    spark: SparkSession,
    csr: CsrBlocks,
    edges: DataFrame,
    width: int,
    ranges: list[tuple[int, int, int]],
    alpha: float,
    conv: float,
    max_iter: int,
    checkpointer,
    checkpoint_every: int,
    init_ranks: DataFrame | None,
    init_superstep: int,
) -> SegPageRankResult:
    """The shared-nothing engine (see module docstring): state is a
    P-row binary-column DataFrame, the allgather is a keyed shuffle,
    partials ⊕ in global-chunk-index order (deterministic; resume is
    bit-for-bit)."""
    n = csr.n
    n_pids = len(ranges)
    T = max(1, min(len(csr.meta), csr.n_partitions))
    src_dtype = csr.src_dtype
    aux = _build_aux_df(spark, edges, width, alpha, n, ranges)
    chunks = _chunks_df(spark, csr, edges, width, len(ranges), T)
    task_ids = spark.createDataFrame([(t,) for t in range(T)], "tpid int")

    start = init_superstep
    if init_ranks is None:
        def make_state0(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"pid": [], "pr": [], "x": [], "inv": [], "mask": [],
                       "dangling": []}
                for row in pdf.itertuples(index=False):
                    inv = np.frombuffer(row.inv, dtype=np.float64)
                    pr0 = np.full(len(inv), 1.0 / n)
                    out["pid"].append(row.pid)
                    out["pr"].append(pr0.tobytes())
                    out["x"].append((pr0 * inv).tobytes())
                    out["inv"].append(row.inv)
                    out["mask"].append(row.mask)
                    out["dangling"].append(float(row.n_dangling) / n)
                yield pd.DataFrame(out)

        # n_dangling rides INTO the checkpointed state (as in the
        # resume path) so the round-0 scalar comes off the checkpointed
        # P rows — not a second full degree-aggregation scan of the
        # edge table through the un-persisted aux plan
        st = aux.mapInPandas(
            make_state0, schema=_STATE_SCHEMA + ", dangling double"
        ).localCheckpoint(eager=True)
        dangling = float(st.agg(F.sum("dangling")).collect()[0][0] or 0.0)
        state = st.drop("dangling")
    else:
        def resume_state(key, rk: pd.DataFrame, ax: pd.DataFrame) -> pd.DataFrame:
            pid = int(key[0])
            lo = pid * width
            inv = np.frombuffer(ax["inv"].iloc[0], dtype=np.float64)
            mask = np.frombuffer(ax["mask"].iloc[0], dtype=np.bool_)
            seg = np.zeros(len(inv), dtype=np.float64)
            if len(rk):
                seg[rk[ID].to_numpy(dtype=np.int64) - lo] = rk[VAL].to_numpy(
                    dtype=np.float64
                )
            return pd.DataFrame(
                {
                    "pid": [pid],
                    "pr": [seg.tobytes()],
                    "x": [(seg * inv).tobytes()],
                    "inv": [ax["inv"].iloc[0]],
                    "mask": [ax["mask"].iloc[0]],
                    "dangling": [float(seg[mask].sum())],
                }
            )

        rk = init_ranks.select(
            (F.col(ID) / F.lit(width)).cast("int").alias("pid"), ID, VAL
        )
        st = (
            rk.groupBy("pid")
            .cogroup(aux.groupBy("pid"))
            .applyInPandas(resume_state, schema=_STATE_SCHEMA + ", dangling double")
            .localCheckpoint(eager=True)
        )
        dangling = float(
            st.agg(F.sum("dangling")).collect()[0][0] or 0.0
        )
        state = st.drop("dangling")

    iters, residual, residuals = 0, float("inf"), []
    while True:
        d = (alpha * dangling + 1.0 - alpha) / n

        # ---- allgather: replicate the P x-segments to each compute task
        xrep = state.select("pid", "x").crossJoin(F.broadcast(task_ids))

        _PART_SCHEMA = "pid int, gidx long, seg binary, inv binary, mask binary"

        def compute(ch: pd.DataFrame, xp: pd.DataFrame) -> pd.DataFrame:
            cols = ["pid", "gidx", "seg", "inv", "mask"]
            if not len(ch):
                return pd.DataFrame(
                    {
                        "pid": pd.Series([], dtype="int32"),
                        "gidx": pd.Series([], dtype="int64"),
                        "seg": pd.Series([], dtype=object),
                        "inv": pd.Series([], dtype=object),
                        "mask": pd.Series([], dtype=object),
                    }
                )
            xp = xp.sort_values("pid")
            xv = np.concatenate(
                [np.frombuffer(b, dtype=np.float64) for b in xp["x"]]
            )
            out = {c: [] for c in cols}
            for row in ch.itertuples(index=False):
                src = np.frombuffer(row.src, dtype=src_dtype)
                dstoff = np.frombuffer(row.dstoff, dtype=np.int32)
                contrib = np.take(xv, src, out=_contrib_buf(len(src)), mode="clip")
                seg = np.bincount(dstoff, weights=contrib, minlength=row.width)
                out["pid"].append(row.pid)
                out["gidx"].append(row.gidx)
                out["seg"].append(seg.tobytes())
                out["inv"].append(None)
                out["mask"].append(None)
            return pd.DataFrame(out)

        partials = (
            chunks.groupBy("tpid")
            .cogroup(xrep.groupBy("tpid"))
            .applyInPandas(compute, schema=_PART_SCHEMA)
        )
        # state joins the combine ADDITIVELY (union rows tagged gidx=-1),
        # not through a second cogroup: localCheckpoint preserves origin
        # statistics, and two multiplicative references to state per
        # superstep square the plan-size estimate each round until
        # Catalyst's BigInteger stats overflow (~25 supersteps in)
        state_rows = state.select(
            "pid",
            F.lit(-1).cast("long").alias("gidx"),
            F.col("pr").alias("seg"),
            "inv",
            "mask",
        )

        def combine(key, pdf: pd.DataFrame) -> pd.DataFrame:
            strow = pdf[pdf["gidx"] < 0].iloc[0]
            inv = np.frombuffer(strow["inv"], dtype=np.float64)
            mask = np.frombuffer(strow["mask"], dtype=np.bool_)
            pr_old = np.frombuffer(strow["seg"], dtype=np.float64)
            y = np.zeros(len(inv), dtype=np.float64)
            # ⊕ in global-chunk-index order: deterministic across runs,
            # partitionings, and resumes (bit-for-bit contract)
            pt = pdf[pdf["gidx"] >= 0].sort_values("gidx")
            for blob in pt["seg"]:
                y += np.frombuffer(blob, dtype=np.float64)
            pr_new = y + d
            return pd.DataFrame(
                {
                    "pid": [int(key[0])],
                    "pr": [pr_new.tobytes()],
                    "x": [(pr_new * inv).tobytes()],
                    "inv": [strow["inv"]],
                    "mask": [strow["mask"]],
                    "resid": [float(np.abs(pr_new - pr_old).sum())],
                    "dangling": [float(pr_new[mask].sum())],
                }
            )

        new_state = (
            partials.unionByName(state_rows)
            .groupBy("pid")
            .applyInPandas(
                combine, schema=_STATE_SCHEMA + ", resid double, dangling double"
            )
            .localCheckpoint(eager=True)  # ONE job: compute+combine
        )
        stats = (
            new_state.select("pid", "resid", "dangling").toPandas()
        )  # P rows off the checkpointed frame — the only driver traffic
        state = new_state.drop("resid", "dangling")
        residual = float(stats["resid"].sum())
        dangling = float(stats["dangling"].sum())
        residuals.append(residual)
        iters += 1
        if checkpointer is not None and (start + iters) % checkpoint_every == 0:
            checkpointer.save(
                _state_ranks_df(state, width),
                superstep=start + iters,
                metrics={"residual": residual, "dangling": dangling},
            )
        if (conv != 0.0 and residual <= conv) or start + iters >= max_iter:
            break

    chunks.unpersist()
    return SegPageRankResult(
        ranks=_state_ranks_df(state, width),
        iterations=start + iters,
        residual=residual,
        residuals=residuals,
        driver_rows_per_step=n_pids,
    )
