"""Range-partitioned CSR edge blocks + Arrow gather-scatter SpMV.

The north star's mandated physical form: the edge table is packed ONCE
into per-partition CSR blocks (the analog of ALP ingesting the matrix
into CRS+CCS in the Pregel constructor, interfaces/pregel.hpp:445-451;
``Compressed_Storage`` reference/compressed_storage.hpp:48-77), then
every SpMV superstep is a single ``mapInPandas`` pass over the cached
blocks — no per-iteration edge shuffle at all.

Physical layout (all chosen by measurement — random memory access is the
bottleneck, so every per-superstep sort/unique is hoisted to build time):

- blocks are **dst-range partitioned**: block ``pid = dst // width`` owns
  the contiguous output range ``[lo, lo+width)``, so each block emits ONE
  dense local segment and block results need no keyed combine — the
  driver concatenates/adds ~P binary blobs instead of collecting n keyed
  rows. This is ALP's CRS row-major gather kernel
  (reference/blas2.hpp:295) with "row" = dst.
- within a block, edges are **sorted by dst at build time** and stored as
  numpy buffers (src int32 when n < 2^31, segment ``starts`` + distinct
  ``uids``), so the per-superstep kernel is exactly one random gather
  ``x[src]`` plus one sequential ``np.<op>.reduceat`` — no per-superstep
  sort, unique, or Python row loop (input_hint: vectorized only).
- oversized blocks are **split into ≤``target_edges`` sub-chunks** at
  build time (hub in-degree ranges produce heavy blocks; the split is the
  build-time analog of dst-salting, SURVEY.md §4 #12); sub-chunk segments
  are ⊕-combined on the driver, exact for commutative ⊕.

Scale contract: the frontier/rank vector ``x`` is broadcast dense
(float64: n=10^9 ⇒ 8 GB — fits a big executor; beyond that the shuffle
vxm path of :mod:`alp_spark.operators.blas2` takes over; the cost switch
mirrors reference/blas2.hpp:1104-1145). Edges are never re-shuffled after
the one-time build, which is what makes supersteps/hour scale with
executors: each superstep is an embarrassingly parallel map over the
cached chunks + one ~P-row collect.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..containers import DST, ID, SRC, VAL

_BLOCK_SCHEMA = (
    "pid int, lo long, width int, n_rows long, "
    "src binary, starts binary, uids binary"
)

#: max edges per packed chunk — bounds worker memory and evens out hub
#: blocks (build-time dst-salting)
DEFAULT_TARGET_EDGES = 2_000_000


@dataclass
class CsrBlocks:
    """One-time packed edge chunks (cached) + graph metadata."""

    blocks: DataFrame  # (pid, lo, width, n_rows, src, starts, uids)
    n: int
    n_partitions: int
    n_edges: int
    src_dtype: str  # 'int32' | 'int64'

    def unpersist(self) -> None:
        self.blocks.unpersist()


def build_csr_blocks(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    n_partitions: int | None = None,
    target_edges: int = DEFAULT_TARGET_EDGES,
) -> CsrBlocks:
    """Pack ``(src, dst)`` into dst-range-partitioned sorted chunks.

    One shuffle (repartition by range id) + one ``applyInPandas`` pack,
    then persist — amortised over every subsequent superstep. Pattern
    matrices only (the link graph); weighted SpMV stays on the shuffle
    path.
    """
    P = n_partitions or spark.sparkContext.defaultParallelism
    width = -(-n // P)  # ceil
    src_dtype = "int32" if n < 2**31 else "int64"

    e = edges.select(SRC, DST).withColumn(
        "pid", (F.col(DST) / F.lit(width)).cast("int")
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        lo = pid * width
        src = pdf[SRC].to_numpy(dtype=np.int64)
        dst = pdf[DST].to_numpy(dtype=np.int64)
        order = np.argsort(dst, kind="stable")  # ONE sort, at build time
        src = src[order].astype(src_dtype)
        dst = dst[order]
        rows = []
        for c0 in range(0, len(dst), target_edges):
            c1 = min(c0 + target_edges, len(dst))
            d = dst[c0:c1]
            bounds = np.flatnonzero(np.diff(d)) + 1
            starts = np.concatenate(([0], bounds)).astype(np.int32)
            uids = (d[starts] - lo).astype(np.int32)
            rows.append(
                {
                    "pid": pid,
                    "lo": lo,
                    "width": int(min(width, n - lo)),
                    "n_rows": c1 - c0,
                    "src": src[c0:c1].tobytes(),
                    "starts": starts.tobytes(),
                    "uids": uids.tobytes(),
                }
            )
        return pd.DataFrame(rows)

    blocks = (
        e.repartition(P, "pid")
        .groupBy("pid")
        .applyInPandas(pack, schema=_BLOCK_SCHEMA)
        .persist()
    )
    n_edges = int(blocks.agg(F.sum("n_rows").alias("m")).collect()[0]["m"] or 0)
    return CsrBlocks(
        blocks=blocks, n=n, n_partitions=P, n_edges=n_edges, src_dtype=src_dtype
    )


_REDUCE = {
    "plus": (np.add, 0.0),
    "min": (np.minimum, np.inf),
    "max": (np.maximum, -np.inf),
    "or": (np.maximum, 0.0),  # bools as 0/1 doubles
}


def spmv_dense(
    spark: SparkSession,
    csr: CsrBlocks,
    x: np.ndarray,
    combine: str = "plus",
) -> np.ndarray:
    """y[j] = ⊕_{i→j} x[i] over the cached chunks; returns a dense numpy
    vector on the driver (⊕-identity where no in-edges).

    ``combine``: 'plus' | 'min' | 'max' | 'or'. Per superstep: one
    broadcast of x, one map over cached chunks (gather + reduceat), one
    ~P-row binary collect, one driver-side segment ⊕.
    """
    ufunc, ident = _REDUCE[combine]
    n, src_dtype = csr.n, csr.src_dtype
    bx = spark.sparkContext.broadcast(x)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xv = bx.value
        for pdf in batches:
            out = {"lo": [], "width": [], "seg": []}
            for row in pdf.itertuples(index=False):
                src = np.frombuffer(row.src, dtype=src_dtype)
                starts = np.frombuffer(row.starts, dtype=np.int32)
                uids = np.frombuffer(row.uids, dtype=np.int32)
                contrib = xv[src]  # THE gather — the only random access
                vals = ufunc.reduceat(contrib, starts)
                seg = np.full(row.width, ident)
                seg[uids] = vals  # uids unique within a sorted chunk
                out["lo"].append(row.lo)
                out["width"].append(row.width)
                out["seg"].append(seg.tobytes())
            yield pd.DataFrame(out)

    rows = csr.blocks.mapInPandas(kernel, schema="lo long, width int, seg binary")
    y = np.full(n, ident)
    for r in rows.collect():  # ~P rows of width*8 bytes — Σ ≈ n*8 bytes
        lo, w = r["lo"], r["width"]
        seg = np.frombuffer(r["seg"], dtype=np.float64)
        # sub-chunks of one range ⊕-combine here (exact: ⊕ commutative)
        y[lo : lo + w] = ufunc(y[lo : lo + w], seg)
    bx.destroy()
    return y
