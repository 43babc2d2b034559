"""Hash-partitioned CSR edge blocks + Arrow gather-scatter SpMV.

The north star's mandated physical form: the edge table is packed ONCE
into per-partition CSR blocks (the analog of ALP ingesting the matrix
into CRS+CCS in the Pregel constructor, interfaces/pregel.hpp:445-451;
``Compressed_Storage`` reference/compressed_storage.hpp:48-77), then
every SpMV superstep is a single ``mapInPandas`` pass over the cached
blocks — no per-iteration edge shuffle at all.

Partitioning invariant: block ``pid = dst % P`` (gather orientation), so
each block owns a disjoint set of output rows and block results need no
cross-block ⊕-combine — the union IS the result. This is ALP's CRS
row-major gather kernel (reference/blas2.hpp:295) with "row" = dst.

Within a block the kernel is vectorized numpy: contributions
``x[src] * w`` scattered into dst accumulators with ``np.bincount``
(plus-ring) or sort+``reduceat`` (min/max/or rings) — no scipy, no
Python row loops (input_hint).

Scale contract: the frontier/rank vector ``x`` is broadcast dense
(float64: n=10^9 ⇒ 8 GB — fits a big executor; beyond that the shuffle
vxm path of :mod:`alp_spark.operators.blas2` takes over; the cost switch
mirrors reference/blas2.hpp:1104-1145). Edges themselves are never
re-shuffled after the one-time build, which is what makes
supersteps/hour scale with executors: each superstep is an embarrassingly
parallel map over P cached blocks + one small collect.
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
    "pid int, src binary, dst binary, val binary, n_rows long"
)


@dataclass
class CsrBlocks:
    """One-time packed edge blocks (cached) + graph metadata."""

    blocks: DataFrame  # (pid, src: int64 bytes, dst: int64 bytes, val: f64 bytes|null)
    n: int
    n_partitions: int
    n_edges: int

    def unpersist(self) -> None:
        self.blocks.unpersist()


def build_csr_blocks(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    n_partitions: int | None = None,
    weighted: bool = False,
) -> CsrBlocks:
    """Pack ``(src, dst[, val])`` into P dst-partitioned numpy blocks.

    One shuffle (repartition by ``dst % P``), one ``applyInPandas`` pack,
    then persist — amortised over every subsequent superstep.
    """
    P = n_partitions or spark.sparkContext.defaultParallelism
    has_val = weighted and VAL in edges.columns

    e = edges.withColumn("pid", F.pmod(F.col(DST), F.lit(P)).cast("int"))

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf[SRC].to_numpy(dtype=np.int64)
        dst = pdf[DST].to_numpy(dtype=np.int64)
        val = (
            pdf[VAL].to_numpy(dtype=np.float64).tobytes() if has_val else None
        )
        return pd.DataFrame(
            {
                "pid": [key[0]],
                "src": [src.tobytes()],
                "dst": [dst.tobytes()],
                "val": [val],
                "n_rows": [len(pdf)],
            }
        )

    blocks = (
        e.repartition(P, "pid")
        .groupBy("pid")
        .applyInPandas(pack, schema=_BLOCK_SCHEMA)
        .persist()
    )
    n_edges = int(
        blocks.agg(F.sum("n_rows").alias("m")).collect()[0]["m"] or 0
    )
    return CsrBlocks(blocks=blocks, n=n, n_partitions=P, n_edges=n_edges)


def spmv_dense(
    spark: SparkSession,
    csr: CsrBlocks,
    x: np.ndarray,
    combine: str = "plus",
) -> np.ndarray:
    """y[j] = ⊕_{i→j} x[i] (⊗ w_ij) over the cached blocks; returns a
    dense numpy vector on the driver (⊕-identity where no in-edges).

    ``combine``: 'plus' | 'min' | 'max' | 'or'. Exactly one pass over
    the cached blocks; hub in-degree skew is absorbed inside numpy (a
    bincount over a block is O(block nnz) regardless of key skew) — skew
    only matters for block *balance*, which ``dst % P`` randomises for
    hash-distributed ids and :func:`build_csr_blocks`'s repartition
    spreads for adversarial ones.
    """
    n = csr.n
    bx = spark.sparkContext.broadcast(x)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xv = bx.value
        for pdf in batches:
            for _, row in pdf.iterrows():
                src = np.frombuffer(row["src"], dtype=np.int64)
                dst = np.frombuffer(row["dst"], dtype=np.int64)
                contrib = xv[src]
                if row["val"] is not None:
                    contrib = contrib * np.frombuffer(row["val"], dtype=np.float64)
                if combine == "plus":
                    # local-index remap keeps memory ∝ block nnz, not n
                    ids, inv = np.unique(dst, return_inverse=True)
                    out_vals = np.bincount(inv, weights=contrib)
                else:
                    order = np.argsort(dst, kind="stable")
                    ds, cs = dst[order], contrib[order]
                    bounds = np.flatnonzero(np.diff(ds)) + 1
                    starts = np.concatenate(([0], bounds))
                    ids = ds[starts]
                    if combine == "min":
                        out_vals = np.minimum.reduceat(cs, starts)
                    elif combine == "max":
                        out_vals = np.maximum.reduceat(cs, starts)
                    elif combine == "or":
                        out_vals = (
                            np.maximum.reduceat(cs.astype(bool).astype(np.float64), starts)
                        )
                    else:
                        raise ValueError(f"unknown combine {combine!r}")
                yield pd.DataFrame({ID: ids, VAL: out_vals})

    rows = csr.blocks.mapInPandas(kernel, schema=f"{ID} long, {VAL} double")
    pdf = rows.toPandas()
    y = np.zeros(n, dtype=np.float64)
    if combine == "min":
        y[:] = np.inf
    elif combine == "max":
        y[:] = -np.inf
    if len(pdf):
        # blocks own disjoint dst ranges (pid = dst % P) → plain scatter
        y[pdf[ID].to_numpy(dtype=np.int64)] = pdf[VAL].to_numpy()
    bx.destroy()
    return y
