"""Distributed PCA / whitening for embedding columns.

The standard two-phase shape for d ≪ N (the only regime that matters
for a 100 TB embedding corpus: N up to 10¹², d a few hundred to a few
thousand):

1. **Distributed moment pass** — each Arrow batch reduces to its local
   Gram matrix Σ vvᵀ, sum vector Σ v, and count (``mapInPandas``,
   vectorized ``V.T @ V``); the d² + d + 1 partial cells combine under
   one map-side-combinable groupBy. Driver traffic is O(d²), never
   O(N) — the DataFrame form of ALP's ``collectives::allreduce``
   (base/collectives.hpp:121), and the same partial-then-final shape
   kmeans' centroid update uses (kmeans.py).
2. **Driver-side eigendecomposition** — the d×d covariance is tiny;
   ``numpy.linalg.eigh`` on the driver, exactly how the reference runs
   its own O(d³) steps single-process (kmeans.hpp:158-161). Eigenvector
   SIGN is canonicalized (largest-|component| coordinate made
   positive) so results are deterministic across LAPACK builds.
3. **Projection / whitening** — the k selected components ride the
   plan as k·d literals (the same literal-broadcast device as kmeans'
   centroid argmin and IVF's probe, similarity.py): output dim j is a
   ``zip_with``/``aggregate`` fold of (v - mean)·Wⱼ, a pure Column
   expression — no UDF, no shuffle, whole-stage codegen end-to-end.

Whitening (``whiten=True``) scales each projected coordinate by
1/√(λⱼ + eps): the classic conditioning step before int8 quantization
(:func:`alp_spark.pipeline.quantize_embeddings`) or cosine ANN.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PcaModel:
    mean: list  # d
    components: list  # k × d (rows = eigenvectors, λ-descending)
    eigenvalues: list  # k (of the COVARIANCE, λ-descending)
    n: int


def embedding_moments(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(i, j, s) partial-summed Gram/mean cells: j == -1 rows carry
    Σ v[i]; the (-1, -1) row carries the count; i, j ≥ 0 carry
    Σ v[i]·v[j] (upper triangle only — the Gram matrix is symmetric).
    One groupBy over ≤ (d²+3d+2)/2 keys; partials combine map-side."""

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            G = V.T @ V
            sv = V.sum(axis=0)
            d = V.shape[1]
            iu = np.triu_indices(d)
            ii = np.concatenate([iu[0], np.arange(d), [-1]])
            jj = np.concatenate([iu[1], np.full(d, -1), [-1]])
            ss = np.concatenate([G[iu], sv, [float(len(V))]])
            yield pd.DataFrame({"i": ii, "j": jj, "s": ss})

    return (
        emb.select(vec_col)
        .mapInPandas(gram, schema="i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )


def moments_to_covariance(cells) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, C) from collected :func:`embedding_moments` rows —
    the one shared parse of the allreduce cells (the driver query and
    :func:`fit_pca` must not drift apart). Raises on n < 2, where the
    unbiased divisor is 0 or the mean undefined."""
    n = 0
    sums: dict = {}
    for r in cells:
        if r["i"] == -1:
            n = int(r["s"])
        else:
            sums[(r["i"], r["j"])] = r["s"]
    if n < 2:
        raise ValueError("need at least 2 vectors to fit a covariance")
    d = max(i for i, _ in sums) + 1
    mean = np.array([sums[(i, -1)] for i in range(d)]) / n
    G = np.zeros((d, d))
    for (i, j), s in sums.items():
        if j >= 0:
            G[i, j] = s
            G[j, i] = s
    # unbiased covariance: (Σvvᵀ - n·meanmeanᵀ) / (n-1)
    C = (G - n * np.outer(mean, mean)) / (n - 1)
    return n, mean, C


def fit_pca(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PcaModel:
    """Covariance eigendecomposition from one distributed moment pass;
    O(d²) driver traffic, O(d³) driver compute."""
    cells = embedding_moments(emb, id_col, vec_col).collect()
    n, mean, C = moments_to_covariance(cells)
    d = len(mean)
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}]")
    lam, vec = np.linalg.eigh(C)  # ascending
    order = np.argsort(lam)[::-1][:k]
    comps = []
    for idx in order:
        w = vec[:, idx]
        # sign canonicalization: the largest-|w| coordinate is positive
        pivot = int(np.argmax(np.abs(w)))
        if w[pivot] < 0:
            w = -w
        comps.append(w.tolist())
    return PcaModel(
        mean=mean.tolist(),
        components=comps,
        eigenvalues=[float(lam[i]) for i in order],
        n=n,
    )


def transform_pca(
    emb: DataFrame,
    model: PcaModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    whiten: bool = False,
    eps: float = 1e-9,
    out_col: str = "pca",
) -> DataFrame:
    """Project (and optionally whiten) every embedding onto the model's
    components — k pure-Column fold expressions over literal weights;
    no UDF, no shuffle."""
    mean_arr = F.array(*[F.lit(float(m)) for m in model.mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mean_arr, lambda x, m: x - m
    )
    outs = []
    for j, w in enumerate(model.components):
        warr = F.array(*[F.lit(float(x)) for x in w])
        proj = F.aggregate(
            F.zip_with(centered, warr, lambda x, ww: x * ww),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if whiten:
            proj = proj / F.lit(float(np.sqrt(model.eigenvalues[j] + eps)))
        outs.append(proj.alias(f"_p{j}"))
    return emb.select(F.col(id_col), *outs).select(
        id_col, F.array(*[F.col(f"_p{j}") for j in range(len(outs))]).alias(out_col)
    )


def fit_pca_power(
    C: np.ndarray,
    k: int,
    iters: int = 40,
    round_dp: int = 9,
) -> tuple[list, list]:
    """Pinned-iteration power/deflation PCA on a (pre-rounded)
    covariance matrix — the SQL-replayable fit.

    ``eigh`` is not expressible in SQL, so the oracle-backed driver
    query uses this instead (the kmeans technique: pin the algorithm,
    not the answer): ``iters`` power steps from a FIXED start vector,
    Rayleigh-quotient eigenvalue, rank-one deflation, repeat. Every
    hand-off (component, eigenvalue) is rounded to ``round_dp``
    decimals so both engines continue from bit-identical numbers; the
    normalized power map is non-expansive, so engine-level summation
    order differences stay at ~1e-15 between hand-offs. With pinned
    iterations the result is exactly "what this algorithm computes" on
    both sides — converged to the true eigenvectors whenever the
    eigengap allows, and still deterministic when it does not.

    Start vectors: component 0 from the constant vector 1/√d (exact
    dyadic); component j > 0 from the deterministic varied vector
    ``(pos mod 5) - 2`` (deflation makes the generic overlap
    sufficient).

    Returns (components k×d, eigenvalues k), all rounded.
    """
    d = C.shape[0]
    Cw = C.astype(np.float64).copy()
    comps: list = []
    lams: list = []
    for j in range(k):
        if j == 0:
            v = np.full(d, 1.0 / np.sqrt(d))
        else:
            v = ((np.arange(d) % 5) - 2).astype(np.float64)
        for _ in range(iters):
            w = Cw @ v
            v = w / np.sqrt(float(w @ w))
        v = np.round(v, round_dp)
        lam = float(np.round(v @ (Cw @ v), round_dp))
        comps.append(v.tolist())
        lams.append(lam)
        # rank-one deflation with the ROUNDED pair: element-wise ops on
        # identical inputs are bit-identical across engines
        Cw = Cw - lam * np.outer(v, v)
    return comps, lams
