"""Pregel-style PageRank vertex program (no dangling correction, no
global norm — by design, see the reference's own caveat).

Transliterates include/graphblas/algorithms/pregel_pagerank.hpp:53-215:
round 0 → score := 1; round > 0 → score := α + (1-α)·incoming, and a
vertex whose |Δscore| < tolerance either deactivates (``local_converge``)
or votes to halt (global). Broadcast: out := score/outdegree when
outdegree > 0. Message combiner: (add, 0) (pregel_pagerank.hpp:202-203).
Defaults α=0.15, tolerance=1e-5 (pregel_pagerank.hpp:64-69).

The program body is a vectorized NumPy kernel over Arrow batches — the
Spark analog of the per-vertex lambda, with no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import algebra as alg
from ..pregel import PregelContext, PregelResult, pregel


def make_pagerank_program(alpha: float = 0.15, tolerance: float = 1e-5,
                          local_converge: bool = False):
    def program(pdf: pd.DataFrame, ctx: PregelContext) -> pd.DataFrame:
        score = pdf["state"].to_numpy(copy=True)
        if ctx.round == 0:
            score[:] = 1.0
        else:
            incoming = pdf["incoming"].to_numpy()
            old = score.copy()
            score = alpha + (1.0 - alpha) * incoming
            converged = np.abs(score - old) < tolerance
            if local_converge:
                pdf["active"] = ~converged
            else:
                pdf["halt"] = converged
        outdeg = pdf["outdegree"].to_numpy()
        pdf["out"] = np.where(
            outdeg > 0, score / np.maximum(outdeg, 1), pdf["out"].to_numpy()
        )
        pdf["state"] = score
        return pdf

    return program


def make_pagerank_residual_program(alpha: float = 0.15, tolerance: float = 1e-5,
                                   local_converge: bool = False):
    """The same vertex program over STRUCT state
    ``struct<score:double, residual:double>`` — the reference's
    arbitrary-POD vertex state (interfaces/pregel.hpp:508-663): the
    per-round |Δscore| rides in the state instead of being recomputed
    outside the loop. Struct fields arrive flattened as
    ``state__score``/``state__residual`` NumPy columns (see
    alp_spark.pregel), so the body stays fully vectorized."""

    def program(pdf: pd.DataFrame, ctx: PregelContext) -> pd.DataFrame:
        score = pdf["state__score"].to_numpy(copy=True)
        resid = pdf["state__residual"].to_numpy(copy=True)
        if ctx.round == 0:
            score[:] = 1.0
            resid[:] = np.inf
        else:
            incoming = pdf["incoming"].to_numpy()
            old = score.copy()
            score = alpha + (1.0 - alpha) * incoming
            resid = np.abs(score - old)
            converged = resid < tolerance
            if local_converge:
                pdf["active"] = ~converged
            else:
                pdf["halt"] = converged
        outdeg = pdf["outdegree"].to_numpy()
        pdf["out"] = np.where(
            outdeg > 0, score / np.maximum(outdeg, 1), pdf["out"].to_numpy()
        )
        pdf["state__score"] = score
        pdf["state__residual"] = resid
        return pdf

    return program


def pregel_pagerank_residual(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    alpha: float = 0.15,
    tolerance: float = 1e-5,
    local_converge: bool = False,
    max_rounds: int = 0,
    **kwargs,
) -> PregelResult:
    """PageRank with in-state residual over struct-typed Pregel state;
    score trajectory is identical to :func:`pregel_pagerank`."""
    return pregel(
        spark,
        edges,
        n,
        program=make_pagerank_residual_program(alpha, tolerance, local_converge),
        combiner=alg.PLUS,
        state_type="struct<score:double,residual:double>",
        msg_type="double",
        initial_state=(0.0, 0.0),
        max_rounds=max_rounds,
        **kwargs,
    )


def pregel_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    alpha: float = 0.15,
    tolerance: float = 1e-5,
    local_converge: bool = False,
    max_rounds: int = 0,
    **kwargs,
) -> PregelResult:
    return pregel(
        spark,
        edges,
        n,
        program=make_pagerank_program(alpha, tolerance, local_converge),
        combiner=alg.PLUS,
        state_type="double",
        msg_type="double",
        initial_state=0.0,
        max_rounds=max_rounds,
        **kwargs,
    )
