"""Pregel connected components: max-label flood.

Transliterates include/graphblas/algorithms/
pregel_connected_components.hpp:47-169: labels init to the vertex id
(set<use_index>, :136); per round a vertex 1) broadcasts its label when
outdegree > 0 (else votes halt), 2) with indegree == 0 votes halt, else
3) adopts a larger incoming label or votes halt. Combiner: (max, -inf)
(:149-152). Labels are exact integers — the reference requires **max**
label (not min) and we match that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import algebra as alg
from ..pregel import PregelContext, PregelResult, pregel


def _cc_program(pdf: pd.DataFrame, ctx: PregelContext) -> pd.DataFrame:
    label = pdf["state"].to_numpy(copy=True)
    halt = np.zeros(len(pdf), dtype=bool)
    if ctx.round > 0:
        incoming = pdf["incoming"].to_numpy()
        indeg = pdf["indegree"].to_numpy()
        adopt = (indeg != 0) & (label < incoming)
        halt |= indeg == 0
        halt |= (indeg != 0) & ~adopt
        label = np.where(adopt, incoming, label)
    outdeg = pdf["outdegree"].to_numpy()
    pdf["out"] = np.where(outdeg > 0, label, pdf["out"].to_numpy())
    halt |= outdeg == 0
    pdf["state"] = label
    pdf["halt"] = halt
    return pdf


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    max_rounds: int = 0,
    **kwargs,
) -> PregelResult:
    """Component id per vertex in ``state`` (exact; id = max vertex id of
    the component when the graph is symmetric)."""
    return pregel(
        spark,
        edges,
        n,
        program=_cc_program,
        combiner=alg.MAX_LONG,
        state_type="long",
        msg_type="long",
        init_use_index=True,
        max_rounds=max_rounds,
        **kwargs,
    )
