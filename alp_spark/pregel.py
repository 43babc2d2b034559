"""Vertex-centric Pregel runtime on DataFrames.

Re-expresses ``grb::interfaces::Pregel`` (reference:
include/graphblas/interfaces/pregel.hpp:337-953) as a driver-side
superstep loop over one state DataFrame; semantics traced from the
reference ``execute`` (pregel.hpp:650-920):

1. the vertex program runs on ACTIVE vertices only (masked eWiseLambda,
   pregel.hpp:765-804). Physically: the state frame is split by the
   ``active`` column, ONLY the active slice goes through the Arrow
   ``mapInPandas`` program pass, and the inactive slice is unioned back
   via a pure-Column projection — so the per-superstep Python/Arrow cost
   is O(active), not O(n). (Late supersteps of CC/label-prop have tiny
   frontiers; serializing all n rows through Python for them was the
   round-1 scale bug.)
2. halt check: terminate when every vertex that ran this round voted to
   halt (foldl over the round-entry active set, pregel.hpp:812-814);
3. the active set only shrinks (sparsification, pregel.hpp:831-833);
   terminate when empty (:840-847); ``max_rounds`` → FAILED (:850-858);
4. halt votes reset each round (:865-878);
5. message exchange: in[j] = ⊕_{i→j} out[i], output-masked to the new
   active set — the (⊕, left_assign_if) broadcast ring vxm
   (pregel.hpp:882-884, ring built at :714-721). NOTE the reference
   default keeps ``out`` dense (SparsificationStrategy NONE,
   pregel.hpp:242): vertices that went inactive KEEP broadcasting their
   last message. We reproduce that exactly by default — it is
   load-bearing for round-count and label parity.
6. ``sparsify`` exposes the reference's full SparsificationStrategy set
   (pregel.hpp:167-242, applied at :887-898): under
   'always'/'when_reduced'/'when_halved' the outgoing-message vector is
   restricted to the active set (and reset to the combiner identity)
   right after an exchange, so inactive vertices stop broadcasting and
   the exchange join input shrinks with the frontier. The reference
   applies sparsify AFTER the vxm; in this loop's phase (exchange at
   round entry) that lands between assembling ``incoming`` and running
   the program. Liveness is tracked in the ``_out_live`` column;
   ``out_nnz`` (the trigger's cost input) is carried on the driver.
   Measured (scripts/bench_pregel_sparsify.py, BASELINE.md round 5):
   the reference's "ALWAYS is slower" result does NOT carry over —
   here sparsify is one fused predicate, not a workspace compaction,
   so all strategies sit within ~7% on the CC flood (ALWAYS slightly
   ahead). Default stays 'none' for reference parity; enabling it is
   safe and pays on early-decaying frontiers.

Per-superstep Spark cost: one message groupBy (shuffle, map-side partial
agg absorbs hub in-degree skew), one id-join against the ACTIVE slice,
one ``mapInPandas`` program pass over O(active) rows, one small stats
action. State is localCheckpoint'ed every round to truncate lineage and
parquet-checkpointed with lineage + metrics every ``checkpoint_every``
rounds (resumable — north rule).

The per-vertex ``PregelState`` fields (pregel.hpp:266-326) map to columns
``active, halt, outdegree, indegree, id`` plus context globals
``round, num_vertices, num_edges`` on :class:`PregelContext`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType, _parse_datatype_string

from . import algebra as alg
from .containers import DST, ID, SRC, VAL
from .operators import vxm
from .plans.partitions import cache_sized, range_partitions


@dataclass
class PregelContext:
    round: int
    num_vertices: int
    num_edges: int
    data: object = None


@dataclass
class PregelResult:
    state: DataFrame  # (id, state, out, active, halt, outdegree, indegree)
    rounds: int
    converged: bool  # False ⇔ max_rounds exceeded (reference RC FAILED)
    history: list[dict] = field(default_factory=list)


VertexProgram = Callable[[pd.DataFrame, PregelContext], pd.DataFrame]

_STATE_COLS = ["id", "state", "out", "active", "halt", "outdegree", "indegree"]
_SPARSIFY = ("none", "always", "when_reduced", "when_halved")


# --- struct-typed state/messages (reference vertex programs take
# arbitrary POD state, interfaces/pregel.hpp:508-663) ------------------------
#
# A struct ``state_type``/``msg_type`` crosses the Arrow boundary
# FLATTENED into one column per field (``state__<field>``,
# ``out__<field>``, ``incoming__<field>``) so vertex programs keep
# operating on NumPy arrays — Arrow struct columns would otherwise
# surface as per-row python dicts in pandas. The runtime reassembles
# the struct right after the program pass; everything outside the
# program (joins, masks, the combiner agg) sees ordinary struct
# Columns, which Spark compares/aggregates natively (the pair monoids
# ARGMIN/ARGMAX already fold struct(val, idx)).

def _struct_lit(value, dt: DataType):
    """Literal Column for a scalar or a struct-typed tuple value."""
    if isinstance(dt, StructType):
        vals = value if isinstance(value, (tuple, list)) else (value,) * len(dt)
        return F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(vals, dt.fields)
            ]
        )
    return F.lit(value).cast(dt)


def _flat_fields(name: str, dt: DataType) -> list[tuple[str, str]]:
    """(flat column name, type ddl) pairs for one logical column."""
    if isinstance(dt, StructType):
        return [
            (f"{name}__{f.name}", f.dataType.simpleString()) for f in dt.fields
        ]
    return [(name, dt.simpleString())]


def _flatten(name: str, dt: DataType) -> list:
    if isinstance(dt, StructType):
        return [
            F.col(f"{name}.{f.name}").alias(f"{name}__{f.name}")
            for f in dt.fields
        ]
    return [F.col(name)]


def _reassemble(name: str, dt: DataType):
    if isinstance(dt, StructType):
        return F.struct(
            *[F.col(f"{name}__{f.name}").alias(f.name) for f in dt.fields]
        ).alias(name)
    return F.col(name)


def _degrees(spark: SparkSession, edges: DataFrame, n: int) -> DataFrame:
    """Out/in-degrees per vertex, one pass each (the Pregel constructor's
    mxv over (add, right_assign_if) with dense+transpose descriptors,
    pregel.hpp:380-416)."""
    out = edges.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("outdegree"))
    inn = edges.groupBy(F.col(DST).alias(ID)).agg(F.count("*").alias("indegree"))
    return (
        spark.range(0, n, 1, range_partitions(spark, n))
        .select(F.col("id").alias(ID))
        .join(out, on=ID, how="left")
        .join(inn, on=ID, how="left")
        .select(
            ID,
            F.coalesce("outdegree", F.lit(0)).alias("outdegree"),
            F.coalesce("indegree", F.lit(0)).alias("indegree"),
        )
    )


def pregel(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    program: VertexProgram,
    combiner: alg.Monoid,
    state_type: str = "double",
    msg_type: str = "double",
    initial_state: object = 0.0,
    init_use_index: bool = False,
    data: object = None,
    max_rounds: int = 0,
    num_edges: int | None = None,
    checkpointer=None,
    checkpoint_every: int = 10,
    resume_state: DataFrame | None = None,
    resume_round: int = 0,
    sparsify: str = "none",
) -> PregelResult:
    """Run a vertex program to termination (pregel.hpp:650-920).

    ``sparsify``: the reference SparsificationStrategy for the outgoing
    message vector (pregel.hpp:167-242) — 'none' (reference default,
    inactive vertices keep broadcasting their last message) | 'always' |
    'when_reduced' | 'when_halved'.
    """
    if sparsify not in _SPARSIFY:
        raise ValueError(f"sparsify must be one of {_SPARSIFY}")
    # the superstep loop scans the edge table every round: cache it ONCE
    # in a size-derived layout (guide §2/§5 — it was re-derived from its
    # source plan per round before) and reuse the count it needed anyway
    edges, counted = cache_sized(spark, edges, key=SRC)
    nnz = num_edges if num_edges is not None else counted
    state_dt = _parse_datatype_string(state_type)
    msg_dt = _parse_datatype_string(msg_type)
    msg_id_col = _struct_lit(combiner.identity, msg_dt)

    flat_state = _flat_fields("state", state_dt)
    flat_out = _flat_fields("out", msg_dt)
    flat_incoming = _flat_fields("incoming", msg_dt)
    schema = ", ".join(
        ["id long"]
        + [f"{n_} {t}" for n_, t in flat_state]
        + [f"{n_} {t}" for n_, t in flat_out]
        + [
            "active boolean", "halt boolean", "outdegree long",
            "indegree long", "_ran boolean",
        ]
    )

    if resume_state is not None:
        state = resume_state.select(*_STATE_COLS)
        step = resume_round
    else:
        deg = _degrees(spark, edges, n)
        # init_use_index: state := vertex id (set<use_index>,
        # descriptors.hpp:167 — the Pregel CC label init,
        # pregel_connected_components.hpp:136)
        init_col = (
            F.col(ID).cast(state_type)
            if init_use_index
            else _struct_lit(initial_state, state_dt)
        )
        state = deg.select(
            ID,
            init_col.alias("state"),
            msg_id_col.alias("out"),
            F.lit(True).alias("active"),
            F.lit(False).alias("halt"),
            "outdegree",
            "indegree",
        )
        step = 0
    # out-liveness under sparsification; on resume the live set restarts
    # at the active set (≡ a sparsify applied at resume) for != 'none'
    live_init = F.lit(True) if sparsify == "none" else F.col("active")
    state = state.withColumn("_out_live", live_init)
    state = state.localCheckpoint(eager=True)

    # flattened column order the program receives and must return —
    # matches ``schema`` above
    out_cols = (
        ["id"]
        + [n_ for n_, _ in flat_state]
        + [n_ for n_, _ in flat_out]
        + ["active", "halt", "outdegree", "indegree", "_ran"]
    )
    prog_in = (
        [F.col("id")]
        + _flatten("state", state_dt)
        + _flatten("out", msg_dt)
        + [F.col("active"), F.col("halt"), F.col("outdegree"), F.col("indegree")]
        + _flatten("incoming", msg_dt)
        + [F.col("_ran")]
    )

    # instrument the Arrow program pass: rows actually serialized through
    # Python per run (test hook for the O(active) contract; task retries
    # can overcount, which is fine for its purpose)
    prog_rows_acc = spark.sparkContext.accumulator(0)

    def run_program(ctx: PregelContext):
        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.reindex(columns=out_cols)
                    continue
                prog_rows_acc.add(len(pdf))
                # every input row is active by construction; the program
                # may flip `active`/`halt` and write `state`/`out`
                out = program(pdf, ctx)
                yield out[out_cols]
        return fn

    history: list[dict] = []
    converged = True
    out_nnz = n  # nnz of the outgoing-message vector (driver-tracked)
    # a resumed state can carry inactive rows — the split decision below
    # needs the real census (one cheap action, resume only)
    n_active = (
        state.where("active").count() if resume_state is not None else n
    )
    while True:
        # ---- exchange: incoming[j] = ⊕_{i→j, live(i)} out[i] ---------------
        # when EVERY vertex is active (halt-vote-only programs never
        # shrink the set) the split/union machinery is pure overhead —
        # run the whole frame through the program and skip the
        # passthrough branch
        split = n_active < n
        active_state = state.where("active") if split else state
        if step == 0 and resume_state is None:
            cur = active_state.withColumn("incoming", msg_id_col)
        else:
            out_vec = (
                state.where("_out_live") if sparsify != "none" else state
            ).select(ID, F.col("out").alias(VAL))
            # all-active rounds: the output mask covers every vertex, so
            # the edges-vs-active semi-join would be a per-round no-op
            active_ids = active_state.select(ID) if split else None
            ring = alg.Semiring(add=combiner, mul=alg.left_assign, one=True)
            # the out vector has out_nnz entries: broadcast-join when it
            # fits, shuffle otherwise — the CRS/CCS direction choice.
            # n_active is already counted on the driver: pass it through
            # so a small-frontier round broadcasts the out-mask semi-join
            # too and the edge table is never shuffled (the reference's
            # counted-size emiim choice, reference/blas2.hpp:1063-1145)
            msgs = vxm(
                out_vec, edges, ring, out_mask=active_ids,
                strategy="auto", frontier_nnz=out_nnz,
                out_mask_nnz=n_active if split else None,
            )
            # NOTE: no broadcast hint on the msgs side of the state
            # join — measured (round 4): forcing it regressed the
            # iterative loop ~10× (the eager per-round broadcast build
            # defeats the lazily-checkpointed steady state), while AQE
            # already picks a broadcast join from runtime stats when
            # profitable. The driver-informed hints live where they pay:
            # the out-mask semi-join and the frontier join INSIDE vxm
            # (out_mask_nnz / frontier_nnz above).
            cur = active_state.join(
                msgs.select(ID, F.col(VAL).alias("_msg")), on=ID, how="left"
            ).withColumn(
                "incoming", F.coalesce(F.col("_msg"), msg_id_col)
            ).drop("_msg")

        # ---- sparsify-out (reference order: right after the vxm, before
        # the next program pass — pregel.hpp:887-898) -------------------------
        do_sparsify = sparsify != "none" and (step > 0 or resume_state is not None) and (
            sparsify == "always"
            or (sparsify == "when_reduced" and out_nnz > n_active)
            or (sparsify == "when_halved" and n_active <= out_nnz // 2)
        )
        if do_sparsify:
            # live := active, out := combiner identity on the live set
            cur = cur.withColumn("out", msg_id_col)
            out_nnz = n_active

        cur = (
            cur.withColumn("_ran", F.lit(True))
            .withColumn("halt", F.lit(False))  # votes reset (pregel.hpp:865-870)
        )
        ctx = PregelContext(round=step, num_vertices=n, num_edges=nnz, data=data)
        programmed = cur.select(*prog_in).mapInPandas(
            run_program(ctx), schema=schema
        ).select(
            ID,
            _reassemble("state", state_dt),
            _reassemble("out", msg_dt),
            "active", "halt", "outdegree", "indegree", "_ran",
        )
        # programmed rows are always live: live ⊇ active is invariant
        # (sparsify sets live := active; active only shrinks)
        new = programmed.withColumn("_out_live", F.lit(True))
        if split:
            # inactive rows never enter Python: pure-Column passthrough.
            # Their halt vote resets too (grb::clear over ALL votes,
            # pregel.hpp:866) and, on a sparsify round, they leave the
            # live out set.
            passthrough = state.where(~F.col("active")).select(
                ID,
                "state",
                "out",
                "active",
                F.lit(False).alias("halt"),
                "outdegree",
                "indegree",
                F.lit(False).alias("_ran"),
                (F.lit(False) if do_sparsify else F.col("_out_live")).alias("_out_live"),
            )
            new = new.unionByName(passthrough)
        # LAZY checkpoint: the stats action below materializes it, so a
        # superstep costs ONE job instead of checkpoint-job + stats-job.
        # The old state must stay cached until that action runs.
        new = new.localCheckpoint(eager=False)
        old_state = state
        state = new

        step += 1

        # ---- one stats action: halt vote + active census (also
        # materializes the checkpoint) ----------------------------------------
        stats = state.agg(
            F.min(F.when(F.col("_ran"), F.col("halt"))).alias("all_halt"),
            F.sum(F.col("active").cast("long")).alias("n_active"),
        ).collect()[0]
        old_state.unpersist()
        n_active = int(stats["n_active"] or 0)
        all_halt = bool(stats["all_halt"]) if stats["all_halt"] is not None else False
        history.append(
            {
                "round": step,
                "active": n_active,
                "all_halt": all_halt,
                "program_rows": prog_rows_acc.value,
                "out_nnz": out_nnz,
            }
        )

        if checkpointer is not None and step % checkpoint_every == 0:
            checkpointer.save(
                state.select(*_STATE_COLS),
                superstep=step,
                metrics={"active": n_active, "all_halt": all_halt},
            )

        if all_halt:  # everyone who ran voted to halt (pregel.hpp:816-822)
            break
        if n_active == 0:  # all vertices inactive (pregel.hpp:840-847)
            break
        if max_rounds > 0 and step > max_rounds:  # (pregel.hpp:850-858)
            converged = False
            break

    edges.unpersist()  # state is checkpointed — the cache can go
    result = state.select(*_STATE_COLS)
    if checkpointer is not None:
        checkpointer.save(
            result, superstep=step, metrics={"rounds": step, "converged": converged},
            final=True,
        )
    return PregelResult(state=result, rounds=step, converged=converged, history=history)
