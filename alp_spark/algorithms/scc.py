"""Strongly connected components via min-label coloring + backward
reach (the FW-BW / coloring family: Orzan 2004; Slota, Rajamanickam,
Madduri IPDPS 2014 — public algorithms).

Per outer round, on the still-unassigned subgraph:

1. **Color** (forward min flood): ``f(v)`` = the minimum vertex id
   that reaches v (including v), computed by iterating
   ``f(v) ← min(f(v), min over in-edges (u,v) of f(u))`` to fixpoint —
   the directed analog of the Pregel CC flood (min-label semiring,
   pregel_connected_components.hpp:47-169 vocabulary).
2. **Harvest** (backward flood inside one color): from each color root
   r (``f(r) = r``), walk edges BACKWARD restricted to vertices of the
   same color. Every vertex that reaches its own color root r is
   mutually reachable with r (r reaches it by the color's definition),
   so it belongs to SCC(r); and every member of SCC(r) has color r
   (no smaller vertex reaches it, else its color would be smaller).
   Assign ``scc = f(v)`` to harvested vertices — the SCC's MINIMUM
   vertex id, the FastSV label convention.
3. Remove assigned vertices and their edges; repeat.

Every color class surrenders one whole SCC per outer round (the SCC of
its minimum vertex), so rounds are bounded by the longest chain in the
condensation DAG that is exposed one-SCC-at-a-time; hub-dense web
graphs (one giant SCC + shallow IN/OUT tendrils) finish in a handful
of outer rounds. The adversarial case — a long path of singleton SCCs
ordered against the labels — degrades to O(path) rounds; the classic
mitigation (trim: iteratively assign vertices whose in- or out-degree
inside the active set is zero, each a singleton SCC) runs first each
outer round and absorbs exactly those chains.

Scale shape: per inner round one join + one map-side-combined min
aggregation (the FastSV currency); ONE census action per inner round;
state localCheckpoint'ed; the active edge set is re-filtered (two
semi-joins) and re-persisted once per outer round.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..containers import DST, ID, SRC


@dataclass
class SCCResult:
    labels: DataFrame  # (id, scc) — scc = min vertex id of the component
    outer_rounds: int
    inner_rounds: int


def _min_flood(
    active: DataFrame, E: DataFrame, forward: bool
) -> tuple[DataFrame, int]:
    """Min-label flood over the active vertex set: returns (id, f) with
    f = min id that reaches v (forward=True) or that v reaches
    (forward=False). ``active`` is (id,); E is already restricted."""
    a, b = (SRC, DST) if forward else (DST, SRC)
    f = active.select(ID, F.col(ID).alias("_f")).localCheckpoint(eager=True)
    rounds = 0
    while True:
        pushed = (
            E.join(f.select(F.col(ID).alias(a), F.col("_f").alias("_in")), on=a)
            .groupBy(b)
            .agg(F.min("_in").alias("_m"))
            .select(F.col(b).alias(ID), "_m")
        )
        # shortcutting (VERDICT r5): pointer-double on the label vector —
        # f[f[v]] is a valid "reaches v" label (u = f[v] reaches v and
        # f[u] reaches u), so folding it into the min compresses long
        # propagation chains from O(diameter) to O(log) rounds while
        # leaving the fixpoint (the true reachability minimum) unchanged.
        # The parent side is unique-keyed — the FastSV lookup shape.
        gp = f.join(
            f.select(F.col(ID).alias("_p"), F.col("_f").alias("_gf")),
            on=F.col("_f") == F.col("_p"),
        ).select(ID, F.col("_gf").alias("_g"))
        nxt = (
            f.join(pushed, on=ID, how="left")
            .join(gp, on=ID, how="left")
            .select(
                ID,
                F.least(
                    F.col("_f"),
                    F.coalesce("_m", F.col("_f")),
                    F.coalesce("_g", F.col("_f")),
                ).alias("_f"),
                (
                    (F.coalesce("_m", F.col("_f")) < F.col("_f"))
                    | (F.coalesce("_g", F.col("_f")) < F.col("_f"))
                ).alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = nxt.where(F.col("_chg")).count()
        f = nxt.select(ID, "_f")
        rounds += 1
        if changed == 0:
            return f, rounds


def reach_set(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    forward: bool = True,
) -> DataFrame:
    """Fixpoint reachability from a seed set (frontier BFS): returns
    (id,) of every vertex reachable FROM the seeds along edge direction
    (``forward=True``) or that REACHES the seeds (``forward=False``),
    seeds included. One census action per BFS level; each level
    expands only the new frontier (classic delta optimisation — the
    SSSP delta-frontier argument with the boolean (or, and) ring)."""
    a, b = (SRC, DST) if forward else (DST, SRC)
    from ..plans.partitions import cache_sized

    E, _ = cache_sized(spark, edges.select(SRC, DST), key=a)
    r = seeds.select(ID).distinct().localCheckpoint(eager=True)
    frontier = r
    while True:
        step = (
            E.join(frontier.select(F.col(ID).alias(a)), on=a)
            .select(F.col(b).alias(ID))
            .distinct()
            .join(r, on=ID, how="left_anti")
            .localCheckpoint(eager=False)
        )
        if step.count() == 0:
            break
        r = r.unionByName(step).localCheckpoint(eager=True)
        frontier = step
    E.unpersist()
    return r


def bowtie_classes(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
) -> DataFrame:
    """Broder et al. (WWW 2000) bow-tie decomposition: label every
    vertex ``core`` (the largest SCC; ties broken by smallest label),
    ``in`` (reaches the core), ``out`` (reachable from the core), or
    ``other`` (tendrils, tubes, disconnected). Returns (id, cls)."""
    labels = strongly_connected_components(spark, edges, n).labels
    labels = labels.localCheckpoint(eager=True)
    core_lbl = (
        labels.groupBy("scc")
        .agg(F.count("*").alias("_sz"))
        .orderBy(F.col("_sz").desc(), F.col("scc").asc())
        .limit(1)
        .select("scc")
    )
    core = labels.join(F.broadcast(core_lbl), on="scc", how="left_semi").select(ID)
    core = core.localCheckpoint(eager=True)
    fwd = reach_set(spark, edges, core, forward=True)
    bwd = reach_set(spark, edges, core, forward=False)
    return (
        spark.range(n)
        .select(F.col("id").alias(ID))
        .join(core.select(ID, F.lit(True).alias("_c")), on=ID, how="left")
        .join(bwd.select(ID, F.lit(True).alias("_in")), on=ID, how="left")
        .join(fwd.select(ID, F.lit(True).alias("_out")), on=ID, how="left")
        .select(
            ID,
            F.when(F.col("_c"), F.lit("core"))
            .when(F.col("_in"), F.lit("in"))
            .when(F.col("_out"), F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("cls"),
        )
    )


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    max_outer: int = 0,
) -> SCCResult:
    """Exact SCC labels for vertices 0..n-1 over the directed edge
    table (no self-loops required; parallel edges tolerated). Labels
    are the component's minimum vertex id. Isolated vertices and all
    other singleton SCCs get their own id."""
    assigned_parts: list[DataFrame] = []
    active = spark.range(n).select(F.col("id").alias(ID)).localCheckpoint(
        eager=True
    )
    from ..plans.partitions import cache_sized

    Eact, _ = cache_sized(spark, edges.select(SRC, DST), key=DST)

    outer = 0
    inner = 0
    while True:
        n_active = active.count()
        if n_active == 0 or (max_outer and outer >= max_outer):
            break
        outer += 1

        # trim: peel vertices with zero in- or out-degree inside the
        # active set — each is a singleton SCC; repeat to absorb chains
        while True:
            srcs = Eact.select(F.col(SRC).alias(ID)).distinct()
            dsts = Eact.select(F.col(DST).alias(ID)).distinct()
            trivial = active.join(srcs, on=ID, how="left_anti").unionByName(
                active.join(dsts, on=ID, how="left_anti")
            ).distinct().localCheckpoint(eager=True)
            inner += 1
            if trivial.count() == 0:
                break
            assigned_parts.append(trivial.select(ID, F.col(ID).alias("scc")))
            active = active.join(trivial, on=ID, how="left_anti").localCheckpoint(
                eager=True
            )
            nE = (
                Eact.join(trivial.select(F.col(ID).alias(SRC)), on=SRC, how="left_anti")
                .join(trivial.select(F.col(ID).alias(DST)), on=DST, how="left_anti")
                .persist()
            )
            nE.count()
            Eact.unpersist()
            Eact = nE
        if active.count() == 0:
            continue

        # color: forward min flood
        f, r1 = _min_flood(active, Eact, forward=True)
        f = f.localCheckpoint(eager=True)
        inner += r1

        # harvest: backward reach from each color root within the color
        roots = f.where(F.col(ID) == F.col("_f")).select(ID, "_f")
        reached = roots.localCheckpoint(eager=True)
        while True:
            # v active joins if some out-edge (v,u) lands in `reached`
            # with matching color
            step = (
                Eact.join(
                    reached.select(F.col(ID).alias(DST), F.col("_f").alias("_rf")),
                    on=DST,
                )
                .join(
                    f.select(F.col(ID).alias(SRC), F.col("_f").alias("_vf")),
                    on=SRC,
                )
                .where(F.col("_rf") == F.col("_vf"))
                .select(F.col(SRC).alias(ID), F.col("_vf").alias("_f"))
                .distinct()
                .join(reached.select(ID), on=ID, how="left_anti")
                .localCheckpoint(eager=False)
            )
            grew = step.count()
            inner += 1
            if grew == 0:
                break
            reached = reached.unionByName(step).localCheckpoint(eager=True)

        assigned_parts.append(reached.select(ID, F.col("_f").alias("scc")))
        active = active.join(reached.select(ID), on=ID, how="left_anti").localCheckpoint(
            eager=True
        )
        nE = (
            Eact.join(reached.select(F.col(ID).alias(SRC)), on=SRC, how="left_anti")
            .join(reached.select(F.col(ID).alias(DST)), on=DST, how="left_anti")
            .persist()
        )
        nE.count()
        Eact.unpersist()
        Eact = nE

    Eact.unpersist()
    if not assigned_parts:  # n == 0
        out = spark.range(0).select(ID, F.col(ID).alias("scc"))
    else:
        out = assigned_parts[0]
        for p in assigned_parts[1:]:
            out = out.unionByName(p)
    return SCCResult(labels=out, outer_rounds=outer, inner_rounds=inner)
