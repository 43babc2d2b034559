"""Iterative-algorithm evidence on the 158.6M-edge graph (VERDICT r4 #7).

Round-4 scale evidence ran PageRank/SSSP on the 4M-vertex / 158.6M-edge
Zipf graph (benchdata/scaling_n4000000_d40.parquet, bench_scaling.py
--avg-deg 40 shape); this runs the remaining iterative algorithms —
connected_components (Pregel flood), fastsv_cc (O(log n) rounds), and
kcore (h-index engine) — on the same graph so every driver-suite
iterative algorithm has at-scale timing.

Usage::

    SPARK_GRAFT_DRIVER_MEM=64g python scripts/bench_biggraph.py \
        --cores 32 [--queries connected_components fastsv kcore]

Prints one JSON line {"n": ..., "edges": ..., "sym_edges": ...,
"queries": {name: {"sec": s, "rounds": r}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_PATH = "benchdata/scaling_n4000000_d40.parquet"
N = 4_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--path", default=DEFAULT_PATH)
    ap.add_argument("--n", type=int, default=N)
    ap.add_argument(
        "--queries", nargs="*",
        default=["connected_components", "fastsv", "kcore"],
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from alp_spark.algorithms import (
        connected_components,
        fastsv_components,
        kcore_decomposition,
    )
    from alp_spark.algorithms.sssp import sssp
    from alp_spark.containers import VAL
    from alp_spark.containers import DST, SRC
    from alp_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]", shuffle_partitions=args.cores
    )
    E = spark.read.parquet(args.path).persist()
    m = E.count()
    Esym = (
        E.unionByName(E.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .distinct()
        .persist()
    )
    msym = Esym.count()
    E.unpersist()

    out = {"n": args.n, "edges": m, "sym_edges": msym,
           "cores": args.cores, "queries": {}}
    for q in args.queries:
        t0 = time.time()
        if q == "connected_components":
            res = connected_components(spark, Esym, args.n)
            res.state.count()
            rounds = res.rounds
        elif q == "fastsv":
            res = fastsv_components(spark, Esym, args.n)
            res.labels.count()
            rounds = res.rounds
        elif q == "kcore":
            res = kcore_decomposition(spark, Esym, args.n)
            res.cores.count()
            rounds = getattr(res, "rounds", None)
        elif q == "hits":
            from alp_spark.algorithms.hits import hits

            res = hits(
                spark, spark.read.parquet(args.path), args.n, iters=5
            )
            res.auth.count()
            res.hubs.count()
            rounds = res.rounds
        elif q == "scc":
            from alp_spark.algorithms.scc import strongly_connected_components

            res = strongly_connected_components(
                spark, spark.read.parquet(args.path), args.n
            )
            res.labels.count()
            rounds = res.inner_rounds
        elif q == "mis":
            from alp_spark.algorithms.mis import maximal_independent_set

            res = maximal_independent_set(spark, Esym, args.n)
            res.members.count()
            rounds = res.rounds
        elif q == "sssp":
            # deterministic per-edge weights, the bench_graphscale recipe
            w = ((F.col(SRC) * 7 + F.col(DST) * 13) % 10) / 10.0 + 0.1
            res = sssp(
                spark,
                spark.read.parquet(args.path).select(SRC, DST, w.alias(VAL)),
                args.n,
                0,
            )
            res.dists.count()
            rounds = res.rounds
        else:
            raise SystemExit(f"unknown query {q}")
        sec = round(time.time() - t0, 3)
        out["queries"][q] = {"sec": sec, "rounds": rounds}
        print(f"# {q}: {sec}s rounds={rounds}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
