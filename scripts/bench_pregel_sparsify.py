"""Pregel SparsificationStrategy bench (VERDICT r4 item 9).

The reference measured ALWAYS slower than NONE for its dense Pregel
workloads and made NONE the default (interfaces/pregel.hpp:183-184:
"sparsifying the workspace typically is not worth it"). This script
reproduces the experiment for the Spark engine on the connected-
components max-label flood: identical program, ``sparsify`` in
{none, when_halved, always}, same input, timed end to end.

Usage::

    python scripts/bench_pregel_sparsify.py [--sf-dir /root/testdata/sf0.1]
        [--cores 32] [--repeats 2]
    # or on an arbitrary (src, dst) digraph parquet (symmetrised here):
    python scripts/bench_pregel_sparsify.py \
        --graph benchdata/graphscale/g_100000_24.parquet --n 100000

Prints one JSON line with per-strategy seconds (all repeats + min) and
the round count (strategies must agree on rounds AND labels — the label
checksum is asserted).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--graph", default=None,
                    help="(src,dst) digraph parquet; overrides --sf-dir")
    ap.add_argument("--n", type=int, default=None,
                    help="vertex count for --graph")
    args = ap.parse_args()

    from alp_spark.session import get_spark

    spark = get_spark(
        app_name="bench-pregel-sparsify",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from alp_spark.algorithms import connected_components

    if args.graph:
        assert args.n, "--graph requires --n"
        raw = spark.read.parquet(args.graph)
        E = (
            raw.unionByName(
                raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .persist()
        )
        n = args.n
    else:
        E = entrymod._sym_edges(spark, args.sf_dir).persist()
        n = entrymod.N_V
    m = E.count()

    out: dict = {"n": n, "edges": m, "strategies": {}}
    checksums = {}
    for strategy in ("none", "when_halved", "always"):
        times = []
        for r in range(args.repeats + 1):  # first run = untimed warmup
            t0 = time.perf_counter()
            res = connected_components(spark, E, n, sparsify=strategy)
            row = res.state.agg(
                F.sum("state").alias("s"), F.count("*").alias("c")
            ).collect()[0]
            dt = time.perf_counter() - t0
            if r > 0:
                times.append(round(dt, 2))
            checksums[strategy] = (int(row["s"]), int(row["c"]), res.rounds)
        out["strategies"][strategy] = {
            "times_s": times,
            "min_s": min(times),
            "rounds": checksums[strategy][2],
        }
    # identical labels regardless of strategy (sparsification is a
    # workspace optimization, never a semantics change)
    assert len({v[:2] for v in checksums.values()}) == 1, checksums
    print(json.dumps(out))


if __name__ == "__main__":
    main()
