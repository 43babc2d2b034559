"""Ingest-slice throughput: pages → extracted text → (src, dst) edges.

The north star's first stage — "web pages are parsed with vectorized
Arrow UDFs into a (src, dst) edge table" — measured end-to-end at bench
scale. A deterministic synthetic corpus (FIXTURES.md §1 page template,
out-links from a fixed modular formula, built entirely as a Spark plan)
is materialised to parquet once; the timed phases then run

  1. text extraction: `extract_text_udf(html)` over every page, forced
     by a byte-count aggregate (the per-url byte-identical contract is
     pytest-asserted; here we time the same UDF at corpus scale), and
  2. edge build: `build_edge_table` (link extraction UDF → contiguous
     id assignment → two id joins → dedup),

and the run cross-checks the extracted link set against the generating
formula EXACTLY (anti-join in both directions must be empty) before
reporting — a throughput number for a wrong edge table is worthless.

Usage::

    spark-submit --master local[32] --py-files alp_spark.zip \
        scripts/bench_ingest.py --n 100000

One JSON line: {"n_pages": ..., "n_edges": ..., "html_mb": ...,
"extract_sec": ..., "pages_per_sec": ..., "mb_per_sec": ...,
"edges_sec": ..., "edges_per_sec": ..., "roundtrip_ok": true}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OUT_DEG = 16


def synthetic_edges(spark, n: int):
    """Deterministic out-links: dst_k(src) = (src·31 + k·7919 + 1) mod n,
    self-loops dropped — a pure Column plan, no driver data."""
    ks = F.array(*[F.lit(k) for k in range(OUT_DEG)])
    return (
        spark.range(n)
        .select(F.col("id").alias("src"), F.explode(ks).alias("k"))
        .select(
            "src",
            ((F.col("src") * 31 + F.col("k") * 7919 + 1) % n).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--data-dir", default="benchdata")
    args = ap.parse_args()

    from alp_spark.session import get_spark
    from alp_spark.sources.extract import extract_text_udf
    from alp_spark.sources.links import build_edge_table, extract_edges
    from alp_spark.sources.pages import N_DOMAINS, synthesize_pages

    spark = get_spark(app_name=f"ingest-bench-{args.n}")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = os.path.join(args.data_dir, f"pages_{args.n}.parquet")
    edges_in = synthetic_edges(spark, args.n)
    if not os.path.exists(corpus):
        t0 = time.monotonic()
        synthesize_pages(spark, args.n, edges_in).write.mode(
            "overwrite"
        ).parquet(corpus)
        print(
            f"# synthesized {args.n} pages in {time.monotonic()-t0:.1f}s",
            file=sys.stderr,
        )

    pages = spark.read.parquet(corpus)
    html_bytes = pages.agg(F.sum(F.length("html"))).collect()[0][0]

    # --- phase 1: text extraction over every page --------------------------
    t0 = time.monotonic()
    n_text_bytes = (
        pages.select(F.length(extract_text_udf(F.col("html"))).alias("b"))
        .agg(F.sum("b"))
        .collect()[0][0]
    )
    extract_sec = time.monotonic() - t0

    # --- phase 2: link extraction → id assignment → edge table -------------
    t0 = time.monotonic()
    edges_out, id_map = build_edge_table(pages)
    n_edges = edges_out.count()
    edges_sec = time.monotonic() - t0

    # --- exactness: extracted URL pairs == generating formula --------------
    url = lambda c: F.format_string(  # noqa: E731 — mirror pages.url_of
        "https://site%04d.example/p/%05d", F.col(c) % N_DOMAINS, F.col(c)
    )
    want = edges_in.select(
        url("src").alias("src_url"), url("dst").alias("dst_url")
    )
    got = extract_edges(pages).distinct()
    missing = want.join(got, ["src_url", "dst_url"], "left_anti").count()
    extra = got.join(want, ["src_url", "dst_url"], "left_anti").count()
    ok = missing == 0 and extra == 0 and n_edges == edges_in.count()

    print(
        json.dumps(
            {
                "n_pages": args.n,
                "n_edges": int(n_edges),
                "html_mb": round(html_bytes / 1e6, 1),
                "text_mb": round(n_text_bytes / 1e6, 1),
                "extract_sec": round(extract_sec, 2),
                "pages_per_sec": round(args.n / extract_sec, 1),
                "mb_per_sec": round(html_bytes / 1e6 / extract_sec, 1),
                "edges_sec": round(edges_sec, 2),
                "edges_per_sec": round(n_edges / edges_sec, 1),
                "roundtrip_ok": bool(ok),
            }
        )
    )
    if not ok:
        print(
            f"# ROUNDTRIP FAILED: missing={missing} extra={extra}",
            file=sys.stderr,
        )
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
