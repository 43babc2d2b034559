"""Large-fixture dry run for the pipeline operators (VERDICT r2 #7).

Surfaces residual super-linear plans before a real scale-up: builds a
K×-scaled deterministic twin of the sf0.1 documents/embeddings tables
(replicate-with-perturbation — each copy's text/vector is perturbed by
a seeded RNG so replication does not plant artificial K-fold exact
duplicates that would blow up LSH buckets superlinearly), then times
the documents/embeddings driver queries at 1× (the real sf0.1 dir) and
at K× and reports the wall-clock ratio per query. A linear-plan query
should scale ≲ K (candidate-pair queries may exceed K somewhat since
the planted near-dup density, and hence the candidate count, rises
with corpus size).

Usage::

    spark-submit --master local[32] --py-files alp_spark.zip \
        scripts/bench_bigfixture.py --scale 10

Prints one JSON line: {"scale": K, "queries": {name: {"sec_1x": ...,
"sec_kx": ..., "ratio": ...}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 1234
BASE = "/root/testdata/sf0.1"

#: documents/embeddings-only driver queries (graph queries scale with
#: N_V/lineitem, evidenced separately by scripts/bench_scaling.py)
PIPELINE_QUERIES = [
    "token_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "exact_dedup",
    "minhash_signatures",
    "lsh_dup_pairs",
    "ngram_jaccard",
    "simhash",
    "dedup_survivors",
    "ann_topk",
    "cosine_dup_pairs",
    "lsh_ann_topk",
]


def build_big(out_dir: str, scale: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    docs = pq.read_table(f"{BASE}/documents.parquet")
    n = docs.num_rows
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    vocab = sorted({w for t in texts[:500] for w in t.split()})
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for k in range(scale):
        for i, t in enumerate(texts):
            if k == 0:
                t2 = t
            else:
                words = t.split()
                # ~5% word replacement per copy keeps shingle overlap
                # high (realistic near-dup tail) without exact dups
                flips = rng.random(len(words)) < 0.05
                for j in np.nonzero(flips)[0]:
                    words[j] = vocab[int(rng.integers(0, len(vocab)))]
                t2 = " ".join(words)
            out["doc_id"].append(k * n + i)
            out["text"].append(t2)
            out["lang"].append(langs[i])
            out["source"].append(sources[i])
            out["n_chars"].append(len(t2))
    pq.write_table(pa.table(out), f"{out_dir}/documents.parquet")

    emb = pq.read_table(f"{BASE}/embeddings.parquet")
    m = emb.num_rows
    V = np.stack(
        [np.asarray(v, dtype=np.float32) for v in emb.column("embedding").to_pylist()]
    )
    labels = np.asarray(emb.column("label").to_pylist(), dtype=np.int32)
    ids, vecs, labs = [], [], []
    for k in range(scale):
        Vk = V if k == 0 else V + 0.05 * rng.standard_normal(V.shape).astype(np.float32)
        ids.append(np.arange(m, dtype=np.int64) + k * m)
        vecs.append(Vk)
        labs.append(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.concatenate(ids),
                "embedding": pa.array(
                    [row for Vk in vecs for row in Vk.tolist()],
                    type=pa.list_(pa.float32()),
                ),
                "label": np.concatenate(labs),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--data-dir", default="benchdata")
    ap.add_argument("--queries", default=",".join(PIPELINE_QUERIES))
    args = ap.parse_args()

    big_dir = os.path.join(args.data_dir, f"big{args.scale}x")
    if not os.path.exists(f"{big_dir}/embeddings.parquet"):
        t0 = time.monotonic()
        build_big(big_dir, args.scale)
        print(
            f"# built {big_dir} in {time.monotonic()-t0:.1f}s", file=sys.stderr
        )

    import __spark_entry__ as entrymod
    from alp_spark.session import get_spark

    spark = get_spark(app_name=f"bigfixture-{args.scale}x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{BASE}/documents.parquet").count()

    qmap = entrymod.queries()
    results = {}
    for name in args.queries.split(","):
        fn = qmap[name]
        secs = {}
        for tag, d in (("sec_1x", BASE), ("sec_kx", big_dir)):
            t0 = time.monotonic()
            n_rows = fn(spark, d).count()
            secs[tag] = round(time.monotonic() - t0, 2)
            secs[tag.replace("sec", "rows")] = n_rows
        secs["ratio"] = round(secs["sec_kx"] / max(secs["sec_1x"], 1e-9), 2)
        results[name] = secs
        print(f"# {name}: {secs}", file=sys.stderr)

    print(json.dumps({"scale": args.scale, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
