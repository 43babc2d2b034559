"""Deduplication: exact, MinHash+LSH, and n-gram Jaccard.

Scale design
------------
- **exact**: one groupBy on md5(text) — map-side partial agg, one
  shuffle; the hash key (not the text) shuffles, so 100 TB of text
  moves 16 bytes/row.
- **MinHash**: signatures are computed per-row with array expressions
  (shingle → md5 → array_min) — NO explode, NO shuffle; a document's
  signature never leaves its partition until the band join.
- **LSH**: band keys explode to ``num_bands`` rows/doc; the self-join
  on (band, key) is the only shuffle and its key space is uniform
  (md5), so no skew. Candidate pairs then get exact Jaccard.

All hashing is md5-based so the DuckDB oracle reproduces results
byte-for-byte (lexicographic min over hex digests is engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by text hash.

    Returns (text_hash, keep_id, n_dupes): the canonical survivor
    (min doc_id) and group size per distinct text.
    """
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").cast("long").alias("n_dupes"),
        )
    )


def shingles_col(tokens: Column, k: int = 2) -> Column:
    """Word k-shingles of a token array (whole array when shorter).

    Mirror SQL: ``list_transform(generate_series(1, greatest(len(t)-k+1,
    1)), i -> array_to_string(list_slice(t, i, i+k-1), ' '))``.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k)))


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 8, shingle_k: int = 2
) -> DataFrame:
    """(doc_id, sig0..sig{H-1}) MinHash signature per document.

    sig_j = min over shingles s of md5('j:' || s) — the j-th hash
    family is seeded by prefixing the seed, min is lexicographic over
    lowercase hex. Entirely per-row array math: zero shuffles.
    """
    sh = shingles_col(tokens_col(F.col("text")), shingle_k)

    def seeded_min(j: int):
        # unary lambda only: a (s, j=...) form would bind the array index
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))
        )

    cols = [seeded_min(j).alias(f"sig{j}") for j in range(num_hashes)]
    return docs.select("doc_id", *cols)


def lsh_candidate_pairs(
    sigs: DataFrame, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH on a signature table.

    Bands the signature into ``num_hashes/band_size`` groups, keys each
    band by md5(concat(sigs in band)), self-joins on (band, key).
    Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    """
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[F.col(f"sig{b * band_size + r}") for r in range(band_size)]
                    )
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    keyed = sigs.select(
        "doc_id", F.explode(bands).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = keyed.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (
        a.join(b, on=["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    shingle_k: int = 2,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    With ``candidates`` (doc_a, doc_b) given, intersections are computed
    for ONLY those pairs — the candidate set prunes BEFORE the shingle
    join, so the shuffle volume is |candidates| x avg-shingles, not
    corpus-quadratic (the LSH-then-verify scale path). Without it, all
    pairs sharing at least one shingle are compared (hot shingles make
    this quadratic — safe only at small scale / after blocking).
    Returns (doc_a, doc_b, jaccard) with jaccard ≥ threshold, rounded
    to 1e-6 for engine portability.
    """
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_col(tokens_col(F.col("text")), shingle_k))
        ).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    if candidates is not None:
        # (doc_a, doc_b) ⋈ shingles(doc_a) ⋈ shingles(doc_b): every row
        # is candidate-scoped; hub shingles never cross-product
        inter = (
            candidates.join(
                sh.select(F.col("doc_id").alias("doc_a"), "sh"), on="doc_a"
            )
            .join(
                sh.select(F.col("doc_id").alias("doc_b"), "sh"),
                on=["doc_b", "sh"],
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
        b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
        inter = (
            a.join(b, on="sh")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), on="doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), on="doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
