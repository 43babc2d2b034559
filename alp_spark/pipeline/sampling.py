"""Deterministic sampling & train/validation splits for training-data
pipelines.

A 100 TB corpus job cannot use ``df.sample`` for anything that must be
reproducible across runs, resumes, partitionings, and cluster sizes:
Spark's sampler draws per-partition from a seeded RNG, so the SAME row
lands in or out of the sample depending on which partition (and
position) it occupies. These operators derive the decision from the
ROW ITSELF — ``md5(key || salt)`` mapped to a uniform fraction — so
membership is a pure function of (key, salt): stable under shuffle,
resume, and scale-out, exactly like the MinHash/LSH bucketing in
:mod:`alp_spark.pipeline.dedup` (same md5 device, dedup.py). md5 is
byte-identical across engines, which also makes every operator here
exactly expressible as a DuckDB oracle (no RNG to replay).

The first 8 bytes of the md5 digest, read as an unsigned big-endian
integer, divided by 2^64, give u ∈ [0, 1) with ~5e-20 granularity —
far below any meaningful sampling fraction.

Scale shape: every operator is a pure Column filter/projection over
one scan — no shuffle, no RNG state, no driver participation; Catalyst
pushes the predicate to the source when the format allows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^64 as a double — the divisor turning the 8-byte hash prefix into u
_TWO64 = 18446744073709551616.0


def _uniform_unit(key: Column, salt: str) -> Column:
    """u ∈ [0,1): first 8 md5 bytes of ``key || salt`` over 2^64.

    ``conv(hex, 16, 10)`` parses the 16-hex-digit prefix as an UNSIGNED
    64-bit value into a decimal string; the double cast then loses only
    bits below the 2^-53 granularity — irrelevant for sampling."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 16), 16, 10).cast("double") / F.lit(_TWO64)


def sample_fraction(
    df: DataFrame,
    fraction: float,
    key: str,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff u(key, salt) < fraction — a deterministic
    Bernoulli sample that is reproducible across partitionings and
    cluster sizes, and disjointly composable: different salts give
    independent samples of the same corpus."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(_uniform_unit(F.col(key), salt) < F.lit(float(fraction)))


def train_val_split(
    df: DataFrame,
    val_fraction: float,
    key: str,
    salt: str = "split",
) -> DataFrame:
    """Tag every row with a stable ``split`` column ('train' | 'val'):
    u < val_fraction ⇒ 'val'. The SAME row always lands in the same
    split — the property that prevents train/val leakage when the
    corpus is re-ingested, re-partitioned, or grown (new rows get
    split decisions without moving old ones)."""
    if not 0.0 <= val_fraction <= 1.0:
        raise ValueError("val_fraction must be in [0, 1]")
    u = _uniform_unit(F.col(key), salt)
    return df.withColumn(
        "split",
        F.when(u < F.lit(float(val_fraction)), F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def sample_stratified(
    df: DataFrame,
    fractions: dict,
    stratum: str,
    key: str,
    salt: str = "stratified",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: stratum s keeps each
    row iff u(key, salt) < fractions[s] (``default_fraction`` for
    strata not listed). The per-stratum thresholds ride the plan as a
    literal CASE — no join, no shuffle; rebalancing a skewed corpus
    (e.g. downsampling the dominant language) is one scan."""
    for s, f in fractions.items():
        if not 0.0 <= float(f) <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    u = _uniform_unit(F.col(key), salt)
    thr = F.lit(float(default_fraction))
    for s, f in sorted(fractions.items()):
        thr = F.when(F.col(stratum) == F.lit(s), F.lit(float(f))).otherwise(thr)
    return df.where(u < thr)
