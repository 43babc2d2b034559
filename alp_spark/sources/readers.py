"""Graph file readers: MatrixMarket and SNAP edge lists.

The reference's only file sources (SURVEY.md §2.3): the MatrixMarket
parser (utils/parser/MatrixFileReaderBase.hpp:45,95-155 — header modes
pattern/symmetric/general) and the SNAP-style whitespace edge list read
by the parallel hpparser (src/graphblas/utils/hpparser.c:211-456). Our
production source is parquet; these exist to import standard test
graphs. Both parse distributed via spark.read.text + Column expressions
(no driver-side file scan; a 100GB edge list parses in parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..containers import DST, SRC, VAL


def read_snap_edges(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-separated ``src dst`` lines, ``#`` comments — the SNAP
    format consumed by the reference's hpparser. 0-based ids kept as-is."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.where(~F.col("value").startswith("#") & (F.trim("value") != ""))
        .select(
            parts.getItem(0).cast("long").alias(SRC),
            parts.getItem(1).cast("long").alias(DST),
        )
    )


def read_matrix_market(
    spark: SparkSession, path: str
) -> tuple[DataFrame, int, int]:
    """MatrixMarket coordinate format → (edges, nrows, ncols).

    Handles every header mode the reference parser recognises
    (MatrixFileReaderBase.hpp:95-162): value types ``pattern`` (no value
    column) / ``real`` / ``integer`` / ``complex`` (two value columns
    ``re``/``im``), and structure ``symmetric`` (mirror every
    off-diagonal entry) / ``hermitian`` (mirror with conjugated
    imaginary part) / ``general``. 1-based MM indices are shifted to
    0-based. The dimension line is read on the driver (one small head);
    the entries parse distributed.

    Returns ``(edges, nrows, ncols)`` where ``edges`` has columns
    ``(src, dst)`` for pattern, ``(src, dst, val)`` for real/integer,
    and ``(src, dst, re, im)`` for complex.
    """
    head = spark.read.text(path).limit(64).collect()
    banner = head[0]["value"].lower()
    if not banner.startswith("%%matrixmarket"):
        raise ValueError("not a MatrixMarket file")
    # parse the banner TOKENS exactly (ADVICE r5 medium): substring
    # matching made a 'skew-symmetric' header match 'symmetric' and
    # silently mirror WITHOUT negating values — the reference parser
    # matches the exact field and throws on anything it does not
    # support (MatrixFileReaderBase.hpp:151-159), and so do we.
    toks = banner.split()
    # %%matrixmarket matrix coordinate <field> <symmetry>
    if len(toks) < 5 or toks[1] != "matrix" or toks[2] != "coordinate":
        raise ValueError(f"unsupported MatrixMarket header: {banner!r}")
    field, structure = toks[3], toks[4]
    if field not in ("pattern", "real", "integer", "complex"):
        raise ValueError(f"unsupported MatrixMarket field: {field!r}")
    if structure not in ("general", "symmetric", "hermitian"):
        raise ValueError(
            f"unsupported MatrixMarket structure: {structure!r}"
        )
    pattern = field == "pattern"
    is_complex = field == "complex"
    hermitian = structure == "hermitian"
    symmetric = structure == "symmetric" or hermitian
    dims = next(
        r["value"] for r in head[1:] if not r["value"].startswith("%")
    )
    nrows, ncols = (int(t) for t in dims.split()[:2])

    # Drop the dimension line by CONTENT, not position: FileSourceScan
    # orders splits by size descending, so no row-id trick identifies
    # "the first data line" on multi-split inputs. The dims string is
    # already parsed driver-side above. An entry row CAN collide
    # token-for-token (a self-loop "4 4 8" in a 4x4/8-nnz matrix), so
    # drop exactly ONE matching row — the header — and union the other
    # matches back (all collisions are the same (i, j, v) tuple, so which
    # physical row survives is immaterial).
    lines = spark.read.text(path)
    data = lines.where(~F.col("value").startswith("%") & (F.trim("value") != ""))
    dims_norm = " ".join(dims.split())
    parts = F.split(F.trim(F.col("value")), r"\s+")
    matched = data.where(F.array_join(parts, " ") == F.lit(dims_norm))
    n_matched = matched.count()  # ≥ 1 (the header itself); tiny action
    data = data.where(F.array_join(parts, " ") != F.lit(dims_norm))
    if n_matched > 1:
        data = data.unionByName(matched.limit(n_matched - 1))
    if pattern:
        vals = []
    elif is_complex:
        vals = [
            parts.getItem(2).cast("double").alias("re"),
            parts.getItem(3).cast("double").alias("im"),
        ]
    else:
        vals = [parts.getItem(2).cast("double").alias(VAL)]
    body = data.select(
        (parts.getItem(0).cast("long") - 1).alias(SRC),
        (parts.getItem(1).cast("long") - 1).alias(DST),
        *vals,
    )
    if symmetric:
        if pattern:
            mirror_vals = []
        elif is_complex:
            # hermitian mirror conjugates: A[j,i] = conj(A[i,j])
            # (MatrixFileReaderBase.hpp Hermitian mode)
            mirror_vals = [
                F.col("re"),
                (-F.col("im") if hermitian else F.col("im")).alias("im"),
            ]
        else:
            mirror_vals = [F.col(VAL)]
        sw = [F.col(DST).alias(SRC), F.col(SRC).alias(DST)] + mirror_vals
        body = body.unionByName(body.where(F.col(SRC) != F.col(DST)).select(*sw))
    return body, nrows, ncols
