"""BLAS-1 vector primitives (ref spec: base/blas1.hpp, 4167 LoC;
impl: reference/blas1.hpp, 10085 LoC — SURVEY.md §2.4).

Semantics pinned from the reference:
- ``eWiseApply`` with a plain *operator* intersects sparsity structures
  (base/blas1.hpp:1391,1501) → inner join.
- ``eWiseApply`` with a *monoid* unions them, absent entries read as the
  identity (base/blas1.hpp:1616-1617) → full-outer join + coalesce.
- masked variants gate the *output* entries by a structural mask,
  optionally inverted (descriptors.hpp:66/103) → semi/anti join.
- folds reduce a (masked) vector into a scalar under a monoid
  (base/blas1.hpp:3840-3977) → ``agg`` to the driver.
- ``dot`` is the fold of an elementwise combine — generalised beyond
  (add, mul): PageRank residual uses (add, abs_diff)
  (simple_pagerank.hpp:433-437), label-prop convergence (or, not_equal)
  (label.hpp:253) → inner join + agg in ONE shuffle.

Everything here stays JVM-side (Column expressions, whole-stage codegen);
no Python hits the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..algebra import BinOp, Monoid
from ..containers import ID, VAL


def apply_mask(
    x: DataFrame,
    mask: DataFrame | None,
    invert: bool = False,
    structural: bool = True,
) -> DataFrame:
    """Structural masking (descriptors.hpp:66/103/117): keep entries of x
    whose id is (not) present in the mask. Non-structural masks additionally
    require the mask *value* to be truthy."""
    if mask is None:
        return x
    m = mask
    if not structural and VAL in mask.columns:
        m = mask.where(F.col(VAL).cast("boolean"))
    how = "left_anti" if invert else "left_semi"
    return x.join(m.select(ID), on=ID, how=how)


def check_no_casting(*dfs: DataFrame) -> None:
    """The ``no_casting`` descriptor (descriptors.hpp:196): forbid the
    implicit type promotion Spark would otherwise apply — raise when the
    operand value dtypes differ (the runtime analog of the reference's
    ``static_assert``)."""
    types = {df.schema[VAL].dataType.simpleString() for df in dfs if VAL in df.columns}
    if len(types) > 1:
        raise TypeError(f"no_casting: operand value types differ: {sorted(types)}")


def e_wise_apply(
    x: DataFrame,
    y: DataFrame,
    op: BinOp,
    monoid: Monoid | None = None,
    mask: DataFrame | None = None,
    invert_mask: bool = False,
    no_casting: bool = False,
) -> DataFrame:
    """z = x ⊙ y.

    Operator form (monoid=None): sparsity INTERSECTION — base/blas1.hpp:1391.
    Monoid form: sparsity UNION, absent side reads the identity —
    base/blas1.hpp:1616. eWiseMul ≡ operator form with ⊗; eWiseAdd ≡ monoid
    form with ⊕ (base/blas1.hpp:1912/2794). ``no_casting`` applies the
    strict-dtype descriptor (descriptors.hpp:196).
    """
    if no_casting:
        check_no_casting(x, y)
    if monoid is None:
        out = (
            x.alias("x")
            .join(y.alias("y"), on=F.col(f"x.{ID}") == F.col(f"y.{ID}"), how="inner")
            .select(
                F.col(f"x.{ID}").alias(ID),
                op(F.col(f"x.{VAL}"), F.col(f"y.{VAL}")).alias(VAL),
            )
        )
    else:
        ident = monoid.lit_identity()
        out = (
            x.alias("x")
            .join(y.alias("y"), on=F.col(f"x.{ID}") == F.col(f"y.{ID}"), how="full_outer")
            .select(
                F.coalesce(F.col(f"x.{ID}"), F.col(f"y.{ID}")).alias(ID),
                monoid.op(
                    F.coalesce(F.col(f"x.{VAL}"), ident),
                    F.coalesce(F.col(f"y.{VAL}"), ident),
                ).alias(VAL),
            )
        )
    return apply_mask(out, mask, invert=invert_mask)


def e_wise_apply_scalar(
    x: DataFrame,
    beta: object,
    op: BinOp,
    flip: bool = False,
    mask: DataFrame | None = None,
    invert_mask: bool = False,
) -> DataFrame:
    """z = x ⊙ β (or β ⊙ x with ``flip``) — the vector⊙scalar overloads
    of eWiseApply (base/blas1.hpp's 16-overload family). The scalar is a
    plan literal; sparsity follows x (a scalar is structurally dense)."""
    b = F.lit(beta)
    expr = op(b, F.col(VAL)) if flip else op(F.col(VAL), b)
    return apply_mask(
        x.select(F.col(ID), expr.alias(VAL)), mask, invert=invert_mask
    )


def fold_vector(z: DataFrame, x: DataFrame, monoid: Monoid) -> DataFrame:
    """z ⊕= x under union semantics (foldl vector←vector,
    reference/blas1.hpp:9860) — the accumulate step of eWiseAdd."""
    return e_wise_apply(z, x, monoid.op, monoid=monoid)


def fold_scalar(
    x: DataFrame,
    monoid: Monoid,
    mask: DataFrame | None = None,
    invert_mask: bool = False,
) -> object:
    """α = fold(x|mask) under a monoid (base/blas1.hpp:3840-3909). Used for
    the Pregel halt vote (pregel.hpp:812-814) and PageRank dangling mass
    (simple_pagerank.hpp:312-314, with invert_mask). Spark's treeAggregate
    partial+final reduction is the allreduce (base/collectives.hpp:121)."""
    xm = apply_mask(x, mask, invert=invert_mask)
    row = xm.agg(monoid.agg(F.col(VAL)).alias("acc")).collect()[0]
    return monoid.identity if row["acc"] is None else row["acc"]


def dot(
    x: DataFrame,
    y: DataFrame,
    add_monoid: Monoid,
    mul_op: BinOp,
) -> object:
    """⟨x,y⟩ under (⊕-monoid, ⊗-op) — base/blas1.hpp:4056, impl dot_generic
    reference/blas1.hpp:9520. Intersection semantics; one join + one agg,
    single shuffle, map-side partial aggregation applies."""
    row = (
        x.alias("x")
        .join(y.alias("y"), on=F.col(f"x.{ID}") == F.col(f"y.{ID}"), how="inner")
        .agg(add_monoid.agg(mul_op(F.col(f"x.{VAL}"), F.col(f"y.{VAL}"))).alias("acc"))
        .collect()[0]
    )
    return add_monoid.identity if row["acc"] is None else row["acc"]


def norm2(x: DataFrame, add_monoid: Monoid | None = None) -> float:
    """||x||₂ = sqrt(⟨x, x⟩) (algorithms/norm.hpp:76-87: a dot on itself
    followed by the scalar sqrt, which lives outside the semiring)."""
    import math

    from .. import algebra as alg

    add_monoid = add_monoid or alg.PLUS
    return math.sqrt(float(dot(x, x, add_monoid, alg.mul)))


def cosine_similarity(x: DataFrame, y: DataFrame) -> float:
    """α = ⟨x,y⟩ / (||x||₂·||y||₂)
    (algorithms/cosine_similarity.hpp:57/160-207). Mirrors the reference
    corner cases: zero denominator → error (ILLEGAL analog), zero
    nominator → 0. Three dots = three single-shuffle jobs; the fused
    one-pass variant over a zipped frame is ``e_wise_lambda`` territory
    if it ever matters."""
    from .. import algebra as alg

    nominator = float(dot(x, y, alg.PLUS, alg.mul))
    denominator = norm2(x) * norm2(y)
    if denominator == 0.0:
        raise ValueError("cosine_similarity of a zero-norm vector")
    return nominator / denominator


def e_wise_map(x: DataFrame, fn) -> DataFrame:
    """Unary map over present entries (eWiseMap, reference/blas1.hpp:9685).
    ``fn`` is a Column→Column builder — stays in codegen."""
    return x.select(F.col(ID), fn(F.col(VAL)).alias(VAL))


def zip_vectors(x: DataFrame, y: DataFrame) -> DataFrame:
    """zip (reference/blas1.hpp:9975): pack aligned entries into a struct."""
    return e_wise_apply(x, y, lambda a, b: F.struct(a.alias("first"), b.alias("second")))


def unzip_vector(z: DataFrame) -> tuple[DataFrame, DataFrame]:
    """unzip (reference/blas1.hpp:10023)."""
    return (
        z.select(F.col(ID), F.col(f"{VAL}.first").alias(VAL)),
        z.select(F.col(ID), F.col(f"{VAL}.second").alias(VAL)),
    )


def e_wise_add(
    z: DataFrame, x: DataFrame, y: DataFrame, monoid: Monoid
) -> DataFrame:
    """z ⊕= x ⊕ y under union (eWiseAdd, base/blas1.hpp:1912-2695):
    the monoid-form apply folded into the accumulator."""
    return fold_vector(z, e_wise_apply(x, y, monoid.op, monoid=monoid), monoid)


def e_wise_mul(
    z: DataFrame, x: DataFrame, y: DataFrame, add_monoid: Monoid, mul_op: BinOp
) -> DataFrame:
    """z ⊕= x ⊗ y under intersection (eWiseMul, base/blas1.hpp:2794-3496)."""
    return fold_vector(z, e_wise_apply(x, y, mul_op), add_monoid)


def e_wise_mul_add(
    z: DataFrame,
    a: DataFrame,
    x: DataFrame,
    y: DataFrame,
    add_monoid: Monoid,
    mul_op: BinOp,
) -> DataFrame:
    """z = a⊗x ⊕ y fused (eWiseMulAdd FMA family,
    reference/blas1.hpp eWiseMulAdd_dispatch). a⊗x intersects; the ⊕
    folds union. Chained string-key joins keep the hash partitioning on
    ``id`` (no per-step re-shuffle) and the whole FMA lands in ONE
    select — Catalyst fuses the arithmetic into one codegen stage, the
    analog of the reference's fused kernel."""
    ident = add_monoid.lit_identity()
    ax = (
        a.select(ID, F.col(VAL).alias("_a"))
        .join(x.select(ID, F.col(VAL).alias("_x")), on=ID, how="inner")
        .select(ID, mul_op(F.col("_a"), F.col("_x")).alias("_ax"))
    )
    return (
        ax.join(y.select(ID, F.col(VAL).alias("_y")), on=ID, how="full_outer")
        .join(z.select(ID, F.col(VAL).alias("_z")), on=ID, how="full_outer")
        .select(
            ID,
            add_monoid.op(
                add_monoid.op(
                    F.coalesce(F.col("_ax"), ident), F.coalesce(F.col("_y"), ident)
                ),
                F.coalesce(F.col("_z"), ident),
            ).alias(VAL),
        )
    )


def e_wise_lambda(
    vectors: list[DataFrame],
    fn,
    schema: str = "id long, val double",
    names: list[str] | None = None,
) -> DataFrame:
    """Arbitrary vectorized lambda over id-aligned entries of several
    vectors (eWiseLambda, base/blas1.hpp:3746 — the UDF escape hatch the
    reference uses for the PageRank fused steps,
    simple_pagerank.hpp:241-249/291-302/402-416).

    ``fn(pandas.DataFrame) -> pandas.DataFrame`` runs Arrow-vectorized
    via ``mapInPandas`` (input_hint: no per-row Python). Vectors join on
    the intersection of their ids; columns are named ``v0..vk`` or
    ``names``.
    """
    names = names or [f"v{i}" for i in range(len(vectors))]
    joined = None
    for df, name in zip(vectors, names):
        cur = df.select(F.col(ID), F.col(VAL).alias(name))
        joined = cur if joined is None else joined.join(cur, on=ID, how="inner")

    def run(batches):
        for pdf in batches:
            yield fn(pdf)

    return joined.mapInPandas(run, schema=schema)
