"""Vector column functions for embedding similarity.

Pure column expressions over ``array<float|double>`` columns using
``zip_with`` / ``aggregate`` higher-order functions — JVM-side, no UDF, so
brute-force similarity scans stay inside whole-stage codegen. DuckDB's
``list_cosine_similarity`` / ``list_dot_product`` are the oracle twins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(col: Column | str) -> Column:
    # float32 embeddings -> double before arithmetic, matching DuckDB.
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def double_array(a: Column | str) -> Column:
    """The float->double widening ``dot()`` applies to each operand,
    exposed so PAIR-EXPLOSION call sites can hoist it to a per-ROW
    projection (guide §1.2 "per-task work"): a bucket/cell self-join
    evaluates the dot once per candidate PAIR, and the interpreted
    ``transform`` lambda was re-casting the same row's array once per
    partner. Same expression, same exact widening — only WHERE it runs
    changes."""
    return _d(a)


def dot_double(a: Column | str, b: Column | str) -> Column:
    """``dot()`` over arrays already widened by :func:`double_array`.

    Bit-identical to ``dot()`` on the float originals: float->double is
    exact, the products multiply the same doubles, and the fold runs in
    the same left-to-right order from the same 0.0 seed — only the cast
    layer moved out of the per-pair loop. Measured on the sf0.1 cosine
    pair stage (125k candidate pairs x dim 64): 1.71 -> 1.17 s warm,
    byte-equal scores. (An unrolled element_at form was ALSO tried and
    measured 3x SLOWER — 64-term trees fall out of codegen; the
    negative result is recorded in OPTIMIZATION_r12.md.)

    Use this form when the widened array STAYS IN-STAGE between its
    projection and the scoring fold (e.g. the streamed probe side of a
    broadcast join): the double array then never crosses an exchange,
    a checkpoint, or a broadcast, so the widening is free. When the
    array must cross one of those, prefer :func:`dot_cast` — shipping
    doubles doubles the payload (guide §2.3 "narrower types")."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_cast(a: Column | str, b: Column | str) -> Column:
    """``dot()`` with the float->double widening FUSED into the product
    lambda: one zip_with layer instead of two transform layers plus
    zip_with, and the inputs stay float-narrow through any exchange/
    checkpoint/broadcast they cross before scoring.

    Bit-identical to ``dot()``: cast-then-multiply on the same element
    pairs, same fold order, same 0.0 seed (a double input's re-cast is
    the identity). Measured on the sf0.1 cosine pair stage: orig
    1.71 s / precast arrays 1.17 s / this 1.30 s — this form keeps
    ~75% of the precast win while halving the pair join's shuffled
    bytes at scale, which is the right trade wherever the arrays cross
    an exchange (the cell/bucket self-joins)."""
    return F.aggregate(
        F.zip_with(
            _c(a), _c(b),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def hyperplane_sketch(a: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot(a, plane_i) packed
    into a long. Same-bucket vectors are cosine-similar candidates; used by
    the IVF/LSH ANN scale path (operators.similarity.lsh_topk).

    The vector length must equal the planes' dimension and is ENFORCED
    per row: ``zip_with`` otherwise NULL-pads the shorter side, every
    dot goes NULL, every sign bit falls to 0 — and all vectors silently
    land in bucket 0, collapsing the LSH blocking into a full O(n²)
    cross product. A dim mismatch is a caller bug that must fail
    loudly, not degrade quietly."""
    dim = len(planes[0]) if planes else 0
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(_d(a), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return (
        # A NULL vector is an ABSENT observation (failed upstream
        # encode), not a caller bug: it gets a NULL bucket, which drops
        # out of every bucket equi-join downstream — visible, excluded,
        # job intact (found by the nulled-payload input sweep). A
        # present vector of the WRONG length is still a loud failure.
        F.when(_d(a).isNull(), F.lit(None).cast("int"))
        .when(F.size(_d(a)) == F.lit(dim), out)
        .otherwise(
            F.raise_error(
                F.format_string(
                    f"hyperplane_sketch: vector length %s != planes dim"
                    f" {dim}",
                    F.size(_d(a)),
                )
            ).cast("int")
        )
        .cast("long")
    )
