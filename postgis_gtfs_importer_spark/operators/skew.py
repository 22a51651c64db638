"""Skew-mitigation utilities — explicit salting for when AQE isn't enough.

AQE's skew-join splitting handles most cases (enabled in session.py);
explicit salting remains necessary when the skew is in an AGGREGATION key
or when a broadcast isn't possible and a handful of keys dominate (the
hot-shingle case in set-similarity joins, SCALE.md). Both helpers are
equality-preserving: results are identical to the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_two_stage_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 aggregates on (key, random salt) — hot keys split across
    ``n_salts`` reducers; stage 2 merges the partials on the key alone
    (now at most ``n_salts`` rows per key). Only valid for algebraic
    aggregates expressible as merge-of-partials; the caller passes the
    MERGE expression keyed by the partial column name, e.g.::

        salted_two_stage_agg(df, ["k"], {"n": F.sum("n"), "mx": F.max("mx")})

    where stage 1 must already have produced columns n/mx — use
    ``stage1_exprs`` naming convention: partial col == final col.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, expr in agg_exprs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            _merge_expr(name, expr).alias(name)
            for name, expr in agg_exprs.items()
        ]
    )


def _merge_expr(name: str, expr: Column) -> Column:
    """Merge partials: sum/count partials re-sum; min/max re-apply.

    Only decomposable aggregates are mergeable this way — avg, stddev,
    count-distinct etc. would silently produce wrong results if allowed
    to fall through to summation, so anything else is rejected."""
    s = expr._jc.toString().lower()
    if s.startswith("min("):
        return F.min(name)
    if s.startswith("max("):
        return F.max(name)
    if s.startswith(("sum(", "count(")):
        return F.sum(name)
    raise ValueError(
        f"two_stage_agg only supports sum/count/min/max partials; got"
        f" {name}={s!r} (avg, distinct and higher moments do not merge by"
        " re-aggregation — compute them from sum/count partials instead)"
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe inner equi-join: salt the large side's key, replicate the
    small side across all salts, join on (key, salt).

    Hot keys on the large side spread over ``n_salts`` reducers instead
    of landing on one. Cost: the small side is replicated ``n_salts``
    times — use when the small side can't broadcast but hot keys melt a
    sort-merge join. Result ≡ ``large.join(small, key)``.
    """
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(salted_small, [key, "__salt"]).drop("__salt")
